"""Experiment drivers (the reference's L3 sweep engines, re-built as
vmapped/scanned JAX programs; SURVEY.md §3)."""
