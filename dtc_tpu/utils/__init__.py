"""Config, CLI, profiling, and checkpointing utilities."""

from dtc_tpu.utils.config import SimConfig  # noqa: F401
