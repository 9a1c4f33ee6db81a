"""MXU precision policy for state-evolution contractions.

TPU matmuls default to bf16 MXU passes, which visibly corrupts unitary
evolution (noiseless |A(t)| drifted to 1.004 after ONE Floquet cycle at
L=4). Quantum-state contractions therefore default to HIGHEST (full f32).
Set `DTC_TPU_MATMUL_PRECISION=high` (bf16x3, ~f32-accurate, faster) or
`default` (raw bf16 — only for roofline experiments) to trade off.
"""

from __future__ import annotations

import os

import jax

_LEVELS = {
    "default": jax.lax.Precision.DEFAULT,
    "high": jax.lax.Precision.HIGH,
    "highest": jax.lax.Precision.HIGHEST,
}

_current = _LEVELS[os.environ.get("DTC_TPU_MATMUL_PRECISION", "highest").lower()]


def gate_precision():
    return _current


def set_gate_precision(level: str):
    global _current
    _current = _LEVELS[level.lower()]
