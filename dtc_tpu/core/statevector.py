"""Statevector construction.

Initial states per the reference (autocorr-delta-a-single-qiskit-fast.py:127-130):
"vacuum" = |0...0>, "neel" = X applied on system labels i in 1..L with i even,
i.e. 0-indexed qubits 1, 3, 5, ... in our labeling (system qubit i in the
reference maps to our qubit i-1; the ancilla, reference qubit 0, is our
HIGHEST qubit when ancilla_faithful mode is on — a pure relabeling).
"""

from __future__ import annotations

import jax.numpy as jnp


def neel_index(L: int) -> int:
    idx = 0
    for q in range(1, L, 2):
        idx |= 1 << q
    return idx


def initial_statevector(
    L: int,
    initial_state: str = "vacuum",
    *,
    n_extra: int = 0,
    dtype=jnp.complex64,
) -> jnp.ndarray:
    """(2**(L+n_extra),) basis state; extra (high) qubits start in |0>."""
    n = L + n_extra
    if initial_state == "vacuum":
        idx = 0
    elif initial_state == "neel":
        idx = neel_index(L)
    else:
        raise ValueError(f"unknown initial_state {initial_state!r}")
    psi = jnp.zeros((1 << n,), dtype=dtype)
    return psi.at[idx].set(1.0)
