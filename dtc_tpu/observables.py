"""Measurement-level observables: counts sampling and expectations.

The reference measures through `backend.run(circ, shots).get_counts()` and
reduces counts to <Z> (C7, autocorr-delta-a-single-qiskit-fast.py:92-109).
Here expectations are analytic by default; these utilities provide the
counts-level semantics when shot-faithful studies or job artifacts are
needed (C15 shots study, C22 decode pipeline round-trips).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from dtc_tpu.device.jobs import counts_to_z_expectation  # re-export  # noqa: F401


@functools.partial(jax.jit, static_argnames=("shots",))
def _sample_indices(probs, key, shots: int):
    return jax.random.categorical(key, jnp.log(jnp.maximum(probs, 1e-30)),
                                  shape=(shots,))


def sample_counts(probs, shots: int, *, n_qubits: int, seed: int = 0) -> dict:
    """Sample a counts histogram {little-endian bitstring: count} from a
    probability vector over 2**n_qubits basis states."""
    key = jax.random.PRNGKey(seed)
    idx = np.asarray(_sample_indices(jnp.asarray(probs), key, shots))
    vals, cnt = np.unique(idx, return_counts=True)
    return {format(int(v), f"0{n_qubits}b"): int(c) for v, c in zip(vals, cnt)}


def counts_from_z_probability(a_value: float, shots: int, seed: int = 0) -> dict:
    """Single-qubit counts for an ancilla measurement with <Z> = a_value."""
    rng = np.random.default_rng(seed)
    p0 = float(np.clip((1.0 + a_value) / 2.0, 0.0, 1.0))
    n0 = int(rng.binomial(shots, p0))
    return {"0": n0, "1": shots - n0}
