"""Kicked-Ising Hamiltonian H = sum_i h_i Z_i + sum_i phi_i Z_i Z_{i+1} + g*pi*sum_i X_i.

Mirrors the reference's SparsePauliOp builder
(autocorr-delta-a-single-qiskit-fast-energy.py:83-102) and its component
selection full / z_only / zz_only / x_only / z_zz
(autocorr-delta-a-single-qiskit-fast-energy-ham-comparison.py:85-118), but as
coefficient arrays consumed by analytic expectation kernels: the Z and ZZ
parts are one diagonal mask reduction, the X part is one pass of per-qubit
pair reductions — no Pauli-grouping measurement circuits needed.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np


COMPONENTS = ("full", "z_only", "zz_only", "x_only", "z_zz")


@dataclasses.dataclass(frozen=True)
class HamiltonianTerms:
    hs: jnp.ndarray     # (L,)  Z coefficients
    phis: jnp.ndarray   # (L-1,) ZZ coefficients
    x_coeff: jnp.ndarray  # scalar: g*pi (uniform X coefficient)


def hamiltonian_terms(L: int, g, hs, phis, component: str = "full") -> HamiltonianTerms:
    if component not in COMPONENTS:
        raise ValueError(f"unknown component {component!r}; one of {COMPONENTS}")
    hs = jnp.asarray(hs)[:L]
    phis = jnp.asarray(phis)[: L - 1]
    zero_h = component in ("zz_only", "x_only")
    zero_zz = component in ("z_only", "x_only")
    zero_x = component in ("z_only", "zz_only", "z_zz")
    return HamiltonianTerms(
        hs=jnp.zeros_like(hs) if zero_h else hs,
        phis=jnp.zeros_like(phis) if zero_zz else phis,
        x_coeff=jnp.asarray(0.0 if zero_x else g * np.pi),
    )


def pauli_string_terms(L: int, terms: HamiltonianTerms, *,
                       num_qubits: int | None = None,
                       layout: list[int] | None = None) -> list[tuple[str, float]]:
    """Export H as (pauli_string, coeff) pairs — the SparsePauliOp.from_list
    surface of the reference (autocorr-delta-a-single-qiskit-fast-energy.py:83-102),
    including the device-register padded variant that embeds an L-site chain
    on a wider QPU register (127-qubit Brisbane embedding at
    autocorr-delta-a-single-qiskit-fast-energy-fakebrisbane.py:80-96).

    Strings are little-endian (rightmost character = qubit 0, the Qiskit
    convention). ``layout`` maps logical site i -> device qubit layout[i]
    (e.g. a snake layout from dtc_tpu.device.layouts); default identity.
    Zero-coefficient terms are dropped, matching component selection.
    """
    n = num_qubits if num_qubits is not None else L
    lay = list(range(L)) if layout is None else list(layout[:L])
    if len(lay) < L or max(lay) >= n:
        raise ValueError(f"layout must map {L} sites into [0, {n})")

    def string_with(ops: dict[int, str]) -> str:
        chars = ["I"] * n
        for q, c in ops.items():
            chars[n - 1 - q] = c
        return "".join(chars)

    out: list[tuple[str, float]] = []
    hs = np.asarray(terms.hs)
    phis = np.asarray(terms.phis)
    xc = float(terms.x_coeff)
    for i in range(L):
        if hs[i] != 0.0:
            out.append((string_with({lay[i]: "Z"}), float(hs[i])))
    for i in range(L - 1):
        if phis[i] != 0.0:
            out.append((string_with({lay[i]: "Z", lay[i + 1]: "Z"}), float(phis[i])))
    if xc != 0.0:
        for i in range(L):
            out.append((string_with({lay[i]: "X"}), xc))
    return out


def dense_hamiltonian(L: int, terms: HamiltonianTerms) -> np.ndarray:
    """Dense 2^L x 2^L matrix — test oracle only (L <= ~12)."""
    import numpy as _np

    I = _np.eye(2)
    X = _np.array([[0, 1], [1, 0]], dtype=complex)
    Z = _np.array([[1, 0], [0, -1]], dtype=complex)

    def op_at(op, q):
        m = _np.ones((1, 1), dtype=complex)
        for i in range(L - 1, -1, -1):
            m = _np.kron(m, op if i == q else I)
        return m

    H = _np.zeros((2**L, 2**L), dtype=complex)
    hs = _np.asarray(terms.hs)
    phis = _np.asarray(terms.phis)
    for q in range(L):
        H += hs[q] * op_at(Z, q)
        H += float(terms.x_coeff) * op_at(X, q)
    for q in range(L - 1):
        H += phis[q] * (op_at(Z, q) @ op_at(Z, q + 1))
    return H
