"""Independent dense-numpy oracle for small systems (complex128).

Implements the reference's transpiled circuits literally — ancilla Hadamard
test, gate-by-gate depolarizing channels on every noisy 1q gate exactly where
Aer fires them (see gate-count CSVs; one depol per kick u3 per qubit per
cycle, six depol events on the ancilla u2 gates) — as full density-matrix
evolution. This is the ground truth replacing Aer for parity tests
(BASELINE.md: "Autocorr parity vs Aer, L<=20, <=1e-6"): Aer's shot-sampled
CSV values carry ~1/sqrt(1024) noise, while this oracle is the exact
infinite-shot expectation Aer converges to.

Deliberately written with naive kron/matmul ops — an implementation disjoint
from the library's reshape/einsum kernels.
"""

from __future__ import annotations

import numpy as np

I2 = np.eye(2, dtype=complex)
X = np.array([[0, 1], [1, 0]], dtype=complex)
Y = np.array([[0, -1j], [1j, 0]], dtype=complex)
Z = np.array([[1, 0], [0, -1]], dtype=complex)
H = np.array([[1, 1], [1, -1]], dtype=complex) / np.sqrt(2)


def rx(t):
    return np.cos(t / 2) * I2 - 1j * np.sin(t / 2) * X


def ry(t):
    return np.cos(t / 2) * I2 - 1j * np.sin(t / 2) * Y


def rz(t):
    return np.cos(t / 2) * I2 - 1j * np.sin(t / 2) * Z


def op_on(u, q, n):
    """Full 2^n operator with 2x2 (or 4x4 on qubits q,q+1) u on qubit q.

    Qubit 0 = least significant bit => rightmost kron factor.
    """
    k = int(np.log2(u.shape[0]))
    m = np.ones((1, 1), dtype=complex)
    i = n - 1
    while i >= 0:
        if i == q + k - 1 and k > 1:
            m = np.kron(m, u)
            i -= k
        elif i == q and k == 1:
            m = np.kron(m, u)
            i -= 1
        else:
            m = np.kron(m, I2)
            i -= 1
    return m


def rzz_matrix(phi):
    d = np.exp(-1j * phi / 2 * np.array([1, -1, -1, 1]))
    return np.diag(d)


def cx_matrix(control_high: bool):
    """4x4 CX on adjacent-index pair; control_high: control is the higher bit."""
    m = np.zeros((4, 4), dtype=complex)
    for b in range(4):
        hi, lo = (b >> 1) & 1, b & 1
        if control_high:
            lo2 = lo ^ hi
            m[(hi << 1) | lo2, b] = 1
        else:
            hi2 = hi ^ lo
            m[(hi2 << 1) | lo, b] = 1
    return m


def cx_full(control, target, n):
    p0 = np.array([[1, 0], [0, 0]], dtype=complex)
    p1 = np.array([[0, 0], [0, 1]], dtype=complex)
    return op_on(p0, control, n) + op_on(p1, control, n) @ op_on(X, target, n)


def apply_u(rho, u):
    return u @ rho @ u.conj().T


def depol(rho, q, n, p):
    """qiskit depolarizing_error(p,1): (1-3p/4) rho + p/4 (XrX+YrY+ZrZ)."""
    if p == 0:
        return rho
    out = (1 - 3 * p / 4) * rho
    for pauli in (X, Y, Z):
        pu = op_on(pauli, q, n)
        out = out + (p / 4) * (pu @ rho @ pu.conj().T)
    return out


def kick_gates(polarization, g, time_step, circular_frequency=0.5, xy_cycle_period=5):
    """List of (matrix_fn, angle) 1q kick gates per cycle — one noisy u3 each."""
    if polarization == "xy_cycle":
        axis = "x" if (time_step // xy_cycle_period) % 2 == 0 else "y"
        return [(rx if axis == "x" else ry, np.pi * g)]
    if polarization == "x":
        return [(rx, np.pi * g)]
    if polarization == "y":
        return [(ry, np.pi * g)]
    if polarization == "xy":
        return [(rx, np.pi * g / 2), (ry, np.pi * g / 2)]
    if polarization == "yx":
        return [(ry, np.pi * g / 2), (rx, np.pi * g / 2)]
    if polarization == "circular_left":
        w = circular_frequency
        return [(rx, np.pi * g * np.cos(w * time_step) / np.sqrt(2)),
                (ry, np.pi * g * np.sin(w * time_step) / np.sqrt(2))]
    if polarization == "circular_right":
        w = circular_frequency
        return [(rx, np.pi * g * np.cos(w * time_step) / np.sqrt(2)),
                (ry, -np.pi * g * np.sin(w * time_step) / np.sqrt(2))]
    if polarization == "circular_static":
        return [(rx, np.pi * g / np.sqrt(2)), (ry, np.pi * g / np.sqrt(2))]
    raise ValueError(polarization)


def cycle_ops(L, g, hs, phis, n, *, polarization="x", time_step=0, inverse=False, **kw):
    """Yield ("u", matrix) unitaries and ("d", qubit) depol sites of one cycle.

    System = qubits 0..L-1 of the n-qubit register. Forward order: kicks
    (noise after each), even RZZ, odd RZZ, RZ. Inverse: exact reverse with
    daggered gates, noise still after each (inverse) kick gate.
    """
    ops = []
    kicks = kick_gates(polarization, g, time_step, **kw)
    for fn, ang in kicks:
        layer = np.eye(2**n, dtype=complex)
        # one u3 per qubit; noise after each qubit's gate. Single-qubit depol
        # channels on different qubits commute with the other qubits' gates,
        # so apply the whole kick sub-layer then depol every system qubit.
        for q in range(L):
            layer = op_on(fn(ang), q, n) @ layer
        ops.append(("u", layer))
        ops.append(("dall", list(range(L))))
    diag = np.eye(2**n, dtype=complex)
    for i in range(0, L - 1, 2):
        diag = op_on(rzz_matrix(phis[i]), i, n) @ diag
    for i in range(1, L - 1, 2):
        diag = op_on(rzz_matrix(phis[i]), i, n) @ diag
    for i in range(L):
        diag = op_on(rz(hs[i]), i, n) @ diag
    ops.append(("u", diag))
    if inverse:
        # Inverse cycle: daggered diagonal first, then daggered kick sub-layers
        # in reverse order, noise after each (inverse) kick gate.
        inv = [("u", diag.conj().T)]
        for fn, ang in reversed(kicks):
            layer = np.eye(2**n, dtype=complex)
            for q in range(L):
                layer = op_on(fn(-ang), q, n) @ layer
            inv.append(("u", layer))
            inv.append(("dall", list(range(L))))
        return inv
    return ops


def initial_state_vec(L, n, initial_state):
    idx = 0
    if initial_state == "neel":
        for q in range(1, L, 2):
            idx |= 1 << q
    v = np.zeros(2**n, dtype=complex)
    v[idx] = 1
    return v


def autocorr_dm(
    L, g, hs, phis, t, p, *, echo=False, initial_state="vacuum",
    polarization="x", qubit=None, **kw
):
    """Exact noisy interferometric autocorrelator at time t (ancilla-faithful).

    Ancilla = qubit L (highest). Mirrors qc_qiskit
    (autocorr-delta-a-single-qiskit-fast.py:124-147) with transpiled noise:
    6 depol events on the ancilla u2 (H) gates, one per system qubit per kick.
    g may be a scalar or a length-t array (time-dependent schedule).
    """
    n = L + 1
    anc = L
    q = (L // 2) if qubit is None else qubit
    gs = np.broadcast_to(np.asarray(g, dtype=float), (max(t, 1),))
    psi = initial_state_vec(L, n, initial_state)
    rho = np.outer(psi, psi.conj())

    h_full = op_on(H, anc, n)
    cxg = cx_full(q, anc, n)

    def hd(r):
        r = apply_u(r, h_full)
        return depol(r, anc, n, p)

    # open: h [d]; cz -> h [d] cx h [d]
    rho = hd(rho)
    rho = hd(rho)
    rho = apply_u(rho, cxg)
    rho = hd(rho)
    for step in range(t):
        for kind, payload in cycle_ops(
            L, gs[step], hs, phis, n, polarization=polarization, time_step=step, **kw
        ):
            if kind == "u":
                rho = apply_u(rho, payload)
            else:
                for qq in payload:
                    rho = depol(rho, qq, n, p)
    if echo:
        for step in range(t - 1, -1, -1):
            for kind, payload in cycle_ops(
                L, gs[step], hs, phis, n, polarization=polarization,
                time_step=step, inverse=True, **kw
            ):
                if kind == "u":
                    rho = apply_u(rho, payload)
                else:
                    for qq in payload:
                        rho = depol(rho, qq, n, p)
    # close: cz -> h [d] cx h [d]; then h [d]
    rho = hd(rho)
    rho = apply_u(rho, cxg)
    rho = hd(rho)
    rho = hd(rho)
    za = op_on(Z, anc, n)
    return float(np.real(np.trace(za @ rho)))


def energy_dm(L, g, hs, phis, t, p, *, initial_state="vacuum", polarization="x",
              component="full", **kw):
    """Exact noisy <H> after t cycles, no ancilla, no estimator-circuit noise."""
    n = L
    psi = initial_state_vec(L, n, initial_state)
    rho = np.outer(psi, psi.conj())
    gs = np.broadcast_to(np.asarray(g, dtype=float), (max(t, 1),))
    for step in range(t):
        for kind, payload in cycle_ops(
            L, gs[step], hs, phis, n, polarization=polarization, time_step=step, **kw
        ):
            if kind == "u":
                rho = apply_u(rho, payload)
            else:
                for qq in payload:
                    rho = depol(rho, qq, n, p)
    ham = np.zeros((2**n, 2**n), dtype=complex)
    if component in ("full", "z_only", "z_zz"):
        for i in range(L):
            ham += hs[i] * op_on(Z, i, n)
    if component in ("full", "zz_only", "z_zz"):
        for i in range(L - 1):
            ham += phis[i] * (op_on(Z, i, n) @ op_on(Z, i + 1, n))
    if component in ("full", "x_only"):
        assert np.ndim(g) == 0, "energy Hamiltonian uses the scalar drive g"
        for i in range(L):
            ham += g * np.pi * op_on(X, i, n)
    return float(np.real(np.trace(ham @ rho)))
