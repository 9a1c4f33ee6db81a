"""Gate kernels vs dense linear algebra (SURVEY.md §4 prescription)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dtc_tpu.ops.gates import apply_1q, apply_2q, apply_diag, expect_x, expect_z
from dtc_tpu.ops.kick import apply_uniform_1q_layer, apply_per_qubit_1q_layer, kron_power
from dtc_tpu.ops.diag import zz_z_phase_mask, zz_z_diag_energy, z_sign_mask, cz_sign_mask
from dtc_tpu.ops.paulis import apply_pauli_string, pauli_string_masks, PAULIS

from exact_oracle import op_on, rx, ry, rz, rzz_matrix, X, Y, Z

RNG = np.random.default_rng(42)
DT = jnp.complex128


def rand_state(n):
    v = RNG.normal(size=2**n) + 1j * RNG.normal(size=2**n)
    return (v / np.linalg.norm(v)).astype(np.complex128)


@pytest.mark.parametrize("n,q", [(1, 0), (3, 0), (3, 1), (3, 2), (5, 3)])
def test_apply_1q(n, q):
    psi = rand_state(n)
    u = rx(0.7) @ rz(1.3)
    got = apply_1q(jnp.asarray(psi), jnp.asarray(u), q, n)
    want = op_on(u, q, n) @ psi
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-12)


@pytest.mark.parametrize("n,q1,q2", [(2, 1, 0), (2, 0, 1), (4, 3, 1), (4, 0, 2), (5, 4, 0)])
def test_apply_2q(n, q1, q2):
    psi = rand_state(n)
    u = np.kron(rx(0.3), ry(1.1)) @ rzz_matrix(0.9)
    got = apply_2q(jnp.asarray(psi), jnp.asarray(u), q1, q2, n)
    # oracle: u indexed with q1 as high bit -> embed via permutation-aware kron
    # build dense: sum over basis
    dense = np.zeros((2**n, 2**n), dtype=complex)
    for col in range(2**n):
        b1, b2 = (col >> q1) & 1, (col >> q2) & 1
        for a1 in range(2):
            for a2 in range(2):
                row = (col & ~((1 << q1) | (1 << q2))) | (a1 << q1) | (a2 << q2)
                dense[row, col] += u[(a1 << 1) | a2, (b1 << 1) | b2]
    np.testing.assert_allclose(np.asarray(got), dense @ psi, atol=1e-12)


def test_uniform_layer_matches_sequential():
    n = 9
    psi = rand_state(n)
    u = rx(0.7)
    got = apply_uniform_1q_layer(jnp.asarray(psi), jnp.asarray(u), n)
    want = psi
    for q in range(n):
        want = op_on(u, q, n) @ want
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-12)


def test_uniform_layer_skips_high_qubits():
    # ancilla (highest qubit) untouched
    n, L = 5, 4
    psi = rand_state(n)
    u = ry(1.2)
    got = apply_uniform_1q_layer(jnp.asarray(psi), jnp.asarray(u), L)
    want = psi
    for q in range(L):
        want = op_on(u, q, n) @ want
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-12)


def test_per_qubit_layer():
    n = 8
    psi = rand_state(n)
    us = [rx(0.1 * (q + 1)) @ ry(0.05 * q) for q in range(n)]
    got = apply_per_qubit_1q_layer(jnp.asarray(psi), jnp.asarray(np.stack(us)), n)
    want = psi
    for q in range(n):
        want = op_on(us[q], q, n) @ want
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-12)


def test_kron_power():
    u = rx(0.4)
    np.testing.assert_allclose(
        np.asarray(kron_power(jnp.asarray(u), 3)),
        np.kron(np.kron(u, u), u),
        atol=1e-12,
    )


def test_zz_z_phase_mask_matches_gates():
    n = 6
    hs = RNG.uniform(-np.pi, np.pi, n)
    phis = RNG.uniform(-1.5 * np.pi, -0.5 * np.pi, n - 1)
    psi = rand_state(n)
    got = apply_diag(jnp.asarray(psi), zz_z_phase_mask(jnp.asarray(hs), jnp.asarray(phis), n, dtype=DT))
    want = psi.copy()
    for i in range(0, n - 1, 2):
        want = op_on(rzz_matrix(phis[i]), i, n) @ want
    for i in range(1, n - 1, 2):
        want = op_on(rzz_matrix(phis[i]), i, n) @ want
    for i in range(n):
        want = op_on(rz(hs[i]), i, n) @ want
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-12)


def test_diag_energy_is_zz_z_eigenvalues():
    n = 5
    hs = RNG.uniform(-1, 1, n)
    phis = RNG.uniform(-1, 1, n - 1)
    e = np.asarray(zz_z_diag_energy(jnp.asarray(hs), jnp.asarray(phis), n, dtype=jnp.float64))
    ham = np.zeros((2**n, 2**n), dtype=complex)
    for i in range(n):
        ham += hs[i] * op_on(Z, i, n)
    for i in range(n - 1):
        ham += phis[i] * (op_on(Z, i, n) @ op_on(Z, i + 1, n))
    np.testing.assert_allclose(e, np.real(np.diag(ham)), atol=1e-12)


@pytest.mark.parametrize("codes", [[0, 0, 0], [1, 0, 0], [0, 2, 0], [3, 3, 3], [1, 2, 3], [2, 2, 1]])
def test_pauli_string(codes):
    n = 3
    psi = rand_state(n)
    xm, zm, ny = pauli_string_masks(jnp.asarray(codes, dtype=jnp.int32))
    got = apply_pauli_string(jnp.asarray(psi), xm, zm, ny)
    mats = [np.asarray(PAULIS[c], dtype=complex) for c in codes]
    want = psi
    for q, m in enumerate(mats):
        want = op_on(m, q, n) @ want
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-6)  # PAULIS is c64


def test_expectations():
    n = 4
    psi = rand_state(n)
    for q in range(n):
        np.testing.assert_allclose(
            float(expect_z(jnp.asarray(psi), q, n)),
            np.real(psi.conj() @ (op_on(Z, q, n) @ psi)),
            atol=1e-12,
        )
        np.testing.assert_allclose(
            float(expect_x(jnp.asarray(psi), q, n)),
            np.real(psi.conj() @ (op_on(X, q, n) @ psi)),
            atol=1e-12,
        )


def test_sign_masks():
    n = 4
    for q in range(n):
        s = np.asarray(z_sign_mask(q, n))
        for idx in range(2**n):
            assert s[idx] == (1 - 2 * ((idx >> q) & 1))
    cz = np.asarray(cz_sign_mask(1, 3, n))
    for idx in range(2**n):
        assert cz[idx] == (-1 if ((idx >> 1) & 1) and ((idx >> 3) & 1) else 1)
