"""End-to-end Floquet physics vs the dense oracle (noiseless + exact noisy)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dtc_tpu.core.evolve import autocorr_echo, autocorr_forward
from dtc_tpu.core.density import (
    dm_autocorr_echo,
    dm_autocorr_forward,
    dm_autocorr_interferometric,
    dm_energy,
    dm_vec_to_matrix,
    energy_weight_vector,
    pure_dm_vec,
)
from dtc_tpu.core.statevector import initial_statevector
from dtc_tpu.models.drives import build_kick_schedule, n_kick_slots
from dtc_tpu.models.hamiltonian import hamiltonian_terms
from dtc_tpu.ops.diag import zz_z_phase_mask

import exact_oracle as oracle

DT = jnp.complex128
RNG = np.random.default_rng(7)


def disorder(L):
    hs = RNG.uniform(-np.pi, np.pi, L)
    phis = RNG.uniform(-1.5 * np.pi, -0.5 * np.pi, L - 1)
    return hs, phis


def setup(L, g, T, pol="x", initial_state="vacuum", **kw):
    hs, phis = disorder(L)
    sched = build_kick_schedule(pol, g, T, **kw)
    diag = zz_z_phase_mask(jnp.asarray(hs), jnp.asarray(phis), L, dtype=DT)
    psi0 = initial_statevector(L, initial_state, dtype=DT)
    return hs, phis, sched, diag, psi0


@pytest.mark.parametrize("pol", ["x", "xy", "yx", "circular_left", "xy_cycle"])
@pytest.mark.parametrize("state", ["vacuum", "neel"])
def test_noiseless_autocorr_matches_oracle(pol, state):
    L, g, T = 4, 0.84, 6
    hs, phis, sched, diag, psi0 = setup(L, g, T, pol, state)
    a = autocorr_forward(
        psi0, sched.angles, diag, jax.random.PRNGKey(0),
        L=L, T=T, K=sched.K, p=0.0, q=L // 2,
    )
    for t in range(T):
        want = oracle.autocorr_dm(
            L, g, hs, phis, t, 0.0, initial_state=state, polarization=pol
        )
        np.testing.assert_allclose(float(a[t]), want, atol=1e-10)


def test_noiseless_echo_is_identity():
    L, g, T = 5, 0.97, 8
    for pol in ("x", "xy", "circular_right"):
        hs, phis, sched, diag, psi0 = setup(L, g, T, pol)
        for t in [0, 3, T - 1]:
            e = autocorr_echo(
                psi0, sched.angles, diag, jax.random.PRNGKey(1), jnp.asarray(t),
                L=L, T=T, K=sched.K, p=0.0, q=L // 2,
            )
            np.testing.assert_allclose(float(e), 1.0, atol=1e-10)


def test_noiseless_echo_oracle_cross_check():
    # also cross-check a time-dependent drive's echo against the oracle
    L, g, T = 3, 0.9, 4
    hs, phis, sched, diag, psi0 = setup(L, g, T, "circular_left")
    for t in [1, 3]:
        e = autocorr_echo(
            psi0, sched.angles, diag, jax.random.PRNGKey(1), jnp.asarray(t),
            L=L, T=T, K=sched.K, p=0.0, q=L // 2,
        )
        want = oracle.autocorr_dm(
            L, g, hs, phis, t, 0.0, echo=True, polarization="circular_left"
        )
        np.testing.assert_allclose(float(e), want, atol=1e-10)


@pytest.mark.parametrize("pol", ["x", "xy"])
def test_dm_forward_matches_oracle_noisy(pol):
    L, g, T, p = 3, 0.84, 5, 0.05
    hs, phis, sched, diag, psi0 = setup(L, g, T, pol)
    a = dm_autocorr_forward(
        psi0, sched.angles, diag, L=L, T=T, K=sched.K, p=p, q=L // 2
    )
    for t in range(T):
        want = oracle.autocorr_dm(L, g, hs, phis, t, p, polarization=pol)
        np.testing.assert_allclose(float(a[t]), want, atol=1e-10)


def test_dm_echo_matches_oracle_noisy():
    L, g, T, p = 3, 0.9, 4, 0.08
    hs, phis, sched, diag, psi0 = setup(L, g, T, "x")
    for t in [0, 2, 3]:
        e = dm_autocorr_echo(
            psi0, sched.angles, diag, jnp.asarray(t),
            L=L, T=T, K=sched.K, p=p, q=L // 2,
        )
        want = oracle.autocorr_dm(L, g, hs, phis, t, p, echo=True)
        np.testing.assert_allclose(float(e), want, atol=1e-10)


def test_interferometric_equals_direct_mode():
    """(1-p)^6-factored direct mode == literal ancilla circuit, exactly."""
    L, g, T, p = 3, 0.84, 4, 0.07
    hs, phis, sched, diag, psi0 = setup(L, g, T, "x")
    a = dm_autocorr_forward(
        psi0, sched.angles, diag, L=L, T=T, K=sched.K, p=p, q=L // 2
    )
    for t in [0, 2, 3]:
        lit = dm_autocorr_interferometric(
            psi0, sched.angles, diag, t, L=L, K=sched.K, p=p
        )
        np.testing.assert_allclose(float(a[t]), lit, atol=1e-10)


def test_dm_energy_matches_oracle():
    L, g, T, p = 3, 0.9, 5, 0.05
    hs, phis, sched, diag, psi0 = setup(L, g, T, "x")
    for component in ("full", "z_zz", "x_only"):
        terms = hamiltonian_terms(L, g, hs, phis, component)
        w = energy_weight_vector(terms, L, dtype=DT)
        e = dm_energy(psi0, sched.angles, diag, w, L=L, T=T, K=sched.K, p=p)
        for t in range(T):
            want = oracle.energy_dm(L, g, hs, phis, t, p, component=component)
            np.testing.assert_allclose(float(e[t]), want, atol=1e-9)


def test_trajectory_mean_converges_to_dm():
    """vmapped Pauli-twirl trajectories average to the exact DM value."""
    L, g, T, p = 3, 0.84, 4, 0.1
    hs, phis, sched, diag, psi0 = setup(L, g, T, "x")
    exact = dm_autocorr_forward(
        psi0, sched.angles, diag, L=L, T=T, K=sched.K, p=p, q=L // 2
    )
    n_traj = 6000
    keys = jax.random.split(jax.random.PRNGKey(11), n_traj)
    af = (1 - p) ** 6

    traj = jax.vmap(
        lambda k: autocorr_forward(
            psi0, sched.angles, diag, k,
            L=L, T=T, K=sched.K, p=p, q=L // 2, ancilla_factor=af,
        )
    )(keys)
    mean = np.asarray(traj).mean(axis=0)
    sem = np.asarray(traj).std(axis=0) / np.sqrt(n_traj)
    err = np.abs(mean - np.asarray(exact))
    assert np.all(err <= np.maximum(4 * sem, 5e-3)), (err, 4 * sem)


def test_dm_vec_roundtrip():
    L = 3
    psi = RNG.normal(size=2**L) + 1j * RNG.normal(size=2**L)
    psi = jnp.asarray(psi / np.linalg.norm(psi), dtype=DT)
    vec = pure_dm_vec(psi, L)
    rho = dm_vec_to_matrix(vec, L)
    np.testing.assert_allclose(
        np.asarray(rho), np.outer(np.asarray(psi), np.conj(np.asarray(psi))), atol=1e-12
    )


def test_pauli_string_terms_match_dense():
    """Exported (pauli, coeff) list rebuilds exactly dense_hamiltonian, and
    the device-register padded/layout variant places operators correctly."""
    from dtc_tpu.models.hamiltonian import (
        dense_hamiltonian,
        hamiltonian_terms,
        pauli_string_terms,
    )

    L, g = 3, 0.9
    hs = np.array([0.3, -0.7, 1.1])
    phis = np.array([-0.4, 0.9])
    terms = hamiltonian_terms(L, g, hs, phis, "full")

    I = np.eye(2)
    X = np.array([[0, 1], [1, 0]], dtype=complex)
    Z = np.array([[1, 0], [0, -1]], dtype=complex)
    OPS = {"I": I, "X": X, "Z": Z}

    def dense_from_strings(pairs, n):
        H = np.zeros((2**n, 2**n), dtype=complex)
        for s, c in pairs:
            m = np.ones((1, 1), dtype=complex)
            for ch in s:  # little-endian: leftmost char = qubit n-1
                m = np.kron(m, OPS[ch])
            H += c * m
        return H

    pairs = pauli_string_terms(L, terms)
    np.testing.assert_allclose(
        dense_from_strings(pairs, L), dense_hamiltonian(L, terms), atol=1e-12)

    # padded register: identity on unused qubits, same spectrum block count
    padded = pauli_string_terms(L, terms, num_qubits=5)
    assert all(len(s) == 5 for s, _ in padded)
    assert len(padded) == len(pairs)
    # with layout [2,3,4] every operator lands on the top three qubits
    laid = pauli_string_terms(L, terms, num_qubits=5, layout=[2, 3, 4])
    for s, _ in laid:
        assert set(s[-2:]) == {"I"}  # qubits 0,1 untouched

    # component selection drops zero terms (x_only -> only X strings)
    xo = pauli_string_terms(L, hamiltonian_terms(L, g, hs, phis, "x_only"))
    assert len(xo) == L and all("Z" not in s for s, _ in xo)
