"""Sigma-frame (gather-free) trajectory engine vs oracle and invariants."""

import jax
import jax.numpy as jnp
import numpy as np

from dtc_tpu.core.sigma_evolve import sigma_echo_batch, sigma_forward_batch
from dtc_tpu.io.disorder import generate_disorder

from dtc_tpu.models.drives import build_kick_schedule

import exact_oracle as oracle


def _run_forward(L, T, p, pol, n_traj, seed=50, g=0.9):
    hs, phis = generate_disorder(L, 1, seed=seed)
    sched = build_kick_schedule(pol, g, T)
    keys = jax.random.split(jax.random.PRNGKey(1), n_traj)[None]
    out = sigma_forward_batch(
        jnp.asarray(hs[:, :L]), jnp.asarray(phis[:, :L - 1]), sched.angles,
        keys, L=L, T=T, K=sched.K, p=p, q=L // 2, initial_state="vacuum",
        dtype_name="complex128", ancilla_factor=(1 - p) ** 6 if p else 1.0,
        has_y=pol != "x")
    return hs, phis, np.asarray(out)[0]


def test_sigma_noiseless_exact():
    hs, phis, vals = _run_forward(4, 5, 0.0, "x", 1)
    for t in range(5):
        want = oracle.autocorr_dm(4, 0.9, hs[0], phis[0], t, 0.0)
        np.testing.assert_allclose(vals[0, t], want, atol=1e-10)


def test_sigma_noisy_x_matches_oracle():
    hs, phis, vals = _run_forward(3, 4, 0.1, "x", 4000)
    mean = vals.mean(axis=0)
    sem = vals.std(axis=0) / np.sqrt(vals.shape[0])
    for t in range(4):
        want = oracle.autocorr_dm(3, 0.9, hs[0], phis[0], t, 0.1)
        assert abs(mean[t] - want) < max(5 * sem[t], 5e-3), (t, mean[t], want)


def test_sigma_noisy_xy_matches_oracle():
    """xy polarization exercises the sigma-conjugated (per-qubit) kick path."""
    hs, phis, vals = _run_forward(3, 4, 0.1, "xy", 4000)
    mean = vals.mean(axis=0)
    for t in range(4):
        want = oracle.autocorr_dm(3, 0.9, hs[0], phis[0], t, 0.1,
                                  polarization="xy")
        assert abs(mean[t] - want) < 0.02, (t, mean[t], want)


def test_sigma_noisy_y_pol_matches_oracle():
    hs, phis, vals = _run_forward(3, 4, 0.12, "y", 4000)
    mean = vals.mean(axis=0)
    for t in range(4):
        want = oracle.autocorr_dm(3, 0.9, hs[0], phis[0], t, 0.12,
                                  polarization="y")
        assert abs(mean[t] - want) < 0.02, (t, mean[t], want)


def test_sigma_echo_noiseless_identity_and_oracle():
    L, T, p = 3, 4, 0.1
    hs, phis = generate_disorder(L, 1, seed=51)
    sched = build_kick_schedule("x", 0.9, T)
    ts = jnp.arange(T)
    # noiseless identity
    keys = jax.random.split(jax.random.PRNGKey(2), 1)[None]
    e0 = sigma_echo_batch(
        jnp.asarray(hs[:, :L]), jnp.asarray(phis[:, :L - 1]), sched.angles,
        keys, ts, L=L, T=T, K=1, p=0.0, q=L // 2, initial_state="vacuum",
        dtype_name="complex128", ancilla_factor=1.0, has_y=False)
    np.testing.assert_allclose(np.asarray(e0)[0, 0], 1.0, atol=1e-10)
    # noisy vs oracle
    keys = jax.random.split(jax.random.PRNGKey(3), 3000)[None]
    e = np.asarray(sigma_echo_batch(
        jnp.asarray(hs[:, :L]), jnp.asarray(phis[:, :L - 1]), sched.angles,
        keys, ts, L=L, T=T, K=1, p=p, q=L // 2, initial_state="vacuum",
        dtype_name="complex128", ancilla_factor=(1 - p) ** 6, has_y=False))
    mean = e[0].mean(axis=0)
    for t in range(T):
        want = oracle.autocorr_dm(L, 0.9, hs[0], phis[0], t, p, echo=True)
        assert abs(mean[t] - want) < 0.03, (t, mean[t], want)


def test_sigma_matches_gather_engine_statistically():
    """Same physics as the gather-based engine (different RNG stream)."""
    from dtc_tpu.core.evolve import autocorr_forward
    from dtc_tpu.core.statevector import initial_statevector
    from dtc_tpu.ops.diag import zz_z_phase_mask

    L, T, p = 4, 5, 0.15
    hs, phis, vals = _run_forward(L, T, p, "x", 3000, seed=52)
    mean_sigma = vals.mean(axis=0)

    diag = zz_z_phase_mask(jnp.asarray(hs[0, :L]), jnp.asarray(phis[0, :L - 1]),
                           L, dtype=jnp.complex128)
    psi0 = initial_statevector(L, "vacuum", dtype=jnp.complex128)
    g = jax.vmap(lambda k: autocorr_forward(
        psi0, build_kick_schedule("x", 0.9, T).angles, diag, k,
        L=L, T=T, K=1, p=p, q=L // 2, ancilla_factor=(1 - p) ** 6))
    vals_g = np.asarray(g(jax.random.split(jax.random.PRNGKey(9), 3000)))
    assert np.all(np.abs(mean_sigma - vals_g.mean(axis=0)) < 0.03)
