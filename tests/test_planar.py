"""Planar-real Pallas fast path vs oracle (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dtc_tpu.core.planar_evolve import planar_forward_batch
from dtc_tpu.io.disorder import generate_disorder
from dtc_tpu.models.drives import build_kick_schedule

import exact_oracle as oracle


def _run(L, T, p, n_traj, seed=60, g=0.9, initial_state="vacuum"):
    hs, phis = generate_disorder(L, 1, seed=seed)
    sched = build_kick_schedule("x", g, T)
    keys = jax.random.split(jax.random.PRNGKey(1), n_traj)[None]
    out = planar_forward_batch(
        jnp.asarray(hs[:, :L], jnp.float32), jnp.asarray(phis[:, :L - 1], jnp.float32),
        sched.angles, keys, L=L, T=T, p=p, q=L // 2,
        initial_state=initial_state, dtype_name="complex64",
        ancilla_factor=(1 - p) ** 6 if p else 1.0, interpret=True)
    return hs, phis, np.asarray(out)[0]


def test_planar_noiseless_exact():
    hs, phis, vals = _run(4, 6, 0.0, 1)
    for t in range(6):
        want = oracle.autocorr_dm(4, 0.9, hs[0], phis[0], t, 0.0)
        np.testing.assert_allclose(vals[0, t], want, atol=2e-6)


def test_planar_neel_noiseless():
    hs, phis, vals = _run(5, 5, 0.0, 1, initial_state="neel")
    for t in range(5):
        want = oracle.autocorr_dm(5, 0.9, hs[0], phis[0], t, 0.0,
                                  initial_state="neel")
        np.testing.assert_allclose(vals[0, t], want, atol=2e-6)


@pytest.mark.slow  # planar is a non-default engine (DTC_TPU_ENGINE=planar); mean-parity stays quick
def test_planar_noisy_matches_oracle():
    hs, phis, vals = _run(3, 4, 0.1, 4000)
    mean = vals.mean(axis=0)
    sem = vals.std(axis=0) / np.sqrt(vals.shape[0])
    for t in range(4):
        want = oracle.autocorr_dm(3, 0.9, hs[0], phis[0], t, 0.1)
        assert abs(mean[t] - want) < max(5 * sem[t], 6e-3), (t, mean[t], want)


def test_planar_matches_sigma_engine_mean():
    from dtc_tpu.core.sigma_evolve import sigma_forward_batch

    L, T, p = 4, 5, 0.15
    hs, phis = generate_disorder(L, 1, seed=61)
    sched = build_kick_schedule("x", 0.9, T)
    keys = jax.random.split(jax.random.PRNGKey(2), 3000)[None]
    hj = jnp.asarray(hs[:, :L], jnp.float32)
    pj = jnp.asarray(phis[:, :L - 1], jnp.float32)
    a1 = np.asarray(planar_forward_batch(
        hj, pj, sched.angles, keys, L=L, T=T, p=p, q=L // 2,
        initial_state="vacuum", dtype_name="complex64",
        ancilla_factor=(1 - p) ** 6, interpret=True))[0].mean(axis=0)
    a2 = np.asarray(sigma_forward_batch(
        hj, pj, sched.angles, keys, L=L, T=T, K=1, p=p, q=L // 2,
        initial_state="vacuum", dtype_name="complex64",
        ancilla_factor=(1 - p) ** 6, has_y=False))[0].mean(axis=0)
    # same presampled noise stream (same keys): trajectories should agree
    # almost exactly, not just in distribution
    np.testing.assert_allclose(a1, a2, atol=1e-4)
