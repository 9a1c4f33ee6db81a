"""Multi-device sharding on the virtual 8-CPU mesh: sharded == single-device."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dtc_tpu.core.evolve import autocorr_echo, autocorr_forward
from dtc_tpu.core.statevector import initial_statevector
from dtc_tpu.io.disorder import generate_disorder
from dtc_tpu.models.drives import build_kick_schedule
from dtc_tpu.ops.diag import zz_z_phase_mask
from dtc_tpu.parallel.mesh import make_mesh
from dtc_tpu.parallel.sharded import (
    make_sharded_autocorr_forward,
    make_sharded_echo,
    make_sharded_observables,
)

DT = jnp.complex128
L, T = 6, 5


def _setup(seed=30):
    hs, phis = generate_disorder(L, 1, seed=seed)
    sched = build_kick_schedule("x", 0.9, T)
    return jnp.asarray(hs[0]), jnp.asarray(phis[0]), sched


def test_mesh_shapes():
    mesh = make_mesh(n_amp=4)
    assert mesh.shape == {"traj": 2, "amp": 4}
    mesh = make_mesh(n_amp=8, n_traj=1)
    assert mesh.shape == {"traj": 1, "amp": 8}


@pytest.mark.parametrize("n_amp,n_traj", [(1, 8), (4, 2), (8, 1)])
def test_sharded_forward_noiseless_matches_single(n_amp, n_traj):
    hs, phis, sched = _setup()
    mesh = make_mesh(n_amp=n_amp, n_traj=n_traj)
    fn = make_sharded_autocorr_forward(
        mesh, L=L, T=T, K=1, p=0.0, q=L // 2, dtype=DT)
    keys = jax.random.split(jax.random.PRNGKey(0), n_traj)  # 1 traj per dev row
    a = fn(sched.angles, hs, phis, keys)

    diag = zz_z_phase_mask(hs, phis, L, dtype=DT)
    psi0 = initial_statevector(L, "vacuum", dtype=DT)
    ref = autocorr_forward(psi0, sched.angles, diag, jax.random.PRNGKey(0),
                           L=L, T=T, K=1, p=0.0, q=L // 2)
    np.testing.assert_allclose(np.asarray(a), np.asarray(ref), atol=1e-10)


def test_sharded_forward_noisy_statistics():
    """Sharded noisy trajectories must average to the same value as the
    single-device trajectory engine with the same number of samples."""
    hs, phis, sched = _setup(31)
    p = 0.1
    mesh = make_mesh(n_amp=4, n_traj=2)
    n_traj = 256
    fn = make_sharded_autocorr_forward(mesh, L=L, T=T, K=1, p=p, q=L // 2, dtype=DT)
    keys = jax.random.split(jax.random.PRNGKey(1), n_traj)
    a_shard = np.asarray(fn(sched.angles, hs, phis, keys))

    diag = zz_z_phase_mask(hs, phis, L, dtype=DT)
    psi0 = initial_statevector(L, "vacuum", dtype=DT)
    af = (1 - p) ** 6
    single = jax.vmap(
        lambda k: autocorr_forward(psi0, sched.angles, diag, k, L=L, T=T, K=1,
                                   p=p, q=L // 2, ancilla_factor=af)
    )(jax.random.split(jax.random.PRNGKey(2), 2048))
    mean = np.asarray(single).mean(axis=0)
    sem = np.asarray(single).std(axis=0) / np.sqrt(256)
    assert np.all(np.abs(a_shard - mean) < np.maximum(5 * sem, 0.02))


def test_sharded_pauli_string_exactness():
    """Deterministic check of the sharded global-bit Pauli machinery: with
    p=0 vs p>0 seeded identically on 1 vs 8 amp shards, results agree."""
    hs, phis, sched = _setup(32)
    p = 0.15
    keys = jax.random.split(jax.random.PRNGKey(3), 8)

    mesh1 = make_mesh(n_amp=1, n_traj=8)
    mesh8 = make_mesh(n_amp=8, n_traj=1)
    f1 = make_sharded_autocorr_forward(mesh1, L=L, T=T, K=1, p=p, q=L // 2, dtype=DT)
    f8 = make_sharded_autocorr_forward(mesh8, L=L, T=T, K=1, p=p, q=L // 2, dtype=DT)
    a1 = np.asarray(f1(sched.angles, hs, phis, keys))
    a8 = np.asarray(f8(sched.angles, hs, phis, keys))
    # same trajectory keys, same sampled Pauli strings -> identical results
    np.testing.assert_allclose(a1, a8, atol=1e-10)


def test_sharded_echo_matches_single_device():
    hs, phis, sched = _setup(33)
    p = 0.1
    mesh = make_mesh(n_amp=4, n_traj=2)
    fe = make_sharded_echo(mesh, L=L, T=T, K=1, p=p, q=L // 2, dtype=DT)
    keys = jax.random.split(jax.random.PRNGKey(4), 2)

    mesh1 = make_mesh(n_amp=1, n_traj=2)
    fe1 = make_sharded_echo(mesh1, L=L, T=T, K=1, p=p, q=L // 2, dtype=DT)
    for t in [0, 2, 4]:
        e = float(fe(sched.angles, hs, phis, keys, jnp.asarray(t)))
        e1 = float(fe1(sched.angles, hs, phis, keys, jnp.asarray(t)))
        np.testing.assert_allclose(e, e1, atol=1e-10)
    # noiseless sharded echo identity
    fe0 = make_sharded_echo(mesh, L=L, T=T, K=1, p=0.0, q=L // 2, dtype=DT)
    np.testing.assert_allclose(
        float(fe0(sched.angles, hs, phis, keys, jnp.asarray(3))), 1.0, atol=1e-10)


def _ham_terms(hs, phis, g=0.9):
    from dtc_tpu.models.hamiltonian import hamiltonian_terms

    return hamiltonian_terms(L, g, np.asarray(hs), np.asarray(phis), "full")


@pytest.mark.parametrize("n_amp,n_traj", [(4, 2), (8, 1)])
def test_sharded_observables_noiseless_matches_single(n_amp, n_traj):
    """Energy + per-qubit <Z_i> on the sharded path == single-device engine,
    including the global-qubit <X_q> ppermute pair reduction."""
    from dtc_tpu.core.evolve import evolve_observables
    from dtc_tpu.ops.diag import zz_z_diag_energy

    hs, phis, sched = _setup(34)
    terms = _ham_terms(hs, phis)
    mesh = make_mesh(n_amp=n_amp, n_traj=n_traj)
    fn = make_sharded_observables(mesh, L=L, T=T, K=1, p=0.0, dtype=DT)
    keys = jax.random.split(jax.random.PRNGKey(5), n_traj)
    e, zs = fn(sched.angles, hs, phis, terms.hs, terms.phis,
               jnp.asarray(float(terms.x_coeff)), keys)

    psi0 = initial_statevector(L, "vacuum", dtype=DT)
    diag = zz_z_phase_mask(hs, phis, L, dtype=DT)
    diag_e = zz_z_diag_energy(terms.hs, terms.phis, L, dtype=jnp.float64)
    e_ref, zs_ref = evolve_observables(
        psi0, sched.angles, diag, diag_e, float(terms.x_coeff),
        jax.random.PRNGKey(5), L=L, T=T, K=1, p=0.0)
    np.testing.assert_allclose(np.asarray(e), np.asarray(e_ref), atol=1e-9)
    np.testing.assert_allclose(np.asarray(zs), np.asarray(zs_ref), atol=1e-9)


def test_sharded_observables_noisy_shard_invariance():
    """Same trajectory keys on 1 vs 8 amp shards -> identical noisy results."""
    hs, phis, sched = _setup(35)
    terms = _ham_terms(hs, phis)
    keys = jax.random.split(jax.random.PRNGKey(6), 8)
    kw = dict(L=L, T=T, K=1, p=0.12, dtype=DT)
    f1 = make_sharded_observables(make_mesh(n_amp=1, n_traj=8), **kw)
    f8 = make_sharded_observables(make_mesh(n_amp=8, n_traj=1), **kw)
    args = (sched.angles, hs, phis, terms.hs, terms.phis,
            jnp.asarray(float(terms.x_coeff)), keys)
    e1, z1 = f1(*args)
    e8, z8 = f8(*args)
    np.testing.assert_allclose(np.asarray(e1), np.asarray(e8), atol=1e-9)
    np.testing.assert_allclose(np.asarray(z1), np.asarray(z8), atol=1e-9)


def test_run_energy_sharded_driver(tmp_path):
    from dtc_tpu.experiments.sharded_run import run_energy_sharded
    from dtc_tpu.utils.config import SimConfig

    cfg = SimConfig(L=5, inst=2, tf=4, g=0.9, n_trajectories=8, seed=7)
    res = run_energy_sharded(cfg, nprobs=(0.0, 0.05),
                             out_dir=str(tmp_path), write=True)
    assert res["energy_p_0"].shape == (4,)
    assert res["energy_p_0.05"].shape == (4,)
    assert res["per_qubit_z"][0.0].shape == (4, 5)
    assert np.all(np.abs(res["per_qubit_z"][0.0]) <= 1 + 1e-9)
    import os

    assert os.path.exists(res["csv_path"])


def test_sharded_sigma_frame_matches_sigma_engine_per_trajectory():
    """Sharded forward/echo now presample with core.sigma_evolve, so with
    identical keys they must match the unsharded sigma engine trajectory-
    for-trajectory (not just statistically) at every mesh split."""
    from dtc_tpu.core.sigma_evolve import sigma_echo_batch, sigma_forward_batch

    hs, phis, sched = _setup(36)
    p = 0.12
    keys = jax.random.split(jax.random.PRNGKey(9), 8)
    want = np.asarray(sigma_forward_batch(
        hs[None], phis[None], sched.angles, keys[None], L=L, T=T, K=1, p=p,
        q=L // 2, initial_state="vacuum", dtype_name="complex128",
        ancilla_factor=(1 - p) ** 6, has_y=False)).mean(axis=1)[0]
    for n_amp, n_traj in ((1, 8), (4, 2), (8, 1)):
        mesh = make_mesh(n_amp=n_amp, n_traj=n_traj)
        fn = make_sharded_autocorr_forward(
            mesh, L=L, T=T, K=1, p=p, q=L // 2, dtype=DT)
        got = np.asarray(fn(sched.angles, hs, phis, keys))
        np.testing.assert_allclose(got, want, atol=1e-10)

    want_e = np.asarray(sigma_echo_batch(
        hs[None], phis[None], sched.angles, keys[None], jnp.asarray([3]),
        L=L, T=T, K=1, p=p, q=L // 2, initial_state="vacuum",
        dtype_name="complex128", ancilla_factor=(1 - p) ** 6,
        has_y=False)).mean(axis=1)[0, 0]
    fe = make_sharded_echo(make_mesh(n_amp=4, n_traj=2), L=L, T=T, K=1, p=p,
                           q=L // 2, dtype=DT)
    got_e = float(fe(sched.angles, hs, phis, keys, jnp.asarray(3)))
    np.testing.assert_allclose(got_e, want_e, atol=1e-10)


def test_sharded_sigma_frame_has_y():
    """y-polarized drives through the sharded sigma frame (sigma-conjugated
    kicks on local AND shard-id bits) vs the unsharded sigma engine."""
    from dtc_tpu.core.sigma_evolve import sigma_forward_batch

    hs, phis, _ = _setup(37)
    sched = build_kick_schedule("y", 0.9, T)
    p = 0.1
    keys = jax.random.split(jax.random.PRNGKey(10), 8)
    want = np.asarray(sigma_forward_batch(
        hs[None], phis[None], sched.angles, keys[None], L=L, T=T, K=1, p=p,
        q=L // 2, initial_state="vacuum", dtype_name="complex128",
        ancilla_factor=1.0, has_y=True)).mean(axis=1)[0]
    fn = make_sharded_autocorr_forward(
        make_mesh(n_amp=8, n_traj=1), L=L, T=T, K=1, p=p, q=L // 2, dtype=DT,
        ancilla_factor=1.0, has_y=True)
    got = np.asarray(fn(sched.angles, hs, phis, keys))
    np.testing.assert_allclose(got, want, atol=1e-10)


def test_sharded_echo_has_y_matches_sigma_engine():
    """y-drive ECHO through the sharded path: the echo scan's run-time
    direction select (inv_t dagger in _sharded_kick_factored) must
    reproduce the unsharded sigma engine's inverse kicks exactly —
    including the sigma-conjugated theta_y signs."""
    from dtc_tpu.core.sigma_evolve import sigma_echo_batch

    hs, phis, _ = _setup(38)
    sched = build_kick_schedule("y", 0.9, T)
    p = 0.12
    keys = jax.random.split(jax.random.PRNGKey(11), 8)
    want = np.asarray(sigma_echo_batch(
        hs[None], phis[None], sched.angles, keys[None], jnp.asarray([3]),
        L=L, T=T, K=1, p=p, q=L // 2, initial_state="vacuum",
        dtype_name="complex128", ancilla_factor=1.0,
        has_y=True)).mean(axis=1)[0, 0]
    fe = make_sharded_echo(make_mesh(n_amp=4, n_traj=2), L=L, T=T, K=1, p=p,
                           q=L // 2, dtype=DT, ancilla_factor=1.0, has_y=True)
    got = float(fe(sched.angles, hs, phis, keys, jnp.asarray(3)))
    np.testing.assert_allclose(got, want, atol=1e-10)


def test_sharded_estimator_noise_matches_unsharded_semantics():
    """Estimator shot noise is applied per-(instance, t) BEFORE the
    instance mean on the sharded path too — same seed, same draws, so at
    p=0 (deterministic engines) the sharded and unsharded energy columns
    must agree exactly, noise included. Averaging first would shrink the
    emulated 1/sqrt(shots) error by sqrt(inst)."""
    from dtc_tpu.experiments.energy import run_energy
    from dtc_tpu.experiments.sharded_run import run_energy_sharded
    from dtc_tpu.utils.config import SimConfig

    cfg = SimConfig(L=5, inst=3, tf=4, g=0.9, seed=7, estimator_shots=1024)
    hs, phis = generate_disorder(cfg.L, cfg.inst, seed=50)
    exact = run_energy(cfg.replace(estimator_shots=0), hs, phis,
                       nprobs=(0.0,), write=False)["energy_p_0"]
    noisy = run_energy(cfg, hs, phis, nprobs=(0.0,), write=False)["energy_p_0"]
    shard = run_energy_sharded(cfg, hs, phis, nprobs=(0.0,),
                               write=False)["energy_p_0"]
    # identical gaussian draws; engines differ only at f32 level (~1e-6),
    # far below the ~0.03 draw magnitude a mean-then-noise bug would shift
    np.testing.assert_allclose(shard, noisy, atol=1e-5)
    # and the noise is actually there
    assert np.max(np.abs(np.asarray(noisy) - np.asarray(exact))) > 1e-4
