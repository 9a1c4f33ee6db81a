"""Blocked observables kernel (ops/pallas_observables) — interpret-mode
parity + energy engine dispatch.

The kernel is the TPU engine for the energy/per-qubit-Z study
(autocorr-delta-a-single-qiskit-fast-energy.py:83-102,168-172;
dtc_qasm.py:109-126): its math is pinned here trajectory-for-trajectory
against core.evolve.evolve_observables (which itself is pinned against the
exact density-matrix oracle in tests/test_experiments.py /
tests/test_floquet.py), sharing one uniform noise stream.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dtc_tpu.core.evolve import evolve_observables
from dtc_tpu.core.statevector import initial_statevector
from dtc_tpu.io.disorder import generate_disorder
from dtc_tpu.models.drives import build_kick_schedule, n_kick_slots
from dtc_tpu.models.hamiltonian import hamiltonian_terms
from dtc_tpu.ops.diag import zz_z_diag_energy, zz_z_phase_mask
from dtc_tpu.ops.pallas_observables import observables_forward_batch

L, T = 17, 3


def _reference(sched, hsj, phj, th, tph, xc, keys, K, p, component="full",
               initial_state="vacuum"):
    psi0 = initial_statevector(L, initial_state, dtype=jnp.complex64)
    diag = zz_z_phase_mask(hsj, phj, L, dtype=jnp.complex64)
    diag_e = zz_z_diag_energy(th, tph, L, dtype=jnp.float32)
    with_x = bool(float(xc) != 0.0)
    return jax.vmap(
        lambda k: evolve_observables(psi0, sched.angles, diag, diag_e,
                                     jnp.asarray(float(xc)), k,
                                     L=L, T=T, K=K, p=p, with_x=with_x)
    )(keys)


def _setup(component="full"):
    hs, phis = generate_disorder(L, 1, seed=11)
    terms = hamiltonian_terms(L, 0.93, hs[0], phis[0], component)
    return (jnp.asarray(hs[:, :L]), jnp.asarray(phis[:, : L - 1]),
            jnp.asarray(terms.hs), jnp.asarray(terms.phis),
            float(terms.x_coeff))


@pytest.mark.parametrize("pol,p", [("x", 0.0), ("y", 0.3)])
def test_obs_kernel_trajectory_exact(pol, p):
    """Energies (diag + transverse) and every per-qubit <Z_q> match
    evolve_observables per-trajectory on shared keys — noiseless and with
    eager lab-frame Pauli noise."""
    hsj, phj, th, tph, xc = _setup()
    K = n_kick_slots(pol)
    sched = build_kick_schedule(pol, 0.93, T)
    keys = jax.random.split(jax.random.PRNGKey(3), 2)
    e_d, x_s, zs = observables_forward_batch(
        hsj, phj, th[None], tph[None], sched.angles, keys[None],
        L=L, T=T, K=K, p=p, interpret=True)
    e_k = np.asarray(e_d + xc * x_s)[0]
    zs_k = np.asarray(zs)[0]
    e_ref, zs_ref = _reference(sched, hsj[0], phj[0], th, tph, xc, keys, K, p)
    assert np.max(np.abs(e_k - np.asarray(e_ref))) < 2e-3, (e_k, e_ref)
    assert np.max(np.abs(zs_k - np.asarray(zs_ref))) < 1e-4


@pytest.mark.slow
def test_obs_kernel_multi_block_measure(monkeypatch):
    """n_bt >= 2 measure path (DTC_TPU_BLOCKED_BT=8 at L=18 forces two
    TOP blocks per plane): the per-block marginal accumulation, top-bit
    sign contraction and the low/mid/top X passes must compose across
    blocks exactly — the class the L=20 bench shape runs (bt=32, n_bt=2)
    that the L=17 single-block case cannot exercise."""
    monkeypatch.setenv("DTC_TPU_BLOCKED_BT", "8")
    L18, T18 = 18, 3
    hs, phis = generate_disorder(L18, 1, seed=13)
    terms = hamiltonian_terms(L18, 0.97, hs[0], phis[0], "full")
    hsj = jnp.asarray(hs[:, :L18])
    phj = jnp.asarray(phis[:, : L18 - 1])
    th = jnp.asarray(terms.hs)
    tph = jnp.asarray(terms.phis)
    xc = float(terms.x_coeff)
    keys = jax.random.split(jax.random.PRNGKey(3), 1)
    sched = build_kick_schedule("y", 0.97, T18)
    e_d, x_s, zs = observables_forward_batch(
        hsj, phj, th[None], tph[None], sched.angles, keys[None],
        L=L18, T=T18, K=1, p=0.25, interpret=True)
    e_k = np.asarray(e_d + xc * x_s)[0]

    from dtc_tpu.core.statevector import initial_statevector
    psi0 = initial_statevector(L18, "vacuum", dtype=jnp.complex64)
    diag = zz_z_phase_mask(hsj[0], phj[0], L18, dtype=jnp.complex64)
    diag_e = zz_z_diag_energy(th, tph, L18, dtype=jnp.float32)
    e_ref, zs_ref = jax.vmap(
        lambda k: evolve_observables(psi0, sched.angles, diag, diag_e,
                                     jnp.asarray(xc), k,
                                     L=L18, T=T18, K=1, p=0.25)
    )(keys)
    assert np.max(np.abs(e_k - np.asarray(e_ref))) < 5e-3, (e_k, e_ref)
    assert np.max(np.abs(np.asarray(zs)[0] - np.asarray(zs_ref))) < 1e-4


@pytest.mark.slow
def test_obs_kernel_k2_and_components():
    """K=2 slot structure (xy drive) + component Hamiltonians: z_zz
    (with_x=False skips the adjacency dots) and x_only (pure transverse)
    agree with the XLA engine on the same trajectories; neel initial
    state rides along."""
    hs, phis = generate_disorder(L, 1, seed=12)
    hsj = jnp.asarray(hs[:, :L])
    phj = jnp.asarray(phis[:, : L - 1])
    K = n_kick_slots("xy")
    sched = build_kick_schedule("xy", 0.93, T)
    keys = jax.random.split(jax.random.PRNGKey(5), 1)
    for component, init in (("z_zz", "vacuum"), ("x_only", "neel")):
        terms = hamiltonian_terms(L, 0.93, hs[0], phis[0], component)
        th = jnp.asarray(terms.hs)
        tph = jnp.asarray(terms.phis)
        xc = float(terms.x_coeff)
        e_d, x_s, zs = observables_forward_batch(
            hsj, phj, th[None], tph[None], sched.angles, keys[None],
            L=L, T=T, K=K, p=0.2, initial_state=init,
            with_x=bool(xc != 0.0), interpret=True)
        e_k = np.asarray(e_d + xc * x_s if xc != 0.0 else e_d)[0]
        e_ref, zs_ref = _reference(sched, hsj[0], phj[0], th, tph, xc, keys,
                                   K, 0.2, initial_state=init)
        assert np.max(np.abs(e_k - np.asarray(e_ref))) < 2e-3, (
            component, e_k, e_ref)
        assert np.max(np.abs(np.asarray(zs)[0] - np.asarray(zs_ref))) < 1e-4


@pytest.mark.slow
def test_obs_kernel_instance_vmap_exact():
    """The builder vmaps per_instance over the disorder-instance axis
    (pallas under vmap prepends a grid dimension — the 'batches in the
    grid' rule); a 2-instance batch must be bit-identical to two
    separate calls. Verified bit-exact on real Mosaic at L=20 too
    (round-5 session log)."""
    hs, phis = generate_disorder(L, 2, seed=11)
    t0 = hamiltonian_terms(L, 0.97, hs[0], phis[0], "full")
    t1 = hamiltonian_terms(L, 0.97, hs[1], phis[1], "full")
    th = jnp.stack([jnp.asarray(t0.hs), jnp.asarray(t1.hs)])
    tph = jnp.stack([jnp.asarray(t0.phis), jnp.asarray(t1.phis)])
    keys = jax.random.split(jax.random.PRNGKey(3), 2).reshape(2, 1, 2)
    sched = build_kick_schedule("x", 0.97, 2)
    kw = dict(L=L, T=2, K=1, p=0.3, interpret=True)
    e2, _, z2 = observables_forward_batch(
        jnp.asarray(hs), jnp.asarray(phis), th, tph, sched.angles, keys,
        **kw)
    for i in range(2):
        e1, _, z1 = observables_forward_batch(
            jnp.asarray(hs[i:i + 1]), jnp.asarray(phis[i:i + 1]),
            th[i:i + 1], tph[i:i + 1], sched.angles, keys[i:i + 1], **kw)
        assert np.array_equal(np.asarray(e2)[i], np.asarray(e1)[0])
        assert np.array_equal(np.asarray(z2)[i], np.asarray(z1)[0])


def test_energy_engine_env_dispatch(monkeypatch):
    """DTC_TPU_ENERGY_ENGINE contract: bogus raises, kernel on CPU raises
    (never a silent deopt); the auto route at 17<=L<=23 on a (stubbed) TPU
    backend selects the kernel; L >= 24 XLA fallback raises the loud guard
    before any compute."""
    from dtc_tpu.experiments import energy as energy_mod
    from dtc_tpu.experiments.engine import build_context
    from dtc_tpu.utils.config import SimConfig

    cfg = SimConfig(L=4, tf=2, g=0.9, n_trajectories=2, noise_prob=0.05,
                    use_noise=1)
    hs, phis = generate_disorder(4, 1, seed=1)
    monkeypatch.setenv("DTC_TPU_ENERGY_ENGINE", "bogus")
    with pytest.raises(ValueError, match="DTC_TPU_ENERGY_ENGINE"):
        energy_mod._energy_single_noise(cfg, hs, phis, 0.05)
    monkeypatch.setenv("DTC_TPU_ENERGY_ENGINE", "kernel")
    with pytest.raises(ValueError, match="kernel engine requires"):
        energy_mod._energy_single_noise(cfg, hs, phis, 0.05)
    monkeypatch.delenv("DTC_TPU_ENERGY_ENGINE")

    # stubbed TPU backend: kernel branch selection at L=20, loud guard at 24
    monkeypatch.setattr(energy_mod.jax, "default_backend", lambda: "tpu")
    hit = []

    def stub(hs_j, phis_j, th, tph, angles, keys, **kw):
        hit.append(kw["L"])
        c = keys.shape[1]
        z = jnp.zeros((hs_j.shape[0], c, kw["T"]))
        return z, z, jnp.zeros((hs_j.shape[0], c, kw["T"], kw["L"]))

    import dtc_tpu.ops.pallas_observables as po

    monkeypatch.setattr(po, "observables_forward_batch", stub)
    cfg20 = SimConfig(L=20, tf=2, g=0.9, n_trajectories=2, noise_prob=0.05,
                      use_noise=1)
    hs20, phis20 = generate_disorder(20, 1, seed=1)
    e, zs = energy_mod._energy_single_noise(cfg20, hs20, phis20, 0.05)
    assert hit == [20] and e.shape == (1, 2) and zs.shape == (1, 2, 20)

    cfg24 = SimConfig(L=24, tf=2, g=0.9, n_trajectories=2, noise_prob=0.05,
                      use_noise=1, polarization="y")
    cfg24 = cfg24.replace(tf=2048)  # tf*K over the kernel bound -> XLA guard
    hs24, phis24 = generate_disorder(24, 1, seed=1)
    with pytest.raises(ValueError, match="eager-noise"):
        energy_mod._energy_single_noise(cfg24, hs24, phis24, 0.05)

    # 17 <= L <= 23 missing the kernel bounds must NOT silently fall to
    # the TPU XLA route (this backend mis-evaluates its noisy X terms at
    # these sizes — round-5 measured finding, _guard_energy_xla); an
    # explicit xla override is the documented escape hatch
    cfg20_long = cfg20.replace(tf=2048)
    with pytest.raises(ValueError, match="mis-evaluates"):
        energy_mod._energy_single_noise(cfg20_long, hs20, phis20, 0.05)
