"""Cycle-kernel sharded engine (docs/PERFORMANCE.md roadmap #4) vs the XLA
sharded engine on the virtual CPU mesh, Pallas interpret mode.

Both engines presample noise identically (one presample_noise call per
trajectory key), so with the same keys they must agree trajectory-for-
trajectory — any factorization error at the shard boundary (boundary bond
placement, shard-bit kick order, sigma signs on global bits) shows up as a
deterministic mismatch, not statistical noise. p=0.6 forces sampled Pauli
events on most qubits every cycle.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # minutes of interpret-mode kernel math;
# `-m 'not slow'` gives the quick loop, the full suite runs them

from dtc_tpu.io.disorder import generate_disorder  # noqa: E402
from dtc_tpu.models.drives import build_kick_schedule
from dtc_tpu.parallel.mesh import make_mesh
from dtc_tpu.parallel.sharded import (
    make_sharded_autocorr_forward,
    make_sharded_autocorr_forward_kernel,
    make_sharded_echo,
    make_sharded_echo_kernel,
)


@pytest.mark.parametrize("L,n_amp,n_traj,q", [
    (18, 2, 2, None), (19, 4, 2, None), (18, 2, 2, 15)])
def test_cycle_kernel_matches_xla_sharded(L, n_amp, n_traj, q):
    """L=18/n_amp=2 exercises the boundary bond + one global kick;
    L=19/n_amp=4 adds a shard-shard bond and a second ppermute bit;
    q=15 rides the kernel's TOP-row probe sign (shard-local bits >= 14 —
    the band the reference default q = L//2 hits on every L >= 28
    sharded run)."""
    T, p = 3, 0.6
    q = L // 2 if q is None else q
    hs, phis = generate_disorder(L, 1, seed=5)
    hs = jnp.asarray(hs[0])
    phis = jnp.asarray(phis[0])
    sched = build_kick_schedule("x", 0.97, T)
    mesh = make_mesh(n_amp=n_amp, n_traj=n_traj)
    keys = jax.random.split(jax.random.PRNGKey(11), 2 * n_traj)

    f_x = make_sharded_autocorr_forward(mesh, L=L, T=T, K=1, p=p, q=q)
    f_k = make_sharded_autocorr_forward_kernel(mesh, L=L, T=T, p=p, q=q,
                                               interpret=True)
    a_x = np.asarray(f_x(sched.angles, hs, phis, keys))
    a_k = np.asarray(f_k(sched.angles, hs, phis, keys))
    assert a_x.shape == a_k.shape == (T,)
    assert np.max(np.abs(a_k - a_x)) < 1e-4, (a_k, a_x)


def test_cycle_kernel_noiseless_and_rejects():
    L, T, q = 18, 3, 9
    hs, phis = generate_disorder(L, 1, seed=6)
    hs = jnp.asarray(hs[0])
    phis = jnp.asarray(phis[0])
    sched = build_kick_schedule("x", 0.97, T)
    mesh = make_mesh(n_amp=2, n_traj=4)
    f_k = make_sharded_autocorr_forward_kernel(mesh, L=L, T=T, p=0.0, q=q,
                                               interpret=True)
    f_x = make_sharded_autocorr_forward(mesh, L=L, T=T, K=1, p=0.0, q=q)
    keys = jax.random.split(jax.random.PRNGKey(0), 4)
    a_k = np.asarray(f_k(sched.angles, hs, phis, keys))
    a_x = np.asarray(f_x(sched.angles, hs, phis, keys))
    assert abs(a_k[0] - 1.0) < 1e-6  # A(0) = 1 noiseless
    assert np.max(np.abs(a_k - a_x)) < 1e-4

    # local_bits outside the blocked range and a non-shard-local probe
    # (q >= L - log2(n_amp)) must raise
    with pytest.raises(ValueError):
        make_sharded_autocorr_forward_kernel(
            make_mesh(n_amp=8, n_traj=1), L=18, T=T, p=0.0, q=q)
    with pytest.raises(ValueError):
        make_sharded_autocorr_forward_kernel(mesh, L=18, T=T, p=0.0, q=17)


def test_cycle_inverse_roundtrip():
    """inverse(conj(forward(s))) conj-restored must recover s: the
    conjugation identity (D K)^dag = conj(K D) holds only if the inverse
    kernel applies the diagonal BEFORE the kicks with un-negated angles —
    a post-fold (or mis-staged straddle/sign) error breaks the round trip
    deterministically since K and D do not commute."""
    from dtc_tpu.core.sigma_evolve import presample_noise
    from dtc_tpu.ops.pallas_cycle import (
        cycle_forward_apply,
        cycle_inverse_apply,
    )
    from dtc_tpu.ops.pallas_noise import pack_cycle_params_compact
    from dtc_tpu.ops.pallas_resident import _C, _kick_matrices

    L = 17
    TOP = 1 << (L - 14)
    hs, phis = generate_disorder(L, 1, seed=9)
    sched = build_kick_schedule("x", 0.93, 2)
    u7r, u7i, utr, uti = _kick_matrices(sched.angles, L, TOP,
                                        time_dependent=False)
    # a noisy cycle row: sampled Pauli events on most qubits (p=0.6)
    _, zm, _, csum = presample_noise(jax.random.PRNGKey(4), 0.6, 2, L)
    row = pack_cycle_params_compact(zm[1], csum[1], jnp.asarray(hs[0]),
                                    jnp.asarray(phis[0]), L)[None]
    k0, k1 = jax.random.split(jax.random.PRNGKey(2))
    s0 = jax.random.normal(k0, (1, 2, TOP, _C), jnp.float32)
    s0 = s0 / jnp.sqrt(jnp.sum(s0 * s0))
    s1, _ = cycle_forward_apply(s0, row, u7r, u7i, utr, uti, L=L,
                                q=L // 2, interpret=True)
    conj = jnp.asarray([1.0, -1.0], jnp.float32).reshape(1, 2, 1, 1)
    s2 = cycle_inverse_apply(s1 * conj, row, u7r, u7i, utr, uti, L=L,
                             interpret=True)
    back = np.asarray(s2 * conj)
    assert abs(float(np.sum(back * back)) - 1.0) < 1e-4  # norm preserved
    assert np.max(np.abs(back - np.asarray(s0))) < 2e-5


@pytest.mark.parametrize("L,n_amp,n_traj,p", [(18, 2, 2, 0.6),
                                              (19, 4, 2, 0.3)])
def test_echo_kernel_matches_xla_sharded(L, n_amp, n_traj, p):
    """Sharded-echo builder (roadmap #5): the masked-2T switch scan over
    forward/inverse cycle kernels must match make_sharded_echo
    trajectory-for-trajectory (identical uniform draws) at every t,
    including the turnaround conjugation and the pre-fold (zm[k-1],
    sig_b[k]) inverse word rule. n_amp=4 adds shard-shard bonds and a
    second ppermute bit to the inverse global head."""
    T, q = 3, L // 2
    hs, phis = generate_disorder(L, 1, seed=5)
    hs = jnp.asarray(hs[0])
    phis = jnp.asarray(phis[0])
    sched = build_kick_schedule("x", 0.97, T)
    mesh = make_mesh(n_amp=n_amp, n_traj=n_traj)
    keys = jax.random.split(jax.random.PRNGKey(11), 2 * n_traj)
    e_x = make_sharded_echo(mesh, L=L, T=T, K=1, p=p, q=q)
    e_k = make_sharded_echo_kernel(mesh, L=L, T=T, p=p, q=q, interpret=True)
    for t in range(T + 1):
        a = float(e_x(sched.angles, hs, phis, keys, jnp.asarray(t)))
        b = float(e_k(sched.angles, hs, phis, keys, jnp.asarray(t)))
        assert abs(a - b) < 1e-4, (t, a, b)


def test_cycle_kernels_multiblock_and_noiseless_echo(monkeypatch):
    """n_bt > 1 pass-1 fori_loop geometry in interpret parity (ADVICE r2:
    the default bt=16 clamps every parity case to a single block):
    DTC_TPU_BLOCKED_BT=8 at local_bits=18 gives n_bt=2 for both the
    forward and the echo cycle kernels. Noiseless echo must be exactly 1
    at every t (U^dag U = I — the reference's own self-validation
    invariant)."""
    monkeypatch.setenv("DTC_TPU_BLOCKED_BT", "8")
    L, T, p, q = 18, 2, 0.4, 9
    hs, phis = generate_disorder(L, 1, seed=8)
    hs = jnp.asarray(hs[0])
    phis = jnp.asarray(phis[0])
    sched = build_kick_schedule("x", 0.91, T)
    mesh = make_mesh(n_amp=1, n_traj=2)
    keys = jax.random.split(jax.random.PRNGKey(3), 2)
    f_x = make_sharded_autocorr_forward(mesh, L=L, T=T, K=1, p=p, q=q)
    f_k = make_sharded_autocorr_forward_kernel(mesh, L=L, T=T, p=p, q=q,
                                               interpret=True)
    a_x = np.asarray(f_x(sched.angles, hs, phis, keys))
    a_k = np.asarray(f_k(sched.angles, hs, phis, keys))
    assert np.max(np.abs(a_k - a_x)) < 1e-4, (a_k, a_x)

    e_x = make_sharded_echo(mesh, L=L, T=T, K=1, p=p, q=q)
    e_k = make_sharded_echo_kernel(mesh, L=L, T=T, p=p, q=q, interpret=True)
    a = float(e_x(sched.angles, hs, phis, keys, jnp.asarray(T)))
    b = float(e_k(sched.angles, hs, phis, keys, jnp.asarray(T)))
    assert abs(a - b) < 1e-4, (a, b)

    e_k0 = make_sharded_echo_kernel(mesh, L=L, T=T, p=0.0, q=q,
                                    interpret=True)
    for t in range(T + 1):
        v = float(e_k0(sched.angles, hs, phis, keys, jnp.asarray(t)))
        assert abs(v - 1.0) < 1e-5, (t, v)


def test_echo_kernel_rejects_non_constant_x():
    """_check_constant_x: a concrete y-component or time-dependent schedule
    must raise instead of silently reading angles[0,0,0] (ADVICE r2)."""
    L, T = 18, 3
    hs, phis = generate_disorder(L, 1, seed=5)
    hs = jnp.asarray(hs[0])
    phis = jnp.asarray(phis[0])
    mesh = make_mesh(n_amp=2, n_traj=2)
    keys = jax.random.split(jax.random.PRNGKey(0), 2)
    e_k = make_sharded_echo_kernel(mesh, L=L, T=T, p=0.1, q=9, interpret=True)
    f_k = make_sharded_autocorr_forward_kernel(mesh, L=L, T=T, p=0.1, q=9,
                                               interpret=True)
    bad_y = build_kick_schedule("y", 0.97, T).angles
    ramp = np.asarray(build_kick_schedule("x", 0.97, T).angles).copy()
    ramp[0, 0, 0] *= 0.5
    for bad in (bad_y, jnp.asarray(ramp)):
        with pytest.raises(ValueError):
            e_k(bad, hs, phis, keys, jnp.asarray(1))
        with pytest.raises(ValueError):
            f_k(bad, hs, phis, keys)


def test_sharded_run_dispatch(monkeypatch):
    """_cycle_kernel_ok: off on CPU backend / non-x schedules, and an
    explicit DTC_TPU_SHARDED_ENGINE=cycle_kernel request that cannot be
    honored raises instead of silently deopting (ADVICE r1 pattern)."""
    from dtc_tpu.experiments.sharded_run import _cycle_kernel_ok
    from dtc_tpu.utils.config import SimConfig

    cfg = SimConfig(L=19, tf=3, g=0.97)
    sched = build_kick_schedule("x", 0.97, 3)
    mesh = make_mesh(n_amp=2, n_traj=4)
    assert _cycle_kernel_ok(mesh, sched, cfg) is (
        jax.default_backend() == "tpu")
    # local_bits 24..30 rides the r2-blocked HBM-streamed per-shard
    # kernels (ops/pallas_cycle_hi): L=32 over 4 amp shards is eligible,
    # one past the hi envelope is not
    assert _cycle_kernel_ok(
        make_mesh(n_amp=4, n_traj=2), sched, SimConfig(L=32, tf=3, g=0.97)
    ) is (jax.default_backend() == "tpu")
    assert _cycle_kernel_ok(
        make_mesh(n_amp=2, n_traj=4), sched, SimConfig(L=33, tf=3, g=0.97)
    ) is False
    monkeypatch.setenv("DTC_TPU_SHARDED_ENGINE", "xla")
    assert _cycle_kernel_ok(mesh, sched, cfg) is False
    monkeypatch.setenv("DTC_TPU_SHARDED_ENGINE", "bogus")
    with pytest.raises(ValueError):
        _cycle_kernel_ok(mesh, sched, cfg)
    if jax.default_backend() != "tpu":
        monkeypatch.setenv("DTC_TPU_SHARDED_ENGINE", "cycle_kernel")
        with pytest.raises(ValueError):
            _cycle_kernel_ok(mesh, sched, cfg)


@pytest.mark.parametrize("pol,L,n_amp,kwargs", [
    ("y", 18, 2, {}),
    ("xy", 19, 4, {}),
    ("circular_left", 18, 2, {"circular_frequency": 0.5}),
])
def test_general_cycle_kernel_matches_xla_sharded(pol, L, n_amp, kwargs):
    """LAB-frame per-shard cycle kernel (VERDICT r2 missing #5) vs the
    sigma-frame XLA sharded engine (has_y): every polarization family and
    the time-dependent circular schedule must agree trajectory-for-
    trajectory — the hybrid frame (lab local bits, XOR shard bits with
    per-trajectory conjugated global slot kicks) is exercised across the
    boundary bond, shard-shard bonds and K=2 slot interleaving."""
    from dtc_tpu.parallel.sharded import make_sharded_autocorr_forward_general

    T, p, q, n_traj = 3, 0.5, L // 2, 2
    hs, phis = generate_disorder(L, 1, seed=5)
    hs = jnp.asarray(hs[0])
    phis = jnp.asarray(phis[0])
    sched = build_kick_schedule(pol, 0.97, T, **kwargs)
    mesh = make_mesh(n_amp=n_amp, n_traj=n_traj)
    keys = jax.random.split(jax.random.PRNGKey(11), 2 * n_traj)
    f_x = make_sharded_autocorr_forward(mesh, L=L, T=T, K=sched.K, p=p, q=q,
                                        has_y=True)
    f_g = make_sharded_autocorr_forward_general(
        mesh, L=L, T=T, K=sched.K, p=p, q=q, interpret=True)
    a_x = np.asarray(f_x(sched.angles, hs, phis, keys))
    a_g = np.asarray(f_g(sched.angles, hs, phis, keys))
    assert np.max(np.abs(a_g - a_x)) < 1e-4, (pol, a_g, a_x)


@pytest.mark.parametrize("pol,L,n_amp,kwargs", [
    ("y", 18, 2, {}),
    ("xy", 19, 4, {}),
    ("circular_left", 18, 2, {"circular_frequency": 0.5}),
])
def test_general_echo_kernel_matches_xla_sharded(pol, L, n_amp, kwargs):
    """General sharded echo (make_sharded_echo_general) vs make_sharded_echo
    trajectory-for-trajectory: reversed per-cycle schedules, daggered slot
    unitaries (no conjugation trick — Y slots are not symmetric), the
    daggered global head (_global_diag_inv + dagger slot kicks in reversed
    slot order) and the turnaround deferred-word zeroing. K=2 cases
    (xy/circular) exercise reversed slot interleaving; n_amp=4 adds
    shard-shard bonds."""
    from dtc_tpu.parallel.sharded import make_sharded_echo_general

    T, p, q, n_traj = 3, 0.5, L // 2, 2
    hs, phis = generate_disorder(L, 1, seed=5)
    hs = jnp.asarray(hs[0])
    phis = jnp.asarray(phis[0])
    sched = build_kick_schedule(pol, 0.97, T, **kwargs)
    mesh = make_mesh(n_amp=n_amp, n_traj=n_traj)
    keys = jax.random.split(jax.random.PRNGKey(11), 2 * n_traj)
    e_x = make_sharded_echo(mesh, L=L, T=T, K=sched.K, p=p, q=q, has_y=True)
    e_g = make_sharded_echo_general(mesh, L=L, T=T, K=sched.K, p=p, q=q,
                                    interpret=True)
    for t in (0, 1, T):
        a = float(e_x(sched.angles, hs, phis, keys, jnp.asarray(t)))
        b = float(e_g(sched.angles, hs, phis, keys, jnp.asarray(t)))
        assert abs(a - b) < 1e-4, (pol, t, a, b)
    # noiseless invariant: A0(t) == 1 exactly (U^dag U = I)
    e_g0 = make_sharded_echo_general(mesh, L=L, T=T, K=sched.K, p=0.0, q=q,
                                     interpret=True)
    v = float(e_g0(sched.angles, hs, phis, keys, jnp.asarray(T)))
    assert abs(v - 1.0) < 1e-4, (pol, v)


def test_sharded_driver_passes_has_y(monkeypatch):
    """Regression: run_autocorr_sharded must engage has_y for drives with
    a Y component on the XLA fallback paths — without it a noisy
    y-polarized multi-chip run silently skips the sigma-conjugated kick
    machinery (wrong physics, r3 driver fix)."""
    import dtc_tpu.experiments.sharded_run as sr
    from dtc_tpu.utils.config import SimConfig

    seen = {}

    def fake_fwd(mesh, **kw):
        seen["fwd"] = kw
        return lambda *a: np.zeros(3)

    def fake_echo(mesh, **kw):
        seen["echo"] = kw
        return lambda *a: np.zeros(())

    monkeypatch.setattr(sr, "make_sharded_autocorr_forward", fake_fwd)
    monkeypatch.setattr(sr, "make_sharded_echo", fake_echo)
    cfg = SimConfig(L=6, tf=3, g=0.97, noise_prob=0.05, use_noise=1,
                    polarization="y", inst=1, n_trajectories=4)
    hs, phis = generate_disorder(6, 1, seed=0)
    mesh = make_mesh(n_amp=2, n_traj=4)
    sr.run_autocorr_sharded(cfg, hs, phis, mesh=mesh, write=False,
                            echo_ts=[1])
    assert seen["fwd"]["has_y"] is True
    assert seen["echo"]["has_y"] is True


def test_hi_cycle_inverse_roundtrip():
    """r2-blocked per-shard kernels (ops/pallas_cycle_hi, L_loc >= 24 —
    interpret-tested at the layout's minimum L_loc=22): the pre-fold
    inverse must undo the post-fold forward under the conjugation
    identity. A mis-staged straddle (s20's z21 leg is the r2 BLOCK index
    here, not a row bit) breaks the round trip deterministically."""
    from dtc_tpu.core.sigma_evolve import presample_noise
    from dtc_tpu.ops.pallas_cycle_hi import (
        hi_cycle_forward_apply,
        hi_cycle_inverse_apply,
    )
    from dtc_tpu.ops.pallas_noise import pack_cycle_params_compact
    from dtc_tpu.ops.pallas_resident import _C
    from dtc_tpu.ops.pallas_streamed import _rx_kron

    L = 22
    TOP = 1 << (L - 14)
    hs, phis = generate_disorder(L, 1, seed=9)
    theta = jnp.float32(0.93 * np.pi)
    u7r, u7i = (m[None] for m in _rx_kron(theta, 7))
    utr, uti = (m[None] for m in _rx_kron(theta, L - 21))
    _, zm, _, csum = presample_noise(jax.random.PRNGKey(4), 0.6, 2, L)
    row = pack_cycle_params_compact(zm[1], csum[1], jnp.asarray(hs[0]),
                                    jnp.asarray(phis[0]), L)[None]
    s0 = jax.random.normal(jax.random.PRNGKey(2), (1, 2, TOP, _C),
                           jnp.float32)
    s0 = s0 / jnp.sqrt(jnp.sum(s0 * s0))
    s1, _ = hi_cycle_forward_apply(s0, row, u7r, u7i, utr, uti, L=L,
                                   q=11, interpret=True)
    conj = jnp.asarray([1.0, -1.0], jnp.float32).reshape(1, 2, 1, 1, 1)
    s2 = hi_cycle_inverse_apply(s1 * conj, row, u7r, u7i, utr, uti, L=L,
                                interpret=True)
    back = np.asarray(s2 * conj).reshape(1, 2, TOP, _C)
    assert abs(float(np.sum(back * back)) - 1.0) < 1e-4
    assert np.max(np.abs(back - np.asarray(s0))) < 2e-5


def test_hi_cycle_kernel_sharded_parity(monkeypatch):
    """Sharded forward + echo through the r2-blocked per-shard kernels
    (DTC_TPU_SHARDED_HI_MIN_LB=22 forces them at the interpret-feasible
    L_loc=22; production crossover is 24 where the VMEM kernel cannot
    run) vs the XLA sharded engine with identical presampled noise on
    the virtual mesh — boundary bond, global kick and the r2-layout
    reshape seam between the kernel and the XLA global ops all covered."""
    monkeypatch.setenv("DTC_TPU_SHARDED_HI_MIN_LB", "22")
    L, n_amp, n_traj, T, p = 23, 2, 1, 2, 0.6
    # q=16 rides the hi kernel's composite (r2, m) row probe sign — the
    # band the reference default q = L//2 hits on every sharded L >= 28
    # run (q < 14 column-sign coverage comes from the unsharded hi tests)
    q = 16
    hs, phis = generate_disorder(L, 1, seed=5)
    hs = jnp.asarray(hs[0])
    phis = jnp.asarray(phis[0])
    sched = build_kick_schedule("x", 0.97, T)
    mesh = make_mesh(n_amp=n_amp, n_traj=n_traj)
    keys = jax.random.split(jax.random.PRNGKey(11), 2 * n_traj)

    f_x = make_sharded_autocorr_forward(mesh, L=L, T=T, K=1, p=p, q=q)
    f_k = make_sharded_autocorr_forward_kernel(mesh, L=L, T=T, p=p, q=q,
                                               interpret=True)
    a_x = np.asarray(f_x(sched.angles, hs, phis, keys))
    a_k = np.asarray(f_k(sched.angles, hs, phis, keys))
    assert np.max(np.abs(a_k - a_x)) < 1e-4, (a_k, a_x)

    e_x = make_sharded_echo(mesh, L=L, T=T, K=1, p=p, q=q)
    e_k = make_sharded_echo_kernel(mesh, L=L, T=T, p=p, q=q, interpret=True)
    a = float(e_x(sched.angles, hs, phis, keys, jnp.asarray(T)))
    b = float(e_k(sched.angles, hs, phis, keys, jnp.asarray(T)))
    assert abs(a - b) < 1e-4, (a, b)


def test_hi_cycle_kernel_split_state_parity(monkeypatch):
    """SPLIT per-plane hi state carries (the L_loc = 30 layout — a fused
    state there puts plane 1's base at the 2^32 DMA-offset wrap,
    docs/PERFORMANCE.md round-4) forced at the interpret-feasible
    L_loc=22 via DTC_TPU_SHARDED_HI_SPLIT_MIN_LB: the x forward + echo
    builders run the per-shard hi kernels through the per-plane (re, im)
    DMA pair (ops/pallas_cycle_hi.hi_dma_helpers), the scan carries the
    pair, and the XLA global ops stack/unstack around it — vs the XLA
    sharded engine with identical presampled noise. The general
    (lab-frame) builders' split path rides the same scaffolding (y
    forward leg). Restores kernel-rate sharding to
    L = 30 + log2(n_amp)."""
    from dtc_tpu.parallel.sharded import (
        make_sharded_autocorr_forward_general,
    )

    monkeypatch.setenv("DTC_TPU_SHARDED_HI_MIN_LB", "22")
    monkeypatch.setenv("DTC_TPU_SHARDED_HI_SPLIT_MIN_LB", "22")
    L, n_amp, n_traj, T, p = 23, 2, 1, 2, 0.6
    q = 16  # composite (r2, m) row probe sign
    hs, phis = generate_disorder(L, 1, seed=5)
    hs = jnp.asarray(hs[0])
    phis = jnp.asarray(phis[0])
    sched = build_kick_schedule("x", 0.97, T)
    mesh = make_mesh(n_amp=n_amp, n_traj=n_traj)
    keys = jax.random.split(jax.random.PRNGKey(11), 2 * n_traj)

    f_x = make_sharded_autocorr_forward(mesh, L=L, T=T, K=1, p=p, q=q)
    f_k = make_sharded_autocorr_forward_kernel(mesh, L=L, T=T, p=p, q=q,
                                               interpret=True)
    a_x = np.asarray(f_x(sched.angles, hs, phis, keys))
    a_k = np.asarray(f_k(sched.angles, hs, phis, keys))
    assert np.max(np.abs(a_k - a_x)) < 1e-4, (a_k, a_x)

    e_x = make_sharded_echo(mesh, L=L, T=T, K=1, p=p, q=q)
    e_k = make_sharded_echo_kernel(mesh, L=L, T=T, p=p, q=q, interpret=True)
    a = float(e_x(sched.angles, hs, phis, keys, jnp.asarray(T)))
    b = float(e_k(sched.angles, hs, phis, keys, jnp.asarray(T)))
    assert abs(a - b) < 1e-4, (a, b)

    sched_y = build_kick_schedule("y", 0.97, T)
    f_yx = make_sharded_autocorr_forward(mesh, L=L, T=T, K=1, p=p, q=q,
                                         has_y=True)
    f_g = make_sharded_autocorr_forward_general(mesh, L=L, T=T, K=1, p=p,
                                                q=q, interpret=True)
    a_yx = np.asarray(f_yx(sched_y.angles, hs, phis, keys))
    a_g = np.asarray(f_g(sched_y.angles, hs, phis, keys))
    assert np.max(np.abs(a_g - a_yx)) < 1e-4, (a_g, a_yx)


@pytest.mark.parametrize("pol,K", [("y", 1), ("circular_left", 2)])
def test_general_hi_cycle_kernel_sharded_parity(monkeypatch, pol, K):
    """Sharded GENERAL (lab-frame) forward + echo through the r2-blocked
    per-shard kernels (ops/pallas_cycle_hi_general, forced at the
    interpret-feasible L_loc=22 via DTC_TPU_SHARDED_HI_MIN_LB; production
    crossover is 24 where the VMEM general kernel cannot run) vs the XLA
    sharded engine with identical presampled noise on the virtual mesh.
    y covers K=1 with Y-kicks (no sigma symmetry); circular_left covers
    K=2 slots with a time-dependent schedule (reversed slot order +
    daggered slot unitaries on the inverse steps). q=16 rides the
    composite (r2, m) row probe sign."""
    from dtc_tpu.parallel.sharded import (
        make_sharded_autocorr_forward_general,
        make_sharded_echo_general,
    )

    monkeypatch.setenv("DTC_TPU_SHARDED_HI_MIN_LB", "22")
    L, n_amp, n_traj, T, p, q = 23, 2, 1, 2, 0.6, 16
    hs, phis = generate_disorder(L, 1, seed=5)
    hs = jnp.asarray(hs[0])
    phis = jnp.asarray(phis[0])
    sched = build_kick_schedule(pol, 0.97, T)
    mesh = make_mesh(n_amp=n_amp, n_traj=n_traj)
    keys = jax.random.split(jax.random.PRNGKey(11), 2 * n_traj)

    f_x = make_sharded_autocorr_forward(mesh, L=L, T=T, K=K, p=p, q=q,
                                        has_y=True)
    f_g = make_sharded_autocorr_forward_general(mesh, L=L, T=T, K=K, p=p,
                                                q=q, interpret=True)
    a_x = np.asarray(f_x(sched.angles, hs, phis, keys))
    a_g = np.asarray(f_g(sched.angles, hs, phis, keys))
    assert np.max(np.abs(a_g - a_x)) < 1e-4, (a_g, a_x)

    e_x = make_sharded_echo(mesh, L=L, T=T, K=K, p=p, q=q, has_y=True)
    e_g = make_sharded_echo_general(mesh, L=L, T=T, K=K, p=p, q=q,
                                    interpret=True)
    a = float(e_x(sched.angles, hs, phis, keys, jnp.asarray(T)))
    b = float(e_g(sched.angles, hs, phis, keys, jnp.asarray(T)))
    assert abs(a - b) < 1e-4, (a, b)


@pytest.mark.parametrize("pol,K", [("y", 1), ("circular_left", 2)])
def test_device_rows_sharded_general_forward_matches_oracle(pol, K):
    """Single-chip DEVICE-noise general drives past the gather cliff
    (device_sweeps previously hard-errored at L > 24 for non-x
    polarizations): the (1,1)-mesh per-shard general scan with device
    rows (`make_sharded_autocorr_forward_general(device=…)`) consumes the
    SAME presample as core.device_evolve's dense original-order oracle, so
    the comparison is trajectory-exact — any error in the row mapping
    (mask slot placement, sign-flipped phi rows) is deterministic, not
    statistical. Mirrors the reference's FakeBackend mode
    (autocorr-delta-a-single-qiskit-fast.py:77-79) crossed with its
    general drives (…-circular-polarization.py:110-142)."""
    from dtc_tpu.core.device_evolve import device_general_forward_oracle
    from dtc_tpu.parallel.sharded import (
        make_sharded_autocorr_forward_general,
    )

    L, T, q = 17, 4, 9
    hs, phis = generate_disorder(L, 1, seed=9)
    hsj = jnp.asarray(hs[0])
    phj = jnp.asarray(phis[0])
    p1 = jnp.linspace(0.1, 0.4, L)
    p2 = jnp.linspace(0.15, 0.45, L - 1)
    keys = jax.random.split(jax.random.PRNGKey(5), 2)
    mesh = make_mesh(n_amp=1, n_traj=1)
    sched = build_kick_schedule(pol, 0.97, T)
    fn = make_sharded_autocorr_forward_general(
        mesh, L=L, T=T, K=K, p=0.0, q=q, ancilla_factor=0.9,
        interpret=True, device=(p1, p2, 2))
    a_k = np.asarray(fn(sched.angles, hsj, phj, keys))
    a_o = np.asarray(device_general_forward_oracle(
        hsj, phj, p1, p2, sched.angles, keys, L=L, T=T, K=K, q=q,
        ancilla_factor=0.9)).mean(axis=0)
    assert np.max(np.abs(a_k - a_o)) < 1e-4, (pol, a_k, a_o)


def test_device_rows_sharded_general_forward_amp2_matches_oracle():
    """Device rows on a REAL amplitude-sharded mesh (n_amp=2 — round 5;
    previously a hard n_amp==1 restriction): the composed event masks'
    shard-bit X parts ride the depolarizing branch's XOR-frame deferral,
    Z parts the zm_prev/zm_fin bookkeeping, and the commutation-signed
    phi rows reach the global/boundary diagonal per cycle
    (_tail_phase_angles per-trajectory rows — conj_sig(conj_m(D)) =
    conj_{sig^m}(D), so baked rows + full-frame flips compose exactly).
    Trajectory-exact vs the dense original-order oracle."""
    from dtc_tpu.core.device_evolve import device_general_forward_oracle
    from dtc_tpu.parallel.sharded import (
        make_sharded_autocorr_forward_general,
    )

    L, T, q = 18, 3, 9
    hs, phis = generate_disorder(L, 1, seed=9)
    hsj = jnp.asarray(hs[0])
    phj = jnp.asarray(phis[0])
    p1 = jnp.linspace(0.1, 0.4, L)
    p2 = jnp.linspace(0.15, 0.45, L - 1)
    keys = jax.random.split(jax.random.PRNGKey(5), 2)
    mesh = make_mesh(n_amp=2, n_traj=1)
    sched = build_kick_schedule("y", 0.97, T)
    fn = make_sharded_autocorr_forward_general(
        mesh, L=L, T=T, K=1, p=0.0, q=q, ancilla_factor=0.9,
        interpret=True, device=(p1, p2, 2))
    a_k = np.asarray(fn(sched.angles, hsj, phj, keys))
    a_o = np.asarray(device_general_forward_oracle(
        hsj, phj, p1, p2, sched.angles, keys, L=L, T=T, K=1, q=q,
        ancilla_factor=0.9)).mean(axis=0)
    assert np.max(np.abs(a_k - a_o)) < 1e-4, (a_k, a_o)


@pytest.mark.slow
def test_device_rows_sharded_general_amp2_k2_and_echo():
    """n_amp=2 device rows, the K=2 slot structure (circular) forward AND
    the echo's (pre, post) commutation mapping — inverse prediag rows with
    baked D0^dag negation run through the plain (non-negating)
    _global_diag at the step's pre-event frame — vs the dense oracles;
    zero-rate echo invariant rides along."""
    from dtc_tpu.core.device_evolve import (
        device_general_echo_oracle,
        device_general_forward_oracle,
    )
    from dtc_tpu.parallel.sharded import (
        make_sharded_autocorr_forward_general,
        make_sharded_echo_general,
    )

    L, T, q = 18, 3, 9
    hs, phis = generate_disorder(L, 1, seed=9)
    hsj = jnp.asarray(hs[0])
    phj = jnp.asarray(phis[0])
    p1 = jnp.linspace(0.1, 0.35, L)
    p2 = jnp.linspace(0.15, 0.4, L - 1)
    mesh = make_mesh(n_amp=2, n_traj=1)
    keys2 = jax.random.split(jax.random.PRNGKey(5), 2)
    sched_c = build_kick_schedule("circular_left", 0.97, T)
    fn = make_sharded_autocorr_forward_general(
        mesh, L=L, T=T, K=2, p=0.0, q=q, ancilla_factor=0.9,
        interpret=True, device=(p1, p2, 2))
    a_k = np.asarray(fn(sched_c.angles, hsj, phj, keys2))
    a_o = np.asarray(device_general_forward_oracle(
        hsj, phj, p1, p2, sched_c.angles, keys2, L=L, T=T, K=2, q=q,
        ancilla_factor=0.9)).mean(axis=0)
    assert np.max(np.abs(a_k - a_o)) < 1e-4, (a_k, a_o)

    keys = jax.random.split(jax.random.PRNGKey(5), 1)
    sched = build_kick_schedule("y", 0.97, T)
    efn = make_sharded_echo_general(
        mesh, L=L, T=T, K=1, p=0.0, q=q, ancilla_factor=0.9,
        interpret=True, device=(p1, p2, 2))
    for t in (1, 3):
        a_k = float(efn(sched.angles, hsj, phj, keys, jnp.asarray(t)))
        a_o = float(np.mean([np.asarray(device_general_echo_oracle(
            hsj, phj, p1, p2, sched.angles, k, t, L=L, T=T, K=1, q=q,
            ancilla_factor=0.9)) for k in keys]))
        assert abs(a_k - a_o) < 1e-4, (t, a_k, a_o)
    fn0 = make_sharded_echo_general(
        mesh, L=L, T=T, K=2, p=0.0, q=q, ancilla_factor=1.0,
        interpret=True, device=(np.zeros(L), np.zeros(L - 1), 2))
    a0 = float(fn0(build_kick_schedule("xy", 0.97, T).angles, hsj, phj,
                   keys, jnp.asarray(2)))
    assert abs(a0 - 1.0) < 1e-4, a0


@pytest.mark.slow
def test_device_rows_split_state_matches_oracle(monkeypatch):
    """Device rows COMPOSED with the split per-plane hi state (the
    L=30 single-chip device-noise route, round 5) — forced at the
    interpret-feasible L_loc=23 via the split/hi env thresholds,
    (1,1) mesh, vs the dense original-order oracle on the same
    presample."""
    from dtc_tpu.core.device_evolve import device_general_forward_oracle
    from dtc_tpu.parallel.sharded import (
        make_sharded_autocorr_forward_general,
    )

    monkeypatch.setenv("DTC_TPU_SHARDED_HI_MIN_LB", "22")
    monkeypatch.setenv("DTC_TPU_SHARDED_HI_SPLIT_MIN_LB", "22")
    L, T, q = 23, 2, 9
    hs, phis = generate_disorder(L, 1, seed=9)
    hsj = jnp.asarray(hs[0])
    phj = jnp.asarray(phis[0])
    p1 = jnp.linspace(0.1, 0.4, L)
    p2 = jnp.linspace(0.15, 0.45, L - 1)
    keys = jax.random.split(jax.random.PRNGKey(5), 1)
    mesh = make_mesh(n_amp=1, n_traj=1)
    sched = build_kick_schedule("y", 0.97, T)
    fn = make_sharded_autocorr_forward_general(
        mesh, L=L, T=T, K=1, p=0.0, q=q, ancilla_factor=0.9,
        interpret=True, device=(p1, p2, 2))
    a_k = np.asarray(fn(sched.angles, hsj, phj, keys))
    a_o = np.asarray(device_general_forward_oracle(
        hsj, phj, p1, p2, sched.angles, keys, L=L, T=T, K=1, q=q,
        ancilla_factor=0.9)).mean(axis=0)
    assert np.max(np.abs(a_k - a_o)) < 1e-4, (a_k, a_o)


@pytest.mark.parametrize("pol,K", [("y", 1), ("circular_left", 2)])
def test_device_rows_sharded_general_echo_matches_oracle(pol, K):
    """Device-noise ECHO through the (1,1)-mesh per-shard general
    inverse kernels: `make_sharded_echo_general(device=…)` maps
    core.device_evolve._device_general_echo_rows into the (pre, post)
    row layout — forward steps carry the commuted bond events +
    turnaround-conjugated postdiag in the final slot, inverse steps the
    conjugated D0^dag prediag in the first slot. Trajectory-exact vs the
    dense original-order oracle (same presample); the noiseless
    A0(t) == 1 invariant rides along."""
    from dtc_tpu.core.device_evolve import device_general_echo_oracle
    from dtc_tpu.parallel.sharded import make_sharded_echo_general

    L, T, q = 17, 3, 9
    hs, phis = generate_disorder(L, 1, seed=9)
    hsj = jnp.asarray(hs[0])
    phj = jnp.asarray(phis[0])
    p1 = jnp.linspace(0.1, 0.35, L)
    p2 = jnp.linspace(0.15, 0.4, L - 1)
    keys = jax.random.split(jax.random.PRNGKey(5), 1)
    mesh = make_mesh(n_amp=1, n_traj=1)
    sched = build_kick_schedule(pol, 0.97, T)
    fn = make_sharded_echo_general(
        mesh, L=L, T=T, K=K, p=0.0, q=q, ancilla_factor=0.9,
        interpret=True, device=(p1, p2, 2))
    for t in (1, 3):
        a_k = float(fn(sched.angles, hsj, phj, keys, jnp.asarray(t)))
        a_o = float(np.mean([np.asarray(device_general_echo_oracle(
            hsj, phj, p1, p2, sched.angles, k, t, L=L, T=T, K=K, q=q,
            ancilla_factor=0.9)) for k in keys]))
        assert abs(a_k - a_o) < 1e-4, (pol, t, a_k, a_o)
    fn0 = make_sharded_echo_general(
        mesh, L=L, T=T, K=K, p=0.0, q=q, ancilla_factor=1.0,
        interpret=True, device=(np.zeros(L), np.zeros(L - 1), 2))
    a0 = float(fn0(sched.angles, hsj, phj, keys, jnp.asarray(2)))
    assert abs(a0 - 1.0) < 1e-4, a0


def test_device_rows_hi_layout_matches_vmem_layout(monkeypatch):
    """Device rows on the r2-blocked HI per-shard kernels (the layout the
    24 <= L <= 29 production dispatch actually uses): at L=22 both the
    VMEM general kernel (default) and the hi kernel (forced via
    DTC_TPU_SHARDED_HI_MIN_LB) can run, so the same keys must give the
    same trajectories — this pins the width-dependent row packing (the hi
    tiles pad the flag lanes past 128) that the L=17 oracle test cannot
    reach. The zero-rate echo invariant rides the hi echo switch."""
    from dtc_tpu.parallel.sharded import (
        make_sharded_autocorr_forward_general,
        make_sharded_echo_general,
    )

    L, T, q = 22, 2, 9
    hs, phis = generate_disorder(L, 1, seed=9)
    hsj = jnp.asarray(hs[0])
    phj = jnp.asarray(phis[0])
    p1 = jnp.linspace(0.1, 0.4, L)
    p2 = jnp.linspace(0.15, 0.45, L - 1)
    keys = jax.random.split(jax.random.PRNGKey(5), 1)
    mesh = make_mesh(n_amp=1, n_traj=1)
    sched = build_kick_schedule("y", 0.97, T)
    kw = dict(L=L, T=T, K=1, p=0.0, q=q, ancilla_factor=0.9,
              interpret=True, device=(p1, p2, 2))
    a_vmem = np.asarray(
        make_sharded_autocorr_forward_general(mesh, **kw)(
            sched.angles, hsj, phj, keys))
    monkeypatch.setenv("DTC_TPU_SHARDED_HI_MIN_LB", "22")
    a_hi = np.asarray(
        make_sharded_autocorr_forward_general(mesh, **kw)(
            sched.angles, hsj, phj, keys))
    assert np.max(np.abs(a_hi - a_vmem)) < 1e-4, (a_hi, a_vmem)
    e0 = make_sharded_echo_general(
        mesh, L=L, T=T, K=1, p=0.0, q=q, ancilla_factor=1.0,
        interpret=True, device=(np.zeros(L), np.zeros(L - 1), 2))
    v = float(e0(sched.angles, hsj, phj, keys, jnp.asarray(1)))
    assert abs(v - 1.0) < 1e-4, v
