"""VMEM-resident kernel: CPU-side unit checks (fast pieces only).

Host-side wrapper coverage: parameter packing semantics, dispatch
guards, L-range errors, and eval_shape traces of every kernel body.
Numerical kernel parity lives in tests/test_kernel_interpret_parity.py
(interpret mode) and, for TPU dot precision, benchmarks/parity_sweep.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dtc_tpu.ops.pallas_noise import pack_cycle_params
from dtc_tpu.ops.pallas_resident import resident_forward_batch


def test_resident_rejects_bad_L():
    keys = jax.random.split(jax.random.PRNGKey(0), 1)[None]
    with pytest.raises(ValueError, match="14 <= L <= 21"):
        resident_forward_batch(
            jnp.ones((1, 8)), jnp.ones((1, 7)), jnp.zeros((2, 1, 2)), keys,
            L=8, T=2, p=0.0, q=4)


def test_pack_cycle_params_rows():
    L = 5
    hs = jnp.arange(1.0, 6.0)
    phis = jnp.arange(10.0, 14.0)
    par = np.asarray(pack_cycle_params(jnp.uint32(0b10110), jnp.uint32(0b01010),
                                       hs, phis, L))
    assert par.shape == (8, 128)
    np.testing.assert_array_equal(par[0, :L], [0, 1, 1, 0, 1])  # zm bits
    np.testing.assert_array_equal(par[1, :L], [0, 1, 0, 1, 0])  # sigma bits
    # bond flips = sigma_b XOR sigma_{b+1}
    np.testing.assert_array_equal(par[2, : L - 1], [1, 1, 1, 1])
    np.testing.assert_allclose(par[3, :L], np.arange(1.0, 6.0))
    np.testing.assert_allclose(par[4, : L - 1], np.arange(10.0, 14.0))
    assert np.all(par[0, L:] == 0)


def test_pack_cycle_params_compact_lanes():
    from dtc_tpu.ops.pallas_noise import pack_cycle_params_compact

    L = 5
    hs = jnp.arange(1.0, 6.0)
    phis = jnp.arange(10.0, 14.0)
    row = np.asarray(pack_cycle_params_compact(
        jnp.uint32(0b10110), jnp.uint32(0b01010), hs, phis, L))
    assert row.shape == (128,)
    np.testing.assert_array_equal(row[0:L], [0, 1, 1, 0, 1])        # zm bits
    np.testing.assert_array_equal(row[L:2 * L], [0, 1, 0, 1, 0])    # sigma
    np.testing.assert_array_equal(row[2 * L:3 * L - 1], [1, 1, 1, 1])  # flips
    np.testing.assert_allclose(row[3 * L - 1:4 * L - 1], np.arange(1.0, 6.0))
    np.testing.assert_allclose(row[4 * L - 1:5 * L - 2],
                               np.arange(10.0, 14.0))
    assert np.all(row[5 * L - 2:] == 0)


def test_dispatch_uses_sigma_on_cpu():
    """On CPU backends the dispatcher must NOT pick the resident kernel."""
    from dtc_tpu.experiments.engine import _forward_batch
    from dtc_tpu.io.disorder import generate_disorder
    from dtc_tpu.models.drives import build_kick_schedule

    L, T = 14, 3
    hs, phis = generate_disorder(L, 1, seed=95)
    sched = build_kick_schedule("x", 0.9, T)
    keys = jax.random.split(jax.random.PRNGKey(0), 2)[None]
    out = _forward_batch(jnp.asarray(hs[:, :L]), jnp.asarray(phis[:, :L - 1]),
                         sched.angles, keys, L=L, T=T, K=1, p=0.0, q=L // 2,
                         initial_state="vacuum", dtype_name="complex64",
                         ancilla_factor=1.0)
    assert np.asarray(out).shape == (1, 2, T)
    np.testing.assert_allclose(np.asarray(out)[0, 0, 0], 1.0, atol=1e-6)


def test_streamed_rejects_bad_L():
    from dtc_tpu.ops.pallas_streamed import streamed_forward_batch

    keys = jax.random.split(jax.random.PRNGKey(0), 1)[None]
    with pytest.raises(ValueError, match="22 <= L <= 28"):
        streamed_forward_batch(
            jnp.ones((1, 8)), jnp.ones((1, 7)), jnp.zeros((2, 1, 2)), keys,
            L=8, T=2, p=0.0, q=4)


def test_streamed_dispatch_stays_off_cpu():
    """The streamed branch must never fire on CPU (and the sigma fallback
    must still produce the exact noiseless A(0) = 1 at L=22-sized dispatch
    inputs -- checked at a small L to keep the CPU suite fast)."""
    from dtc_tpu.experiments.engine import _forward_batch
    from dtc_tpu.io.disorder import generate_disorder
    from dtc_tpu.models.drives import build_kick_schedule

    L, T = 12, 2
    hs, phis = generate_disorder(L, 1, seed=97)
    sched = build_kick_schedule("x", 0.9, T)
    keys = jax.random.split(jax.random.PRNGKey(0), 2)[None]
    out = _forward_batch(jnp.asarray(hs[:, :L]), jnp.asarray(phis[:, :L - 1]),
                         sched.angles, keys, L=L, T=T, K=1, p=0.0, q=L // 2,
                         initial_state="vacuum", dtype_name="complex64",
                         ancilla_factor=1.0)
    np.testing.assert_allclose(np.asarray(out)[0, 0, 0], 1.0, atol=1e-6)


def test_streamed_rx_kron_matches_dense():
    """_rx_kron must equal the dense kron power of RX(theta) split into
    planar real/imag parts (the streamed kernel's kick inputs)."""
    from dtc_tpu.ops.pallas_streamed import _rx_kron

    theta = 0.97 * np.pi
    rx = np.array([[np.cos(theta / 2), -1j * np.sin(theta / 2)],
                   [-1j * np.sin(theta / 2), np.cos(theta / 2)]])
    dense = np.array([[1.0]], complex)
    for _ in range(3):
        dense = np.kron(dense, rx)
    ur, ui = _rx_kron(jnp.float32(theta), 3)
    np.testing.assert_allclose(np.asarray(ur), dense.real, atol=1e-6)
    np.testing.assert_allclose(np.asarray(ui), dense.imag, atol=1e-6)


def test_resident_echo_rejects_bad_L():
    from dtc_tpu.ops.pallas_resident import resident_echo_batch

    keys = jax.random.split(jax.random.PRNGKey(0), 1)[None]
    with pytest.raises(ValueError, match="14 <= L <= 21"):
        resident_echo_batch(
            jnp.ones((1, 8)), jnp.ones((1, 7)), jnp.zeros((2, 1, 2)), keys,
            jnp.arange(2), L=8, T=2, p=0.0, q=4)


def test_echo_dispatch_uses_sigma_on_cpu():
    """On CPU backends the echo dispatcher must NOT pick the resident kernel
    (and the sigma path must return the exact noiseless echo = 1)."""
    from dtc_tpu.experiments.engine import _echo_batch
    from dtc_tpu.io.disorder import generate_disorder
    from dtc_tpu.models.drives import build_kick_schedule

    L, T = 14, 3
    hs, phis = generate_disorder(L, 1, seed=96)
    sched = build_kick_schedule("x", 0.9, T)
    keys = jax.random.split(jax.random.PRNGKey(0), 2)[None]
    out = _echo_batch(jnp.asarray(hs[:, :L]), jnp.asarray(phis[:, :L - 1]),
                      sched.angles, keys, jnp.arange(3), L=L, T=T, K=1, p=0.0,
                      q=L // 2, initial_state="vacuum",
                      dtype_name="complex64", ancilla_factor=1.0)
    assert np.asarray(out).shape == (1, 2, 3)
    np.testing.assert_allclose(np.asarray(out), 1.0, atol=1e-5)


def test_resident_dispatch_logic():
    """Host-side dispatch: x-only constant and per-cycle schedules qualify
    (on TPU), y-drives and tracers never do; per-cycle capped at T<=256."""
    from dtc_tpu.experiments.engine import _resident_dispatch

    const = jnp.zeros((10, 1, 2)).at[:, 0, 0].set(3.0)
    ramp = jnp.zeros((10, 1, 2)).at[:, 0, 0].set(jnp.linspace(2.6, 3.1, 10))
    ywise = jnp.ones((10, 1, 2))
    kw = dict(has_y=False, K=1, L=16, q=8, T=10, dtype_name="complex64",
              engine="auto")
    on_cpu = __import__("jax").default_backend() == "cpu"

    ok, ti = _resident_dispatch(const, **kw)
    assert ti and ok == (not on_cpu)
    ok, ti = _resident_dispatch(ramp, **kw)
    assert (not ti) and ok == (not on_cpu)
    ok, _ = _resident_dispatch(ywise, **{**kw, "has_y": True})
    assert not ok
    ok, _ = _resident_dispatch(ramp, **{**kw, "T": 300})
    assert not ok  # per-cycle matrices too large past T=256
    ok, _ = _resident_dispatch(const, **{**kw, "L": 12})
    assert not ok


def test_streamed_echo_rejects_bad_args():
    import pytest

    from dtc_tpu.ops.pallas_streamed import streamed_echo_batch

    hs = jnp.zeros((1, 21))
    phis = jnp.zeros((1, 20))
    ang = jnp.zeros((4, 1, 2))
    keys = jax.random.split(jax.random.PRNGKey(0), 2)[None]
    ts = jnp.asarray([1, 2])
    with pytest.raises(ValueError, match="22 <= L <= 28"):
        streamed_echo_batch(hs, phis, ang, keys, ts, L=21, T=4, p=0.05, q=5)
    # q = 14 is VALID since the row-probe fold (any q < L); q >= L raises
    with pytest.raises(ValueError, match="q < L"):
        streamed_echo_batch(jnp.zeros((1, 22)), jnp.zeros((1, 21)), ang,
                            keys, ts, L=22, T=4, p=0.05, q=22)


def test_blocked_rejects_bad_args():
    from dtc_tpu.ops.pallas_resident_blocked import blocked_forward_batch

    keys = jax.random.split(jax.random.PRNGKey(0), 1)[None]
    ang = jnp.zeros((2, 1, 2))
    with pytest.raises(ValueError, match="17 <= L <= 23"):
        blocked_forward_batch(jnp.ones((1, 16)), jnp.ones((1, 15)), ang,
                              keys, L=16, T=2, p=0.0, q=4)
    with pytest.raises(ValueError, match="q < 14"):
        blocked_forward_batch(jnp.ones((1, 22)), jnp.ones((1, 21)), ang,
                              keys, L=22, T=2, p=0.0, q=14)
    with pytest.raises(ValueError, match="L=22, T <= 64"):
        blocked_forward_batch(jnp.ones((1, 23)), jnp.ones((1, 22)), ang,
                              keys, L=23, T=2, p=0.0, q=4,
                              time_dependent=True)


def test_blocked_engine_name_accepted():
    """DTC_TPU_ENGINE=blocked names the fast-kernel family (on TPU,
    'auto' and 'blocked' both route L=22..23 constant x-drives to the
    blocked VMEM-resident kernel — measured 3.5x the streamed kernel;
    'streamed' still names the HBM-streamed kernel explicitly). On CPU
    neither fires — exercised via the sigma fallback at a small L."""
    import os

    from dtc_tpu.experiments.engine import _forward_batch
    from dtc_tpu.io.disorder import generate_disorder
    from dtc_tpu.models.drives import build_kick_schedule

    L, T = 12, 2
    hs, phis = generate_disorder(L, 1, seed=98)
    sched = build_kick_schedule("x", 0.9, T)
    keys = jax.random.split(jax.random.PRNGKey(0), 2)[None]
    prior = os.environ.get("DTC_TPU_ENGINE")
    os.environ["DTC_TPU_ENGINE"] = "blocked"
    try:
        out = _forward_batch(
            jnp.asarray(hs[:, :L]), jnp.asarray(phis[:, :L - 1]),
            sched.angles, keys, L=L, T=T, K=1, p=0.0, q=L // 2,
            initial_state="vacuum", dtype_name="complex64",
            ancilla_factor=1.0)
    finally:
        if prior is None:
            del os.environ["DTC_TPU_ENGINE"]
        else:
            os.environ["DTC_TPU_ENGINE"] = prior
    np.testing.assert_allclose(np.asarray(out)[0, 0, 0], 1.0, atol=1e-6)


def test_blocked_kernel_matches_sigma_interpret():
    """Full numerical validation of the blocked kernel on CPU:
    trajectory-exact vs the sigma engine with identical presampled noise
    (~1e-5: interpret dots are true f32). Covers neel init, L=23, and the
    per-cycle-schedule variant; the other families' interpret parity is
    tests/test_kernel_interpret_parity.py."""
    from dtc_tpu.core.sigma_evolve import sigma_forward_batch
    from dtc_tpu.io.disorder import generate_disorder
    from dtc_tpu.models.drives import build_kick_schedule
    from dtc_tpu.ops.pallas_resident_blocked import blocked_forward_batch

    for L, T, state, tdep in ((22, 3, "neel", False),
                              (22, 3, "vacuum", True),
                              # L=17 covers the low end of the widened
                              # 17..23 range (TOP=8 clamps bt 16 -> 8),
                              # the default engine at these sizes since the
                              # blocked body measured faster than the
                              # full-plane kernel (blocked_lowL_probe.py)
                              (17, 4, "vacuum", False)):
        hs_np, phis_np = generate_disorder(L, 1, seed=7)
        hs = jnp.asarray(hs_np[:, :L])
        phis = jnp.asarray(phis_np[:, :L - 1])
        if tdep:
            ang = jnp.zeros((T, 1, 2)).at[:, 0, 0].set(
                jnp.linspace(2.6, 3.05, T))
        else:
            ang = build_kick_schedule("x", 0.97, T).angles
        keys = jax.random.split(jax.random.PRNGKey(3), 1)[None]
        b = np.asarray(blocked_forward_batch(
            hs, phis, ang, keys, L=L, T=T, p=0.1, q=11,
            initial_state=state, time_dependent=tdep, interpret=True))
        s = np.asarray(sigma_forward_batch(
            hs, phis, ang, keys, L=L, T=T, K=1, p=0.1, q=11,
            initial_state=state, dtype_name="complex64",
            ancilla_factor=1.0, has_y=False))
        assert np.max(np.abs(b - s)) < 1e-4, (L, T, state, tdep)


def test_blocked_echo_matches_sigma_interpret():
    """Blocked echo vs the sigma engine, trajectory-exact on CPU. p=0.6
    forces sampled Pauli events so the turnaround conj-correction and
    sigma-sign machinery are actually exercised (values hit -0.99/-0.986,
    not the trivial 1.0); the noiseless echo == 1 invariant rides along."""
    from dtc_tpu.core.sigma_evolve import sigma_echo_batch
    from dtc_tpu.io.disorder import generate_disorder
    from dtc_tpu.models.drives import build_kick_schedule
    from dtc_tpu.ops.pallas_resident_blocked import blocked_echo_batch

    L, T = 22, 2
    hs_np, phis_np = generate_disorder(L, 1, seed=7)
    hs = jnp.asarray(hs_np[:, :L])
    phis = jnp.asarray(phis_np[:, :L - 1])
    sched = build_kick_schedule("x", 0.97, T)
    keys = jax.random.split(jax.random.PRNGKey(9), 2)[None]
    ts = jnp.asarray([1, 2])
    b = np.asarray(blocked_echo_batch(hs, phis, sched.angles, keys, ts,
                                      L=L, T=T, p=0.6, q=11, interpret=True))
    s = np.asarray(sigma_echo_batch(hs, phis, sched.angles, keys, ts, L=L,
                                    T=T, K=1, p=0.6, q=11,
                                    initial_state="vacuum",
                                    dtype_name="complex64",
                                    ancilla_factor=1.0, has_y=False))
    assert np.max(np.abs(b - s)) < 1e-4
    assert np.min(s) < -0.9  # the trajectories flipped sign (events fired)
    b0 = np.asarray(blocked_echo_batch(hs, phis, sched.angles,
                                       keys[:, :1], ts, L=L, T=T, p=0.0,
                                       q=11, interpret=True))
    np.testing.assert_allclose(b0, 1.0, atol=1e-4)


@pytest.mark.slow  # nb>1 is env-opt-in (DTC_TPU_BLOCKED_NB)
def test_blocked_kernel_nb2_matches_sigma_interpret(monkeypatch):
    """The nb=2 interleaved-trajectory blocked forward body (the headline
    throughput lever, DTC_TPU_BLOCKED_NB): trajectory-exact vs the sigma
    engine with identical presampled noise, including an odd trajectory
    count's nb=1 fallback. The env var is read at trace time, so the
    static signature here is unique to this test (nothing else traces
    L=17/T=5/p=0.35/q=4)."""
    from dtc_tpu.core.sigma_evolve import sigma_forward_batch
    from dtc_tpu.io.disorder import generate_disorder
    from dtc_tpu.models.drives import build_kick_schedule
    from dtc_tpu.ops.pallas_resident_blocked import blocked_forward_batch

    monkeypatch.setenv("DTC_TPU_BLOCKED_NB", "2")
    L, T, p, q = 17, 5, 0.35, 4
    hs_np, phis_np = generate_disorder(L, 1, seed=7)
    hs = jnp.asarray(hs_np[:, :L])
    phis = jnp.asarray(phis_np[:, :L - 1])
    ang = build_kick_schedule("x", 0.97, T).angles
    keys = jax.random.split(jax.random.PRNGKey(5), 4)[None]
    b = np.asarray(blocked_forward_batch(
        hs, phis, ang, keys, L=L, T=T, p=p, q=q, interpret=True))
    s = np.asarray(sigma_forward_batch(
        hs, phis, ang, keys, L=L, T=T, K=1, p=p, q=q,
        initial_state="vacuum", dtype_name="complex64",
        ancilla_factor=1.0, has_y=False))
    assert np.max(np.abs(b - s)) < 1e-4
    # odd trajectory count: falls back to nb=1 inside the call, same values
    b3 = np.asarray(blocked_forward_batch(
        hs, phis, ang, keys[:, :3], L=L, T=T, p=p, q=q, interpret=True))
    assert np.max(np.abs(b3 - s[:, :3])) < 1e-4


@pytest.mark.slow  # nb>1 is env-opt-in (DTC_TPU_BLOCKED_NB)
def test_blocked_echo_nb2_matches_sigma_interpret(monkeypatch):
    """nb=2 echo: SAME-t pair grouping (t-major regroup in the wrapper)
    keeps trip counts equal within a grid step; values must match the
    sigma engine trajectory-for-trajectory, including the odd-count
    fallback. p=0.6 forces sampled events through the turnaround."""
    from dtc_tpu.core.sigma_evolve import sigma_echo_batch
    from dtc_tpu.io.disorder import generate_disorder
    from dtc_tpu.models.drives import build_kick_schedule
    from dtc_tpu.ops.pallas_resident_blocked import blocked_echo_batch

    monkeypatch.setenv("DTC_TPU_BLOCKED_NB", "2")
    L, T, p, q = 17, 5, 0.6, 4
    hs_np, phis_np = generate_disorder(L, 1, seed=7)
    hs = jnp.asarray(hs_np[:, :L])
    phis = jnp.asarray(phis_np[:, :L - 1])
    ang = build_kick_schedule("x", 0.97, T).angles
    keys = jax.random.split(jax.random.PRNGKey(3), 4)[None]
    ts = jnp.asarray([1, 2, 4])
    b = np.asarray(blocked_echo_batch(
        hs, phis, ang, keys, ts, L=L, T=T, p=p, q=q, interpret=True))
    s = np.asarray(sigma_echo_batch(
        hs, phis, ang, keys, ts, L=L, T=T, K=1, p=p, q=q, has_y=False,
        initial_state="vacuum", dtype_name="complex64", ancilla_factor=1.0))
    assert np.max(np.abs(b - s)) < 1e-4
    b3 = np.asarray(blocked_echo_batch(
        hs, phis, ang, keys[:, :3], ts, L=L, T=T, p=p, q=q, interpret=True))
    assert np.max(np.abs(b3 - s[:, :3])) < 1e-4


def test_echo_pair_tiles_shared_builder():
    """The (pre, post) tile builder shared by resident and streamed echo:
    trip count lane, imag signs, and final sigma are consistent."""
    from dtc_tpu.ops.pallas_resident import echo_pair_tiles

    L, T, p = 4, 5, 0.3
    h = jnp.linspace(-1, 1, L)
    ph = jnp.linspace(-2, -1, L - 1)
    key = jax.random.PRNGKey(2)
    tiles, sig_fin = echo_pair_tiles(key, jnp.asarray(3), h, ph, L=L, T=T,
                                     p=p)
    tiles = np.asarray(tiles)
    assert tiles.shape == (2 * 2 * T, 128)
    assert tiles[0, 124] == 6.0  # trip count = 2t
    # steps 0..2 forward (imag +1), 3..5 inverse (-1), rest inactive
    signs = tiles[0::2, 125]
    # imag sign lane defaults to 0 on inactive/forward pre-tiles scaled by
    # inv flag; the kernel multiplies u7i by it only via pre lane 125
    assert np.all(signs[3:6] == -1.0)
    active = tiles[0::2, 126]
    assert np.all(active[:6] == 1.0) and np.all(active[6:] == 0.0)


def test_all_kernel_entry_points_trace():
    """jax.eval_shape every Pallas kernel entry point at every supported L.

    The kernels only DISPATCH on TPU, so a refactor that breaks kernel
    construction (free names, slot/semaphore mismatches) is invisible to
    the rest of the CPU suite — this happened once: the streamed echo
    kernel shipped with an unbound loop constant and only the TPU
    harnesses could have caught it. eval_shape traces the full pallas_call
    (kernel body included) without running the backend, so it is cheap on
    CPU and fails on any structural breakage.
    """
    from dtc_tpu.ops.pallas_resident import (resident_echo_batch,
                                             resident_forward_batch)
    from dtc_tpu.ops.pallas_resident_general import (general_echo_batch,
                                                     general_forward_batch)
    from dtc_tpu.ops.pallas_streamed import (streamed_echo_batch,
                                             streamed_forward_batch)

    T = 4
    keys = jax.random.split(jax.random.PRNGKey(0), 2)[None]
    ts = jnp.asarray([1, 2])

    def args(L):
        ang = jnp.zeros((T, 1, 2)).at[:, :, 0].set(0.97 * np.pi)
        return jnp.zeros((1, L)), jnp.zeros((1, L - 1)), ang

    for L in range(14, 22):
        hs, phis, ang = args(L)
        f = jax.eval_shape(
            lambda *a, L=L: resident_forward_batch(*a, L=L, T=T, p=0.05,
                                                   q=L // 2), hs, phis, ang,
            keys)
        assert f.shape == (1, 2, T)
        e = jax.eval_shape(
            lambda *a, L=L: resident_echo_batch(*a, L=L, T=T, p=0.05,
                                                q=L // 2), hs, phis, ang,
            keys, ts)
        assert e.shape == (1, 2, 2)
        g = jax.eval_shape(
            lambda *a, L=L: general_forward_batch(*a, L=L, T=T, K=1, p=0.05,
                                                  q=L // 2), hs, phis,
            ang, keys)
        assert g.shape == (1, 2, T)
        ge = jax.eval_shape(
            lambda *a, L=L: general_echo_batch(*a, L=L, T=T, K=1, p=0.05,
                                               q=L // 2), hs, phis,
            ang, keys, ts)
        assert ge.shape == (1, 2, 2)

    for L in range(22, 29):
        hs, phis, ang = args(L)
        f = jax.eval_shape(
            lambda *a, L=L: streamed_forward_batch(*a, L=L, T=T, p=0.05,
                                                   q=11), hs, phis, ang,
            keys)
        assert f.shape == (1, 2, T)
        e = jax.eval_shape(
            lambda *a, L=L: streamed_echo_batch(*a, L=L, T=T, p=0.05, q=11),
            hs, phis, ang, keys, ts)
        assert e.shape == (1, 2, 2)

    from dtc_tpu.ops.pallas_resident_blocked import (blocked_echo_batch,
                                                     blocked_forward_batch)

    for L in (22, 23):
        hs, phis, ang = args(L)
        f = jax.eval_shape(
            lambda *a, L=L: blocked_forward_batch(*a, L=L, T=T, p=0.05,
                                                  q=11), hs, phis, ang, keys)
        assert f.shape == (1, 2, T)
        e = jax.eval_shape(
            lambda *a, L=L: blocked_echo_batch(*a, L=L, T=T, p=0.05, q=11),
            hs, phis, ang, keys, ts)
        assert e.shape == (1, 2, 2)
        # blocked general (lab-frame) variants at the same sizes
        g = jax.eval_shape(
            lambda *a, L=L: general_forward_batch(*a, L=L, T=T, K=1,
                                                  p=0.05, q=11),
            hs, phis, ang, keys)
        assert g.shape == (1, 2, T)
        ge = jax.eval_shape(
            lambda *a, L=L: general_echo_batch(*a, L=L, T=T, K=1, p=0.05,
                                               q=11), hs, phis, ang, keys,
            ts)
        assert ge.shape == (1, 2, 2)
    # per-cycle schedule variants (L=22 only)
    hs, phis, ang = args(22)
    f = jax.eval_shape(
        lambda *a: blocked_forward_batch(*a, L=22, T=T, p=0.05, q=11,
                                         time_dependent=True),
        hs, phis, ang, keys)
    assert f.shape == (1, 2, T)
    e = jax.eval_shape(
        lambda *a: blocked_echo_batch(*a, L=22, T=T, p=0.05, q=11,
                                      time_dependent=True),
        hs, phis, ang, keys, ts)
    assert e.shape == (1, 2, 2)

    # VMEM-params branch: width=256 rows (L=27/28) overflow the 1 MB
    # double-buffered SMEM window past T=512, so the params BlockSpec
    # falls to VMEM there — trace it so the branch can't ship broken
    L, T600 = 27, 600
    ang = jnp.zeros((T600, 1, 2)).at[:, :, 0].set(0.97 * np.pi)
    f = jax.eval_shape(
        lambda *a: streamed_forward_batch(*a, L=L, T=T600, p=0.05, q=11),
        jnp.zeros((1, L)), jnp.zeros((1, L - 1)), ang, keys)
    assert f.shape == (1, 2, T600)
