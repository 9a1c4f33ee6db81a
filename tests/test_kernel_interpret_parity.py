"""Interpret-mode numerical parity for EVERY Pallas kernel family.

Round-1 believed the kernels interpret-infeasible, leaving their numerics
validated only by manual TPU harnesses (VERDICT r1 weak #7). Measured
round 2: at the minimum sizes (L=14 resident/general, L=22 streamed and
blocked) with tiny T each kernel interprets in 4-30 s, so the CPU suite
now carries trajectory-exact coverage vs the sigma engine with identical
presampled uniforms — a kernel regression fails HERE, not on the next
manual TPU run. p=0.6 forces sampled Pauli events (the sigma/turnaround
machinery actually fires; values flip sign rather than sitting at 1.0).

Expected error ~1e-5: interpret-mode dots are true f32 (the bf16x3 path
decomposes but the interpreter's dots don't lose precision), so this
bounds kernel MATH, not TPU dot precision (that is bounded on hardware:
benchmarks/parity_sweep.py -> PARITY.md).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # minutes of interpret-mode kernel math;
# `-m 'not slow'` gives the quick loop, the full suite runs them

from dtc_tpu.core.sigma_evolve import sigma_echo_batch, sigma_forward_batch  # noqa: E402
from dtc_tpu.io.disorder import generate_disorder
from dtc_tpu.models.drives import build_kick_schedule, n_kick_slots

SKW = dict(initial_state="vacuum", dtype_name="complex64",
           ancilla_factor=1.0)


def _setup(L, T, pol="x"):
    hs_np, phis_np = generate_disorder(L, 1, seed=7)
    hs = jnp.asarray(hs_np[:, :L])
    phis = jnp.asarray(phis_np[:, :L - 1])
    sched = build_kick_schedule(pol, 0.97, T)
    keys = jax.random.split(jax.random.PRNGKey(9), 1)[None]
    return hs, phis, sched.angles, keys


def test_resident_forward_and_echo_interpret_parity():
    from dtc_tpu.ops.pallas_resident import (resident_echo_batch,
                                             resident_forward_batch)

    L, T, p, q = 14, 3, 0.6, 7
    hs, phis, ang, keys = _setup(L, T)
    b = np.asarray(resident_forward_batch(hs, phis, ang, keys, L=L, T=T,
                                          p=p, q=q, interpret=True))
    s = np.asarray(sigma_forward_batch(hs, phis, ang, keys, L=L, T=T, K=1,
                                       p=p, q=q, has_y=False, **SKW))
    assert np.max(np.abs(b - s)) < 1e-4
    ts = jnp.asarray([1, 3])
    be = np.asarray(resident_echo_batch(hs, phis, ang, keys, ts, L=L, T=T,
                                        p=p, q=q, interpret=True))
    se = np.asarray(sigma_echo_batch(hs, phis, ang, keys, ts, L=L, T=T,
                                     K=1, p=p, q=q, has_y=False, **SKW))
    assert np.max(np.abs(be - se)) < 1e-4


@pytest.mark.parametrize("pol", ["y", "xy"])
def test_general_kernel_interpret_parity(pol):
    from dtc_tpu.ops.pallas_resident_general import (general_echo_batch,
                                                     general_forward_batch)

    L, T, p, q = 14, 3, 0.6, 7
    K = n_kick_slots(pol)
    hs, phis, ang, keys = _setup(L, T, pol)
    b = np.asarray(general_forward_batch(hs, phis, ang, keys, L=L, T=T,
                                         K=K, p=p, q=q, interpret=True))
    s = np.asarray(sigma_forward_batch(hs, phis, ang, keys, L=L, T=T, K=K,
                                       p=p, q=q, has_y=True, **SKW))
    assert np.max(np.abs(b - s)) < 1e-4
    ts = jnp.asarray([1, 3])
    be = np.asarray(general_echo_batch(hs, phis, ang, keys, ts, L=L, T=T,
                                       K=K, p=p, q=q, interpret=True))
    se = np.asarray(sigma_echo_batch(hs, phis, ang, keys, ts, L=L, T=T,
                                     K=K, p=p, q=q, has_y=True, **SKW))
    assert np.max(np.abs(be - se)) < 1e-4


def test_blocked_general_kernel_interpret_parity():
    """The blocked-plane general (lab-frame) kernel at L=22: xy (K=2)
    forward + echo vs sigma — the echo path hits a sign-flipped
    trajectory (-0.33), so daggered slots, reversed slot order, and the
    leading D0^dagger all fire."""
    from dtc_tpu.ops.pallas_resident_general import (general_echo_batch,
                                                     general_forward_batch)

    L, T, p, q = 22, 2, 0.6, 11
    K = n_kick_slots("xy")
    hs, phis, ang, keys = _setup(L, T, "xy")
    b = np.asarray(general_forward_batch(hs, phis, ang, keys, L=L, T=T,
                                         K=K, p=p, q=q, interpret=True))
    s = np.asarray(sigma_forward_batch(hs, phis, ang, keys, L=L, T=T, K=K,
                                       p=p, q=q, has_y=True, **SKW))
    assert np.max(np.abs(b - s)) < 1e-4
    ts = jnp.asarray([2])
    be = np.asarray(general_echo_batch(hs, phis, ang, keys, ts, L=L, T=T,
                                       K=K, p=p, q=q, interpret=True))
    se = np.asarray(sigma_echo_batch(hs, phis, ang, keys, ts, L=L, T=T,
                                     K=K, p=p, q=q, has_y=True, **SKW))
    assert np.max(np.abs(be - se)) < 1e-4
    assert np.min(se) < 0.0  # sign-flipped trajectory (events fired)


def test_blocked_general_low_L_interpret_parity():
    """The blocked-plane general body at L=18 — the new DEFAULT lower end
    (general_blocked_probe.py measured it >= the full-plane body there).
    TOP=16 clamps the pass-1 block height to the whole plane, a geometry
    the L=22 test (TOP=256, 16 blocks) never hits."""
    from dtc_tpu.ops.pallas_resident_general import (_blocked_min_L,
                                                     general_echo_batch,
                                                     general_forward_batch)

    L, T, p, q = 18, 2, 0.6, 9
    assert L >= _blocked_min_L()  # this test must exercise the blocked body
    hs, phis, ang, keys = _setup(L, T, "y")
    b = np.asarray(general_forward_batch(hs, phis, ang, keys, L=L, T=T,
                                         K=1, p=p, q=q, interpret=True))
    s = np.asarray(sigma_forward_batch(hs, phis, ang, keys, L=L, T=T, K=1,
                                       p=p, q=q, has_y=True, **SKW))
    assert np.max(np.abs(b - s)) < 1e-4
    ts = jnp.asarray([2])
    be = np.asarray(general_echo_batch(hs, phis, ang, keys, ts, L=L, T=T,
                                       K=1, p=p, q=q, interpret=True))
    se = np.asarray(sigma_echo_batch(hs, phis, ang, keys, ts, L=L, T=T,
                                     K=1, p=p, q=q, has_y=True, **SKW))
    assert np.max(np.abs(be - se)) < 1e-4


def test_streamed_kernel_interpret_parity():
    """The HBM-streamed kernels' DMA machinery (async slab copies, the
    ANY-space aliased state pair, dynamic trip counts) runs under
    interpret too — L=22/T=2 takes ~45 s combined."""
    from dtc_tpu.ops.pallas_streamed import (streamed_echo_batch,
                                             streamed_forward_batch)

    L, T, p, q = 22, 2, 0.6, 11
    hs, phis, ang, keys = _setup(L, T)
    b = np.asarray(streamed_forward_batch(hs, phis, ang, keys, L=L, T=T,
                                          p=p, q=q, interpret=True))
    s = np.asarray(sigma_forward_batch(hs, phis, ang, keys, L=L, T=T, K=1,
                                       p=p, q=q, has_y=False, **SKW))
    assert np.max(np.abs(b - s)) < 1e-4
    ts = jnp.asarray([1, 2])
    be = np.asarray(streamed_echo_batch(hs, phis, ang, keys, ts, L=L, T=T,
                                        p=p, q=q, interpret=True))
    se = np.asarray(sigma_echo_batch(hs, phis, ang, keys, ts, L=L, T=T,
                                     K=1, p=p, q=q, has_y=False, **SKW))
    assert np.max(np.abs(be - se)) < 1e-4
    assert np.max(np.abs(se - 1.0)) > 1e-3  # events fired (echo != 1)


def test_streamed_device_echo_interpret_parity():
    """Device-noise echo through the STREAMED echo kernel's ext_tiles
    branch (core.device_evolve.device_echo_pair_tiles feeding
    streamed_echo_batch directly at L=22 — device_kernel_echo_batch
    dispatches blocked there, so this exercises the streamed plumbing the
    L=24..28 dispatch uses) vs the sigma-frame device oracle with
    identical presampled events."""
    from dtc_tpu.core.device_evolve import (
        device_echo_pair_tiles,
        device_sigma_echo_batch,
    )
    from dtc_tpu.ops.pallas_streamed import streamed_echo_batch

    L, T, q, epk = 22, 2, 11, 2
    hs, phis, ang, keys = _setup(L, T)
    h, ph = hs[0], phis[0]
    p1 = jnp.linspace(0.2, 0.6, L)
    p2 = jnp.linspace(0.2, 0.7, L - 1)
    ts = jnp.asarray([1, 2])
    tiles, sig_fin = jax.vmap(lambda k: jax.vmap(
        lambda t: device_echo_pair_tiles(
            k, t, h, ph, p1, p2, L=L, T=T, epk=epk, width=128))(ts))(keys[0])
    be = np.asarray(streamed_echo_batch(
        hs, phis, ang, keys, ts, L=L, T=T, p=0.0, q=q, ancilla_factor=0.9,
        interpret=True, ext_tiles=tiles[None], ext_sig=sig_fin[None]))
    se = np.asarray(device_sigma_echo_batch(
        h, ph, p1, p2, ang, keys[0], ts, L=L, T=T, q=q,
        dtype_name="complex128", ancilla_factor=0.9, events_per_kick=epk))
    assert np.max(np.abs(be[0] - se)) < 1e-4, (be, se)
    assert np.max(np.abs(se - 0.9)) > 1e-3  # events fired


def test_streamed_hi_kernel_interpret_parity():
    """The r2-blocked streamed kernel (the single-chip L=29/30 engine,
    ops/pallas_streamed_hi) at its minimum geometry L=22/T=2: merged
    m-kick pass A (16 MB r2-block slabs) + strided (R2, MS, CS) pass-B
    sub-slabs, vs the sigma engine with identical presampled uniforms."""
    from dtc_tpu.ops.pallas_streamed_hi import streamed_hi_forward_batch

    L, T, p, q = 22, 2, 0.6, 11
    hs, phis, ang, keys = _setup(L, T)
    b = np.asarray(streamed_hi_forward_batch(hs, phis, ang, keys, L=L, T=T,
                                             p=p, q=q, interpret=True))
    s = np.asarray(sigma_forward_batch(hs, phis, ang, keys, L=L, T=T, K=1,
                                       p=p, q=q, has_y=False, **SKW))
    assert np.max(np.abs(b - s)) < 1e-4
    # events fired: p=0.6 sigma-frame flips make A(1) positive (the
    # noiseless g=0.97 period-doubled value is ~ -1)
    assert s[0, 0, 1] > 0


def test_streamed_row_probe_interpret_parity():
    """Probe qubits ABOVE the column bits (q >= 14 — the reference default
    q = L//2 lands there for every L >= 28, e.g. q=14 at L=28 and q=16 for
    L=32 sharded over 4 chips): the A(t) fold becomes a row/block sign
    over the (r2, m) state-index bits instead of a lane sign. Covers the
    m band (q=17) on both streamed kernels + the echo terminal sweep, and
    the r2 band (q=21) on the hi kernel, vs the sigma engine (which is
    q-generic) with identical presampled uniforms."""
    from dtc_tpu.ops.pallas_streamed import streamed_forward_batch
    from dtc_tpu.ops.pallas_streamed_hi import (
        streamed_hi_echo_batch,
        streamed_hi_forward_batch,
    )

    L, T, p = 22, 2, 0.6
    hs, phis, ang, keys = _setup(L, T)
    s17 = np.asarray(sigma_forward_batch(hs, phis, ang, keys, L=L, T=T,
                                         K=1, p=p, q=17, has_y=False,
                                         **SKW))
    b = np.asarray(streamed_forward_batch(hs, phis, ang, keys, L=L, T=T,
                                          p=p, q=17, interpret=True))
    assert np.max(np.abs(b - s17)) < 1e-4
    h17 = np.asarray(streamed_hi_forward_batch(
        hs, phis, ang, keys, L=L, T=T, p=p, q=17, interpret=True))
    assert np.max(np.abs(h17 - s17)) < 1e-4
    # r2 band (bits 21..): L=22 has exactly one r2 bit
    s21 = np.asarray(sigma_forward_batch(hs, phis, ang, keys, L=L, T=T,
                                         K=1, p=p, q=21, has_y=False,
                                         **SKW))
    h21 = np.asarray(streamed_hi_forward_batch(
        hs, phis, ang, keys, L=L, T=T, p=p, q=21, interpret=True))
    assert np.max(np.abs(h21 - s21)) < 1e-4
    assert np.max(np.abs(s17 - s21)) > 1e-3  # distinct probes, real signal
    ts = jnp.asarray([2])
    se = np.asarray(sigma_echo_batch(hs, phis, ang, keys, ts, L=L, T=T,
                                     K=1, p=p, q=17, has_y=False, **SKW))
    he = np.asarray(streamed_hi_echo_batch(hs, phis, ang, keys, ts, L=L,
                                           T=T, p=p, q=17, interpret=True))
    assert np.max(np.abs(he - se)) < 1e-4
    from dtc_tpu.ops.pallas_streamed import streamed_echo_batch

    ee = np.asarray(streamed_echo_batch(hs, phis, ang, keys, ts, L=L, T=T,
                                        p=p, q=17, interpret=True))
    assert np.max(np.abs(ee - se)) < 1e-4


def test_streamed_hi_echo_interpret_parity():
    """The r2-blocked streamed ECHO kernel (the single-chip L=29/30 echo
    engine) at its minimum geometry L=22/T=2: per-pair dynamic trip
    counts, the echo straddle ordering specific to this layout (pre-s20
    against the block-index parity in pass A, post-s20 on the pass-B
    output rows), terminal measurement sweep — vs the sigma engine with
    identical presampled uniforms."""
    from dtc_tpu.ops.pallas_streamed_hi import streamed_hi_echo_batch

    L, T, p, q = 22, 2, 0.6, 11
    hs, phis, ang, keys = _setup(L, T)
    ts = jnp.asarray([1, 2])
    be = np.asarray(streamed_hi_echo_batch(hs, phis, ang, keys, ts, L=L,
                                           T=T, p=p, q=q, interpret=True))
    se = np.asarray(sigma_echo_batch(hs, phis, ang, keys, ts, L=L, T=T,
                                     K=1, p=p, q=q, has_y=False, **SKW))
    assert np.max(np.abs(be - se)) < 1e-4
    assert np.max(np.abs(se - 1.0)) > 1e-3  # events fired (echo != 1)
