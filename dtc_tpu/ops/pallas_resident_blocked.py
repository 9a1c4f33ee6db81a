"""Blocked-plane VMEM-resident Floquet kernel for L = 17..23 (x drive).

The full-plane resident kernel (ops/pallas_resident.py) operates on FULL
(TOP, 16384) planes: at L=22 Mosaic's register allocator spills ~102 MB
of vector registers compiling that body (docs/PERFORMANCE.md "resident
kernel at L=22", a measured negative result) — the plane values are too
large to hold live. This kernel keeps the state VMEM-RESIDENT (32 MB at
L=22, 64 MB at L=23 — both under the ~122 MB practical scoped-VMEM max)
but restructures every plane op into inner ``fori_loop``s over plane
blocks, so the live working set per iteration is a few BT*64 KB /
TOP*CS*4 B chunks instead of full planes:

  pass 1 (bits 0..13 kicks + folded low/mid diagonal + bond-6 straddle):
      loop over TOP-axis blocks of BT rows; per block two Karatsuba
      (BT*128, 128) x (128, 128) dots with the axis swap between them
  pass 2 (top kick + folded high diagonal + bond-13 straddle + measure):
      per column half (the straddle's z13 sign is constant inside a
      half), loop over column chunks of CS lanes; per chunk one
      Karatsuba (TOP, TOP) x (TOP, CS) dot, then the A(t) partial sum

Same math, same per-cycle SMEM parameter rows, same presampled
trajectories as the L <= 21 kernel — values match the sigma engine
trajectory-for-trajectory at the dot-precision level. The physics and
the noise/measurement conventions mirror the reference simulation loop
(autocorr-delta-a-single-qiskit-fast.py:111-147) exactly as
core/sigma_evolve.py does.

Replaces the HBM-streamed kernel as the default L = 22..23 engine (the
streamed kernel's two DMA sweeps per cycle move 2 x state through HBM;
here a cycle touches HBM not at all) — AND the full-plane resident kernel
at 17 <= L <= 21 for constant schedules: the bounded-live-set fori_loop
body schedules better at the full-plane kernel's own sizes too (measured
fwd 1.43x at L=21, 1.34x at L=20, 1.14x at L=19; parity ~1e-6 —
benchmarks/blocked_lowL_probe.py). The floor is TOP >= 8 (L >= 17), the
f32 sublane-tile minimum for the pass-1 row blocks.
"""

from __future__ import annotations

import functools
import os as _os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dtc_tpu.core.sigma_evolve import presample_noise
from dtc_tpu.core.statevector import neel_index
from dtc_tpu.ops.pallas_noise import pack_cycle_params_compact
from dtc_tpu.ops.pallas_resident import (
    _C,
    _HALF_PI,
    _cmul,
    _dot_f32,
    _kick_matrices,
)


def blocked_block_sizes(TOP: int) -> tuple[int, int]:
    """(bt, cs) pass-1 TOP-row block height / pass-2 column-chunk width,
    env-tunable (DTC_TPU_BLOCKED_BT / DTC_TPU_BLOCKED_CS), validated here
    for every blocked kernel:
    - bt must divide TOP (whole blocks) and be a multiple of 8 (f32
      sublane tiling for the dynamic-slice offsets);
    - cs must divide _C/2 (whole chunks inside a bond-13 half) and be a
      multiple of 256: the in-chunk straddle/measure sign tables (zz67 is
      z6^z7, 256-periodic) are built from WITHIN-chunk lane indices plus
      the chunk offset only where the formula says so — a cs below 256
      would silently corrupt the bond-6 signs."""
    # default bt=16 clamps to TOP at L=17 (TOP=8) so the kernel's full
    # 17 <= L <= 23 range works without env overrides; at TOP=64 (L=20,
    # the headline shape) bt=32 measured consistently ~3% faster across
    # two tune sweeps (parity_results.json blocked_l20_tune{,_round2})
    default_bt = "32" if TOP == 64 else "16"
    bt = min(int(_os.environ.get("DTC_TPU_BLOCKED_BT", default_bt)), TOP)
    cs = int(_os.environ.get("DTC_TPU_BLOCKED_CS", "2048"))
    if TOP % bt or bt % 8:
        raise ValueError(f"bt={bt} must divide TOP={TOP} and be a"
                         " multiple of 8")
    if (_C // 2) % cs or cs % 256:
        raise ValueError(f"cs={cs} must divide {_C // 2} and be a"
                         " multiple of 256")
    return bt, cs


def p2_pack_factor(TOP: int, cs: int) -> int:
    """Pass-2 block-diagonal packing factor P (1 = unpacked).

    At TOP < 128 the pass-2 top-kick dot (TOP, TOP) x (TOP, CS) fills
    only a (TOP/128)^2 corner of the 128x128 MXU systolic array — at
    L=20 (TOP=64) a quarter, at L=18 (TOP=16) 1/64. Packing
    P = 128/TOP independent (half, chunk) tiles into ONE block-diagonal
    (P*TOP, P*TOP) x (P*TOP, CS) dot restores full fill: the first P/2
    diagonal blocks carry the bond-13 half-0 (+s13) scaled top matrix
    acting on P/2 consecutive half-0 column chunks, the rest the half-1
    (-s13) matrix on half-1 chunks; off-diagonal blocks are ZERO, so the
    packed dot computes exactly the P separate products. The
    kron(I_P, U_top) expansion is loop-invariant and built OUTSIDE the
    kernel (the per-cycle diagonal folds are pure row scalings, so the
    packed matrix is the same expansion row-scaled by the concatenated
    per-block angle rows). P is capped at 2*n_cs (the number of
    (half, chunk) tiles a cycle has) and gated by DTC_TPU_BLOCKED_P2PACK
    (unset = auto: TOP <= 32 only — at TOP=64 the 2-tile concat/split
    overhead measured ~7% SLOWER than the quarter-fill dot it replaces
    on the L=20 bench shape, parity_results.json blocked_l20_tune_pack;
    "1" forces packing at every TOP < 128, "0" disables).
    """
    n_cs = (_C // 2) // cs
    mode = _os.environ.get("DTC_TPU_BLOCKED_P2PACK", "auto")
    if mode == "0":
        return 1
    if mode != "1" and TOP > 32:
        return 1
    return max(1, min(128 // TOP, 2 * n_cs))


def _schoolbook_cmul() -> bool:
    """DTC_TPU_BLOCKED_CMUL=schoolbook swaps the FORWARD kernel's complex
    multiplies from Karatsuba (3 dots + a full-plane input add + two
    output subtracts) to the 4-dot schoolbook form (no input add, one
    output add) — a bounded probe of the MXU-vs-VPU balance: the blocked
    body is not MXU-FLOP-bound (docs/PERFORMANCE.md open-ceiling notes),
    so trading 3 extra bf16 passes per dot-group for two fewer full-plane
    VPU ops could go either way. Measured via blocked_l20_tune.py cmul
    mode; values differ only by dot-order rounding."""
    return _os.environ.get("DTC_TPU_BLOCKED_CMUL",
                           "karatsuba") == "schoolbook"


def _make_blocked_kernel(L: int, T: int, q: int, b0: int,
                         time_dep: bool, bt: int, cs: int,
                         nb: int = 1, P: int = 1):  # noqa: C901
    """One grid step = ``nb`` trajectories, all T cycles, blocked plane ops.

    P > 1: pass-2 block-diagonal packing (see p2_pack_factor) — the
    utr/uti refs then hold the kron(I_P, U_top) expansion.

    nb > 1 interleaves independent trajectories at the BLOCK level: the
    kick matrices are shared (constant schedule — only the SMEM noise rows
    differ per trajectory), and the kernel is not MXU-FLOP-bound
    (docs/PERFORMANCE.md "open ceiling"), so issuing trajectory b+1's
    block back-to-back with trajectory b's gives Mosaic independent MXU
    work to overlap with the swaps/cmul VPU phases. Unlike the full-plane
    kernel's stage-interleaved nb (whose unrolled body explodes Mosaic
    compile time), the body here stays a fori_loop — only the per-
    iteration statement count doubles.
    """
    TOP = 1 << (L - 14)
    n_bt = TOP // bt
    n_cs = (_C // 2) // cs
    B = range(nb)
    schoolbook = _schoolbook_cmul()

    def kernel(u7r_ref, u7i_ref, utr_ref, uti_ref, par_ref,
               a_out_ref, st_ref):
        arow = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
        alane = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
        apos = arow * 128 + alane

        # init: basis state b0, one TOP-block at a time
        colb = jax.lax.broadcasted_iota(jnp.uint32, (bt, _C), 1)
        topb = jax.lax.broadcasted_iota(jnp.uint32, (bt, _C), 0)

        def init_block(i, _):
            gidx = ((topb + jnp.uint32(i * bt)) << 14) | colb
            for b in B:
                st_ref[b, 0, pl.ds(i * bt, bt), :] = jnp.where(
                    gidx == jnp.uint32(b0), 1.0, 0.0)
                st_ref[b, 1, pl.ds(i * bt, bt), :] = jnp.zeros(
                    (bt, _C), jnp.float32)
            return _

        jax.lax.fori_loop(0, n_bt, init_block, None)

        # loop-invariant tables (identical to the L <= 21 kernel)
        l7 = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
        z7 = [(1 - 2 * ((l7 >> k) & 1)).astype(jnp.float32) for k in range(7)]
        lci = jax.lax.broadcasted_iota(jnp.int32, (1, _C), 1)
        zz67 = (1 - 2 * (((lci >> 6) ^ (lci >> 7)) & 1)).astype(jnp.float32)
        lcs = jax.lax.broadcasted_iota(jnp.int32, (1, cs), 1)
        hti = jax.lax.broadcasted_iota(jnp.int32, (TOP, 1), 0)
        zh = [(1 - 2 * ((hti >> k) & 1)).astype(jnp.float32)
              for k in range(L - 14)]

        def cycle(cyc, _):
            ui = cyc if time_dep else 0
            u7rt = u7r_ref[ui].T
            u7it = u7i_ref[ui].T

            # compact row layout: n | sig | flip | h | phi at offsets
            # 0, L, 2L, 3L-1, 4L-1 (pack_cycle_params_compact)
            def cz(b, qq):
                return (par_ref[0, b, cyc, 3 * L - 1 + qq]
                        * (par_ref[0, b, cyc, L + qq] - 0.5)
                        - _HALF_PI * par_ref[0, b, cyc, qq])

            def cb(b, jj):
                return (par_ref[0, b, cyc, 4 * L - 1 + jj]
                        * (par_ref[0, b, cyc, 2 * L + jj] - 0.5))

            def seven_bit_angle(b, base, bias):
                th = jnp.full((1, 128), bias, jnp.float32)
                for k in range(7):
                    th = th + cz(b, base + k) * z7[k]
                    if k > 0:
                        th = th + cb(b, base + k - 1) * (z7[k - 1] * z7[k])
                return th

            def scaled(th):
                dr = jnp.cos(th)
                di = jnp.sin(th)
                br = u7rt * dr - u7it * di
                bi = u7rt * di + u7it * dr
                return br, bi, br + bi

            def kara_right(mr, mi, br, bi, bs):
                if schoolbook:
                    return (_dot_f32(mr, br) - _dot_f32(mi, bi),
                            _dot_f32(mr, bi) + _dot_f32(mi, br))
                p1 = _dot_f32(mr, br)
                p2 = _dot_f32(mi, bi)
                p3 = _dot_f32(mr + mi, bs)
                return p1 - p2, p3 - p1 - p2

            c0 = [_HALF_PI * sum(par_ref[0, b, cyc, qq] for qq in range(L))
                  for b in B]
            bl = [scaled(seven_bit_angle(b, 0, c0[b])) for b in B]
            bm = [scaled(seven_bit_angle(b, 7, 0.0)) for b in B]
            s6 = [cb(b, 6) for b in B]
            c6 = [jnp.cos(s6[b]) for b in B]
            s6z = [zz67 * jnp.sin(s6[b]) for b in B]

            # ---- pass 1: bits 0..13 kicks + bond-6 straddle, per TOP block
            def p1_block(i, _):
                for b in B:
                    mr = st_ref[b, 0, pl.ds(i * bt, bt), :].reshape(
                        bt * 128, 128)
                    mi = st_ref[b, 1, pl.ds(i * bt, bt), :].reshape(
                        bt * 128, 128)
                    mr, mi = kara_right(mr, mi, *bl[b])
                    mr = jnp.swapaxes(mr.reshape(bt, 128, 128), 1, 2).reshape(
                        bt * 128, 128)
                    mi = jnp.swapaxes(mi.reshape(bt, 128, 128), 1, 2).reshape(
                        bt * 128, 128)
                    mr, mi = kara_right(mr, mi, *bm[b])
                    mr = jnp.swapaxes(mr.reshape(bt, 128, 128), 1, 2).reshape(
                        bt, _C)
                    mi = jnp.swapaxes(mi.reshape(bt, 128, 128), 1, 2).reshape(
                        bt, _C)
                    mr, mi = _cmul(mr, mi, c6[b], s6z[b])
                    st_ref[b, 0, pl.ds(i * bt, bt), :] = mr
                    st_ref[b, 1, pl.ds(i * bt, bt), :] = mi
                return _

            jax.lax.fori_loop(0, n_bt, p1_block, None)

            # ---- pass 2: top kick + high diag + bond-13 straddle + measure
            th_hi = []
            for b in B:
                th = jnp.zeros((TOP, 1), jnp.float32)
                for k in range(L - 14):
                    th = th + cz(b, 14 + k) * zh[k]
                    if k > 0:
                        th = th + cb(b, 13 + k) * (zh[k - 1] * zh[k])
                th_hi.append(th)
            s13z14 = [cb(b, 13) * zh[0] for b in B]
            utr = utr_ref[ui]
            uti = uti_ref[ui]

            a_next = (jnp.zeros((), jnp.float32),) * nb
            if P == 1:
                for half, sgn in ((0, 1.0), (1, -1.0)):
                    bts_b = []
                    for b in B:
                        th = th_hi[b] + sgn * s13z14[b]
                        dr = jnp.cos(th)
                        di = jnp.sin(th)
                        btr = utr * dr - uti * di
                        bti = utr * di + uti * dr
                        bts_b.append((btr, bti, btr + bti))
                    base = half * (_C // 2)

                    def p2_chunk(j, accs, bts_b=bts_b, base=base):
                        off = base + j * cs
                        zq = (1 - 2 * (((lcs + off) >> q) & 1)).astype(
                            jnp.float32)
                        out = []
                        for b in B:
                            btr, bti, bts = bts_b[b]
                            hr = st_ref[b, 0, :, pl.ds(off, cs)]
                            hi_ = st_ref[b, 1, :, pl.ds(off, cs)]
                            if schoolbook:
                                kr = _dot_f32(btr, hr) - _dot_f32(bti, hi_)
                                ki = _dot_f32(btr, hi_) + _dot_f32(bti, hr)
                            else:
                                q1 = _dot_f32(btr, hr)
                                q2 = _dot_f32(bti, hi_)
                                q3 = _dot_f32(bts, hr + hi_)
                                kr = q1 - q2
                                ki = q3 - q1 - q2
                            st_ref[b, 0, :, pl.ds(off, cs)] = kr
                            st_ref[b, 1, :, pl.ds(off, cs)] = ki
                            out.append(
                                accs[b] + jnp.sum((kr * kr + ki * ki) * zq))
                        return tuple(out)

                    a_next = jax.lax.fori_loop(0, n_cs, p2_chunk, a_next)
            else:
                # packed: one block-diagonal (P*TOP, P*TOP) x (P*TOP, cs)
                # dot covers P/2 consecutive chunks of EACH bond-13 half
                # per iteration (utr/uti hold kron(I_P, U_top); the
                # per-block row angles select the half's +-s13 sign)
                HB = P // 2
                bts_b = []
                for b in B:
                    thp = th_hi[b] + s13z14[b]
                    thm = th_hi[b] - s13z14[b]
                    th = jnp.concatenate([thp] * HB + [thm] * HB, axis=0)
                    dr = jnp.cos(th)
                    di = jnp.sin(th)
                    btr = utr * dr - uti * di
                    bti = utr * di + uti * dr
                    bts_b.append((btr, bti, btr + bti))

                def p2_packed(j, accs):
                    offs = [j * (HB * cs) + pi * cs for pi in range(HB)]
                    offs = offs + [(_C // 2) + o for o in offs]
                    out = []
                    for b in B:
                        btr, bti, bts = bts_b[b]
                        hr = jnp.concatenate(
                            [st_ref[b, 0, :, pl.ds(o, cs)] for o in offs],
                            axis=0)
                        hi_ = jnp.concatenate(
                            [st_ref[b, 1, :, pl.ds(o, cs)] for o in offs],
                            axis=0)
                        q1 = _dot_f32(btr, hr)
                        q2 = _dot_f32(bti, hi_)
                        q3 = _dot_f32(bts, hr + hi_)
                        kr = q1 - q2
                        ki = q3 - q1 - q2
                        acc = accs[b]
                        for pi, o in enumerate(offs):
                            krp = kr[pi * TOP:(pi + 1) * TOP, :]
                            kip = ki[pi * TOP:(pi + 1) * TOP, :]
                            st_ref[b, 0, :, pl.ds(o, cs)] = krp
                            st_ref[b, 1, :, pl.ds(o, cs)] = kip
                            zq = (1 - 2 * (((lcs + o) >> q) & 1)).astype(
                                jnp.float32)
                            acc = acc + jnp.sum(
                                (krp * krp + kip * kip) * zq)
                        out.append(acc)
                    return tuple(out)

                a_next = jax.lax.fori_loop(0, n_cs // HB, p2_packed, a_next)

            @pl.when(cyc + 1 < T)
            def _():
                for b in B:
                    a_out_ref[0, b] = a_out_ref[0, b] + jnp.where(
                        apos == cyc + 1, a_next[b], 0.0)

            return _

        for b in B:
            a_out_ref[0, b] = jnp.where(
                apos == 0, float(1 - 2 * ((b0 >> q) & 1)), 0.0)
        jax.lax.fori_loop(0, T, cycle, None)

    return kernel


def _make_blocked_echo_kernel(L: int, T2: int, q: int, b0: int,
                              time_dep: bool, bt: int, cs: int,
                              nb: int = 1, P: int = 1):  # noqa: C901
    """Echo: one grid step = ``nb`` (traj, t) pairs, 2T masked steps, blocked.

    Same (pre, post) interleaved compact step tiles as the L <= 21
    resident echo (shared builder pallas_resident.echo_pair_tiles): both
    step diagonals fold into the kick dots as row/column scalings; the
    pre bond-6/13 straddles are per-block cmuls in pass 1 and the post
    bond-6 straddle a per-chunk cmul in pass 2 (it commutes with the top
    dot: bits 6/7 are column bits the TOP contraction never touches).
    The per-pair trip count bounds the step loop, so only the first 2t
    active steps run — the select the full-plane kernel carries is
    redundant under that bound and dropped here.

    nb > 1 interleaves SAME-t pairs (the wrapper groups pairs t-major so
    every pair in a grid step shares the trip count) — the forward
    kernel's MXU/VPU-overlap lever applied to the echo body.
    """
    TOP = 1 << (L - 14)
    n_bt = TOP // bt
    n_cs = (_C // 2) // cs
    B = range(nb)

    def kernel(u7r_ref, u7i_ref, utr_ref, uti_ref, par_ref,
               a_out_ref, st_ref):
        colb = jax.lax.broadcasted_iota(jnp.uint32, (bt, _C), 1)
        topb = jax.lax.broadcasted_iota(jnp.uint32, (bt, _C), 0)

        def init_block(i, _):
            gidx = ((topb + jnp.uint32(i * bt)) << 14) | colb
            for b in B:
                st_ref[b, 0, pl.ds(i * bt, bt), :] = jnp.where(
                    gidx == jnp.uint32(b0), 1.0, 0.0)
                st_ref[b, 1, pl.ds(i * bt, bt), :] = jnp.zeros(
                    (bt, _C), jnp.float32)
            return _

        jax.lax.fori_loop(0, n_bt, init_block, None)

        # loop-invariant tables
        l7r = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
        z7o = [(1 - 2 * ((l7r >> k) & 1)).astype(jnp.float32)
               for k in range(7)]
        l7c = jax.lax.broadcasted_iota(jnp.int32, (128, 1), 0)
        z7i = [(1 - 2 * ((l7c >> k) & 1)).astype(jnp.float32)
               for k in range(7)]
        lci = jax.lax.broadcasted_iota(jnp.int32, (1, _C), 1)
        zz67 = (1 - 2 * (((lci >> 6) ^ (lci >> 7)) & 1)).astype(jnp.float32)
        z13c = (1 - 2 * ((lci >> 13) & 1)).astype(jnp.float32)
        lcs = jax.lax.broadcasted_iota(jnp.int32, (1, cs), 1)
        zz67c = (1 - 2 * (((lcs >> 6) ^ (lcs >> 7)) & 1)).astype(jnp.float32)
        hti = jax.lax.broadcasted_iota(jnp.int32, (TOP, 1), 0)
        zho = [(1 - 2 * ((hti >> k) & 1)).astype(jnp.float32)
               for k in range(L - 14)]
        htc = jax.lax.broadcasted_iota(jnp.int32, (1, TOP), 1)
        zhi = [(1 - 2 * ((htc >> k) & 1)).astype(jnp.float32)
               for k in range(L - 14)]
        hbt = jax.lax.broadcasted_iota(jnp.int32, (bt, 1), 0)

        # compact row layout: n | sig | flip | h | phi at offsets
        # 0, L, 2L, 3L-1, 4L-1; flags at lanes 124..127
        def cz(b, ti, qq):
            return (par_ref[0, b, ti, 3 * L - 1 + qq]
                    * (par_ref[0, b, ti, L + qq] - 0.5)
                    - _HALF_PI * par_ref[0, b, ti, qq])

        def cb(b, ti, jj):
            return (par_ref[0, b, ti, 4 * L - 1 + jj]
                    * (par_ref[0, b, ti, 2 * L + jj] - 0.5))

        def angle7(b, ti, base, bias, zt):
            th = bias + jnp.zeros_like(zt[0])
            for k in range(7):
                th = th + cz(b, ti, base + k) * zt[k]
                if k > 0:
                    th = th + cb(b, ti, base + k - 1) * (zt[k - 1] * zt[k])
            return th

        def angle_hi(b, ti, zt):
            th = jnp.zeros_like(zt[0])
            for k in range(L - 14):
                th = th + cz(b, ti, 14 + k) * zt[k]
                if k > 0:
                    th = th + cb(b, ti, 13 + k) * (zt[k - 1] * zt[k])
            return th

        def step(k, _):
            pre = 2 * k
            post = 2 * k + 1
            # schedule-structural flags (imag sign, matrix index) are
            # identical across the grid step's same-t pairs; read per-b
            # anyway so the kernel never assumes it
            def kara_right(xr, xi, br, bi, bs):
                p1 = _dot_f32(xr, br)
                p2 = _dot_f32(xi, bi)
                p3 = _dot_f32(xr + xi, bs)
                return p1 - p2, p3 - p1 - p2

            bl, bm, pre1 = [], [], []
            for b in B:
                imag_sign = par_ref[0, b, pre, 125]
                ui = (par_ref[0, b, pre, 127].astype(jnp.int32)
                      if time_dep else 0)
                c0p = _HALF_PI * sum(par_ref[0, b, pre, qq]
                                     for qq in range(L))
                c0q = _HALF_PI * sum(par_ref[0, b, post, qq]
                                     for qq in range(L))
                u7rt = u7r_ref[ui].T
                u7it = u7i_ref[ui].T * imag_sign

                def scaled(base, bias_p, bias_q, b=b, u7rt=u7rt, u7it=u7it):
                    th = (angle7(b, pre, base, bias_p, z7i)
                          + angle7(b, post, base, bias_q, z7o))
                    dr = jnp.cos(th)
                    di = jnp.sin(th)
                    br = u7rt * dr - u7it * di
                    bi = u7rt * di + u7it * dr
                    return br, bi, br + bi

                bl.append(scaled(0, c0p, c0q))
                bm.append(scaled(7, 0.0, 0.0))
                s6p = cb(b, pre, 6)
                s13p = cb(b, pre, 13)
                pre1.append((jnp.cos(s6p), zz67 * jnp.sin(s6p),
                             jnp.cos(s13p), jnp.sin(s13p), ui, imag_sign))

            # pass 1: pre straddles + bits 0..13 kicks, per TOP block
            def p1_block(i, _):
                z14b = (1 - 2 * ((hbt + i * bt) & 1)).astype(jnp.float32)
                for b in B:
                    c6p, s6pz, c13p, s13p, _ui, _im = pre1[b]
                    mr = st_ref[b, 0, pl.ds(i * bt, bt), :]
                    mi = st_ref[b, 1, pl.ds(i * bt, bt), :]
                    mr, mi = _cmul(mr, mi, c6p, s6pz)
                    mr, mi = _cmul(mr, mi, c13p, (z13c * z14b) * s13p)
                    mr = mr.reshape(bt * 128, 128)
                    mi = mi.reshape(bt * 128, 128)
                    mr, mi = kara_right(mr, mi, *bl[b])
                    mr = jnp.swapaxes(mr.reshape(bt, 128, 128), 1, 2).reshape(
                        bt * 128, 128)
                    mi = jnp.swapaxes(mi.reshape(bt, 128, 128), 1, 2).reshape(
                        bt * 128, 128)
                    mr, mi = kara_right(mr, mi, *bm[b])
                    st_ref[b, 0, pl.ds(i * bt, bt), :] = jnp.swapaxes(
                        mr.reshape(bt, 128, 128), 1, 2).reshape(bt, _C)
                    st_ref[b, 1, pl.ds(i * bt, bt), :] = jnp.swapaxes(
                        mi.reshape(bt, 128, 128), 1, 2).reshape(bt, _C)
                return _

            jax.lax.fori_loop(0, n_bt, p1_block, None)

            # pass 2: top kick + post bond-13/6 straddles, per column chunk
            post2 = []
            for b in B:
                _c6, _s6, _c13, _s13, ui, imag_sign = pre1[b]
                utr = utr_ref[ui]
                uti = uti_ref[ui] * imag_sign
                a_hi = angle_hi(b, pre, zhi)   # (1, TOP) input columns
                b_hi = angle_hi(b, post, zho)  # (TOP, 1) output rows
                s13q = cb(b, post, 13)
                s6q = cb(b, post, 6)
                post2.append((utr, uti, a_hi, b_hi, s13q, jnp.cos(s6q),
                              zz67c * jnp.sin(s6q)))

            if P == 1:
                for half, sgn in ((0, 1.0), (1, -1.0)):
                    bts_b = []
                    for b in B:
                        utr, uti, a_hi, b_hi, s13q, _c6q, _s6qz = post2[b]
                        th = b_hi + sgn * s13q * zho[0] + a_hi
                        dr = jnp.cos(th)
                        di = jnp.sin(th)
                        btr = utr * dr - uti * di
                        bti = utr * di + uti * dr
                        bts_b.append((btr, bti, btr + bti))
                    base = half * (_C // 2)

                    def p2_chunk(j, _, bts_b=bts_b, base=base):
                        off = base + j * cs
                        for b in B:
                            btr, bti, bts = bts_b[b]
                            _u, _v, _a, _bh, _s, c6q, s6qz = post2[b]
                            hr = st_ref[b, 0, :, pl.ds(off, cs)]
                            hi_ = st_ref[b, 1, :, pl.ds(off, cs)]
                            q1 = _dot_f32(btr, hr)
                            q2 = _dot_f32(bti, hi_)
                            q3 = _dot_f32(bts, hr + hi_)
                            kr = q1 - q2
                            ki = q3 - q1 - q2
                            kr, ki = _cmul(kr, ki, c6q, s6qz)
                            st_ref[b, 0, :, pl.ds(off, cs)] = kr
                            st_ref[b, 1, :, pl.ds(off, cs)] = ki
                        return _

                    jax.lax.fori_loop(0, n_cs, p2_chunk, None)
            else:
                # packed pass 2 (see p2_pack_factor / the forward kernel):
                # utr/uti refs hold kron(I_P, U_top); per-block ROW angles
                # carry the half's +-s13 sign, the per-block COLUMN angles
                # tile the pre-step's a_hi (same for every block — the
                # off-diagonal blocks are zero in the kron so their angle
                # values are inert)
                HB = P // 2
                bts_b = []
                for b in B:
                    utr, uti, a_hi, b_hi, s13q, _c6q, _s6qz = post2[b]
                    rp = b_hi + s13q * zho[0]
                    rm = b_hi - s13q * zho[0]
                    rows = jnp.concatenate([rp] * HB + [rm] * HB, axis=0)
                    cols = jnp.concatenate([a_hi] * P, axis=1)
                    th = rows + cols
                    dr = jnp.cos(th)
                    di = jnp.sin(th)
                    btr = utr * dr - uti * di
                    bti = utr * di + uti * dr
                    bts_b.append((btr, bti, btr + bti))

                def p2_packed(j, _):
                    offs = [j * (HB * cs) + pi * cs for pi in range(HB)]
                    offs = offs + [(_C // 2) + o for o in offs]
                    for b in B:
                        btr, bti, bts = bts_b[b]
                        _u, _v, _a, _bh, _s, c6q, s6qz = post2[b]
                        hr = jnp.concatenate(
                            [st_ref[b, 0, :, pl.ds(o, cs)] for o in offs],
                            axis=0)
                        hi_ = jnp.concatenate(
                            [st_ref[b, 1, :, pl.ds(o, cs)] for o in offs],
                            axis=0)
                        q1 = _dot_f32(btr, hr)
                        q2 = _dot_f32(bti, hi_)
                        q3 = _dot_f32(bts, hr + hi_)
                        kr = q1 - q2
                        ki = q3 - q1 - q2
                        kr, ki = _cmul(kr, ki, c6q, s6qz)
                        for pi, o in enumerate(offs):
                            st_ref[b, 0, :, pl.ds(o, cs)] = kr[
                                pi * TOP:(pi + 1) * TOP, :]
                            st_ref[b, 1, :, pl.ds(o, cs)] = ki[
                                pi * TOP:(pi + 1) * TOP, :]
                    return _

                jax.lax.fori_loop(0, n_cs // HB, p2_packed, None)
            return _

        # same-t pairing makes every pair in the grid step share the trip
        # count; read it from pair 0
        n_active = par_ref[0, 0, 0, 124].astype(jnp.int32)
        jax.lax.fori_loop(0, n_active, step, None)

        # terminal measurement, per TOP block
        def measure_block(i, accs):
            zq = (1 - 2 * ((lci >> q) & 1)).astype(jnp.float32)
            out = []
            for b in B:
                mr = st_ref[b, 0, pl.ds(i * bt, bt), :]
                mi = st_ref[b, 1, pl.ds(i * bt, bt), :]
                out.append(accs[b] + jnp.sum((mr * mr + mi * mi) * zq))
            return tuple(out)

        vals = jax.lax.fori_loop(0, n_bt, measure_block,
                                 (jnp.zeros((), jnp.float32),) * nb)
        arow = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
        alane = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
        apos = arow * 128 + alane
        for b in B:
            a_out_ref[0, b] = jnp.where(apos == 0, vals[b], 0.0)

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("L", "T", "p", "q", "initial_state", "ancilla_factor",
                     "time_dependent", "interpret"),
)
def blocked_echo_batch(hs, phis, angles, keys, ts, *, L, T, p, q,
                       initial_state="vacuum", ancilla_factor=1.0,
                       time_dependent=False, interpret=False,
                       ext_tiles=None, ext_sig=None):
    """(inst, L), (inst, L-1), (T,1,2), (inst, c, 2), (n_ts,) -> (inst, c, n_ts).

    Blocked-plane VMEM-resident echo A0(t) for 17 <= L <= 23: per
    (trajectory, t) pair the kernel runs 2t active masked steps (t
    forward, t inverse), matching core.sigma_evolve.sigma_echo_batch
    event-for-event with identical presampled uniforms. Echo semantics per
    the reference (autocorr-delta-a-single-qiskit-fast.py:140-147).

    ext_tiles (inst, c, n_ts, 4T, 128) / ext_sig (inst, c, n_ts):
    externally packed (pre, post) step tiles + final measurement sigmas
    overriding the flat echo_pair_tiles builder — the device-noise echo
    packs per-class sigma checkpoints here
    (core.device_evolve.device_echo_pair_tiles); the kernel runs unchanged.
    """
    if not (17 <= L <= 23):
        raise ValueError("blocked resident kernel supports 17 <= L <= 23")
    if q >= 14:
        raise ValueError("blocked resident kernel requires q < 14")
    if T > 512:
        raise ValueError("blocked echo kernel supports T <= 512")
    if time_dependent and (L != 22 or T > 64):
        # per-cycle (T,128,128)+(T,256,256) kick-matrix blocks cost
        # ~0.66 MB/cycle of VMEM next to the 32 MB state; past T~64 route
        # per-cycle x schedules to the blocked GENERAL kernel instead
        # (in-kernel-built matrices, no VMEM matrix block)
        raise ValueError("per-cycle schedules supported at L=22, T <= 64 "
                         "only (use the blocked general kernel past that)")
    from dtc_tpu.ops.pallas_resident import echo_pair_tiles

    TOP = 1 << (L - 14)
    b0 = 0 if initial_state == "vacuum" else neel_index(L)
    s0 = 1.0 if ((b0 >> q) & 1) == 0 else -1.0
    bt, cs = blocked_block_sizes(TOP)
    T2 = 2 * T
    Tu = T if time_dependent else 1
    u7r, u7i, utr, uti = _kick_matrices(angles, L, TOP, time_dependent)
    P = p2_pack_factor(TOP, cs)
    if P > 1:
        eyeP = jnp.eye(P, dtype=jnp.float32)
        utr = jax.vmap(lambda m: jnp.kron(eyeP, m))(utr)
        uti = jax.vmap(lambda m: jnp.kron(eyeP, m))(uti)
    PT = P * TOP
    n_ts = ts.shape[0]

    # nb same-t pairs per grid step (see _make_blocked_echo_kernel); the
    # t-major regrouping below guarantees equal trip counts per step
    nb = int(_os.environ.get("DTC_TPU_BLOCKED_NB", "1"))
    if nb < 1:
        raise ValueError(f"DTC_TPU_BLOCKED_NB={nb}: must be >= 1")
    if (time_dependent or nb * (2 * TOP * _C * 4) > 110 * 1024 * 1024):
        nb = 1

    def per_instance(h, ph, ks, ext_t, ext_s):
        if ext_t is not None:
            tiles, sig_fin = ext_t, ext_s
        else:
            tiles, sig_fin = jax.vmap(
                lambda k: jax.vmap(
                    lambda t: echo_pair_tiles(k, t, h, ph, L=L, T=T, p=p))(ts)
            )(ks)
        c = ks.shape[0]
        nb_ = nb if c % nb == 0 else 1
        n_pairs = c * n_ts
        # t-major grouping: grid step g holds pairs (t = g // (c//nb_),
        # traj nb_*(g % (c//nb_)) + b) — same t across the step's pairs
        tiles = jnp.swapaxes(tiles.reshape(c, n_ts, 2 * T2, 128), 0, 1)
        tiles = tiles.reshape(n_pairs // nb_, nb_, 2 * T2, 128)
        tile_mem = (pltpu.SMEM if nb_ * 2 * T2 * 512 * 2 <= 1024 * 1024
                    else pltpu.VMEM)
        a_raw = pl.pallas_call(
            _make_blocked_echo_kernel(L, T2, q, b0, time_dependent, bt, cs,
                                      nb_, P),
            out_shape=jax.ShapeDtypeStruct(
                (n_pairs // nb_, nb_, 8, 128), jnp.float32),
            grid=(n_pairs // nb_,),
            in_specs=[
                pl.BlockSpec((Tu, 128, 128), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((Tu, 128, 128), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((Tu, PT, PT), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((Tu, PT, PT), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, nb_, 2 * T2, 128), lambda i: (i, 0, 0, 0),
                             memory_space=tile_mem),  # step tiles
            ],
            out_specs=pl.BlockSpec((1, nb_, 8, 128), lambda i: (i, 0, 0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((nb_, 2, TOP, _C), jnp.float32),
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=110 * 1024 * 1024),
            interpret=interpret,
        )(u7r, u7i, utr, uti, tiles)
        val = a_raw.reshape(n_pairs, 1024)[:, 0].reshape(n_ts, c).T

        sq = (1 - 2 * ((sig_fin >> q) & jnp.uint32(1)).astype(jnp.int32)
              ).astype(jnp.float32)
        return ancilla_factor * s0 * sq * val

    return jax.vmap(per_instance)(hs, phis, keys, ext_tiles, ext_sig)


@functools.partial(
    jax.jit,
    static_argnames=("L", "T", "p", "q", "initial_state", "ancilla_factor",
                     "time_dependent", "interpret"),
)
def blocked_forward_batch(hs, phis, angles, keys, *, L, T, p, q,
                          initial_state="vacuum", ancilla_factor=1.0,
                          time_dependent=False, interpret=False,
                          ext_rows=None, ext_sig=None):
    """(inst, L), (inst, L-1), (T,1,2), (inst, c, 2) -> (inst, c, T).

    Blocked-plane VMEM-resident x-pol forward autocorrelator for
    17 <= L <= 23 (q < 14). Grid iterates trajectories; one grid step =
    one full trajectory. Per-cycle x schedules (time_dependent) are
    limited to L=22: the (T, TOP, TOP) top-kick matrix block at L=23
    would not fit VMEM next to the 64 MB state.

    ext_rows (inst, c, T, 128) / ext_sig (inst, c, T): externally packed
    compact cycle rows + per-cycle measurement sigmas, overriding the flat
    depolarizing presampler — the device-noise path packs its
    per-coefficient-class sigma checkpoints here
    (ops.pallas_noise.pack_device_cycle_params_compact) and the kernel
    runs unchanged.
    """
    if not (17 <= L <= 23):
        raise ValueError("blocked resident kernel supports 17 <= L <= 23")
    if q >= 14:
        raise ValueError("blocked resident kernel requires q < 14")
    if T > 1024:
        raise ValueError("blocked resident kernel supports T <= 1024")
    if time_dependent and (L != 22 or T > 64):
        # per-cycle (T,128,128)+(T,256,256) kick-matrix blocks cost
        # ~0.66 MB/cycle of VMEM next to the 32 MB state; past T~64 route
        # per-cycle x schedules to the blocked GENERAL kernel instead
        # (in-kernel-built matrices, no VMEM matrix block)
        raise ValueError("per-cycle schedules supported at L=22, T <= 64 "
                         "only (use the blocked general kernel past that)")
    TOP = 1 << (L - 14)
    b0 = 0 if initial_state == "vacuum" else neel_index(L)
    s0 = 1.0 if ((b0 >> q) & 1) == 0 else -1.0
    bt, cs = blocked_block_sizes(TOP)

    Tu = T if time_dependent else 1
    u7r, u7i, utr, uti = _kick_matrices(angles, L, TOP, time_dependent)
    P = p2_pack_factor(TOP, cs)
    if P > 1:
        eyeP = jnp.eye(P, dtype=jnp.float32)
        utr = jax.vmap(lambda m: jnp.kron(eyeP, m))(utr)
        uti = jax.vmap(lambda m: jnp.kron(eyeP, m))(uti)
    PT = P * TOP

    # nb interleaved trajectories per grid step (see _make_blocked_kernel):
    # +throughput on long-lived sweep shapes where the one-time Mosaic
    # compile amortizes (server-side executable cache). Auto-disabled when
    # the trajectory count doesn't divide, for per-cycle schedules, and
    # where nb states would exceed the ~110 MB scoped-VMEM budget (L=23).
    nb = int(_os.environ.get("DTC_TPU_BLOCKED_NB", "1"))
    if nb < 1:
        raise ValueError(f"DTC_TPU_BLOCKED_NB={nb}: must be >= 1")
    if (time_dependent or nb * (2 * TOP * _C * 4) > 110 * 1024 * 1024
            or nb * T > 1024):
        nb = 1

    def per_instance(h, ph, ks, ext_r, ext_s):
        n_traj = ks.shape[0]
        nb_ = nb if n_traj % nb == 0 else 1
        if ext_r is not None:
            params, sig_after = ext_r, ext_s
        elif p > 0.0:
            def sample(key):
                _, zm, _, csum = presample_noise(key, p, T, L)
                return jax.vmap(
                    lambda z, sg: pack_cycle_params_compact(z, sg, h, ph, L)
                )(zm, csum), csum

            params, sig_after = jax.vmap(sample)(ks)  # (c,T,128), (c,T)
        else:
            row = pack_cycle_params_compact(
                jnp.uint32(0), jnp.uint32(0), h, ph, L)
            params = jnp.broadcast_to(row, (n_traj, T, 128))
            sig_after = jnp.zeros((n_traj, T), jnp.uint32)
        params = params.reshape(n_traj // nb_, nb_, T, 128)

        a_raw = pl.pallas_call(
            _make_blocked_kernel(L, T, q, b0, time_dependent, bt, cs, nb_,
                                 P),
            out_shape=jax.ShapeDtypeStruct(
                (n_traj // nb_, nb_, 8, 128), jnp.float32),
            grid=(n_traj // nb_,),
            in_specs=[
                pl.BlockSpec((Tu, 128, 128), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM),  # u7r
                pl.BlockSpec((Tu, 128, 128), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM),  # u7i
                pl.BlockSpec((Tu, PT, PT), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM),  # utr
                pl.BlockSpec((Tu, PT, PT), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM),  # uti
                pl.BlockSpec((1, nb_, T, 128), lambda i: (i, 0, 0, 0),
                             memory_space=pltpu.SMEM),  # params
            ],
            out_specs=pl.BlockSpec((1, nb_, 8, 128), lambda i: (i, 0, 0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((nb_, 2, TOP, _C), jnp.float32),  # resident state
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=110 * 1024 * 1024),
            interpret=interpret,
        )(u7r, u7i, utr, uti, params)
        a_raw = a_raw.reshape(n_traj, 1024)[:, :T]

        sig_start = jnp.concatenate(
            [jnp.zeros((n_traj, 1), jnp.uint32), sig_after[:, :-1]], axis=1)
        sq = (1 - 2 * ((sig_start >> q) & jnp.uint32(1)).astype(jnp.int32)
              ).astype(jnp.float32)
        return ancilla_factor * s0 * sq * a_raw

    return jax.vmap(per_instance)(hs, phis, keys, ext_rows, ext_sig)
