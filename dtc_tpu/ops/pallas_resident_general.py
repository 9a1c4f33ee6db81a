"""VMEM-resident whole-trajectory kernel, GENERAL polarizations (lab frame).

The x-only resident kernel (ops/pallas_resident.py) relies on the sigma
frame: deferring every sampled Pauli-X into a carried XOR frame works
because pure-X kicks are invariant under X conjugation, so one precomputed
kick matrix serves all trajectories. Kicks with a Y component break that
(X RY(t) X = RY(-t)): the sigma-conjugated kick differs per site per cycle
per trajectory, so y/xy/yx/circular/xy-cycle drives used to fall back to
the XLA sigma engine (~2.0k cycles/s at L=20 vs 9.3k resident).

This kernel drops the sigma frame entirely and works in the LAB frame:

- each sampled Pauli string's X part (mask m) is folded into the kick it
  follows as a row XOR, B = X_m U, i.e. B[a, b] = U[a XOR m, b];
- the kick group matrices are BUILT INSIDE THE KERNEL per step as a
  product of 7 bit-selected 2x2 factors,
      B[a, b] = prod_j u[(a_j XOR m_j), b_j],
  from 8 SMEM scalars (the slot's 2x2 unitary, packed by the host) and the
  per-step X-mask bits — ~20 VPU ops per factor on a (128,128) tile,
  negligible next to the full-plane Karatsuba dots;
- the Z part and the static RZZ+RZ diagonal fuse into the same factorized
  low/high phase as the x-only kernel (with zero sigma/flip rows: the
  state is never frame-shifted, so there is no sigma correction and no
  per-cycle measurement sign).

One step = [prediag (echo only)] -> kick(B) -> fused postdiag -> optional
measure; a cycle is K such steps (K = kick slots per cycle: 1 for x/y/
xy_cycle, 2 for xy/yx/circular — each slot is one transpiled u3 gate = one
depolarizing event per qubit, matching Aer's noise accounting, see
SURVEY.md C9/C10). Per-cycle schedules are free: the slot unitary rides in
the step tile, so time-dependent drives (circular polarization
autocorr-delta-a-single-qiskit-fast-circular-polarization.py:110-142,
adaptive-g g-optimization.py:200-245) need no extra kick-matrix inputs.

Trajectory parity: noise is presampled from the SAME uniforms as
core.sigma_evolve (forward: uniform(key, (T*K, L)); echo: uniform(key,
(2T, K, L)) with steps >= 2t zeroed), so values match the sigma engine
trajectory-for-trajectory up to float reassociation.
"""

from __future__ import annotations

import functools
import os as _os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dtc_tpu.core.sigma_evolve import _codes_from_uniform, _masks_from_codes
from dtc_tpu.core.statevector import neel_index
from dtc_tpu.ops.pallas_resident import _dot_f32  # bf16x3 / HIGHEST dots

_C = 16384  # 2**14 column axis (bits 0..13)
_HALF_PI = float(np.pi / 2)

# Compact (128,) tile-row layout (lab frame: sigma/flip rows are
# identically zero, so the old (8, 128) tile compacts to ONE row of
# 4L+9 <= 128 lanes; this shrank the forward kernel's double-buffered
# SMEM window 8x — the (8,128) layout overflowed the 1 MB SMEM cap
# beyond S ~ 128 steps):
#   [0, L)      noise-Z bits n_q
#   [L, 2L)     noise-X mask bits
#   [2L, 3L)    h_q row (tile-masked by the host)
#   [3L, 4L-1)  phi_j row
#   [4L-1, ...) flag lanes (see _LANE_*)
_LANE_MPOS = 0    # forward: A(t) output slot (< 0: no measurement)
_LANE_ACTIVE = 1  # echo: step active (0 = identity padding)
_LANE_U8 = 2      # lanes 2..9: slot 2x2 unitary [re, im] x [00, 01, 10, 11]
_LANE_COUNT = 10  # echo: per-pair active-step count (tile 0 only)


def _cmul(ar, ai, br, bi):
    return ar * br - ai * bi, ar * bi + ai * br


def slot_u8(theta_x, theta_y, inverse=False):
    """(..., 8) f32 planar entries of RY(ty) @ RX(tx) (or its dagger) in the
    row-5 packing order [00r, 00i, 01r, 01i, 10r, 10i, 11r, 11i]; closed
    form mirrors models.drives.slot_unitary."""
    cx, sx = jnp.cos(theta_x / 2), jnp.sin(theta_x / 2)
    cy, sy = jnp.cos(theta_y / 2), jnp.sin(theta_y / 2)
    m00 = (cy * cx, sy * sx)
    m01 = (-sy * cx, -cy * sx)
    m10 = (sy * cx, -cy * sx)
    m11 = (cy * cx, -sy * sx)
    if inverse:  # dagger: conj + transpose
        m00, m01, m10, m11 = ((m00[0], -m00[1]), (m10[0], -m10[1]),
                              (m01[0], -m01[1]), (m11[0], -m11[1]))
    return jnp.stack([m00[0], m00[1], m01[0], m01[1],
                      m10[0], m10[1], m11[0], m11[1]], axis=-1).astype(
                          jnp.float32)


def _tile_helpers(tiles_ref, L):
    """Per-step scalar/angle/group-matrix builders over a compact-row tile
    ref — shared by the full-plane and blocked general kernels."""

    def czc(ti, qq):
        """cz_q = -h_q/2 - (pi/2) n_q (the sigma term of the
        pallas_resident formula drops: the lab frame never frame-shifts,
        so sigma = flip = 0 -> plain D0 x Pauli-Z sign)."""
        return (-0.5 * tiles_ref[0, ti, 2 * L + qq]
                - _HALF_PI * tiles_ref[0, ti, qq])

    def cbc(ti, jj):
        return -0.5 * tiles_ref[0, ti, 3 * L + jj]

    def angle7(ti, base, bias, zt):
        th = bias + jnp.zeros_like(zt[0])
        for k in range(7):
            th = th + czc(ti, base + k) * zt[k]
            if k > 0:
                th = th + cbc(ti, base + k - 1) * (zt[k - 1] * zt[k])
        return th

    def angle_hi(ti, zt):
        th = jnp.zeros_like(zt[0])
        for k in range(L - 14):
            th = th + czc(ti, 14 + k) * zt[k]
            if k > 0:
                th = th + cbc(ti, 13 + k) * (zt[k - 1] * zt[k])
        return th

    def build_group(ti, u8, nbits, off, transposed, pad_blocks=1):
        """Planar (2^nbits, 2^nbits) group matrix with the step's X-mask
        folded in: element value prod_j u[(a_j XOR x_j), b_j], laid out
        [b, a] when transposed (right-multiply form) else [a, b].

        pad_blocks > 1: build at size pad_blocks * 2^nbits as a BLOCK-
        DIAGONAL kron(I_pad, G) — the bit products only read bits
        0..nbits-1 of the iotas, so the larger iotas tile G for free and
        one diagonal mask zeroes the off-diagonal blocks (the pass-2 MXU
        packing of ops/pallas_resident_blocked.p2_pack_factor)."""
        n = pad_blocks << nbits
        a_ax = 1 if transposed else 0
        ia = jax.lax.broadcasted_iota(jnp.int32, (n, n), a_ax)
        ib = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1 - a_ax)
        br = bi = None
        for j in range(nbits):
            x = tiles_ref[0, ti, L + off + j]
            abit = ((ia >> j) & 1).astype(jnp.float32)
            bbit = ((ib >> j) & 1).astype(jnp.float32)
            ae = abit + x - 2.0 * abit * x  # abit XOR x (x is 0/1)
            an = 1.0 - ae
            bn = 1.0 - bbit
            fr = an * (bn * u8[0] + bbit * u8[2]) + ae * (
                bn * u8[4] + bbit * u8[6])
            fi = an * (bn * u8[1] + bbit * u8[3]) + ae * (
                bn * u8[5] + bbit * u8[7])
            if br is None:
                br, bi = fr, fi
            else:
                br, bi = _cmul(br, bi, fr, fi)
        if pad_blocks > 1:
            bd = (((ia ^ ib) >> nbits) == 0).astype(jnp.float32)
            br = br * bd
            bi = bi * bd
        return br, bi

    return czc, cbc, angle7, angle_hi, build_group


def _make_general_kernel(L: int, S: int, q: int, b0: int, has_top: bool,
                         echo: bool):  # noqa: C901
    """S steps; tiles_ref holds (2 if echo else 1) tiles per step."""
    TOP = 1 << (L - 14)
    TPS = 2 if echo else 1  # tiles per step (echo: [pre, post])

    def kernel(tiles_ref, a_out_ref, st_ref):
        arow = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
        alane = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
        apos = arow * 128 + alane
        col = jax.lax.broadcasted_iota(jnp.uint32, (TOP, _C), 1)
        topi = jax.lax.broadcasted_iota(jnp.uint32, (TOP, _C), 0)
        gidx = (topi << 14) | col
        st_ref[0] = jnp.where(gidx == jnp.uint32(b0), 1.0, 0.0)
        st_ref[1] = jnp.zeros((TOP, _C), jnp.float32)
        lci = jax.lax.broadcasted_iota(jnp.int32, (1, _C), 1)
        zq = (1 - 2 * ((lci >> q) & 1)).astype(jnp.float32)
        # z tables for the group-angle fold (see pallas_resident): 7-bit
        # output rows / input columns, bond-6 straddle mask, top tables
        l7r = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
        z7o = [(1 - 2 * ((l7r >> k) & 1)).astype(jnp.float32)
               for k in range(7)]
        l7c = jax.lax.broadcasted_iota(jnp.int32, (128, 1), 0)
        z7i = [(1 - 2 * ((l7c >> k) & 1)).astype(jnp.float32)
               for k in range(7)]
        zz67 = (1 - 2 * (((lci >> 6) ^ (lci >> 7)) & 1)).astype(jnp.float32)
        if has_top:
            hti = jax.lax.broadcasted_iota(jnp.int32, (TOP, 1), 0)
            zho = [(1 - 2 * ((hti >> k) & 1)).astype(jnp.float32)
                   for k in range(L - 14)]
            htc = jax.lax.broadcasted_iota(jnp.int32, (1, TOP), 1)
            zhi = [(1 - 2 * ((htc >> k) & 1)).astype(jnp.float32)
                   for k in range(L - 14)]
            z13c = (1 - 2 * ((lci >> 13) & 1)).astype(jnp.float32)

        FO = 4 * L - 1  # flag-lane base
        czc, cbc, angle7, angle_hi, build_group = _tile_helpers(tiles_ref, L)

        def step(si, _):
            kt = TPS * si          # kick/flags tile (echo: pre tile)
            post = TPS * si + (TPS - 1)
            u8 = [tiles_ref[0, kt, FO + _LANE_U8 + j] for j in range(8)]

            mr, mi = st_ref[0], st_ref[1]
            if echo:
                # pre straddle phases (the rest of the prediag folds into
                # the dots as contraction-input row/column scalings)
                s6p = cbc(kt, 6)
                mr, mi = _cmul(mr, mi, jnp.cos(s6p), zz67 * jnp.sin(s6p))
                if has_top:
                    s13p = cbc(kt, 13)
                    mr, mi = _cmul(mr, mi, jnp.cos(s13p),
                                   (z13c * zho[0]) * jnp.sin(s13p))

            # kick: bits 0..6 and 7..13 as full-plane Karatsuba dots against
            # in-kernel-built (transposed) group matrices with the pre/post
            # group angles folded as row/column scalings, then the top group
            def scaled_group(nbits, off, th):
                gr, gi = build_group(kt, u8, nbits, off,
                                     transposed=(off < 14))
                dr = jnp.cos(th)
                di = jnp.sin(th)
                gr, gi = _cmul(gr, gi, dr, di)
                return gr, gi

            c0q = _HALF_PI * sum(tiles_ref[0, post, qq] for qq in range(L))
            th_lo = angle7(post, 0, c0q, z7o)
            th_mi = angle7(post, 7, 0.0, z7o)
            if echo:
                c0p = _HALF_PI * sum(tiles_ref[0, kt, qq]
                                     for qq in range(L))
                th_lo = th_lo + angle7(kt, 0, c0p, z7i)
                th_mi = th_mi + angle7(kt, 7, 0.0, z7i)

            def big_right(xr, xi, gr, gi):
                p1 = _dot_f32(xr, gr)
                p2 = _dot_f32(xi, gi)
                p3 = _dot_f32(xr + xi, gr + gi)
                return p1 - p2, p3 - p1 - p2

            btr, bti = scaled_group(7, 0, th_lo)
            kr = mr.reshape(TOP * 128, 128)
            ki = mi.reshape(TOP * 128, 128)
            kr, ki = big_right(kr, ki, btr, bti)
            kr = jnp.swapaxes(kr.reshape(TOP, 128, 128), 1, 2).reshape(
                TOP * 128, 128)
            ki = jnp.swapaxes(ki.reshape(TOP, 128, 128), 1, 2).reshape(
                TOP * 128, 128)
            bmr, bmi = scaled_group(7, 7, th_mi)
            kr, ki = big_right(kr, ki, bmr, bmi)
            kr = jnp.swapaxes(kr.reshape(TOP, 128, 128), 1, 2).reshape(TOP, _C)
            ki = jnp.swapaxes(ki.reshape(TOP, 128, 128), 1, 2).reshape(TOP, _C)
            if has_top:
                # top kick + high angles + bond-13 straddle as two
                # column-half dots (z13 of the final state selects the half)
                utr, uti = build_group(kt, u8, L - 14, 14, transposed=False)
                b_hi = angle_hi(post, zho)
                s13q = cbc(post, 13)
                th_hi = b_hi + (angle_hi(kt, zhi) if echo else 0.0)
                halves = []
                for sgn, sl in ((1.0, slice(0, _C // 2)),
                                (-1.0, slice(_C // 2, _C))):
                    th = th_hi + sgn * s13q * zho[0]
                    dr = jnp.cos(th)
                    di = jnp.sin(th)
                    htr, hti_ = _cmul(utr, uti, dr, di)
                    hr, hi_ = kr[:, sl], ki[:, sl]
                    q1 = _dot_f32(htr, hr)
                    q2 = _dot_f32(hti_, hi_)
                    q3 = _dot_f32(htr + hti_, hr + hi_)
                    halves.append((q1 - q2, q3 - q1 - q2))
                kr = jnp.concatenate([halves[0][0], halves[1][0]], axis=1)
                ki = jnp.concatenate([halves[0][1], halves[1][1]], axis=1)

            if echo:  # inactive steps keep the pre-kick state
                active = tiles_ref[0, kt, FO + _LANE_ACTIVE]
                kr = jnp.where(active > 0.5, kr, mr)
                ki = jnp.where(active > 0.5, ki, mi)

            # post bond-6 straddle (bits 6/7 final after the second dot)
            s6q = cbc(post, 6)
            kr, ki = _cmul(kr, ki, jnp.cos(s6q), zz67 * jnp.sin(s6q))
            st_ref[0] = kr
            st_ref[1] = ki

            if not echo:
                mpos = tiles_ref[0, kt, FO + _LANE_MPOS]

                @pl.when(mpos >= 0.0)
                def _():
                    a_next = jnp.sum((kr * kr + ki * ki) * zq)
                    a_out_ref[0] = a_out_ref[0] + jnp.where(
                        apos == mpos.astype(jnp.int32), a_next, 0.0)

            return _

        if echo:
            a_out_ref[0] = jnp.zeros((8, 128), jnp.float32)
            # active steps are exactly the FIRST 2*t*K, so the per-pair
            # trip count skips the identity padding (halves an echo
            # sweep's real work)
            n_active = tiles_ref[0, 0, FO + _LANE_COUNT].astype(jnp.int32)
            jax.lax.fori_loop(0, n_active, step, None)
        else:
            a_out_ref[0] = jnp.where(
                apos == 0, float(1 - 2 * ((b0 >> q) & 1)), 0.0)
            jax.lax.fori_loop(0, S, step, None)

        if echo:
            val = jnp.sum((st_ref[0] * st_ref[0] + st_ref[1] * st_ref[1]) * zq)
            a_out_ref[0] = jnp.where(apos == 0, val, 0.0)

    return kernel


def _blocked_min_L() -> int:
    """Smallest L routed to the blocked-plane kernel body. Like the
    x-frame kernels (ops/pallas_resident_blocked.py), the blocked body —
    built to get past the full-plane register spill at L >= 22 — also
    schedules BETTER at the full-plane body's own sizes: measured
    fwd/echo vs full-plane (benchmarks/general_blocked_probe.py medians,
    y-drive, T=50) 1.24x/1.29x at L=21, 1.17x/1.24x at L=20, ~1.0x/1.15x
    at L=18, parity <= 1.8e-6. Default 18 matches the x-kernel crossover
    (full-plane still wins at L=17). DTC_TPU_GENERAL_BLOCKED_MIN_L
    overrides for probing either body at any L."""
    return int(_os.environ.get("DTC_TPU_GENERAL_BLOCKED_MIN_L", "18"))


def _make_general_kernel_blocked(L: int, S: int, q: int, b0: int,
                                 echo: bool, bt: int, cs: int,
                                 P: int = 1):  # noqa: C901
    """Blocked-plane variant for L = 22..23: same math and tile layout as
    _make_general_kernel, plane ops restructured into fori_loops over
    TOP-row blocks (pass 1) and column chunks (pass 2) so Mosaic's
    register allocator stays bounded (the full-plane body spills at L=22;
    see ops/pallas_resident_blocked.py). The echo's inactive-step select
    is dropped: the per-pair trip count already bounds the loop to active
    steps.

    P > 1: pass-2 block-diagonal MXU packing (see
    ops/pallas_resident_blocked.p2_pack_factor) — here the kron(I_P, G)
    expansion is built IN-kernel by build_group(pad_blocks=P), since the
    top group matrix is per-step."""
    TOP = 1 << (L - 14)
    n_bt = TOP // bt
    n_cs = (_C // 2) // cs
    TPS = 2 if echo else 1
    PT = P * TOP

    def kernel(tiles_ref, a_out_ref, st_ref):
        arow = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
        alane = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
        apos = arow * 128 + alane
        colb = jax.lax.broadcasted_iota(jnp.uint32, (bt, _C), 1)
        topb = jax.lax.broadcasted_iota(jnp.uint32, (bt, _C), 0)

        def init_block(i, _):
            gidx = ((topb + jnp.uint32(i * bt)) << 14) | colb
            st_ref[0, pl.ds(i * bt, bt), :] = jnp.where(
                gidx == jnp.uint32(b0), 1.0, 0.0)
            st_ref[1, pl.ds(i * bt, bt), :] = jnp.zeros((bt, _C), jnp.float32)
            return _

        jax.lax.fori_loop(0, n_bt, init_block, None)

        lci = jax.lax.broadcasted_iota(jnp.int32, (1, _C), 1)
        l7r = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
        z7o = [(1 - 2 * ((l7r >> k) & 1)).astype(jnp.float32)
               for k in range(7)]
        l7c = jax.lax.broadcasted_iota(jnp.int32, (128, 1), 0)
        z7i = [(1 - 2 * ((l7c >> k) & 1)).astype(jnp.float32)
               for k in range(7)]
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

        FO = 4 * L - 1
        czc, cbc, angle7, angle_hi, build_group = _tile_helpers(tiles_ref, L)

        def step(si, _):
            kt = TPS * si
            post = TPS * si + (TPS - 1)
            u8 = [tiles_ref[0, kt, FO + _LANE_U8 + j] for j in range(8)]

            def scaled_group(nbits, off, th):
                gr, gi = build_group(kt, u8, nbits, off,
                                     transposed=(off < 14))
                dr = jnp.cos(th)
                di = jnp.sin(th)
                return _cmul(gr, gi, dr, di)

            c0q = _HALF_PI * sum(tiles_ref[0, post, qq] for qq in range(L))
            th_lo = angle7(post, 0, c0q, z7o)
            th_mi = angle7(post, 7, 0.0, z7o)
            if echo:
                c0p = _HALF_PI * sum(tiles_ref[0, kt, qq]
                                     for qq in range(L))
                th_lo = th_lo + angle7(kt, 0, c0p, z7i)
                th_mi = th_mi + angle7(kt, 7, 0.0, z7i)
            blr, bli = scaled_group(7, 0, th_lo)
            bls = blr + bli
            bmr, bmi = scaled_group(7, 7, th_mi)
            bms = bmr + bmi
            if echo:
                s6p = cbc(kt, 6)
                c6p, s6pz = jnp.cos(s6p), zz67 * jnp.sin(s6p)
                s13p = cbc(kt, 13)

            def kara_right(xr, xi, br, bi, bs):
                p1 = _dot_f32(xr, br)
                p2 = _dot_f32(xi, bi)
                p3 = _dot_f32(xr + xi, bs)
                return p1 - p2, p3 - p1 - p2

            # pass 1: [echo pre straddles +] bits 0..13 kicks, per TOP block
            def p1_block(i, _):
                mr = st_ref[0, pl.ds(i * bt, bt), :]
                mi = st_ref[1, pl.ds(i * bt, bt), :]
                if echo:
                    mr, mi = _cmul(mr, mi, c6p, s6pz)
                    z14b = (1 - 2 * ((hbt + i * bt) & 1)).astype(jnp.float32)
                    mr, mi = _cmul(mr, mi, jnp.cos(s13p),
                                   (z13c * z14b) * jnp.sin(s13p))
                mr = mr.reshape(bt * 128, 128)
                mi = mi.reshape(bt * 128, 128)
                mr, mi = kara_right(mr, mi, blr, bli, bls)
                mr = jnp.swapaxes(mr.reshape(bt, 128, 128), 1, 2).reshape(
                    bt * 128, 128)
                mi = jnp.swapaxes(mi.reshape(bt, 128, 128), 1, 2).reshape(
                    bt * 128, 128)
                mr, mi = kara_right(mr, mi, bmr, bmi, bms)
                st_ref[0, pl.ds(i * bt, bt), :] = jnp.swapaxes(
                    mr.reshape(bt, 128, 128), 1, 2).reshape(bt, _C)
                st_ref[1, pl.ds(i * bt, bt), :] = jnp.swapaxes(
                    mi.reshape(bt, 128, 128), 1, 2).reshape(bt, _C)
                return _

            jax.lax.fori_loop(0, n_bt, p1_block, None)

            # pass 2: top kick + post straddles [+ forward measure]
            s13q = cbc(post, 13)
            s6q = cbc(post, 6)
            c6q = jnp.cos(s6q)
            s6qz = zz67c * jnp.sin(s6q)
            a_next = jnp.zeros((), jnp.float32)
            if not echo:  # only final-slot steps measure (K >= 2 families)
                measures = tiles_ref[0, kt, FO + _LANE_MPOS] >= 0.0
            if P == 1:
                utr, uti = build_group(kt, u8, L - 14, 14, transposed=False)
                b_hi = angle_hi(post, zho)
                th_hi = b_hi + (angle_hi(kt, zhi) if echo else 0.0)
                for half, sgn in ((0, 1.0), (1, -1.0)):
                    th = th_hi + sgn * s13q * zho[0]
                    dr = jnp.cos(th)
                    di = jnp.sin(th)
                    htr, hti_ = _cmul(utr, uti, dr, di)
                    hts = htr + hti_
                    base = half * (_C // 2)

                    def p2_chunk(j, acc, htr=htr, hti_=hti_, hts=hts,
                                 base=base):
                        off = base + j * cs
                        hr = st_ref[0, :, pl.ds(off, cs)]
                        hi2 = st_ref[1, :, pl.ds(off, cs)]
                        q1 = _dot_f32(htr, hr)
                        q2 = _dot_f32(hti_, hi2)
                        q3 = _dot_f32(hts, hr + hi2)
                        kr = q1 - q2
                        ki = q3 - q1 - q2
                        kr, ki = _cmul(kr, ki, c6q, s6qz)
                        st_ref[0, :, pl.ds(off, cs)] = kr
                        st_ref[1, :, pl.ds(off, cs)] = ki
                        if echo:
                            return acc

                        def msum():
                            zqc = (1 - 2 * (((lcs + off) >> q) & 1)).astype(
                                jnp.float32)
                            return acc + jnp.sum((kr * kr + ki * ki) * zqc)

                        # the reduce runs only on measuring slots (the
                        # final kick slot of a cycle); K >= 2 families
                        # skip it on the other slots
                        return jax.lax.cond(measures, msum, lambda: acc)

                    a_next = jax.lax.fori_loop(0, n_cs, p2_chunk, a_next)
            else:
                # packed: kron(I_P, G_top) built in-kernel; the tiled
                # angle rows come from PT-sized iotas for free (the angle
                # formulas only read bits 0..L-15), the bond-13 half sign
                # from the block-index bit
                HB = P // 2
                utr, uti = build_group(kt, u8, L - 14, 14,
                                       transposed=False, pad_blocks=P)
                hti_pt = jax.lax.broadcasted_iota(jnp.int32, (PT, 1), 0)
                zho_pt = [(1 - 2 * ((hti_pt >> k) & 1)).astype(jnp.float32)
                          for k in range(L - 14)]
                rows = angle_hi(post, zho_pt)
                if echo:
                    htc_pt = jax.lax.broadcasted_iota(jnp.int32, (1, PT), 1)
                    zhi_pt = [(1 - 2 * ((htc_pt >> k) & 1)).astype(
                        jnp.float32) for k in range(L - 14)]
                    rows = rows + angle_hi(kt, zhi_pt)
                sgn_pt = (1 - 2 * ((hti_pt >> (L - 14 + P.bit_length() - 2))
                                   & 1)).astype(jnp.float32)
                th = rows + sgn_pt * s13q * zho_pt[0]
                dr = jnp.cos(th)
                di = jnp.sin(th)
                htr, hti2 = _cmul(utr, uti, dr, di)
                hts = htr + hti2

                def p2_packed(j, acc):
                    offs = [j * (HB * cs) + pi * cs for pi in range(HB)]
                    offs = offs + [(_C // 2) + o for o in offs]
                    hr = jnp.concatenate(
                        [st_ref[0, :, pl.ds(o, cs)] for o in offs], axis=0)
                    hi2 = jnp.concatenate(
                        [st_ref[1, :, pl.ds(o, cs)] for o in offs], axis=0)
                    q1 = _dot_f32(htr, hr)
                    q2 = _dot_f32(hti2, hi2)
                    q3 = _dot_f32(hts, hr + hi2)
                    kr = q1 - q2
                    ki = q3 - q1 - q2
                    kr, ki = _cmul(kr, ki, c6q, s6qz)
                    for pi, o in enumerate(offs):
                        st_ref[0, :, pl.ds(o, cs)] = kr[
                            pi * TOP:(pi + 1) * TOP, :]
                        st_ref[1, :, pl.ds(o, cs)] = ki[
                            pi * TOP:(pi + 1) * TOP, :]
                    if echo:
                        return acc

                    def msum():
                        s = acc
                        for pi, o in enumerate(offs):
                            zqc = (1 - 2 * (((lcs + o) >> q) & 1)).astype(
                                jnp.float32)
                            krp = kr[pi * TOP:(pi + 1) * TOP, :]
                            kip = ki[pi * TOP:(pi + 1) * TOP, :]
                            s = s + jnp.sum((krp * krp + kip * kip) * zqc)
                        return s

                    return jax.lax.cond(measures, msum, lambda: acc)

                a_next = jax.lax.fori_loop(0, n_cs // HB, p2_packed, a_next)

            if not echo:
                mpos = tiles_ref[0, kt, FO + _LANE_MPOS]

                @pl.when(mpos >= 0.0)
                def _():
                    a_out_ref[0] = a_out_ref[0] + jnp.where(
                        apos == mpos.astype(jnp.int32), a_next, 0.0)

            return _

        if echo:
            a_out_ref[0] = jnp.zeros((8, 128), jnp.float32)
            n_active = tiles_ref[0, 0, FO + _LANE_COUNT].astype(jnp.int32)
            jax.lax.fori_loop(0, n_active, step, None)

            def measure_block(i, acc):
                mr = st_ref[0, pl.ds(i * bt, bt), :]
                mi = st_ref[1, pl.ds(i * bt, bt), :]
                zq = (1 - 2 * ((lci >> q) & 1)).astype(jnp.float32)
                return acc + jnp.sum((mr * mr + mi * mi) * zq)

            val = jax.lax.fori_loop(0, n_bt, measure_block,
                                    jnp.zeros((), jnp.float32))
            a_out_ref[0] = jnp.where(apos == 0, val, 0.0)
        else:
            a_out_ref[0] = jnp.where(
                apos == 0, float(1 - 2 * ((b0 >> q) & 1)), 0.0)
            jax.lax.fori_loop(0, S, step, None)

    return kernel


def _bits_row(mask, width):
    """uint32 scalar/vector -> (…, width) float 0/1 bit rows."""
    qs = jnp.arange(width, dtype=jnp.uint32)
    return ((mask[..., None] >> qs) & 1).astype(jnp.int32).astype(jnp.float32)


def _flag_lanes(L):
    return 128 - (4 * L - 1)


@functools.partial(
    jax.jit,
    static_argnames=("L", "T", "K", "p", "q", "initial_state",
                     "ancilla_factor", "interpret"),
)
def general_forward_batch(hs, phis, angles, keys, *, L, T, K, p, q,
                          initial_state="vacuum", ancilla_factor=1.0,
                          interpret=False, ext_zm=None, ext_xm=None,
                          ext_phi=None):
    """(inst, L), (inst, L-1), (T,K,2), (inst, c, 2) -> (inst, c, T).

    Lab-frame resident forward kernel for ANY kick schedule (all
    polarization families, per-cycle g). Requires 14 <= L <= 23, q < 14
    (18 <= L <= 23 run the blocked-plane variant; see
    _make_general_kernel_blocked and _blocked_min_L).

    ext_zm/ext_xm (inst, c, S) uint32 + ext_phi (inst, c, S, L-1):
    externally packed per-step noise masks and per-step phi rows (already
    zeroed off final slots), overriding the flat depolarizing sampler —
    the DEVICE-noise path commutes its mid-diagonal bond events into the
    post-kick Pauli slot, which shows up here as composed masks plus
    sign-adjusted even/odd bond angles (core.device_evolve.
    device_general_kernel_forward_batch); the kernel runs unchanged.
    """
    if not (14 <= L <= 23):
        raise ValueError("resident kernel supports 14 <= L <= 23")
    if q >= 14:
        raise ValueError("resident kernel requires q < 14")
    if T * K > 1024:
        raise ValueError("resident kernel supports T*K <= 1024")
    TOP = 1 << (L - 14)
    b0 = 0 if initial_state == "vacuum" else neel_index(L)
    s0 = 1.0 if ((b0 >> q) & 1) == 0 else -1.0
    S = T * K

    u8 = jax.vmap(jax.vmap(lambda a: slot_u8(a[0], a[1])))(angles)  # (T,K,8)
    u8 = u8.reshape(S, 8)
    # measurement slot: after the final kick slot of cycle t -> A(t+1)
    mpos = np.full((T, K), -1.0, np.float32)
    mpos[: T - 1, K - 1] = np.arange(1, T, dtype=np.float32)
    mpos = jnp.asarray(mpos.reshape(S))
    final = np.zeros((T, K), np.float32)
    final[:, K - 1] = 1.0
    final = jnp.asarray(final.reshape(S, 1))

    FL = _flag_lanes(L)
    flags = jnp.zeros((S, FL), jnp.float32)
    flags = flags.at[:, _LANE_MPOS].set(mpos)
    flags = flags.at[:, _LANE_U8:_LANE_U8 + 8].set(u8)

    def per_instance(h, ph, ks, ezm, exm, ephi):
        hrow = (final * h[None].astype(jnp.float32))      # (S, L)
        prow = (final * ph[None].astype(jnp.float32))     # (S, L-1)

        def tiles_one(key, ezm_t, exm_t, ephi_t):
            if ezm_t is not None:
                zm, xm, prow_t = ezm_t, exm_t, ephi_t
            elif p > 0.0:
                u = jax.random.uniform(key, (S, L), dtype=jnp.float32)
                codes = _codes_from_uniform(u, p)
                xm, zm = _masks_from_codes(codes, L)
                prow_t = prow
            else:
                xm = zm = jnp.zeros((S,), jnp.uint32)
                prow_t = prow
            zmb = _bits_row(zm, L)                      # (S, L)
            xmb = _bits_row(xm, L)
            # compact row: n | x-mask | h | phi | flags (see _LANE_*)
            return jnp.concatenate([zmb, xmb, hrow, prow_t, flags], axis=-1)

        params = jax.vmap(tiles_one)(ks, ezm, exm, ephi)  # (c, S, 128)
        n_traj = ks.shape[0]

        if L < _blocked_min_L():
            kern = _make_general_kernel(L, S, q, b0, TOP > 1, echo=False)
        else:
            from dtc_tpu.ops.pallas_resident_blocked import (
                blocked_block_sizes,
                p2_pack_factor,
            )

            bt, cs = blocked_block_sizes(TOP)
            kern = _make_general_kernel_blocked(L, S, q, b0, echo=False,
                                                bt=bt, cs=cs,
                                                P=p2_pack_factor(TOP, cs))
        a_raw = pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((n_traj, 8, 128), jnp.float32),
            grid=(n_traj,),
            in_specs=[
                pl.BlockSpec((1, S, 128), lambda i: (i, 0, 0),
                             memory_space=pltpu.SMEM),
            ],
            out_specs=pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((2, TOP, _C), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=110 * 1024 * 1024),
            interpret=interpret,
        )(params)
        a_raw = a_raw.reshape(n_traj, 1024)[:, :T]
        return ancilla_factor * s0 * a_raw

    return jax.vmap(per_instance)(hs, phis, keys, ext_zm, ext_xm, ext_phi)


@functools.partial(
    jax.jit,
    static_argnames=("L", "T", "K", "p", "q", "initial_state",
                     "ancilla_factor", "interpret"),
)
def general_echo_batch(hs, phis, angles, keys, ts, *, L, T, K, p, q,
                       initial_state="vacuum", ancilla_factor=1.0,
                       interpret=False, ext_xm=None, ext_zm=None,
                       ext_pre_h=None, ext_pre_phi=None, ext_post_h=None,
                       ext_post_phi=None):
    """(inst, L), (inst, L-1), (T,K,2), (inst, c, 2), (n_ts,) -> (inst, c, n_ts).

    Lab-frame resident echo A0(t) for ANY kick schedule: per (trajectory, t)
    pair, t forward cycles then t inverse cycles (slots reversed, daggered
    slot unitaries, D0^dagger leading each inverse cycle), events sampled
    from the same uniforms as core.sigma_evolve.sigma_echo_batch. Requires
    14 <= L <= 23, q < 14 (18 <= L <= 23 run the blocked-plane variant).

    ext hooks (the DEVICE-noise echo, core.device_evolve.
    device_general_kernel_echo_batch): ext_xm/ext_zm (inst, c, n_ts, 2T, K)
    uint32 per-slot post-kick Pauli masks; ext_pre_h/ext_pre_phi
    (inst, c, n_ts, 2T, L / L-1) REPLACE the first-slot prediag rows
    (host supplies -h/-phi with conjugation signs, zeroed off inverse
    steps); ext_post_h/ext_post_phi likewise replace the final-slot
    postdiag rows (zeroed off forward steps). All already masked for the
    pair's active window; the kernel runs unchanged.
    """
    if not (14 <= L <= 23):
        raise ValueError("resident kernel supports 14 <= L <= 23")
    if q >= 14:
        raise ValueError("resident kernel requires q < 14")
    if 2 * T * K > 1024:
        raise ValueError("resident echo kernel supports 2*T*K <= 1024")
    TOP = 1 << (L - 14)
    b0 = 0 if initial_state == "vacuum" else neel_index(L)
    s0 = 1.0 if ((b0 >> q) & 1) == 0 else -1.0
    S = 2 * T * K
    n_ts = ts.shape[0]

    u8f = jax.vmap(jax.vmap(lambda a: slot_u8(a[0], a[1])))(angles)
    u8i = jax.vmap(jax.vmap(lambda a: slot_u8(a[0], a[1], inverse=True)))(
        angles)  # (T, K, 8)

    FL = _flag_lanes(L)

    def per_instance(h, ph, ks, i_xm, i_zm, i_ph, i_pp, i_qh, i_qp):
        hf = h.astype(jnp.float32)
        pf = ph.astype(jnp.float32)

        def tiles_one(key, t_value, exm, ezm, eph, epp, eqh, eqp):
            kstep = jnp.arange(2 * T)
            fwd = kstep < t_value
            inv = (kstep >= t_value) & (kstep < 2 * t_value)
            if exm is not None:
                xm, zm = exm, ezm
            elif p > 0.0:
                u = jax.random.uniform(key, (2 * T, K, L), dtype=jnp.float32)
                codes = _codes_from_uniform(u, p)
                codes = jnp.where((fwd | inv)[:, None, None], codes, 0)
                xm, zm = _masks_from_codes(codes, L)  # (2T, K)
            else:
                xm = zm = jnp.zeros((2 * T, K), jnp.uint32)

            # cycle index: forward i = kstep, inverse i = 2t-1-kstep
            ci = jnp.where(fwd, kstep,
                           jnp.clip(2 * t_value - 1 - kstep, 0, T - 1))
            # slot within cycle for event j: forward slot j, inverse K-1-j
            u8f_c = jnp.take(u8f, ci, axis=0)       # (2T, K, 8)
            u8i_c = jnp.take(u8i, ci, axis=0)

            def one_step(j):
                """(2T, 2, 128) compact pre/post rows for event slot j."""
                slot_u = jnp.where(fwd[:, None], u8f_c[:, j],
                                   u8i_c[:, K - 1 - j])  # (2T, 8)
                zmb = _bits_row(zm[:, j], L)
                xmb = _bits_row(xm[:, j], L)
                zl = jnp.zeros((2 * T, L), jnp.float32)
                zp = jnp.zeros((2 * T, L - 1), jnp.float32)
                act = (fwd | inv).astype(jnp.float32)
                flags = jnp.zeros((2 * T, FL), jnp.float32)
                flags = flags.at[:, _LANE_ACTIVE].set(act)
                flags = flags.at[:, _LANE_U8:_LANE_U8 + 8].set(slot_u)
                # pre tile: D0^dagger on the FIRST inverse slot (j == 0)
                pre_d = inv.astype(jnp.float32)[:, None] if j == 0 else 0.0
                if eph is not None:
                    pre_h = eph if j == 0 else 0.0 * zl
                    pre_p = epp if j == 0 else 0.0 * zp
                else:
                    pre_h = -pre_d * hf[None] + 0.0 * zl
                    pre_p = -pre_d * pf[None] + 0.0 * zp
                pre = jnp.concatenate([zl, xmb, pre_h, pre_p, flags],
                                      axis=-1)
                # post tile: event z-sign; forward final slot adds D0
                post_d = (fwd.astype(jnp.float32)[:, None]
                          if j == K - 1 else 0.0)
                if eqh is not None:
                    post_h = eqh if j == K - 1 else 0.0 * zl
                    post_p = eqp if j == K - 1 else 0.0 * zp
                else:
                    post_h = post_d * hf[None] + 0.0 * zl
                    post_p = post_d * pf[None] + 0.0 * zp
                post = jnp.concatenate(
                    [zmb, zl, post_h, post_p,
                     jnp.zeros((2 * T, FL), jnp.float32)], axis=-1)
                return jnp.stack([pre, post], axis=1)  # (2T, 2, 128)

            tiles = jnp.stack([one_step(j) for j in range(K)],
                              axis=1)  # (2T, K, 2, 128)
            tiles = tiles.reshape(2 * S, 128)
            # per-pair dynamic trip count (active steps = first 2*t*K)
            return tiles.at[0, 4 * L - 1 + _LANE_COUNT].set(
                (2 * t_value * K).astype(jnp.float32))

        tiles = jax.vmap(
            lambda k, a, b, c2, d, e, f: jax.vmap(
                lambda t, a2, b2, c3, d2, e2, f2: tiles_one(
                    k, t, a2, b2, c3, d2, e2, f2))(ts, a, b, c2, d, e, f)
        )(ks, i_xm, i_zm, i_ph, i_pp, i_qh, i_qp)
        n_pairs = ks.shape[0] * n_ts
        tiles = tiles.reshape(n_pairs, 2 * S, 128)

        # compact rows fit the double-buffered 1 MB SMEM window up to
        # 2S = 1008 rows; SMEM scalar loads are the fast path
        tile_mem = (pltpu.SMEM if 2 * S * 512 * 2 <= 1024 * 1024
                    else pltpu.VMEM)
        if L < _blocked_min_L():
            kern = _make_general_kernel(L, S, q, b0, TOP > 1, echo=True)
        else:
            from dtc_tpu.ops.pallas_resident_blocked import (
                blocked_block_sizes,
                p2_pack_factor,
            )

            bt, cs = blocked_block_sizes(TOP)
            kern = _make_general_kernel_blocked(L, S, q, b0, echo=True,
                                                bt=bt, cs=cs,
                                                P=p2_pack_factor(TOP, cs))
        a_raw = pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((n_pairs, 8, 128), jnp.float32),
            grid=(n_pairs,),
            in_specs=[
                pl.BlockSpec((1, 2 * S, 128), lambda i: (i, 0, 0),
                             memory_space=tile_mem),
            ],
            out_specs=pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((2, TOP, _C), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=110 * 1024 * 1024),
            interpret=interpret,
        )(tiles)
        val = a_raw.reshape(n_pairs, 1024)[:, 0].reshape(ks.shape[0], n_ts)
        return ancilla_factor * s0 * val

    return jax.vmap(per_instance)(hs, phis, keys, ext_xm, ext_zm, ext_pre_h,
                                  ext_pre_phi, ext_post_h, ext_post_phi)
