"""Per-cycle HBM-streamed GENERAL (lab-frame) Floquet kernel on the
r2-blocked layout — the per-shard engine for amplitude-sharded runs of
EVERY polarization family (y/xy/yx/circular/xy_cycle + per-cycle-g
schedules) whose shard does not fit VMEM (22 <= L_loc <= 30, split per-plane state at 30; the
VMEM-resident general per-shard kernel, ops/pallas_cycle.
general_cycle_forward_apply, bounds at L_loc = 23).

Design = the r2-blocked DMA scaffolding of ops/pallas_cycle_hi (state in
HBM as (n_traj, 2, R2, 128, _C), two bounded DMA sweeps per kick slot)
crossed with the lab-frame math of ops/pallas_resident_general: the kick
group matrices are BUILT INSIDE THE KERNEL per slot from 8 SMEM scalars
(the slot 2x2 unitary) with each sampled Pauli's X-mask folded in as a
row XOR (B = X_m U, _tile_helpers.build_group), and the noise-Z signs +
static RZZ/RZ diagonal fold into the dots as angle scalings. Because the
top kick must split (a (TOP, TOP) group matrix does not exist past
L_loc ~ 24), the slot kick factorizes as

  pass A — full r2 blocks (2, 128, _C): bits 0..6 and 7..13 column
    groups, the bits 14..20 "m" group (left dot), straddle bonds 6, 13;
  pass B — strided (2, R2, MS, CS) sub-slabs: the bits 21.. "r2" group
    with the bond-20 straddle, plus the fused A(t) partial sum on the
    final slot (forward only).

Forward = post-fold (slot angles on the dot OUTPUT axes); inverse = the
daggered cycle taking (pre, post) row pairs exactly like
ops/pallas_cycle.general_cycle_inverse_apply (pre angles on the
CONTRACTED axes, pre straddles s6/s13/s20 at the top of pass A before
any kick touching their bits — no conjugation trick: Y-containing slot
kicks are not symmetric). Tile-row layout is pallas_resident_general's
compact row at L = L_loc widened to ``width`` lanes (256 when
4*L_loc + 9 > 128, i.e. L_loc = 30).

This closes the last kernel-family hole of the multi-chip story
(VERDICT r3 missing #5): y/xy/circular and per-cycle-g drives at
L_loc >= 24 — the reference's time-dependent circular polarizations,
autocorr-delta-a-single-qiskit-fast-circular-polarization.py:110-142 —
previously deopted to the XLA sharded engine past VMEM shards.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dtc_tpu.ops.pallas_resident import _C, _HALF_PI, _cmul, _dot_f32
from dtc_tpu.ops.pallas_resident_general import _LANE_U8, _tile_helpers
from dtc_tpu.ops.pallas_streamed import _kara_right


def _angle_c(tiles_ref, L, ti, zt):
    """Diagonal angle over the r2 band (bits 21..L-1): cz terms for every
    bit, cb terms for the band-internal bonds 21..L-2 (bond 20 is the
    pass-A/pass-B straddle, handled separately)."""
    czc, cbc, _, _, _ = _tile_helpers(tiles_ref, L)
    th = jnp.zeros_like(zt[0])
    for k in range(L - 21):
        th = th + czc(ti, 21 + k) * zt[k]
        if k > 0:
            th = th + cbc(ti, 20 + k) * (zt[k - 1] * zt[k])
    return th


def _make_general_hi_cycle_kernel(L: int, K: int, q: int, MS: int, CS: int,
                                  width: int, NSA: int, NSB: int,
                                  split: bool = False):  # noqa: C901
    """One grid step = one trajectory's shard, ONE lab-frame cycle = K
    statically-unrolled slot steps, each slot two DMA sweeps (post-fold);
    the final slot's pass B carries the fused A(t) partial sum. ``split``
    takes the per-plane (re, im) HBM pair (L_loc = 30 — see
    ops/pallas_cycle_hi.hi_dma_helpers)."""
    R2 = 1 << (L - 21)
    NMC = 128 // MS
    NCC = _C // CS
    NB = NMC * NCC
    DA = NSA - 1
    DB = NSB - 1
    FO = 4 * L - 1

    def kernel(tiles_ref, *rest):
        if split:
            (sre_in, sim_in, a_out_ref, st_re, st_im, aslab, bslab, acc,
             sems) = rest
            del sre_in, sim_in
            st_refs = (st_re, st_im)
        else:
            (st_in_ref, a_out_ref, st_hbm, aslab, bslab, acc, sems) = rest
            del st_in_ref
            st_refs = (st_hbm,)
        g = pl.program_id(0)

        l7o = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
        z7o = [(1 - 2 * ((l7o >> k) & 1)).astype(jnp.float32)
               for k in range(7)]
        l7c = jax.lax.broadcasted_iota(jnp.int32, (128, 1), 0)
        z7c = [(1 - 2 * ((l7c >> k) & 1)).astype(jnp.float32)
               for k in range(7)]
        lci = jax.lax.broadcasted_iota(jnp.int32, (1, _C), 1)
        zz67 = (1 - 2 * (((lci >> 6) ^ (lci >> 7)) & 1)).astype(jnp.float32)
        z13c = (1 - 2 * ((lci >> 13) & 1)).astype(jnp.float32)
        mrow = jax.lax.broadcasted_iota(jnp.int32, (128, 1), 0)
        z14r = (1 - 2 * (mrow & 1)).astype(jnp.float32)
        r2i = jax.lax.broadcasted_iota(jnp.int32, (R2, 1), 0)
        z21 = (1 - 2 * (r2i & 1)).astype(jnp.float32)
        zr2 = [(1 - 2 * ((r2i >> k) & 1)).astype(jnp.float32)
               for k in range(L - 21)]
        csl = jax.lax.broadcasted_iota(jnp.int32, (1, 1, CS), 2)

        loadA, storeA, loadB, storeB = hi_dma_helpers(
            split, st_refs, aslab, bslab, g, MS, CS, NSA, NSB, sems)

        czc, cbc, angle7, _, build_group = _tile_helpers(tiles_ref, L)

        for si in range(K):
            u8 = [tiles_ref[0, si, FO + _LANE_U8 + j] for j in range(8)]

            def scaled_group(nbits, off, th, si=si, u8=u8):
                gr, gi = build_group(si, u8, nbits, off,
                                     transposed=(off < 14))
                return _cmul(gr, gi, jnp.cos(th), jnp.sin(th))

            c0q = _HALF_PI * sum(tiles_ref[0, si, qq] for qq in range(L))
            b1r, b1i = scaled_group(7, 0, angle7(si, 0, c0q, z7o))
            b2r, b2i = scaled_group(7, 7, angle7(si, 7, 0.0, z7o))
            # bits 14..20 "m" group: row-diagonal fold on the left-dot
            # OUTPUT rows (post convention)
            b14r, b14i = scaled_group(7, 14, angle7(si, 14, 0.0, z7c))
            th_c = _angle_c(tiles_ref, L, si, zr2)
            s20 = cbc(si, 20)
            s13 = cbc(si, 13)
            s6 = cbc(si, 6)

            # ---- pass A: full r2 blocks (col kicks + m kick) ----
            def a_body(i, _, b1r=b1r, b1i=b1i, b2r=b2r, b2i=b2i, b14r=b14r,
                       b14i=b14i, s13=s13, s6=s6):
                s = i % NSA
                pf = i + DA

                @pl.when(pf < R2)
                def _():
                    @pl.when(i >= 1)
                    def _():
                        storeA((i - 1) % NSA, i - 1).wait()

                    loadA(pf % NSA, pf).start()

                loadA(s, i).wait()
                mr = aslab[s, 0].reshape(128 * 128, 128)
                mi = aslab[s, 1].reshape(128 * 128, 128)
                mr, mi = _kara_right(mr, mi, b1r, b1i)
                mr = jnp.swapaxes(mr.reshape(128, 128, 128), 1, 2).reshape(
                    128 * 128, 128)
                mi = jnp.swapaxes(mi.reshape(128, 128, 128), 1, 2).reshape(
                    128 * 128, 128)
                mr, mi = _kara_right(mr, mi, b2r, b2i)
                mr = jnp.swapaxes(mr.reshape(128, 128, 128), 1, 2).reshape(
                    128, _C)
                mi = jnp.swapaxes(mi.reshape(128, 128, 128), 1, 2).reshape(
                    128, _C)
                mr, mi = _cmul(mr, mi, jnp.cos(s6), zz67 * jnp.sin(s6))
                p1 = _dot_f32(b14r, mr)
                p2 = _dot_f32(b14i, mi)
                p3 = _dot_f32(b14r + b14i, mr + mi)
                mr, mi = p1 - p2, p3 - p1 - p2
                mr, mi = _cmul(mr, mi, jnp.cos(s13),
                               (z13c * z14r) * jnp.sin(s13))
                aslab[s, 0] = mr
                aslab[s, 1] = mi
                storeA(s, i).start()
                return _

            for d in range(min(DA, R2)):
                loadA(d % NSA, d).start()
            jax.lax.fori_loop(0, R2, a_body, None)
            for i in range(max(0, R2 - DA - 1), R2):
                storeA(i % NSA, i).wait()

            # ---- pass B: (m-chunk, c-chunk) r2-group sub-slabs ----
            measuring = si == K - 1
            if measuring:
                acc[0] = 0.0
            gr0, gi0 = build_group(si, u8, L - 21, 21, transposed=False)

            def b_body(j, _, gr0=gr0, gi0=gi0, th_c=th_c, s20=s20,
                       measuring=measuring):
                s = j % NSB
                jm = j // NCC
                jc = j % NCC
                pf = j + DB

                @pl.when(pf < NB)
                def _():
                    @pl.when(j >= 1)
                    def _():
                        storeB((j - 1) % NSB, (j - 1) // NCC, (j - 1) % NCC
                               ).wait()

                    loadB(pf % NSB, pf // NCC, pf % NCC).start()

                loadB(s, jm, jc).wait()
                # z20 is constant per chunk (MS <= 64, aligned)
                z20 = (1 - 2 * ((jm * MS) >> 6)).astype(jnp.float32)
                th = th_c + z20 * s20 * z21
                dr = jnp.cos(th)
                di = jnp.sin(th)
                gr = gr0 * dr - gi0 * di
                gi = gr0 * di + gi0 * dr
                xr = bslab[s, 0].reshape(R2, MS * CS)
                xi = bslab[s, 1].reshape(R2, MS * CS)
                q1 = _dot_f32(gr, xr)
                q2 = _dot_f32(gi, xi)
                q3 = _dot_f32(gr + gi, xr + xi)
                mr, mi = q1 - q2, q3 - q1 - q2
                mr3 = mr.reshape(R2, MS, CS)
                mi3 = mi.reshape(R2, MS, CS)
                if measuring:
                    # z_q: column sign for q < 14, else a sign over the
                    # composite (r2, m) row index r2*128 + (jm*MS + m)
                    if q < 14:
                        zq = (1 - 2 * (((jc * CS + csl) >> q) & 1)).astype(
                            jnp.float32)
                    else:
                        r2v = jax.lax.broadcasted_iota(
                            jnp.int32, (R2, 1, 1), 0)
                        mv = jm * MS + jax.lax.broadcasted_iota(
                            jnp.int32, (1, MS, 1), 1)
                        zq = (1 - 2 * (((r2v * 128 + mv) >> (q - 14)) & 1)
                              ).astype(jnp.float32)
                    acc[0] = acc[0] + jnp.sum((mr3 * mr3 + mi3 * mi3) * zq)
                bslab[s, 0] = mr3
                bslab[s, 1] = mi3
                storeB(s, jm, jc).start()
                return _

            for d in range(min(DB, NB)):
                loadB(d % NSB, d // NCC, d % NCC).start()
            jax.lax.fori_loop(0, NB, b_body, None)
            for j in range(max(0, NB - DB - 1), NB):
                storeB(j % NSB, j // NCC, j % NCC).wait()

        arow = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
        alane = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
        apos = arow * 128 + alane
        a_out_ref[0] = jnp.where(apos == 0, acc[0], 0.0)

    return kernel


def _make_general_hi_inverse_cycle_kernel(L: int, K: int, MS: int, CS: int,
                                          width: int, NSA: int, NSB: int,
                                          split: bool = False
                                          ):  # noqa: C901
    """Daggered lab-frame cycle on the r2-blocked layout: K slot steps,
    each taking a (pre, post) compact-row pair (the caller builds them
    exactly like ops/pallas_cycle.general_cycle_inverse_apply's — daggered
    slot unitaries in reversed slot order, D0^dagger lead on the first
    slot's pre row, the slot's X-mask on the pre row, its noise-Z signs on
    the post row). Pre angles fold on the dots' CONTRACTED axes; pre
    straddles s6/s13/s20 apply at the TOP of pass A before any kick
    touching their bits; post angles/straddles mirror the forward
    placements. No measurement path: the sharded echo measures |amp|^2
    z_q in XLA after the full masked scan."""
    R2 = 1 << (L - 21)
    NMC = 128 // MS
    NCC = _C // CS
    NB = NMC * NCC
    DA = NSA - 1
    DB = NSB - 1
    FO = 4 * L - 1

    def kernel(tiles_ref, *rest):
        if split:
            sre_in, sim_in, st_re, st_im, aslab, bslab, sems = rest
            del sre_in, sim_in
            st_refs = (st_re, st_im)
        else:
            st_in_ref, st_hbm, aslab, bslab, sems = rest
            del st_in_ref
            st_refs = (st_hbm,)
        g = pl.program_id(0)

        l7o = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
        z7o = [(1 - 2 * ((l7o >> k) & 1)).astype(jnp.float32)
               for k in range(7)]
        l7c = jax.lax.broadcasted_iota(jnp.int32, (128, 1), 0)
        z7c = [(1 - 2 * ((l7c >> k) & 1)).astype(jnp.float32)
               for k in range(7)]
        lci = jax.lax.broadcasted_iota(jnp.int32, (1, _C), 1)
        zz67 = (1 - 2 * (((lci >> 6) ^ (lci >> 7)) & 1)).astype(jnp.float32)
        z13c = (1 - 2 * ((lci >> 13) & 1)).astype(jnp.float32)
        mrow = jax.lax.broadcasted_iota(jnp.int32, (128, 1), 0)
        z14r = (1 - 2 * (mrow & 1)).astype(jnp.float32)
        z20r = (1 - 2 * ((mrow >> 6) & 1)).astype(jnp.float32)
        r2i = jax.lax.broadcasted_iota(jnp.int32, (R2, 1), 0)
        z21 = (1 - 2 * (r2i & 1)).astype(jnp.float32)
        zr2 = [(1 - 2 * ((r2i >> k) & 1)).astype(jnp.float32)
               for k in range(L - 21)]
        r2c = jax.lax.broadcasted_iota(jnp.int32, (1, R2), 1)
        zr2c = [(1 - 2 * ((r2c >> k) & 1)).astype(jnp.float32)
                for k in range(L - 21)]

        loadA, storeA, loadB, storeB = hi_dma_helpers(
            split, st_refs, aslab, bslab, g, MS, CS, NSA, NSB, sems)

        czc, cbc, angle7, _, build_group = _tile_helpers(tiles_ref, L)

        for si in range(K):
            kt = 2 * si
            post = 2 * si + 1
            u8 = [tiles_ref[0, kt, FO + _LANE_U8 + j] for j in range(8)]

            def scaled_group(nbits, off, th, kt=kt, u8=u8):
                gr, gi = build_group(kt, u8, nbits, off,
                                     transposed=(off < 14))
                return _cmul(gr, gi, jnp.cos(th), jnp.sin(th))

            c0q = _HALF_PI * sum(tiles_ref[0, post, qq] for qq in range(L))
            c0p = _HALF_PI * sum(tiles_ref[0, kt, qq] for qq in range(L))
            # pre angles on contracted axes (z7c for the transposed column
            # groups, z7o for the left-dot m group), post on output axes
            th_lo = (angle7(post, 0, c0q, z7o) + angle7(kt, 0, c0p, z7c))
            th_mi = (angle7(post, 7, 0.0, z7o) + angle7(kt, 7, 0.0, z7c))
            th_m = (angle7(post, 14, 0.0, z7c) + angle7(kt, 14, 0.0, z7o))
            b1r, b1i = scaled_group(7, 0, th_lo)
            b2r, b2i = scaled_group(7, 7, th_mi)
            b14r, b14i = scaled_group(7, 14, th_m)
            th_cc = (_angle_c(tiles_ref, L, post, zr2)
                     + _angle_c(tiles_ref, L, kt, zr2c))
            s20p = cbc(kt, 20)
            s13p = cbc(kt, 13)
            s6p = cbc(kt, 6)
            s20q = cbc(post, 20)
            s13q = cbc(post, 13)
            s6q = cbc(post, 6)

            # ---- pass A: pre straddles FIRST, then col + m kicks,
            # then post straddles s6q/s13q ----
            def a_body(i, _, b1r=b1r, b1i=b1i, b2r=b2r, b2i=b2i, b14r=b14r,
                       b14i=b14i, s6p=s6p, s13p=s13p, s20p=s20p, s6q=s6q,
                       s13q=s13q):
                s = i % NSA
                pf = i + DA

                @pl.when(pf < R2)
                def _():
                    @pl.when(i >= 1)
                    def _():
                        storeA((i - 1) % NSA, i - 1).wait()

                    loadA(pf % NSA, pf).start()

                loadA(s, i).wait()
                mr = aslab[s, 0]
                mi = aslab[s, 1]
                z21v = (1 - 2 * (i & 1)).astype(jnp.float32)
                mr, mi = _cmul(mr, mi, jnp.cos(s13p),
                               (z13c * z14r) * jnp.sin(s13p))
                mr, mi = _cmul(mr, mi, jnp.cos(s20p),
                               (z20r * z21v) * jnp.sin(s20p))
                mr, mi = _cmul(mr, mi, jnp.cos(s6p), zz67 * jnp.sin(s6p))
                mr = mr.reshape(128 * 128, 128)
                mi = mi.reshape(128 * 128, 128)
                mr, mi = _kara_right(mr, mi, b1r, b1i)
                mr = jnp.swapaxes(mr.reshape(128, 128, 128), 1, 2).reshape(
                    128 * 128, 128)
                mi = jnp.swapaxes(mi.reshape(128, 128, 128), 1, 2).reshape(
                    128 * 128, 128)
                mr, mi = _kara_right(mr, mi, b2r, b2i)
                mr = jnp.swapaxes(mr.reshape(128, 128, 128), 1, 2).reshape(
                    128, _C)
                mi = jnp.swapaxes(mi.reshape(128, 128, 128), 1, 2).reshape(
                    128, _C)
                mr, mi = _cmul(mr, mi, jnp.cos(s6q), zz67 * jnp.sin(s6q))
                p1 = _dot_f32(b14r, mr)
                p2 = _dot_f32(b14i, mi)
                p3 = _dot_f32(b14r + b14i, mr + mi)
                mr, mi = p1 - p2, p3 - p1 - p2
                mr, mi = _cmul(mr, mi, jnp.cos(s13q),
                               (z13c * z14r) * jnp.sin(s13q))
                aslab[s, 0] = mr
                aslab[s, 1] = mi
                storeA(s, i).start()
                return _

            for d in range(min(DA, R2)):
                loadA(d % NSA, d).start()
            jax.lax.fori_loop(0, R2, a_body, None)
            for i in range(max(0, R2 - DA - 1), R2):
                storeA(i % NSA, i).wait()

            # ---- pass B: r2 kick (pre cols + post rows folds) ----
            gr0, gi0 = build_group(kt, u8, L - 21, 21, transposed=False)

            def b_body(j, _, gr0=gr0, gi0=gi0, th_cc=th_cc, s20q=s20q):
                s = j % NSB
                jm = j // NCC
                jc = j % NCC
                pf = j + DB

                @pl.when(pf < NB)
                def _():
                    @pl.when(j >= 1)
                    def _():
                        storeB((j - 1) % NSB, (j - 1) // NCC, (j - 1) % NCC
                               ).wait()

                    loadB(pf % NSB, pf // NCC, pf % NCC).start()

                loadB(s, jm, jc).wait()
                z20 = (1 - 2 * ((jm * MS) >> 6)).astype(jnp.float32)
                th = th_cc + z20 * s20q * z21
                dr = jnp.cos(th)
                di = jnp.sin(th)
                gr = gr0 * dr - gi0 * di
                gi = gr0 * di + gi0 * dr
                xr = bslab[s, 0].reshape(R2, MS * CS)
                xi = bslab[s, 1].reshape(R2, MS * CS)
                q1 = _dot_f32(gr, xr)
                q2 = _dot_f32(gi, xi)
                q3 = _dot_f32(gr + gi, xr + xi)
                bslab[s, 0] = (q1 - q2).reshape(R2, MS, CS)
                bslab[s, 1] = (q3 - q1 - q2).reshape(R2, MS, CS)
                storeB(s, jm, jc).start()
                return _

            for d in range(min(DB, NB)):
                loadB(d % NSB, d // NCC, d % NCC).start()
            jax.lax.fori_loop(0, NB, b_body, None)
            for j in range(max(0, NB - DB - 1), NB):
                storeB(j % NSB, j // NCC, j % NCC).wait()

    return kernel


def general_hi_width(L: int) -> int:
    """Compact general row width at L_loc = L (4L+9 lanes must fit).

    The 256 branch engages at L_loc = 30 (4*30+9 = 129), reachable since
    round 5 through the SPLIT per-plane state layout."""
    return 128 if 4 * L + 9 <= 128 else 256


# the 2^32 DMA-offset wrap chunking rule, DMA helper factory and shape
# resolver are shared with the x-kernel module so the safety bound lives
# in ONE place
from dtc_tpu.ops.pallas_cycle_hi import (  # noqa: E402
    _traj_chunk,
    hi_dma_helpers,
    hi_state_specs,
)
from dtc_tpu.ops.pallas_cycle_hi import _hi_shapes as _hi_shapes_shared


def _hi_shapes(L, state, slots=None):
    # default_slots=2 (not the x-kernel's 4): the lab-frame body's
    # in-kernel group-matrix builds keep ~55M of temporaries live, and a
    # 4-slot pass-B ring measured 568K past the 122M cap at L_loc=24
    return _hi_shapes_shared(L, state, slots=slots,
                             width=general_hi_width(L), default_slots=2)


def general_hi_cycle_forward_apply(state, tiles, *, L, K, q, slots=None,
                                   interpret=False):
    """Apply ONE lab-frame Floquet cycle (K kick slots with their noise
    events and the folded local diagonal) to a batch of shard-local states
    on the r2-blocked layout (22 <= L_loc <= 30, split pair at 30).

    state: (n_traj, 2, TOP, 16384) or (n_traj, 2, R2, 128, 16384) f32
    planar (flat input is reshaped — free); tiles: (n_traj, K, width)
    compact general step rows at L = L_loc (pallas_resident_general
    layout: n | x-mask | h | phi | flags+u8, h/phi rows zeroed on
    non-final slots; width = general_hi_width(L)).

    Returns (state', a_partial (n_traj,)): the evolved states (input
    layout — fused array or split (re, im) pair, the L_loc = 30 form) and
    the shard-local sum(z_q |psi|^2) measured after the final slot (psum
    over 'amp' is the caller's job; no sigma sign — local bits are
    lab-frame)."""
    split = isinstance(state, (tuple, list))
    if not (22 <= L <= (30 if split else 29)):
        raise ValueError(
            "general hi cycle kernel supports 22 <= L_loc <= 29 fused / "
            "30 split (a fused L_loc = 30 state crosses the 2^32 "
            "DMA-offset window — pass the (re, im) per-plane pair)")
    if not (0 <= q < L):
        raise ValueError(
            "general hi cycle kernel requires shard-local probe q < L")
    R2, n_traj, MS, CS, width, NSA, NSB = _hi_shapes(L, state, slots)
    if split:
        state = tuple(s.reshape(n_traj, R2, 128, _C) for s in state)
    else:
        state = state.reshape(n_traj, 2, R2, 128, _C)
    tiles = tiles.reshape(n_traj, K, width)
    nc = _traj_chunk(L, split)
    if n_traj > nc:
        index = ((lambda st, i: tuple(s[i:i + nc] for s in st)) if split
                 else (lambda st, i: st[i:i + nc]))
        outs = [general_hi_cycle_forward_apply(
            index(state, i), tiles[i:i + nc], L=L, K=K, q=q,
            slots=slots, interpret=interpret)
            for i in range(0, n_traj, nc)]
        if split:
            return (tuple(jnp.concatenate([o[0][k] for o in outs])
                          for k in range(2)),
                    jnp.concatenate([o[1] for o in outs]))
        return (jnp.concatenate([o[0] for o in outs]),
                jnp.concatenate([o[1] for o in outs]))

    st_in, st_out, aliases, n_sems = hi_state_specs(split, 1, 1, NSA, NSB)
    out = pl.pallas_call(
        _make_general_hi_cycle_kernel(L, K, q, MS, CS, width, NSA, NSB,
                                      split),
        out_shape=(
            [jax.ShapeDtypeStruct((n_traj, 8, 128), jnp.float32)]
            + [jax.ShapeDtypeStruct(s.shape, jnp.float32)
               for s in (state if split else (state,))]),
        grid=(n_traj,),
        in_specs=[
            pl.BlockSpec((1, K, width), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),  # cycle tiles
        ] + st_in,
        out_specs=[
            pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ] + st_out,
        input_output_aliases=aliases,
        scratch_shapes=[
            pltpu.VMEM((NSA, 2, 128, _C), jnp.float32),     # pass-A slabs
            pltpu.VMEM((NSB, 2, R2, MS, CS), jnp.float32),  # pass-B slabs
            pltpu.SMEM((1,), jnp.float32),                  # A(t) partial
            pltpu.SemaphoreType.DMA((n_sems,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=122 * 1024 * 1024),
        interpret=interpret,
    )(tiles, *(state if split else (state,)))
    a_raw = out[0]
    state = tuple(out[1:]) if split else out[1]
    return state, a_raw[:, 0, 0]


def general_hi_cycle_inverse_apply(state, tiles, *, L, K, interpret=False,
                                   slots=None):
    """Apply ONE lab-frame DAGGERED Floquet cycle to a batch of shard-local
    states on the r2-blocked layout (22 <= L_loc <= 30, split pair at 30).

    tiles: (n_traj, K, 2, width) per-slot (pre, post) compact general echo
    rows (layout of pallas_resident_general.general_echo_batch.tiles_one's
    inverse steps, width = general_hi_width(L)). Returns state' in the
    input layout (fused array, or the split (re, im) pair at
    L_loc = 30)."""
    split = isinstance(state, (tuple, list))
    if not (22 <= L <= (30 if split else 29)):
        raise ValueError(
            "general hi cycle kernel supports 22 <= L_loc <= 29 fused / "
            "30 split (see general_hi_cycle_forward_apply)")
    R2, n_traj, MS, CS, width, NSA, NSB = _hi_shapes(L, state, slots)
    if split:
        state = tuple(s.reshape(n_traj, R2, 128, _C) for s in state)
    else:
        state = state.reshape(n_traj, 2, R2, 128, _C)
    tiles = tiles.reshape(n_traj, 2 * K, width)
    nc = _traj_chunk(L, split)
    if n_traj > nc:
        index = ((lambda st, i: tuple(s[i:i + nc] for s in st)) if split
                 else (lambda st, i: st[i:i + nc]))
        outs = [general_hi_cycle_inverse_apply(
            index(state, i), tiles[i:i + nc], L=L, K=K,
            interpret=interpret, slots=slots)
            for i in range(0, n_traj, nc)]
        if split:
            return tuple(jnp.concatenate([o[k] for o in outs])
                         for k in range(2))
        return jnp.concatenate(outs)

    st_in, st_out, aliases, n_sems = hi_state_specs(split, 1, 0, NSA, NSB)
    out = pl.pallas_call(
        _make_general_hi_inverse_cycle_kernel(L, K, MS, CS, width, NSA,
                                              NSB, split),
        out_shape=[jax.ShapeDtypeStruct(s.shape, jnp.float32)
                   for s in (state if split else (state,))],
        grid=(n_traj,),
        in_specs=[
            pl.BlockSpec((1, 2 * K, width), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),  # (pre, post) rows
        ] + st_in,
        out_specs=st_out,
        input_output_aliases=aliases,
        scratch_shapes=[
            pltpu.VMEM((NSA, 2, 128, _C), jnp.float32),     # pass-A slabs
            pltpu.VMEM((NSB, 2, R2, MS, CS), jnp.float32),  # pass-B slabs
            pltpu.SemaphoreType.DMA((n_sems,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=122 * 1024 * 1024),
        interpret=interpret,
    )(tiles, *(state if split else (state,)))
    return tuple(out) if split else out[0]
