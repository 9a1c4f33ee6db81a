"""HBM-streamed forward kernel with an r2-blocked state layout — the
single-chip L=29/30 path (x-polarized forward, 22 <= L <= 30).

The original streamed kernel (ops/pallas_streamed.py) bounds at L=28: its
pass-B slab is a COLUMN slice spanning all R = 2^(L-14) rows, so the slab
grows with L (32 MB at L=29 — reproducibly SIGKILLs the shared Mosaic
compile helper; 64 MB at L=30 — past double-buffered VMEM). This kernel
removes the growth by re-laying the HBM state as

    (2, R2, 128, _C)   R2 = 2^(L-21) blocks x (m = bits 14..20) x (c = bits 0..13)

and re-cutting the two DMA sweeps per cycle so every slab is bounded for
all L <= 30:

  pass A — one full r2 block (2, 128, _C) = 16 MB (the slab size class the
    L=28 kernel already compiles): kick bits 0..6 / 7..13 as Karatsuba
    right-dots with the column-diagonal folds and the bond-6 straddle
    (exactly the original pass A), THEN the bits-14..20 kick as a LEFT dot
    over the block's m axis with the th_B row-diagonal fold, then the bond
    13-14 straddle (both its bits are now slab-local).
  pass B — strided sub-slab (2, R2, MS, CS) = 8 MB over (m-chunk, c-chunk):
    only the bits-21..L-1 contraction remains, slab-local along r2, with
    th_C and the bond-20 straddle folded on output rows (MS <= 64 aligned,
    so z20 is constant per chunk) and the per-cycle A(t) partial sum.

Same sigma-frame noise formulation, compact parameter rows and bf16x3 dots
as the other kernel families; values match the sigma engine with identical
presampled trajectories. DMA traffic is unchanged (2 full state read+write
sweeps per cycle); at L=29 the state is 4 GB so the ~326 GB/s DMA roofline
gives ~49 ms/cycle — far above the deopted sigma engine's rate class.

Replaces Aer's single-GPU statevector ceiling (L~30 practical, SURVEY §6;
AerSimulator device="GPU" — autocorr-delta-a-single-qiskit-fast.py:156).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dtc_tpu.core.sigma_evolve import presample_noise
from dtc_tpu.core.statevector import neel_index
from dtc_tpu.ops.pallas_noise import pack_cycle_params_compact
from dtc_tpu.ops.pallas_resident import _cmul, _dot_f32
from dtc_tpu.ops.pallas_streamed import _kara_right, _rx_kron

_C = 16384       # bits 0..13 (column axis)
_HALF_PI = float(np.pi / 2)


class _PlanePair:
    """start()/wait() over the two per-plane DMAs of a split-state window.

    The hi state is stored as SEPARATE real/imag HBM arrays: a fused
    (2, R2, 128, 16384) array puts plane 1's base at byte offset
    R2 * 2^23 — exactly 2^32 at L=30 — and DMA window offsets past 2^32
    silently wrap (measured: every L=30 value came back zero while L=29,
    whose highest offset is just UNDER 2^32, was healthy). Per-plane
    arrays bound every window offset by the plane size (2^32 - 2^23 at
    L=30).
    """

    def __init__(self, re, im):
        self._re, self._im = re, im

    def start(self):
        self._re.start()
        self._im.start()

    def wait(self):
        self._re.wait()
        self._im.wait()



def _make_hi_kernel(L: int, T: int, q: int, b0: int, MS: int, CS: int,
                    width: int, NSA: int, NSB: int):  # noqa: C901
    R2 = 1 << (L - 21)
    NMC = 128 // MS
    NCC = _C // CS
    NB = NMC * NCC
    DA = NSA - 1
    DB = NSB - 1

    def kernel(u7r_ref, u7i_ref, u21r_ref, u21i_ref, par_ref, sre_in_ref,
               sim_in_ref, a_out_ref, st_re, st_im, aslab, bslab, acc,
               sems):
        # the split-plane inputs are aliased to the outputs (no HBM
        # scratch on Mosaic); see _PlanePair for why the planes are
        # separate arrays
        del sre_in_ref, sim_in_ref
        arow = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
        alane = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
        apos = arow * 128 + alane
        a_out_ref[0] = jnp.where(
            apos == 0, float(1 - 2 * ((b0 >> q) & 1)), 0.0)

        # loop-invariant z tables
        l7o = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
        z7o = [(1 - 2 * ((l7o >> k) & 1)).astype(jnp.float32)
               for k in range(7)]
        l7c = jax.lax.broadcasted_iota(jnp.int32, (128, 1), 0)
        z7c = [(1 - 2 * ((l7c >> k) & 1)).astype(jnp.float32)
               for k in range(7)]
        lci = jax.lax.broadcasted_iota(jnp.int32, (1, _C), 1)
        zz67 = (1 - 2 * (((lci >> 6) ^ (lci >> 7)) & 1)).astype(jnp.float32)
        z13c = (1 - 2 * ((lci >> 13) & 1)).astype(jnp.float32)
        # z14 = bit 0 of the slab's m (row) axis in pass A
        mrow = jax.lax.broadcasted_iota(jnp.int32, (128, 1), 0)
        z14r = (1 - 2 * (mrow & 1)).astype(jnp.float32)
        r2i = jax.lax.broadcasted_iota(jnp.int32, (R2, 1), 0)
        z21 = (1 - 2 * (r2i & 1)).astype(jnp.float32)
        zr2 = [(1 - 2 * ((r2i >> k) & 1)).astype(jnp.float32)
               for k in range(L - 21)]
        csl = jax.lax.broadcasted_iota(jnp.int32, (1, 1, CS), 2)

        # DMA helpers (sem lanes: A loads [0,NSA), A stores [NSA,2NSA),
        # B loads/stores after; the init sweep borrows the A-store lanes)
        def loadA(slot, i):
            return _PlanePair(
                pltpu.make_async_copy(st_re.at[i], aslab.at[slot, 0],
                                      sems.at[2 * slot]),
                pltpu.make_async_copy(st_im.at[i], aslab.at[slot, 1],
                                      sems.at[2 * slot + 1]))

        def storeA(slot, i):
            return _PlanePair(
                pltpu.make_async_copy(aslab.at[slot, 0], st_re.at[i],
                                      sems.at[2 * (NSA + slot)]),
                pltpu.make_async_copy(aslab.at[slot, 1], st_im.at[i],
                                      sems.at[2 * (NSA + slot) + 1]))

        def loadB(slot, jm, jc):
            win = (pl.ds(jm * MS, MS), pl.ds(jc * CS, CS))
            return _PlanePair(
                pltpu.make_async_copy(st_re.at[:, win[0], win[1]],
                                      bslab.at[slot, 0],
                                      sems.at[2 * (2 * NSA + slot)]),
                pltpu.make_async_copy(st_im.at[:, win[0], win[1]],
                                      bslab.at[slot, 1],
                                      sems.at[2 * (2 * NSA + slot) + 1]))

        def storeB(slot, jm, jc):
            win = (pl.ds(jm * MS, MS), pl.ds(jc * CS, CS))
            return _PlanePair(
                pltpu.make_async_copy(bslab.at[slot, 0],
                                      st_re.at[:, win[0], win[1]],
                                      sems.at[2 * (2 * NSA + NSB + slot)]),
                pltpu.make_async_copy(bslab.at[slot, 1],
                                      st_im.at[:, win[0], win[1]],
                                      sems.at[2 * (2 * NSA + NSB + slot) + 1]))

        # ------------------------------------------------------------------
        # init sweep: write the basis state b0 block by block (store-only)
        r2_b0 = b0 >> 21
        m_b0 = (b0 >> 14) & 127
        c_b0 = b0 & (_C - 1)
        mloc = jax.lax.broadcasted_iota(jnp.int32, (128, _C), 0)
        cloc = jax.lax.broadcasted_iota(jnp.int32, (128, _C), 1)

        def init_body(i, _):
            slot = i % NSA

            @pl.when(i >= NSA)
            def _():
                storeA(slot, i - NSA).wait()

            hit = (mloc == m_b0) & (cloc == c_b0) & (i == r2_b0)
            aslab[slot, 0] = jnp.where(hit, 1.0, 0.0)
            aslab[slot, 1] = jnp.zeros((128, _C), jnp.float32)
            storeA(slot, i).start()
            return _

        jax.lax.fori_loop(0, R2, init_body, None)
        for i in range(max(0, R2 - NSA), R2):
            storeA(i % NSA, i).wait()

        def cycle(cyc, _):
            # compact row reads (pack_cycle_params_compact layout)
            def cz(qq):
                return (par_ref[0, cyc, 3 * L - 1 + qq]
                        * (par_ref[0, cyc, L + qq] - 0.5)
                        - _HALF_PI * par_ref[0, cyc, qq])

            def cb(jj):
                return (par_ref[0, cyc, 4 * L - 1 + jj]
                        * (par_ref[0, cyc, 2 * L + jj] - 0.5))

            c0 = _HALF_PI * sum(par_ref[0, cyc, qq] for qq in range(L))

            def angle7(base, bias, zt):
                th = bias + jnp.zeros_like(zt[0])
                for k in range(7):
                    th = th + cz(base + k) * zt[k]
                    if k > 0:
                        th = th + cb(base + k - 1) * (zt[k - 1] * zt[k])
                return th

            def scaled_cols(u7rt, u7it, th):
                dr = jnp.cos(th)
                di = jnp.sin(th)
                return u7rt * dr - u7it * di, u7rt * di + u7it * dr

            u7rt = u7r_ref[0].T
            u7it = u7i_ref[0].T
            b1r, b1i = scaled_cols(u7rt, u7it, angle7(0, c0, z7o))
            b2r, b2i = scaled_cols(u7rt, u7it, angle7(7, 0.0, z7o))
            # bits-14..20 kick: B14 = rowdiag(e^{i th_B}) U7
            th_b = angle7(14, 0.0, z7c)
            b14r, b14i = scaled_cols(u7r_ref[0], u7i_ref[0], th_b)
            th_c = jnp.zeros((R2, 1), jnp.float32)
            for k in range(L - 21):
                th_c = th_c + cz(21 + k) * zr2[k]
                if k > 0:
                    th_c = th_c + cb(20 + k) * (zr2[k - 1] * zr2[k])
            s20 = cb(20)
            s13 = cb(13)
            s6 = cb(6)

            # -------- pass A: full r2 blocks (col kicks + m kick) --------
            def a_body(i, _):
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
                # bits-14..20 kick over the block's m axis (left dot)
                p1 = _dot_f32(b14r, mr)
                p2 = _dot_f32(b14i, mi)
                p3 = _dot_f32(b14r + b14i, mr + mi)
                mr, mi = p1 - p2, p3 - p1 - p2
                # bond 13-14 straddle: both bits slab-local now
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

            # -------- pass B: (m-chunk, c-chunk) U21-only sub-slabs ------
            acc[0] = 0.0

            def b_body(j, _):
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
                gr = u21r_ref[0] * dr - u21i_ref[0] * di
                gi = u21r_ref[0] * di + u21i_ref[0] * dr
                xr = bslab[s, 0].reshape(R2, MS * CS)
                xi = bslab[s, 1].reshape(R2, MS * CS)
                q1 = _dot_f32(gr, xr)
                q2 = _dot_f32(gi, xi)
                q3 = _dot_f32(gr + gi, xr + xi)
                mr, mi = q1 - q2, q3 - q1 - q2
                # A(t) partial: z_q is a column sign for q < 14, else a
                # sign over the composite (r2, m) row index
                # r2*128 + (jm*MS + m), whose bit (q - 14) is the probe
                # bit (m = bits 14..20, r2 = bits 21..L-1)
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
                mr3 = mr.reshape(R2, MS, CS)
                mi3 = mi.reshape(R2, MS, CS)
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

            @pl.when(cyc + 1 < T)
            def _():
                a_out_ref[0] = a_out_ref[0] + jnp.where(
                    apos == cyc + 1, acc[0], 0.0)

            return _

        jax.lax.fori_loop(0, T, cycle, None)

    return kernel


def _make_hi_echo_kernel(L: int, T2: int, q: int, b0: int, MS: int, CS: int,
                         width: int, NSA: int, NSB: int):  # noqa: C901
    """r2-blocked HBM-streamed echo kernel: one grid step = one
    (trajectory, t) pair running the first 2t steps of a 2T-step masked
    schedule (per-pair dynamic trip count, tile lane width-4).

    Same two DMA sweeps per step as the hi forward kernel, with the
    resident echo's (pre, post) diagonal folds: pre (inverse diagonal at
    the running sigma) scales contraction INPUTS, post (forward diagonal
    + noise signs) contraction OUTPUTS. Straddle ordering for THIS layout
    (bits 14..20 = pass-A m axis, bits 21+ = the r2 block index): pre-s13,
    pre-s20 and pre-s6 at the top of pass A (before any kick touching
    bits 13/14, 20 or 6/7 — z21 of pre-s20 is the block index parity, a
    per-block scalar), post-s6 after the column kicks, post-s13 after the
    m kick, post-s20 on the pass-B output rows. A terminal read-only
    sweep accumulates the |v|^2 z_q measurement.
    """
    R2 = 1 << (L - 21)
    NMC = 128 // MS
    NCC = _C // CS
    NB = NMC * NCC
    DA = NSA - 1
    DB = NSB - 1

    def kernel(u7r_ref, u7i_ref, u21r_ref, u21i_ref, par_ref, sre_in_ref,
               sim_in_ref, a_out_ref, st_re, st_im, aslab, bslab, acc,
               sems):
        del sre_in_ref, sim_in_ref
        arow = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
        alane = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
        apos = arow * 128 + alane

        # loop-invariant z tables (rows AND columns of each dot axis)
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

        def loadA(slot, i):
            return _PlanePair(
                pltpu.make_async_copy(st_re.at[i], aslab.at[slot, 0],
                                      sems.at[2 * slot]),
                pltpu.make_async_copy(st_im.at[i], aslab.at[slot, 1],
                                      sems.at[2 * slot + 1]))

        def storeA(slot, i):
            return _PlanePair(
                pltpu.make_async_copy(aslab.at[slot, 0], st_re.at[i],
                                      sems.at[2 * (NSA + slot)]),
                pltpu.make_async_copy(aslab.at[slot, 1], st_im.at[i],
                                      sems.at[2 * (NSA + slot) + 1]))

        def loadB(slot, jm, jc):
            win = (pl.ds(jm * MS, MS), pl.ds(jc * CS, CS))
            return _PlanePair(
                pltpu.make_async_copy(st_re.at[:, win[0], win[1]],
                                      bslab.at[slot, 0],
                                      sems.at[2 * (2 * NSA + slot)]),
                pltpu.make_async_copy(st_im.at[:, win[0], win[1]],
                                      bslab.at[slot, 1],
                                      sems.at[2 * (2 * NSA + slot) + 1]))

        def storeB(slot, jm, jc):
            win = (pl.ds(jm * MS, MS), pl.ds(jc * CS, CS))
            return _PlanePair(
                pltpu.make_async_copy(bslab.at[slot, 0],
                                      st_re.at[:, win[0], win[1]],
                                      sems.at[2 * (2 * NSA + NSB + slot)]),
                pltpu.make_async_copy(bslab.at[slot, 1],
                                      st_im.at[:, win[0], win[1]],
                                      sems.at[2 * (2 * NSA + NSB + slot) + 1]))

        # init sweep: basis state b0, block by block (store-only)
        r2_b0 = b0 >> 21
        m_b0 = (b0 >> 14) & 127
        c_b0 = b0 & (_C - 1)
        mloc = jax.lax.broadcasted_iota(jnp.int32, (128, _C), 0)
        cloc = jax.lax.broadcasted_iota(jnp.int32, (128, _C), 1)

        def init_body(i, _):
            slot = i % NSA

            @pl.when(i >= NSA)
            def _():
                storeA(slot, i - NSA).wait()

            hit = (mloc == m_b0) & (cloc == c_b0) & (i == r2_b0)
            aslab[slot, 0] = jnp.where(hit, 1.0, 0.0)
            aslab[slot, 1] = jnp.zeros((128, _C), jnp.float32)
            storeA(slot, i).start()
            return _

        jax.lax.fori_loop(0, R2, init_body, None)
        for i in range(max(0, R2 - NSA), R2):
            storeA(i % NSA, i).wait()

        # compact tile readers ((pre, post) interleaved rows)
        def cz(ti, qq):
            return (par_ref[0, ti, 3 * L - 1 + qq]
                    * (par_ref[0, ti, L + qq] - 0.5)
                    - _HALF_PI * par_ref[0, ti, qq])

        def cb(ti, jj):
            return (par_ref[0, ti, 4 * L - 1 + jj]
                    * (par_ref[0, ti, 2 * L + jj] - 0.5))

        def angle7(ti, base, bias, zt):
            th = bias + jnp.zeros_like(zt[0])
            for k in range(7):
                th = th + cz(ti, base + k) * zt[k]
                if k > 0:
                    th = th + cb(ti, base + k - 1) * (zt[k - 1] * zt[k])
            return th

        def angle_c(ti, zt):
            th = jnp.zeros_like(zt[0])
            for k in range(L - 21):
                th = th + cz(ti, 21 + k) * zt[k]
                if k > 0:
                    th = th + cb(ti, 20 + k) * (zt[k - 1] * zt[k])
            return th

        def step(k, _):
            pre = 2 * k
            post = 2 * k + 1
            imag_sign = par_ref[0, pre, width - 3]
            c0p = _HALF_PI * sum(par_ref[0, pre, qq] for qq in range(L))
            c0q = _HALF_PI * sum(par_ref[0, post, qq] for qq in range(L))

            u7rt = u7r_ref[0].T
            u7it = u7i_ref[0].T * imag_sign

            def scaled(base, bias_p, bias_q):
                th = (angle7(pre, base, bias_p, z7c)
                      + angle7(post, base, bias_q, z7o))
                dr = jnp.cos(th)
                di = jnp.sin(th)
                return u7rt * dr - u7it * di, u7rt * di + u7it * dr

            b1r, b1i = scaled(0, c0p, c0q)
            b2r, b2i = scaled(7, 0.0, 0.0)
            # m-axis kick (left dot): output rows post th_B, input columns
            # pre th_B
            th14 = (angle7(post, 14, 0.0, z7c) + angle7(pre, 14, 0.0, z7o))
            d14r = jnp.cos(th14)
            d14i = jnp.sin(th14)
            u7k = u7r_ref[0]
            u7ki = u7i_ref[0] * imag_sign
            b14r = u7k * d14r - u7ki * d14i
            b14i = u7k * d14i + u7ki * d14r
            th_cq = angle_c(post, zr2)    # (R2, 1) output rows
            th_cp = angle_c(pre, zr2c)    # (1, R2) input columns
            s20p, s20q = cb(pre, 20), cb(post, 20)
            s13p, s13q = cb(pre, 13), cb(post, 13)
            s6p, s6q = cb(pre, 6), cb(post, 6)

            # -------- pass A: full r2 blocks (col kicks + m kick) --------
            def a_body(i, _):
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
                # pre straddles (before any kick touching their bits):
                # bond 13 (z13 col x z14 m-row), bond 20 (z20 m-row x the
                # block-index parity = z21), bond 6 (column-local)
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
                # bits-14..20 kick over the block's m axis (left dot)
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

            # -------- pass B: (m-chunk, c-chunk) U21-only sub-slabs ------
            def b_body(j, _):
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
                th = th_cq + z20 * s20q * z21 + th_cp
                dr = jnp.cos(th)
                di = jnp.sin(th)
                u21i_s = u21i_ref[0] * imag_sign
                gr = u21r_ref[0] * dr - u21i_s * di
                gi = u21r_ref[0] * di + u21i_s * dr
                xr = bslab[s, 0].reshape(R2, MS * CS)
                xi = bslab[s, 1].reshape(R2, MS * CS)
                q1 = _dot_f32(gr, xr)
                q2 = _dot_f32(gi, xi)
                q3 = _dot_f32(gr + gi, xr + xi)
                mr, mi = q1 - q2, q3 - q1 - q2
                bslab[s, 0] = mr.reshape(R2, MS, CS)
                bslab[s, 1] = mi.reshape(R2, MS, CS)
                storeB(s, jm, jc).start()
                return _

            for d in range(min(DB, NB)):
                loadB(d % NSB, d // NCC, d % NCC).start()
            jax.lax.fori_loop(0, NB, b_body, None)
            for j in range(max(0, NB - DB - 1), NB):
                storeB(j % NSB, j // NCC, j % NCC).wait()
            return _

        n_active = par_ref[0, 0, width - 4].astype(jnp.int32)
        jax.lax.fori_loop(0, n_active, step, None)

        # terminal measurement sweep (read-only): raw sum |v|^2 z_q —
        # column sign for q < 14, else composite-row sign over
        # i*128 + m (slab i = r2 block bits 21.., rows = m bits 14..20)
        acc[0] = 0.0
        if q < 14:
            zq_m = (1 - 2 * ((cloc >> q) & 1)).astype(jnp.float32)
        else:
            rloc_m = jax.lax.broadcasted_iota(jnp.int32, (128, 1), 0)

        def meas_body(i, _):
            s = i % NSA
            loadA(s, i).wait()

            @pl.when(i + 1 < R2)
            def _():
                loadA((i + 1) % NSA, i + 1).start()

            mr = aslab[s, 0]
            mi = aslab[s, 1]
            zz = zq_m if q < 14 else (
                1 - 2 * (((i * 128 + rloc_m) >> (q - 14)) & 1)
            ).astype(jnp.float32)
            acc[0] = acc[0] + jnp.sum((mr * mr + mi * mi) * zz)
            return _

        loadA(0, 0).start()
        jax.lax.fori_loop(0, R2, meas_body, None)
        a_out_ref[0] = jnp.where(apos == 0, acc[0], 0.0)

    return kernel


def _hi_geometry(L):
    """(MS, CS) pass-B sub-slab geometry: R2*MS*CS = 2^20 elements (8 MB
    planar pair) with MS <= 64 (z20 constant per chunk) and CS >= 128."""
    R2 = 1 << (L - 21)
    CS = max(128, (1 << 20) // (R2 * 64))
    MS = max(1, min(64, (1 << 20) // (R2 * CS)))
    return MS, CS


@functools.partial(
    jax.jit,
    static_argnames=("L", "T", "p", "q", "initial_state", "ancilla_factor",
                     "interpret", "geom"),
)
def streamed_hi_forward_batch(hs, phis, angles, keys, *, L, T, p, q,
                              initial_state="vacuum", ancilla_factor=1.0,
                              interpret=False, ext_rows=None, ext_sig=None,
                              geom=None):
    """(inst, L), (inst, L-1), (T,1,2), (inst, c, 2) -> (inst, c, T).

    r2-blocked HBM-streamed x-polarized forward autocorrelator for
    22 <= L <= 30 (constant schedules; any probe q < L — a column sign
    for q < 14, a row/block sign above). The single-chip L=29/30
    engine — bounded slab sizes for every L (see module docstring).

    ext_rows (inst, c, T, width) / ext_sig (inst, c, T): externally packed
    compact cycle rows + measurement sigmas overriding the flat presampler
    (the device-noise path — core.device_evolve).

    geom: optional (MS, CS) pass-B sub-slab override (MS | 64, CS >= 128,
    lane-multiple) — two geometries re-cut every pass-B DMA boundary, so
    agreement between them independently validates the strided-slab
    machinery at sizes where no other engine runs (L=30).
    """
    if not (22 <= L <= 30):
        raise ValueError("streamed-hi kernel supports 22 <= L <= 30")
    if T > 1024:
        raise ValueError("streamed-hi kernel supports T <= 1024")
    if not (0 <= q < L):
        raise ValueError("streamed-hi kernel requires probe qubit q < L")
    # NOTE schedule constancy is a dispatch-side contract: only
    # angles[0, 0, 0] is read (constant x-kick).
    R2 = 1 << (L - 21)
    MS, CS = geom if geom is not None else _hi_geometry(L)
    if 64 % MS or CS % 128 or not (0 < MS <= 64) or not (128 <= CS <= _C):
        raise ValueError(f"bad pass-B geometry (MS={MS}, CS={CS})")
    width = 128 if 5 * L - 2 <= 128 else 256
    NSA = min(2, R2)
    # L=30 sits 944 KB past the 122 MB scoped-VMEM cap with a 4-slot
    # pass-B ring (measured: "Scoped allocation with size 122.92M");
    # 3 slots still double-buffer the prefetch and recover 8 MB.
    # DTC_TPU_HI_NSB overrides for cross-checks/tuning.
    NSB = min(int(os.environ.get("DTC_TPU_HI_NSB",
                                 "3" if R2 >= 512 else "4")),
              (128 // MS) * (_C // CS))
    b0 = 0 if initial_state == "vacuum" else neel_index(L)
    s0 = 1.0 if ((b0 >> q) & 1) == 0 else -1.0
    theta = angles[0, 0, 0]
    u7r, u7i = _rx_kron(theta, 7)
    u21r, u21i = _rx_kron(theta, L - 21)

    def per_instance(h, ph, ks, ext_r, ext_s):
        n_traj = ks.shape[0]
        if ext_r is not None:
            params, sig_after = ext_r, ext_s
        elif p > 0.0:
            def sample(key):
                _, zm, _, csum = presample_noise(key, p, T, L)
                return jax.vmap(
                    lambda z, sg: pack_cycle_params_compact(
                        z, sg, h, ph, L, width=width)
                )(zm, csum), csum

            params, sig_after = jax.vmap(sample)(ks)  # (c,T,width), (c,T)
        else:
            row = pack_cycle_params_compact(
                jnp.uint32(0), jnp.uint32(0), h, ph, L, width=width)
            params = jnp.broadcast_to(row, (n_traj, T, width))
            sig_after = jnp.zeros((n_traj, T), jnp.uint32)

        par_mem = (pltpu.SMEM if T * width * 4 * 2 <= 1024 * 1024
                   else pltpu.VMEM)
        # distinct fill constants: the two plane operands MUST be
        # different buffers (each is hard-aliased to its own output; a
        # CSE'd shared zeros broadcast could hand both aliases one
        # buffer). Contents are irrelevant — the init sweep overwrites
        # every block before any read.
        plane_re = jnp.zeros((R2, 128, _C), jnp.float32)
        plane_im = jnp.full((R2, 128, _C), 1.0, jnp.float32)
        a_raw, _, _ = pl.pallas_call(
            _make_hi_kernel(L, T, q, b0, MS, CS, width, NSA, NSB),
            out_shape=[
                jax.ShapeDtypeStruct((n_traj, 8, 128), jnp.float32),
                jax.ShapeDtypeStruct((R2, 128, _C), jnp.float32),
                jax.ShapeDtypeStruct((R2, 128, _C), jnp.float32),
            ],
            grid=(n_traj,),
            in_specs=[
                pl.BlockSpec((1, 128, 128), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM),  # u7r
                pl.BlockSpec((1, 128, 128), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM),  # u7i
                pl.BlockSpec((1, R2, R2), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM),  # u21r
                pl.BlockSpec((1, R2, R2), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM),  # u21i
                pl.BlockSpec((1, T, width), lambda i: (i, 0, 0),
                             memory_space=par_mem),     # compact params
                pl.BlockSpec(memory_space=pl.ANY),      # re plane (aliased)
                pl.BlockSpec(memory_space=pl.ANY),      # im plane (aliased)
            ],
            out_specs=[
                pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pl.ANY),      # re plane (aliased)
                pl.BlockSpec(memory_space=pl.ANY),      # im plane (aliased)
            ],
            input_output_aliases={5: 1, 6: 2},
            scratch_shapes=[
                pltpu.VMEM((NSA, 2, 128, _C), jnp.float32),   # pass-A slabs
                pltpu.VMEM((NSB, 2, R2, MS, CS), jnp.float32),  # pass-B
                pltpu.SMEM((1,), jnp.float32),                # A(t) partial
                pltpu.SemaphoreType.DMA((2 * (2 * NSA + 2 * NSB),)),
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=122 * 1024 * 1024),
            interpret=interpret,
        )(u7r[None], u7i[None], u21r[None], u21i[None], params,
          plane_re, plane_im)
        a_raw = a_raw.reshape(n_traj, 1024)[:, :T]

        sig_start = jnp.concatenate(
            [jnp.zeros((n_traj, 1), jnp.uint32), sig_after[:, :-1]], axis=1)
        sq = (1 - 2 * ((sig_start >> q) & jnp.uint32(1)).astype(jnp.int32)
              ).astype(jnp.float32)
        return ancilla_factor * s0 * sq * a_raw

    return jax.vmap(per_instance)(hs, phis, keys, ext_rows, ext_sig)


@functools.partial(
    jax.jit,
    static_argnames=("L", "T", "p", "q", "initial_state", "ancilla_factor",
                     "interpret", "geom", "debug_state"),
)
def streamed_hi_echo_batch(hs, phis, angles, keys, ts, *, L, T, p, q,
                           initial_state="vacuum", ancilla_factor=1.0,
                           interpret=False, ext_tiles=None, ext_sig=None,
                           geom=None, debug_state=False):
    """(inst, L), (inst, L-1), (T,1,2), (inst, c, 2), (n_ts,) -> (inst, c, n_ts).

    r2-blocked HBM-streamed echo A0(t) for 22 <= L <= 30 (constant x
    drive, any probe q < L) — the single-chip L=29/30 ECHO engine. Per
    (trajectory, t) pair the kernel runs the first 2t steps of a 2T-step
    masked schedule (per-pair dynamic trip count) with the hi forward
    kernel's bounded-slab DMA sweeps and the resident echo's (pre, post)
    diagonal folds (shared builder ops.pallas_resident.echo_pair_tiles),
    matching core.sigma_evolve.sigma_echo_batch event-for-event. Echo
    semantics: autocorr-delta-a-single-qiskit-fast.py:140-147.

    ext_tiles (inst, c, n_ts, 4T, width) / ext_sig (inst, c, n_ts):
    externally packed (pre, post) step tiles + final measurement sigmas
    overriding the flat builder (the device-noise echo —
    core.device_evolve.device_echo_pair_tiles); the kernel runs unchanged.

    geom: optional (MS, CS) pass-B sub-slab override (see
    streamed_hi_forward_batch).
    """
    if not (22 <= L <= 30):
        raise ValueError("streamed-hi kernel supports 22 <= L <= 30")
    if T > 512:
        raise ValueError("streamed-hi echo supports T <= 512 (2T-step tiles)")
    if not (0 <= q < L):
        raise ValueError("streamed-hi kernel requires probe qubit q < L")
    from dtc_tpu.ops.pallas_resident import echo_pair_tiles

    R2 = 1 << (L - 21)
    MS, CS = geom if geom is not None else _hi_geometry(L)
    if 64 % MS or CS % 128 or not (0 < MS <= 64) or not (128 <= CS <= _C):
        raise ValueError(f"bad pass-B geometry (MS={MS}, CS={CS})")
    width = 128 if 5 * L - 2 <= 124 else 256  # flags ride lanes width-4..
    NSA = min(2, R2)
    NSB = min(2, (128 // MS) * (_C // CS))
    b0 = 0 if initial_state == "vacuum" else neel_index(L)
    s0 = 1.0 if ((b0 >> q) & 1) == 0 else -1.0
    T2 = 2 * T
    theta = angles[0, 0, 0]
    u7r, u7i = _rx_kron(theta, 7)
    u21r, u21i = _rx_kron(theta, L - 21)
    n_ts = ts.shape[0]

    def per_instance(h, ph, ks, ext_t, ext_s):
        if ext_t is not None:
            tiles, sig_fin = ext_t, ext_s
        else:
            tiles, sig_fin = jax.vmap(
                lambda k: jax.vmap(
                    lambda t: echo_pair_tiles(k, t, h, ph, L=L, T=T, p=p,
                                              width=width))(ts)
            )(ks)
        n_pairs = ks.shape[0] * n_ts
        tiles = tiles.reshape(n_pairs, 2 * T2, width)
        tile_mem = (pltpu.SMEM if 2 * T2 * width * 4 * 2 <= 1024 * 1024
                    else pltpu.VMEM)

        # distinct fill constants — see the forward wrapper's note
        plane_re = jnp.zeros((R2, 128, _C), jnp.float32)
        plane_im = jnp.full((R2, 128, _C), 1.0, jnp.float32)
        a_raw, _st_re, _st_im = pl.pallas_call(
            _make_hi_echo_kernel(L, T2, q, b0, MS, CS, width, NSA, NSB),
            out_shape=[
                jax.ShapeDtypeStruct((n_pairs, 8, 128), jnp.float32),
                jax.ShapeDtypeStruct((R2, 128, _C), jnp.float32),
                jax.ShapeDtypeStruct((R2, 128, _C), jnp.float32),
            ],
            grid=(n_pairs,),
            in_specs=[
                pl.BlockSpec((1, 128, 128), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM),  # u7r
                pl.BlockSpec((1, 128, 128), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM),  # u7i
                pl.BlockSpec((1, R2, R2), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM),  # u21r
                pl.BlockSpec((1, R2, R2), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM),  # u21i
                pl.BlockSpec((1, 2 * T2, width), lambda i: (i, 0, 0),
                             memory_space=tile_mem),    # step tiles
                pl.BlockSpec(memory_space=pl.ANY),      # re plane (aliased)
                pl.BlockSpec(memory_space=pl.ANY),      # im plane (aliased)
            ],
            out_specs=[
                pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pl.ANY),      # re plane (aliased)
                pl.BlockSpec(memory_space=pl.ANY),      # im plane (aliased)
            ],
            input_output_aliases={5: 1, 6: 2},
            scratch_shapes=[
                pltpu.VMEM((NSA, 2, 128, _C), jnp.float32),   # pass-A slabs
                pltpu.VMEM((NSB, 2, R2, MS, CS), jnp.float32),  # pass-B
                pltpu.SMEM((1,), jnp.float32),                # measurement
                pltpu.SemaphoreType.DMA((2 * (2 * NSA + 2 * NSB),)),
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=122 * 1024 * 1024),
            interpret=interpret,
        )(u7r[None], u7i[None], u21r[None], u21i[None], tiles,
          plane_re, plane_im)
        val = a_raw.reshape(n_pairs, 1024)[:, 0].reshape(ks.shape[0], n_ts)

        sq = (1 - 2 * ((sig_fin >> q) & jnp.uint32(1)).astype(jnp.int32)
              ).astype(jnp.float32)
        if debug_state:
            # diagnostic: also return the LAST pair's post-run state (the
            # aliased HBM planes) so hardware-only failures can be
            # localized (state zeroed vs measurement lost) without a
            # kernel rebuild — see benchmarks/hi_echo_l30_debug.py
            return ancilla_factor * s0 * sq * val, (_st_re, _st_im)
        return ancilla_factor * s0 * sq * val

    if debug_state:
        # no vmap: single instance, return (vals, final state)
        return per_instance(hs[0], phis[0],
                            keys[0],
                            None if ext_tiles is None else ext_tiles[0],
                            None if ext_sig is None else ext_sig[0])
    return jax.vmap(per_instance)(hs, phis, keys, ext_tiles, ext_sig)
