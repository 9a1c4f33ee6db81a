"""HBM-streamed whole-trajectory Floquet kernel (x-polarized forward,
22 <= L <= 28).

Past L=21 the statevector (>= 32 MB planar) no longer fits VMEM, and the
XLA scan alternative is deopted 15-30x by per-cycle traced operands
(docs/PERFORMANCE.md), while a python-per-cycle-jit loop pays ~9 ms
dispatch per call (benchmarks/percall_probe.py). This kernel keeps the
whole T-cycle trajectory in ONE pallas_call like ops/pallas_resident, but
the state lives in an HBM scratch and every cycle makes two double-
buffered DMA sweeps over it (measured ~326 GB/s effective on this
backend, benchmarks/dma_probe.py):

  pass A — row slabs (RS, 16384): kick bits 0..6 / 7..13 as Karatsuba
    dots with the column parts of the fused diagonal folded in (th_lo /
    th_mid as output-column scalings, exactly the pallas_resident fold),
    then the bond-6 straddle cmul. Column-diagonal parts commute with the
    later top kicks, so applying them here is exact.
  pass B — column slabs (R, CS): the row-bit kicks, split as
    U_top = U21 (bits 21..L-1) x U7 (bits 14..20) — both contractions
    slab-local after a VMEM axis swap — with the ROW parts of the
    diagonal folded in (th_B on U7's output rows, th_C and the bond-20
    straddle on U21's output rows), then the bond 13-14 straddle cmul
    (z13 is constant per column slab for CS <= 8192) and the per-cycle
    A(t) partial sum.

Same sigma-frame noise formulation, compact (T, 128) SMEM parameter rows
and bf16x3 dots as the resident kernel; values match the sigma engine to
the bf16x3 level with identical presampled trajectories.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dtc_tpu.core.sigma_evolve import presample_noise
from dtc_tpu.core.statevector import neel_index
from dtc_tpu.ops.pallas_noise import pack_cycle_params_compact
from dtc_tpu.ops.pallas_resident import _cmul, _dot_f32

_C = 16384       # bits 0..13 (column axis of the HBM state)
_RS = 64         # pass-A slab rows
_HALF_PI = float(np.pi / 2)


def _kara_right(xr, xi, br, bi):
    p1 = _dot_f32(xr, br)
    p2 = _dot_f32(xi, bi)
    p3 = _dot_f32(xr + xi, br + bi)
    return p1 - p2, p3 - p1 - p2


def _make_streamed_kernel(L: int, T: int, q: int, b0: int, CS: int,
                          width: int = 128, RS: int = 32, NSA: int = 4,
                          NSB: int = 4):  # noqa: C901
    """NSA/NSB = DMA slab slots per sweep (pass A / pass B). The original
    2-slot schedule started the next load only AFTER the current slab's
    compute, so the DMA engine drained between slabs (L=22 measured 2.9x
    off its own roofline — roadmap #1). With NS slots the prologue issues
    NS-1 loads back-to-back and each body iteration prefetches one more
    slab ahead after retiring the store that frees its slot: the engine
    streams the whole sweep. Slabs are half the original size (RS=32 rows /
    half-width B columns) so 4 slots fit the original ~32 MB slab budget
    (4x8 MB slots OOMed the 128 MB physical VMEM)."""
    R = 1 << (L - 14)
    R2 = R // 128
    NA = R // RS
    NB = _C // CS
    DA = NSA - 1
    DB = NSB - 1

    def kernel(u7r_ref, u7i_ref, u21r_ref, u21i_ref, par_ref, st_in_ref,
               a_out_ref, st_hbm, aslab, bslab, acc, sems):
        # st_in_ref is aliased to st_hbm (Mosaic has no HBM scratch; the
        # state rides an ANY-space input/output pair instead); all DMA goes
        # through the output ref
        del st_in_ref
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
        r2i = jax.lax.broadcasted_iota(jnp.int32, (R2, 1), 0)
        z21 = (1 - 2 * (r2i & 1)).astype(jnp.float32)
        zr2 = [(1 - 2 * ((r2i >> k) & 1)).astype(jnp.float32)
               for k in range(L - 21)]
        # z14 (bit 0 of the m axis) as a (1, 128, 1) broadcast table
        m3 = jax.lax.broadcasted_iota(jnp.int32, (1, 128, 1), 1)
        z14m = (1 - 2 * (m3 & 1)).astype(jnp.float32)
        csl = jax.lax.broadcasted_iota(jnp.int32, (1, CS), 1)

        # DMA helpers (sem lanes: A loads [0,NSA), A stores [NSA,2NSA),
        # B loads/stores after; the init sweep borrows the A-store lanes)
        def loadA(slot, i):
            return pltpu.make_async_copy(
                st_hbm.at[:, pl.ds(i * RS, RS), :], aslab.at[slot],
                sems.at[slot])

        def storeA(slot, i):
            return pltpu.make_async_copy(
                aslab.at[slot], st_hbm.at[:, pl.ds(i * RS, RS), :],
                sems.at[NSA + slot])

        def loadB(slot, j):
            return pltpu.make_async_copy(
                st_hbm.at[:, :, pl.ds(j * CS, CS)], bslab.at[slot],
                sems.at[2 * NSA + slot])

        def storeB(slot, j):
            return pltpu.make_async_copy(
                bslab.at[slot], st_hbm.at[:, :, pl.ds(j * CS, CS)],
                sems.at[2 * NSA + NSB + slot])

        # ------------------------------------------------------------------
        # init sweep: write the basis state b0 slab by slab (store-only)
        r_b0 = b0 >> 14
        c_b0 = b0 & (_C - 1)
        rloc = jax.lax.broadcasted_iota(jnp.int32, (RS, _C), 0)
        cloc = jax.lax.broadcasted_iota(jnp.int32, (RS, _C), 1)

        def init_body(i, _):
            slot = i % NSA

            @pl.when(i >= NSA)
            def _():
                storeA(slot, i - NSA).wait()

            aslab[slot, 0] = jnp.where(
                (rloc + i * RS == r_b0) & (cloc == c_b0), 1.0, 0.0)
            aslab[slot, 1] = jnp.zeros((RS, _C), jnp.float32)
            storeA(slot, i).start()
            return _

        jax.lax.fori_loop(0, NA, init_body, None)
        for i in range(max(0, NA - NSA), NA):
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
            # pass-B matrices: B14 = rowdiag(e^{i th_B}) U7 (RX kron powers
            # are symmetric, so U7 doubles as its own [out, in] layout)
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

            # ---------------- pass A: row slabs ----------------
            def a_body(i, _):
                s = i % NSA
                pf = i + DA

                @pl.when(pf < NA)
                def _():
                    @pl.when(i >= 1)
                    def _():
                        storeA((i - 1) % NSA, i - 1).wait()

                    loadA(pf % NSA, pf).start()

                loadA(s, i).wait()
                mr = aslab[s, 0].reshape(RS * 128, 128)
                mi = aslab[s, 1].reshape(RS * 128, 128)
                mr, mi = _kara_right(mr, mi, b1r, b1i)
                mr = jnp.swapaxes(mr.reshape(RS, 128, 128), 1, 2).reshape(
                    RS * 128, 128)
                mi = jnp.swapaxes(mi.reshape(RS, 128, 128), 1, 2).reshape(
                    RS * 128, 128)
                mr, mi = _kara_right(mr, mi, b2r, b2i)
                mr = jnp.swapaxes(mr.reshape(RS, 128, 128), 1, 2).reshape(
                    RS, _C)
                mi = jnp.swapaxes(mi.reshape(RS, 128, 128), 1, 2).reshape(
                    RS, _C)
                mr, mi = _cmul(mr, mi, jnp.cos(s6), zz67 * jnp.sin(s6))
                aslab[s, 0] = mr
                aslab[s, 1] = mi
                storeA(s, i).start()
                return _

            for d in range(min(DA, NA)):
                loadA(d % NSA, d).start()
            jax.lax.fori_loop(0, NA, a_body, None)
            for i in range(max(0, NA - DA - 1), NA):
                storeA(i % NSA, i).wait()

            # ---------------- pass B: column slabs ----------------
            acc[0] = 0.0

            def b_body(j, _):
                s = j % NSB
                pf = j + DB

                @pl.when(pf < NB)
                def _():
                    @pl.when(j >= 1)
                    def _():
                        storeB((j - 1) % NSB, j - 1).wait()

                    loadB(pf % NSB, pf).start()

                loadB(s, j).wait()
                # (R, CS) -> (m, R2*CS) for the bits-14..20 contraction
                mr = jnp.swapaxes(bslab[s, 0].reshape(R2, 128, CS), 0,
                                  1).reshape(128, R2 * CS)
                mi = jnp.swapaxes(bslab[s, 1].reshape(R2, 128, CS), 0,
                                  1).reshape(128, R2 * CS)
                p1 = _dot_f32(b14r, mr)
                p2 = _dot_f32(b14i, mi)
                p3 = _dot_f32(b14r + b14i, mr + mi)
                mr, mi = p1 - p2, p3 - p1 - p2
                # -> (R2, 128, CS) for the bits-21.. contraction; the
                # bond-20 straddle splits the m axis into z20 = +-1 halves
                mr = jnp.swapaxes(mr.reshape(128, R2, CS), 0, 1)
                mi = jnp.swapaxes(mi.reshape(128, R2, CS), 0, 1)
                halves = []
                for sgn, sl in ((1.0, slice(0, 64)), (-1.0, slice(64, 128))):
                    th = th_c + sgn * s20 * z21
                    dr = jnp.cos(th)
                    di = jnp.sin(th)
                    gr = u21r_ref[0] * dr - u21i_ref[0] * di
                    gi = u21r_ref[0] * di + u21i_ref[0] * dr
                    hr = mr[:, sl, :].reshape(R2, 64 * CS)
                    hi_ = mi[:, sl, :].reshape(R2, 64 * CS)
                    q1 = _dot_f32(gr, hr)
                    q2 = _dot_f32(gi, hi_)
                    q3 = _dot_f32(gr + gi, hr + hi_)
                    halves.append(((q1 - q2).reshape(R2, 64, CS),
                                   (q3 - q1 - q2).reshape(R2, 64, CS)))
                mr = jnp.concatenate([halves[0][0], halves[1][0]], axis=1)
                mi = jnp.concatenate([halves[0][1], halves[1][1]], axis=1)
                # bond 13-14 straddle: z13 is constant over this column
                # slab (CS <= 8192), z14 = bit 0 of the m axis
                z13 = jnp.where(j * CS < _C // 2, 1.0, -1.0)
                mr, mi = _cmul(mr, mi, jnp.cos(s13),
                               (z13 * z14m) * jnp.sin(s13))
                # A(t) partial: z_q is a column sign for q < 14, else a
                # sign over the composite (r2, m) row index r2*128 + m
                # whose bit (q - 14) is the probe bit (m = bits 14..20,
                # r2 = bits 21..L-1; mr is (R2, 128, CS) here)
                if q < 14:
                    zq = (1 - 2 * (((j * CS + csl) >> q) & 1)).astype(
                        jnp.float32)[:, None, :]
                else:
                    r2v = jax.lax.broadcasted_iota(
                        jnp.int32, (R2, 1, 1), 0)
                    mv = jax.lax.broadcasted_iota(
                        jnp.int32, (1, 128, 1), 1)
                    zq = (1 - 2 * (((r2v * 128 + mv) >> (q - 14)) & 1)
                          ).astype(jnp.float32)
                acc[0] = acc[0] + jnp.sum((mr * mr + mi * mi) * zq)
                bslab[s, 0] = mr.reshape(R, CS)
                bslab[s, 1] = mi.reshape(R, CS)
                storeB(s, j).start()
                return _

            for d in range(min(DB, NB)):
                loadB(d % NSB, d).start()
            jax.lax.fori_loop(0, NB, b_body, None)
            for j in range(max(0, NB - DB - 1), NB):
                storeB(j % NSB, j).wait()

            @pl.when(cyc + 1 < T)
            def _():
                a_out_ref[0] = a_out_ref[0] + jnp.where(
                    apos == cyc + 1, acc[0], 0.0)

            return _

        jax.lax.fori_loop(0, T, cycle, None)

    return kernel


def _make_streamed_echo_kernel(L: int, T2: int, q: int, b0: int, CS: int,
                               width: int = 128):  # noqa: C901
    """HBM-streamed echo kernel: one grid step = one (trajectory, t) pair.

    Runs the pair's first 2t steps of a 2T-step masked schedule (per-pair
    dynamic trip count, resident-echo tile lane 124). Each step is a full
    cycle — two double-buffered DMA sweeps exactly like the forward kernel
    — with the resident echo's (pre, post) diagonal folds: pre (inverse
    diagonal at the running sigma) scales contraction INPUTS, post (forward
    diagonal + noise signs) contraction OUTPUTS. Column operators (bits
    0..13) commute with row operators (bits 14..), so the A-then-B pass
    order serves forward AND inverse steps; the mixed straddle bonds are
    ordered explicitly (pre-s13 at the top of pass A, pre-s20 at the top of
    pass B — both before any kick touching their bits). A terminal
    read-only sweep accumulates the |v|^2 z_q measurement.
    """
    R = 1 << (L - 14)
    R2 = R // 128
    NA = R // _RS
    NB = _C // CS
    # Echo keeps the original 2-slot double-buffered schedule for both
    # sweeps (scratch (2, ...) slabs, 8 DMA semaphore lanes at fixed
    # offsets 0/2/4/6): its per-(trajectory, t) grid already overlaps
    # pairs, so the deeper forward-kernel prefetch buys little here.
    NSA = 2
    NSB = 2
    DA = NSA - 1
    DB = NSB - 1

    def kernel(u7r_ref, u7i_ref, u21r_ref, u21i_ref, par_ref, st_in_ref,
               a_out_ref, st_hbm, aslab, bslab, acc, sems):
        del st_in_ref
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
        r2i = jax.lax.broadcasted_iota(jnp.int32, (R2, 1), 0)
        z21 = (1 - 2 * (r2i & 1)).astype(jnp.float32)
        zr2 = [(1 - 2 * ((r2i >> k) & 1)).astype(jnp.float32)
               for k in range(L - 21)]
        r2c = jax.lax.broadcasted_iota(jnp.int32, (1, R2), 1)
        z21c = (1 - 2 * (r2c & 1)).astype(jnp.float32)
        zr2c = [(1 - 2 * ((r2c >> k) & 1)).astype(jnp.float32)
                for k in range(L - 21)]
        # pass-A row parity = bit 14 (RS = 64 even, so absolute LSB = local)
        ra = jax.lax.broadcasted_iota(jnp.int32, (_RS, 1), 0)
        z14a = (1 - 2 * (ra & 1)).astype(jnp.float32)
        # pass-B m-axis z14 and pass-B raw-slab z20*z21 row mask
        m3 = jax.lax.broadcasted_iota(jnp.int32, (1, 128, 1), 1)
        z14m = (1 - 2 * (m3 & 1)).astype(jnp.float32)
        rr = jax.lax.broadcasted_iota(jnp.int32, (R, 1), 0)
        z2021 = (1 - 2 * (((rr >> 6) ^ (rr >> 7)) & 1)).astype(jnp.float32)
        csl = jax.lax.broadcasted_iota(jnp.int32, (1, CS), 1)

        def loadA(slot, i):
            return pltpu.make_async_copy(
                st_hbm.at[:, pl.ds(i * _RS, _RS), :], aslab.at[slot],
                sems.at[slot])

        def storeA(slot, i):
            return pltpu.make_async_copy(
                aslab.at[slot], st_hbm.at[:, pl.ds(i * _RS, _RS), :],
                sems.at[2 + slot])

        def loadB(slot, j):
            return pltpu.make_async_copy(
                st_hbm.at[:, :, pl.ds(j * CS, CS)], bslab.at[slot],
                sems.at[4 + slot])

        def storeB(slot, j):
            return pltpu.make_async_copy(
                bslab.at[slot], st_hbm.at[:, :, pl.ds(j * CS, CS)],
                sems.at[6 + slot])

        # init sweep: basis state b0
        r_b0 = b0 >> 14
        c_b0 = b0 & (_C - 1)
        rloc = jax.lax.broadcasted_iota(jnp.int32, (_RS, _C), 0)
        cloc = jax.lax.broadcasted_iota(jnp.int32, (_RS, _C), 1)

        def init_body(i, _):
            slot = i % NSA

            @pl.when(i >= NSA)
            def _():
                storeA(slot, i - NSA).wait()

            aslab[slot, 0] = jnp.where(
                (rloc + i * _RS == r_b0) & (cloc == c_b0), 1.0, 0.0)
            aslab[slot, 1] = jnp.zeros((_RS, _C), jnp.float32)
            storeA(slot, i).start()
            return _

        jax.lax.fori_loop(0, NA, init_body, None)
        for i in range(max(0, NA - NSA), NA):
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
            # pass-B b14: output rows (post th_B) x input columns (pre th_B)
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

            # ---------------- pass A ----------------
            def a_body(i, _):
                s = i % NSA
                pf = i + DA

                @pl.when(pf < NA)
                def _():
                    @pl.when(i >= 1)
                    def _():
                        storeA((i - 1) % NSA, i - 1).wait()

                    loadA(pf % NSA, pf).start()

                loadA(s, i).wait()
                mr = aslab[s, 0]
                mi = aslab[s, 1]
                # pre straddles: bond 13 (z13 col x z14 row), bond 6
                mr, mi = _cmul(mr, mi, jnp.cos(s13p),
                               (z13c * z14a) * jnp.sin(s13p))
                mr, mi = _cmul(mr, mi, jnp.cos(s6p), zz67 * jnp.sin(s6p))
                mr = mr.reshape(_RS * 128, 128)
                mi = mi.reshape(_RS * 128, 128)
                mr, mi = _kara_right(mr, mi, b1r, b1i)
                mr = jnp.swapaxes(mr.reshape(_RS, 128, 128), 1, 2).reshape(
                    _RS * 128, 128)
                mi = jnp.swapaxes(mi.reshape(_RS, 128, 128), 1, 2).reshape(
                    _RS * 128, 128)
                mr, mi = _kara_right(mr, mi, b2r, b2i)
                mr = jnp.swapaxes(mr.reshape(_RS, 128, 128), 1, 2).reshape(
                    _RS, _C)
                mi = jnp.swapaxes(mi.reshape(_RS, 128, 128), 1, 2).reshape(
                    _RS, _C)
                mr, mi = _cmul(mr, mi, jnp.cos(s6q), zz67 * jnp.sin(s6q))
                aslab[s, 0] = mr
                aslab[s, 1] = mi
                storeA(s, i).start()
                return _

            for d in range(min(DA, NA)):
                loadA(d % NSA, d).start()
            jax.lax.fori_loop(0, NA, a_body, None)
            for i in range(max(0, NA - DA - 1), NA):
                storeA(i % NSA, i).wait()

            # ---------------- pass B ----------------
            def b_body(j, _):
                s = j % NSB
                pf = j + DB

                @pl.when(pf < NB)
                def _():
                    @pl.when(j >= 1)
                    def _():
                        storeB((j - 1) % NSB, j - 1).wait()

                    loadB(pf % NSB, pf).start()

                loadB(s, j).wait()
                pr = bslab[s, 0]
                pi_ = bslab[s, 1]
                # pre bond-20 straddle on the raw slab rows (bits 20, 21)
                pr, pi_ = _cmul(pr, pi_, jnp.cos(s20p),
                                z2021 * jnp.sin(s20p))
                mr = jnp.swapaxes(pr.reshape(R2, 128, CS), 0,
                                  1).reshape(128, R2 * CS)
                mi = jnp.swapaxes(pi_.reshape(R2, 128, CS), 0,
                                  1).reshape(128, R2 * CS)
                p1 = _dot_f32(b14r, mr)
                p2 = _dot_f32(b14i, mi)
                p3 = _dot_f32(b14r + b14i, mr + mi)
                mr, mi = p1 - p2, p3 - p1 - p2
                mr = jnp.swapaxes(mr.reshape(128, R2, CS), 0, 1)
                mi = jnp.swapaxes(mi.reshape(128, R2, CS), 0, 1)
                halves = []
                for sgn, sl in ((1.0, slice(0, 64)), (-1.0, slice(64, 128))):
                    th = th_cq + sgn * s20q * z21 + th_cp
                    dr = jnp.cos(th)
                    di = jnp.sin(th)
                    u21i_s = u21i_ref[0] * imag_sign
                    gr = u21r_ref[0] * dr - u21i_s * di
                    gi = u21r_ref[0] * di + u21i_s * dr
                    hr = mr[:, sl, :].reshape(R2, 64 * CS)
                    hi_ = mi[:, sl, :].reshape(R2, 64 * CS)
                    q1 = _dot_f32(gr, hr)
                    q2 = _dot_f32(gi, hi_)
                    q3 = _dot_f32(gr + gi, hr + hi_)
                    halves.append(((q1 - q2).reshape(R2, 64, CS),
                                   (q3 - q1 - q2).reshape(R2, 64, CS)))
                mr = jnp.concatenate([halves[0][0], halves[1][0]], axis=1)
                mi = jnp.concatenate([halves[0][1], halves[1][1]], axis=1)
                z13 = jnp.where(j * CS < _C // 2, 1.0, -1.0)
                mr, mi = _cmul(mr, mi, jnp.cos(s13q),
                               (z13 * z14m) * jnp.sin(s13q))
                bslab[s, 0] = mr.reshape(R, CS)
                bslab[s, 1] = mi.reshape(R, CS)
                storeB(s, j).start()
                return _

            for d in range(min(DB, NB)):
                loadB(d % NSB, d).start()
            jax.lax.fori_loop(0, NB, b_body, None)
            for j in range(max(0, NB - DB - 1), NB):
                storeB(j % NSB, j).wait()
            return _

        n_active = par_ref[0, 0, width - 4].astype(jnp.int32)
        jax.lax.fori_loop(0, n_active, step, None)

        # terminal measurement sweep (read-only): raw sum |v|^2 z_q —
        # column sign for q < 14, else a sign over the global row index
        # i*_RS + r (row bits 14..L-1)
        acc[0] = 0.0
        if q < 14:
            zq_m = (1 - 2 * ((cloc >> q) & 1)).astype(jnp.float32)
        else:
            rloc_m = jax.lax.broadcasted_iota(jnp.int32, (_RS, 1), 0)

        def meas_body(i, _):
            s = i % 2
            loadA(s, i).wait()

            @pl.when(i + 1 < NA)
            def _():
                loadA((i + 1) % 2, i + 1).start()

            mr = aslab[s, 0]
            mi = aslab[s, 1]
            zz = zq_m if q < 14 else (
                1 - 2 * (((i * _RS + rloc_m) >> (q - 14)) & 1)
            ).astype(jnp.float32)
            acc[0] = acc[0] + jnp.sum((mr * mr + mi * mi) * zz)
            return _

        loadA(0, 0).start()
        jax.lax.fori_loop(0, NA, meas_body, None)
        a_out_ref[0] = jnp.where(apos == 0, acc[0], 0.0)

    return kernel


def _rx_kron(theta, nbits):
    c = jnp.cos(theta / 2).astype(jnp.float32)
    s = jnp.sin(theta / 2).astype(jnp.float32)
    kr = jnp.eye(2, dtype=jnp.float32) * c
    ki = jnp.array([[0, -1], [-1, 0]], jnp.float32) * s
    ur, ui = kr, ki
    for _ in range(nbits - 1):
        ur, ui = (jnp.kron(ur, kr) - jnp.kron(ui, ki),
                  jnp.kron(ur, ki) + jnp.kron(ui, kr))
    return ur, ui


@functools.partial(
    jax.jit,
    static_argnames=("L", "T", "p", "q", "initial_state", "ancilla_factor",
                     "interpret"),
)
def streamed_echo_batch(hs, phis, angles, keys, ts, *, L, T, p, q,
                        initial_state="vacuum", ancilla_factor=1.0,
                        interpret=False, ext_tiles=None, ext_sig=None):
    """(inst, L), (inst, L-1), (T,1,2), (inst, c, 2), (n_ts,) -> (inst, c, n_ts).

    HBM-streamed echo A0(t) for 22 <= L <= 28 (constant x drive, any
    probe q < L):
    per (trajectory, t) pair the kernel runs the first 2t steps of a
    2T-step masked schedule (per-pair dynamic trip count) with the state in
    HBM and two double-buffered DMA sweeps per step — the streamed
    counterpart of ops.pallas_resident.resident_echo_batch, matching
    core.sigma_evolve.sigma_echo_batch event-for-event (identical
    presampled uniforms -> identical trajectories). Echo semantics:
    autocorr-delta-a-single-qiskit-fast.py:140-147.

    ext_tiles (inst, c, n_ts, 4T, width) / ext_sig (inst, c, n_ts):
    externally packed (pre, post) step tiles + final measurement sigmas
    overriding the flat builder (the device-noise echo —
    core.device_evolve.device_echo_pair_tiles); the kernel runs unchanged.
    """
    if not (22 <= L <= 28):
        raise ValueError("streamed kernel supports 22 <= L <= 28")
    if T > 512:
        raise ValueError("streamed echo supports T <= 512 (2T-step tiles)")
    if not (0 <= q < L):
        raise ValueError("streamed kernel requires probe qubit q < L")
    from dtc_tpu.ops.pallas_resident import echo_pair_tiles

    R = 1 << (L - 14)
    CS = max(128, (1 << 20) // R)
    width = 128 if 5 * L - 2 <= 124 else 256  # flags ride lanes width-4..
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

        state0 = jnp.zeros((2, R, _C), jnp.float32)
        a_raw, _ = pl.pallas_call(
            _make_streamed_echo_kernel(L, T2, q, b0, CS, width),
            out_shape=[
                jax.ShapeDtypeStruct((n_pairs, 8, 128), jnp.float32),
                jax.ShapeDtypeStruct((2, R, _C), jnp.float32),  # state
            ],
            grid=(n_pairs,),
            in_specs=[
                pl.BlockSpec((1, 128, 128), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM),  # u7r
                pl.BlockSpec((1, 128, 128), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM),  # u7i
                pl.BlockSpec((1, R // 128, R // 128), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM),  # u21r
                pl.BlockSpec((1, R // 128, R // 128), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM),  # u21i
                pl.BlockSpec((1, 2 * T2, width), lambda i: (i, 0, 0),
                             memory_space=tile_mem),    # step tiles
                pl.BlockSpec(memory_space=pl.ANY),      # state (aliased)
            ],
            out_specs=[
                pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pl.ANY),      # state (aliased)
            ],
            input_output_aliases={5: 1},
            scratch_shapes=[
                pltpu.VMEM((2, 2, _RS, _C), jnp.float32),    # pass-A slabs
                pltpu.VMEM((2, 2, R, CS), jnp.float32),      # pass-B slabs
                pltpu.SMEM((1,), jnp.float32),               # measurement
                pltpu.SemaphoreType.DMA((8,)),
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=122 * 1024 * 1024),
            interpret=interpret,
        )(u7r[None], u7i[None], u21r[None], u21i[None], tiles, state0)
        val = a_raw.reshape(n_pairs, 1024)[:, 0].reshape(ks.shape[0], n_ts)

        sq = (1 - 2 * ((sig_fin >> q) & jnp.uint32(1)).astype(jnp.int32)
              ).astype(jnp.float32)
        return ancilla_factor * s0 * sq * val

    return jax.vmap(per_instance)(hs, phis, keys, ext_tiles, ext_sig)


@functools.partial(
    jax.jit,
    static_argnames=("L", "T", "p", "q", "initial_state", "ancilla_factor",
                     "interpret"),
)
def streamed_forward_batch(hs, phis, angles, keys, *, L, T, p, q,
                           initial_state="vacuum", ancilla_factor=1.0,
                           interpret=False, ext_rows=None, ext_sig=None):
    """(inst, L), (inst, L-1), (T,1,2), (inst, c, 2) -> (inst, c, T).

    HBM-streamed x-polarized forward autocorrelator for 22 <= L <= 28
    (constant schedules; any probe q < L). Mirrors resident_forward_batch
    (ops/pallas_resident.py) above the VMEM limit.

    ext_rows (inst, c, T, width) / ext_sig (inst, c, T): externally packed
    compact cycle rows + measurement sigmas overriding the flat
    presampler (the device-noise path — see blocked_forward_batch).
    """
    if not (22 <= L <= 28):
        # L=29 reproducibly SIGKILLs the shared Mosaic compile helper
        # (64 MB pass-B slabs), L=30 would need a 128 MB slab pair — past
        # physical VMEM either way; L >= 29 is the sharded engine's
        # territory (docs/PERFORMANCE.md).
        raise ValueError("streamed kernel supports 22 <= L <= 28")
    if T > 1024:
        raise ValueError("streamed kernel supports T <= 1024")
    if not (0 <= q < L):
        raise ValueError("streamed kernel requires probe qubit q < L")
    # NOTE schedule constancy is a dispatch-side contract: only
    # angles[0, 0, 0] is read (constant x-kick). engine._forward_batch
    # only routes time-independent x drives here.
    R = 1 << (L - 14)
    # pass-B slabs are COLUMN slices: the DMA walks R strided rows of CS*4
    # bytes, so small CS wrecks its efficiency — keep the full 8 MB slab
    # (CS*4 = 16 KB row chunks at L=22) and run pass B with 2 slots; pass A
    # slabs are contiguous row slices, so they can be small (4 MB) and deep
    # (4 slots). Total slab budget 16 + 16 = 32 MB, same as round 1.
    CS = max(128, (1 << 20) // R)
    width = 128 if 5 * L - 2 <= 128 else 256  # param-row lanes (L=27: 133)
    RS = 32                          # pass-A slab rows (4 MB planar)
    NSA = min(4, R // RS)
    NSB = min(2, _C // CS)
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

        # width=256 param rows (L=27/28) overflow the 1 MB double-buffered
        # SMEM window past T=512 — fall to VMEM there (scalar loads from
        # VMEM are legal, just off the SMEM fast path), like the echo
        # kernel's tile_mem. CPU trace tests cover the VMEM branch.
        par_mem = (pltpu.SMEM if T * width * 4 * 2 <= 1024 * 1024
                   else pltpu.VMEM)
        state0 = jnp.zeros((2, R, _C), jnp.float32)
        a_raw, _ = pl.pallas_call(
            _make_streamed_kernel(L, T, q, b0, CS, width, RS, NSA, NSB),
            out_shape=[
                jax.ShapeDtypeStruct((n_traj, 8, 128), jnp.float32),
                jax.ShapeDtypeStruct((2, R, _C), jnp.float32),  # state
            ],
            grid=(n_traj,),
            in_specs=[
                pl.BlockSpec((1, 128, 128), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM),  # u7r
                pl.BlockSpec((1, 128, 128), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM),  # u7i
                pl.BlockSpec((1, R // 128, R // 128), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM),  # u21r
                pl.BlockSpec((1, R // 128, R // 128), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM),  # u21i
                pl.BlockSpec((1, T, width), lambda i: (i, 0, 0),
                             memory_space=par_mem),     # compact params
                pl.BlockSpec(memory_space=pl.ANY),      # state (aliased)
            ],
            out_specs=[
                pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pl.ANY),      # state (aliased)
            ],
            input_output_aliases={5: 1},
            scratch_shapes=[
                pltpu.VMEM((NSA, 2, RS, _C), jnp.float32),   # pass-A slabs
                pltpu.VMEM((NSB, 2, R, CS), jnp.float32),    # pass-B slabs
                pltpu.SMEM((1,), jnp.float32),               # A(t) partial
                pltpu.SemaphoreType.DMA((2 * NSA + 2 * NSB,)),
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=122 * 1024 * 1024),
            interpret=interpret,
        )(u7r[None], u7i[None], u21r[None], u21i[None], params, state0)
        a_raw = a_raw.reshape(n_traj, 1024)[:, :T]

        sig_start = jnp.concatenate(
            [jnp.zeros((n_traj, 1), jnp.uint32), sig_after[:, :-1]], axis=1)
        sq = (1 - 2 * ((sig_start >> q) & jnp.uint32(1)).astype(jnp.int32)
              ).astype(jnp.float32)
        return ancilla_factor * s0 * sq * a_raw

    return jax.vmap(per_instance)(hs, phis, keys, ext_rows, ext_sig)
