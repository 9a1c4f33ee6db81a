"""Per-cycle HBM-streamed Floquet kernel on the r2-blocked layout — the
per-shard engine for amplitude-sharded runs whose SHARD does not fit VMEM
(22 <= L_loc <= 30, split per-plane state at 30; the VMEM-resident per-shard kernel, ops/pallas_cycle,
bounds at L_loc = 23 because the whole shard lives in a VMEM scratch).

One pallas_call = ONE sigma-frame factored Floquet cycle on the shard-local
bits, with the state in HBM as (n_traj, 2, R2, 128, _C), R2 = 2^(L_loc-21)
— the r2-blocked layout of ops/pallas_streamed_hi, which is a pure reshape
of the flat shard (local index = r2*2^21 + m*2^14 + c), so the caller's XLA
global ops (shard-bit kicks, ppermutes, diagonal factors — see
parallel/sharded.py) operate on the SAME array reshaped to (n, 2, TOP, _C).
Each cycle runs the hi kernel's two bounded DMA sweeps:

  pass A — full r2 blocks (2, 128, _C) = 16 MB: bits 0..13 column kicks,
    the bits-14..20 m kick (left dot), straddle bonds 6, 13.
  pass B — strided (2, R2, MS, CS) = 8 MB sub-slabs: the bits-21.. kick
    over r2 with the bond-20 straddle, plus the fused A(t) partial sum
    (forward only).

Forward = post-fold convention (kick, then this cycle's noise-Z signs and
the sigma-conjugated D0 folded into the dots as OUTPUT-side angle offsets)
— one iteration of ops/pallas_streamed_hi._make_hi_kernel's cycle loop.
Inverse = PRE-fold (K.D with the same un-negated angles on the INPUT/
contracted side; straddles at the top of pass A before any kick touching
their bits) — combined with the caller's single imaginary-plane negation
at the echo turnaround this is the exact inverse cycle, same conjugation
identity as ops/pallas_cycle._make_inverse_kernel. Fold placements are the
ones validated by the streamed-hi echo kernel's (pre, post) step
(ops/pallas_streamed_hi._make_hi_echo_kernel).

This is what lets the TPU-mesh replacement of the reference's only
distributed hook (Lightning-MPI, dtc_qasm.py:57-58) run at kernel rate for
shards past VMEM: L = L_loc + log2(n_amp) reaches 33 on an 8-shard mesh
and 34 on 16 — beyond the reference's single-GPU Aer ceiling (L~30
practical, SURVEY §6). Physics/noise conventions mirror the reference
simulation loop (autocorr-delta-a-single-qiskit-fast.py:111-147) via
core/sigma_evolve.py like every other kernel family.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dtc_tpu.ops.pallas_resident import _C, _HALF_PI, _cmul, _dot_f32
from dtc_tpu.ops.pallas_streamed import _kara_right
from dtc_tpu.ops.pallas_streamed_hi import _PlanePair, _hi_geometry


def hi_dma_helpers(split, st_refs, aslab, bslab, g, MS, CS, NSA, NSB,
                   sems):
    """loadA/storeA/loadB/storeB builders over the per-trajectory state.

    split=False: ONE fused (n, 2, R2, 128, _C) HBM array (sem lanes:
    A loads [0,NSA), A stores [NSA,2NSA), B loads/stores after).
    split=True: TWO per-plane (n, R2, 128, _C) arrays — the streamed-hi
    `_PlanePair` layout that bounds every DMA window offset by one
    plane's size, lifting the 2^32 offset wrap that rejects L_loc = 30
    fused states (docs/PERFORMANCE.md round-4); each helper drives the
    re and im copies on paired sem lanes (2x the fused count).
    """
    if not split:
        (st_hbm,) = st_refs

        def loadA(slot, i):
            return pltpu.make_async_copy(
                st_hbm.at[g, :, i], aslab.at[slot], sems.at[slot])

        def storeA(slot, i):
            return pltpu.make_async_copy(
                aslab.at[slot], st_hbm.at[g, :, i], sems.at[NSA + slot])

        def loadB(slot, jm, jc):
            return pltpu.make_async_copy(
                st_hbm.at[g, :, :, pl.ds(jm * MS, MS), pl.ds(jc * CS, CS)],
                bslab.at[slot], sems.at[2 * NSA + slot])

        def storeB(slot, jm, jc):
            return pltpu.make_async_copy(
                bslab.at[slot],
                st_hbm.at[g, :, :, pl.ds(jm * MS, MS), pl.ds(jc * CS, CS)],
                sems.at[2 * NSA + NSB + slot])

        return loadA, storeA, loadB, storeB

    st_re, st_im = st_refs

    def loadA(slot, i):
        return _PlanePair(
            pltpu.make_async_copy(st_re.at[g, i], aslab.at[slot, 0],
                                  sems.at[2 * slot]),
            pltpu.make_async_copy(st_im.at[g, i], aslab.at[slot, 1],
                                  sems.at[2 * slot + 1]))

    def storeA(slot, i):
        return _PlanePair(
            pltpu.make_async_copy(aslab.at[slot, 0], st_re.at[g, i],
                                  sems.at[2 * (NSA + slot)]),
            pltpu.make_async_copy(aslab.at[slot, 1], st_im.at[g, i],
                                  sems.at[2 * (NSA + slot) + 1]))

    def loadB(slot, jm, jc):
        win = (pl.ds(jm * MS, MS), pl.ds(jc * CS, CS))
        return _PlanePair(
            pltpu.make_async_copy(st_re.at[g, :, win[0], win[1]],
                                  bslab.at[slot, 0],
                                  sems.at[2 * (2 * NSA + slot)]),
            pltpu.make_async_copy(st_im.at[g, :, win[0], win[1]],
                                  bslab.at[slot, 1],
                                  sems.at[2 * (2 * NSA + slot) + 1]))

    def storeB(slot, jm, jc):
        win = (pl.ds(jm * MS, MS), pl.ds(jc * CS, CS))
        return _PlanePair(
            pltpu.make_async_copy(bslab.at[slot, 0],
                                  st_re.at[g, :, win[0], win[1]],
                                  sems.at[2 * (2 * NSA + NSB + slot)]),
            pltpu.make_async_copy(bslab.at[slot, 1],
                                  st_im.at[g, :, win[0], win[1]],
                                  sems.at[2 * (2 * NSA + NSB + slot) + 1]))

    return loadA, storeA, loadB, storeB


def hi_state_specs(split, n_in_before, n_out_before, NSA, NSB):
    """(extra in_specs, extra out_specs, aliases, sem count) for the state
    operand(s): one fused ANY pair, or two per-plane ANY pairs (split)."""
    n_state = 2 if split else 1
    in_specs = [pl.BlockSpec(memory_space=pl.ANY)] * n_state
    out_specs = [pl.BlockSpec(memory_space=pl.ANY)] * n_state
    aliases = {n_in_before + k: n_out_before + k for k in range(n_state)}
    n_sems = (4 if split else 2) * (NSA + NSB)
    return in_specs, out_specs, aliases, n_sems


def _row_readers(par_ref, L):
    """Compact-row coefficient readers (pack_cycle_params_compact layout:
    n | sig | flip | h | phi at offsets 0, L, 2L, 3L-1, 4L-1)."""
    def cz(qq):
        return (par_ref[0, 0, 3 * L - 1 + qq]
                * (par_ref[0, 0, L + qq] - 0.5)
                - _HALF_PI * par_ref[0, 0, qq])

    def cb(jj):
        return (par_ref[0, 0, 4 * L - 1 + jj]
                * (par_ref[0, 0, 2 * L + jj] - 0.5))

    def angle7(base, bias, zt):
        th = bias + jnp.zeros_like(zt[0])
        for k in range(7):
            th = th + cz(base + k) * zt[k]
            if k > 0:
                th = th + cb(base + k - 1) * (zt[k - 1] * zt[k])
        return th

    def angle_c(zt):
        th = jnp.zeros_like(zt[0])
        for k in range(L - 21):
            th = th + cz(21 + k) * zt[k]
            if k > 0:
                th = th + cb(20 + k) * (zt[k - 1] * zt[k])
        return th

    c0 = _HALF_PI * sum(par_ref[0, 0, qq] for qq in range(L))
    return cz, cb, angle7, angle_c, c0


def _make_hi_cycle_kernel(L: int, q: int, MS: int, CS: int, width: int,
                          NSA: int, NSB: int,
                          split: bool = False):  # noqa: C901
    """One grid step = one trajectory's shard, ONE post-fold cycle with the
    fused A(t) partial sum (body = one iteration of
    ops/pallas_streamed_hi._make_hi_kernel's cycle loop, state via the
    per-trajectory ANY-aliased HBM pair — split per-plane pair at
    L_loc = 30, see hi_dma_helpers)."""
    R2 = 1 << (L - 21)
    NMC = 128 // MS
    NCC = _C // CS
    NB = NMC * NCC
    DA = NSA - 1
    DB = NSB - 1

    def kernel(u7r_ref, u7i_ref, u21r_ref, u21i_ref, par_ref, *rest):
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

        cz, cb, angle7, angle_c, c0 = _row_readers(par_ref, L)

        u7rt = u7r_ref[0].T
        u7it = u7i_ref[0].T

        def scaled_cols(ur, ui, th):
            dr = jnp.cos(th)
            di = jnp.sin(th)
            return ur * dr - ui * di, ur * di + ui * dr

        b1r, b1i = scaled_cols(u7rt, u7it, angle7(0, c0, z7o))
        b2r, b2i = scaled_cols(u7rt, u7it, angle7(7, 0.0, z7o))
        # bits-14..20 kick: row-diagonal fold on the left-dot OUTPUT rows
        b14r, b14i = scaled_cols(u7r_ref[0], u7i_ref[0], angle7(14, 0.0, z7c))
        th_c = angle_c(zr2)
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
            # z_q: column sign for q < 14, else a sign over the composite
            # (r2, m) row index r2*128 + (jm*MS + m) whose bit (q - 14)
            # is the probe bit (m = local bits 14..20, r2 = 21..L-1)
            if q < 14:
                zq = (1 - 2 * (((jc * CS + csl) >> q) & 1)).astype(
                    jnp.float32)
            else:
                r2v = jax.lax.broadcasted_iota(jnp.int32, (R2, 1, 1), 0)
                mv = jm * MS + jax.lax.broadcasted_iota(
                    jnp.int32, (1, MS, 1), 1)
                zq = (1 - 2 * (((r2v * 128 + mv) >> (q - 14)) & 1)).astype(
                    jnp.float32)
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

        arow = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
        alane = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
        apos = arow * 128 + alane
        a_out_ref[0] = jnp.where(apos == 0, acc[0], 0.0)

    return kernel


def _make_hi_inverse_cycle_kernel(L: int, MS: int, CS: int, width: int,
                                  NSA: int, NSB: int,
                                  split: bool = False):  # noqa: C901
    """PRE-fold cycle body on the r2-blocked layout: K.D with the SAME
    un-negated angles as the forward kernel's D.K — run inside the caller's
    once-conjugated frame (imaginary plane negated at the echo turnaround),
    in reverse time order, for the exact inverse-cycle product (RX kicks
    and diagonals are symmetric: (D K)^dag = conj(K D)). Pre placements for
    THIS layout: straddles s13 (z13 col x z14 m-row), s20 (z20 m-row x the
    block-index parity z21) and s6 at the TOP of pass A before any kick
    touching their bits; column/m/r2 diagonal terms fold into the dots'
    contracted axes. No measurement path: the sharded echo measures
    |amp|^2 z_q in XLA after the masked scan."""
    R2 = 1 << (L - 21)
    NMC = 128 // MS
    NCC = _C // CS
    NB = NMC * NCC
    DA = NSA - 1
    DB = NSB - 1

    def kernel(u7r_ref, u7i_ref, u21r_ref, u21i_ref, par_ref, *rest):
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
        r2c = jax.lax.broadcasted_iota(jnp.int32, (1, R2), 1)
        zr2c = [(1 - 2 * ((r2c >> k) & 1)).astype(jnp.float32)
                for k in range(L - 21)]

        loadA, storeA, loadB, storeB = hi_dma_helpers(
            split, st_refs, aslab, bslab, g, MS, CS, NSA, NSB, sems)

        cz, cb, angle7, angle_c, c0 = _row_readers(par_ref, L)

        u7rt = u7r_ref[0].T
        u7it = u7i_ref[0].T

        def scaled(ur, ui, th):
            dr = jnp.cos(th)
            di = jnp.sin(th)
            return ur * dr - ui * di, ur * di + ui * dr

        # pre-fold: angles on the contracted axes
        b1r, b1i = scaled(u7rt, u7it, angle7(0, c0, z7c))
        b2r, b2i = scaled(u7rt, u7it, angle7(7, 0.0, z7c))
        # m kick: contracted axis = the left-dot b-matrix COLUMNS
        b14r, b14i = scaled(u7r_ref[0], u7i_ref[0], angle7(14, 0.0, z7o))
        th_cp = angle_c(zr2c)  # (1, R2) contracted columns
        s20 = cb(20)
        s13 = cb(13)
        s6 = cb(6)

        # ---- pass A: pre straddles FIRST, then col kicks + m kick ----
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
            z21v = (1 - 2 * (i & 1)).astype(jnp.float32)
            mr, mi = _cmul(mr, mi, jnp.cos(s13),
                           (z13c * z14r) * jnp.sin(s13))
            mr, mi = _cmul(mr, mi, jnp.cos(s20),
                           (z20r * z21v) * jnp.sin(s20))
            mr, mi = _cmul(mr, mi, jnp.cos(s6), zz67 * jnp.sin(s6))
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
            p1 = _dot_f32(b14r, mr)
            p2 = _dot_f32(b14i, mi)
            p3 = _dot_f32(b14r + b14i, mr + mi)
            aslab[s, 0] = p1 - p2
            aslab[s, 1] = p3 - p1 - p2
            storeA(s, i).start()
            return _

        for d in range(min(DA, R2)):
            loadA(d % NSA, d).start()
        jax.lax.fori_loop(0, R2, a_body, None)
        for i in range(max(0, R2 - DA - 1), R2):
            storeA(i % NSA, i).wait()

        # ---- pass B: U21 kick, diag pre-folded on contracted columns ----
        dr = jnp.cos(th_cp)
        di = jnp.sin(th_cp)
        gr = u21r_ref[0] * dr - u21i_ref[0] * di
        gi = u21r_ref[0] * di + u21i_ref[0] * dr

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


# DMA window offsets wrap at 2^32 bytes (measured: the fused L=30
# streamed-hi state returned all zeros; its plane-1 base sits at exactly
# 2^32, while L=29 — just under — is healthy). Fused per-shard states are
# (n, 2, R2, 128, _C) single arrays, so (a) per-CALL batches are chunked
# to keep every window offset under 2^32 and (b) a fused L_loc = 30 state
# (one trajectory's plane 1 already AT 2^32) is rejected — it takes the
# SPLIT per-plane layout instead (state as a (re, im) pair of
# (n, R2, 128, _C) arrays, the ops/pallas_streamed_hi fix), which bounds
# every window offset by one plane's size and restores L_loc = 30 at one
# trajectory per call.
_DMA_OFFSET_LIMIT = 1 << 32


def _traj_chunk(L, split=False):
    # per-ARRAY bytes per trajectory: one plane (split) vs both (fused).
    # At L=30 split this is exactly 2^32 -> one trajectory per call, whose
    # highest window offset (R2-1)*2^23 stays under the wrap; the fused
    # layout at L=30 yields 0 (no valid batch — rejected by the wrappers).
    per_traj = 1 << (L + (2 if split else 3))
    return (_DMA_OFFSET_LIMIT // per_traj) if not split \
        else max(1, _DMA_OFFSET_LIMIT // per_traj)


def _hi_shapes(L, state, slots=None, width=None, default_slots=4):
    """Shared shape/geometry resolver for the per-shard hi kernels.

    ``state`` is either the fused (n, 2, TOP, _C)/(n, 2, R2, 128, _C)
    array or the SPLIT (re, im) pair of (n, TOP, _C)/(n, R2, 128, _C)
    per-plane arrays (L_loc = 30 and forced cross-checks).

    The general lab-frame module (ops/pallas_cycle_hi_general) reuses it
    with its own compact-row ``width`` and ``default_slots=2`` (its
    in-kernel group-matrix builds keep ~55M of temporaries live — a
    4-slot pass-B ring measured 568K past the 122M scoped-VMEM cap at
    L_loc=24), so the DMA-wrap chunking rule lives in ONE place."""
    R2 = 1 << (L - 21)
    M = 1 << L
    split = isinstance(state, (tuple, list))
    if split:
        for pl_ in state:
            if pl_.shape[1:] not in ((M // _C, _C), (R2, 128, _C)):
                raise ValueError(
                    f"split plane shape {pl_.shape} is not a (n, TOP, "
                    f"{_C}) or (n, {R2}, 128, {_C}) L={L} plane")
        n_traj = state[0].shape[0]
    else:
        n_traj = state.shape[0]
        if state.shape[1:] not in ((2, M // _C, _C), (2, R2, 128, _C)):
            raise ValueError(
                f"state shape {state.shape} is not a (n, 2, TOP, "
                f"{_C}) or (n, 2, {R2}, 128, {_C}) L={L} shard")
    MS, CS = _hi_geometry(L)
    if width is None:
        width = 128 if 5 * L - 2 <= 128 else 256
    NSA = min(2, R2)
    NSB = min(slots if slots is not None else default_slots,
              (128 // MS) * (_C // CS))
    return R2, n_traj, MS, CS, width, NSA, NSB


def hi_cycle_forward_apply(state, params, u7r, u7i, u21r, u21i, *, L, q,
                           interpret=False, slots=None):
    """Apply ONE factored Floquet cycle to a batch of shard-local states on
    the r2-blocked layout (22 <= L_loc <= 30; L_loc = 30 requires the
    SPLIT state — a fused state there crosses the 2^32 DMA-offset wrap).

    state: (n_traj, 2, TOP, 16384) or (n_traj, 2, R2, 128, 16384) f32
    planar (TOP = 2**(L-14) = 128*R2; flat input is reshaped — free), OR
    a SPLIT (re, im) pair of (n_traj, TOP, 16384)/(n_traj, R2, 128,
    16384) per-plane arrays (returned as the same pair);
    params: (n_traj, width) f32 compact cycle rows
    (pack_cycle_params_compact at L = L_loc, width = 256 for L_loc >= 27);
    u7r/u7i: (1, 128, 128), u21r/u21i: (1, R2, R2) planar RX kron factors
    (ops/pallas_streamed._rx_kron).

    Returns (state', a_partial (n_traj,)): the evolved states (same
    layout as the input) and the shard-local sum(z_q * |psi|^2) measured
    after the cycle (psum over 'amp' and the sigma sign are the caller's
    job — exact because z_q on any shard-local bit commutes with the
    caller's remaining global ops of the same cycle).
    """
    split = isinstance(state, (tuple, list))
    if not (22 <= L <= (30 if split else 29)):
        raise ValueError(
            "hi cycle kernel supports 22 <= L_loc <= 29 fused / 30 split "
            "(a fused L_loc = 30 state crosses the 2^32 DMA-offset "
            "window — pass the (re, im) per-plane pair)")
    if not (0 <= q < L):
        raise ValueError("hi cycle kernel requires shard-local probe q < L")
    R2, n_traj, MS, CS, width, NSA, NSB = _hi_shapes(L, state, slots)
    if split:
        state = tuple(s.reshape(n_traj, R2, 128, _C) for s in state)
    else:
        state = state.reshape(n_traj, 2, R2, 128, _C)
    params = params.reshape(n_traj, 1, width)
    nc = _traj_chunk(L, split)
    if n_traj > nc:
        # window offsets past 2^32 wrap: split the batch
        index = ((lambda st, i: tuple(s[i:i + nc] for s in st)) if split
                 else (lambda st, i: st[i:i + nc]))
        outs = [hi_cycle_forward_apply(
            index(state, i), params[i:i + nc], u7r, u7i, u21r, u21i, L=L,
            q=q, interpret=interpret, slots=slots)
            for i in range(0, n_traj, nc)]
        if split:
            return (tuple(jnp.concatenate([o[0][k] for o in outs])
                          for k in range(2)),
                    jnp.concatenate([o[1] for o in outs]))
        return (jnp.concatenate([o[0] for o in outs]),
                jnp.concatenate([o[1] for o in outs]))

    st_in, st_out, aliases, n_sems = hi_state_specs(split, 5, 1, NSA, NSB)
    out = pl.pallas_call(
        _make_hi_cycle_kernel(L, q, MS, CS, width, NSA, NSB, split),
        out_shape=(
            [jax.ShapeDtypeStruct((n_traj, 8, 128), jnp.float32)]
            + [jax.ShapeDtypeStruct(s.shape, jnp.float32)
               for s in (state if split else (state,))]),
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
            pl.BlockSpec((1, 1, width), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),  # cycle row
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
    )(u7r, u7i, u21r, u21i, params,
      *(state if split else (state,)))
    a_raw = out[0]
    state = tuple(out[1:]) if split else out[1]
    return state, a_raw[:, 0, 0]


def hi_cycle_inverse_apply(state, params, u7r, u7i, u21r, u21i, *, L,
                           interpret=False, slots=None):
    """Apply ONE conjugated-frame inverse Floquet cycle (K.D pre-fold — see
    _make_hi_inverse_cycle_kernel) to a batch of shard-local states on the
    r2-blocked layout. Same operands as hi_cycle_forward_apply with the
    SAME un-negated angles (split (re, im) pair accepted at L_loc <= 30);
    the caller negates the imaginary plane once at the echo turnaround.
    Returns the evolved states (input layout)."""
    split = isinstance(state, (tuple, list))
    if not (22 <= L <= (30 if split else 29)):
        raise ValueError(
            "hi cycle kernel supports 22 <= L_loc <= 29 fused / 30 split "
            "(see hi_cycle_forward_apply)")
    R2, n_traj, MS, CS, width, NSA, NSB = _hi_shapes(L, state, slots)
    if split:
        state = tuple(s.reshape(n_traj, R2, 128, _C) for s in state)
    else:
        state = state.reshape(n_traj, 2, R2, 128, _C)
    params = params.reshape(n_traj, 1, width)
    nc = _traj_chunk(L, split)
    if n_traj > nc:
        index = ((lambda st, i: tuple(s[i:i + nc] for s in st)) if split
                 else (lambda st, i: st[i:i + nc]))
        outs = [hi_cycle_inverse_apply(
            index(state, i), params[i:i + nc], u7r, u7i, u21r, u21i, L=L,
            interpret=interpret, slots=slots)
            for i in range(0, n_traj, nc)]
        if split:
            return tuple(jnp.concatenate([o[k] for o in outs])
                         for k in range(2))
        return jnp.concatenate(outs)

    st_in, st_out, aliases, n_sems = hi_state_specs(split, 5, 0, NSA, NSB)
    out = pl.pallas_call(
        _make_hi_inverse_cycle_kernel(L, MS, CS, width, NSA, NSB, split),
        out_shape=[jax.ShapeDtypeStruct(s.shape, jnp.float32)
                   for s in (state if split else (state,))],
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
            pl.BlockSpec((1, 1, width), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),  # cycle row
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
    )(u7r, u7i, u21r, u21i, params,
      *(state if split else (state,)))
    return tuple(out) if split else out[0]
