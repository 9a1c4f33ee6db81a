"""Per-cycle VMEM-resident Floquet kernel — the per-shard engine for the
amplitude-sharded path (docs/PERFORMANCE.md roadmap #4).

One pallas_call = ONE sigma-frame factored Floquet cycle on the SHARD-LOCAL
bits (17 <= L_loc <= 23): state streamed HBM -> VMEM scratch -> HBM through
an ANY-space aliased input/output pair (Mosaic has no HBM scratch), all
plane ops fused into the two blocked Karatsuba kick passes. The sharded
scan (parallel/sharded.py, local_engine="cycle_kernel") calls this once per
cycle; the global-qubit (shard-bit) kicks, their diagonal factors and the
boundary bond stay in XLA between calls (they are ppermute pair exchanges +
tiny per-shard factors — see _global_cycle_tail there).

Math = one iteration of ops/pallas_resident_blocked._make_blocked_kernel's
cycle loop (post-fold convention: kick, then this cycle's noise-Z signs and
the sigma-conjugated D0 folded into the kick dots as angle offsets), on the
LOCAL restriction: h[0:L_loc], phi[0:L_loc-1] and the low L_loc bits of
(zm_t, csum_t) ride the same compact 128-lane parameter row
(ops/pallas_noise.pack_cycle_params_compact at L=L_loc). Splitting the cycle
at the shard boundary is exact because every factor is separable per
qubit/bond: the local diagonal commutes with the global kicks that follow,
and the bond phi[L_loc-1] straddling the boundary is applied by the caller
AFTER its global kicks (it involves the local top bit, so it must follow
ALL kicks — as every diagonal does in the post-fold convention).

The A(t) partial sum is fused into pass 2 exactly like the blocked kernel.
Measuring BEFORE the caller's global ops of the same cycle is exact: Z_q
(q a shard-local bit: a column sign for q < 14, a TOP-row sign above)
commutes with every remaining op of the cycle
(shard-bit kicks and diagonals).

Physics/noise conventions mirror the reference simulation loop
(autocorr-delta-a-single-qiskit-fast.py:111-147) via core/sigma_evolve.py,
like every other kernel here; the distributed-hook parity target is the
reference's unused Lightning-MPI flag (dtc_qasm.py:57-58) — this kernel is
what makes the TPU-mesh replacement run at kernel rate per shard instead of
XLA-scan rate.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dtc_tpu.ops.pallas_resident import _C, _HALF_PI, _cmul, _dot_f32
from dtc_tpu.ops.pallas_resident_blocked import (blocked_block_sizes,
                                                 p2_pack_factor)


def _make_cycle_kernel(L: int, q: int, bt: int, cs: int,
                       P: int = 1):  # noqa: C901
    """One grid step = one trajectory's shard, ONE cycle, blocked plane ops.

    L here is the LOCAL bit count (shard size log2). Body identical to
    _make_blocked_kernel's per-cycle closure with T=1, except the state
    arrives via DMA from the ANY-space aliased pair instead of living in a
    persistent scratch across cycles. P > 1: pass-2 block-diagonal MXU
    packing (ops/pallas_resident_blocked.p2_pack_factor) — the utr/uti
    refs then hold the kron(I_P, U_top) expansion.
    """
    TOP = 1 << (L - 14)
    n_bt = TOP // bt
    n_cs = (_C // 2) // cs

    def kernel(u7r_ref, u7i_ref, utr_ref, uti_ref, par_ref, st_in_ref,
               a_out_ref, st_hbm, st_ref, sems):
        del st_in_ref  # aliased to st_hbm; all DMA through the output ref
        i = pl.program_id(0)
        pltpu.make_async_copy(st_hbm.at[i], st_ref, sems.at[0]).start()
        pltpu.make_async_copy(st_hbm.at[i], st_ref, sems.at[0]).wait()

        # loop-invariant tables (identical to the blocked kernel)
        l7 = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
        z7 = [(1 - 2 * ((l7 >> k) & 1)).astype(jnp.float32) for k in range(7)]
        lci = jax.lax.broadcasted_iota(jnp.int32, (1, _C), 1)
        zz67 = (1 - 2 * (((lci >> 6) ^ (lci >> 7)) & 1)).astype(jnp.float32)
        lcs = jax.lax.broadcasted_iota(jnp.int32, (1, cs), 1)
        hti = jax.lax.broadcasted_iota(jnp.int32, (TOP, 1), 0)
        zh = [(1 - 2 * ((hti >> k) & 1)).astype(jnp.float32)
              for k in range(L - 14)]

        u7rt = u7r_ref[0].T
        u7it = u7i_ref[0].T

        # compact row layout: n | sig | flip | h | phi at offsets
        # 0, L, 2L, 3L-1, 4L-1 (pack_cycle_params_compact at L_loc)
        def cz(qq):
            return (par_ref[0, 0, 3 * L - 1 + qq]
                    * (par_ref[0, 0, L + qq] - 0.5)
                    - _HALF_PI * par_ref[0, 0, qq])

        def cb(jj):
            return (par_ref[0, 0, 4 * L - 1 + jj]
                    * (par_ref[0, 0, 2 * L + jj] - 0.5))

        def seven_bit_angle(base, bias):
            th = jnp.full((1, 128), bias, jnp.float32)
            for k in range(7):
                th = th + cz(base + k) * z7[k]
                if k > 0:
                    th = th + cb(base + k - 1) * (z7[k - 1] * z7[k])
            return th

        def scaled(th):
            dr = jnp.cos(th)
            di = jnp.sin(th)
            br = u7rt * dr - u7it * di
            bi = u7rt * di + u7it * dr
            return br, bi, br + bi

        def kara_right(mr, mi, br, bi, bs):
            p1 = _dot_f32(mr, br)
            p2 = _dot_f32(mi, bi)
            p3 = _dot_f32(mr + mi, bs)
            return p1 - p2, p3 - p1 - p2

        c0 = _HALF_PI * sum(par_ref[0, 0, qq] for qq in range(L))
        blr, bli, bls = scaled(seven_bit_angle(0, c0))
        bmr, bmi, bms = scaled(seven_bit_angle(7, 0.0))
        s6 = cb(6)
        c6, s6z = jnp.cos(s6), zz67 * jnp.sin(s6)

        # ---- pass 1: bits 0..13 kicks + bond-6 straddle, per TOP block
        def p1_block(i, _):
            mr = st_ref[0, pl.ds(i * bt, bt), :].reshape(bt * 128, 128)
            mi = st_ref[1, pl.ds(i * bt, bt), :].reshape(bt * 128, 128)
            mr, mi = kara_right(mr, mi, blr, bli, bls)
            mr = jnp.swapaxes(mr.reshape(bt, 128, 128), 1, 2).reshape(
                bt * 128, 128)
            mi = jnp.swapaxes(mi.reshape(bt, 128, 128), 1, 2).reshape(
                bt * 128, 128)
            mr, mi = kara_right(mr, mi, bmr, bmi, bms)
            mr = jnp.swapaxes(mr.reshape(bt, 128, 128), 1, 2).reshape(
                bt, _C)
            mi = jnp.swapaxes(mi.reshape(bt, 128, 128), 1, 2).reshape(
                bt, _C)
            mr, mi = _cmul(mr, mi, c6, s6z)
            st_ref[0, pl.ds(i * bt, bt), :] = mr
            st_ref[1, pl.ds(i * bt, bt), :] = mi
            return _

        jax.lax.fori_loop(0, n_bt, p1_block, None)

        # ---- pass 2: top kick + high diag + bond-13 straddle + measure
        th_hi = jnp.zeros((TOP, 1), jnp.float32)
        for k in range(L - 14):
            th_hi = th_hi + cz(14 + k) * zh[k]
            if k > 0:
                th_hi = th_hi + cb(13 + k) * (zh[k - 1] * zh[k])
        s13z14 = cb(13) * zh[0]
        utr = utr_ref[0]
        uti = uti_ref[0]

        a_next = jnp.zeros((), jnp.float32)
        if P == 1:
            for half, sgn in ((0, 1.0), (1, -1.0)):
                th = th_hi + sgn * s13z14
                dr = jnp.cos(th)
                di = jnp.sin(th)
                btr = utr * dr - uti * di
                bti = utr * di + uti * dr
                bts = btr + bti
                base = half * (_C // 2)

                def p2_chunk(j, acc, btr=btr, bti=bti, bts=bts, base=base):
                    off = base + j * cs
                    hr = st_ref[0, :, pl.ds(off, cs)]
                    hi_ = st_ref[1, :, pl.ds(off, cs)]
                    q1 = _dot_f32(btr, hr)
                    q2 = _dot_f32(bti, hi_)
                    q3 = _dot_f32(bts, hr + hi_)
                    kr = q1 - q2
                    ki = q3 - q1 - q2
                    st_ref[0, :, pl.ds(off, cs)] = kr
                    st_ref[1, :, pl.ds(off, cs)] = ki
                    # z_q: column sign for q < 14, TOP-row sign
                    # (shard-local bits 14..L-1) above
                    if q < 14:
                        zq = (1 - 2 * (((lcs + off) >> q) & 1)).astype(
                            jnp.float32)
                    else:
                        zq = (1 - 2 * ((hti >> (q - 14)) & 1)).astype(
                            jnp.float32)
                    return acc + jnp.sum((kr * kr + ki * ki) * zq)

                a_next = jax.lax.fori_loop(0, n_cs, p2_chunk, a_next)
        else:
            # packed pass 2 (see ops/pallas_resident_blocked): one
            # block-diagonal dot covers P/2 chunks of EACH bond-13 half
            HB = P // 2
            thp = th_hi + s13z14
            thm = th_hi - s13z14
            th = jnp.concatenate([thp] * HB + [thm] * HB, axis=0)
            dr = jnp.cos(th)
            di = jnp.sin(th)
            btr = utr * dr - uti * di
            bti = utr * di + uti * dr
            bts = btr + bti
            if q >= 14:
                zq_row = (1 - 2 * ((hti >> (q - 14)) & 1)).astype(
                    jnp.float32)

            def p2_packed(j, acc):
                offs = [j * (HB * cs) + pi * cs for pi in range(HB)]
                offs = offs + [(_C // 2) + o for o in offs]
                hr = jnp.concatenate(
                    [st_ref[0, :, pl.ds(o, cs)] for o in offs], axis=0)
                hi_ = jnp.concatenate(
                    [st_ref[1, :, pl.ds(o, cs)] for o in offs], axis=0)
                q1 = _dot_f32(btr, hr)
                q2 = _dot_f32(bti, hi_)
                q3 = _dot_f32(bts, hr + hi_)
                kr = q1 - q2
                ki = q3 - q1 - q2
                for pi, o in enumerate(offs):
                    krp = kr[pi * TOP:(pi + 1) * TOP, :]
                    kip = ki[pi * TOP:(pi + 1) * TOP, :]
                    st_ref[0, :, pl.ds(o, cs)] = krp
                    st_ref[1, :, pl.ds(o, cs)] = kip
                    if q < 14:
                        zq = (1 - 2 * (((lcs + o) >> q) & 1)).astype(
                            jnp.float32)
                    else:
                        zq = zq_row
                    acc = acc + jnp.sum((krp * krp + kip * kip) * zq)
                return acc

            a_next = jax.lax.fori_loop(0, n_cs // HB, p2_packed, a_next)

        pltpu.make_async_copy(st_ref, st_hbm.at[i], sems.at[1]).start()
        pltpu.make_async_copy(st_ref, st_hbm.at[i], sems.at[1]).wait()

        arow = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
        alane = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
        apos = arow * 128 + alane
        a_out_ref[0] = jnp.where(apos == 0, a_next, 0.0)

    return kernel


def _make_inverse_kernel(L: int, bt: int, cs: int,
                         P: int = 1):  # noqa: C901
    """PRE-fold cycle body: applies K·D (diagonal THEN kicks) with the SAME
    compact-row angles as the forward kernel's D·K. Combined with one
    imaginary-plane negation at the echo turnaround this yields the exact
    inverse phase: RX kicks and diagonals are symmetric, so each
    (D_j K_j)^dag = conj(K_j D_j) and the whole inverse-cycle product is
    conj(K_1 D_1 ... K_t D_t) — run THIS kernel per cycle in reverse time
    order inside the conjugated frame and never conjugate back (|amp|^2
    observables are conjugation-invariant). Echo semantics per the
    reference (autocorr-delta-a-single-qiskit-fast.py:140-147).

    Pre-fold placement: low-bit diagonal terms scale the Karatsuba b-matrix
    ROWS (contracted/old index) instead of columns; the s6 AND s13 straddle
    bonds run at the top of pass 1 (before the bit-6/7 and bit-13 kicks;
    s13's z14 leg is the block-row parity); the pure high-bit diagonal
    pre-folds into pass 2's contracted axis, which is exact because it
    commutes with pass 1's low-bit kicks."""
    TOP = 1 << (L - 14)
    n_bt = TOP // bt
    n_cs = _C // cs

    def kernel(u7r_ref, u7i_ref, utr_ref, uti_ref, par_ref, st_in_ref,
               st_hbm, st_ref, sems):
        del st_in_ref
        i = pl.program_id(0)
        pltpu.make_async_copy(st_hbm.at[i], st_ref, sems.at[0]).start()
        pltpu.make_async_copy(st_hbm.at[i], st_ref, sems.at[0]).wait()

        l7c = jax.lax.broadcasted_iota(jnp.int32, (128, 1), 0)
        z7c = [(1 - 2 * ((l7c >> k) & 1)).astype(jnp.float32)
               for k in range(7)]
        lci = jax.lax.broadcasted_iota(jnp.int32, (1, _C), 1)
        zz67 = (1 - 2 * (((lci >> 6) ^ (lci >> 7)) & 1)).astype(jnp.float32)
        z13l = (1 - 2 * ((lci >> 13) & 1)).astype(jnp.float32)

        u7rt = u7r_ref[0].T
        u7it = u7i_ref[0].T

        def cz(qq):
            return (par_ref[0, 0, 3 * L - 1 + qq]
                    * (par_ref[0, 0, L + qq] - 0.5)
                    - _HALF_PI * par_ref[0, 0, qq])

        def cb(jj):
            return (par_ref[0, 0, 4 * L - 1 + jj]
                    * (par_ref[0, 0, 2 * L + jj] - 0.5))

        def seven_bit_angle_col(base, bias):
            th = jnp.full((128, 1), bias, jnp.float32)
            for k in range(7):
                th = th + cz(base + k) * z7c[k]
                if k > 0:
                    th = th + cb(base + k - 1) * (z7c[k - 1] * z7c[k])
            return th

        def scaled_rows(th):
            dr = jnp.cos(th)
            di = jnp.sin(th)
            br = u7rt * dr - u7it * di
            bi = u7rt * di + u7it * dr
            return br, bi, br + bi

        def kara_right(mr, mi, br, bi, bs):
            p1 = _dot_f32(mr, br)
            p2 = _dot_f32(mi, bi)
            p3 = _dot_f32(mr + mi, bs)
            return p1 - p2, p3 - p1 - p2

        c0 = _HALF_PI * sum(par_ref[0, 0, qq] for qq in range(L))
        blr, bli, bls = scaled_rows(seven_bit_angle_col(0, c0))
        bmr, bmi, bms = scaled_rows(seven_bit_angle_col(7, 0.0))
        s6 = cb(6)
        c6, s6z = jnp.cos(s6), zz67 * jnp.sin(s6)
        s13 = cb(13)
        c13 = jnp.cos(s13)

        # ---- pass 1 (pre-fold): straddles s13, s6 first, then the kicks
        def p1_block(i, _):
            mr = st_ref[0, pl.ds(i * bt, bt), :]
            mi = st_ref[1, pl.ds(i * bt, bt), :]
            rp = jax.lax.broadcasted_iota(jnp.int32, (bt, 1), 0) + i * bt
            z14r = (1 - 2 * (rp & 1)).astype(jnp.float32)
            mr, mi = _cmul(mr, mi, c13, (z14r * z13l) * jnp.sin(s13))
            mr, mi = _cmul(mr, mi, c6, s6z)
            mr = mr.reshape(bt * 128, 128)
            mi = mi.reshape(bt * 128, 128)
            mr, mi = kara_right(mr, mi, blr, bli, bls)
            mr = jnp.swapaxes(mr.reshape(bt, 128, 128), 1, 2).reshape(
                bt * 128, 128)
            mi = jnp.swapaxes(mi.reshape(bt, 128, 128), 1, 2).reshape(
                bt * 128, 128)
            mr, mi = kara_right(mr, mi, bmr, bmi, bms)
            mr = jnp.swapaxes(mr.reshape(bt, 128, 128), 1, 2).reshape(
                bt, _C)
            mi = jnp.swapaxes(mi.reshape(bt, 128, 128), 1, 2).reshape(
                bt, _C)
            st_ref[0, pl.ds(i * bt, bt), :] = mr
            st_ref[1, pl.ds(i * bt, bt), :] = mi
            return _

        jax.lax.fori_loop(0, n_bt, p1_block, None)

        # ---- pass 2 (pre-fold): high diag scales the contracted columns.
        # No bond-13 half split here (s13 ran in pass 1), so the packed
        # variant's P diagonal blocks are IDENTICAL — the (1, P*TOP) iota
        # tiles the column angles for free (only bits 0..L-15 are read)
        PT = P * TOP
        hti_pt = jax.lax.broadcasted_iota(jnp.int32, (1, PT), 1)
        zh_pt = [(1 - 2 * ((hti_pt >> k) & 1)).astype(jnp.float32)
                 for k in range(L - 14)]
        th_hi = jnp.zeros((1, PT), jnp.float32)
        for k in range(L - 14):
            th_hi = th_hi + cz(14 + k) * zh_pt[k]
            if k > 0:
                th_hi = th_hi + cb(13 + k) * (zh_pt[k - 1] * zh_pt[k])
        dr = jnp.cos(th_hi)
        di = jnp.sin(th_hi)
        utr = utr_ref[0]
        uti = uti_ref[0]
        btr = utr * dr - uti * di
        bti = utr * di + uti * dr
        bts = btr + bti

        if P == 1:
            def p2_chunk(j, _):
                off = j * cs
                hr = st_ref[0, :, pl.ds(off, cs)]
                hi_ = st_ref[1, :, pl.ds(off, cs)]
                q1 = _dot_f32(btr, hr)
                q2 = _dot_f32(bti, hi_)
                q3 = _dot_f32(bts, hr + hi_)
                st_ref[0, :, pl.ds(off, cs)] = q1 - q2
                st_ref[1, :, pl.ds(off, cs)] = q3 - q1 - q2
                return _

            jax.lax.fori_loop(0, n_cs, p2_chunk, None)
        else:
            def p2_packed(j, _):
                offs = [j * (P * cs) + pi * cs for pi in range(P)]
                hr = jnp.concatenate(
                    [st_ref[0, :, pl.ds(o, cs)] for o in offs], axis=0)
                hi_ = jnp.concatenate(
                    [st_ref[1, :, pl.ds(o, cs)] for o in offs], axis=0)
                q1 = _dot_f32(btr, hr)
                q2 = _dot_f32(bti, hi_)
                q3 = _dot_f32(bts, hr + hi_)
                kr = q1 - q2
                ki = q3 - q1 - q2
                for pi, o in enumerate(offs):
                    st_ref[0, :, pl.ds(o, cs)] = kr[
                        pi * TOP:(pi + 1) * TOP, :]
                    st_ref[1, :, pl.ds(o, cs)] = ki[
                        pi * TOP:(pi + 1) * TOP, :]
                return _

            jax.lax.fori_loop(0, n_cs // P, p2_packed, None)

        pltpu.make_async_copy(st_ref, st_hbm.at[i], sems.at[1]).start()
        pltpu.make_async_copy(st_ref, st_hbm.at[i], sems.at[1]).wait()

    return kernel


def cycle_inverse_apply(state, params, u7r, u7i, utr, uti, *, L,
                        interpret=False):
    """Apply ONE conjugated-frame inverse Floquet cycle (K·D, pre-fold —
    see _make_inverse_kernel) to a batch of shard-local planar states.
    Same operands as cycle_forward_apply with the SAME un-negated angles;
    the caller negates the imaginary plane once at the echo turnaround.
    Returns the evolved states (no fused measurement — echo measures once
    at the end of the inverse phase)."""
    if not (17 <= L <= 23):
        raise ValueError("cycle kernel supports 17 <= L_loc <= 23")
    TOP = 1 << (L - 14)
    n_traj = state.shape[0]
    if state.shape != (n_traj, 2, TOP, _C):
        raise ValueError(f"state shape {state.shape} != "
                         f"{(n_traj, 2, TOP, _C)}")
    bt, cs = blocked_block_sizes(TOP)
    P = p2_pack_factor(TOP, cs)
    if P > 1:
        eyeP = jnp.eye(P, dtype=jnp.float32)
        utr = jax.vmap(lambda m: jnp.kron(eyeP, m))(utr)
        uti = jax.vmap(lambda m: jnp.kron(eyeP, m))(uti)
    PT = P * TOP
    params = params.reshape(n_traj, 1, 128)

    (state,) = pl.pallas_call(
        _make_inverse_kernel(L, bt, cs, P),
        out_shape=[jax.ShapeDtypeStruct(state.shape, jnp.float32)],
        grid=(n_traj,),
        in_specs=[
            pl.BlockSpec((1, 128, 128), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),  # u7r
            pl.BlockSpec((1, 128, 128), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),  # u7i
            pl.BlockSpec((1, PT, PT), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),  # utr
            pl.BlockSpec((1, PT, PT), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),  # uti
            pl.BlockSpec((1, 1, 128), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),  # cycle row
            pl.BlockSpec(memory_space=pl.ANY),      # state (aliased)
        ],
        out_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        input_output_aliases={5: 0},
        scratch_shapes=[
            pltpu.VMEM((2, TOP, _C), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
        interpret=interpret,
    )(u7r, u7i, utr, uti, params, state)
    return state


def cycle_forward_apply(state, params, u7r, u7i, utr, uti, *, L, q,
                        interpret=False):
    """Apply ONE factored Floquet cycle to a batch of shard-local planar
    states.

    state: (n_traj, 2, TOP, 16384) f32 planar (TOP = 2**(L-14));
    params: (n_traj, 128) f32 compact cycle rows (pack_cycle_params_compact
    at L = L_loc with the LOCAL slices of this cycle's zm/csum words);
    u7r/u7i: (1, 128, 128), utr/uti: (1, TOP, TOP) planar kick matrices
    (ops/pallas_resident._kick_matrices, constant schedule).

    Returns (state', a_partial (n_traj,)): the evolved states and the
    shard-local sum(z_q * |psi|^2) measured after the cycle (psum over the
    'amp' axis and the sigma sign are the caller's job).
    """
    if not (17 <= L <= 23):
        raise ValueError("cycle kernel supports 17 <= L_loc <= 23")
    if not (0 <= q < L):
        raise ValueError("cycle kernel requires shard-local probe q < L")
    TOP = 1 << (L - 14)
    n_traj = state.shape[0]
    if state.shape != (n_traj, 2, TOP, _C):
        raise ValueError(f"state shape {state.shape} != "
                         f"{(n_traj, 2, TOP, _C)}")
    bt, cs = blocked_block_sizes(TOP)
    P = p2_pack_factor(TOP, cs)
    if P > 1:
        eyeP = jnp.eye(P, dtype=jnp.float32)
        utr = jax.vmap(lambda m: jnp.kron(eyeP, m))(utr)
        uti = jax.vmap(lambda m: jnp.kron(eyeP, m))(uti)
    PT = P * TOP
    params = params.reshape(n_traj, 1, 128)

    a_raw, state = pl.pallas_call(
        _make_cycle_kernel(L, q, bt, cs, P),
        out_shape=[
            jax.ShapeDtypeStruct((n_traj, 8, 128), jnp.float32),
            jax.ShapeDtypeStruct(state.shape, jnp.float32),
        ],
        grid=(n_traj,),
        in_specs=[
            pl.BlockSpec((1, 128, 128), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),  # u7r
            pl.BlockSpec((1, 128, 128), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),  # u7i
            pl.BlockSpec((1, PT, PT), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),  # utr
            pl.BlockSpec((1, PT, PT), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),  # uti
            pl.BlockSpec((1, 1, 128), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),  # cycle row
            pl.BlockSpec(memory_space=pl.ANY),      # state (aliased)
        ],
        out_specs=[
            pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),      # state (aliased)
        ],
        input_output_aliases={5: 1},
        scratch_shapes=[
            pltpu.VMEM((2, TOP, _C), jnp.float32),  # shard state
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
        interpret=interpret,
    )(u7r, u7i, utr, uti, params, state)
    return state, a_raw[:, 0, 0]


def _make_general_cycle_kernel(L: int, K: int, q: int, bt: int,
                               cs: int, P: int = 1):  # noqa: C901
    """LAB-frame per-shard cycle kernel: one grid step = one trajectory's
    shard, ONE cycle = K statically-unrolled slot steps of
    pallas_resident_general._make_general_kernel_blocked's body (in-kernel
    built group matrices from the slot u8 scalars, X-mask row folds,
    postdiag angle folds), state via DMA through the ANY-aliased pair.

    Hybrid frame: local bits run the lab frame (no sigma corrections, no
    measurement sign), while the CALLER keeps an XOR frame on the SHARD-ID
    bits only — a sampled X on a global qubit costs no collective; the
    caller's global slot kicks are sigma-conjugated per trajectory and the
    cycle's global diagonal factors ride _tail_phase_angles with the sig
    word masked to shard bits. Covers every polarization family + per-cycle
    schedules on the sharded path (the reference's circular/time-dependent
    drives, autocorr-delta-a-single-qiskit-fast-circular-polarization.py:
    110-142, previously fell to the XLA sharded engine — VERDICT r2
    missing #5). Measurement (A after the final slot) is fused into pass 2
    exactly like the x cycle kernel — exact because z_q (any shard-local
    bit) commutes
    with the caller's remaining global ops of the same cycle."""
    from dtc_tpu.ops.pallas_resident_general import _LANE_U8, _tile_helpers

    TOP = 1 << (L - 14)
    n_bt = TOP // bt
    n_cs = (_C // 2) // cs
    FO = 4 * L - 1

    def kernel(tiles_ref, st_in_ref, a_out_ref, st_hbm, st_ref, sems):
        del st_in_ref
        i = pl.program_id(0)
        pltpu.make_async_copy(st_hbm.at[i], st_ref, sems.at[0]).start()
        pltpu.make_async_copy(st_hbm.at[i], st_ref, sems.at[0]).wait()

        lci = jax.lax.broadcasted_iota(jnp.int32, (1, _C), 1)
        l7r = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
        z7o = [(1 - 2 * ((l7r >> k) & 1)).astype(jnp.float32)
               for k in range(7)]
        zz67 = (1 - 2 * (((lci >> 6) ^ (lci >> 7)) & 1)).astype(jnp.float32)
        lcs = jax.lax.broadcasted_iota(jnp.int32, (1, cs), 1)
        zz67c = (1 - 2 * (((lcs >> 6) ^ (lcs >> 7)) & 1)).astype(jnp.float32)
        hti = jax.lax.broadcasted_iota(jnp.int32, (TOP, 1), 0)
        zho = [(1 - 2 * ((hti >> k) & 1)).astype(jnp.float32)
               for k in range(L - 14)]

        czc, cbc, angle7, angle_hi, build_group = _tile_helpers(tiles_ref, L)

        def _cmul2(ar, ai, br, bi):
            return ar * br - ai * bi, ar * bi + ai * br

        def kara_right(xr, xi, br, bi, bs):
            p1 = _dot_f32(xr, br)
            p2 = _dot_f32(xi, bi)
            p3 = _dot_f32(xr + xi, bs)
            return p1 - p2, p3 - p1 - p2

        a_next = jnp.zeros((), jnp.float32)
        for si in range(K):
            u8 = [tiles_ref[0, si, FO + _LANE_U8 + j] for j in range(8)]

            def scaled_group(nbits, off, th, si=si, u8=u8):
                gr, gi = build_group(si, u8, nbits, off,
                                     transposed=(off < 14))
                return _cmul2(gr, gi, jnp.cos(th), jnp.sin(th))

            c0q = _HALF_PI * sum(tiles_ref[0, si, qq] for qq in range(L))
            blr, bli = scaled_group(7, 0, angle7(si, 0, c0q, z7o))
            bls = blr + bli
            bmr, bmi = scaled_group(7, 7, angle7(si, 7, 0.0, z7o))
            bms = bmr + bmi

            def p1_block(ib, _, blr=blr, bli=bli, bls=bls, bmr=bmr,
                         bmi=bmi, bms=bms):
                mr = st_ref[0, pl.ds(ib * bt, bt), :].reshape(bt * 128, 128)
                mi = st_ref[1, pl.ds(ib * bt, bt), :].reshape(bt * 128, 128)
                mr, mi = kara_right(mr, mi, blr, bli, bls)
                mr = jnp.swapaxes(mr.reshape(bt, 128, 128), 1, 2).reshape(
                    bt * 128, 128)
                mi = jnp.swapaxes(mi.reshape(bt, 128, 128), 1, 2).reshape(
                    bt * 128, 128)
                mr, mi = kara_right(mr, mi, bmr, bmi, bms)
                st_ref[0, pl.ds(ib * bt, bt), :] = jnp.swapaxes(
                    mr.reshape(bt, 128, 128), 1, 2).reshape(bt, _C)
                st_ref[1, pl.ds(ib * bt, bt), :] = jnp.swapaxes(
                    mi.reshape(bt, 128, 128), 1, 2).reshape(bt, _C)
                return _

            jax.lax.fori_loop(0, n_bt, p1_block, None)

            s13q = cbc(si, 13)
            s6q = cbc(si, 6)
            c6q = jnp.cos(s6q)
            s6qz = zz67c * jnp.sin(s6q)
            measuring = si == K - 1
            if P == 1:
                utr, uti = build_group(si, u8, L - 14, 14, transposed=False)
                b_hi = angle_hi(si, zho)
                for half, sgn in ((0, 1.0), (1, -1.0)):
                    th = b_hi + sgn * s13q * zho[0]
                    dr = jnp.cos(th)
                    di = jnp.sin(th)
                    htr, hti_ = _cmul2(utr, uti, dr, di)
                    hts = htr + hti_
                    base = half * (_C // 2)

                    def p2_chunk(j, acc, htr=htr, hti_=hti_, hts=hts,
                                 base=base, c6q=c6q, s6qz=s6qz,
                                 measuring=measuring):
                        off = base + j * cs
                        hr = st_ref[0, :, pl.ds(off, cs)]
                        hi2 = st_ref[1, :, pl.ds(off, cs)]
                        q1 = _dot_f32(htr, hr)
                        q2 = _dot_f32(hti_, hi2)
                        q3 = _dot_f32(hts, hr + hi2)
                        kr = q1 - q2
                        ki = q3 - q1 - q2
                        kr, ki = _cmul2(kr, ki, c6q, s6qz)
                        st_ref[0, :, pl.ds(off, cs)] = kr
                        st_ref[1, :, pl.ds(off, cs)] = ki
                        if not measuring:
                            return acc
                        # z_q: column sign for q < 14, TOP-row sign above
                        if q < 14:
                            zqc = (1 - 2 * (((lcs + off) >> q) & 1)).astype(
                                jnp.float32)
                        else:
                            zqc = (1 - 2 * ((hti >> (q - 14)) & 1)).astype(
                                jnp.float32)
                        return acc + jnp.sum((kr * kr + ki * ki) * zqc)

                    a_next = jax.lax.fori_loop(0, n_cs, p2_chunk, a_next)
            else:
                # packed pass 2 (ops/pallas_resident_blocked.p2_pack_factor):
                # kron(I_P, G_top) built in-kernel, half sign from the
                # block-index bit, PT-sized iotas tile the angle rows free
                HB = P // 2
                PT = P * TOP
                utr, uti = build_group(si, u8, L - 14, 14,
                                       transposed=False, pad_blocks=P)
                hti_pt = jax.lax.broadcasted_iota(jnp.int32, (PT, 1), 0)
                zho_pt = [(1 - 2 * ((hti_pt >> k) & 1)).astype(jnp.float32)
                          for k in range(L - 14)]
                sgn_pt = (1 - 2 * ((hti_pt >> (L - 14 + P.bit_length() - 2))
                                   & 1)).astype(jnp.float32)
                th = angle_hi(si, zho_pt) + sgn_pt * s13q * zho_pt[0]
                dr = jnp.cos(th)
                di = jnp.sin(th)
                htr, hti_ = _cmul2(utr, uti, dr, di)
                hts = htr + hti_
                if q >= 14:
                    zq_row = (1 - 2 * ((hti >> (q - 14)) & 1)).astype(
                        jnp.float32)

                def p2_packed(j, acc, htr=htr, hti_=hti_, hts=hts,
                              c6q=c6q, s6qz=s6qz, measuring=measuring):
                    offs = [j * (HB * cs) + pi * cs for pi in range(HB)]
                    offs = offs + [(_C // 2) + o for o in offs]
                    hr = jnp.concatenate(
                        [st_ref[0, :, pl.ds(o, cs)] for o in offs], axis=0)
                    hi2 = jnp.concatenate(
                        [st_ref[1, :, pl.ds(o, cs)] for o in offs], axis=0)
                    q1 = _dot_f32(htr, hr)
                    q2 = _dot_f32(hti_, hi2)
                    q3 = _dot_f32(hts, hr + hi2)
                    kr = q1 - q2
                    ki = q3 - q1 - q2
                    kr, ki = _cmul2(kr, ki, c6q, s6qz)
                    for pi, o in enumerate(offs):
                        krp = kr[pi * TOP:(pi + 1) * TOP, :]
                        kip = ki[pi * TOP:(pi + 1) * TOP, :]
                        st_ref[0, :, pl.ds(o, cs)] = krp
                        st_ref[1, :, pl.ds(o, cs)] = kip
                        if measuring:
                            if q < 14:
                                zqc = (1 - 2 * (((lcs + o) >> q) & 1)
                                       ).astype(jnp.float32)
                            else:
                                zqc = zq_row
                            acc = acc + jnp.sum(
                                (krp * krp + kip * kip) * zqc)
                    return acc

                a_next = jax.lax.fori_loop(0, n_cs // HB, p2_packed, a_next)

        pltpu.make_async_copy(st_ref, st_hbm.at[i], sems.at[1]).start()
        pltpu.make_async_copy(st_ref, st_hbm.at[i], sems.at[1]).wait()

        arow = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
        alane = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
        apos = arow * 128 + alane
        a_out_ref[0] = jnp.where(apos == 0, a_next, 0.0)

    return kernel


def general_cycle_forward_apply(state, tiles, *, L, K, q, interpret=False):
    """Apply ONE lab-frame Floquet cycle (K kick slots with their noise
    events and the folded local diagonal) to a batch of shard-local planar
    states.

    state: (n_traj, 2, TOP, 16384) f32 planar; tiles: (n_traj, K, 128)
    compact general step rows at L = L_loc (layout of
    pallas_resident_general: n | x-mask | h | phi | flags+u8; h/phi rows
    zeroed on non-final slots). Returns (state', a_partial (n_traj,)).
    """
    if not (17 <= L <= 23):
        raise ValueError("general cycle kernel supports 17 <= L_loc <= 23")
    if not (0 <= q < L):
        raise ValueError(
            "general cycle kernel requires shard-local probe q < L")
    TOP = 1 << (L - 14)
    n_traj = state.shape[0]
    if state.shape != (n_traj, 2, TOP, _C):
        raise ValueError(f"state shape {state.shape} != "
                         f"{(n_traj, 2, TOP, _C)}")
    bt, cs = blocked_block_sizes(TOP)
    tiles = tiles.reshape(n_traj, K, 128)

    a_raw, state = pl.pallas_call(
        _make_general_cycle_kernel(L, K, q, bt, cs,
                                   p2_pack_factor(TOP, cs)),
        out_shape=[
            jax.ShapeDtypeStruct((n_traj, 8, 128), jnp.float32),
            jax.ShapeDtypeStruct(state.shape, jnp.float32),
        ],
        grid=(n_traj,),
        in_specs=[
            pl.BlockSpec((1, K, 128), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),  # cycle tiles
            pl.BlockSpec(memory_space=pl.ANY),      # state (aliased)
        ],
        out_specs=[
            pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),      # state (aliased)
        ],
        input_output_aliases={1: 1},
        scratch_shapes=[
            pltpu.VMEM((2, TOP, _C), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
        interpret=interpret,
    )(tiles, state)
    return state, a_raw[:, 0, 0]


def _make_general_inverse_cycle_kernel(L: int, K: int, bt: int,
                                       cs: int, P: int = 1):  # noqa: C901
    """LAB-frame per-shard INVERSE cycle kernel: one grid step = one
    trajectory's shard, ONE daggered cycle = K slot steps of the general
    ECHO body of pallas_resident_general._make_general_kernel_blocked
    (TPS=2: each slot carries a (pre, post) compact-row pair), state via
    DMA through the ANY-aliased pair.

    No conjugation trick (Y-containing slot kicks are not symmetric):
    the CALLER builds the pre/post rows exactly like
    general_echo_batch.tiles_one's inverse steps — daggered slot
    unitaries in reversed slot order (slot_u8(..., inverse=True) of the
    cycle's slot K-1-j at processed index j), D0^dagger lead (negated
    h/phi) on the first slot's pre row, the slot's X-mask on the pre row
    and its noise-Z signs on the post row. Echo semantics per the
    reference (autocorr-delta-a-single-qiskit-fast.py:140-147; reversed
    per-cycle schedules ...-circular-polarization.py:164-172).

    No measurement path: the sharded echo measures |amp|^2 z_q in XLA
    after the full masked scan (lab-frame local bits -> no sigma sign)."""
    from dtc_tpu.ops.pallas_resident_general import _LANE_U8, _tile_helpers

    TOP = 1 << (L - 14)
    n_bt = TOP // bt
    n_cs = (_C // 2) // cs
    FO = 4 * L - 1

    def kernel(tiles_ref, st_in_ref, st_hbm, st_ref, sems):
        del st_in_ref
        i = pl.program_id(0)
        pltpu.make_async_copy(st_hbm.at[i], st_ref, sems.at[0]).start()
        pltpu.make_async_copy(st_hbm.at[i], st_ref, sems.at[0]).wait()

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

        czc, cbc, angle7, angle_hi, build_group = _tile_helpers(tiles_ref, L)

        def _cmul2(ar, ai, br, bi):
            return ar * br - ai * bi, ar * bi + ai * br

        def kara_right(xr, xi, br, bi, bs):
            p1 = _dot_f32(xr, br)
            p2 = _dot_f32(xi, bi)
            p3 = _dot_f32(xr + xi, bs)
            return p1 - p2, p3 - p1 - p2

        for si in range(K):
            kt = 2 * si
            post = 2 * si + 1
            u8 = [tiles_ref[0, kt, FO + _LANE_U8 + j] for j in range(8)]

            def scaled_group(nbits, off, th, kt=kt, u8=u8):
                gr, gi = build_group(kt, u8, nbits, off,
                                     transposed=(off < 14))
                return _cmul2(gr, gi, jnp.cos(th), jnp.sin(th))

            c0q = _HALF_PI * sum(tiles_ref[0, post, qq] for qq in range(L))
            c0p = _HALF_PI * sum(tiles_ref[0, kt, qq] for qq in range(L))
            th_lo = (angle7(post, 0, c0q, z7o) + angle7(kt, 0, c0p, z7i))
            th_mi = (angle7(post, 7, 0.0, z7o) + angle7(kt, 7, 0.0, z7i))
            blr, bli = scaled_group(7, 0, th_lo)
            bls = blr + bli
            bmr, bmi = scaled_group(7, 7, th_mi)
            bms = bmr + bmi
            s6p = cbc(kt, 6)
            c6p, s6pz = jnp.cos(s6p), zz67 * jnp.sin(s6p)
            s13p = cbc(kt, 13)

            # pass 1: pre straddles + bits 0..13 kicks, per TOP block
            def p1_block(ib, _, blr=blr, bli=bli, bls=bls, bmr=bmr,
                         bmi=bmi, bms=bms, c6p=c6p, s6pz=s6pz, s13p=s13p):
                mr = st_ref[0, pl.ds(ib * bt, bt), :]
                mi = st_ref[1, pl.ds(ib * bt, bt), :]
                mr, mi = _cmul(mr, mi, c6p, s6pz)
                z14b = (1 - 2 * ((hbt + ib * bt) & 1)).astype(jnp.float32)
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
                st_ref[0, pl.ds(ib * bt, bt), :] = jnp.swapaxes(
                    mr.reshape(bt, 128, 128), 1, 2).reshape(bt, _C)
                st_ref[1, pl.ds(ib * bt, bt), :] = jnp.swapaxes(
                    mi.reshape(bt, 128, 128), 1, 2).reshape(bt, _C)
                return _

            jax.lax.fori_loop(0, n_bt, p1_block, None)

            # pass 2: top kick (pre + post angle folds) + post straddles
            s13q = cbc(post, 13)
            s6q = cbc(post, 6)
            c6q = jnp.cos(s6q)
            s6qz = zz67c * jnp.sin(s6q)
            if P == 1:
                utr, uti = build_group(kt, u8, L - 14, 14, transposed=False)
                th_hi = angle_hi(post, zho) + angle_hi(kt, zhi)
                for half, sgn in ((0, 1.0), (1, -1.0)):
                    th = th_hi + sgn * s13q * zho[0]
                    dr = jnp.cos(th)
                    di = jnp.sin(th)
                    htr, hti_ = _cmul2(utr, uti, dr, di)
                    hts = htr + hti_
                    base = half * (_C // 2)

                    def p2_chunk(j, _, htr=htr, hti_=hti_, hts=hts,
                                 base=base, c6q=c6q, s6qz=s6qz):
                        off = base + j * cs
                        hr = st_ref[0, :, pl.ds(off, cs)]
                        hi2 = st_ref[1, :, pl.ds(off, cs)]
                        q1 = _dot_f32(htr, hr)
                        q2 = _dot_f32(hti_, hi2)
                        q3 = _dot_f32(hts, hr + hi2)
                        kr = q1 - q2
                        ki = q3 - q1 - q2
                        kr, ki = _cmul2(kr, ki, c6q, s6qz)
                        st_ref[0, :, pl.ds(off, cs)] = kr
                        st_ref[1, :, pl.ds(off, cs)] = ki
                        return _

                    jax.lax.fori_loop(0, n_cs, p2_chunk, None)
            else:
                # packed (ops/pallas_resident_blocked.p2_pack_factor):
                # rows carry the post angles + the block half sign, the
                # pre angles tile along the packed column axis
                HB = P // 2
                PT = P * TOP
                utr, uti = build_group(kt, u8, L - 14, 14,
                                       transposed=False, pad_blocks=P)
                hti_pt = jax.lax.broadcasted_iota(jnp.int32, (PT, 1), 0)
                zho_pt = [(1 - 2 * ((hti_pt >> k) & 1)).astype(jnp.float32)
                          for k in range(L - 14)]
                htc_pt = jax.lax.broadcasted_iota(jnp.int32, (1, PT), 1)
                zhi_pt = [(1 - 2 * ((htc_pt >> k) & 1)).astype(jnp.float32)
                          for k in range(L - 14)]
                sgn_pt = (1 - 2 * ((hti_pt >> (L - 14 + P.bit_length() - 2))
                                   & 1)).astype(jnp.float32)
                th = (angle_hi(post, zho_pt) + angle_hi(kt, zhi_pt)
                      + sgn_pt * s13q * zho_pt[0])
                dr = jnp.cos(th)
                di = jnp.sin(th)
                htr, hti_ = _cmul2(utr, uti, dr, di)
                hts = htr + hti_

                def p2_packed(j, _, htr=htr, hti_=hti_, hts=hts,
                              c6q=c6q, s6qz=s6qz):
                    offs = [j * (HB * cs) + pi * cs for pi in range(HB)]
                    offs = offs + [(_C // 2) + o for o in offs]
                    hr = jnp.concatenate(
                        [st_ref[0, :, pl.ds(o, cs)] for o in offs], axis=0)
                    hi2 = jnp.concatenate(
                        [st_ref[1, :, pl.ds(o, cs)] for o in offs], axis=0)
                    q1 = _dot_f32(htr, hr)
                    q2 = _dot_f32(hti_, hi2)
                    q3 = _dot_f32(hts, hr + hi2)
                    kr = q1 - q2
                    ki = q3 - q1 - q2
                    kr, ki = _cmul2(kr, ki, c6q, s6qz)
                    for pi, o in enumerate(offs):
                        st_ref[0, :, pl.ds(o, cs)] = kr[
                            pi * TOP:(pi + 1) * TOP, :]
                        st_ref[1, :, pl.ds(o, cs)] = ki[
                            pi * TOP:(pi + 1) * TOP, :]
                    return _

                jax.lax.fori_loop(0, n_cs // HB, p2_packed, None)

        pltpu.make_async_copy(st_ref, st_hbm.at[i], sems.at[1]).start()
        pltpu.make_async_copy(st_ref, st_hbm.at[i], sems.at[1]).wait()

    return kernel


def general_cycle_inverse_apply(state, tiles, *, L, K, interpret=False):
    """Apply ONE lab-frame DAGGERED Floquet cycle to a batch of shard-local
    planar states.

    state: (n_traj, 2, TOP, 16384) f32 planar; tiles: (n_traj, K, 2, 128)
    per-slot (pre, post) compact general echo rows (layout of
    general_echo_batch.tiles_one's inverse steps). Returns state'.
    """
    if not (17 <= L <= 23):
        raise ValueError("general cycle kernel supports 17 <= L_loc <= 23")
    TOP = 1 << (L - 14)
    n_traj = state.shape[0]
    if state.shape != (n_traj, 2, TOP, _C):
        raise ValueError(f"state shape {state.shape} != "
                         f"{(n_traj, 2, TOP, _C)}")
    bt, cs = blocked_block_sizes(TOP)
    tiles = tiles.reshape(n_traj, 2 * K, 128)

    state = pl.pallas_call(
        _make_general_inverse_cycle_kernel(L, K, bt, cs,
                                   p2_pack_factor(TOP, cs)),
        out_shape=jax.ShapeDtypeStruct(state.shape, jnp.float32),
        grid=(n_traj,),
        in_specs=[
            pl.BlockSpec((1, 2 * K, 128), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),  # (pre, post) rows
            pl.BlockSpec(memory_space=pl.ANY),      # state (aliased)
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        input_output_aliases={1: 0},
        scratch_shapes=[
            pltpu.VMEM((2, TOP, _C), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
        interpret=interpret,
    )(tiles, state)
    return state
