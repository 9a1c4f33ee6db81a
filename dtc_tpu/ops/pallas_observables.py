"""VMEM-resident blocked observables kernel: energy E(t) + per-qubit <Z_i(t)>.

The energy study (autocorr-delta-a-single-qiskit-fast-energy.py:83-102,
168-172; per-qubit Z dtc_qasm.py:109-126) was the last whole observable
family running on the deopted eager-noise XLA engine
(core.evolve.evolve_observables — the in-scan traced-operand pattern
docs/PERFORMANCE.md measures at ~15-30x deopt). This kernel runs the whole
trajectory inside ONE Pallas call at the blocked-kernel tier (17 <= L <=
23): the same lab-frame evolution body as the general autocorr kernel
(ops/pallas_resident_general._make_general_kernel_blocked — every
polarization family, per-cycle schedules, eager Pauli noise folded into
the in-kernel-built kick group matrices), plus a per-cycle MEASURE phase
emitting, for the state BEFORE each cycle's kicks (the order
evolve_observables defines):

- the diagonal (Z + ZZ) energy  sum_s |psi_s|^2 E(s),
  E(s) = sum_q th_q z_q + sum_b tph_b z_b z_{b+1} (ops/diag.py
  conventions) — NOT one 2^L-element mask product: E is linear in the
  z bits, so the whole reduction factorizes through three probability
  marginals (the same low/high split the evolution's diagonal fold uses):
    cm2 (128,128)   column-probability marginal over bits 0..13,
                    reshaped rows = bits 7..13, lanes = bits 0..6
    per-block row sums      bits 14.. (contracted against per-block
                            top-bit sign vectors — no (TOP,1) carrier)
    m13 partial             sum_c P(r, c) z13(c), the bond-13 straddle's
                            bilinear term
- per-qubit <Z_q(t)> for ALL q — masked reductions of the SAME marginals
  (nothing touches the full plane twice);
- sum_q <X_q(t)> (the transverse energy term needs only the SUM): for a
  real-symmetric S = sum_q X_q, <psi|S|psi> = mr.S.mr + mi.S.mi — the
  7-qubit group S7 (128,128) and the top-group S_top (TOP,TOP) are
  hypercube adjacency matrices built in-kernel from iotas, applied with
  the same bf16x3 dots as the kicks (2 real dots per group per plane,
  cheaper than one Karatsuba kick pass).

Noise trajectories draw from the SAME uniform stream as
evolve_observables and the lab-frame autocorr kernels (uniform(key,
(T*K, L)) row-major), so engine-vs-engine comparisons are
trajectory-exact (tests/test_observables_kernel.py, interpret mode).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dtc_tpu.core.sigma_evolve import _codes_from_uniform, _masks_from_codes
from dtc_tpu.core.statevector import neel_index
from dtc_tpu.ops.pallas_resident import _dot_f32
from dtc_tpu.ops.pallas_resident_general import (
    _LANE_U8,
    _bits_row,
    _cmul,
    _flag_lanes,
    _tile_helpers,
    slot_u8,
)

_C = 16384  # 2**14 column axis (bits 0..13)
_HALF_PI = float(np.pi / 2)

# output row layout (one 128-lane row per measured cycle):
#   lane 0        e_diag(t)
#   lane 1        x_sum(t) = sum_q <X_q>
#   lanes 2..2+L  <Z_q(t)>
_OUT_EDIAG = 0
_OUT_XSUM = 1
_OUT_Z = 2


def _adjacency(n: int, dtype=jnp.float32):
    """(2^n, 2^n) hypercube adjacency: 1 where the indices differ in
    exactly one bit — the matrix of S = sum_q X_q over an n-bit group."""
    size = 1 << n
    ia = jax.lax.broadcasted_iota(jnp.int32, (size, size), 0)
    ib = jax.lax.broadcasted_iota(jnp.int32, (size, size), 1)
    x = ia ^ ib
    one_bit = (x != 0) & ((x & (x - 1)) == 0)
    return one_bit.astype(dtype)


def _make_obs_kernel(L: int, T: int, K: int, b0: int, with_x: bool,
                     bt: int, cs: int):  # noqa: C901
    """One grid step = one trajectory: T cycles of (measure -> K kick
    slots + fused diagonal), blocked plane ops (see
    ops/pallas_resident_blocked.py for the pass structure)."""
    TOP = 1 << (L - 14)
    n_bt = TOP // bt
    n_csh = (_C // 2) // cs
    T8 = -(-T // 8) * 8

    def kernel(tiles_ref, erow_ref, out_ref, st_ref):
        colb = jax.lax.broadcasted_iota(jnp.uint32, (bt, _C), 1)
        topb = jax.lax.broadcasted_iota(jnp.uint32, (bt, _C), 0)

        def init_block(i, _):
            gidx = ((topb + jnp.uint32(i * bt)) << 14) | colb
            st_ref[0, pl.ds(i * bt, bt), :] = jnp.where(
                gidx == jnp.uint32(b0), 1.0, 0.0)
            st_ref[1, pl.ds(i * bt, bt), :] = jnp.zeros((bt, _C), jnp.float32)
            return _

        jax.lax.fori_loop(0, n_bt, init_block, None)
        out_ref[0] = jnp.zeros((T8, 128), jnp.float32)

        # loop-invariant tables (evolution: as the general blocked kernel;
        # measure: z13 lane signs, output row/lane iotas, S adjacencies)
        lci = jax.lax.broadcasted_iota(jnp.int32, (1, _C), 1)
        l7r = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
        z7o = [(1 - 2 * ((l7r >> k) & 1)).astype(jnp.float32)
               for k in range(7)]
        l7c = jax.lax.broadcasted_iota(jnp.int32, (128, 1), 0)
        z7i = [(1 - 2 * ((l7c >> k) & 1)).astype(jnp.float32)
               for k in range(7)]
        lcs = jax.lax.broadcasted_iota(jnp.int32, (1, cs), 1)
        zz67c = (1 - 2 * (((lcs >> 6) ^ (lcs >> 7)) & 1)).astype(jnp.float32)
        z13c = (1 - 2 * ((lci >> 13) & 1)).astype(jnp.float32)
        hti = jax.lax.broadcasted_iota(jnp.int32, (TOP, 1), 0)
        zho = [(1 - 2 * ((hti >> k) & 1)).astype(jnp.float32)
               for k in range(L - 14)]
        hbt = jax.lax.broadcasted_iota(jnp.int32, (bt, 1), 0)
        orow = jax.lax.broadcasted_iota(jnp.int32, (T8, 128), 0)
        olane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
        if with_x:
            s7 = _adjacency(7)
            stp = _adjacency(L - 14)

        # energy coefficients (SMEM row: th at [0, L), tph at [L, 2L-1))
        def th_(qq):
            return erow_ref[0, 0, qq]

        def tph_(jj):
            return erow_ref[0, 0, L + jj]

        # 7-bit group energy vectors (loop-invariant): lanes = bits 0..6,
        # rows = bits 7..13 of the column-marginal reshape
        elow7 = jnp.zeros((1, 128), jnp.float32)
        for k in range(7):
            elow7 = elow7 + th_(k) * z7o[k]
            if k > 0:
                elow7 = elow7 + tph_(k - 1) * (z7o[k - 1] * z7o[k])
        emid7 = jnp.zeros((128, 1), jnp.float32)
        for k in range(7):
            emid7 = emid7 + th_(7 + k) * z7i[k]
            if k > 0:
                emid7 = emid7 + tph_(6 + k) * (z7i[k - 1] * z7i[k])
        zz6 = z7i[0] * z7o[6]  # bond 6 straddles the low/mid groups

        FO = 4 * L - 1
        czc, cbc, angle7, angle_hi, build_group = _tile_helpers(tiles_ref, L)

        def measure(cyc):
            # ---- marginal pass over TOP blocks
            def mblock(i, carry):
                colm, e_hi, m13s, ztop, xacc = carry
                mr = st_ref[0, pl.ds(i * bt, bt), :]
                mi = st_ref[1, pl.ds(i * bt, bt), :]
                pb = mr * mr + mi * mi
                colm = colm + jnp.sum(pb, axis=0, keepdims=True)
                rsum = jnp.sum(pb, axis=1, keepdims=True)  # (bt, 1)
                # per-block top-bit signs (offset i*bt), contracted here so
                # no (TOP, 1) carrier crosses the loop
                zb = [(1 - 2 * (((hbt + i * bt) >> k) & 1)).astype(
                    jnp.float32) for k in range(L - 14)]
                eb = jnp.zeros((bt, 1), jnp.float32)
                for k in range(L - 14):
                    eb = eb + th_(14 + k) * zb[k]
                    if k > 0:
                        eb = eb + tph_(13 + k) * (zb[k - 1] * zb[k])
                e_hi = e_hi + jnp.sum(rsum * eb)
                ztop = tuple(z + jnp.sum(rsum * zb[k])
                             for k, z in enumerate(ztop))
                m13s = m13s + jnp.sum(
                    jnp.sum(pb * z13c, axis=1, keepdims=True) * zb[0])
                if with_x:
                    mrl = mr.reshape(bt * 128, 128)
                    mil = mi.reshape(bt * 128, 128)
                    xacc = (xacc + jnp.sum(mrl * _dot_f32(mrl, s7))
                            + jnp.sum(mil * _dot_f32(mil, s7)))
                    mrm = jnp.swapaxes(mrl.reshape(bt, 128, 128), 1,
                                       2).reshape(bt * 128, 128)
                    mim = jnp.swapaxes(mil.reshape(bt, 128, 128), 1,
                                       2).reshape(bt * 128, 128)
                    xacc = (xacc + jnp.sum(mrm * _dot_f32(mrm, s7))
                            + jnp.sum(mim * _dot_f32(mim, s7)))
                return (colm, e_hi, m13s, ztop, xacc)

            init = (jnp.zeros((1, _C), jnp.float32),
                    jnp.zeros((), jnp.float32),
                    jnp.zeros((), jnp.float32),
                    (jnp.zeros((), jnp.float32),) * (L - 14),
                    jnp.zeros((), jnp.float32))
            colm, e_hi, m13s, ztop, xacc = jax.lax.fori_loop(
                0, n_bt, mblock, init)

            if with_x:
                # top-group X: S_top acts on the TOP rows, per column chunk
                def xtop(j, acc):
                    hr = st_ref[0, :, pl.ds(j * cs, cs)]
                    hi2 = st_ref[1, :, pl.ds(j * cs, cs)]
                    return (acc + jnp.sum(hr * _dot_f32(stp, hr))
                            + jnp.sum(hi2 * _dot_f32(stp, hi2)))

                xacc = jax.lax.fori_loop(0, _C // cs, xtop, xacc)

            # ---- reduce the column marginal: rows = bits 7..13, lanes 0..6
            cm2 = colm.reshape(128, 128)
            cm_low = jnp.sum(cm2, axis=0, keepdims=True)   # (1, 128)
            cm_mid = jnp.sum(cm2, axis=1, keepdims=True)   # (128, 1)
            e_diag = (jnp.sum(cm_low * elow7) + jnp.sum(cm_mid * emid7)
                      + tph_(6) * jnp.sum(cm2 * zz6)
                      + e_hi + tph_(13) * m13s)

            row = jnp.where(olane == _OUT_EDIAG, e_diag, 0.0)
            row = row + jnp.where(olane == _OUT_XSUM, xacc, 0.0)
            for qq in range(7):
                row = row + jnp.where(olane == _OUT_Z + qq,
                                      jnp.sum(cm_low * z7o[qq]), 0.0)
            for qq in range(7):
                row = row + jnp.where(olane == _OUT_Z + 7 + qq,
                                      jnp.sum(cm_mid * z7i[qq]), 0.0)
            for k in range(L - 14):
                row = row + jnp.where(olane == _OUT_Z + 14 + k, ztop[k], 0.0)
            out_ref[0] = out_ref[0] + jnp.where(orow == cyc, row, 0.0)

        def kara_right(xr, xi, br, bi, bs):
            p1 = _dot_f32(xr, br)
            p2 = _dot_f32(xi, bi)
            p3 = _dot_f32(xr + xi, bs)
            return p1 - p2, p3 - p1 - p2

        def slot_step(ti):
            """One kick slot + fused diagonal — the forward branch of
            ops/pallas_resident_general._make_general_kernel_blocked with
            the A(t) measure stripped (this kernel measures at cycle
            boundaries instead)."""
            u8 = [tiles_ref[0, ti, FO + _LANE_U8 + j] for j in range(8)]

            def scaled_group(nbits, off, th):
                gr, gi = build_group(ti, u8, nbits, off,
                                     transposed=(off < 14))
                dr = jnp.cos(th)
                di = jnp.sin(th)
                return _cmul(gr, gi, dr, di)

            c0q = _HALF_PI * sum(tiles_ref[0, ti, qq] for qq in range(L))
            blr, bli = scaled_group(7, 0, angle7(ti, 0, c0q, z7o))
            bls = blr + bli
            bmr, bmi = scaled_group(7, 7, angle7(ti, 7, 0.0, z7o))
            bms = bmr + bmi

            def p1_block(i, _):
                mr = st_ref[0, pl.ds(i * bt, bt), :].reshape(bt * 128, 128)
                mi = st_ref[1, pl.ds(i * bt, bt), :].reshape(bt * 128, 128)
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

            s13q = cbc(ti, 13)
            s6q = cbc(ti, 6)
            c6q = jnp.cos(s6q)
            s6qz = zz67c * jnp.sin(s6q)
            utr, uti = build_group(ti, u8, L - 14, 14, transposed=False)
            b_hi = angle_hi(ti, zho)
            for half, sgn in ((0, 1.0), (1, -1.0)):
                th = b_hi + sgn * s13q * zho[0]
                dr = jnp.cos(th)
                di = jnp.sin(th)
                htr, hti_ = _cmul(utr, uti, dr, di)
                hts = htr + hti_
                base = half * (_C // 2)

                def p2_chunk(j, _, htr=htr, hti_=hti_, hts=hts, base=base):
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
                    return _

                jax.lax.fori_loop(0, n_csh, p2_chunk, None)

        def cyc_body(cyc, _):
            measure(cyc)
            for k in range(K):
                slot_step(cyc * K + k)
            return _

        jax.lax.fori_loop(0, T, cyc_body, None)

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("L", "T", "K", "p", "initial_state", "with_x",
                     "interpret"),
)
def observables_forward_batch(hs, phis, term_hs, term_phis, angles, keys, *,
                              L, T, K, p, initial_state="vacuum",
                              with_x=True, interpret=False):
    """(inst, L), (inst, L-1), (inst, L), (inst, L-1), (T, K, 2),
    (inst, c, 2) -> e_diag (inst, c, T), x_sum (inst, c, T),
    zs (inst, c, T, L).

    Whole-trajectory observables at the blocked-kernel tier, any
    polarization family / per-cycle schedule. ``term_hs``/``term_phis``
    are the ENERGY Hamiltonian coefficients
    (models.hamiltonian.hamiltonian_terms — component-selected, generally
    != the evolution's hs/phis); the transverse part is returned
    separately as x_sum so the host applies x_coeff (and any estimator
    contraction) itself:  E = e_diag + x_coeff * x_sum.
    """
    if not (17 <= L <= 23):
        raise ValueError("observables kernel supports 17 <= L <= 23")
    if T * K > 1024:
        raise ValueError("observables kernel supports T*K <= 1024")
    from dtc_tpu.ops.pallas_resident_blocked import blocked_block_sizes

    TOP = 1 << (L - 14)
    b0 = 0 if initial_state == "vacuum" else neel_index(L)
    S = T * K
    T8 = -(-T // 8) * 8
    bt, cs = blocked_block_sizes(TOP)

    u8 = jax.vmap(jax.vmap(lambda a: slot_u8(a[0], a[1])))(angles)
    u8 = u8.reshape(S, 8)
    final = np.zeros((T, K), np.float32)
    final[:, K - 1] = 1.0
    final = jnp.asarray(final.reshape(S, 1))
    FL = _flag_lanes(L)
    flags = jnp.zeros((S, FL), jnp.float32)
    flags = flags.at[:, _LANE_U8:_LANE_U8 + 8].set(u8)

    def per_instance(h, ph, th, tph, ks):
        hrow = final * h[None].astype(jnp.float32)
        prow = final * ph[None].astype(jnp.float32)

        def tiles_one(key):
            if p > 0.0:
                u = jax.random.uniform(key, (S, L), dtype=jnp.float32)
                codes = _codes_from_uniform(u, p)
                xm, zm = _masks_from_codes(codes, L)
            else:
                xm = zm = jnp.zeros((S,), jnp.uint32)
            zmb = _bits_row(zm, L)
            xmb = _bits_row(xm, L)
            return jnp.concatenate([zmb, xmb, hrow, prow, flags], axis=-1)

        params = jax.vmap(tiles_one)(ks)  # (c, S, 128)
        n_traj = ks.shape[0]
        erow = jnp.zeros((1, 128), jnp.float32)
        erow = erow.at[0, :L].set(th.astype(jnp.float32))
        erow = erow.at[0, L:2 * L - 1].set(tph.astype(jnp.float32))

        out = pl.pallas_call(
            _make_obs_kernel(L, T, K, b0, with_x, bt, cs),
            out_shape=jax.ShapeDtypeStruct((n_traj, T8, 128), jnp.float32),
            grid=(n_traj,),
            in_specs=[
                pl.BlockSpec((1, S, 128), lambda i: (i, 0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 1, 128), lambda i: (0, 0, 0),
                             memory_space=pltpu.SMEM),
            ],
            out_specs=pl.BlockSpec((1, T8, 128), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((2, TOP, _C), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=110 * 1024 * 1024),
            interpret=interpret,
        )(params, erow[None])
        e_diag = out[:, :T, _OUT_EDIAG]
        x_sum = out[:, :T, _OUT_XSUM]
        zs = out[:, :T, _OUT_Z:_OUT_Z + L]
        return e_diag, x_sum, zs

    return jax.vmap(per_instance)(hs, phis, term_hs, term_phis, keys)
