"""VMEM-resident whole-trajectory Floquet kernel (x-polarized forward).

The noisy scan at the XLA level runs ~15-30x below the noiseless fast path
(docs/PERFORMANCE.md): any per-cycle traced operand deopts the loop. This
kernel sidesteps XLA's loop entirely: ONE grid step evolves ONE trajectory
through ALL T cycles with the state RESIDENT in VMEM (8 MB at L=20), so a
cycle touches HBM not at all.

Layout (14 <= L <= 20): planar f32 planes shaped (2, TOP, 16384) with
TOP = 2**(L-14); the 16384 axis is global-index bits 0..13 (c = chi*128 +
clo), the TOP axis bits 14..L-1. One cycle:

  1. kick bits 0..6 / 7..13: full-plane (TOP*128, 128) Karatsuba complex
     matmuls (3 dots per complex product instead of 4) against U7 = RX^{x7},
     with a VMEM axis swap exposing the mid-7 axis between them
  2. top kick (bits 14..L-1, absent at L=14): one (TOP, TOP) x (TOP, 16384)
     Karatsuba product
  3. fused diagonal. The ENTIRE per-cycle diagonal — static RZZ+RZ angles,
     the sigma-frame noise correction, and the sampled Pauli string's
     Z-sign (as pi * parity) — is one angle LINEAR in the z-bits:

       theta(s) = sum_q cz_q z_q(s) + sum_j cb_j z_j z_{j+1}(s) + c0
       cz_q = h_q (sigma_q - 1/2) - (pi/2) n_q,  cb_j = phi_j (flip_j - 1/2)

     Linearity in the bit split s = (top << 14) | col factorizes the phase:

       exp(i theta) = exp(i low(col)) * exp(i high(top)) * exp(+-i cb_13)

     so transcendentals run only on a (1, 16384) and a (TOP, 1) vector per
     cycle; the full plane sees three broadcast complex multiplies. This
     replaced a per-amplitude 2L-term bit loop + full-plane sincos + a
     streamed-D0 HBM pass (measured: 3.5k -> 9.1k cycles/s at L=20).

Per-cycle parameters (zm/sigma/flip bits + h/phi lanes) are compact
(T, 128) rows in SMEM (pack_cycle_params_compact; scalar coefficient
reads are register-speed there — VMEM scalar reads measured ~8% of
kernel time). A(0) is trivial (basis state) and supplied by the host
wrapper.

The forward kernel can evolve nb > 1 trajectories per grid step
(DTC_TPU_RESIDENT_NB), stage-interleaved so Mosaic overlaps one chain's
MXU dots with another's VPU work: measured 11.5k -> 12.5k (nb=2) ->
12.8k (nb=4) cycles/s at L=20/T=50 with bit-identical values — but
Mosaic compile time explodes with the unrolled body (~5 s at nb=1,
minutes at nb=2, >15 min at nb=8), so nb=1 stays the DEFAULT; raise it
only for long repeated sweeps of one shape that amortize the compile.

Empirical tuning notes (v5e; forward kernel validated vs the sigma
engine: <=2.1e-5 at HIGHEST, <=1.8e-4 at the default bf16x3):
post-diagonal-fold the kernel is DOT-BOUND — raw-bf16 dots run 80 ms vs
HIGHEST 173 ms, so precision passes are the lever (bf16x3 = 149 ms /
10.7k cycles/s); Mosaic rejects Precision.HIGH; removing the axis swaps
saves only ~3 ms (relayout mostly rides the dots); the bond-6 cmul and
per-cycle measure cost ~3 ms each; chunking the kick/elementwise passes
only hurts once the scoped-VMEM limit is raised via CompilerParams
(default 16 MB).
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

# Kernel dot precision. After the diagonal-fold optimization the kernel is
# DOT-BOUND (measured: HIGHEST 173 ms/run, raw-bf16 80 ms at L=20/T=50/32
# traj), so dot passes are now the lever:
#   highest — XLA f32 (6 bf16 passes/dot). err vs sigma engine <= 2.1e-5.
#   bf16x3  — manual hi/lo split, 3 bf16 passes/dot (x*y ~ xh*yh + xh*yl +
#             xl*yh; the dropped xl*yl term is O(2^-16) relative). DEFAULT
#             since measured err <= 1.8e-4 at T=50 (far below trajectory
#             sampling noise ~1e-1) at 149 ms vs highest's 168 ms.
#   default — raw bf16, PROBES ONLY (unitarity drifts ~0.4%/cycle).
import os as _os
_KERNEL_PRECISION = _os.environ.get("DTC_TPU_KERNEL_PRECISION", "bf16x3")
_DOT_PRECISION = {
    "default": jax.lax.Precision.DEFAULT,
    "bf16x3": jax.lax.Precision.DEFAULT,
    "highest": jax.lax.Precision.HIGHEST,
}[_KERNEL_PRECISION]


def _split_bf16(a):
    ah = a.astype(jnp.bfloat16)
    return ah, (a - ah.astype(jnp.float32)).astype(jnp.bfloat16)


def _dot_f32(a, b):
    """f32-quality dot: bf16x3 decomposition or a native XLA-precision dot."""
    if _KERNEL_PRECISION != "bf16x3":
        return jnp.dot(a, b, preferred_element_type=jnp.float32,
                       precision=_DOT_PRECISION)
    ah, al = _split_bf16(a)
    bh, bl = _split_bf16(b)

    def d(x, y):
        return jnp.dot(x, y, preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.DEFAULT)

    return d(ah, bh) + d(ah, bl) + d(al, bh)

_C = 16384  # 2**14 column axis (bits 0..13)

_HALF_PI = float(np.pi / 2)


def _cmul(ar, ai, br, bi):
    return ar * br - ai * bi, ar * bi + ai * br


def _make_kernel(L: int, T: int, q: int, b0: int, has_top: bool,
                 time_dep: bool = False, nb: int = 1):  # noqa: C901
    """Forward kernel evolving ``nb`` independent trajectories per grid
    step, stage-interleaved: each pipeline stage (build B, dot, swap, top,
    measure) loops over the chains so Mosaic can overlap one chain's MXU
    dots with another's VPU/elementwise work. nb=1 reproduces the original
    single-chain schedule exactly (same per-chain op order)."""
    TOP = 1 << (L - 14)

    def kernel(u7r_ref, u7i_ref, utr_ref, uti_ref, par_ref,
               a_out_ref, st_ref):
        # a_out_ref: (1, nb, 8, 128) VMEM block for THIS chain group; A(t)
        # stored at flat position t via one-hot vector adds (scalar VMEM
        # stores are unsupported on this backend)
        arow = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
        alane = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
        apos = arow * 128 + alane
        # ------------------------------------------------------------------
        # init: basis state b0 (vector write; scalar VMEM stores unsupported)
        col = jax.lax.broadcasted_iota(jnp.uint32, (TOP, _C), 1)
        topi = jax.lax.broadcasted_iota(jnp.uint32, (TOP, _C), 0)
        gidx = (topi << 14) | col
        for b in range(nb):
            st_ref[2 * b] = jnp.where(gidx == jnp.uint32(b0), 1.0, 0.0)
            st_ref[2 * b + 1] = jnp.zeros((TOP, _C), jnp.float32)

        # loop-invariant vectors: 7-bit z tables, straddle-bond sign, zq
        l7 = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
        z7 = [(1 - 2 * ((l7 >> k) & 1)).astype(jnp.float32) for k in range(7)]
        lci = jax.lax.broadcasted_iota(jnp.int32, (1, _C), 1)
        zz67 = (1 - 2 * (((lci >> 6) ^ (lci >> 7)) & 1)).astype(jnp.float32)
        zq = (1 - 2 * ((lci >> q) & 1)).astype(jnp.float32)
        if has_top:
            hti = jax.lax.broadcasted_iota(jnp.int32, (TOP, 1), 0)
            zh = [(1 - 2 * ((hti >> k) & 1)).astype(jnp.float32)
                  for k in range(L - 14)]

        def cycle(cyc, _):
            # The per-cycle fused diagonal — static RZZ+RZ angles, the
            # sigma-frame noise correction, and the sampled Pauli Z-sign —
            # is LINEAR in the z-bits, so it splits along the kick axes:
            #   theta = th_lo(bits 0..6) + th_mid(bits 7..13) + cb6 z6 z7
            #         + th_hi(bits 14..) + cb13 z13 z14
            # th_lo / th_mid / th_hi FOLD INTO the kick matrices as column
            # scalings B = diag(e^{i th}) U (the dot contracts exactly those
            # bits), leaving only the bond-6 straddle as a full-plane cmul
            # and the bond-13 straddle as a contiguous column-half split of
            # the top dot. This removed 2 of 3 full-plane complex multiplies
            # per cycle (the docs/PERFORMANCE.md "next lever").
            ui = cyc if time_dep else 0
            u7rt = u7r_ref[ui].T
            u7it = u7i_ref[ui].T

            # compact row layout (pack_cycle_params_compact): n | sig |
            # flip | h | phi at offsets 0, L, 2L, 3L-1, 4L-1
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
                p1 = _dot_f32(mr, br)
                p2 = _dot_f32(mi, bi)
                p3 = _dot_f32(mr + mi, bs)
                return p1 - p2, p3 - p1 - p2

            # stage 0: per-chain scaled kick matrices (VPU, tiny)
            bl = []
            bm = []
            for b in range(nb):
                c0 = _HALF_PI * sum(par_ref[0, b, cyc, qq]
                                    for qq in range(L))
                bl.append(scaled(seven_bit_angle(b, 0, c0)))
                bm.append(scaled(seven_bit_angle(b, 7, 0.0)))

            mr = [st_ref[2 * b].reshape(TOP * 128, 128) for b in range(nb)]
            mi = [st_ref[2 * b + 1].reshape(TOP * 128, 128)
                  for b in range(nb)]
            for b in range(nb):                  # kick+diag bits 0..6
                mr[b], mi[b] = kara_right(mr[b], mi[b], *bl[b])
            for b in range(nb):
                mr[b] = jnp.swapaxes(mr[b].reshape(TOP, 128, 128), 1,
                                     2).reshape(TOP * 128, 128)
                mi[b] = jnp.swapaxes(mi[b].reshape(TOP, 128, 128), 1,
                                     2).reshape(TOP * 128, 128)
            for b in range(nb):                  # kick+diag bits 7..13
                mr[b], mi[b] = kara_right(mr[b], mi[b], *bm[b])
            for b in range(nb):
                mr[b] = jnp.swapaxes(mr[b].reshape(TOP, 128, 128), 1,
                                     2).reshape(TOP, _C)
                mi[b] = jnp.swapaxes(mi[b].reshape(TOP, 128, 128), 1,
                                     2).reshape(TOP, _C)

            # bond 6-7 straddle: the one remaining full-plane cmul
            for b in range(nb):
                s6 = cb(b, 6)
                mr[b], mi[b] = _cmul(mr[b], mi[b], jnp.cos(s6),
                                     zz67 * jnp.sin(s6))

            # top kick + high diag + bond 13-14 straddle: two column-half
            # dots with diag(e^{i(th_hi +- cb13 z14)}) U_top
            if has_top:
                utr = utr_ref[ui]
                uti = uti_ref[ui]
                for b in range(nb):
                    th_hi = jnp.zeros((TOP, 1), jnp.float32)
                    for k in range(L - 14):
                        th_hi = th_hi + cz(b, 14 + k) * zh[k]
                        if k > 0:
                            th_hi = th_hi + cb(b, 13 + k) * (zh[k - 1] * zh[k])
                    s13z14 = cb(b, 13) * zh[0]
                    halves = []
                    for sgn, sl in ((1.0, slice(0, _C // 2)),
                                    (-1.0, slice(_C // 2, _C))):
                        th = th_hi + sgn * s13z14
                        dr = jnp.cos(th)
                        di = jnp.sin(th)
                        btr = utr * dr - uti * di
                        bti = utr * di + uti * dr
                        hr, hi_ = mr[b][:, sl], mi[b][:, sl]
                        q1 = _dot_f32(btr, hr)
                        q2 = _dot_f32(bti, hi_)
                        q3 = _dot_f32(btr + bti, hr + hi_)
                        halves.append((q1 - q2, q3 - q1 - q2))
                    mr[b] = jnp.concatenate(
                        [halves[0][0], halves[1][0]], axis=1)
                    mi[b] = jnp.concatenate(
                        [halves[0][1], halves[1][1]], axis=1)

            for b in range(nb):
                st_ref[2 * b] = mr[b]
                st_ref[2 * b + 1] = mi[b]

            # A(cyc+1) raw value (host applies s0/sigma/ancilla factors)
            @pl.when(cyc + 1 < T)
            def _():
                for b in range(nb):
                    a_next = jnp.sum(
                        (mr[b] * mr[b] + mi[b] * mi[b]) * zq)
                    a_out_ref[0, b] = a_out_ref[0, b] + jnp.where(
                        apos == cyc + 1, a_next, 0.0)

            return _

        for b in range(nb):
            a_out_ref[0, b] = jnp.where(
                apos == 0, float(1 - 2 * ((b0 >> q) & 1)), 0.0)
        jax.lax.fori_loop(0, T, cycle, None)

    return kernel



def _kick_matrices(angles, L, TOP, time_dependent):
    """Planar (Tu, 128, 128) U7 and (Tu, TOP, TOP) U_top kick matrices,
    Tu = T for per-cycle schedules else 1 (x-polarized: RX(theta_t)^kron)."""

    def one(theta):
        c = jnp.cos(theta / 2).astype(jnp.float32)
        s = jnp.sin(theta / 2).astype(jnp.float32)
        rr = jnp.eye(2, dtype=jnp.float32) * c
        ri = jnp.array([[0, -1], [-1, 0]], jnp.float32) * s

        def kpow(k):
            kr, ki = rr, ri
            for _ in range(k - 1):
                kr, ki = (jnp.kron(kr, rr) - jnp.kron(ki, ri),
                          jnp.kron(kr, ri) + jnp.kron(ki, rr))
            return kr, ki

        u7r, u7i = kpow(7)
        if TOP > 1:
            utr, uti = kpow(int(np.log2(TOP)))
        else:
            utr = jnp.ones((1, 1), jnp.float32)
            uti = jnp.zeros((1, 1), jnp.float32)
        return u7r, u7i, utr, uti

    thetas = angles[:, 0, 0] if time_dependent else angles[:1, 0, 0]
    return jax.vmap(one)(thetas)


def _make_echo_kernel(L: int, T2: int, q: int, b0: int, has_top: bool,
                      time_dep: bool = False):  # noqa: C901
    """Echo kernel: T2 = 2T masked steps, one grid step = one (traj, t) pair.

    Each step applies prediag * kick(+-) * postdiag where both diagonals are
    evaluated from (8, 128) pack_cycle_params tiles (params row layout:
    [zm, sigma, flip, h, phi, flags, 0, 0]); the pre tile carries NEGATED
    h/phi rows so the one shared phase formula yields the inverse diagonal
    D0* x conj-correction (see sigma_evolve.inverse_cycle_fac). Flags live
    in row 5 of the PRE tile: lane 0 = kick imag sign (+1 fwd / -1 inv),
    lane 1 = step active (0 skips the kick via a select).

    Like the forward kernel, both diagonals FOLD INTO the kick dots: the
    pre angle of each 7-bit group scales the dot's contraction-input rows,
    the post angle its output columns (B = diag(e^{i post}) U diag(e^{i
    pre})), and the bond-13 straddles ride the top dot's column-half split
    (pre side as an input z14 column scaling, post side as an output z14
    row scaling). Only the bond-6 straddles (pre/post) and the pre bond-13
    remain as full-plane broadcast-factor multiplies — down from six
    full-plane complex multiplies per step (measured: 10.3k -> 15.1k
    masked steps/s at L=20/T=50).
    """
    TOP = 1 << (L - 14)

    def kernel(u7r_ref, u7i_ref, utr_ref, uti_ref, par_ref,
               a_out_ref, st_ref):
        col = jax.lax.broadcasted_iota(jnp.uint32, (TOP, _C), 1)
        topi = jax.lax.broadcasted_iota(jnp.uint32, (TOP, _C), 0)
        gidx = (topi << 14) | col
        st_ref[0] = jnp.where(gidx == jnp.uint32(b0), 1.0, 0.0)
        st_ref[1] = jnp.zeros((TOP, _C), jnp.float32)
        lci = jax.lax.broadcasted_iota(jnp.int32, (1, _C), 1)
        # z tables: 7-bit rows (dot output axis), 7-bit columns (dot input
        # axis), full-column straddle mask, top-row/column tables
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

        # compact row layout (pack_cycle_params_compact): n | sig | flip |
        # h | phi at offsets 0, L, 2L, 3L-1, 4L-1; flags at lanes 125..127
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

        def angle_hi(ti, zt):
            th = jnp.zeros_like(zt[0])
            for k in range(L - 14):
                th = th + cz(ti, 14 + k) * zt[k]
                if k > 0:
                    th = th + cb(ti, 13 + k) * (zt[k - 1] * zt[k])
            return th

        def step(k, _):
            pre = 2 * k       # flat tile indices (pre, post) for step k
            post = 2 * k + 1
            imag_sign = par_ref[0, pre, 125]
            active = par_ref[0, pre, 126]
            ui = par_ref[0, pre, 127].astype(jnp.int32) if time_dep else 0
            c0p = _HALF_PI * sum(par_ref[0, pre, qq] for qq in range(L))
            c0q = _HALF_PI * sum(par_ref[0, post, qq] for qq in range(L))

            mr, mi = st_ref[0], st_ref[1]
            # pre straddle phases: e^{i s z z'} = cos s + i zz' sin s
            s6p = cb(pre, 6)
            mr, mi = _cmul(mr, mi, jnp.cos(s6p), zz67 * jnp.sin(s6p))
            if has_top:
                s13p = cb(pre, 13)
                mr, mi = _cmul(mr, mi, jnp.cos(s13p),
                               (z13c * zho[0]) * jnp.sin(s13p))

            # kick dots with pre/post group angles folded as row/column
            # scalings; per-step imaginary sign (U7 fwd / U7* inverse)
            u7rt = u7r_ref[ui].T
            u7it = u7i_ref[ui].T * imag_sign

            def scaled(base, bias_p, bias_q):
                th = (angle7(pre, base, bias_p, z7i)
                      + angle7(post, base, bias_q, z7o))
                dr = jnp.cos(th)
                di = jnp.sin(th)
                br = u7rt * dr - u7it * di
                bi = u7rt * di + u7it * dr
                return br, bi, br + bi

            blr, bli, bls = scaled(0, c0p, c0q)
            bmr, bmi, bms = scaled(7, 0.0, 0.0)

            def kara_right(xr, xi, br, bi, bs):
                p1 = _dot_f32(xr, br)
                p2 = _dot_f32(xi, bi)
                p3 = _dot_f32(xr + xi, bs)
                return p1 - p2, p3 - p1 - p2

            kr = mr.reshape(TOP * 128, 128)
            ki = mi.reshape(TOP * 128, 128)
            kr, ki = kara_right(kr, ki, blr, bli, bls)
            kr = jnp.swapaxes(kr.reshape(TOP, 128, 128), 1, 2).reshape(
                TOP * 128, 128)
            ki = jnp.swapaxes(ki.reshape(TOP, 128, 128), 1, 2).reshape(
                TOP * 128, 128)
            kr, ki = kara_right(kr, ki, bmr, bmi, bms)
            kr = jnp.swapaxes(kr.reshape(TOP, 128, 128), 1, 2).reshape(TOP, _C)
            ki = jnp.swapaxes(ki.reshape(TOP, 128, 128), 1, 2).reshape(TOP, _C)

            if has_top:
                utr = utr_ref[ui]
                uti = uti_ref[ui] * imag_sign
                a_hi = angle_hi(pre, zhi)      # (1, TOP) input columns
                b_hi = angle_hi(post, zho)     # (TOP, 1) output rows
                s13q = cb(post, 13)
                halves = []
                for sgn, sl in ((1.0, slice(0, _C // 2)),
                                (-1.0, slice(_C // 2, _C))):
                    th = b_hi + sgn * s13q * zho[0] + a_hi
                    dr = jnp.cos(th)
                    di = jnp.sin(th)
                    btr = utr * dr - uti * di
                    bti = utr * di + uti * dr
                    hr, hi_ = kr[:, sl], ki[:, sl]
                    q1 = _dot_f32(btr, hr)
                    q2 = _dot_f32(bti, hi_)
                    q3 = _dot_f32(btr + bti, hr + hi_)
                    halves.append((q1 - q2, q3 - q1 - q2))
                kr = jnp.concatenate([halves[0][0], halves[1][0]], axis=1)
                ki = jnp.concatenate([halves[0][1], halves[1][1]], axis=1)
            # inactive steps keep the pre-kick state (prediag was identity)
            kr = jnp.where(active > 0.5, kr, mr)
            ki = jnp.where(active > 0.5, ki, mi)

            # post bond-6 straddle (bits 6/7 final after the second dot)
            s6q = cb(post, 6)
            kr, ki = _cmul(kr, ki, jnp.cos(s6q), zz67 * jnp.sin(s6q))
            st_ref[0] = kr
            st_ref[1] = ki
            return _

        # active steps are exactly the FIRST 2t of the T2-step schedule, so
        # the per-pair trip count (flag lane 124 of tile 0) skips the
        # identity padding — an echo sweep over t = 1..T halves its real
        # work (sum 2t = T(T+1) active vs 2T^2 padded steps)
        n_active = par_ref[0, 0, 124].astype(jnp.int32)
        jax.lax.fori_loop(0, n_active, step, None)

        # terminal measurement: raw sum |v|^2 z_q (host applies s0/sigma/af)
        zq = (1 - 2 * ((lci >> q) & 1)).astype(jnp.float32)
        val = jnp.sum((st_ref[0] * st_ref[0] + st_ref[1] * st_ref[1]) * zq)
        arow = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
        alane = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
        apos = arow * 128 + alane
        a_out_ref[0] = jnp.where(apos == 0, val, 0.0)

    return kernel


def echo_pair_tiles(key, t_value, h, ph, *, L, T, p, width: int = 128):
    """(2*2T, width) interleaved (pre, post) compact step tiles for one
    (trajectory, t) echo pair, plus the final sigma.

    Shared by the VMEM-resident and HBM-streamed echo kernels. pre tile:
    inverse diagonal D0* x conj-correction at the CURRENT sigma (= sigma
    before this step's event) — unlike sigma_evolve.inverse_cycle_fac there
    is no pending-XOR cancellation here: the kernels' forward postdiag
    applies its D0 sigma-correction eagerly (not deferred into the next
    kick), so at the turnaround the inverse must conj-correct it back.
    Flag lanes sit at the row tail (width-4 = per-pair trip count 2t,
    width-3 = imag sign for inverse kicks, width-2 = step active,
    width-1 = kick-matrix index for per-cycle schedules); at the default
    width=128 those are lanes 124..127, which the resident kernels read.
    Data lanes need 5L-2 <= width-4, so L >= 26 pairs must pass width=256
    (the streamed echo does).
    """
    if 5 * L - 2 > width - 4:
        raise ValueError(
            f"L={L} data lanes collide with the flag lanes at width={width}")
    from dtc_tpu.core.sigma_evolve import (
        _codes_from_uniform,
        _masks_from_codes,
    )

    T2 = 2 * T
    zeros_h = jnp.zeros_like(h)
    zeros_p = jnp.zeros_like(ph)
    step_i = jnp.arange(T2)
    fwd = step_i < t_value
    inv = (step_i >= t_value) & (step_i < 2 * t_value)
    if p > 0.0:
        u = jax.random.uniform(key, (T2, 1, L), dtype=jnp.float32)
        codes = _codes_from_uniform(u, p)
        codes = jnp.where((fwd | inv)[:, None, None], codes, 0)
        xm, zm = _masks_from_codes(codes, L)
        xm, zm = xm[:, 0], zm[:, 0]
        csum = jax.lax.associative_scan(jnp.bitwise_xor, xm)
        sig_b = jnp.concatenate(
            [jnp.zeros((1,), jnp.uint32), csum[:-1]])
    else:
        zm = sig_b = csum = jnp.zeros((T2,), jnp.uint32)
    dsig = sig_b

    def one_step(zm_k, csum_k, dsig_k, fwd_k, inv_k, aidx_k):
        pre = (pack_cycle_params_compact(jnp.uint32(0), dsig_k,
                                         -h, -ph, L, width=width)
               * inv_k.astype(jnp.float32))
        post = (pack_cycle_params_compact(zm_k, csum_k, h, ph, L,
                                          width=width)
                * fwd_k.astype(jnp.float32)
                + pack_cycle_params_compact(zm_k, jnp.uint32(0),
                                            zeros_h, zeros_p, L,
                                            width=width)
                * inv_k.astype(jnp.float32))
        imag_sign = jnp.where(inv_k, -1.0, 1.0)
        active = (fwd_k | inv_k).astype(jnp.float32)
        pre = (pre.at[width - 3].set(imag_sign).at[width - 2].set(active)
               .at[width - 1].set(aidx_k.astype(jnp.float32)))
        return jnp.stack([pre, post])

    # kick-matrix index per step (forward i = k, inverse i = 2t-1-k,
    # cf. sigma_echo_batch); constant-schedule kernels ignore it
    aidx = jnp.where(fwd, step_i,
                     jnp.clip(2 * t_value - 1 - step_i, 0, T - 1))
    tiles = jax.vmap(one_step)(zm, csum, dsig, fwd, inv, aidx)
    tiles = tiles.reshape(2 * T2, width)
    # per-pair dynamic trip count (active steps = first 2t)
    tiles = tiles.at[0, width - 4].set((2 * t_value).astype(jnp.float32))
    return tiles, csum[-1]


@functools.partial(
    jax.jit,
    static_argnames=("L", "T", "p", "q", "initial_state", "ancilla_factor",
                     "time_dependent", "interpret"),
)
def resident_echo_batch(hs, phis, angles, keys, ts, *, L, T, p, q,
                        initial_state="vacuum", ancilla_factor=1.0,
                        time_dependent=False, interpret=False):
    """(inst, L), (inst, L-1), (T,1,2), (inst, c, 2), (n_ts,) -> (inst, c, n_ts).

    VMEM-resident echo A0(t): per (trajectory, t) pair the kernel runs 2T
    masked steps — t forward cycles, t inverse cycles, identity padding —
    matching core.sigma_evolve.sigma_echo_batch event-for-event (identical
    presampled uniforms -> identical trajectories). Requires 14 <= L <= 21,
    K=1 x drive (constant or per-cycle), q < 14.
    """
    if not (14 <= L <= 21):
        raise ValueError("resident kernel supports 14 <= L <= 21")
    TOP = 1 << (L - 14)
    b0 = 0 if initial_state == "vacuum" else neel_index(L)
    s0 = 1.0 if ((b0 >> q) & 1) == 0 else -1.0
    T2 = 2 * T
    Tu = T if time_dependent else 1
    u7r, u7i, utr, uti = _kick_matrices(angles, L, TOP, time_dependent)
    n_ts = ts.shape[0]

    def per_instance(h, ph, ks):
        # (c, n_ts) pairs -> flat grid
        tiles, sig_fin = jax.vmap(
            lambda k: jax.vmap(
                lambda t: echo_pair_tiles(k, t, h, ph, L=L, T=T, p=p))(ts)
        )(ks)
        n_pairs = ks.shape[0] * n_ts
        tiles = tiles.reshape(n_pairs, 2 * T2, 128)

        # compact rows fit the double-buffered 1 MB SMEM window (the
        # scalar-read fast path) up to 2*T2 = 1008 rows; VMEM past that
        tile_mem = (pltpu.SMEM if 2 * T2 * 512 * 2 <= 1024 * 1024
                    else pltpu.VMEM)
        a_raw = pl.pallas_call(
            _make_echo_kernel(L, T2, q, b0, TOP > 1, time_dependent),
            out_shape=jax.ShapeDtypeStruct((n_pairs, 8, 128), jnp.float32),
            grid=(n_pairs,),
            in_specs=[
                pl.BlockSpec((Tu, 128, 128), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((Tu, 128, 128), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((Tu, TOP, TOP), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((Tu, TOP, TOP), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 2 * T2, 128), lambda i: (i, 0, 0),
                             memory_space=tile_mem),  # step tiles
            ],
            out_specs=pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((2, TOP, _C), jnp.float32),
            ],
            compiler_params=pltpu.CompilerParams(
                # HIGHEST-precision dots need ~107M at L=21 (the parity
                # harness); 110M is still under the ~122M practical max
                vmem_limit_bytes=110 * 1024 * 1024),
            interpret=interpret,
        )(u7r, u7i, utr, uti, tiles)
        val = a_raw.reshape(n_pairs, 1024)[:, 0].reshape(ks.shape[0], n_ts)

        sq = (1 - 2 * ((sig_fin >> q) & jnp.uint32(1)).astype(jnp.int32)
              ).astype(jnp.float32)
        return ancilla_factor * s0 * sq * val

    return jax.vmap(per_instance)(hs, phis, keys)


@functools.partial(
    jax.jit,
    static_argnames=("L", "T", "p", "q", "initial_state", "ancilla_factor",
                     "time_dependent", "interpret"),
)
def resident_forward_batch(hs, phis, angles, keys, *, L, T, p, q,
                           initial_state="vacuum", ancilla_factor=1.0,
                           time_dependent=False, interpret=False):
    """(inst, L), (inst, L-1), (T,1,2), (inst, c, 2) -> (inst, c, T).

    VMEM-resident x-pol forward autocorrelator; requires 14 <= L <= 21 and
    q < 14. Grid iterates trajectories; one grid step = one full trajectory.
    """
    if not (14 <= L <= 21):
        raise ValueError("resident kernel supports 14 <= L <= 21")
    TOP = 1 << (L - 14)
    b0 = 0 if initial_state == "vacuum" else neel_index(L)
    s0 = 1.0 if ((b0 >> q) & 1) == 0 else -1.0

    Tu = T if time_dependent else 1
    u7r, u7i, utr, uti = _kick_matrices(angles, L, TOP, time_dependent)

    if T > 1024:
        raise ValueError("resident kernel supports T <= 1024")

    # trajectories per grid step (stage-interleaved chains; see
    # _make_kernel). Grouping lets Mosaic overlap one chain's dots with
    # another's elementwise work at the cost of nb x the VMEM working set.
    nb = int(_os.environ.get("DTC_TPU_RESIDENT_NB", "1"))
    if nb < 1:
        raise ValueError(f"DTC_TPU_RESIDENT_NB={nb}: must be >= 1")
    if nb * T > 1024:
        # params SMEM window is (1, nb, T, 128) double-buffered against the
        # 1 MB SMEM cap: nb*T <= 1024 rows. nb and T are individually
        # bounded elsewhere, but their product is the binding limit.
        raise ValueError(
            f"DTC_TPU_RESIDENT_NB={nb} with T={T} overflows the 1 MB "
            f"double-buffered params SMEM window (need nb*T <= 1024)")

    def per_instance(h, ph, ks):
        n_traj = ks.shape[0]
        pad = (-n_traj) % nb
        if pad:
            ks = jnp.concatenate([ks, ks[:pad]])
        n_pad = n_traj + pad
        if p > 0.0:
            def sample(key):
                _, zm, _, csum = presample_noise(key, p, T, L)
                return jax.vmap(
                    lambda z, sg: pack_cycle_params_compact(z, sg, h, ph, L)
                )(zm, csum), csum

            params, sig_after = jax.vmap(sample)(ks)  # (c,T,128), (c,T)
            sig_after = sig_after[:n_traj]
        else:
            # noiseless: zm = sigma = 0 rows still carry the h/phi lanes the
            # kernel's fused diagonal needs (cz_q = -h_q/2, cb_j = -phi_j/2)
            row = pack_cycle_params_compact(
                jnp.uint32(0), jnp.uint32(0), h, ph, L)
            params = jnp.broadcast_to(row, (n_pad, T, 128))
            sig_after = jnp.zeros((n_traj, T), jnp.uint32)
        params = params.reshape(n_pad // nb, nb, T, 128)

        a_raw = pl.pallas_call(
            _make_kernel(L, T, q, b0, TOP > 1, time_dependent, nb=nb),
            out_shape=jax.ShapeDtypeStruct((n_pad // nb, nb, 8, 128),
                                           jnp.float32),
            grid=(n_pad // nb,),
            in_specs=[
                pl.BlockSpec((Tu, 128, 128), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM),  # u7r
                pl.BlockSpec((Tu, 128, 128), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM),  # u7i
                pl.BlockSpec((Tu, TOP, TOP), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM),  # utr
                pl.BlockSpec((Tu, TOP, TOP), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM),  # uti
                pl.BlockSpec((1, nb, T, 128), lambda i: (i, 0, 0, 0),
                             memory_space=pltpu.SMEM),  # params (scalar reads)
            ],
            out_specs=pl.BlockSpec((1, nb, 8, 128), lambda i: (i, 0, 0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((2 * nb, TOP, _C), jnp.float32),   # states
            ],
            # default scoped-vmem limit is 16 MB; state (8 MB at L=20) +
            # full-plane kick/diagonal temporaries need more (v5e has
            # 128 MB physical VMEM)
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=110 * 1024 * 1024),
            interpret=interpret,
        )(u7r, u7i, utr, uti, params)
        a_raw = a_raw.reshape(n_pad, 1024)[:n_traj, :T]

        sig_start = jnp.concatenate(
            [jnp.zeros((n_traj, 1), jnp.uint32), sig_after[:, :-1]], axis=1)
        sq = (1 - 2 * ((sig_start >> q) & jnp.uint32(1)).astype(jnp.int32)
              ).astype(jnp.float32)
        return ancilla_factor * s0 * sq * a_raw

    return jax.vmap(per_instance)(hs, phis, keys)
