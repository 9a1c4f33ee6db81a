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

Per-cycle parameters (zm/sigma/flip bits + h/phi rows) are (T, 8, 128)
tiles in SMEM (scalar coefficient reads are register-speed there; VMEM
scalar reads measured ~8% of kernel time). A(0) is trivial (basis state)
and supplied by the host wrapper.

Empirical tuning notes (v5e, all variants validated to <=8e-6 vs the
sigma engine): DEFAULT-precision dots are NOT faster than HIGHEST here
(the kernel is not MXU-FLOP-bound), Mosaic rejects Precision.HIGH;
removing the axis swaps does not help (relayout moves into the dots);
chunking the kick/elementwise passes only hurts once the scoped-VMEM
limit is raised via CompilerParams (default 16 MB).
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
from dtc_tpu.ops.pallas_noise import pack_cycle_params

# Kernel dot precision (HIGHEST = full f32; "default" = raw bf16, only for
# roofline probes — measured no faster, see module docstring).
import os as _os
_DOT_PRECISION = {
    "default": jax.lax.Precision.DEFAULT,
    "highest": jax.lax.Precision.HIGHEST,
}[_os.environ.get("DTC_TPU_KERNEL_PRECISION", "highest")]

_C = 16384  # 2**14 column axis (bits 0..13)

_HALF_PI = float(np.pi / 2)


def _cmul(ar, ai, br, bi):
    return ar * br - ai * bi, ar * bi + ai * br


def _make_kernel(L: int, T: int, q: int, b0: int, has_top: bool):  # noqa: C901
    TOP = 1 << (L - 14)

    def kernel(u7r_ref, u7i_ref, utr_ref, uti_ref, par_ref,
               a_out_ref, st_ref):
        # a_out_ref: (1, 8, 128) VMEM block for THIS trajectory; A(t) stored
        # at flat position t via one-hot vector adds (scalar VMEM stores are
        # unsupported on this backend)
        arow = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
        alane = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
        apos = arow * 128 + alane
        # ------------------------------------------------------------------
        # init: basis state b0 (vector write; scalar VMEM stores unsupported)
        col = jax.lax.broadcasted_iota(jnp.uint32, (TOP, _C), 1)
        topi = jax.lax.broadcasted_iota(jnp.uint32, (TOP, _C), 0)
        gidx = (topi << 14) | col
        st_ref[0] = jnp.where(gidx == jnp.uint32(b0), 1.0, 0.0)
        st_ref[1] = jnp.zeros((TOP, _C), jnp.float32)

        def cycle(cyc, _):
            # ------------- kick bits 0..6 and 7..13: full plane ------------
            u7rt = u7r_ref[...].T
            u7it = u7i_ref[...].T
            u7st = u7rt + u7it

            def big_right(mr, mi):
                # Karatsuba complex matmul: 3 dots instead of 4
                p1 = jnp.dot(mr, u7rt, preferred_element_type=jnp.float32,
                             precision=_DOT_PRECISION)
                p2 = jnp.dot(mi, u7it, preferred_element_type=jnp.float32,
                             precision=_DOT_PRECISION)
                p3 = jnp.dot(mr + mi, u7st, preferred_element_type=jnp.float32,
                             precision=_DOT_PRECISION)
                return p1 - p2, p3 - p1 - p2

            mr = st_ref[0].reshape(TOP * 128, 128)
            mi = st_ref[1].reshape(TOP * 128, 128)
            mr, mi = big_right(mr, mi)  # G_lo (bits 0..6)
            mr = jnp.swapaxes(mr.reshape(TOP, 128, 128), 1, 2).reshape(
                TOP * 128, 128)
            mi = jnp.swapaxes(mi.reshape(TOP, 128, 128), 1, 2).reshape(
                TOP * 128, 128)
            mr, mi = big_right(mr, mi)  # G_mid (bits 7..13)
            mr = jnp.swapaxes(mr.reshape(TOP, 128, 128), 1, 2).reshape(TOP, _C)
            mi = jnp.swapaxes(mi.reshape(TOP, 128, 128), 1, 2).reshape(TOP, _C)

            # ---------------- top kick (bits 14..L-1) ----------------------
            if has_top:
                q1 = jnp.dot(utr_ref[...], mr,
                             preferred_element_type=jnp.float32,
                             precision=_DOT_PRECISION)
                q2 = jnp.dot(uti_ref[...], mi,
                             preferred_element_type=jnp.float32,
                             precision=_DOT_PRECISION)
                q3 = jnp.dot(utr_ref[...] + uti_ref[...], mr + mi,
                             preferred_element_type=jnp.float32,
                             precision=_DOT_PRECISION)
                mr, mi = q1 - q2, q3 - q1 - q2

            # -------- fused diagonal (static + noise + sign) + measure -----
            # per-cycle bit coefficients: register-speed SMEM scalar reads
            def cz(qq):
                return (par_ref[0, cyc, 3, qq] * (par_ref[0, cyc, 1, qq] - 0.5)
                        - _HALF_PI * par_ref[0, cyc, 0, qq])

            def cb(jj):
                return par_ref[0, cyc, 4, jj] * (par_ref[0, cyc, 2, jj] - 0.5)

            c0 = _HALF_PI * sum(par_ref[0, cyc, 0, qq] for qq in range(L))

            # low angle over the 14 column bits: (1, C)
            lci = jax.lax.broadcasted_iota(jnp.int32, (1, _C), 1)
            low = jnp.full((1, _C), c0, jnp.float32)
            prev_z = None
            for qq in range(14):
                z = (1 - 2 * ((lci >> qq) & 1)).astype(jnp.float32)
                low = low + cz(qq) * z
                if qq > 0:
                    low = low + cb(qq - 1) * (prev_z * z)
                prev_z = z
            zl13 = prev_z  # z of bit 13 (straddle partner)
            flr = jnp.cos(low)
            fli = jnp.sin(low)

            if has_top:
                # high angle over the TOP bits: (TOP, 1)
                hti = jax.lax.broadcasted_iota(jnp.int32, (TOP, 1), 0)
                high = jnp.zeros((TOP, 1), jnp.float32)
                prev_zh = None
                for qq in range(14, L):
                    zh = (1 - 2 * ((hti >> (qq - 14)) & 1)).astype(jnp.float32)
                    high = high + cz(qq) * zh
                    if qq > 14:
                        high = high + cb(qq - 1) * (prev_zh * zh)
                    prev_zh = zh
                zh14 = 1.0 - 2.0 * (hti & 1).astype(jnp.float32)
                fhr = jnp.cos(high)
                fhi = jnp.sin(high)
                s13 = cb(13)  # straddle bond: exp(+-i s13), sign z13*z14
                cp = jnp.cos(s13)
                sp = jnp.sin(s13)

            # measurement sign of qubit q (q < 14): (1, C)
            zq = (1 - 2 * ((lci >> q) & 1)).astype(jnp.float32)

            re2, im2 = _cmul(mr, mi, flr, fli)
            if has_top:
                re2, im2 = _cmul(re2, im2, fhr, fhi)
                f3i = (zh14 * zl13) * sp
                re2, im2 = _cmul(re2, im2, cp, f3i)
            st_ref[0] = re2
            st_ref[1] = im2
            a_next = jnp.sum((re2 * re2 + im2 * im2) * zq)

            # A(cyc+1) raw value (host applies s0/sigma/ancilla factors)
            @pl.when(cyc + 1 < T)
            def _():
                a_out_ref[0] = a_out_ref[0] + jnp.where(
                    apos == cyc + 1, a_next, 0.0)

            return _

        a_out_ref[0] = jnp.where(
            apos == 0, float(1 - 2 * ((b0 >> q) & 1)), 0.0)
        jax.lax.fori_loop(0, T, cycle, None)

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("L", "T", "p", "q", "initial_state", "ancilla_factor",
                     "interpret"),
)
def resident_forward_batch(hs, phis, angles, keys, *, L, T, p, q,
                           initial_state="vacuum", ancilla_factor=1.0,
                           interpret=False):
    """(inst, L), (inst, L-1), (T,1,2), (inst, c, 2) -> (inst, c, T).

    VMEM-resident x-pol forward autocorrelator; requires 14 <= L <= 20 and
    q < 14. Grid iterates trajectories; one grid step = one full trajectory.
    """
    if not (14 <= L <= 20):
        raise ValueError("resident kernel supports 14 <= L <= 20")
    TOP = 1 << (L - 14)
    b0 = 0 if initial_state == "vacuum" else neel_index(L)
    s0 = 1.0 if ((b0 >> q) & 1) == 0 else -1.0

    # constant matrices (planar real/imag)
    theta = angles[0, 0, 0]
    c, s = jnp.cos(theta / 2).astype(jnp.float32), jnp.sin(theta / 2).astype(jnp.float32)
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
        utr, uti = kpow(L - 14)
    else:
        utr = jnp.ones((1, 1), jnp.float32)
        uti = jnp.zeros((1, 1), jnp.float32)

    if T > 1024:
        raise ValueError("resident kernel supports T <= 1024")

    def per_instance(h, ph, ks):
        n_traj = ks.shape[0]
        if p > 0.0:
            def sample(key):
                _, zm, _, csum = presample_noise(key, p, T, L)
                return jax.vmap(
                    lambda z, sg: pack_cycle_params(z, sg, h, ph, L)
                )(zm, csum), csum

            params, sig_after = jax.vmap(sample)(ks)  # (c,T,8,128), (c,T)
        else:
            # noiseless: zm = sigma = 0 tiles still carry the h/phi rows the
            # kernel's fused diagonal needs (cz_q = -h_q/2, cb_j = -phi_j/2)
            tile = pack_cycle_params(jnp.uint32(0), jnp.uint32(0), h, ph, L)
            params = jnp.broadcast_to(tile, (n_traj, T, 8, 128))
            sig_after = jnp.zeros((n_traj, T), jnp.uint32)

        a_raw = pl.pallas_call(
            _make_kernel(L, T, q, b0, TOP > 1),
            out_shape=jax.ShapeDtypeStruct((n_traj, 8, 128), jnp.float32),
            grid=(n_traj,),
            in_specs=[
                pl.BlockSpec((128, 128), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),  # u7r
                pl.BlockSpec((128, 128), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),  # u7i
                pl.BlockSpec((TOP, TOP), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),  # utr
                pl.BlockSpec((TOP, TOP), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),  # uti
                pl.BlockSpec((1, T, 8, 128), lambda i: (i, 0, 0, 0),
                             memory_space=pltpu.SMEM),  # params (scalar reads)
            ],
            out_specs=pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((2, TOP, _C), jnp.float32),   # state
            ],
            # default scoped-vmem limit is 16 MB; state (8 MB at L=20) +
            # full-plane kick/diagonal temporaries need more (v5e has
            # 128 MB physical VMEM)
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=64 * 1024 * 1024),
            interpret=interpret,
        )(u7r, u7i, utr, uti, params)
        a_raw = a_raw.reshape(n_traj, 1024)[:, :T]

        sig_start = jnp.concatenate(
            [jnp.zeros((n_traj, 1), jnp.uint32), sig_after[:, :-1]], axis=1)
        sq = (1 - 2 * ((sig_start >> q) & jnp.uint32(1)).astype(jnp.int32)
              ).astype(jnp.float32)
        return ancilla_factor * s0 * sq * a_raw

    return jax.vmap(per_instance)(hs, phis, keys)
