"""VMEM-resident whole-trajectory Floquet kernel (x-polarized forward).

The noisy scan at the XLA level runs ~15-30x below the noiseless fast path
(docs/PERFORMANCE.md): any per-cycle traced operand deopts the loop. This
kernel sidesteps XLA's loop entirely: ONE grid step evolves ONE trajectory
through ALL T cycles with the state RESIDENT in VMEM (8 MB at L=20 against
the measured ~16 MB budget), so per-cycle HBM traffic is just the D0
diagonal stream.

Layout (14 <= L <= 20): planar f32 planes shaped (2, TOP, 16384) with
TOP = 2**(L-14); the 16384 axis is global-index bits 0..13 (c = chi*128 +
clo), the TOP axis bits 14..L-1. One cycle:

  1. per-top-row kick: M_t <- U7 @ M_t @ U7^T   (complex, 128x128 tiles,
     bits 7..13 left, bits 0..6 right)
  2. top kick: plane <- (U_top @ plane) over the TOP axis (absent at L=14)
  3. fused elementwise pass over column chunks, streaming D0 from HBM:
     v <- v * D0 * (-1)^{popcount(idx & zm)} * exp(i * SUM sigma/bond-flip
     angle terms)   [the sigma-frame noise factor, ops.pallas_noise math]
     ... while accumulating SUM |v|^2 z_q -> the NEXT cycle's A(t).

Per-cycle parameters (zm/sigma/flip bits + h/phi rows) are (T, 8, 128) VMEM
inputs; A(0) is trivial (basis state) and supplied by the host wrapper.
"""

from __future__ import annotations

import functools

from jax import lax

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dtc_tpu.core.sigma_evolve import presample_noise
from dtc_tpu.core.statevector import neel_index
from dtc_tpu.ops.diag import z_sign_mask, zz_z_diag_energy
from dtc_tpu.ops.pallas_noise import pack_cycle_params

# Kernel dot precision: HIGH = bf16x3 (~f32 accuracy, ~2x faster than
# HIGHEST full-f32; validated |A| bounded and ~1e-5 agreement vs HIGHEST).
import os as _os
_DOT_PRECISION = {
    "high": __import__("jax").lax.Precision.HIGH,
    "highest": __import__("jax").lax.Precision.HIGHEST,
}[_os.environ.get("DTC_TPU_KERNEL_PRECISION", "highest")]

_C = 16384  # 2**14 column axis (bits 0..13)
_W = 1024   # elementwise / top-matmul column chunk


def _cmul(ar, ai, br, bi):
    return ar * br - ai * bi, ar * bi + ai * br


def _make_kernel(L: int, T: int, q: int, b0: int, has_top: bool):  # noqa: C901
    TOP = 1 << (L - 14)

    def kernel(u7r_ref, u7i_ref, utr_ref, uti_ref, par_ref, d0_hbm,
               a_out_ref, st_ref, d0buf, dma_sem):
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
            # ------- kick bits 0..6 and 7..13: chunked batched matmuls -----
            # Per chunk of R top-rows: G_lo contracts the low-7 axis as one
            # (R*128, 128) @ U7^T; a VMEM axis swap exposes the mid-7 axis
            # for a second right-multiply; swap back. Chunking keeps live
            # values inside the 16 MB scoped-VMEM budget (full-plane values
            # measured 57 MB — OOM).
            u7rt = u7r_ref[...].T
            u7it = u7i_ref[...].T
            R = min(8, TOP)

            def big_right(mr, mi):
                r = (jnp.dot(mr, u7rt, preferred_element_type=jnp.float32,
                             precision=_DOT_PRECISION)
                     - jnp.dot(mi, u7it, preferred_element_type=jnp.float32,
                               precision=_DOT_PRECISION))
                i = (jnp.dot(mr, u7it, preferred_element_type=jnp.float32,
                             precision=_DOT_PRECISION)
                     + jnp.dot(mi, u7rt, preferred_element_type=jnp.float32,
                               precision=_DOT_PRECISION))
                return r, i

            def kick_chunk(t, __):
                sl = pl.ds(t * R, R)
                mr = st_ref[0, sl].reshape(R * 128, 128)
                mi = st_ref[1, sl].reshape(R * 128, 128)
                mr, mi = big_right(mr, mi)  # G_lo
                mr = jnp.swapaxes(mr.reshape(R, 128, 128), 1, 2).reshape(
                    R * 128, 128)
                mi = jnp.swapaxes(mi.reshape(R, 128, 128), 1, 2).reshape(
                    R * 128, 128)
                mr, mi = big_right(mr, mi)  # G_mid
                st_ref[0, sl] = jnp.swapaxes(
                    mr.reshape(R, 128, 128), 1, 2).reshape(R, _C)
                st_ref[1, sl] = jnp.swapaxes(
                    mi.reshape(R, 128, 128), 1, 2).reshape(R, _C)
                return __

            jax.lax.fori_loop(0, TOP // R, kick_chunk, None)

            # ---------------- top kick (bits 14..L-1) ---------------------
            if has_top:
                def top_chunk(c, __):
                    sl = pl.ds(c * _W, _W)
                    mr = st_ref[0, :, sl]
                    mi = st_ref[1, :, sl]
                    r2 = (jnp.dot(utr_ref[...], mr, preferred_element_type=jnp.float32, precision=_DOT_PRECISION)
                          - jnp.dot(uti_ref[...], mi, preferred_element_type=jnp.float32, precision=_DOT_PRECISION))
                    i2 = (jnp.dot(utr_ref[...], mi, preferred_element_type=jnp.float32, precision=_DOT_PRECISION)
                          + jnp.dot(uti_ref[...], mr, preferred_element_type=jnp.float32, precision=_DOT_PRECISION))
                    st_ref[0, :, sl] = r2
                    st_ref[1, :, sl] = i2
                    return __

                jax.lax.fori_loop(0, _C // _W, top_chunk, None)

            # -------- fused elementwise: D0 x noise factor + measure ------
            def ew_chunk(c, acc):
                sl = pl.ds(c * _W, _W)
                dma = pltpu.make_async_copy(d0_hbm.at[:, :, sl], d0buf, dma_sem)
                dma.start()
                # index bits for this chunk
                lcol = (jax.lax.broadcasted_iota(jnp.uint32, (TOP, _W), 1)
                        + jnp.uint32(c * _W))
                idx = (jax.lax.broadcasted_iota(jnp.uint32, (TOP, _W), 0)
                       << 14) | lcol
                zpar = jnp.zeros((TOP, _W), jnp.float32)
                ang = jnp.zeros((TOP, _W), jnp.float32)
                prev_z = None
                for qq in range(L):
                    bit = ((idx >> qq) & 1).astype(jnp.int32).astype(jnp.float32)
                    z = 1.0 - 2.0 * bit
                    zpar = zpar + bit * par_ref[0, cyc, 0, qq]
                    ang = ang + (par_ref[0, cyc, 1, qq] * par_ref[0, cyc, 3, qq]) * z
                    if qq > 0:
                        ang = ang + (par_ref[0, cyc, 2, qq - 1]
                                     * par_ref[0, cyc, 4, qq - 1]) * (prev_z * z)
                    prev_z = z
                sign = 1.0 - 2.0 * (zpar % 2.0)
                fr = sign * jnp.cos(ang)
                fi = sign * jnp.sin(ang)
                dma.wait()
                fr, fi = _cmul(fr, fi, d0buf[0], d0buf[1])
                re = st_ref[0, :, sl]
                im = st_ref[1, :, sl]
                re2, im2 = _cmul(re, im, fr, fi)
                st_ref[0, :, sl] = re2
                st_ref[1, :, sl] = im2
                zq = 1.0 - 2.0 * ((idx >> q) & 1).astype(jnp.int32).astype(jnp.float32)
                return acc + jnp.sum((re2 * re2 + im2 * im2) * zq)

            a_next = jax.lax.fori_loop(0, _C // _W, ew_chunk, 0.0)
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
        e0 = zz_z_diag_energy(h, ph, L, dtype=jnp.float32)
        d0 = jnp.stack([jnp.cos(-0.5 * e0), jnp.sin(-0.5 * e0)]).reshape(
            2, TOP, _C)
        n_traj = ks.shape[0]
        if p > 0.0:
            def sample(key):
                _, zm, _, csum = presample_noise(key, p, T, L)
                return jax.vmap(
                    lambda z, sg: pack_cycle_params(z, sg, h, ph, L)
                )(zm, csum), csum

            params, sig_after = jax.vmap(sample)(ks)  # (c,T,8,128), (c,T)
        else:
            params = jnp.zeros((n_traj, T, 8, 128), jnp.float32)
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
                             memory_space=pltpu.VMEM),  # params
                pl.BlockSpec(memory_space=pltpu.ANY),   # d0 (HBM)
            ],
            out_specs=pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((2, TOP, _C), jnp.float32),   # state
                pltpu.VMEM((2, TOP, _W), jnp.float32),   # d0 chunk buf
                pltpu.SemaphoreType.DMA,
            ],
            interpret=interpret,
        )(u7r, u7i, utr, uti, params, d0)
        a_raw = a_raw.reshape(n_traj, 1024)[:, :T]

        sig_start = jnp.concatenate(
            [jnp.zeros((n_traj, 1), jnp.uint32), sig_after[:, :-1]], axis=1)
        sq = (1 - 2 * ((sig_start >> q) & jnp.uint32(1)).astype(jnp.int32)
              ).astype(jnp.float32)
        return ancilla_factor * s0 * sq * a_raw

    return jax.vmap(per_instance)(hs, phis, keys)
