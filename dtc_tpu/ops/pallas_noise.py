"""Pallas TPU kernel: fused per-cycle noise/diagonal-correction factor.

Runtime law discovered on this backend (see core.sigma_evolve docstring):
an XLA scan body whose operands are all loop-invariant compiles to a
near-peak-MXU path; ANY traced per-cycle data flowing into XLA ops drops the
whole body ~28x. The escape hatch: route the per-cycle noise work through an
OPAQUE pallas_call — XLA cannot fuse into it, so the surrounding matmul
pipeline keeps the fast path, and the kernel does the noise work in one
VMEM pass over the state.

The kernel applies, elementwise over global index s (state = planar f32
planes shaped (2, N/128, 128); an interleaved (N, 2) layout would pad the
2-wide lane dim to 128 — measured 64x VMEM blowup/OOM):

    factor(s) = (-1)^{popcount(s & zmask)} * exp(i * A(s))
    A(s) = sum_{q: sigma_q} h_q z_q(s) + sum_{b: flip_b} phi_b zz_b(s)

i.e. the sampled Pauli string's Z-sign plus the sigma-frame diagonal
correction D_sigma/D0 (core.sigma_evolve), computed by ACCUMULATING the
phase angle (39 FMAs) and one sincos — no transcendental-free chain of 39
complex multiplies, no 2^L-sized precomputed masks.

Per-cycle inputs pack into one (8, 128) f32 tile:
rows = [zm bits, sigma bits, bond-flip bits, h, phi, unused x3].
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# rows-per-block: 512 sublane rows x 128 lanes x 2 planes = 512 KB blocks,
# keeping the grid small (launch/step overhead measured dominant for tiny
# blocks) while 3 blocks fit VMEM comfortably.
DEFAULT_ROWS = 256


def _make_kernel(L: int, rows: int, lanes: int = 128):
    def kernel(par_ref, x_ref, o_ref):
        i = pl.program_id(0)
        base = jnp.uint32(i * rows * lanes)
        lane = jax.lax.broadcasted_iota(jnp.uint32, (rows, lanes), 1)
        row = jax.lax.broadcasted_iota(jnp.uint32, (rows, lanes), 0)
        idx = base + row * jnp.uint32(lanes) + lane

        zpar = jnp.zeros((rows, lanes), jnp.float32)
        ang = jnp.zeros((rows, lanes), jnp.float32)
        prev_z = None
        for q in range(L):
            bit = ((idx >> q) & 1).astype(jnp.int32).astype(jnp.float32)
            z = 1.0 - 2.0 * bit
            zpar = zpar + bit * par_ref[0, q]
            ang = ang + (par_ref[1, q] * par_ref[3, q]) * z
            if q > 0:
                ang = ang + (par_ref[2, q - 1] * par_ref[4, q - 1]) * (prev_z * z)
            prev_z = z
        sign = 1.0 - 2.0 * (zpar % 2.0)
        fr = sign * jnp.cos(ang)
        fi = sign * jnp.sin(ang)
        re = x_ref[0]
        im = x_ref[1]
        o_ref[0] = re * fr - im * fi
        o_ref[1] = re * fi + im * fr

    return kernel


def pack_cycle_params(zm, sigma, hs, phis, L):
    """Per-cycle (8, 128) parameter tile (traceable; tiny).

    zm, sigma: uint32 scalars; hs (L,), phis (L-1,) raw angles — the kernel
    accumulates the phase and does one sincos.
    """
    qs = jnp.arange(128, dtype=jnp.uint32)
    zmb = ((zm >> qs) & 1).astype(jnp.int32).astype(jnp.float32)
    sgb = ((sigma >> qs) & 1).astype(jnp.int32).astype(jnp.float32)
    flip = jnp.zeros((128,), jnp.float32)
    flip = flip.at[: L - 1].set(jnp.abs(sgb[: L - 1] - sgb[1:L]))
    hrow = jnp.zeros((128,), jnp.float32).at[:L].set(hs.astype(jnp.float32))
    prow = jnp.zeros((128,), jnp.float32).at[: L - 1].set(phis.astype(jnp.float32))
    pad = jnp.zeros((3, 128), jnp.float32)
    return jnp.concatenate(
        [jnp.stack([zmb, sgb, flip, hrow, prow]), pad], axis=0)


def pack_cycle_params_compact(zm, sigma, hs, phis, L, width: int = 128):
    """Per-cycle (width,) parameter ROW for the SMEM-resident kernels:
    lanes [0,L) noise-Z bits n_q, [L,2L) sigma bits, [2L,3L-1) bond flips,
    [3L-1,4L-1) h_q, [4L-1,5L-2) phi_j  (5L-2 <= width; width=128 covers
    L <= 26, the streamed kernels switch to width=256 past that — and the
    echo tile builder needs 4 FLAG lanes at width-4..width-1, so echo rows
    go wide already at L = 26).

    8x smaller than the (8, 128) tile — the SMEM input window (double
    buffered) capped the trajectories-per-grid-step batching at
    nb*T*8*128*4*2 <= 1 MB; compact rows lift that to nb*T <= 1024."""
    if 5 * L - 2 > width:
        raise ValueError(f"L={L} needs {5 * L - 2} lanes > width={width}")
    qs = jnp.arange(L, dtype=jnp.uint32)
    zmb = ((zm >> qs) & 1).astype(jnp.int32).astype(jnp.float32)
    sgb = ((sigma >> qs) & 1).astype(jnp.int32).astype(jnp.float32)
    flip = jnp.abs(sgb[: L - 1] - sgb[1:L])
    return jnp.concatenate([
        zmb, sgb, flip, hs.astype(jnp.float32), phis.astype(jnp.float32),
        jnp.zeros((width - (5 * L - 2),), jnp.float32)])


def pack_device_cycle_params_compact(zm, sig_a, sig_b, sig_c, hs, phis, L,
                                     width: int = 128):
    """Device-noise variant of pack_cycle_params_compact: the x-kernel row
    format carries DEVICE event structure unchanged because the kernel's
    angle formula reads the sig lanes only for h-corrections and the flip
    lanes only for bonds — so per-coefficient-class sigma checkpoints
    (core.device_evolve._device_presample: sig_a before the even-bond
    sublayer, sig_b before the odd, sig_c at cycle end) pack as:
    n = the cycle's COMBINED Z-mask (all 1q+2q events; signs compose by
    XOR), sig = sig_c bits (the field h terms apply last), flip[j] from
    sig_a for even bonds / sig_b for odd (each RZZ sublayer applies at its
    own pre-event frame). The SAME Pallas kernels then evolve device-noise
    trajectories exactly (constant x drives, K=1) — no kernel change.
    Mirrors NoiseModel.from_backend usage
    (autocorr-delta-a-single-qiskit-fast.py:77-79)."""
    if 5 * L - 2 > width:
        raise ValueError(f"L={L} needs {5 * L - 2} lanes > width={width}")
    qs = jnp.arange(L, dtype=jnp.uint32)
    zmb = ((zm >> qs) & 1).astype(jnp.int32).astype(jnp.float32)
    scb = ((sig_c >> qs) & 1).astype(jnp.int32).astype(jnp.float32)
    sab = ((sig_a >> qs) & 1).astype(jnp.int32).astype(jnp.float32)
    sbb = ((sig_b >> qs) & 1).astype(jnp.int32).astype(jnp.float32)
    flip_a = jnp.abs(sab[: L - 1] - sab[1:L])
    flip_b = jnp.abs(sbb[: L - 1] - sbb[1:L])
    even = (jnp.arange(L - 1) % 2 == 0)
    flip = jnp.where(even, flip_a, flip_b)
    return jnp.concatenate([
        zmb, scb, flip, hs.astype(jnp.float32), phis.astype(jnp.float32),
        jnp.zeros((width - (5 * L - 2),), jnp.float32)])


@functools.partial(jax.jit, static_argnames=("L", "interpret"))
def apply_noise_factor(state_planar, params, *, L, interpret=False):
    """state (2, 2**L) f32 planes; params (8, 128) from pack_cycle_params."""
    N = state_planar.shape[-1]
    if N < 128:  # tiny systems (tests): one block of shape (2, 1, N)
        nrows, lanes = 1, N
        rows = 1
    else:
        nrows, lanes = N // 128, 128
        rows = min(DEFAULT_ROWS, nrows)
    st3 = state_planar.reshape(2, nrows, lanes)
    out = pl.pallas_call(
        _make_kernel(L, rows, lanes),
        out_shape=jax.ShapeDtypeStruct((2, nrows, lanes), jnp.float32),
        grid=(nrows // rows,),
        in_specs=[
            pl.BlockSpec((8, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((2, rows, lanes), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((2, rows, lanes), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM),
        # donate the state buffer: without aliasing, XLA inserts state copies
        # around the custom call inside the scan, each running at the
        # deopted elementwise rate (measured ~0.9s per 50 cycles)
        input_output_aliases={1: 0},
        interpret=interpret,
    )(params, st3)
    return out.reshape(2, N)
