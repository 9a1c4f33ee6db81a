"""Planar-real sigma-frame forward engine (x-polarized drives) — the TPU
fast path.

State = separate (re, im) f32 planes, shape (2, 2**L). The scan body contains
ONLY loop-invariant XLA ops (kron-group matmuls with constant matrices, the
constant instance diagonal D0, the constant probe mask) — which this backend
compiles to its near-peak-MXU path — plus ONE opaque Pallas call per cycle
that applies the entire per-cycle noise factor (ops.pallas_noise). Per-cycle
data (packed parameter tiles, presampled outside the scan) flows exclusively
into the Pallas operand, so the XLA fast path survives.

Used automatically by the sweep engine for polarization='x' trajectories;
other drive families use the factored complex engine (core.sigma_evolve).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from dtc_tpu.core.sigma_evolve import presample_noise
from dtc_tpu.core.statevector import neel_index
from dtc_tpu.ops.diag import z_sign_mask, zz_z_diag_energy
from dtc_tpu.ops.pallas_noise import apply_noise_factor, pack_cycle_params
from dtc_tpu.ops.precision import gate_precision

_GROUP = 7


def _group_starts(L, group=_GROUP):
    starts = []
    q = 0
    while q < L:
        starts.append((q, min(group, L - q)))
        q += group
    return starts


def _rx_kron_planar(theta, k):
    """Real/imag parts of RX(theta)^{(x)k} (host-free, traced)."""
    theta = jnp.asarray(theta, jnp.float32)
    c, s = jnp.cos(theta / 2), jnp.sin(theta / 2)
    rr = jnp.array([[1.0, 0.0], [0.0, 1.0]], jnp.float32) * c
    ri = jnp.array([[0.0, -1.0], [-1.0, 0.0]], jnp.float32) * s
    kr, ki = rr, ri
    for _ in range(k - 1):
        kr, ki = (jnp.kron(kr, rr) - jnp.kron(ki, ri),
                  jnp.kron(kr, ri) + jnp.kron(ki, rr))
    return kr, ki


def _planar_matmul(state, ukr, uki, q0, k, N):
    re = state[0].reshape(N >> (q0 + k), 1 << k, 1 << q0)
    im = state[1].reshape(N >> (q0 + k), 1 << k, 1 << q0)
    prec = gate_precision()
    re2 = (jnp.einsum("ab,hbl->hal", ukr, re, precision=prec)
           - jnp.einsum("ab,hbl->hal", uki, im, precision=prec))
    im2 = (jnp.einsum("ab,hbl->hal", ukr, im, precision=prec)
           + jnp.einsum("ab,hbl->hal", uki, re, precision=prec))
    return jnp.stack([re2.reshape(N), im2.reshape(N)])


@functools.partial(
    jax.jit,
    static_argnames=("L", "T", "p", "q", "initial_state", "dtype_name",
                     "ancilla_factor", "interpret"),
)
def planar_forward_batch(hs, phis, angles, keys, *, L, T, p, q, initial_state,
                         dtype_name, ancilla_factor, interpret=False):
    """(inst, L), (inst, L-1), (T, 1, 2), (inst, c, 2) -> (inst, c, T).

    x-polarized forward autocorrelator for Z-eigenstate initial states.
    dtype_name accepted for API parity (computation is f32 planes).
    """
    N = 1 << L
    b0 = 0 if initial_state == "vacuum" else neel_index(L)
    s0 = 1.0 if ((b0 >> q) & 1) == 0 else -1.0
    zq = z_sign_mask(q, L)
    starts = _group_starts(L)

    def per_instance(h, ph, ks):
        # constant diagonal D0 planes
        e0 = zz_z_diag_energy(h, ph, L, dtype=jnp.float32)
        d0r = jnp.cos(-0.5 * e0)
        d0i = jnp.sin(-0.5 * e0)
        uks = [_rx_kron_planar(angles[0, 0, 0], k) for _, k in starts]

        def per_traj(key):
            if p > 0.0:
                _, zm, _, csum = presample_noise(key, p, T, L)
                params = jax.vmap(
                    lambda z, sg: pack_cycle_params(z, sg, h, ph, L)
                )(zm, csum)  # (T, 8, 128)
                sig_after = csum
            else:
                params = jnp.zeros((T, 8, 128), jnp.float32)
                params = params.at[:, 3, :L].set(1.0)  # ehr=1 unused anyway
                sig_after = jnp.zeros((T,), jnp.uint32)

            st0 = jnp.zeros((2, N), jnp.float32).at[0, b0].set(1.0)

            def body(st, par):
                a_t = jnp.sum((st[0] * st[0] + st[1] * st[1]) * zq)
                for (q0, k), (ukr, uki) in zip(starts, uks):
                    st = _planar_matmul(st, ukr, uki, q0, k, N)
                re2 = st[0] * d0r - st[1] * d0i
                im2 = st[0] * d0i + st[1] * d0r
                st = jnp.stack([re2, im2])
                if p > 0.0:
                    st = apply_noise_factor(st, par, L=L, interpret=interpret)
                return st, a_t

            _, a = jax.lax.scan(body, st0, params)
            # sigma_q measurement signs: A(t) uses sigma at cycle START
            sig_start = jnp.concatenate(
                [jnp.zeros((1,), jnp.uint32), sig_after[:-1]])
            sq = (1 - 2 * ((sig_start >> q) & jnp.uint32(1)).astype(jnp.int32)
                  ).astype(jnp.float32)
            return ancilla_factor * s0 * sq * a

        return jax.vmap(per_traj)(ks)

    return jax.vmap(per_instance)(hs, phis, keys)
