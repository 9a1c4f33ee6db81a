"""Floquet evolution under DEVICE noise models (calibration-derived).

Differences vs the flat Aer-custom model (core.evolve):
- per-SITE 1q depolarizing probabilities (p_1q vector) after each kick gate
  (x `events_per_kick`, default 2: on heavy-hex hardware rx transpiles to
  two sx pulses, each carrying the 1q error);
- per-BOND 2q depolarizing after each RZZ sublayer — so the diagonal is
  split into even-bond / odd-bond / field masks instead of one fused mask
  (2q Pauli errors do not commute through the other sublayer);
- readout assignment errors applied as exact (1-2*eps) contractions.

Mirrors NoiseModel.from_backend(FakeBrisbane()) usage
(autocorr-delta-a-single-qiskit-fast.py:77-79, use_fakebackend=1) with a
calibration-schema import instead of a qiskit backend object.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from dtc_tpu.core.statevector import initial_statevector
from dtc_tpu.models.drives import slot_unitary
from dtc_tpu.ops.diag import z_sign_mask, zz_z_phase_mask
from dtc_tpu.ops.kick import apply_uniform_1q_layer
from dtc_tpu.ops.paulis import (
    apply_pauli_string,
    pauli_string_masks,
    sample_bond_depolarizing_codes,
    sample_depolarizing_codes,
)


def _masks_split(hs, phis, L, dtype):
    """(even-bond, odd-bond, field) phase masks whose product is the fused one."""
    zeros_h = jnp.zeros_like(hs)
    zeros_p = jnp.zeros_like(phis)
    idx = jnp.arange(L - 1)
    phis_even = jnp.where(idx % 2 == 0, phis, 0.0)
    phis_odd = jnp.where(idx % 2 == 1, phis, 0.0)
    m_even = zz_z_phase_mask(zeros_h, phis_even, L, dtype=dtype)
    m_odd = zz_z_phase_mask(zeros_h, phis_odd, L, dtype=dtype)
    m_field = zz_z_phase_mask(hs, zeros_p, L, dtype=dtype)
    return m_even, m_odd, m_field


def _apply_codes(state, codes):
    xm, zm, ny = pauli_string_masks(codes)
    return apply_pauli_string(state, xm, zm, ny)


def device_forward_cycle(state, ang, masks, p_1q, p_2q, key, *, L, K, dtype,
                         events_per_kick=2):
    m_even, m_odd, m_field = masks
    idx = jnp.arange(L - 1)
    p2_even = jnp.where(idx % 2 == 0, p_2q, 0.0)[::2]
    p2_odd = jnp.where(idx % 2 == 1, p_2q, 0.0)[1::2]
    for k in range(K):
        u = slot_unitary(ang[k, 0], ang[k, 1], dtype)
        state = apply_uniform_1q_layer(state, u, L)
        for ev in range(events_per_kick):
            codes = sample_depolarizing_codes(
                jax.random.fold_in(key, 7 * k + ev), p_1q, (L,))
            state = _apply_codes(state, codes)
    state = state * m_even
    state = _apply_codes(state, sample_bond_depolarizing_codes(
        jax.random.fold_in(key, 101), p2_even, 0, L))
    state = state * m_odd
    state = _apply_codes(state, sample_bond_depolarizing_codes(
        jax.random.fold_in(key, 102), p2_odd, 1, L))
    state = state * m_field  # rz is virtual on hardware: no error
    return state


@functools.partial(
    jax.jit,
    static_argnames=("L", "T", "K", "q", "initial_state", "dtype_name",
                     "events_per_kick"),
)
def device_autocorr_forward(hs, phis, p_1q, p_2q, angles, keys, *, L, T, K, q,
                            initial_state="vacuum", dtype_name="complex64",
                            ancilla_factor=1.0, events_per_kick=2):
    """Trajectory-batched A(t) under a device-noise model.

    Real-boundary jit: (L,), (L-1,) calibration vectors; keys (n_traj, 2);
    returns (n_traj, T). `ancilla_factor` should come from
    DeviceNoiseModel.ancilla_interferometric_factor() x readout contraction.
    """
    from dtc_tpu.experiments.engine import resolve_dtype

    dtype = resolve_dtype(dtype_name)
    masks = _masks_split(hs, phis, L, dtype)
    zq = z_sign_mask(q, L)
    psi0 = initial_statevector(L, initial_state, dtype=dtype)
    state0 = jnp.stack([psi0, psi0 * zq.astype(dtype)])

    def one_traj(key):
        keys_t = jax.random.split(key, T)

        def body(carry, inp):
            ang, k_t = inp
            a_t = ancilla_factor * jnp.real(
                jnp.sum(jnp.conj(carry[0]) * zq.astype(dtype) * carry[1]))
            carry = device_forward_cycle(
                carry, ang, masks, p_1q, p_2q, k_t, L=L, K=K, dtype=dtype,
                events_per_kick=events_per_kick)
            return carry, a_t

        _, a = jax.lax.scan(body, state0, (angles, keys_t))
        return a

    return jax.vmap(one_traj)(keys)


def device_inverse_cycle(state, ang, masks, p_1q, p_2q, key, *, L, K, dtype,
                         events_per_kick=2, active=None):
    """Inverse cycle with device noise: reversed sublayers, daggered gates,
    noise after each (inverse) hardware gate; `active` masks noise off for
    padding steps in the fixed-length echo scan."""
    from dtc_tpu.models.drives import slot_unitary_inverse

    m_even, m_odd, m_field = masks
    p2_even = p_2q[0::2]
    p2_odd = p_2q[1::2]

    def codes_1q(salt):
        c = sample_depolarizing_codes(jax.random.fold_in(key, salt), p_1q, (L,))
        return c if active is None else jnp.where(active, c, 0)

    def codes_2q(salt, pb, start):
        c = sample_bond_depolarizing_codes(jax.random.fold_in(key, salt), pb, start, L)
        return c if active is None else jnp.where(active, c, 0)

    state = state * jnp.conj(m_field)
    state = state * jnp.conj(m_odd)
    state = _apply_codes(state, codes_2q(202, p2_odd, 1))
    state = state * jnp.conj(m_even)
    state = _apply_codes(state, codes_2q(201, p2_even, 0))
    for k in range(K - 1, -1, -1):
        u = slot_unitary_inverse(ang[k, 0], ang[k, 1], dtype)
        state = apply_uniform_1q_layer(state, u, L)
        for ev in range(events_per_kick):
            state = _apply_codes(state, codes_1q(7 * k + ev + 300))
    return state


@functools.partial(
    jax.jit,
    static_argnames=("L", "T", "K", "q", "initial_state", "dtype_name",
                     "events_per_kick"),
)
def device_autocorr_echo(hs, phis, p_1q, p_2q, angles, keys, t_value, *, L, T,
                         K, q, initial_state="vacuum", dtype_name="complex64",
                         ancilla_factor=1.0, events_per_kick=2):
    """Trajectory-batched device-noise echo A0(t): fixed-length masked scan."""
    from dtc_tpu.experiments.engine import resolve_dtype

    dtype = resolve_dtype(dtype_name)
    masks = _masks_split(hs, phis, L, dtype)
    zq = z_sign_mask(q, L)
    psi0 = initial_statevector(L, initial_state, dtype=dtype)
    state0 = jnp.stack([psi0, psi0 * zq.astype(dtype)])

    def one_traj(key):
        keys_t = jax.random.split(key, 2 * T)

        def body(carry, inp):
            kstep, key_k = inp
            fwd = kstep < t_value
            inv = (kstep >= t_value) & (kstep < 2 * t_value)
            idx = jnp.where(fwd, kstep, jnp.clip(2 * t_value - 1 - kstep, 0, T - 1))
            ang = angles[idx]
            # forward branch (noise masked off when not fwd)
            st_f = device_forward_cycle(
                carry, jnp.where(fwd, ang, jnp.zeros_like(ang)),
                tuple(jnp.where(fwd, m, jnp.ones_like(m)) for m in masks),
                jnp.where(fwd, p_1q, 0.0), jnp.where(fwd, p_2q, 0.0),
                key_k, L=L, K=K, dtype=dtype, events_per_kick=events_per_kick)
            # inverse branch
            st_i = device_inverse_cycle(
                carry, jnp.where(inv, ang, jnp.zeros_like(ang)),
                tuple(jnp.where(inv, m, jnp.ones_like(m)) for m in masks),
                jnp.where(inv, p_1q, 0.0), jnp.where(inv, p_2q, 0.0),
                key_k, L=L, K=K, dtype=dtype, events_per_kick=events_per_kick)
            carry = jnp.where(fwd, st_f, st_i)
            return carry, None

        state, _ = jax.lax.scan(body, state0, (jnp.arange(2 * T), keys_t))
        return ancilla_factor * jnp.real(
            jnp.sum(jnp.conj(state[0]) * zq.astype(dtype) * state[1]))

    return jax.vmap(one_traj)(keys)
