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
    # vacuum/neel are Z eigenstates: single-state A(t) = s0 * <Z_q(t)>
    from dtc_tpu.core.statevector import neel_index

    b0 = 0 if initial_state == "vacuum" else neel_index(L)
    s0 = 1.0 if ((b0 >> q) & 1) == 0 else -1.0
    state0 = psi0

    def one_traj(key):
        keys_t = jax.random.split(key, T)

        def body(carry, inp):
            ang, k_t = inp
            a_t = ancilla_factor * s0 * jnp.sum(
                (jnp.real(carry) ** 2 + jnp.imag(carry) ** 2)
                * zq.astype(jnp.float32))
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
    from dtc_tpu.core.statevector import neel_index

    b0 = 0 if initial_state == "vacuum" else neel_index(L)
    s0 = 1.0 if ((b0 >> q) & 1) == 0 else -1.0
    state0 = psi0

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
        return ancilla_factor * s0 * jnp.sum(
            (jnp.real(state) ** 2 + jnp.imag(state) ** 2)
            * zq.astype(jnp.float32))

    return jax.vmap(one_traj)(keys)


# ---------------------------------------------------------------------------
# sigma-frame (gather-free) device-noise forward engine — survives large L
# (the gather path crashes the TPU worker above ~L=24; the factored engine
# has no gathers and was validated alive at L=27).


def _device_presample(key, model_p1, model_p2, epk, T, L):
    """Presample all device-noise events for one trajectory.

    Per cycle, in order: epk per-site 1q events (after the kick), one 2q
    event after the even-bond RZZ sublayer, one after the odd sublayer.
    Returns per-cycle combined z-mask, the three sigma checkpoints
    (sig_a: before D_even, sig_b: before D_odd, sig_c: cycle end), all
    (T,) uint32.
    """
    from dtc_tpu.core.sigma_evolve import _masks_from_codes

    k1, k2, k3 = jax.random.split(key, 3)
    u1 = jax.random.uniform(k1, (T, epk, L), dtype=jnp.float32)
    q1 = 0.25 * jnp.broadcast_to(model_p1, (L,))
    c1 = (u1 >= (1.0 - 3.0 * q1)).astype(jnp.int32) * (
        1 + jnp.floor((u1 - (1.0 - 3.0 * q1))
                      / jnp.maximum(q1, 1e-30)).astype(jnp.int32))
    c1 = jnp.clip(c1, 0, 3)
    xm1, zm1 = _masks_from_codes(c1, L)          # (T, epk)

    def bond_codes(u, p_bonds, start):
        bonds = [(i, i + 1) for i in range(start, L - 1, 2)]
        nb = len(bonds)
        p = jnp.broadcast_to(jnp.asarray(p_bonds), (nb,))
        q16 = p / 16.0
        idx = (u >= (1.0 - 15.0 * q16)).astype(jnp.int32) * (
            1 + jnp.floor((u - (1.0 - 15.0 * q16))
                          / jnp.maximum(q16, 1e-30)).astype(jnp.int32))
        idx = jnp.clip(idx, 0, 15)
        codes = jnp.zeros(u.shape[:-1] + (L,), dtype=jnp.int32)
        hi = jnp.asarray([b[0] for b in bonds], dtype=jnp.int32)
        lo = jnp.asarray([b[1] for b in bonds], dtype=jnp.int32)
        codes = codes.at[..., hi].set(idx >> 2)
        codes = codes.at[..., lo].set(idx & 3)
        return codes

    p2 = jnp.broadcast_to(model_p2, (L - 1,))
    ue = jax.random.uniform(k2, (T, (L - 1 + 1) // 2), dtype=jnp.float32)
    uo = jax.random.uniform(k3, (T, (L - 1) // 2), dtype=jnp.float32)
    ce = bond_codes(ue, p2[0::2], 0)
    co = bond_codes(uo, p2[1::2], 1)
    xme, zme = _masks_from_codes(ce, L)          # (T,)
    xmo, zmo = _masks_from_codes(co, L)

    xm_kick = xm1[:, 0]
    zm_all = zm1[:, 0]
    for e in range(1, epk):
        xm_kick = xm_kick ^ xm1[:, e]
        zm_all = zm_all ^ zm1[:, e]
    zm_all = zm_all ^ zme ^ zmo

    # prefix sigmas: sig_a after kick events, sig_b after even bond event,
    # sig_c after odd bond event (cycle end)
    def scan_sig(carry, inp):
        xk, xe, xo = inp
        sa = carry ^ xk
        sb = sa ^ xe
        sc = sb ^ xo
        return sc, (sa, sb, sc)

    _, (sig_a, sig_b, sig_c) = jax.lax.scan(
        scan_sig, jnp.uint32(0), (xm_kick, xme, xmo))
    return zm_all, sig_a, sig_b, sig_c


def _device_column_factors(q0, k, pend_zm, sa, sb, sc, exp_h, exp_p, L, dtype):
    """Column factors with per-coefficient-class sigmas: field h from sc,
    even bonds from sa, odd bonds from sb (exact event placement)."""
    from dtc_tpu.core.sigma_evolve import _bits

    j = jnp.arange(1 << k, dtype=jnp.uint32)
    out = jnp.ones((1 << k,), dtype=dtype)
    bits_c = _bits(sc, L)
    bits_a = _bits(sa, L)
    bits_b = _bits(sb, L)
    zm_bits = _bits(pend_zm, L)
    for q in range(q0, q0 + k):
        bit = ((j >> (q - q0)) & 1).astype(jnp.int32)
        nsign = jnp.where(zm_bits[q] * bit == 1, -1.0, 1.0)
        fq = jnp.where(bit == 0, exp_h[q], jnp.conj(exp_h[q]))
        fq = jnp.where(bits_c[q] == 1, fq, jnp.ones((), dtype))
        out = out * (nsign * fq)
    for b in range(q0, min(q0 + k - 1, L - 1)):
        sig = bits_a if b % 2 == 0 else bits_b
        flip = sig[b] ^ sig[b + 1]
        zz_pos = (((j >> (b - q0)) & 1) == ((j >> (b + 1 - q0)) & 1))
        gb = jnp.where(zz_pos, exp_p[b], jnp.conj(exp_p[b]))
        out = out * jnp.where(flip == 1, gb, jnp.ones((), dtype))
    return out


@functools.partial(
    jax.jit,
    static_argnames=("L", "T", "q", "initial_state", "ancilla_factor",
                     "events_per_kick", "interpret"),
)
def device_kernel_forward_batch(hs, phis, p_1q, p_2q, angles, keys, *, L, T,
                                q, initial_state="vacuum", ancilla_factor=1.0,
                                events_per_kick=2, interpret=False):
    """Device-noise forward A(t) through the x-only Pallas kernels
    (VERDICT r2 missing #3: device-noise trajectories previously ran only
    the deopted XLA sigma path).

    The kernels run UNCHANGED: pack_device_cycle_params_compact encodes
    the device event structure (per-site 1q events after the kick, 2q
    events after each RZZ sublayer — core.device_evolve._device_presample)
    into the same compact row the flat-noise kernels read, with
    per-coefficient-class sigma checkpoints in the sig/flip lanes.
    Constant x drives, K=1, q < 14; 17 <= L <= 23 rides the blocked-plane
    VMEM-resident kernel, 24 <= L <= 28 the HBM-streamed kernel.
    (L=27 is BASELINE config 4's scale — the FakeBrisbane analogue,
    autocorr-delta-a-single-qiskit-fast.py:77-79.)

    hs (L,), phis (L-1,), p_1q (L,), p_2q (L-1,), keys (n_traj, 2) ->
    (n_traj, T).
    """
    from dtc_tpu.ops.pallas_noise import pack_device_cycle_params_compact
    from dtc_tpu.ops.pallas_resident_blocked import blocked_forward_batch
    from dtc_tpu.ops.pallas_streamed import streamed_forward_batch

    if not (17 <= L <= 28):
        raise ValueError("device kernel path supports 17 <= L <= 28")
    width = 128 if 5 * L - 2 <= 128 else 256

    def sample(key):
        zm, sa, sb, sc = _device_presample(
            key, p_1q, p_2q, events_per_kick, T, L)
        rows = jax.vmap(lambda z, a, b, c: pack_device_cycle_params_compact(
            z, a, b, c, hs, phis, L, width=width))(zm, sa, sb, sc)
        return rows, sc

    rows, sig = jax.vmap(sample)(keys)  # (n, T, width), (n, T)
    batch = blocked_forward_batch if L <= 23 else streamed_forward_batch
    vals = batch(hs[None], phis[None], angles, keys[None], L=L, T=T, p=0.0,
                 q=q, initial_state=initial_state,
                 ancilla_factor=ancilla_factor, interpret=interpret,
                 ext_rows=rows[None], ext_sig=sig[None])
    return vals[0]


@functools.partial(
    jax.jit,
    static_argnames=("L", "T", "q", "initial_state", "dtype_name",
                     "events_per_kick"),
)
def device_sigma_forward_batch(hs, phis, p_1q, p_2q, angles, keys, *, L, T, q,
                               initial_state="vacuum", dtype_name="complex64",
                               ancilla_factor=1.0, events_per_kick=2):
    """Gather-free device-noise forward A(t): (n_traj, 2) keys -> (n_traj, T).

    x-polarized drives; single-state Z-eigenstate measurement; sigma-frame
    with the noise/diag-correction factors folded into kick columns (see
    core.sigma_evolve) generalized to the device event structure.
    """
    from dtc_tpu.core.sigma_evolve import _straddle_factor, _group_starts
    from dtc_tpu.experiments.engine import resolve_dtype
    from dtc_tpu.models.drives import slot_unitary
    from dtc_tpu.ops.kick import kron_power
    from dtc_tpu.ops.precision import gate_precision

    dtype = resolve_dtype(dtype_name)
    b0 = 0 if initial_state == "vacuum" else neel_index(L)
    s0 = 1.0 if ((b0 >> q) & 1) == 0 else -1.0
    zq = z_sign_mask(q, L)
    psi0 = initial_statevector(L, initial_state, dtype=dtype)
    d0 = zz_z_phase_mask(hs, phis, L, dtype=dtype)
    exp_h = jnp.exp(1j * hs.astype(jnp.float32)).astype(dtype)
    exp_p = jnp.exp(1j * phis.astype(jnp.float32)).astype(dtype)
    starts = _group_starts(L)
    u = slot_unitary(angles[0, 0, 0], angles[0, 0, 1], dtype)
    theta = angles[0, 0, 0]

    def per_traj(key):
        zm_all, sig_a, sig_b, sig_c = _device_presample(
            key, p_1q, p_2q, events_per_kick, T, L)
        sig_start = jnp.concatenate([jnp.zeros((1,), jnp.uint32), sig_c[:-1]])

        def body(carry, inp):
            st, pend = carry
            zm_t, sa, sb, sc, sig0 = inp
            pzm, pa, pb, pc = pend
            a_t = s0 * (1 - 2 * ((sig0 >> q) & jnp.uint32(1)).astype(
                jnp.int32)).astype(jnp.float32) * jnp.sum(
                (jnp.real(st) ** 2 + jnp.imag(st) ** 2)
                * zq.astype(jnp.float32))
            # straddle bonds for pending corrections
            for q0, kk in starts[:-1]:
                bb = q0 + kk - 1
                if bb < L - 1:
                    sig_for_bond = pa if bb % 2 == 0 else pb
                    st = _straddle_factor(st, bb, sig_for_bond, exp_p, L, dtype)
            # kick with pending factors folded into columns
            total = st.shape[-1]
            for q0, kk in starts:
                uk = kron_power(u, kk) if kk > 1 else u
                cols = _device_column_factors(q0, kk, pzm, pa, pb, pc,
                                              exp_h, exp_p, L, dtype)
                uk = uk * cols[None, :]
                high = total >> (q0 + kk)
                low = 1 << q0
                s2 = st.reshape(high, 1 << kk, low)
                s2 = jnp.einsum("ab,hbl->hal", uk, s2,
                                precision=gate_precision())
                st = s2.reshape(total)
            st = st * d0
            return (st, (zm_t, sa, sb, sc)), a_t * ancilla_factor

        zero = jnp.uint32(0)
        (_, _), a = jax.lax.scan(
            body, (psi0, (zero, zero, zero, zero)),
            (zm_all, sig_a, sig_b, sig_c, sig_start))
        return a

    return jax.vmap(per_traj)(keys)
