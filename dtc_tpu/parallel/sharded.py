"""Amplitude-sharded Floquet simulation via shard_map over the ('traj','amp')
mesh.

Sharding layout: the 2**L statevector is split along the TOP k = log2(n_amp)
index bits, so device a of the 'amp' axis holds global indices
[a*M, (a+1)*M), M = 2**(L-k). Consequences (SURVEY.md §2e "hard parts"):

- the fused RZZ+RZ diagonal and every Z-type mask are shard-local (computed
  from offset + local iota — zero comms);
- a 1q gate on a LOCAL qubit (index < L-k) is shard-local;
- a 1q gate on a GLOBAL qubit g is one nearest-pair `lax.ppermute` (shard a
  exchanges with a XOR 2^(g-(L-k))) + a 2-term local combine — the statevector
  analogue of halo exchange;
- a sampled Pauli string is: one unconditional pair exchange per global bit
  (selected by the string's x-mask, which is a traced value identical on all
  'amp' shards), a local XOR gather, and a locally computed source-index
  phase;
- expectations are local partial reductions + `psum` over 'amp';
- trajectories shard over 'traj' with no intra-step comms (the final mean is
  one scalar psum), so 'traj' may span DCN while 'amp' stays on ICI.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import PartitionSpec as P

from dtc_tpu.core.statevector import neel_index
from dtc_tpu.models.drives import slot_unitary, slot_unitary_inverse
from dtc_tpu.ops.diag import z_sign_mask, zz_z_diag_energy, zz_z_phase_mask
from dtc_tpu.ops.kick import apply_uniform_1q_layer
from dtc_tpu.ops.paulis import (
    _i_power,
    _parity,
    pauli_string_masks,
    sample_depolarizing_codes,
)


def _xor_perm(n_shards: int, bit: int):
    return [(i, i ^ (1 << bit)) for i in range(n_shards)]


def _global_1q(state, u, gbit, n_shards):
    """2x2 unitary on global qubit (shard-id bit ``gbit``): pair ppermute +
    local 2-term combine."""
    partner = jax.lax.ppermute(state, "amp", _xor_perm(n_shards, gbit))
    mybit = (jax.lax.axis_index("amp") >> gbit) & 1
    diag_c = jnp.where(mybit == 0, u[0, 0], u[1, 1])
    off_c = jnp.where(mybit == 0, u[0, 1], u[1, 0])
    return diag_c * state + off_c * partner


def _sharded_pauli_string(state, xmask, zmask, n_y, *, offset, local_size,
                          local_bits, n_shards):
    """Apply a Pauli string whose x-mask may touch global (shard-id) bits."""
    xhigh = (xmask >> local_bits).astype(jnp.uint32)
    for gb in range(int(np.log2(n_shards)) if n_shards > 1 else 0):
        partner = jax.lax.ppermute(state, "amp", _xor_perm(n_shards, gb))
        take_partner = ((xhigh >> gb) & 1).astype(bool)
        state = jnp.where(take_partner, partner, state)
    l = jnp.arange(local_size, dtype=jnp.uint32)
    xlow = xmask & jnp.uint32(local_size - 1)
    state = jnp.take(state, (l ^ xlow).astype(jnp.int32), axis=-1)
    src_global = (jnp.uint32(offset) + l) ^ jnp.uint32(xmask)
    sign = 1 - 2 * _parity(src_global & jnp.uint32(zmask))
    phase = _i_power(n_y, state.dtype)
    return state * (phase * sign.astype(state.real.dtype))


def make_sharded_autocorr_forward(
    mesh, *, L, T, K, p, q, initial_state="vacuum", dtype=jnp.complex64,
    ancilla_factor=None,
):
    """Build a jitted sharded forward-autocorrelator.

    Returns fn(angles (T,K,2), hs (L,), phis (L-1,), keys (n_traj, 2))
    -> A (T,) trajectory-averaged, replicated on all devices.
    `n_traj` must be a multiple of mesh.shape['traj'].
    """
    n_amp = mesh.shape["amp"]
    n_traj_dev = mesh.shape["traj"]
    k_bits = int(np.log2(n_amp))
    local_bits = L - k_bits
    if local_bits < 1:
        raise ValueError(f"L={L} too small for {n_amp} amp-shards")
    M = 1 << local_bits
    af = ((1.0 - p) ** 6 if p > 0 else 1.0) if ancilla_factor is None else ancilla_factor
    init_idx = 0 if initial_state == "vacuum" else neel_index(L)

    def local_fn(angles, hs, phis, keys):
        offset = (jax.lax.axis_index("amp") * M).astype(jnp.uint32)
        diag = zz_z_phase_mask(hs, phis, L, offset=offset, size=M, dtype=dtype)
        zq = z_sign_mask(q, L, offset=offset, size=M)
        gidx = jnp.arange(M, dtype=jnp.uint32) + offset
        psi = (gidx == jnp.uint32(init_idx)).astype(dtype)
        state0 = jnp.stack([psi, psi * zq.astype(dtype)])  # (2, M)

        def fwd_cycle(state, ang, key):
            for kk in range(K):
                u = slot_unitary(ang[kk, 0], ang[kk, 1], dtype)
                state = apply_uniform_1q_layer(state, u, local_bits)
                for gb in range(k_bits):
                    state = _global_1q(state, u, gb, n_amp)
                if p > 0.0:
                    codes = sample_depolarizing_codes(
                        jax.random.fold_in(key, kk), p, (L,))
                    xm, zm, ny = pauli_string_masks(codes)
                    state = _sharded_pauli_string(
                        state, xm, zm, ny, offset=offset, local_size=M,
                        local_bits=local_bits, n_shards=n_amp)
            return state * diag

        def one_traj(key):
            keys_t = jax.random.split(key, T)

            def body(carry, inp):
                ang, k_t = inp
                part = jnp.real(
                    jnp.sum(jnp.conj(carry[0]) * zq.astype(dtype) * carry[1]))
                a_t = af * jax.lax.psum(part, "amp")
                carry = fwd_cycle(carry, ang, k_t)
                return carry, a_t

            _, a = jax.lax.scan(body, state0, (angles, keys_t))
            return a

        a_local = jax.vmap(one_traj)(keys)  # (local_traj, T)
        total = jax.lax.psum(jnp.sum(a_local, axis=0), "traj")
        n_total = keys.shape[0] * n_traj_dev
        return total / n_total

    fn = shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(P(), P(), P(), P("traj", None)),
        out_specs=P(),
        check_vma=False,
    )
    return jax.jit(fn)


def make_sharded_echo(
    mesh, *, L, T, K, p, q, initial_state="vacuum", dtype=jnp.complex64,
    ancilla_factor=None,
):
    """Sharded echo A0(t): fixed-length masked scan (forward t, inverse t).

    Returns fn(angles, hs, phis, keys (n_traj,2), t_value) -> scalar echo.
    """
    n_amp = mesh.shape["amp"]
    n_traj_dev = mesh.shape["traj"]
    k_bits = int(np.log2(n_amp))
    local_bits = L - k_bits
    M = 1 << local_bits
    af = ((1.0 - p) ** 6 if p > 0 else 1.0) if ancilla_factor is None else ancilla_factor
    init_idx = 0 if initial_state == "vacuum" else neel_index(L)

    def local_fn(angles, hs, phis, keys, t_value):
        offset = (jax.lax.axis_index("amp") * M).astype(jnp.uint32)
        diag = zz_z_phase_mask(hs, phis, L, offset=offset, size=M, dtype=dtype)
        zq = z_sign_mask(q, L, offset=offset, size=M)
        gidx = jnp.arange(M, dtype=jnp.uint32) + offset
        psi = (gidx == jnp.uint32(init_idx)).astype(dtype)
        state0 = jnp.stack([psi, psi * zq.astype(dtype)])
        eye = jnp.eye(2, dtype=dtype)

        def one_traj(key):
            keys_t = jax.random.split(key, 2 * T)

            def body(carry, inp):
                kstep, key_k = inp
                fwd = kstep < t_value
                inv = (kstep >= t_value) & (kstep < 2 * t_value)
                active = fwd | inv
                idx = jnp.where(fwd, kstep, jnp.clip(2 * t_value - 1 - kstep, 0, T - 1))
                ang = angles[idx]
                state = jnp.where(inv, jnp.conj(diag), jnp.ones((), dtype)) * carry
                for pos in range(K):
                    th_f = ang[pos]
                    th_i = ang[K - 1 - pos]
                    u_f = slot_unitary(th_f[0], th_f[1], dtype)
                    u_i = slot_unitary_inverse(th_i[0], th_i[1], dtype)
                    u = jnp.where(fwd, u_f, jnp.where(inv, u_i, eye))
                    state = apply_uniform_1q_layer(state, u, local_bits)
                    for gb in range(k_bits):
                        state = _global_1q(state, u, gb, n_amp)
                    if p > 0.0:
                        codes = sample_depolarizing_codes(
                            jax.random.fold_in(key_k, pos), p, (L,))
                        codes = jnp.where(active, codes, 0)
                        xm, zm, ny = pauli_string_masks(codes)
                        state = _sharded_pauli_string(
                            state, xm, zm, ny, offset=offset, local_size=M,
                            local_bits=local_bits, n_shards=n_amp)
                state = jnp.where(fwd, diag, jnp.ones((), dtype)) * state
                return state, None

            state, _ = jax.lax.scan(body, state0, (jnp.arange(2 * T), keys_t))
            part = jnp.real(jnp.sum(jnp.conj(state[0]) * zq.astype(dtype) * state[1]))
            return af * jax.lax.psum(part, "amp")

        e_local = jax.vmap(one_traj)(keys)
        total = jax.lax.psum(jnp.sum(e_local), "traj")
        return total / (keys.shape[0] * n_traj_dev)

    fn = shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(P(), P(), P(), P("traj", None), P()),
        out_specs=P(),
        check_vma=False,
    )
    return jax.jit(fn)


def make_sharded_observables(
    mesh, *, L, T, K, p, initial_state="vacuum", dtype=jnp.complex64,
    with_x=True, estimator_noise_factor=1.0,
):
    """Sharded single-state evolution emitting energy and per-qubit <Z_i>.

    The amplitude-sharded counterpart of core.evolve.evolve_observables
    (energy-sweep capability beyond one chip; reference energy path at
    autocorr-delta-a-single-qiskit-fast-energy.py:136-183 is single-GPU).

    Returns fn(angles, hs, phis, term_hs, term_phis, x_coeff, keys (n_traj,2))
    -> (energy (T,), zs (T, L)) trajectory-averaged, replicated.

    Diagonal (Z/ZZ) energy terms are shard-local masked reductions + psum;
    <X_q> for local qubits is a shard-local pair reduction, for global
    qubits one ppermute pair exchange (the same halo pattern as gates).
    """
    n_amp = mesh.shape["amp"]
    n_traj_dev = mesh.shape["traj"]
    k_bits = int(np.log2(n_amp))
    local_bits = L - k_bits
    M = 1 << local_bits
    real_dt = jnp.float64 if dtype == jnp.complex128 else jnp.float32

    def local_fn(angles, hs, phis, term_hs, term_phis, x_coeff, keys):
        offset = (jax.lax.axis_index("amp") * M).astype(jnp.uint32)
        diag = zz_z_phase_mask(hs, phis, L, offset=offset, size=M, dtype=dtype)
        diag_e = zz_z_diag_energy(term_hs, term_phis, L, offset=offset, size=M,
                                  dtype=real_dt)
        gidx = jnp.arange(M, dtype=jnp.uint32) + offset
        init_idx = 0 if initial_state == "vacuum" else neel_index(L)
        psi0 = (gidx == jnp.uint32(init_idx)).astype(dtype)

        def fwd_cycle(state, ang, key):
            for kk in range(K):
                u = slot_unitary(ang[kk, 0], ang[kk, 1], dtype)
                state = apply_uniform_1q_layer(state, u, local_bits)
                for gb in range(k_bits):
                    state = _global_1q(state, u, gb, n_amp)
                if p > 0.0:
                    codes = sample_depolarizing_codes(
                        jax.random.fold_in(key, kk), p, (L,))
                    xm, zm, ny = pauli_string_masks(codes)
                    state = _sharded_pauli_string(
                        state, xm, zm, ny, offset=offset, local_size=M,
                        local_bits=local_bits, n_shards=n_amp)
            return state * diag

        def measure(state):
            probs = jnp.real(state) ** 2 + jnp.imag(state) ** 2
            e_diag = jax.lax.psum(jnp.sum(probs * diag_e), "amp")
            zs = []
            for qq in range(L):
                sgn = z_sign_mask(qq, L, offset=offset, size=M)
                zs.append(jax.lax.psum(jnp.sum(probs * sgn), "amp"))
            zs = jnp.stack(zs)
            if with_x:
                xs = []
                for qq in range(L):
                    if qq < local_bits:
                        s = state.reshape(M >> (qq + 1), 2, 1 << qq)
                        part = 2.0 * jnp.real(jnp.sum(
                            jnp.conj(s[:, 0, :]) * s[:, 1, :]))
                        xs.append(jax.lax.psum(part, "amp"))
                    else:
                        # global qubit: each shard of the XOR pair computes
                        # Re<conj(mine), partner>; the two partners contribute
                        # equal values, so the psum supplies the factor of 2
                        # in <X> = 2 Re sum(conj(a0) a1) with no extra scaling.
                        gb = qq - local_bits
                        partner = jax.lax.ppermute(
                            state, "amp", _xor_perm(n_amp, gb))
                        part = jnp.real(jnp.sum(jnp.conj(state) * partner))
                        xs.append(jax.lax.psum(part, "amp"))
                e = e_diag + x_coeff * estimator_noise_factor * jnp.sum(jnp.stack(xs))
            else:
                e = e_diag
            return e, zs

        def one_traj(key):
            keys_t = jax.random.split(key, T)

            def body(carry, inp):
                ang, k_t = inp
                out = measure(carry)
                carry = fwd_cycle(carry, ang, k_t)
                return carry, out

            _, (e, zs) = jax.lax.scan(body, psi0, (angles, keys_t))
            return e, zs

        e_l, zs_l = jax.vmap(one_traj)(keys)
        e_tot = jax.lax.psum(jnp.sum(e_l, axis=0), "traj")
        zs_tot = jax.lax.psum(jnp.sum(zs_l, axis=0), "traj")
        n_total = keys.shape[0] * n_traj_dev
        return e_tot / n_total, zs_tot / n_total

    fn = shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(P(), P(), P(), P(), P(), P(), P("traj", None)),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(fn)
