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
- a sampled Pauli string costs NOTHING at all in the autocorr/echo paths:
  noise is presampled outside the scan (one PRNG call per trajectory) and
  the X-part is deferred into a carried XOR frame sigma exactly as in
  core.sigma_evolve — the frame covers the SHARD-ID bits too, so a sampled
  X on a global qubit requires no ppermute, no gather, nothing; Z-signs and
  the diagonal's sigma-correction fold into the next kick's kron-group
  columns (local bits), into the global kicks' 2x2 column scalings (shard
  bits), and into tiny per-shard bond factors. The scan body is
  loop-invariant apart from small folded factors — the same deopt-avoiding
  discipline as the single-chip sigma engine (docs/PERFORMANCE.md);
- the observables path (which measures off-diagonal <X_q> every cycle and
  therefore cannot ride a deferred frame) still applies strings eagerly:
  one unconditional pair exchange per global x-bit + a local XOR gather,
  with its noise presampled outside the scan;
- expectations are local partial reductions + `psum` over 'amp';
- trajectories shard over 'traj' with no intra-step comms (the final mean is
  one scalar psum), so 'traj' may span DCN while 'amp' stays on ICI.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import PartitionSpec as P

from dtc_tpu.core.statevector import neel_index
from dtc_tpu.models.drives import slot_unitary
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


def _sharded_kick_factored(state, theta_x, theta_y, sigma, pend_zm, diag_sig,
                           exp_h, exp_p, *, L, local_bits, n_amp, dtype,
                           has_y, inv_t=None):
    """Sigma-conjugated kick on a sharded local state with all pending noise
    Z-signs and diagonal sigma-corrections folded in.

    Local bits ride the kron-group machinery of core.sigma_evolve (column
    factors on the group matmuls, (4,) broadcasts for in-local straddle
    bonds); shard-id bits get their per-qubit factors folded into the
    ppermute 2x2's columns, the local/global boundary bond a (2,) broadcast
    on the local top-bit axis selected by shard bit 0, and global-global
    bonds a per-shard scalar. No full-plane per-cycle masks anywhere.

    ``inv_t`` (a traced boolean) selects the slot-unitary dagger at run
    time — the echo scan uses it to run ONE kick application per step whose
    direction is data-dependent, instead of computing both directions and
    discarding one (2x the einsums and ppermutes). The dagger select costs
    a 2x2 ``where``; the caller selects the matching conjugated exponent
    vectors.
    """
    from dtc_tpu.core.sigma_evolve import (
        _bits,
        _group_column_factors,
        _group_starts,
        _sigma_signs,
        _straddle_factor,
    )
    from dtc_tpu.ops.kick import kron_power
    from dtc_tpu.ops.precision import gate_precision

    k_bits = L - local_bits
    M = 1 << local_bits

    def make(tx, ty, dtype=dtype):
        u = slot_unitary(tx, ty, dtype)
        if inv_t is not None:
            return jnp.where(inv_t, jnp.conj(u).T, u)
        return u
    sig_bits = _bits(diag_sig, L)
    zm_bits = _bits(pend_zm, L)
    aidx = jax.lax.axis_index("amp")
    one = jnp.ones((), dtype)

    # ---- pre-kick diagonal factors on bonds outside the local kron groups
    starts = _group_starts(local_bits)
    for q0, k in starts[:-1]:
        b = q0 + k - 1
        if b < local_bits - 1:
            state = _straddle_factor(state, b, diag_sig, exp_p, L, dtype)
    if k_bits > 0 and local_bits >= 1:
        # boundary bond (local top bit, shard bit 0)
        b = local_bits - 1
        flip = (sig_bits[b] ^ sig_bits[b + 1]) == 1
        g = jnp.where(flip, exp_p[b], one)
        sb = (aidx & 1) == 0
        vec2 = jnp.where(sb, jnp.stack([g, jnp.conj(g)]),
                         jnp.stack([jnp.conj(g), g]))
        s = state.reshape(*state.shape[:-1], 2, M >> 1)
        state = (s * vec2[:, None]).reshape(state.shape)
    for b in range(local_bits, L - 1):
        # bond between two shard bits: a per-shard scalar
        gb, gb1 = b - local_bits, b + 1 - local_bits
        flip = (sig_bits[b] ^ sig_bits[b + 1]) == 1
        equal = ((aidx >> gb) & 1) == ((aidx >> gb1) & 1)
        g = jnp.where(flip,
                      jnp.where(equal, exp_p[b], jnp.conj(exp_p[b])), one)
        state = state * g

    # ---- local kron-group kicks with folded column factors
    if has_y:
        s_all = _sigma_signs(sigma, L, jnp.asarray(theta_y).dtype)
    for q0, k in starts:
        if has_y:
            us = jax.vmap(lambda sq: make(theta_x, sq * theta_y, dtype))(
                s_all[q0 : q0 + k])
            uk = us[k - 1]
            for jq in range(k - 2, -1, -1):
                uk = jnp.kron(uk, us[jq])
        else:
            u1 = make(theta_x, theta_y, dtype)
            uk = kron_power(u1, k) if k > 1 else u1
        cols = _group_column_factors(q0, k, pend_zm, diag_sig, exp_h, exp_p,
                                     L, dtype)
        uk = uk * cols[None, :]
        high = M >> (q0 + k)
        s2 = state.reshape(*state.shape[:-1], high, 1 << k, 1 << q0)
        s2 = jnp.einsum("ab,...hbl->...hal", uk, s2,
                        precision=gate_precision())
        state = s2.reshape(state.shape)

    # ---- global (shard-bit) kicks: per-qubit factors ride the 2x2 columns
    for gb in range(k_bits):
        qq = local_bits + gb
        if has_y:
            u1 = make(theta_x, s_all[qq] * theta_y, dtype)
        else:
            u1 = make(theta_x, theta_y, dtype)
        f0 = jnp.where(sig_bits[qq] == 1, exp_h[qq], one)
        f1 = jnp.where(sig_bits[qq] == 1, jnp.conj(exp_h[qq]), one)
        f1 = f1 * jnp.where(zm_bits[qq] == 1, -one, one)
        u1 = u1 * jnp.stack([f0, f1])[None, :]
        state = _global_1q(state, u1, gb, n_amp)
    return state


def _sharded_forward_cycle(state, pending, ang, ev, d0, exp_h, exp_p, *, L,
                           local_bits, n_amp, K, p, dtype, has_y):
    """Sharded counterpart of core.sigma_evolve.forward_cycle_fac."""
    kw = dict(L=L, local_bits=local_bits, n_amp=n_amp, dtype=dtype)
    pend_zm, pend_sig = pending
    if p <= 0.0:
        for k in range(K):
            state = _sharded_kick_factored(
                state, ang[k, 0], ang[k, 1], jnp.uint32(0), jnp.uint32(0),
                jnp.uint32(0), exp_h, exp_p, has_y=False, **kw)
        return state * d0, pending
    zm, sig_b, sig_after = ev
    for k in range(K):
        state = _sharded_kick_factored(
            state, ang[k, 0], ang[k, 1], sig_b[k], pend_zm, pend_sig,
            exp_h, exp_p, has_y=has_y, **kw)
        pend_zm, pend_sig = zm[k], jnp.uint32(0)
    return state * d0, (pend_zm, sig_after)


def _tail_phase_angles(zm_t, sig_t, hs, phis, aidx, *, L, local_bits):
    """Per-(shard, trajectory) diagonal angles for the cycle-kernel path's
    XLA tail: (theta_scalar (n,), theta_boundary (n,)) such that the
    global part of the post-fold cycle diagonal is
    exp(i*theta_scalar) * exp(i*theta_boundary*z_topbit) — the shard-bit h
    terms with their sigma corrections, the noise-Z signs on shard bits,
    the shard-shard bonds, and the boundary bond phi[local_bits-1] (whose
    z_{local_bits} leg is shard bit 0, folded into theta_boundary; its
    z_{local_bits-1} leg is the local TOP bit, applied by the caller as a
    2-half broadcast). Mirrors the compact-row angle formula of the
    resident kernels (cz = h*(sig-0.5) - pi/2*n, cb = phi*(flip-0.5),
    c0 = pi/2*sum(n)) restricted to bits >= local_bits.

    ``hs``/``phis`` may be static (L,)/(L-1,) vectors OR per-trajectory
    (n, L)/(n, L-1) rows — the device-noise route feeds the event-
    commutation sign-adjusted diagonal rows of _device_general_rows per
    cycle (the frame-conjugation flips here multiply ON TOP of those
    signs: moving bond events through the diagonal sublayers and
    deferring X applications are independent transformations)."""
    half_pi = float(np.pi / 2)
    qs = jnp.arange(L, dtype=jnp.uint32)
    zb = ((sig_t[:, None] >> qs) & 1).astype(jnp.float32)   # (n, L)
    nb = ((zm_t[:, None] >> qs) & 1).astype(jnp.float32)
    hf = hs.astype(jnp.float32)
    pf = phis.astype(jnp.float32)
    th_sc = jnp.zeros(zm_t.shape, jnp.float32)
    for qq in range(local_bits, L):
        gb = qq - local_bits
        z = (1 - 2 * ((aidx >> gb) & 1)).astype(jnp.float32)
        czq = hf[..., qq] * (zb[:, qq] - 0.5) - half_pi * nb[:, qq]
        th_sc = th_sc + czq * z + half_pi * nb[:, qq]
    for b in range(local_bits, L - 1):
        gb, gb1 = b - local_bits, b + 1 - local_bits
        zz = ((1 - 2 * ((aidx >> gb) & 1))
              * (1 - 2 * ((aidx >> gb1) & 1))).astype(jnp.float32)
        flip = jnp.abs(zb[:, b] - zb[:, b + 1])
        th_sc = th_sc + pf[..., b] * (flip - 0.5) * zz
    b = local_bits - 1
    flip = jnp.abs(zb[:, b] - zb[:, b + 1])
    z_s0 = (1 - 2 * (aidx & 1)).astype(jnp.float32)
    th_bnd = pf[..., b] * (flip - 0.5) * z_s0
    return th_sc, th_bnd


def _planar_phase(st, cr, ci):
    """st (n, 2, ...) planar * per-trajectory complex scalar (cr + i*ci)."""
    shape = (-1,) + (1,) * (st.ndim - 2)
    cr = cr.reshape(shape)
    ci = ci.reshape(shape)
    return jnp.stack([cr * st[:, 0] - ci * st[:, 1],
                      cr * st[:, 1] + ci * st[:, 0]], axis=1)


def _global_shard_kicks(st, theta, n_amp):
    """Pure RX(theta) kicks on every shard-id bit: ppermute pair exchange +
    planar 2-term combine per bit. The per-bit kicks commute (disjoint
    qubits), so bit order is free."""
    c = jnp.cos(theta / 2).astype(jnp.float32)
    s = jnp.sin(theta / 2).astype(jnp.float32)
    for gb in range(int(np.log2(n_amp))):
        partner = jax.lax.ppermute(st, "amp", _xor_perm(n_amp, gb))
        # RX 2x2 = [[c, -i s], [-i s, c]]: new = c*mine + (-i s)*partner
        st = jnp.stack([c * st[:, 0] + s * partner[:, 1],
                        c * st[:, 1] - s * partner[:, 0]], axis=1)
    return st


def _global_diag(st, zm_t, sig_t, hs, phis, *, L, local_bits):
    """Global diagonal factors of one cycle-kernel cycle, from
    _tail_phase_angles: the replicated per-shard scalar phase plus the
    boundary bond's local-top-bit split."""
    aidx = jax.lax.axis_index("amp")
    th_sc, th_bnd = _tail_phase_angles(zm_t, sig_t, hs, phis, aidx,
                                       L=L, local_bits=local_bits)
    st = _planar_phase(st, jnp.cos(th_sc), jnp.sin(th_sc))
    n, _, TOP, C = st.shape
    st = st.reshape(n, 2, 2, TOP // 2, C)
    lo = _planar_phase(st[:, :, 0], jnp.cos(th_bnd), jnp.sin(th_bnd))
    hi = _planar_phase(st[:, :, 1], jnp.cos(th_bnd), -jnp.sin(th_bnd))
    return jnp.stack([lo, hi], axis=2).reshape(n, 2, TOP, C)


def _global_diag_inv(st, zm_t, sig_t, hs, phis, *, L, local_bits):
    """Daggered counterpart of _global_diag (negated angles) — the general
    echo's inverse-step global diagonal, evaluated at the step's pre-event
    sigma with the PREVIOUS event's Z word (the Z-fold is its own
    conjugate, so negating the whole angle is exact)."""
    aidx = jax.lax.axis_index("amp")
    th_sc, th_bnd = _tail_phase_angles(zm_t, sig_t, hs, phis, aidx,
                                       L=L, local_bits=local_bits)
    st = _planar_phase(st, jnp.cos(th_sc), -jnp.sin(th_sc))
    n, _, TOP, C = st.shape
    st = st.reshape(n, 2, 2, TOP // 2, C)
    lo = _planar_phase(st[:, :, 0], jnp.cos(th_bnd), -jnp.sin(th_bnd))
    hi = _planar_phase(st[:, :, 1], jnp.cos(th_bnd), jnp.sin(th_bnd))
    return jnp.stack([lo, hi], axis=2).reshape(n, 2, TOP, C)


def _global_cycle_tail(st, zm_t, sig_t, hs, phis, theta, *, L, local_bits,
                       n_amp):
    """XLA tail of one cycle-kernel cycle: pure RX kicks on every shard bit,
    then the global diagonal factors. Runs AFTER the local kernel; exact
    because the local diagonal commutes with shard-bit kicks and all
    diagonals commute with each other (the boundary bond, which involves
    the local top bit, correctly lands after ALL kicks here)."""
    st = _global_shard_kicks(st, theta, n_amp)
    return _global_diag(st, zm_t, sig_t, hs, phis, L=L, local_bits=local_bits)


def _global_cycle_head(st, zm_t, sig_t, hs, phis, theta, *, L, local_bits,
                       n_amp):
    """Conjugated-frame inverse counterpart of _global_cycle_tail: the SAME
    global factors with UN-negated angles (RX kicks and diagonals are
    symmetric, so inside the once-conjugated echo frame each physical
    dagger IS the forward operator) in MIRRORED order — diagonal factors
    BEFORE the shard-bit kicks, evaluated at this step's pre-event sigma
    with the PREVIOUS event's Z word (the pre-fold deferral rule). Runs
    BEFORE the local inverse kernel of the same step."""
    st = _global_diag(st, zm_t, sig_t, hs, phis, L=L, local_bits=local_bits)
    return _global_shard_kicks(st, theta, n_amp)


def _hi_split_min_lb() -> int:
    """Shard-local size at which the per-shard hi kernels switch to the
    SPLIT per-plane (re, im) state pair (the 2^32 DMA-offset wrap bound:
    a fused L_loc = 30 state puts plane 1's base at exactly 2^32 —
    docs/PERFORMANCE.md round-4). Default 30; DTC_TPU_SHARDED_HI_SPLIT_
    MIN_LB lowers it for interpret cross-checks at feasible sizes.
    Kernel-rate sharding therefore reaches L = 30 + log2(n_amp)."""
    return int(os.environ.get("DTC_TPU_SHARDED_HI_SPLIT_MIN_LB", "30"))


def _on_fused(st, split_state, fn):
    """Run an (n, 2, TOP, C)-shaped global-op callable over a split
    (re, im) carry by stacking/unstacking around it. The stack copies
    only exist at L >= 31 multi-chip (k_bits > 0 with split carries) —
    compile-validation territory on this hardware; the (1,1)-mesh
    L_loc = 30 route has no global ops at all."""
    if not split_state:
        return fn(st)
    stf = fn(jnp.stack(st, axis=1))
    return (stf[:, 0], stf[:, 1])


def _check_constant_x(fn):
    """Wrap a cycle-kernel sharded fn so a CONCRETE schedule that violates
    the constant-x contract raises instead of silently reading angles[0,0,0]
    (the CLI layer checks too, but direct library callers must not get
    silently wrong physics — ADVICE r2). Tracer schedules pass through (the
    caller jitted around us and owns the contract)."""

    @functools.wraps(fn)
    def checked(angles, *args):
        if not isinstance(angles, jax.core.Tracer):
            ang = np.asarray(angles)
            if not (ang.shape[1] == 1 and np.all(ang[:, :, 1] == 0.0)
                    and np.all(ang == ang[0])):
                raise ValueError(
                    "cycle-kernel sharded engine requires a constant x-only "
                    "K=1 schedule (only angles[0,0,0] is read)")
        return fn(angles, *args)

    return checked


def make_sharded_autocorr_forward_kernel(
    mesh, *, L, T, p, q, initial_state="vacuum", ancilla_factor=None,
    interpret=False,
):
    """Cycle-kernel sharded forward autocorrelator (roadmap #4): the
    shard-LOCAL part of every cycle runs in ONE fused Pallas call
    (kick + noise-Z + sigma-conjugated D0 + the A(t) partial sum), and
    only the shard-bit kicks + tiny diagonal factors stay in XLA.
    17 <= L_loc <= 23 (L_loc = L - log2(n_amp)) rides the VMEM-resident
    per-shard kernel (ops/pallas_cycle, state VMEM-resident within the
    cycle); 24 <= L_loc <= 29 the r2-blocked HBM-streamed per-shard kernel
    (ops/pallas_cycle_hi, two bounded DMA sweeps per cycle) — kernel-rate
    sharding up to L = 29 + log2(n_amp) (L_loc = 30 would put one
    trajectory's plane 1 at the 2^32 DMA-offset wrap — docs/PERFORMANCE.md
    round-4 notes). Requires a constant x-only
    schedule (only angles[0,0,0] is read — the engine dispatch contract
    shared with ops/pallas_streamed), K=1 and a shard-local probe
    q < L - log2(n_amp) (column sign for q < 14, row/block sign above).
    DTC_TPU_SHARDED_HI_MIN_LB (default 24, min 22) lowers the hi-kernel
    crossover for cross-checks.

    Same signature/semantics as make_sharded_autocorr_forward; matches it
    (and the unsharded sigma engine) trajectory-for-trajectory at the
    bf16x3 dot level with identical presampled noise.
    """
    from dtc_tpu.core.sigma_evolve import presample_noise
    from dtc_tpu.ops.pallas_cycle import cycle_forward_apply
    from dtc_tpu.ops.pallas_cycle_hi import hi_cycle_forward_apply
    from dtc_tpu.ops.pallas_noise import pack_cycle_params_compact
    from dtc_tpu.ops.pallas_resident import _C, _kick_matrices
    from dtc_tpu.ops.pallas_streamed import _rx_kron

    n_amp = mesh.shape["amp"]
    n_traj_dev = mesh.shape["traj"]
    k_bits = int(np.log2(n_amp))
    local_bits = L - k_bits
    if not (17 <= local_bits <= 30):
        raise ValueError(
            f"cycle-kernel sharding needs 17 <= L - log2(n_amp) <= 30 "
            f"(got L={L}, n_amp={n_amp}: local_bits={local_bits})")
    if not (0 <= q < local_bits):
        raise ValueError(
            "cycle-kernel sharding requires a shard-local probe qubit "
            f"q < L - log2(n_amp) = {local_bits} (got q={q})")
    use_hi = local_bits >= max(
        22, int(os.environ.get("DTC_TPU_SHARDED_HI_MIN_LB", "24")))
    split_state = use_hi and local_bits >= _hi_split_min_lb()
    width = 128 if 5 * local_bits - 2 <= 128 else 256
    M = 1 << local_bits
    TOP = M // _C
    af = ((1.0 - p) ** 6 if p > 0 else 1.0
          ) if ancilla_factor is None else ancilla_factor
    init_idx = 0 if initial_state == "vacuum" else neel_index(L)
    s0 = 1.0 if ((init_idx >> q) & 1) == 0 else -1.0

    def local_fn(angles, hs, phis, keys):
        theta = angles[0, 0, 0]
        if use_hi:
            u7r, u7i = (m[None] for m in _rx_kron(theta, 7))
            utr, uti = (m[None] for m in _rx_kron(theta, local_bits - 21))
        else:
            u7r, u7i, utr, uti = _kick_matrices(
                angles, local_bits, TOP, time_dependent=False)
        offset = (jax.lax.axis_index("amp") * M).astype(jnp.uint32)
        gidx = (jnp.arange(M, dtype=jnp.uint32) + offset).reshape(TOP, _C)
        plane0 = (gidx == jnp.uint32(init_idx)).astype(jnp.float32)
        n = keys.shape[0]
        if split_state:
            state0 = (jnp.broadcast_to(plane0[None], (n, TOP, _C)),
                      jnp.zeros((n, TOP, _C), jnp.float32))
        else:
            state0 = jnp.broadcast_to(
                jnp.stack([plane0, jnp.zeros_like(plane0)])[None],
                (n, 2, TOP, _C))
        h_loc = hs[:local_bits]
        ph_loc = phis[: local_bits - 1]

        if p > 0.0:
            def sample(key):
                _, zm, _, csum = presample_noise(key, p, T, L)
                rows = jax.vmap(
                    lambda z, sg: pack_cycle_params_compact(
                        z, sg, h_loc, ph_loc, local_bits,
                        width=width))(zm, csum)
                return rows, zm, csum

            rows, zm, csum = jax.vmap(sample)(keys)  # (n,T,width), (n,T) x2
        else:
            row = pack_cycle_params_compact(
                jnp.uint32(0), jnp.uint32(0), h_loc, ph_loc, local_bits,
                width=width)
            rows = jnp.broadcast_to(row, (n, T, width))
            zm = csum = jnp.zeros((n, T), jnp.uint32)

        def body(st, inp):
            row_t, zm_t, sig_t = inp
            if use_hi:
                st, a_part = hi_cycle_forward_apply(
                    st, row_t, u7r, u7i, utr, uti, L=local_bits, q=q,
                    interpret=interpret)
                if split_state:
                    st = tuple(s.reshape(n, TOP, _C) for s in st)
                else:
                    st = st.reshape(n, 2, TOP, _C)
            else:
                st, a_part = cycle_forward_apply(
                    st, row_t, u7r, u7i, utr, uti, L=local_bits, q=q,
                    interpret=interpret)
            if k_bits:
                st = _on_fused(st, split_state, lambda stf: _global_cycle_tail(
                    stf, zm_t, sig_t, hs, phis, theta, L=L,
                    local_bits=local_bits, n_amp=n_amp))
            return st, jax.lax.psum(a_part, "amp")

        # only T-1 cycles are needed for A(0..T-1) — A(0) is analytic
        xs = (jnp.swapaxes(rows, 0, 1)[: T - 1], zm.T[: T - 1],
              csum.T[: T - 1])
        _, a_frames = jax.lax.scan(body, state0, xs)  # (T-1, n) = A(1..T-1)

        # A(t >= 1) carries the sigma sign at measurement time (csum after
        # cycle t-1); A(0) = af analytically (basis initial state)
        sq = (1 - 2 * ((csum >> q) & jnp.uint32(1)).astype(jnp.int32)
              ).astype(jnp.float32)                    # (n, T)
        a_traj = af * s0 * sq[:, : T - 1] * a_frames.T  # (n, T-1)
        a_traj = jnp.concatenate(
            [jnp.full((n, 1), af, jnp.float32), a_traj], axis=1)
        total = jax.lax.psum(jnp.sum(a_traj, axis=0), "traj")
        return total / (n * n_traj_dev)

    fn = shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(P(), P(), P(), P("traj", None)),
        out_specs=P(),
        check_vma=False,
    )
    return _check_constant_x(jax.jit(fn))


def make_sharded_echo_kernel(
    mesh, *, L, T, p, q, initial_state="vacuum", ancilla_factor=None,
    interpret=False,
):
    """Cycle-kernel sharded echo A0(t) (docs/PERFORMANCE.md roadmap #5):
    fixed-length masked 2T scan where each ACTIVE step runs the shard-local
    work as ONE fused Pallas call — forward steps the post-fold cycle
    kernel, inverse steps the PRE-fold kernel
    (ops/pallas_cycle.cycle_inverse_apply) inside the once-conjugated
    frame: at the turnaround the imaginary plane is negated ONCE, after
    which every physical U_j^dag equals the UN-negated forward operator
    (RX kicks and diagonals are symmetric: (D K)^dag = conj(K D)), run in
    reverse time order; |amp|^2 observables are conjugation-invariant so
    the state is never conjugated back. Echo semantics per the reference
    (autocorr-delta-a-single-qiskit-fast.py:140-147).

    Step words (the pre-fold deferral rule, eager-correction convention of
    the resident kernels — no pend_sig carry): forward step k folds
    (zm[k], csum[k]) post-kick exactly like the forward builder; inverse
    step k folds (zm[k-1], sig_b[k]) PRE-kick — the previous event's
    Z-sign (diagonal, deferred across the step boundary) and the diagonal
    evaluated at this step's pre-event sigma. The FIRST inverse step
    carries zm=0 (the last forward step already applied its own event's
    Z-sign), and the last inverse event's Z-sign is dropped (pure sign
    before an |amp|^2 measurement); its X-part reaches the measurement via
    sigma_final. Global (shard-bit) ops ride XLA inside the same switch
    branch: forward kick-then-diag AFTER the kernel, inverse diag-then-kick
    BEFORE it (_global_cycle_head). Padding steps are a no-op branch —
    no kernel, no ppermutes, no phases.

    Same signature as make_sharded_echo: fn(angles, hs, phis,
    keys (n_traj,2), t_value) -> scalar; requires a constant x-only
    schedule, shard-local probe q < L_loc, and 17 <= L_loc <= 29
    (L_loc = L - log2(n_amp); L_loc >= 24 rides
    the r2-blocked HBM-streamed per-shard kernels, ops/pallas_cycle_hi —
    see make_sharded_autocorr_forward_kernel; DTC_TPU_SHARDED_HI_MIN_LB
    lowers the crossover to 22 for cross-checks).
    """
    from dtc_tpu.ops.pallas_cycle import cycle_forward_apply, cycle_inverse_apply
    from dtc_tpu.ops.pallas_cycle_hi import (
        hi_cycle_forward_apply,
        hi_cycle_inverse_apply,
    )
    from dtc_tpu.ops.pallas_noise import pack_cycle_params_compact
    from dtc_tpu.ops.pallas_resident import _C, _kick_matrices
    from dtc_tpu.ops.pallas_streamed import _rx_kron

    n_amp = mesh.shape["amp"]
    n_traj_dev = mesh.shape["traj"]
    k_bits = int(np.log2(n_amp))
    local_bits = L - k_bits
    if not (17 <= local_bits <= 30):
        raise ValueError(
            f"cycle-kernel sharding needs 17 <= L - log2(n_amp) <= 30 "
            f"(got L={L}, n_amp={n_amp}: local_bits={local_bits})")
    if not (0 <= q < local_bits):
        raise ValueError(
            "cycle-kernel sharding requires a shard-local probe qubit "
            f"q < L - log2(n_amp) = {local_bits} (got q={q})")
    use_hi = local_bits >= max(
        22, int(os.environ.get("DTC_TPU_SHARDED_HI_MIN_LB", "24")))
    split_state = use_hi and local_bits >= _hi_split_min_lb()
    width = 128 if 5 * local_bits - 2 <= 128 else 256
    M = 1 << local_bits
    TOP = M // _C
    af = ((1.0 - p) ** 6 if p > 0 else 1.0
          ) if ancilla_factor is None else ancilla_factor
    init_idx = 0 if initial_state == "vacuum" else neel_index(L)
    s0 = 1.0 if ((init_idx >> q) & 1) == 0 else -1.0
    T2 = 2 * T

    def local_fn(angles, hs, phis, keys, t_value):
        from dtc_tpu.core.sigma_evolve import (
            _codes_from_uniform,
            _masks_from_codes,
        )

        theta = angles[0, 0, 0]
        if use_hi:
            u7r, u7i = (m[None] for m in _rx_kron(theta, 7))
            utr, uti = (m[None] for m in _rx_kron(theta, local_bits - 21))
        else:
            u7r, u7i, utr, uti = _kick_matrices(
                angles, local_bits, TOP, time_dependent=False)
        offset = (jax.lax.axis_index("amp") * M).astype(jnp.uint32)
        gidx = (jnp.arange(M, dtype=jnp.uint32) + offset).reshape(TOP, _C)
        plane0 = (gidx == jnp.uint32(init_idx)).astype(jnp.float32)
        zq = z_sign_mask(q, L, offset=offset, size=M).astype(
            jnp.float32).reshape(TOP, _C)
        n = keys.shape[0]
        if split_state:
            state0 = (jnp.broadcast_to(plane0[None], (n, TOP, _C)),
                      jnp.zeros((n, TOP, _C), jnp.float32))
        else:
            state0 = jnp.broadcast_to(
                jnp.stack([plane0, jnp.zeros_like(plane0)])[None],
                (n, 2, TOP, _C))
        h_loc = hs[:local_bits]
        ph_loc = phis[: local_bits - 1]
        step = jnp.arange(T2)

        def sample(key):
            # identical uniform draw to make_sharded_echo (K=1) so the two
            # engines agree trajectory-for-trajectory with the same keys
            if p > 0.0:
                u = jax.random.uniform(key, (T2, 1, L), dtype=jnp.float32)
                codes = _codes_from_uniform(u, p)
                codes = jnp.where((step < 2 * t_value)[:, None, None],
                                  codes, 0)
                xm, zm = _masks_from_codes(codes, L)
                xm, zm = xm[:, 0], zm[:, 0]
                csum = jax.lax.associative_scan(jnp.bitwise_xor, xm)
                sig_b = jnp.concatenate(
                    [jnp.zeros((1,), jnp.uint32), csum[:-1]])
            else:
                zm = csum = sig_b = jnp.zeros((T2,), jnp.uint32)
            zm_prev = jnp.concatenate([jnp.zeros((1,), jnp.uint32), zm[:-1]])
            zm_prev = jnp.where(step == t_value, jnp.uint32(0), zm_prev)
            pack = lambda z, sg: pack_cycle_params_compact(  # noqa: E731
                z, sg, h_loc, ph_loc, local_bits, width=width)
            rows_f = jax.vmap(pack)(zm, csum)        # (T2, 128)
            rows_i = jax.vmap(pack)(zm_prev, sig_b)  # (T2, 128)
            return rows_f, rows_i, zm, zm_prev, sig_b, csum

        rows_f, rows_i, zm, zm_prev, sig_b, csum = jax.vmap(sample)(keys)
        conj_vec = jnp.asarray([1.0, -1.0], jnp.float32).reshape(1, 2, 1, 1)

        def br_fwd(op):
            st, row_f, row_i, zm_k, zmp_k, sigb_k, csum_k = op
            if use_hi:
                # slots=2: the echo switch co-allocates this kernel's
                # scoped VMEM with the inverse kernel's (measured OOM by
                # 1.75M at L_loc=24 with the forward default of 4)
                st, _ = hi_cycle_forward_apply(
                    st, row_f, u7r, u7i, utr, uti, L=local_bits, q=q,
                    interpret=interpret, slots=2)
                if split_state:
                    st = tuple(s.reshape(n, TOP, _C) for s in st)
                else:
                    st = st.reshape(n, 2, TOP, _C)
            else:
                st, _ = cycle_forward_apply(
                    st, row_f, u7r, u7i, utr, uti, L=local_bits, q=q,
                    interpret=interpret)
            if k_bits:
                st = _on_fused(st, split_state, lambda stf: _global_cycle_tail(
                    stf, zm_k, csum_k, hs, phis, theta, L=L,
                    local_bits=local_bits, n_amp=n_amp))
            return st

        def br_inv(op, first):
            st, row_f, row_i, zm_k, zmp_k, sigb_k, csum_k = op
            if first:
                # the single turnaround conjugation
                st = (st[0], -st[1]) if split_state else st * conj_vec
            if k_bits:
                st = _on_fused(st, split_state, lambda stf: _global_cycle_head(
                    stf, zmp_k, sigb_k, hs, phis, theta, L=L,
                    local_bits=local_bits, n_amp=n_amp))
            if use_hi:
                st = hi_cycle_inverse_apply(
                    st, row_i, u7r, u7i, utr, uti, L=local_bits,
                    interpret=interpret, slots=2)
                if split_state:
                    return tuple(s.reshape(n, TOP, _C) for s in st)
                return st.reshape(n, 2, TOP, _C)
            return cycle_inverse_apply(st, row_i, u7r, u7i, utr, uti,
                                       L=local_bits, interpret=interpret)

        def body(st, inp):
            k, op_rest = inp
            op = (st,) + op_rest
            fwd = k < t_value
            act = k < 2 * t_value
            kind = jnp.where(fwd, 0,
                             jnp.where(~act, 3,
                                       jnp.where(k == t_value, 1, 2)))
            st = jax.lax.switch(
                kind,
                [br_fwd, functools.partial(br_inv, first=True),
                 functools.partial(br_inv, first=False), lambda op: op[0]],
                op)
            return st, None

        xs = (step, (jnp.swapaxes(rows_f, 0, 1), jnp.swapaxes(rows_i, 0, 1),
                     zm.T, zm_prev.T, sig_b.T, csum.T))
        st, _ = jax.lax.scan(body, state0, xs)

        sigma_fin = csum[:, -1]
        sq = (1 - 2 * ((sigma_fin >> q) & jnp.uint32(1)).astype(jnp.int32)
              ).astype(jnp.float32)
        st_re, st_im = st if split_state else (st[:, 0], st[:, 1])
        part = jnp.sum((st_re ** 2 + st_im ** 2) * zq, axis=(1, 2))
        e_traj = af * s0 * sq * jax.lax.psum(part, "amp")
        total = jax.lax.psum(jnp.sum(e_traj), "traj")
        return total / (n * n_traj_dev)

    fn = shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(P(), P(), P(), P("traj", None), P()),
        out_specs=P(),
        check_vma=False,
    )
    return _check_constant_x(jax.jit(fn))


def _global_general_slot_kick(st, tx, ty, sig_w, zmp_w, *, local_bits,
                              n_amp, dagger=False):
    """Per-trajectory sigma-conjugated slot kick (RY(±ty)RX(tx)) on every
    shard-id bit, with the PREVIOUS event's global Z-signs folded into the
    2x2 columns (the deferral rule of _sharded_kick_factored). The ±ty
    sign is the trajectory's shard-bit XOR frame at this slot (X RY X =
    RY(-ty)); pure-x drives reduce to _global_shard_kicks' math.
    ``dagger`` applies the DAGGERED slot unitary (X^s U X^s)^dag =
    X^s U^dag X^s — the general echo's inverse steps (conj-transpose of
    the forward entries; the column Z-fold placement is unchanged because
    the deferred previous event precedes the kick in both directions).
    st (n,2,TOP,C); tx/ty traced scalars; sig_w/zmp_w (n,) uint32."""
    aidx = jax.lax.axis_index("amp")
    cx = jnp.cos(tx / 2).astype(jnp.float32)
    sx = jnp.sin(tx / 2).astype(jnp.float32)
    for gb in range(int(np.log2(n_amp))):
        qq = local_bits + gb
        ysign = 1.0 - 2.0 * ((sig_w >> qq) & 1).astype(jnp.float32)   # (n,)
        cy = jnp.cos(ysign * ty / 2).astype(jnp.float32)
        sy = jnp.sin(ysign * ty / 2).astype(jnp.float32)
        # slot_unitary planar entries (models.drives closed form):
        # u00=(cy cx, sy sx) u01=(-sy cx, -cy sx) u10=(sy cx, -cy sx)
        # u11=(cy cx, -sy sx); column scaling B = U diag(1, f1)
        f1 = 1.0 - 2.0 * ((zmp_w >> qq) & 1).astype(jnp.float32)
        mybit = (aidx >> gb) & 1
        if dagger:
            # conj-transpose: u00d=(cy cx,-sy sx) u01d=(sy cx, cy sx)
            # u10d=(-sy cx, cy sx) u11d=(cy cx, sy sx)
            dr = jnp.where(mybit == 0, cy * cx, cy * cx * f1)
            di = jnp.where(mybit == 0, -sy * sx, sy * sx * f1)
            orr = jnp.where(mybit == 0, sy * cx * f1, -sy * cx)
            oii = jnp.where(mybit == 0, cy * sx * f1, cy * sx)
        else:
            dr = jnp.where(mybit == 0, cy * cx, cy * cx * f1)
            di = jnp.where(mybit == 0, sy * sx, -sy * sx * f1)
            orr = jnp.where(mybit == 0, -sy * cx * f1, sy * cx)
            oii = jnp.where(mybit == 0, -cy * sx * f1, -cy * sx)
        partner = jax.lax.ppermute(st, "amp", _xor_perm(n_amp, gb))
        shape = (-1, 1, 1)
        dr, di, orr, oii = (a.reshape(shape) for a in (dr, di, orr, oii))
        st = jnp.stack([
            dr * st[:, 0] - di * st[:, 1]
            + orr * partner[:, 0] - oii * partner[:, 1],
            dr * st[:, 1] + di * st[:, 0]
            + orr * partner[:, 1] + oii * partner[:, 0],
        ], axis=1)
    return st


def make_sharded_autocorr_forward_general(
    mesh, *, L, T, K, p, q, initial_state="vacuum", ancilla_factor=None,
    interpret=False, device=None,
):
    """LAB-frame cycle-kernel sharded forward autocorrelator for EVERY
    polarization family and per-cycle schedule (y/xy/yx/circular/xy_cycle,
    adaptive-g) — multi-chip runs of these drives previously fell to the
    XLA sharded engine (VERDICT r2 missing #5; the reference's
    time-dependent circular drives are
    autocorr-delta-a-single-qiskit-fast-circular-polarization.py:110-142).

    Hybrid frame: the shard-LOCAL work of each cycle (K lab-frame kick
    slots with X-mask row folds + the folded local diagonal + the fused
    A(t) partial sum) runs as ONE Pallas call per cycle
    (ops/pallas_cycle.general_cycle_forward_apply); the shard-id bits keep
    an XOR noise frame so sampled global X's cost nothing, with the
    global slot kicks sigma-conjugated per trajectory
    (_global_general_slot_kick) and the cycle's global diagonal evaluated
    at the cycle-end frame (sig words masked to shard bits — local bits
    are lab-frame, never shifted).

    Same signature/semantics as make_sharded_autocorr_forward; matches it
    trajectory-for-trajectory (identical uniform draws) at the bf16x3 dot
    level. Requires a shard-local probe q < L - log2(n_amp) and
    17 <= L - log2(n_amp) <= 29: shards through 23 ride the VMEM-resident
    general per-shard kernel (ops/pallas_cycle), 24..29 the r2-blocked
    HBM-streamed general kernel (ops/pallas_cycle_hi_general;
    DTC_TPU_SHARDED_HI_MIN_LB lowers the crossover to 22 for
    cross-checks) — kernel-rate general-drive sharding up to
    L = 29 + log2(n_amp).

    `device=(p_1q (L,), p_2q (L-1,), events_per_kick)` replaces the
    depolarizing draw with DEVICE-noise rows (core.device_evolve.
    _device_general_rows: composed per-slot Pauli masks + bond-parity
    sign-flipped final-slot phi rows — the same commutation algebra as
    device_general_kernel_forward_batch, so the kernels run unchanged).
    Requires p == 0. n_amp >= 2 works (round 5; previously a hard
    n_amp == 1 restriction): the composed event masks' SHARD-BIT parts
    ride the exact global bookkeeping of the depolarizing branch — X
    parts deferred into the XOR frame (sig_b conjugating the global slot
    kicks), Z parts through the zm_prev column fold and the cycle-end
    global diagonal — while the device commutation's bond-sign flips
    reach the global/boundary bonds through per-cycle phi diagonal rows
    fed to _tail_phase_angles (the frame-conjugation flips multiply on
    top). Trajectory-exact vs the dense original-order oracle at
    n_amp=2 in interpret mode (tests/test_sharded_kernel.py). This is
    the device-noise route for general polarizations past the
    dense-gather cliff, single-chip (1,1) at 24 <= L <= 29 and
    amplitude-sharded to L = 29 + log2(n_amp) (reference device mode
    autocorr-delta-a-single-qiskit-fast.py:77-79 crossed with its
    general drives …-circular-polarization.py:110-142).
    """
    from dtc_tpu.core.sigma_evolve import _codes_from_uniform, _masks_from_codes
    from dtc_tpu.ops.pallas_cycle import general_cycle_forward_apply
    from dtc_tpu.ops.pallas_cycle_hi_general import (
        general_hi_cycle_forward_apply,
        general_hi_width,
    )
    from dtc_tpu.ops.pallas_resident import _C
    from dtc_tpu.ops.pallas_resident_general import (
        _LANE_U8,
        _bits_row,
        slot_u8,
    )

    n_amp = mesh.shape["amp"]
    n_traj_dev = mesh.shape["traj"]
    k_bits = int(np.log2(n_amp))
    local_bits = L - k_bits
    if not (17 <= local_bits <= 30):
        raise ValueError(
            f"general cycle-kernel sharding needs 17 <= L - log2(n_amp) "
            f"<= 30 (got L={L}, n_amp={n_amp}: local_bits={local_bits})")
    if not (0 <= q < local_bits):
        raise ValueError(
            "cycle-kernel sharding requires a shard-local probe qubit "
            f"q < L - log2(n_amp) = {local_bits} (got q={q})")
    use_hi = local_bits >= max(
        22, int(os.environ.get("DTC_TPU_SHARDED_HI_MIN_LB", "24")))
    split_state = use_hi and local_bits >= _hi_split_min_lb()
    width = general_hi_width(local_bits) if use_hi else 128
    M = 1 << local_bits
    TOP = M // _C
    af = ((1.0 - p) ** 6 if p > 0 else 1.0
          ) if ancilla_factor is None else ancilla_factor
    init_idx = 0 if initial_state == "vacuum" else neel_index(L)
    s0 = 1.0 if ((init_idx >> q) & 1) == 0 else -1.0
    S = T * K
    gmask = jnp.uint32(((1 << L) - 1) & ~(M - 1))
    if device is not None:
        if p != 0.0:
            raise ValueError("device mode replaces depolarizing noise; "
                             "pass p=0")
        from dtc_tpu.core.device_evolve import _device_general_rows
        dev_p1 = jnp.asarray(device[0], jnp.float32)
        dev_p2 = jnp.asarray(device[1], jnp.float32)
        dev_epk = int(device[2])

    def local_fn(angles, hs, phis, keys):
        u8 = jax.vmap(jax.vmap(lambda a: slot_u8(a[0], a[1])))(angles)
        FL = width - (4 * local_bits - 1)
        flags = jnp.zeros((T, K, FL), jnp.float32)
        flags = flags.at[:, :, _LANE_U8:_LANE_U8 + 8].set(u8)
        h_loc = hs[:local_bits].astype(jnp.float32)
        ph_loc = phis[: local_bits - 1].astype(jnp.float32)
        final = jnp.zeros((T, K, 1), jnp.float32).at[:, K - 1, :].set(1.0)
        hrow = final * h_loc[None, None]
        prow = final * ph_loc[None, None]
        offset = (jax.lax.axis_index("amp") * M).astype(jnp.uint32)
        gidx = (jnp.arange(M, dtype=jnp.uint32) + offset).reshape(TOP, _C)
        plane0 = (gidx == jnp.uint32(init_idx)).astype(jnp.float32)
        n = keys.shape[0]
        if split_state:
            state0 = (jnp.broadcast_to(plane0[None], (n, TOP, _C)),
                      jnp.zeros((n, TOP, _C), jnp.float32))
        else:
            state0 = jnp.broadcast_to(
                jnp.stack([plane0, jnp.zeros_like(plane0)])[None],
                (n, 2, TOP, _C))

        def sample(key):
            if device is not None:
                # device-noise rows: composed per-slot masks + sign-flipped
                # final-slot phi rows (same presample as the oracle in
                # core.device_evolve — trajectory-exact validation). The
                # masks' shard-bit parts take the SAME deferral bookkeeping
                # as the depolarizing branch below; the sign-adjusted phi
                # row additionally rides to the global diagonal per cycle.
                zm, xm, phi_rows = _device_general_rows(
                    key, phis.astype(jnp.float32), dev_p1, dev_p2,
                    dev_epk, T, K, L)              # (S,), (S,), (S, L-1)
                csum = jax.lax.associative_scan(jnp.bitwise_xor, xm)
                sig_b = jnp.concatenate(
                    [jnp.zeros((1,), jnp.uint32), csum[:-1]])
                zm_prev = jnp.concatenate(
                    [jnp.zeros((1,), jnp.uint32), zm[:-1]])
                zmb = _bits_row(zm & jnp.uint32(M - 1), local_bits
                                ).reshape(T, K, local_bits)
                xmb = _bits_row(xm & jnp.uint32(M - 1), local_bits
                                ).reshape(T, K, local_bits)
                phi_tk = phi_rows.reshape(T, K, L - 1)
                tiles = jnp.concatenate(
                    [zmb, xmb, hrow, phi_tk[..., : local_bits - 1], flags],
                    axis=-1)
                return (tiles, sig_b.reshape(T, K), zm_prev.reshape(T, K),
                        zm.reshape(T, K)[:, K - 1],
                        csum.reshape(T, K)[:, K - 1], phi_tk[:, K - 1])
            # same uniform draw as general_forward_batch / sigma engine
            if p > 0.0:
                u = jax.random.uniform(key, (S, L), dtype=jnp.float32)
                codes = _codes_from_uniform(u, p)
                xm, zm = _masks_from_codes(codes, L)
            else:
                xm = zm = jnp.zeros((S,), jnp.uint32)
            csum = jax.lax.associative_scan(jnp.bitwise_xor, xm)
            sig_b = jnp.concatenate([jnp.zeros((1,), jnp.uint32), csum[:-1]])
            zm_prev = jnp.concatenate([jnp.zeros((1,), jnp.uint32), zm[:-1]])
            zmb = _bits_row(zm & jnp.uint32(M - 1), local_bits
                            ).reshape(T, K, local_bits)
            xmb = _bits_row(xm & jnp.uint32(M - 1), local_bits
                            ).reshape(T, K, local_bits)
            tiles = jnp.concatenate([zmb, xmb, hrow, prow, flags], axis=-1)
            return (tiles, sig_b.reshape(T, K), zm_prev.reshape(T, K),
                    zm.reshape(T, K)[:, K - 1], csum.reshape(T, K)[:, K - 1])

        outs = jax.vmap(sample)(keys)
        if device is not None:
            tiles, sig_b, zm_prev, zm_fin, csum_fin, phi_fin = outs
        else:
            (tiles, sig_b, zm_prev, zm_fin, csum_fin), phi_fin = outs, None

        def body(st, inp):
            if device is not None:
                ang, tiles_t, sigb_t, zmp_t, zmf_t, csf_t, phf_t = inp
            else:
                ang, tiles_t, sigb_t, zmp_t, zmf_t, csf_t = inp
                phf_t = phis
            if use_hi:
                st, a_part = general_hi_cycle_forward_apply(
                    st, tiles_t, L=local_bits, K=K, q=q,
                    interpret=interpret)
                if split_state:
                    st = tuple(s.reshape(n, TOP, _C) for s in st)
                else:
                    st = st.reshape(n, 2, TOP, _C)
            else:
                st, a_part = general_cycle_forward_apply(
                    st, tiles_t, L=local_bits, K=K, q=q, interpret=interpret)
            if k_bits:
                def _tail(stf):
                    for k in range(K):
                        stf = _global_general_slot_kick(
                            stf, ang[k, 0], ang[k, 1], sigb_t[:, k],
                            zmp_t[:, k], local_bits=local_bits,
                            n_amp=n_amp)
                    return _global_diag(stf, zmf_t & gmask, csf_t & gmask,
                                        hs, phf_t, L=L,
                                        local_bits=local_bits)

                st = _on_fused(st, split_state, _tail)
            return st, jax.lax.psum(a_part, "amp")

        xs = (angles[: T - 1], jnp.swapaxes(tiles, 0, 1)[: T - 1],
              jnp.swapaxes(sig_b, 0, 1)[: T - 1],
              jnp.swapaxes(zm_prev, 0, 1)[: T - 1],
              zm_fin.T[: T - 1], csum_fin.T[: T - 1])
        if device is not None:
            xs = xs + (jnp.swapaxes(phi_fin, 0, 1)[: T - 1],)
        _, a_frames = jax.lax.scan(body, state0, xs)  # (T-1, n)

        a_traj = af * s0 * a_frames.T                 # (n, T-1); no sigma
        a_traj = jnp.concatenate(                     # sign: q is lab-frame
            [jnp.full((n, 1), af, jnp.float32), a_traj], axis=1)
        total = jax.lax.psum(jnp.sum(a_traj, axis=0), "traj")
        return total / (n * n_traj_dev)

    fn = shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(P(), P(), P(), P("traj", None)),
        out_specs=P(),
        check_vma=False,
    )
    return jax.jit(fn)


def make_sharded_echo_general(
    mesh, *, L, T, K, p, q, initial_state="vacuum", ancilla_factor=None,
    interpret=False, device=None,
):
    """LAB-frame cycle-kernel sharded echo A0(t) for EVERY polarization
    family and per-cycle schedule — the echo half of multi-chip
    y/xy/yx/circular/xy_cycle and adaptive-g studies previously fell to
    the XLA sharded engine (the general counterpart of
    make_sharded_echo_kernel; reference echo semantics with reversed
    per-cycle schedules:
    autocorr-delta-a-single-qiskit-fast-circular-polarization.py:164-172).

    Fixed-length masked 2T switch scan. Forward steps run the forward
    hybrid's body (general_cycle_forward_apply + sigma-conjugated global
    slot kicks + eager global diagonal). Inverse steps have NO conjugation
    trick (Y-containing slot kicks are not symmetric): the global head
    applies the DAGGERED diagonal (_global_diag_inv, evaluated at the
    step's pre-event sigma with the previous event's deferred Z word,
    zeroed at the turnaround) then the daggered global slot kicks in
    REVERSED slot order; the local half is ONE
    ops/pallas_cycle.general_cycle_inverse_apply call per step with
    (pre, post) compact rows built exactly like
    pallas_resident_general.general_echo_batch.tiles_one's inverse steps
    restricted to local bits. Padding steps are a no-op branch.

    Same signature as make_sharded_echo: fn(angles, hs, phis,
    keys (n_traj,2), t_value) -> scalar; requires a shard-local probe
    q < L - log2(n_amp) and 17 <= L - log2(n_amp) <= 29 (shards past the
    VMEM kernel's 23 ride the r2-blocked HBM-streamed general kernels,
    ops/pallas_cycle_hi_general; DTC_TPU_SHARDED_HI_MIN_LB lowers the
    crossover to 22 for cross-checks). Matches make_sharded_echo
    trajectory-for-trajectory (identical uniform draws).
    """
    from dtc_tpu.core.sigma_evolve import _codes_from_uniform, _masks_from_codes
    from dtc_tpu.ops.pallas_cycle import (
        general_cycle_forward_apply,
        general_cycle_inverse_apply,
    )
    from dtc_tpu.ops.pallas_cycle_hi_general import (
        general_hi_cycle_forward_apply,
        general_hi_cycle_inverse_apply,
        general_hi_width,
    )
    from dtc_tpu.ops.pallas_resident import _C
    from dtc_tpu.ops.pallas_resident_general import (
        _LANE_U8,
        _bits_row,
        slot_u8,
    )

    n_amp = mesh.shape["amp"]
    n_traj_dev = mesh.shape["traj"]
    k_bits = int(np.log2(n_amp))
    local_bits = L - k_bits
    if not (17 <= local_bits <= 30):
        raise ValueError(
            f"general cycle-kernel sharding needs 17 <= L - log2(n_amp) "
            f"<= 30 (got L={L}, n_amp={n_amp}: local_bits={local_bits})")
    if not (0 <= q < local_bits):
        raise ValueError(
            "cycle-kernel sharding requires a shard-local probe qubit "
            f"q < L - log2(n_amp) = {local_bits} (got q={q})")
    use_hi = local_bits >= max(
        22, int(os.environ.get("DTC_TPU_SHARDED_HI_MIN_LB", "24")))
    split_state = use_hi and local_bits >= _hi_split_min_lb()
    width = general_hi_width(local_bits) if use_hi else 128
    M = 1 << local_bits
    TOP = M // _C
    af = ((1.0 - p) ** 6 if p > 0 else 1.0
          ) if ancilla_factor is None else ancilla_factor
    init_idx = 0 if initial_state == "vacuum" else neel_index(L)
    s0 = 1.0 if ((init_idx >> q) & 1) == 0 else -1.0
    T2 = 2 * T
    gmask = jnp.uint32(((1 << L) - 1) & ~(M - 1))
    mlow = jnp.uint32(M - 1)
    if device is not None:
        # device-noise rows (see make_sharded_autocorr_forward_general):
        # n_amp >= 2 rides the depolarizing branch's global bookkeeping —
        # composed masks' shard-bit X parts into the XOR frame, Z parts
        # through zm_prev/zm_fin — while the rows' baked commutation signs
        # reach the global/boundary diagonal as per-step h/phi rows (the
        # frame flips compose by XOR on top: conj_sig(conj_m(D)) =
        # conj_{sig^m}(D), so baked rows + full-frame flips are exact)
        if p != 0.0:
            raise ValueError("device mode replaces depolarizing noise; "
                             "pass p=0")
        from dtc_tpu.core.device_evolve import _device_general_echo_rows
        dev_p1 = jnp.asarray(device[0], jnp.float32)
        dev_p2 = jnp.asarray(device[1], jnp.float32)
        dev_epk = int(device[2])

    def local_fn(angles, hs, phis, keys, t_value):
        step = jnp.arange(T2)
        fwd = step < t_value
        active = step < 2 * t_value
        # cycle index: forward i = step, inverse i = 2t-1-step (reversed
        # time order for time-dependent schedules)
        ci = jnp.where(fwd, jnp.minimum(step, T - 1),
                       jnp.clip(2 * t_value - 1 - step, 0, T - 1))
        ang_c = jnp.take(angles, ci, axis=0)                 # (T2, K, 2)
        # processed-slot angles: forward slot j = cycle slot j, inverse
        # slot j = cycle slot K-1-j (daggered in-branch)
        ang_step = jnp.where(fwd[:, None, None], ang_c,
                             jnp.flip(ang_c, axis=1))
        u8f = jax.vmap(jax.vmap(lambda a: slot_u8(a[0], a[1])))(ang_c)
        u8i = jax.vmap(jax.vmap(
            lambda a: slot_u8(a[0], a[1], inverse=True)))(
                jnp.flip(ang_c, axis=1))                     # (T2, K, 8)

        FL = width - (4 * local_bits - 1)
        h_loc = hs[:local_bits].astype(jnp.float32)
        ph_loc = phis[: local_bits - 1].astype(jnp.float32)
        flags_f = jnp.zeros((T2, K, FL), jnp.float32
                            ).at[:, :, _LANE_U8:_LANE_U8 + 8].set(u8f)
        flags_i = jnp.zeros((T2, K, FL), jnp.float32
                            ).at[:, :, _LANE_U8:_LANE_U8 + 8].set(u8i)
        final = jnp.zeros((T2, K, 1), jnp.float32).at[:, K - 1, :].set(1.0)
        first = jnp.zeros((T2, K, 1), jnp.float32).at[:, 0, :].set(1.0)
        hrow_f = final * h_loc[None, None]
        prow_f = final * ph_loc[None, None]
        hrow_i = -first * h_loc[None, None]    # D0^dag lead, first slot
        prow_i = -first * ph_loc[None, None]
        zl = jnp.zeros((T2, K, local_bits), jnp.float32)
        zp = jnp.zeros((T2, K, local_bits - 1), jnp.float32)
        zfl = jnp.zeros((T2, K, FL), jnp.float32)

        offset = (jax.lax.axis_index("amp") * M).astype(jnp.uint32)
        gidx = (jnp.arange(M, dtype=jnp.uint32) + offset).reshape(TOP, _C)
        plane0 = (gidx == jnp.uint32(init_idx)).astype(jnp.float32)
        zq = z_sign_mask(q, L, offset=offset, size=M).astype(
            jnp.float32).reshape(TOP, _C)
        n = keys.shape[0]
        if split_state:
            state0 = (jnp.broadcast_to(plane0[None], (n, TOP, _C)),
                      jnp.zeros((n, TOP, _C), jnp.float32))
        else:
            state0 = jnp.broadcast_to(
                jnp.stack([plane0, jnp.zeros_like(plane0)])[None],
                (n, 2, TOP, _C))

        def sample(key):
            if device is not None:
                # device-noise (pre, post) rows: forward steps carry the
                # commuted bond events + sign-conjugated postdiag in the
                # final slot; inverse steps carry the conjugated D0^dag
                # prediag in the first slot (same presample as the dense
                # original-order oracle in core.device_evolve)
                xk, zk, pre_h, pre_phi, post_h, post_phi = (
                    _device_general_echo_rows(
                        key, t_value, hs.astype(jnp.float32),
                        phis.astype(jnp.float32), dev_p1, dev_p2,
                        dev_epk, T, K, L))
                csum = jax.lax.associative_scan(
                    jnp.bitwise_xor, xk.reshape(-1))
                sig_b = jnp.concatenate(
                    [jnp.zeros((1,), jnp.uint32), csum[:-1]]
                ).reshape(T2, K)
                zm_prev = jnp.concatenate(
                    [jnp.zeros((1,), jnp.uint32),
                     zk.reshape(-1)[:-1]]).reshape(T2, K)
                # turnaround rule as the depolarizing branch: the last
                # forward step's final event Z was consumed by that step's
                # global diagonal (zm_fin), so the first inverse step
                # defers zero
                zm_prev = zm_prev.at[:, 0].set(
                    jnp.where(step == t_value, jnp.uint32(0),
                              zm_prev[:, 0]))
                zmb = _bits_row(zk & mlow, local_bits)
                xmb = _bits_row(xk & mlow, local_bits)
                hrow_fd = jnp.zeros((T2, K, local_bits), jnp.float32
                                    ).at[:, K - 1].set(
                                        post_h[:, :local_bits])
                prow_fd = jnp.zeros((T2, K, local_bits - 1), jnp.float32
                                    ).at[:, K - 1].set(
                                        post_phi[:, : local_bits - 1])
                hrow_id = jnp.zeros((T2, K, local_bits), jnp.float32
                                    ).at[:, 0].set(pre_h[:, :local_bits])
                prow_id = jnp.zeros((T2, K, local_bits - 1), jnp.float32
                                    ).at[:, 0].set(
                                        pre_phi[:, : local_bits - 1])
                rows_f = jnp.concatenate(
                    [zmb, xmb, hrow_fd, prow_fd, flags_f], axis=-1)
                pre = jnp.concatenate(
                    [zl, xmb, hrow_id, prow_id, flags_i], axis=-1)
                post = jnp.concatenate(
                    [zmb, zl, 0.0 * hrow_fd, zp, zfl], axis=-1)
                rows_i = jnp.stack([pre, post], axis=2)
                return (rows_f, rows_i, sig_b, zm_prev, zk[:, K - 1],
                        csum.reshape(T2, K)[:, K - 1],
                        pre_h, pre_phi, post_h, post_phi)
            # identical uniform draw to make_sharded_echo so the engines
            # agree trajectory-for-trajectory with the same keys
            if p > 0.0:
                u = jax.random.uniform(key, (T2, K, L), dtype=jnp.float32)
                codes = _codes_from_uniform(u, p)
                codes = jnp.where(active[:, None, None], codes, 0)
                xm, zm = _masks_from_codes(codes, L)         # (T2, K)
            else:
                xm = zm = jnp.zeros((T2, K), jnp.uint32)
            csum = jax.lax.associative_scan(
                jnp.bitwise_xor, xm.reshape(-1))
            sig_b = jnp.concatenate(
                [jnp.zeros((1,), jnp.uint32), csum[:-1]]).reshape(T2, K)
            zm_prev = jnp.concatenate(
                [jnp.zeros((1,), jnp.uint32),
                 zm.reshape(-1)[:-1]]).reshape(T2, K)
            # turnaround: the last forward cycle folded its own final
            # event eagerly (diag), so the first inverse step defers zero
            zm_prev = zm_prev.at[:, 0].set(
                jnp.where(step == t_value, jnp.uint32(0), zm_prev[:, 0]))
            zmb = _bits_row(zm & mlow, local_bits)
            xmb = _bits_row(xm & mlow, local_bits)
            rows_f = jnp.concatenate(
                [zmb, xmb, hrow_f, prow_f, flags_f], axis=-1)
            pre = jnp.concatenate([zl, xmb, hrow_i, prow_i, flags_i],
                                  axis=-1)
            post = jnp.concatenate([zmb, zl, 0.0 * hrow_f, zp, zfl],
                                   axis=-1)
            rows_i = jnp.stack([pre, post], axis=2)   # (T2, K, 2, 128)
            return (rows_f, rows_i, sig_b, zm_prev,
                    zm[:, K - 1], csum.reshape(T2, K)[:, K - 1])

        outs = jax.vmap(sample)(keys)
        if device is not None:
            (rows_f, rows_i, sig_b, zm_prev, zm_fin, csum_fin,
             pre_h, pre_phi, post_h, post_phi) = outs
        else:
            (rows_f, rows_i, sig_b, zm_prev, zm_fin, csum_fin) = outs

        def br_fwd(op):
            st, ang_t, rf, ri, sigb, zmp, zmf, csf = op[:8]
            if use_hi:
                # slots=2: co-allocated with the inverse kernel in the
                # echo switch (see make_sharded_echo_kernel)
                st, _ = general_hi_cycle_forward_apply(
                    st, rf, L=local_bits, K=K, q=q, interpret=interpret,
                    slots=2)
                if split_state:
                    st = tuple(s.reshape(n, TOP, _C) for s in st)
                else:
                    st = st.reshape(n, 2, TOP, _C)
            else:
                st, _ = general_cycle_forward_apply(
                    st, rf, L=local_bits, K=K, q=q, interpret=interpret)
            if k_bits:
                def _tail(stf):
                    for k in range(K):
                        stf = _global_general_slot_kick(
                            stf, ang_t[k, 0], ang_t[k, 1], sigb[:, k],
                            zmp[:, k], local_bits=local_bits, n_amp=n_amp)
                    if device is not None:
                        # forward postdiag with the commutation-sign-baked
                        # rows (turnaround conjugation included); frame
                        # flips compose by XOR on top
                        return _global_diag(
                            stf, zmf & gmask, csf & gmask, op[10], op[11],
                            L=L, local_bits=local_bits)
                    return _global_diag(stf, zmf & gmask, csf & gmask, hs,
                                        phis, L=L, local_bits=local_bits)

                st = _on_fused(st, split_state, _tail)
            return st

        def br_inv(op):
            st, ang_t, rf, ri, sigb, zmp, zmf, csf = op[:8]
            if k_bits:
                def _head(stf):
                    if device is not None:
                        # the D0^dag negation + crossing conjugations are
                        # BAKED into the pre rows, so the inverse prediag
                        # is the plain (non-negating) _global_diag over
                        # them
                        stf = _global_diag(
                            stf, zmp[:, 0] & gmask, sigb[:, 0] & gmask,
                            op[8], op[9], L=L, local_bits=local_bits)
                    else:
                        stf = _global_diag_inv(
                            stf, zmp[:, 0] & gmask, sigb[:, 0] & gmask,
                            hs, phis, L=L, local_bits=local_bits)
                    for j in range(K):
                        zw = (jnp.zeros_like(zmp[:, 0]) if j == 0
                              else zmp[:, j])
                        stf = _global_general_slot_kick(
                            stf, ang_t[j, 0], ang_t[j, 1], sigb[:, j], zw,
                            local_bits=local_bits, n_amp=n_amp,
                            dagger=True)
                    return stf

                st = _on_fused(st, split_state, _head)
            if use_hi:
                st = general_hi_cycle_inverse_apply(
                    st, ri, L=local_bits, K=K, interpret=interpret,
                    slots=2)
                if split_state:
                    return tuple(s.reshape(n, TOP, _C) for s in st)
                return st.reshape(n, 2, TOP, _C)
            return general_cycle_inverse_apply(
                st, ri, L=local_bits, K=K, interpret=interpret)

        def body(st, inp):
            k, op_rest = inp
            op = (st,) + op_rest
            kind = jnp.where(k < t_value, 0,
                             jnp.where(k < 2 * t_value, 1, 2))
            st = jax.lax.switch(kind, [br_fwd, br_inv, lambda op: op[0]],
                                op)
            return st, None

        ops = (ang_step, jnp.swapaxes(rows_f, 0, 1),
               jnp.swapaxes(rows_i, 0, 1),
               jnp.swapaxes(sig_b, 0, 1), jnp.swapaxes(zm_prev, 0, 1),
               zm_fin.T, csum_fin.T)
        if device is not None:
            ops = ops + (jnp.swapaxes(pre_h, 0, 1),
                         jnp.swapaxes(pre_phi, 0, 1),
                         jnp.swapaxes(post_h, 0, 1),
                         jnp.swapaxes(post_phi, 0, 1))
        xs = (step, ops)
        st, _ = jax.lax.scan(body, state0, xs)

        st_re, st_im = st if split_state else (st[:, 0], st[:, 1])
        part = jnp.sum((st_re ** 2 + st_im ** 2) * zq, axis=(1, 2))
        # q is lab-frame local: no sigma measurement sign
        e_traj = af * s0 * jax.lax.psum(part, "amp")
        total = jax.lax.psum(jnp.sum(e_traj), "traj")
        return total / (n * n_traj_dev)

    fn = shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(P(), P(), P(), P("traj", None), P()),
        out_specs=P(),
        check_vma=False,
    )
    return jax.jit(fn)


def make_sharded_autocorr_forward(
    mesh, *, L, T, K, p, q, initial_state="vacuum", dtype=jnp.complex64,
    ancilla_factor=None, has_y=False,
):
    """Build a jitted sharded forward-autocorrelator (sigma-frame factored).

    Returns fn(angles (T,K,2), hs (L,), phis (L-1,), keys (n_traj, 2))
    -> A (T,) trajectory-averaged, replicated on all devices.
    `n_traj` must be a multiple of mesh.shape['traj']. Noise is presampled
    per trajectory outside the scan and its X-part deferred into the XOR
    frame (shard-id bits included), so the scan body carries no PRNG, no
    gathers, and no per-string collectives.

    For constant x-only schedules with 17 <= L - log2(n_amp) <= 23 the
    cycle-kernel variant (make_sharded_autocorr_forward_kernel) runs the
    local work at Pallas-kernel rate instead of XLA-scan rate.
    """
    from dtc_tpu.core.sigma_evolve import presample_noise

    n_amp = mesh.shape["amp"]
    n_traj_dev = mesh.shape["traj"]
    k_bits = int(np.log2(n_amp))
    local_bits = L - k_bits
    if local_bits < 1:
        raise ValueError(f"L={L} too small for {n_amp} amp-shards")
    M = 1 << local_bits
    af = ((1.0 - p) ** 6 if p > 0 else 1.0) if ancilla_factor is None else ancilla_factor
    init_idx = 0 if initial_state == "vacuum" else neel_index(L)
    s0 = 1.0 if ((init_idx >> q) & 1) == 0 else -1.0
    ckw = dict(L=L, local_bits=local_bits, n_amp=n_amp, K=K, p=p, dtype=dtype,
               has_y=has_y)

    def local_fn(angles, hs, phis, keys):
        offset = (jax.lax.axis_index("amp") * M).astype(jnp.uint32)
        d0 = zz_z_phase_mask(hs, phis, L, offset=offset, size=M, dtype=dtype)
        zq = z_sign_mask(q, L, offset=offset, size=M).astype(jnp.float32)
        gidx = jnp.arange(M, dtype=jnp.uint32) + offset
        state0 = (gidx == jnp.uint32(init_idx)).astype(dtype)
        exp_h = jnp.exp(1j * hs.astype(jnp.float32)).astype(dtype)
        exp_p = jnp.exp(1j * phis.astype(jnp.float32)).astype(dtype)

        def one_traj(key):
            if p > 0.0:
                xm, zm, sig_b, csum = presample_noise(key, p, T * K, L)
                zm = zm.reshape(T, K)
                sig_b = sig_b.reshape(T, K)
                sig_after = csum.reshape(T, K)[:, -1]
                sig_at_start = jnp.concatenate(
                    [jnp.zeros((1,), jnp.uint32), sig_after[:-1]])
            else:
                zm = sig_b = jnp.zeros((T, K), jnp.uint32)
                sig_after = sig_at_start = jnp.zeros((T,), jnp.uint32)

            def body(carry, inp):
                st, pend = carry
                ang, ev, sig0 = inp
                sq = (1 - 2 * ((sig0 >> q) & jnp.uint32(1)).astype(
                    jnp.int32)).astype(jnp.float32)
                part = jnp.sum(
                    (jnp.real(st) ** 2 + jnp.imag(st) ** 2) * zq)
                a_t = af * s0 * sq * jax.lax.psum(part, "amp")
                st, pend = _sharded_forward_cycle(
                    st, pend, ang, ev, d0, exp_h, exp_p, **ckw)
                return (st, pend), a_t

            _, a = jax.lax.scan(
                body, (state0, (jnp.uint32(0), jnp.uint32(0))),
                (angles, (zm, sig_b, sig_after), sig_at_start))
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
    ancilla_factor=None, has_y=False,
):
    """Sharded echo A0(t): fixed-length masked scan (forward t, inverse t),
    sigma-frame factored like the forward path (presampled noise with
    inactive-step codes zeroed; no in-scan PRNG/gathers/string collectives).

    Returns fn(angles, hs, phis, keys (n_traj,2), t_value) -> scalar echo.
    """
    from dtc_tpu.core.sigma_evolve import _codes_from_uniform, _masks_from_codes

    n_amp = mesh.shape["amp"]
    n_traj_dev = mesh.shape["traj"]
    k_bits = int(np.log2(n_amp))
    local_bits = L - k_bits
    M = 1 << local_bits
    af = ((1.0 - p) ** 6 if p > 0 else 1.0) if ancilla_factor is None else ancilla_factor
    init_idx = 0 if initial_state == "vacuum" else neel_index(L)
    s0 = 1.0 if ((init_idx >> q) & 1) == 0 else -1.0

    def local_fn(angles, hs, phis, keys, t_value):
        offset = (jax.lax.axis_index("amp") * M).astype(jnp.uint32)
        d0 = zz_z_phase_mask(hs, phis, L, offset=offset, size=M, dtype=dtype)
        d0c = jnp.conj(d0)
        zq = z_sign_mask(q, L, offset=offset, size=M).astype(jnp.float32)
        gidx = jnp.arange(M, dtype=jnp.uint32) + offset
        state0 = (gidx == jnp.uint32(init_idx)).astype(dtype)
        exp_h = jnp.exp(1j * hs.astype(jnp.float32)).astype(dtype)
        exp_p = jnp.exp(1j * phis.astype(jnp.float32)).astype(dtype)
        exp_hc, exp_pc = jnp.conj(exp_h), jnp.conj(exp_p)
        eye_ang = jnp.zeros((K, 2), dtype=angles.dtype)
        one = jnp.ones((), dtype)

        def one_traj(key):
            if p > 0.0:
                u = jax.random.uniform(key, (2 * T, K, L), dtype=jnp.float32)
                codes = _codes_from_uniform(u, p)
                step = jnp.arange(2 * T)
                active = (step < 2 * t_value)[:, None, None]
                codes = jnp.where(active, codes, 0)
                xm, zm = _masks_from_codes(codes, L)
                flat = xm.reshape(-1)
                csum = jax.lax.associative_scan(jnp.bitwise_xor, flat)
                sig_b = jnp.concatenate(
                    [jnp.zeros((1,), jnp.uint32), csum[:-1]]).reshape(2 * T, K)
                sig_after = csum.reshape(2 * T, K)[:, -1]
            else:
                zm = sig_b = jnp.zeros((2 * T, K), jnp.uint32)
                sig_after = jnp.zeros((2 * T,), jnp.uint32)

            def body(carry, inp):
                # ONE direction-selected cycle per step (select-before-apply:
                # the kick einsums and global-bit ppermutes run once; only
                # the 2x2 unitaries, (L,) exponent vectors, diagonal vectors
                # and noise words are where()-selected). Matches
                # _sharded_forward_cycle and the unsharded
                # core.sigma_evolve.inverse_cycle_fac exactly —
                # same kick slot order (fwd ascending / inv descending), the
                # inverse's d0c BEFORE its kicks vs the forward's d0 after,
                # and the turnaround rule (sig_b[0] ^ pend_sig on the first
                # inverse kick). Padding steps (kstep >= 2*t_value) zero
                # every noise fold and ride identity kicks, leaving state
                # and carry untouched.
                st, pend = carry
                kstep, ev = inp
                zm, sig_b, sig_after = ev
                fwd = kstep < t_value
                inv = (kstep >= t_value) & (kstep < 2 * t_value)
                active = fwd | inv
                i = jnp.where(fwd, kstep,
                              jnp.clip(2 * t_value - 1 - kstep, 0, T - 1))
                ang = jnp.where(active, angles[i], eye_ang)
                pend_zm, pend_sig = pend
                exp_h_s = jnp.where(inv, exp_hc, exp_h)
                exp_p_s = jnp.where(inv, exp_pc, exp_p)
                zero = jnp.uint32(0)
                st = st * jnp.where(inv, d0c, one)
                for j in range(K):
                    ang_j = jnp.where(fwd, ang[j], ang[K - 1 - j])
                    pz = pend_zm if j == 0 else zm[j - 1]
                    pz = jnp.where(active, pz, zero)
                    if j == 0:
                        dsig = jnp.where(
                            inv, sig_b[0] ^ pend_sig,
                            jnp.where(fwd, pend_sig, zero))
                    else:
                        dsig = zero
                    st = _sharded_kick_factored(
                        st, ang_j[0], ang_j[1], sig_b[j], pz, dsig,
                        exp_h_s, exp_p_s, has_y=has_y, inv_t=inv,
                        L=L, local_bits=local_bits, n_amp=n_amp, dtype=dtype)
                st = st * jnp.where(fwd, d0, one)
                pend2 = (jnp.where(active, zm[K - 1], pend_zm),
                         jnp.where(fwd, sig_after,
                                   jnp.where(inv, zero, pend_sig)))
                return (st, pend2), None

            xs = (jnp.arange(2 * T), (zm, sig_b, sig_after))
            (st, _), _ = jax.lax.scan(
                body, (state0, (jnp.uint32(0), jnp.uint32(0))), xs)
            sigma_fin = sig_after[-1]
            sq = (1 - 2 * ((sigma_fin >> q) & jnp.uint32(1)).astype(
                jnp.int32)).astype(jnp.float32)
            part = jnp.sum((jnp.real(st) ** 2 + jnp.imag(st) ** 2) * zq)
            return af * s0 * sq * jax.lax.psum(part, "amp")

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

        def fwd_cycle(state, ang, codes_t):
            # codes_t: (K, L) presampled Pauli codes for this cycle — the
            # scan body does no PRNG (one sample_depolarizing_codes call per
            # trajectory outside the scan); eager string application stays
            # because <X_q> is measured every cycle (off-diagonal — a
            # deferred XOR frame cannot cancel its pending phases)
            for kk in range(K):
                u = slot_unitary(ang[kk, 0], ang[kk, 1], dtype)
                state = apply_uniform_1q_layer(state, u, local_bits)
                for gb in range(k_bits):
                    state = _global_1q(state, u, gb, n_amp)
                if p > 0.0:
                    xm, zm, ny = pauli_string_masks(codes_t[kk])
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
            if p > 0.0:
                codes = sample_depolarizing_codes(key, p, (T, K, L))
            else:
                codes = jnp.zeros((T, K, L), jnp.int32)

            def body(carry, inp):
                ang, codes_t = inp
                out = measure(carry)
                carry = fwd_cycle(carry, ang, codes_t)
                return carry, out

            _, (e, zs) = jax.lax.scan(body, psi0, (angles, codes))
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
