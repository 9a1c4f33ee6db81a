"""Shared sweep machinery: instance x trajectory batching with memory-aware
trajectory chunking.

Replaces the reference's serial python loops over disorder instances and time
points (autocorr-delta-a-single-qiskit-fast.py:217-239, O(inst*tf^2) rebuilt
circuits) with vmap axes over (instance, trajectory) around O(T) scans.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from dtc_tpu.core.evolve import autocorr_echo, autocorr_forward
from dtc_tpu.core.statevector import initial_statevector
from dtc_tpu.models.drives import build_kick_schedule
from dtc_tpu.models.noise import NoiseSpec
from dtc_tpu.ops.diag import zz_z_phase_mask


DEFAULT_BATCH_BYTES = 2 << 30  # ~2 GB of live state per chunk


def resolve_dtype(name: str):
    return {"complex64": jnp.complex64, "complex128": jnp.complex128}[name]


def traj_chunks(n_traj: int, L: int, extra_factor: int = 2,
                budget_bytes: int = DEFAULT_BATCH_BYTES) -> int:
    """Trajectories per chunk so live states stay under the HBM budget."""
    bytes_per_traj = extra_factor * (1 << L) * 8
    return max(1, min(n_traj, budget_bytes // max(1, bytes_per_traj)))


def build_context(cfg, hs, phis):
    """Per-run precomputation: schedule, per-instance diag masks, psi0."""
    dtype = resolve_dtype(cfg.dtype)
    sched = build_kick_schedule(
        cfg.polarization, cfg.g, cfg.tf,
        circular_frequency=cfg.circular_frequency,
        xy_cycle_period=cfg.xy_cycle_period,
    )
    hs = jnp.asarray(hs)
    phis = jnp.asarray(phis)
    diags = jax.vmap(
        lambda h, ph: zz_z_phase_mask(h, ph, cfg.L, dtype=dtype)
    )(hs[:, : cfg.L], phis[:, : cfg.L - 1])
    psi0 = initial_statevector(cfg.L, cfg.initial_state, dtype=dtype)
    noise = NoiseSpec(p=cfg.noise_p)
    return sched, diags, psi0, noise


def forward_sweep(cfg, sched, diags, psi0, noise, key) -> np.ndarray:
    """A(t) per instance, trajectory-averaged: returns (inst, T)."""
    p = noise.p
    af = noise.ancilla_factor if p > 0 else 1.0
    kw = dict(L=cfg.L, T=cfg.tf, K=sched.K, p=p, q=cfg.probe_qubit, ancilla_factor=af)

    if p == 0.0:
        one = jax.vmap(
            lambda d: autocorr_forward(psi0, sched.angles, d, key, **kw)
        )(diags)
        return np.asarray(one)

    n_traj = cfg.n_trajectories
    chunk = traj_chunks(n_traj, cfg.L, extra_factor=2 * cfg.inst)
    acc = np.zeros((cfg.inst, cfg.tf))
    done = 0
    run = jax.jit(
        jax.vmap(  # instances
            jax.vmap(  # trajectories
                lambda d, k: autocorr_forward(psi0, sched.angles, d, k, **kw),
                in_axes=(None, 0),
            ),
            in_axes=(0, 0),
        )
    )
    ki = jax.random.split(key, cfg.inst)
    while done < n_traj:
        c = min(chunk, n_traj - done)
        keys = jnp.stack(
            [jax.random.split(jax.random.fold_in(k, done), c) for k in ki]
        )  # (inst, c, 2)
        vals = run(diags, keys)  # (inst, c, T)
        acc += np.asarray(jnp.sum(vals, axis=1))
        done += c
    return acc / n_traj


def echo_sweep(cfg, sched, diags, psi0, noise, key, *, t_chunk: int = 8) -> np.ndarray:
    """Echo A0(t) per instance, trajectory-averaged: (inst, T).

    Noiseless echo is exactly 1 (U^dag U = I) — returned analytically, which
    is also the reference's own self-validation invariant (SURVEY.md §4.1).
    """
    p = noise.p
    if p == 0.0:
        return np.ones((cfg.inst, cfg.tf))
    af = noise.ancilla_factor
    kw = dict(L=cfg.L, T=cfg.tf, K=sched.K, p=p, q=cfg.probe_qubit, ancilla_factor=af)

    n_traj = cfg.n_trajectories
    chunk = traj_chunks(n_traj, cfg.L, extra_factor=2 * cfg.inst * t_chunk)
    run = jax.jit(
        jax.vmap(  # instances
            jax.vmap(  # trajectories
                jax.vmap(  # time points
                    lambda d, k, t: autocorr_echo(
                        psi0, sched.angles, d, k, t, **kw
                    ),
                    in_axes=(None, None, 0),
                ),
                in_axes=(None, 0, None),
            ),
            in_axes=(0, 0, None),
        )
    )
    ki = jax.random.split(jax.random.fold_in(key, 1), cfg.inst)
    out = np.zeros((cfg.inst, cfg.tf))
    for t0 in range(0, cfg.tf, t_chunk):
        ts = jnp.arange(t0, min(t0 + t_chunk, cfg.tf))
        ts_pad = jnp.pad(ts, (0, t_chunk - len(ts)), mode="edge")
        acc = np.zeros((cfg.inst, t_chunk))
        done = 0
        while done < n_traj:
            c = min(chunk, n_traj - done)
            keys = jnp.stack(
                [jax.random.split(jax.random.fold_in(k, 7919 + done), c) for k in ki]
            )
            vals = run(diags, keys, ts_pad)  # (inst, c, t_chunk)
            acc += np.asarray(jnp.sum(vals, axis=1))
            done += c
        out[:, t0 : t0 + len(ts)] = (acc / n_traj)[:, : len(ts)]
    return out


def apply_shot_noise(values: np.ndarray, shots: int, seed: int = 0) -> np.ndarray:
    """Binomial measurement sampling: <Z> -> (2*Binom(shots, (1+A)/2)/shots - 1).

    Shot-noise studies (autocorr-delta-a-single-qiskit-fast-shots.py:48-49)
    sample the terminal measurement; trajectory noise is already in `values`.
    """
    rng = np.random.default_rng(seed)
    p0 = np.clip((1.0 + values) / 2.0, 0.0, 1.0)
    return 2.0 * rng.binomial(shots, p0) / shots - 1.0
