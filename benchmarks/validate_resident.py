"""TPU validation + timing for the resident echo / general kernels vs sigma.

Run on the real TPU chip. Reports max |err| vs the sigma engine (identical
presampled trajectories; parity on a small (traj, ts) subset — the raw sigma
engine OOMs on large un-chunked echo grids) and resident-kernel timings on
the full grid.
"""

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import time

import jax
import jax.numpy as jnp
import numpy as np

from dtc_tpu.core.sigma_evolve import sigma_echo_batch, sigma_forward_batch
from dtc_tpu.io.disorder import generate_disorder
from dtc_tpu.models.drives import build_kick_schedule, n_kick_slots
from dtc_tpu.ops.pallas_resident import resident_echo_batch
from dtc_tpu.ops.pallas_resident_general import (
    general_echo_batch,
    general_forward_batch,
)

L, T, p = 20, 50, 0.05
q = L // 2
hs_np, phis_np = generate_disorder(L, 1, seed=7)
hs = jnp.asarray(hs_np[:, :L])
phis = jnp.asarray(phis_np[:, :L - 1])


def timed(fn, *a, reps=3, **kw):
    out = np.asarray(fn(*a, **kw))  # warm + materialize (validates)
    t0 = time.time()
    for _ in range(reps):
        out = np.asarray(fn(*a, **kw))
    dt = (time.time() - t0) / reps
    assert np.all(np.isfinite(out)) and np.max(np.abs(out)) <= 1.0 + 1e-3
    return out, dt


class R(dict):
    def __setitem__(self, k, v):
        super().__setitem__(k, v)
        if isinstance(v, tuple):
            print(f"{k}: {v[0]:.0f} steps/s  ({v[1] * 1e3:.0f} ms)", flush=True)
        else:
            print(f"{k}: {v:.2e}", flush=True)

results = R()

keys8 = jax.random.split(jax.random.PRNGKey(3), 8)[None]
keys3 = keys8[:, :3]
ts_full = jnp.arange(1, T + 1)
ts_sub = jnp.asarray([1, 5, 13, 27, 38, 50])
fkeys = jax.random.split(jax.random.PRNGKey(5), 32)[None]

# ---- x echo: resident vs sigma ----
sched = build_kick_schedule("x", 0.97, T)
r, dt = timed(resident_echo_batch, hs, phis, sched.angles, keys8, ts_full,
              L=L, T=T, p=p, q=q)
results["echo_x_resident"] = (8 * T * 2 * T / dt, dt)
rs, _ = timed(resident_echo_batch, hs, phis, sched.angles, keys3, ts_sub,
              L=L, T=T, p=p, q=q, reps=1)
s, _ = timed(sigma_echo_batch, hs, phis, sched.angles, keys3, ts_sub,
             L=L, T=T, K=1, p=p, q=q, initial_state="vacuum",
             dtype_name="complex64", ancilla_factor=1.0, has_y=False, reps=1)
results["echo_x_err"] = float(np.max(np.abs(rs - s)))

# ---- general forward y / xy ----
for pol in ("y", "xy"):
    K = n_kick_slots(pol)
    sch = build_kick_schedule(pol, 0.97, T)
    r, dt = timed(general_forward_batch, hs, phis, sch.angles, fkeys,
                  L=L, T=T, K=K, p=p, q=q)
    s, _ = timed(sigma_forward_batch, hs, phis, sch.angles, fkeys,
                 L=L, T=T, K=K, p=p, q=q, initial_state="vacuum",
                 dtype_name="complex64", ancilla_factor=1.0, has_y=True,
                 reps=1)
    results[f"fwd_{pol}_err"] = float(np.max(np.abs(r - s)))
    results[f"fwd_{pol}_general"] = (32 * T / dt, dt)

# ---- general echo y / xy ----
for pol in ("y", "xy"):
    K = n_kick_slots(pol)
    sch = build_kick_schedule(pol, 0.97, T)
    r, dt = timed(general_echo_batch, hs, phis, sch.angles, keys8, ts_full,
                  L=L, T=T, K=K, p=p, q=q)
    results[f"echo_{pol}_general"] = (8 * T * 2 * T * K / dt, dt)
    rs, _ = timed(general_echo_batch, hs, phis, sch.angles, keys3, ts_sub,
                  L=L, T=T, K=K, p=p, q=q, reps=1)
    s, _ = timed(sigma_echo_batch, hs, phis, sch.angles, keys3, ts_sub,
                 L=L, T=T, K=K, p=p, q=q, initial_state="vacuum",
                 dtype_name="complex64", ancilla_factor=1.0, has_y=True,
                 reps=1)
    results[f"echo_{pol}_err"] = float(np.max(np.abs(rs - s)))

