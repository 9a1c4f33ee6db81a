"""Blocked-plane vs full-plane resident kernel at 17 <= L <= 21 (TPU).

The blocked kernel was built to get past the full-plane body's register
spill at L=22, but its bounded-live-set fori_loop structure may schedule
better at the full-plane kernel's own sizes too — this probe measures
forward and echo throughput for both kernels at one L, with parity checks
(identical presampled trajectories, so values must match to the bf16x3
dot level ~2e-6..1e-4).

Timings are medians over repeated groups (single readings on this chip
swing ~40% under co-tenant contention; CLAUDE.md rule 8).

Usage: python benchmarks/blocked_lowL_probe.py [L] [n_traj] [--no-echo]
"""

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import time

import jax
import jax.numpy as jnp
import numpy as np

from dtc_tpu.io.disorder import generate_disorder
from dtc_tpu.models.drives import build_kick_schedule
from dtc_tpu.ops.pallas_resident import (resident_echo_batch,
                                         resident_forward_batch)
from dtc_tpu.ops.pallas_resident_blocked import (blocked_echo_batch,
                                                 blocked_forward_batch)

L = int(_sys.argv[1]) if len(_sys.argv) > 1 else 20
n_traj = int(_sys.argv[2]) if len(_sys.argv) > 2 else 32
T, p = 50, 0.05
q = L // 2
hs_np, phis_np = generate_disorder(L, 1, seed=7)
hs = jnp.asarray(hs_np[:, :L])
phis = jnp.asarray(phis_np[:, :L - 1])
sched = build_kick_schedule("x", 0.97, T)
keys = jax.random.split(jax.random.PRNGKey(3), n_traj)[None]


def timed(fn, *a, groups=3, reps=3, **kw):
    t0 = time.time()
    out = np.asarray(fn(*a, **kw))  # warm + materialize (validates)
    print(f"  [warm {time.time() - t0:.0f} s]", flush=True)
    assert np.all(np.isfinite(out)) and np.max(np.abs(out)) <= 1.0 + 1e-3
    dts = []
    for _ in range(groups):
        t0 = time.time()
        for _ in range(reps):
            out = np.asarray(fn(*a, **kw))
        dts.append((time.time() - t0) / reps)
    return out, float(np.median(dts))


print(f"L={L} T={T} p={p} n_traj={n_traj}", flush=True)

bk, dtb = timed(blocked_forward_batch, hs, phis, sched.angles, keys,
                L=L, T=T, p=p, q=q)
rs, dtr = timed(resident_forward_batch, hs, phis, sched.angles, keys,
                L=L, T=T, p=p, q=q)
print(f"fwd parity blocked-vs-resident max|err| = "
      f"{np.max(np.abs(bk - rs)):.2e}", flush=True)
print(f"fwd blocked : {n_traj * T / dtb:7.0f} traj-cyc/s ({dtb * 1e3:.0f} ms)")
print(f"fwd resident: {n_traj * T / dtr:7.0f} traj-cyc/s ({dtr * 1e3:.0f} ms)"
      f"   blocked/resident = {dtr / dtb:.2f}x", flush=True)

if "--no-echo" not in _sys.argv:
    ekeys = keys[:, : max(2, min(8, n_traj // 4))]
    ts_full = jnp.arange(1, T + 1)
    n_steps = ekeys.shape[1] * (T * (T + 1))  # sum of 2t active steps
    eb, dteb = timed(blocked_echo_batch, hs, phis, sched.angles, ekeys,
                     ts_full, L=L, T=T, p=p, q=q)
    er, dter = timed(resident_echo_batch, hs, phis, sched.angles, ekeys,
                     ts_full, L=L, T=T, p=p, q=q)
    print(f"echo parity blocked-vs-resident max|err| = "
          f"{np.max(np.abs(eb - er)):.2e}", flush=True)
    print(f"echo blocked : {n_steps / dteb:7.0f} active steps/s "
          f"({dteb * 1e3:.0f} ms)")
    print(f"echo resident: {n_steps / dter:7.0f} active steps/s "
          f"({dter * 1e3:.0f} ms)   blocked/resident = {dter / dteb:.2f}x",
          flush=True)
