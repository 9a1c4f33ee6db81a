"""TPU validation + timing: HBM-streamed echo kernel vs the sigma engine.

Identical presampled trajectories (both sample float32 uniforms from the
same keys), small (traj, ts) parity subset — the raw sigma engine is slow
at L >= 22 — then a full-grid timing sweep.

Usage: python benchmarks/validate_streamed_echo.py [L] [T]
"""

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import time

import jax
import jax.numpy as jnp
import numpy as np

from dtc_tpu.core.sigma_evolve import sigma_echo_batch
from dtc_tpu.io.disorder import generate_disorder
from dtc_tpu.models.drives import build_kick_schedule
from dtc_tpu.ops.pallas_streamed import streamed_echo_batch

L = int(_sys.argv[1]) if len(_sys.argv) > 1 else 22
T = int(_sys.argv[2]) if len(_sys.argv) > 2 else 50
P = 0.05
q = L // 2 if L // 2 < 14 else 11

hs_np, phis_np = generate_disorder(L, 1, seed=7)
hs = jnp.asarray(hs_np[:, :L])
phis = jnp.asarray(phis_np[:, : L - 1])
sched = build_kick_schedule("x", 0.97, T)

keys2 = jax.random.split(jax.random.PRNGKey(3), 2)[None]
ts_sub = jnp.asarray([0, 1, 3, T // 2, T])

print(f"L={L} T={T} q={q}: compiling + running streamed echo "
      f"(parity subset)...", flush=True)
t0 = time.time()
r = np.asarray(streamed_echo_batch(hs, phis, sched.angles, keys2, ts_sub,
                                   L=L, T=T, p=P, q=q))
print(f"  first call (incl. compile): {time.time() - t0:.0f}s", flush=True)
assert np.all(np.isfinite(r)) and np.max(np.abs(r)) <= 1 + 1e-3, r

s = np.asarray(sigma_echo_batch(
    hs, phis, sched.angles, keys2, ts_sub, L=L, T=T, K=1, p=P, q=q,
    initial_state="vacuum", dtype_name="complex64", ancilla_factor=1.0,
    has_y=False))
err = float(np.max(np.abs(r - s)))
print(f"  parity vs sigma engine: max|err| = {err:.2e}", flush=True)
print(f"  streamed: {r[0, 0].round(5)}", flush=True)
print(f"  sigma   : {s[0, 0].round(5)}", flush=True)
assert err < 5e-4, err

# timing: full echo sweep t = 1..T, 4 trajectories
keys4 = jax.random.split(jax.random.PRNGKey(5), 4)[None]
ts_full = jnp.arange(1, T + 1)
out = np.asarray(streamed_echo_batch(hs, phis, sched.angles, keys4, ts_full,
                                     L=L, T=T, p=P, q=q))
t0 = time.time()
out = np.asarray(streamed_echo_batch(hs, phis, sched.angles, keys4, ts_full,
                                     L=L, T=T, p=P, q=q))
dt = time.time() - t0
assert np.all(np.isfinite(out)) and np.max(np.abs(out)) <= 1 + 1e-3
active = 4 * 2 * sum(range(1, T + 1))
print(f"  sweep t=1..{T}, 4 traj: {dt:.1f}s = {active / dt:.0f} "
      f"active cycle-steps/s ({active} steps)", flush=True)
