"""TPU: streamed forward kernel at L=27 (1 GB state) — validation + timing.

The L<=26 bound was the validated envelope, not a structural limit: at
L=27 the pass-B slab geometry reaches CS=128 / R2=64 (one column of
128-lane tiles per slab, 128 slabs). This probe validates against the
sigma engine on identical presampled trajectories and times both.
"""

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import time

import jax
import jax.numpy as jnp
import numpy as np

from dtc_tpu.core.sigma_evolve import sigma_forward_batch
from dtc_tpu.io.disorder import generate_disorder
from dtc_tpu.models.drives import build_kick_schedule
from dtc_tpu.ops.pallas_streamed import streamed_forward_batch

L, T, P = 27, 10, 0.05
q = 11
hs_np, phis_np = generate_disorder(L, 1, seed=7)
hs = jnp.asarray(hs_np[:, :L])
phis = jnp.asarray(phis_np[:, : L - 1])
sched = build_kick_schedule("x", 0.97, T)
keys = jax.random.split(jax.random.PRNGKey(3), 2)[None]

print(f"L={L}: compiling + running streamed forward...", flush=True)
t0 = time.time()
r = np.asarray(streamed_forward_batch(hs, phis, sched.angles, keys,
                                      L=L, T=T, p=P, q=q))
print(f"  first call: {time.time() - t0:.0f}s", flush=True)
assert np.all(np.isfinite(r)) and np.max(np.abs(r)) <= 1 + 1e-3

t0 = time.time()
r = np.asarray(streamed_forward_batch(hs, phis, sched.angles, keys,
                                      L=L, T=T, p=P, q=q))
dt_k = time.time() - t0
print(f"  streamed: {2 * T / dt_k:.0f} traj-cyc/s ({dt_k:.2f}s)", flush=True)

t0 = time.time()
s = np.asarray(sigma_forward_batch(
    hs, phis, sched.angles, keys, L=L, T=T, K=1, p=P, q=q,
    initial_state="vacuum", dtype_name="complex64", ancilla_factor=1.0,
    has_y=False))
dt_s = time.time() - t0
err = float(np.max(np.abs(r - s)))
print(f"  sigma   : {2 * T / dt_s:.0f} traj-cyc/s ({dt_s:.2f}s, incl "
      f"compile)", flush=True)
print(f"  parity: max|err| = {err:.2e}", flush=True)
print(f"  values: streamed {r[0, 0, :4].round(5)} sigma {s[0, 0, :4].round(5)}",
      flush=True)
assert err < 5e-4, err
