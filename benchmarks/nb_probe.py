"""Probe: trajectories-per-grid-step (nb) scaling of the forward kernel."""

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import os
import subprocess
import sys

if len(sys.argv) == 1:
    for nb in ("1", "2", "4", "8"):
        out = subprocess.run(
            [sys.executable, __file__, nb], capture_output=True, text=True,
            env={**os.environ, "DTC_TPU_RESIDENT_NB": nb,
                 "PYTHONPATH": os.environ.get("PYTHONPATH", "") + ":/root/repo"})
        print(out.stdout.strip() or out.stderr.strip()[-2000:], flush=True)
    sys.exit(0)

import time

import jax
import jax.numpy as jnp
import numpy as np

from dtc_tpu.io.disorder import generate_disorder
from dtc_tpu.models.drives import build_kick_schedule
from dtc_tpu.ops.pallas_resident import resident_forward_batch

L, T, p = 20, 50, 0.05
q = L // 2
hs_np, phis_np = generate_disorder(L, 1, seed=7)
hs = jnp.asarray(hs_np[:, :L])
phis = jnp.asarray(phis_np[:, :L - 1])
sched = build_kick_schedule("x", 0.97, T)
keys = jax.random.split(jax.random.PRNGKey(5), 32)[None]

out = np.asarray(resident_forward_batch(hs, phis, sched.angles, keys,
                                        L=L, T=T, p=p, q=q))
t0 = time.time()
for _ in range(5):
    out = np.asarray(resident_forward_batch(hs, phis, sched.angles, keys,
                                            L=L, T=T, p=p, q=q))
dt = (time.time() - t0) / 5
assert np.all(np.isfinite(out)) and np.max(np.abs(out)) <= 1.0 + 1e-3
print(f"nb={sys.argv[1]}: {32 * T / dt:.0f} cycles/s ({dt * 1e3:.0f} ms) "
      f"checksum {float(np.sum(out)):.6f}")
