"""Block-size tuning probe for the blocked-plane resident kernel.

Times blocked_forward_batch at one (L, bt, cs) point — run it once per
config from a shell loop (the sizes are baked into the kernel body, so
every config is its own Mosaic compile, ~60-160 s first time per shape).
Parity vs the sigma engine is established in validate_blocked.py; here
outputs are only sanity-bounded, and the first config's output is written
to /tmp/blocked_tune_ref.npy so later configs cross-check against it
(bit-identical math, only the loop blocking changes).

Usage: DTC_TPU_BLOCKED_BT=32 DTC_TPU_BLOCKED_CS=4096 \
           python benchmarks/blocked_tune.py [L] [n_traj]
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
from dtc_tpu.ops.pallas_resident_blocked import blocked_forward_batch

L = int(_sys.argv[1]) if len(_sys.argv) > 1 else 22
n_traj = int(_sys.argv[2]) if len(_sys.argv) > 2 else 8
T, p = 50, 0.05
q = L // 2
bt = _os.environ.get("DTC_TPU_BLOCKED_BT", "16")
cs = _os.environ.get("DTC_TPU_BLOCKED_CS", "2048")
hs_np, phis_np = generate_disorder(L, 1, seed=7)
hs = jnp.asarray(hs_np[:, :L])
phis = jnp.asarray(phis_np[:, :L - 1])
sched = build_kick_schedule("x", 0.97, T)
keys = jax.random.split(jax.random.PRNGKey(3), n_traj)[None]

t0 = time.time()
out = np.asarray(blocked_forward_batch(hs, phis, sched.angles, keys,
                                       L=L, T=T, p=p, q=q))
warm = time.time() - t0
assert np.all(np.isfinite(out)) and np.max(np.abs(out)) <= 1.0 + 1e-3
ref_path = f"/tmp/blocked_tune_ref_L{L}.npy"
if _os.path.exists(ref_path):
    ref = np.load(ref_path)
    err = float(np.max(np.abs(out - ref)))
    assert err < 3e-4, f"blocking changed values: {err}"
else:
    np.save(ref_path, out)
    err = 0.0

reps = 5
t0 = time.time()
for _ in range(reps):
    out = np.asarray(blocked_forward_batch(hs, phis, sched.angles, keys,
                                           L=L, T=T, p=p, q=q))
dt = (time.time() - t0) / reps
print(f"L={L} bt={bt} cs={cs}: {n_traj * T / dt:7.0f} traj-cyc/s "
      f"({dt * 1e3:.0f} ms; warm {warm:.0f} s; vs-ref {err:.1e})")
