"""TPU: L=30 ECHO through the SPLIT per-plane per-shard kernels — the
inverse-kernel half of the round-5 split-plane port on real hardware
(the forward half is anchored by l30_split_general_probe.py at 9.6e-6
cross-kernel parity).

Validation at a size with no reference engine: the zero-rate invariant —
p=0 makes the masked 2T switch apply U^dag U = I exactly, so A0(t) must
return 1 through t forward + t inverse split-plane kernel applications
over the 8 GiB state (the L=29 streamed-hi analogue measured 1.3e-4).
A noisy leg records the echo rate.

Records parity_results.json "split_echo_l30".
Usage: python benchmarks/l30_split_echo_probe.py [T] [p]
"""

import json
import os as _os
import sys as _sys
import time

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from dtc_tpu.io.disorder import generate_disorder
from dtc_tpu.models.drives import build_kick_schedule
from dtc_tpu.parallel.mesh import make_mesh
from dtc_tpu.parallel.sharded import make_sharded_echo_kernel

L = 30
T = int(_sys.argv[1]) if len(_sys.argv) > 1 else 3
P = float(_sys.argv[2]) if len(_sys.argv) > 2 else 0.05
q = 11
hs_np, phis_np = generate_disorder(L, 1, seed=7)
hs = jnp.asarray(hs_np[0])
phis = jnp.asarray(phis_np[0])
keys = jax.random.PRNGKey(3)[None]
sched = build_kick_schedule("x", 0.97, T)
mesh = make_mesh(n_amp=1, n_traj=1)
rec = {"T": T, "p": P, "q": q}

print(f"L=30 echo, zero-rate invariant (t={T}: {T} forward + {T} inverse "
      f"split-plane kernel cycles must compose to identity)...", flush=True)
e0 = make_sharded_echo_kernel(mesh, L=L, T=T, p=0.0, q=q)
t0 = time.time()
v0 = float(e0(sched.angles, hs, phis, keys, jnp.asarray(T)))
print(f"  compile+run {time.time() - t0:.0f} s  A0({T}) = {v0:.6f}",
      flush=True)
rec["zero_rate_a0"] = v0
assert abs(v0 - 1.0) < 1e-3, v0

print(f"noisy echo at p={P}...", flush=True)
en = make_sharded_echo_kernel(mesh, L=L, T=T, p=P, q=q)
t0 = time.time()
vn = float(en(sched.angles, hs, phis, keys, jnp.asarray(T)))
dt0 = time.time() - t0
assert np.isfinite(vn) and abs(vn) <= 1 + 1e-3, vn
dts = []
for _ in range(2):
    t0 = time.time()
    vn = float(en(sched.angles, hs, phis, keys, jnp.asarray(T)))
    dts.append(time.time() - t0)
rate = 2 * T / float(np.median(dts))
print(f"  A0({T}) = {vn:.6f}  {rate:.2f} echo steps/s", flush=True)
rec.update(noisy_a0=vn, echo_steps_s=round(rate, 2))

path = _os.path.join(_os.path.dirname(_os.path.abspath(__file__)),
                     "parity_results.json")
blob = json.load(open(path)) if _os.path.exists(path) else {}
blob["split_echo_l30"] = rec
text = json.dumps(blob, indent=1)  # serialize FIRST: a failed encode
# must not truncate previously recorded anchors
with open(path, "w") as _f:
    _f.write(text)
print(f"recorded -> {path} split_echo_l30", flush=True)
