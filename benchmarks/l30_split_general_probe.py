"""TPU: single-chip L=30 through the SPLIT per-plane per-shard general
kernels — hardware validation of the round-5 split-plane port
(ops/pallas_cycle_hi_general at L_loc=30, the 2^32 DMA-offset wrap
territory where round 3's fused-state record was a false positive).

Cross-KERNEL check: the (1,1)-mesh sharded GENERAL builder driven with a
constant x schedule draws the same per-trajectory uniforms as the
(hardware-anchored) streamed-hi forward kernel, so two completely
different kernels — split-plane r2-blocked per-cycle scan vs split-plane
whole-trajectory streamed — must agree trajectory-for-trajectory at the
bf16x3 dot level on an 8 GiB state. A y-drive leg then records the NEW
capability: general-polarization L=30 on one chip (previously no path —
the general kernels bounded at L_loc=29).

Records parity_results.json "split_general_l30".
Usage: python benchmarks/l30_split_general_probe.py [T] [p]
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
from dtc_tpu.ops.pallas_streamed_hi import streamed_hi_forward_batch
from dtc_tpu.parallel.mesh import make_mesh
from dtc_tpu.parallel.sharded import make_sharded_autocorr_forward_general

L = 30
T = int(_sys.argv[1]) if len(_sys.argv) > 1 else 4
P = float(_sys.argv[2]) if len(_sys.argv) > 2 else 0.05
q = 11
hs_np, phis_np = generate_disorder(L, 1, seed=7)
hs = jnp.asarray(hs_np[0])
phis = jnp.asarray(phis_np[0])
key = jax.random.PRNGKey(3)
keys = key[None]  # (1, 2)
rec = {"T": T, "p": P, "q": q}

print(f"L=30 T={T} p={P}: streamed-hi reference (split planes, "
      f"hardware-anchored kernel)...", flush=True)
sched_x = build_kick_schedule("x", 0.97, T)
t0 = time.time()
# ancilla_factor explicitly matched to the sharded builder's (1-p)^6
# default (first run compared a bare-factor leg: ratio exactly 0.7351)
a_ref = np.asarray(streamed_hi_forward_batch(
    hs[None], phis[None], sched_x.angles, keys[None], L=L, T=T, p=P,
    q=q, ancilla_factor=(1.0 - P) ** 6))[0].mean(axis=0)
print(f"  compile+run {time.time() - t0:.0f} s  A={a_ref.round(5)}",
      flush=True)
assert np.all(np.isfinite(a_ref)) and np.max(np.abs(a_ref)) <= 1 + 1e-3

print("per-shard split general kernel, x schedule (cross-kernel "
      "trajectory check)...", flush=True)
mesh = make_mesh(n_amp=1, n_traj=1)
f_g = make_sharded_autocorr_forward_general(
    mesh, L=L, T=T, K=1, p=P, q=q)
t0 = time.time()
a_g = np.asarray(f_g(sched_x.angles, hs, phis, keys))
print(f"  compile+run {time.time() - t0:.0f} s  A={a_g.round(5)}",
      flush=True)
dev = float(np.max(np.abs(a_g - a_ref)))
print(f"  cross-kernel parity: {dev:.2e}", flush=True)
rec.update(x_A=[round(float(v), 6) for v in a_g],
           x_cross_kernel_max_dev=dev)
assert dev < 5e-4, dev

# timing groups on the same jit (rate of the new path)
dts = []
for _ in range(3):
    t0 = time.time()
    a_g = np.asarray(f_g(sched_x.angles, hs, phis, keys))
    dts.append(time.time() - t0)
rate = T / float(np.median(dts))
print(f"  split general x rate: {rate:.2f} traj-cyc/s", flush=True)
rec["x_traj_cyc_s"] = round(rate, 2)

print("y drive at L=30 (new capability — previously no single-chip "
      "path; same jit, angles are runtime inputs)...", flush=True)
sched_y = build_kick_schedule("y", 0.97, T)
t0 = time.time()
a_y = np.asarray(f_g(sched_y.angles, hs, phis, keys))
dt0 = time.time() - t0
print(f"  run {dt0:.0f} s  A={a_y.round(5)}", flush=True)
assert np.all(np.isfinite(a_y)) and np.max(np.abs(a_y)) <= 1 + 1e-3
rec.update(y_A=[round(float(v), 6) for v in a_y],
           y_traj_cyc_s=round(T / dt0, 2))

path = _os.path.join(_os.path.dirname(_os.path.abspath(__file__)),
                     "parity_results.json")
blob = json.load(open(path)) if _os.path.exists(path) else {}
blob["split_general_l30"] = rec
text = json.dumps(blob, indent=1)  # serialize FIRST: a failed encode
# must not truncate previously recorded anchors
with open(path, "w") as _f:
    _f.write(text)
print(f"recorded -> {path} split_general_l30", flush=True)
