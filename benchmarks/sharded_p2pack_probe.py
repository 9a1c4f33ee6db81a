"""TPU A/B: pass-2 block-diagonal packing on the PER-SHARD cycle kernels.

Sibling of p2pack_probe.py for ops/pallas_cycle: the same p2_pack_factor
packing wired through the per-shard forward/inverse kernels (interpret
parity pinned in tests/test_sharded_kernel.py at L_loc=17) has no TPU
measurement of its own — this records forward + masked-2T echo rates on a
degenerate (1,1) mesh at L = 18 (P = 8) with value parity between the
modes. On multi-chip this L_loc regime serves L = 18 + log2(n_amp)
(e.g. L = 21 on 8 chips), so the packed small-TOP win carries to the
sharded engine's VMEM-class shards.

Each mode runs in a fresh subprocess (the pack gate is read from the env
at trace time). Records parity_results.json "sharded_p2pack".

Usage: python benchmarks/sharded_p2pack_probe.py [L ...]   (default: 18)
"""

import json
import os as _os
import subprocess
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

CHILD = r"""
import json, os, sys, time
import jax, jax.numpy as jnp, numpy as np
sys.path.insert(0, %(root)r)
from dtc_tpu.io.disorder import generate_disorder
from dtc_tpu.models.drives import build_kick_schedule
from dtc_tpu.parallel.mesh import make_mesh
from dtc_tpu.parallel.sharded import (
    make_sharded_autocorr_forward_kernel,
    make_sharded_echo_kernel,
)

L, T, P = %(L)d, 50, 0.05
NTRAJ = {17: 64, 18: 48, 19: 32}.get(L, 16)
hs, phis = generate_disorder(L, 1, seed=7)
sched = build_kick_schedule("x", 0.97, T)
hs_j = jnp.asarray(hs[0, :L]); phis_j = jnp.asarray(phis[0, :L - 1])
keys = jax.random.split(jax.random.PRNGKey(3), NTRAJ)
mesh = make_mesh(n_amp=1, n_traj=1, devices=jax.devices()[:1])

t0 = time.time()
f_k = make_sharded_autocorr_forward_kernel(mesh, L=L, T=T, p=P, q=L // 2)
a = np.asarray(f_k(sched.angles, hs_j, phis_j, keys))
compile_s = time.time() - t0
assert np.isfinite(a).all() and np.max(np.abs(a)) <= 1.0 + 1e-3
dts = []
for gi in range(5):
    t0 = time.perf_counter()
    for i in range(3):
        a = np.asarray(f_k(sched.angles, hs_j, phis_j, keys))
    dts.append((time.perf_counter() - t0) / 3)
rec = {"fwd_traj_cyc_s": round(T * NTRAJ / float(np.median(dts)), 1),
       "fwd_compile_s": round(compile_s, 1),
       "fwd_digest": [float(a[t]) for t in (0, 1, T - 1)]}

t_full = jnp.asarray(T)
t0 = time.time()
e_k = make_sharded_echo_kernel(mesh, L=L, T=T, p=P, q=L // 2)
v = float(np.asarray(e_k(sched.angles, hs_j, phis_j, keys, t_full)))
rec["echo_compile_s"] = round(time.time() - t0, 1)
assert np.isfinite(v) and abs(v) <= 1.0 + 1e-3, v
edts = []
for gi in range(5):
    t0 = time.perf_counter()
    for i in range(3):
        v = float(np.asarray(e_k(sched.angles, hs_j, phis_j, keys, t_full)))
    edts.append((time.perf_counter() - t0) / 3)
rec["echo_steps_s"] = round(2 * T * NTRAJ / float(np.median(edts)), 1)
rec["echo_digest"] = [v]
print("RESULT " + json.dumps(rec))
"""

ROOT = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
LS = [int(a) for a in _sys.argv[1:]] or [18]

results = {}
for L in LS:
    for mode in ("0", "1"):
        env = dict(_os.environ, DTC_TPU_BLOCKED_P2PACK=mode)
        tag = f"L{L}_pack{mode}"
        print(f"--- {tag}", flush=True)
        r = subprocess.run([_sys.executable, "-c",
                            CHILD % {"root": ROOT, "L": L}],
                           env=env, capture_output=True, text=True,
                           timeout=2400)
        line = [ln for ln in r.stdout.splitlines() if ln.startswith("RESULT ")]
        if not line:
            print(f"  FAILED rc={r.returncode}\n{r.stdout[-500:]}\n"
                  f"{r.stderr[-800:]}", flush=True)
            results[tag] = {"failed": True}
            continue
        rec = json.loads(line[0][7:])
        results[tag] = rec
        print(f"  fwd {rec['fwd_traj_cyc_s']:>8.1f} traj-cyc/s   "
              f"echo {rec['echo_steps_s']:>8.1f} steps/s   "
              f"(compile {rec['fwd_compile_s']:.0f}/"
              f"{rec['echo_compile_s']:.0f} s)", flush=True)

for L in LS:
    a, b = results.get(f"L{L}_pack0"), results.get(f"L{L}_pack1")
    if a and b and "failed" not in a and "failed" not in b:
        dev = max(abs(x - y) for x, y in
                  zip(a["fwd_digest"] + a["echo_digest"],
                      b["fwd_digest"] + b["echo_digest"]))
        results[f"L{L}_parity"] = {"digest_max_dev": dev}
        print(f"L={L}: fwd {b['fwd_traj_cyc_s'] / a['fwd_traj_cyc_s']:.2f}x  "
              f"echo {b['echo_steps_s'] / a['echo_steps_s']:.2f}x  "
              f"digest dev {dev:.2e}", flush=True)

path = _os.path.join(_os.path.dirname(_os.path.abspath(__file__)),
                     "parity_results.json")
blob = json.load(open(path)) if _os.path.exists(path) else {}
blob.setdefault("sharded_p2pack", {}).update(results)
text = json.dumps(blob, indent=1)  # serialize FIRST: a failed
# encode must not truncate previously recorded anchors
with open(path, "w") as _f:
    _f.write(text)
print(f"recorded -> {path} sharded_p2pack")
