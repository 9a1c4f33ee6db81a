"""TPU A/B: pass-2 block-diagonal packing (p2_pack_factor) at L = 18/19.

At TOP < 128 the blocked kernels' pass-2 top-kick dot fills only a
(TOP/128)^2 corner of the MXU; packing P = 128/TOP (half, chunk) tiles
into one block-diagonal dot restores full fill. Measured NEGATIVE at
L=20 (P=2: concat/split overhead beats the fill win —
parity_results.json blocked_l20_tune_pack); this probe measures the
small-TOP regime the gate enables (L=19 P=4, L=18 P=8), forward + echo,
with value parity between the modes (same presampled keys; packed vs
unpacked may differ only at f32 dot-order level ~1e-5).

Each (L, mode) runs in a fresh subprocess: the pack gate is read from
the env at trace time. Records parity_results.json "blocked_p2pack".

Usage: python benchmarks/p2pack_probe.py [L ...]   (default: 19 18)
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
from dtc_tpu.ops.pallas_resident_blocked import (blocked_echo_batch,
                                                 blocked_forward_batch)
from dtc_tpu.io.disorder import generate_disorder
from dtc_tpu.models.drives import build_kick_schedule

L, T, P = %(L)d, 50, 0.05
NTRAJ = {17: 128, 18: 96, 19: 64}.get(L, 32)
hs, phis = generate_disorder(L, 1, seed=7)
sched = build_kick_schedule("x", 0.97, T)
hs_j = jnp.asarray(hs[:, :L]); phis_j = jnp.asarray(phis[:, :L - 1])
keys = jax.random.split(jax.random.PRNGKey(3), NTRAJ)[None]
kw = dict(L=L, T=T, p=P, q=L // 2)

t0 = time.time()
a = np.asarray(blocked_forward_batch(hs_j, phis_j, sched.angles, keys, **kw))
compile_s = time.time() - t0
assert np.isfinite(a).all() and np.max(np.abs(a)) <= 1.0 + 1e-3
dts = []
for gi in range(5):
    t0 = time.perf_counter()
    for i in range(3):
        a = np.asarray(blocked_forward_batch(
            hs_j, phis_j, sched.angles, keys, **kw))
    dts.append((time.perf_counter() - t0) / 3)
rec = {"fwd_cycles_s": round(T * NTRAJ / float(np.median(dts)), 1),
       "fwd_compile_s": round(compile_s, 1),
       "fwd_digest": [float(a[0, 0, t]) for t in (0, 1, T - 1)]}

ts = jnp.arange(1, T + 1, 2)
ekeys = keys[:, : NTRAJ // 4]
t0 = time.time()
e = np.asarray(blocked_echo_batch(hs_j, phis_j, sched.angles, ekeys, ts,
                                  **kw))
rec["echo_compile_s"] = round(time.time() - t0, 1)
assert np.isfinite(e).all()
edts = []
for gi in range(3):
    t0 = time.perf_counter()
    e = np.asarray(blocked_echo_batch(hs_j, phis_j, sched.angles, ekeys, ts,
                                      **kw))
    edts.append(time.perf_counter() - t0)
steps = (NTRAJ // 4) * int(2 * np.sum(np.asarray(ts)))
rec["echo_steps_s"] = round(steps / float(np.median(edts)), 1)
rec["echo_digest"] = [float(e[0, 0, i]) for i in (0, len(np.asarray(ts)) - 1)]
print("RESULT " + json.dumps(rec))
"""

ROOT = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
LS = [int(a) for a in _sys.argv[1:]] or [19, 18]

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
        print(f"  fwd {rec['fwd_cycles_s']:>8.1f} traj-cyc/s   "
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
        print(f"L={L}: fwd {b['fwd_cycles_s'] / a['fwd_cycles_s']:.2f}x  "
              f"echo {b['echo_steps_s'] / a['echo_steps_s']:.2f}x  "
              f"digest dev {dev:.2e}", flush=True)

path = _os.path.join(_os.path.dirname(_os.path.abspath(__file__)),
                     "parity_results.json")
blob = json.load(open(path)) if _os.path.exists(path) else {}
blob.setdefault("blocked_p2pack", {}).update(results)
text = json.dumps(blob, indent=1)  # serialize FIRST: a failed
# encode must not truncate previously recorded anchors
with open(path, "w") as _f:
    _f.write(text)
print(f"recorded -> {path} blocked_p2pack")
