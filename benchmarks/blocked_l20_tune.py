"""TPU: tune the blocked-plane kernel at the HEADLINE bench shape
(L=20, T=50, p=0.05, n_traj=32 — bench.py's exact workload).

Two axes, each a trace-time static (env var), so every config runs in a
fresh subprocess:

- (bt, cs) pass-1 block height / pass-2 chunk width. The defaults (16,
  2048) were tuned at L=22/23 where the state fills VMEM; at L=20 the
  state is 8 MB, so bigger blocks (fewer fori_loop trips, larger dots)
  may win — up to bt=TOP=64 / cs=8192 which degenerates toward the
  full-plane body (measured SLOWER at L=22, unknown at L=20).
- nb interleaved trajectories per grid step (DTC_TPU_BLOCKED_NB): the
  kernel is not MXU-FLOP-bound, so trajectory b+1's dots can fill
  trajectory b's VPU phases. Kick matrices are shared; only SMEM noise
  rows are per-trajectory.

Winner feeds bench.py / the engine default; results recorded under
"blocked_l20_tune" in parity_results.json and the values cross-checked
against the default-config run (identical keys -> identical outputs up to
dot-order; checked to 1e-3 which is far under sampling noise).

Usage: python benchmarks/blocked_l20_tune.py [quick|full]
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
from dtc_tpu.experiments.engine import _forward_batch
from dtc_tpu.io.disorder import generate_disorder
from dtc_tpu.models.drives import build_kick_schedule

L, T, P, NTRAJ = 20, 50, 0.05, 32
hs, phis = generate_disorder(L, 1, seed=0)
sched = build_kick_schedule("x", 0.97, T)
hs_j = jnp.asarray(hs[:, :L]); phis_j = jnp.asarray(phis[:, :L - 1])
af = (1 - P) ** 6
kw = dict(L=L, T=T, K=1, p=P, q=L // 2, initial_state="vacuum",
          dtype_name="complex64", ancilla_factor=af)

def run(seed):
    keys = jax.random.split(jax.random.PRNGKey(seed), NTRAJ)[None]
    return np.asarray(_forward_batch(hs_j, phis_j, sched.angles, keys, **kw))

t0 = time.time()
a = run(0)
compile_s = time.time() - t0
assert np.isfinite(a).all() and abs(a[0, :, 0].mean() - af) < 1e-3
group_dts = []
for gi in range(5):
    t0 = time.perf_counter()
    for i in range(3):
        a = run(gi * 3 + i + 1)
    group_dts.append((time.perf_counter() - t0) / 3)
dt = float(np.median(group_dts))
rec = {"cycles_s": round(T * NTRAJ / dt, 1), "compile_s": round(compile_s, 1),
       "check": float(a[0, :, 0].mean())}

if os.environ.get("DTC_TPU_TUNE_ECHO") == "1":
    from dtc_tpu.experiments.engine import _echo_batch
    ts = jnp.arange(1, T + 1, 2)
    ekw = dict(kw)

    def erun(seed):
        keys = jax.random.split(jax.random.PRNGKey(seed), 8)[None]
        return np.asarray(_echo_batch(hs_j, phis_j, sched.angles, keys, ts,
                                      **ekw))

    t0 = time.time()
    e = erun(0)
    rec["echo_compile_s"] = round(time.time() - t0, 1)
    assert np.isfinite(e).all()
    edts = []
    for gi in range(3):
        t0 = time.perf_counter()
        e = erun(gi + 1)
        edts.append(time.perf_counter() - t0)
    steps = 8 * int(2 * np.sum(np.asarray(ts)))
    rec["echo_steps_s"] = round(steps / float(np.median(edts)), 1)

print("RESULT " + json.dumps(rec))
"""

ROOT = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
MODE = _sys.argv[1] if len(_sys.argv) > 1 else "full"
CONFIGS = [  # (bt, cs, nb)
    (16, 2048, 1),   # current default — the baseline reading
    (32, 2048, 1),
    (16, 4096, 1),
    (32, 4096, 1),
    (64, 8192, 1),   # whole-plane degenerate case
    (16, 2048, 2),
    (16, 2048, 4),
]
if MODE == "quick":
    CONFIGS = [(16, 2048, 1), (16, 2048, 2)]
elif MODE == "combo":
    # compose the per-axis winners of the full sweep
    CONFIGS = [(32, 2048, 2), (32, 4096, 2), (32, 2048, 4)]
elif MODE == "round2":
    # the corner the full sweep left untested: whole-TOP pass-1 blocks
    # (bt=64 ran only with the degenerate cs=8192) and narrower chunks
    CONFIGS = [(64, 2048, 1), (64, 4096, 1), (32, 1024, 1)]
elif MODE == "pack":
    # pass-2 block-diagonal packing (p2_pack_factor, default ON): re-run
    # the default + bt32 configs with the packed kernel; compare against
    # blocked_l20_tune's unpacked readings
    CONFIGS = [(16, 2048, 1), (32, 2048, 1)]
elif MODE == "cmul":
    # Karatsuba (3 dots + full-plane input add) vs schoolbook (4 dots, no
    # input add) complex multiplies at the bench shape — the kernel is
    # not MXU-FLOP-bound, so the extra bf16 passes may hide under the
    # freed VPU work (DTC_TPU_BLOCKED_CMUL, forward kernel only)
    CONFIGS = [(32, 2048, 1), (32, 2048, 1, {"DTC_TPU_BLOCKED_CMUL":
                                             "schoolbook"})]

results = {}
best = (None, -1.0)
for cfg_t in CONFIGS:
    bt, cs, nb = cfg_t[:3]
    extra = cfg_t[3] if len(cfg_t) > 3 else {}
    env = dict(_os.environ, DTC_TPU_BLOCKED_BT=str(bt),
               DTC_TPU_BLOCKED_CS=str(cs), DTC_TPU_BLOCKED_NB=str(nb),
               **extra)
    if (bt, cs) == (16, 2048) and nb in (1, 2):
        env["DTC_TPU_TUNE_ECHO"] = "1"  # echo decision pair only
    tag = f"bt{bt}_cs{cs}_nb{nb}" + "".join(
        f"_{v}" for v in extra.values())
    print(f"--- {tag}", flush=True)
    r = subprocess.run([_sys.executable, "-c", CHILD % {"root": ROOT}],
                       env=env, capture_output=True, text=True, timeout=2400)
    line = [ln for ln in r.stdout.splitlines() if ln.startswith("RESULT ")]
    if not line:
        print(f"  FAILED rc={r.returncode}\n{r.stdout[-500:]}\n"
              f"{r.stderr[-800:]}", flush=True)
        results[tag] = {"failed": True}
        continue
    rec = json.loads(line[0][7:])
    results[tag] = rec
    print(f"  {rec['cycles_s']:>8.1f} cycles/s  "
          f"(compile {rec['compile_s']:.0f} s)", flush=True)
    if rec["cycles_s"] > best[1]:
        best = (tag, rec["cycles_s"])

print(f"best: {best[0]} at {best[1]:.1f} cycles/s")
path = _os.path.join(_os.path.dirname(_os.path.abspath(__file__)),
                     "parity_results.json")
blob = json.load(open(path)) if _os.path.exists(path) else {}
key = {"combo": "blocked_l20_tune_combo",
       "round2": "blocked_l20_tune_round2",
       "pack": "blocked_l20_tune_pack",
       "cmul": "blocked_l20_tune_cmul"}.get(MODE, "blocked_l20_tune")
blob[key] = {"shape": "L20_T50_p0.05_ntraj32",
             "configs": results, "best": best[0],
             "best_cycles_s": best[1]}
text = json.dumps(blob, indent=1)  # serialize FIRST: a failed
# encode must not truncate previously recorded anchors
with open(path, "w") as _f:
    _f.write(text)
print(f"recorded -> {path} {key}")
