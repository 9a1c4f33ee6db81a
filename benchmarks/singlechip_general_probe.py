"""TPU: single-chip GENERAL-drive dispatch at L=24 (y polarization).

Round-4 capability: engine.forward_sweep/echo_sweep route non-x drives at
24 <= L <= 29 through the (1,1)-mesh degenerate sharded general
cycle-kernel scan (engine._singlechip_general_hi_ok) instead of the XLA
sigma engine. This probe measures both paths on the SAME workload with
the SAME key (identical uniform draws -> trajectory-exact parity at the
bf16x3 dot level) and records parity_results.json
"singlechip_general_l24".

Usage: python benchmarks/singlechip_general_probe.py [L] [pol] [n_traj] [T]
"""

import json
import os as _os
import sys as _sys
import time

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import jax
import numpy as np

from dtc_tpu.experiments.engine import build_context, echo_sweep, forward_sweep
from dtc_tpu.io.disorder import generate_disorder
from dtc_tpu.utils.config import SimConfig

L = int(_sys.argv[1]) if len(_sys.argv) > 1 else 24
POL = _sys.argv[2] if len(_sys.argv) > 2 else "y"
NTRAJ = int(_sys.argv[3]) if len(_sys.argv) > 3 else 8
T = int(_sys.argv[4]) if len(_sys.argv) > 4 else 20

cfg = SimConfig(L=L, tf=T, g=0.97, polarization=POL, n_trajectories=NTRAJ,
                noise_prob=0.05)
hs, phis = generate_disorder(L, 1, seed=7)
sched, params, noise = build_context(cfg, hs, phis)
key = jax.random.PRNGKey(3)
rec = {"L": L, "pol": POL, "n_traj": NTRAJ, "T": T}


def timed(fn, groups=3):
    t0 = time.time()
    out = fn()
    print(f"  [warm {time.time() - t0:.0f} s]", flush=True)
    dts = []
    for _ in range(groups):
        t0 = time.time()
        out = fn()
        dts.append(time.time() - t0)
    return out, float(np.median(dts))


print(f"L={L} pol={POL} T={T} n_traj={NTRAJ}: kernel route (auto)...",
      flush=True)
a_k, dt_k = timed(lambda: forward_sweep(cfg, sched, params, noise, key))
rate_k = T * NTRAJ / dt_k
print(f"  kernel: {rate_k:8.1f} traj-cyc/s", flush=True)

_os.environ["DTC_TPU_ENGINE"] = "sigma"
print("  sigma route...", flush=True)
a_s, dt_s = timed(lambda: forward_sweep(cfg, sched, params, noise, key))
del _os.environ["DTC_TPU_ENGINE"]
rate_s = T * NTRAJ / dt_s
dev = float(np.max(np.abs(a_k - a_s)))
print(f"  sigma:  {rate_s:8.1f} traj-cyc/s   speedup {dt_s / dt_k:.2f}x   "
      f"parity {dev:.2e}", flush=True)
assert dev < 5e-4, dev
rec.update(fwd_traj_cyc_s=round(rate_k, 1), fwd_sigma_traj_cyc_s=round(rate_s, 1),
           fwd_speedup=round(dt_s / dt_k, 2), fwd_max_dev=dev)

# echo: subset of t values through the real echo_sweep dispatch both ways.
# n_trajectories=1 so both routes run ONE key chunk: trajectory keys are
# salted per chunk (engine._inst_keys(salt=done)), and at L=24 the sigma
# echo sweep chunks to 1 trajectory while the kernel route takes 32 per
# chunk — with n_traj > 1 the two engines then draw DIFFERENT (equally
# valid) trajectory ensembles and the comparison is sampling noise
# (~4e-3 measured), not engine parity. Matched chunking is trajectory-
# exact: per-t deviation measured 3.3e-5 here (bf16x3 level).
ecfg = SimConfig(L=L, tf=6, g=0.97, polarization=POL,
                 n_trajectories=1, noise_prob=0.05)
esched, eparams, enoise = build_context(ecfg, hs, phis)
print("  echo kernel route...", flush=True)
e_k, edt_k = timed(lambda: echo_sweep(ecfg, esched, eparams, enoise, key),
                   groups=2)
steps = ecfg.n_trajectories * sum(2 * t for t in range(ecfg.tf))
print(f"  echo kernel: {steps / edt_k:8.1f} steps/s", flush=True)
_os.environ["DTC_TPU_ENGINE"] = "sigma"
e_s, edt_s = timed(lambda: echo_sweep(ecfg, esched, eparams, enoise, key),
                   groups=2)
del _os.environ["DTC_TPU_ENGINE"]
edev = float(np.max(np.abs(e_k - e_s)))
print(f"  echo sigma:  {steps / edt_s:8.1f} steps/s   "
      f"speedup {edt_s / edt_k:.2f}x   parity {edev:.2e}", flush=True)
assert edev < 5e-4, edev
rec.update(echo_steps_s=round(steps / edt_k, 1),
           echo_sigma_steps_s=round(steps / edt_s, 1),
           echo_speedup=round(edt_s / edt_k, 2), echo_max_dev=edev)

path = _os.path.join(_os.path.dirname(_os.path.abspath(__file__)),
                     "parity_results.json")
blob = json.load(open(path)) if _os.path.exists(path) else {}
blob[f"singlechip_general_l{L}"] = rec
text = json.dumps(blob, indent=1)  # serialize FIRST: a failed
# encode must not truncate previously recorded anchors
with open(path, "w") as _f:
    _f.write(text)
print(f"recorded -> {path} singlechip_general_l{L}", flush=True)
