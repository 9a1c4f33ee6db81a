"""Full-plane vs blocked-plane GENERAL (lab-frame) kernel at L <= 21 (TPU).

The blocked body won at the x-kernel's own sizes (benchmarks/
blocked_lowL_probe.py), so probe the general kernel the same way. The
body choice is baked at trace time from DTC_TPU_GENERAL_BLOCKED_MIN_L, so
run this twice — once per variant — and the second run cross-checks its
values against the first's saved output (same math, same presampled
trajectories; expect <= ~3e-4, the bf16x3 dot level). The library DEFAULT
is blocked at 18 <= L <= 23, so at L = 18..21 the FULL-PLANE run is the
one that needs the env override:

  DTC_TPU_GENERAL_BLOCKED_MIN_L=22 \
      python benchmarks/general_blocked_probe.py 20 32 y       # full-plane
  python benchmarks/general_blocked_probe.py 20 32 y           # blocked

Timings are medians over repeated groups (CLAUDE.md rule 8).
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
from dtc_tpu.ops.pallas_resident_general import (general_echo_batch,
                                                 general_forward_batch)

L = int(_sys.argv[1]) if len(_sys.argv) > 1 else 20
n_traj = int(_sys.argv[2]) if len(_sys.argv) > 2 else 32
pol = _sys.argv[3] if len(_sys.argv) > 3 else "y"
T, p = 50, 0.05
q = L // 2
# label from the library's OWN dispatch rule (an env-less run at L=18..21
# executes the blocked body — the default _blocked_min_L is 18)
from dtc_tpu.ops.pallas_resident_general import _blocked_min_L  # noqa: E402

variant = "blocked" if L >= _blocked_min_L() else "full-plane"
hs_np, phis_np = generate_disorder(L, 1, seed=7)
hs = jnp.asarray(hs_np[:, :L])
phis = jnp.asarray(phis_np[:, :L - 1])
sched = build_kick_schedule(pol, 0.97, T)
keys = jax.random.split(jax.random.PRNGKey(3), n_traj)[None]


def timed(fn, *a, groups=3, reps=3, **kw):
    t0 = time.time()
    out = np.asarray(fn(*a, **kw))
    print(f"  [warm {time.time() - t0:.0f} s]", flush=True)
    assert np.all(np.isfinite(out)) and np.max(np.abs(out)) <= 1.0 + 1e-3
    dts = []
    for _ in range(groups):
        t0 = time.time()
        for _ in range(reps):
            out = np.asarray(fn(*a, **kw))
        dts.append((time.time() - t0) / reps)
    return out, float(np.median(dts))


def xcheck(tag, out):
    ref_path = f"/tmp/general_probe_{tag}_L{L}_{pol}.npy"
    if _os.path.exists(ref_path):
        ref = np.load(ref_path)
        if ref.shape != out.shape:
            # stale reference from a run with a different n_traj — replace
            print(f"  {tag}: stale ref shape {ref.shape} != {out.shape}; "
                  "overwriting (no cross-check this run)", flush=True)
            np.save(ref_path, out)
            return
        err = float(np.max(np.abs(out - ref)))
        print(f"  {tag} vs other variant: max|err| = {err:.1e}", flush=True)
        assert err < 3e-4
    else:
        np.save(ref_path, out)


print(f"L={L} T={T} p={p} pol={pol} n_traj={n_traj} variant={variant}",
      flush=True)
fw, dtf = timed(general_forward_batch, hs, phis, sched.angles, keys,
                L=L, T=T, K=sched.K, p=p, q=q)
print(f"fwd {variant}: {n_traj * T / dtf:7.0f} traj-cyc/s "
      f"({dtf * 1e3:.0f} ms)", flush=True)
xcheck("fwd", fw)

if "--no-echo" not in _sys.argv:
    ekeys = keys[:, : max(2, min(8, n_traj // 4))]
    ts_full = jnp.arange(1, T + 1)
    n_steps = ekeys.shape[1] * (T * (T + 1))
    ec, dte = timed(general_echo_batch, hs, phis, sched.angles, ekeys,
                    ts_full, L=L, T=T, K=sched.K, p=p, q=q)
    print(f"echo {variant}: {n_steps / dte:7.0f} active steps/s "
          f"({dte * 1e3:.0f} ms)", flush=True)
    xcheck("echo", ec)
