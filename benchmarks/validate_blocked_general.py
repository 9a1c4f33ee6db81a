"""TPU validation + timing for the blocked-plane GENERAL kernel (L=22..23).

general_forward_batch/general_echo_batch route 22 <= L <= 23 to
_make_general_kernel_blocked (lab frame, any polarization family). Parity:
vs the sigma engine with identical presampled trajectories (expected at the
bf16x3 dot level, <= ~3e-4). Timing: vs the sigma fallback the general
dispatch would otherwise take at these L (the streamed kernel is x-only).

Usage: python benchmarks/validate_blocked_general.py [L] [n_traj] [pol]
"""

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import time

import jax
import jax.numpy as jnp
import numpy as np

from dtc_tpu.core.sigma_evolve import sigma_forward_batch, sigma_echo_batch
from dtc_tpu.io.disorder import generate_disorder
from dtc_tpu.models.drives import build_kick_schedule
from dtc_tpu.ops.pallas_resident_general import (
    general_echo_batch,
    general_forward_batch,
)

L = int(_sys.argv[1]) if len(_sys.argv) > 1 else 22
n_traj = int(_sys.argv[2]) if len(_sys.argv) > 2 else 8
pol = _sys.argv[3] if len(_sys.argv) > 3 else "y"
T, p = 50, 0.05
q = L // 2
hs_np, phis_np = generate_disorder(L, 1, seed=11)
hs = jnp.asarray(hs_np[:, :L])
phis = jnp.asarray(phis_np[:, :L - 1])
sched = build_kick_schedule(pol, 0.97, T)
K = sched.K
has_y = bool(np.any(np.asarray(sched.angles)[:, :, 1] != 0.0))
keys = jax.random.split(jax.random.PRNGKey(5), n_traj)[None]


def timed(fn, *a, reps=3, **kw):
    t0 = time.time()
    out = np.asarray(fn(*a, **kw))  # warm + materialize (validates)
    print(f"  [warm {time.time() - t0:.0f} s]", flush=True)
    t0 = time.time()
    for _ in range(reps):
        out = np.asarray(fn(*a, **kw))
    dt = (time.time() - t0) / reps
    assert np.all(np.isfinite(out)) and np.max(np.abs(out)) <= 1.0 + 1e-3
    return out, dt


print(f"L={L} T={T} p={p} n_traj={n_traj} pol={pol} K={K} "
      f"bt={_os.environ.get('DTC_TPU_BLOCKED_BT', '16')} "
      f"cs={_os.environ.get('DTC_TPU_BLOCKED_CS', '2048')}", flush=True)

gk, dtg = timed(general_forward_batch, hs, phis, sched.angles, keys,
                L=L, T=T, K=K, p=p, q=q)
sg, dts = timed(sigma_forward_batch, hs, phis, sched.angles, keys,
                L=L, T=T, K=K, p=p, q=q, initial_state="vacuum",
                dtype_name="complex64", ancilla_factor=1.0, has_y=has_y,
                reps=1)
print(f"noisy general-blocked-vs-sigma max|err| = "
      f"{np.max(np.abs(gk - sg)):.2e}", flush=True)
print(f"general : {n_traj * T / dtg:7.0f} traj-cyc/s ({dtg * 1e3:.0f} ms)")
print(f"sigma   : {n_traj * T / dts:7.0f} traj-cyc/s ({dts * 1e3:.0f} ms)")

if "--no-echo" not in _sys.argv:
    ekeys = keys[:, :2]
    ts_sub = jnp.asarray([1, T // 2, T])
    ge, _ = timed(general_echo_batch, hs, phis, sched.angles, ekeys, ts_sub,
                  L=L, T=T, K=K, p=p, q=q, reps=1)
    se, _ = timed(sigma_echo_batch, hs, phis, sched.angles, ekeys, ts_sub,
                  L=L, T=T, K=K, p=p, q=q, initial_state="vacuum",
                  dtype_name="complex64", ancilla_factor=1.0, has_y=has_y,
                  reps=1)
    print(f"echo general-blocked-vs-sigma max|err| = "
          f"{np.max(np.abs(ge - se)):.2e}")
    ts_full = jnp.arange(1, T + 1)
    n_steps = ekeys.shape[1] * (T * (T + 1))
    _, dteg = timed(general_echo_batch, hs, phis, sched.angles, ekeys,
                    ts_full, L=L, T=T, K=K, p=p, q=q)
    print(f"echo general: {n_steps / dteg:7.0f} active steps/s "
          f"({dteg * 1e3:.0f} ms)")
