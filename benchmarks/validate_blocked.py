"""TPU validation + timing for the blocked-plane resident kernel (L=22..23).

Parity: blocked kernel vs the sigma engine with identical presampled
trajectories (trajectory-for-trajectory, expected <= ~3e-4 at the default
bf16x3 dot level), plus the noiseless A(t) cross-check vs the streamed
kernel. Timing: blocked vs streamed at the same workload (the numbers
docs/PERFORMANCE.md records for the streamed kernel: L=22 988, L=24 390
traj-cyc/s).

Usage: python benchmarks/validate_blocked.py [L] [n_traj]
"""

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import time

import jax
import jax.numpy as jnp
import numpy as np

from dtc_tpu.core.sigma_evolve import sigma_forward_batch
from dtc_tpu.io.disorder import generate_disorder
from dtc_tpu.models.drives import build_kick_schedule
from dtc_tpu.ops.pallas_resident_blocked import blocked_forward_batch
from dtc_tpu.ops.pallas_streamed import streamed_forward_batch

L = int(_sys.argv[1]) if len(_sys.argv) > 1 else 22
n_traj = int(_sys.argv[2]) if len(_sys.argv) > 2 else 8
T, p = 50, 0.05
q = L // 2
hs_np, phis_np = generate_disorder(L, 1, seed=7)
hs = jnp.asarray(hs_np[:, :L])
phis = jnp.asarray(phis_np[:, :L - 1])
sched = build_kick_schedule("x", 0.97, T)
keys = jax.random.split(jax.random.PRNGKey(3), n_traj)[None]


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


print(f"L={L} T={T} p={p} n_traj={n_traj} "
      f"bt={_os.environ.get('DTC_TPU_BLOCKED_BT', '16')} "
      f"cs={_os.environ.get('DTC_TPU_BLOCKED_CS', '2048')}", flush=True)

# noiseless cross-check first (cheap to reason about: A(t) deterministic)
b0, dt0 = timed(blocked_forward_batch, hs, phis, sched.angles,
                keys[:, :1], L=L, T=T, p=0.0, q=q, reps=1)
s0, _ = timed(streamed_forward_batch, hs, phis, sched.angles, keys[:, :1],
              L=L, T=T, p=0.0, q=q, reps=1)
print(f"noiseless blocked-vs-streamed max|err| = "
      f"{np.max(np.abs(b0 - s0)):.2e}", flush=True)

# noisy parity vs sigma engine, identical presampled trajectories
bk, dtb = timed(blocked_forward_batch, hs, phis, sched.angles, keys,
                L=L, T=T, p=p, q=q)
sg, dts = timed(sigma_forward_batch, hs, phis, sched.angles, keys,
                L=L, T=T, K=1, p=p, q=q, initial_state="vacuum",
                dtype_name="complex64", ancilla_factor=1.0, has_y=False,
                reps=1)
print(f"noisy blocked-vs-sigma max|err| = {np.max(np.abs(bk - sg)):.2e}",
      flush=True)

st, dtst = timed(streamed_forward_batch, hs, phis, sched.angles, keys,
                 L=L, T=T, p=p, q=q)
print(f"noisy blocked-vs-streamed max|err| = {np.max(np.abs(bk - st)):.2e}",
      flush=True)

print(f"blocked : {n_traj * T / dtb:7.0f} traj-cyc/s ({dtb * 1e3:.0f} ms)")
print(f"streamed: {n_traj * T / dtst:7.0f} traj-cyc/s ({dtst * 1e3:.0f} ms)")
print(f"sigma   : {n_traj * T / dts:7.0f} traj-cyc/s ({dts * 1e3:.0f} ms)")

# ---- echo: blocked vs streamed (sweep t = 1..T, dynamic trip counts) ----
if "--no-echo" not in _sys.argv:
    from dtc_tpu.ops.pallas_resident_blocked import blocked_echo_batch
    from dtc_tpu.ops.pallas_streamed import streamed_echo_batch

    ekeys = keys[:, : max(2, n_traj // 2)]
    ts_sub = jnp.asarray([1, T // 2, T])
    eb, _ = timed(blocked_echo_batch, hs, phis, sched.angles, ekeys[:, :2],
                  ts_sub, L=L, T=T, p=p, q=q, reps=1)
    es, _ = timed(streamed_echo_batch, hs, phis, sched.angles, ekeys[:, :2],
                  ts_sub, L=L, T=T, p=p, q=q, reps=1)
    print(f"echo blocked-vs-streamed max|err| = {np.max(np.abs(eb - es)):.2e}")
    ts_full = jnp.arange(1, T + 1)
    n_steps = ekeys.shape[1] * (T * (T + 1))  # sum of 2t active steps
    _, dteb = timed(blocked_echo_batch, hs, phis, sched.angles, ekeys,
                    ts_full, L=L, T=T, p=p, q=q)
    _, dtes = timed(streamed_echo_batch, hs, phis, sched.angles, ekeys,
                    ts_full, L=L, T=T, p=p, q=q)
    print(f"echo blocked : {n_steps / dteb:7.0f} active steps/s "
          f"({dteb * 1e3:.0f} ms)")
    print(f"echo streamed: {n_steps / dtes:7.0f} active steps/s "
          f"({dtes * 1e3:.0f} ms)")
