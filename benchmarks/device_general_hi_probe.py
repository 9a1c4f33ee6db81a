"""TPU: device-noise GENERAL polarizations PAST the gather cliff via the
(1,1)-mesh per-shard general kernels with device rows
(parallel/sharded.py `device=`; dispatched by experiments/device_sweeps at
24 <= L <= 29 — previously a hard ValueError). The kernels themselves run
UNCHANGED (same Mosaic executables as the noiseless sharded-general
route); only the host-built rows differ.

Evidence layers:
1. L=20 deterministic cross-check: the sharded device route vs the
   blocked-kernel route (core.device_evolve.device_general_kernel_
   forward_batch / _echo_batch — interpret-anchored vs dense
   original-order oracles in tests/test_device.py). Both consume the SAME
   presample (_device_general_rows with identical keys), so agreement is
   trajectory-exact up to bf16x3 dot error, on the real chip.
2. L=24 (past the cliff): zero-rate invariants — device rows with
   p1=p2=0 must match the noiseless sharded-general builder bit-close,
   and the echo must return A0(t) == 1; plus noisy-rate timing.

Reference device mode: autocorr-delta-a-single-qiskit-fast.py:77-79
crossed with its general drives (…-circular-polarization.py:110-142).

Usage: python benchmarks/device_general_hi_probe.py [pol]
(pol != y records under device_general_hi_{pol})
"""

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from dtc_tpu.core.device_evolve import (
    device_general_kernel_echo_batch,
    device_general_kernel_forward_batch,
)
from dtc_tpu.io.disorder import generate_disorder
from dtc_tpu.models.drives import build_kick_schedule
from dtc_tpu.parallel.mesh import make_mesh
from dtc_tpu.parallel.sharded import (
    make_sharded_autocorr_forward_general,
    make_sharded_echo_general,
)

POL = _sys.argv[1] if len(_sys.argv) > 1 else "y"
AF = 0.9
rec = {"pol": POL}
mesh = make_mesh(n_amp=1, n_traj=1)


def timed(fn, groups=5):
    out = np.asarray(fn())
    assert np.all(np.isfinite(out)) and np.max(np.abs(out)) <= 1 + 1e-3
    dts = []
    for _ in range(groups):
        t0 = time.time()
        out = np.asarray(fn())
        dts.append(time.time() - t0)
    return out, float(np.median(dts))


# --- layer 1: L=20 deterministic cross-check vs the blocked device route
L, T, q, NT = 20, 50, 11, 8
hs_np, phis_np = generate_disorder(L, 1, seed=7)
hs = jnp.asarray(hs_np[0, :L])
phis = jnp.asarray(phis_np[0, : L - 1])
p1 = jnp.linspace(0.05, 0.2, L)
p2 = jnp.linspace(0.08, 0.25, L - 1)
sched = build_kick_schedule(POL, 0.97, T)
K = sched.K
keys = jax.random.split(jax.random.PRNGKey(3), NT)

print(f"[1] L={L} T={T} n_traj={NT}: blocked device-general kernels...",
      flush=True)
kw = dict(L=L, T=T, K=K, q=q, ancilla_factor=AF)
a_blk, dt_blk = timed(lambda: device_general_kernel_forward_batch(
    hs, phis, p1, p2, sched.angles, keys, **kw))
print(f"  blocked fwd: {T * NT / dt_blk:8.1f} traj-cyc/s", flush=True)

print("  sharded (1,1) device rows fwd...", flush=True)
f_dev = make_sharded_autocorr_forward_general(
    mesh, L=L, T=T, K=K, p=0.0, q=q, ancilla_factor=AF,
    device=(p1, p2, 2))
a_sh, dt_sh = timed(lambda: f_dev(sched.angles, hs, phis, keys))
dev = float(np.max(np.abs(a_sh - a_blk.mean(axis=0))))
print(f"  sharded fwd: {T * NT / dt_sh:8.1f} traj-cyc/s  "
      f"max_dev vs blocked: {dev:.2e}", flush=True)
assert dev < 3e-4, dev
rec["l20"] = {"T": T, "n_traj": NT,
              "blocked_traj_cyc_s": round(T * NT / dt_blk, 1),
              "sharded_traj_cyc_s": round(T * NT / dt_sh, 1),
              "fwd_max_dev": dev}

ts = jnp.asarray([1, 5, 10])
e_blk = np.asarray(device_general_kernel_echo_batch(
    hs, phis, p1, p2, sched.angles, keys, ts, **kw)).mean(axis=0)
e_dev = make_sharded_echo_general(
    mesh, L=L, T=T, K=K, p=0.0, q=q, ancilla_factor=AF,
    device=(p1, p2, 2))
e_sh = np.asarray([float(e_dev(sched.angles, hs, phis, keys,
                               jnp.asarray(int(t)))) for t in np.asarray(ts)])
edev = float(np.max(np.abs(e_sh - e_blk)))
print(f"  echo max_dev vs blocked (t=1,5,10): {edev:.2e}", flush=True)
assert edev < 3e-4, edev
rec["l20"]["echo_max_dev"] = edev

# --- layer 2: L=24 past the cliff — invariants + rates
L, T, q, NT = 24, 20, 11, 2
hs_np, phis_np = generate_disorder(L, 1, seed=7)
hs = jnp.asarray(hs_np[0, :L])
phis = jnp.asarray(phis_np[0, : L - 1])
p1 = jnp.linspace(0.01, 0.05, L)
p2 = jnp.linspace(0.02, 0.08, L - 1)
sched = build_kick_schedule(POL, 0.97, T)
keys = jax.random.split(jax.random.PRNGKey(5), NT)

print(f"[2] L={L} T={T} n_traj={NT}: zero-rate fwd vs noiseless builder...",
      flush=True)
f0 = make_sharded_autocorr_forward_general(
    mesh, L=L, T=T, K=K, p=0.0, q=q, ancilla_factor=1.0,
    device=(np.zeros(L), np.zeros(L - 1), 2))
f_ref = make_sharded_autocorr_forward_general(
    mesh, L=L, T=T, K=K, p=0.0, q=q, ancilla_factor=1.0)
a0 = np.asarray(f0(sched.angles, hs, phis, keys))
a_ref = np.asarray(f_ref(sched.angles, hs, phis, keys))
zdev = float(np.max(np.abs(a0 - a_ref)))
print(f"  zero-rate fwd dev vs noiseless: {zdev:.2e}", flush=True)
assert zdev < 1e-5, zdev
rec["l24_zero_rate_fwd_dev"] = zdev

e0 = make_sharded_echo_general(
    mesh, L=L, T=T, K=K, p=0.0, q=q, ancilla_factor=1.0,
    device=(np.zeros(L), np.zeros(L - 1), 2))
einv = np.asarray([float(e0(sched.angles, hs, phis, keys,
                            jnp.asarray(t))) for t in (1, 4)])
print(f"  zero-rate echo A0(1,4) = {einv}", flush=True)
assert np.max(np.abs(einv - 1.0)) < 3e-4, einv
rec["l24_zero_rate_echo_dev"] = float(np.max(np.abs(einv - 1.0)))

print("  noisy rates...", flush=True)
f24 = make_sharded_autocorr_forward_general(
    mesh, L=L, T=T, K=K, p=0.0, q=q, ancilla_factor=AF,
    device=(p1, p2, 2))
a24, dt24 = timed(lambda: f24(sched.angles, hs, phis, keys))
print(f"  L=24 device fwd: {T * NT / dt24:8.1f} traj-cyc/s  "
      f"A(t<4)={a24[:4].round(5)}", flush=True)
rec["l24"] = {"T": T, "n_traj": NT,
              "fwd_traj_cyc_s": round(T * NT / dt24, 1)}

e24 = make_sharded_echo_general(
    mesh, L=L, T=T, K=K, p=0.0, q=q, ancilla_factor=AF,
    device=(p1, p2, 2))
t_e = 5
v, dte = timed(lambda: e24(sched.angles, hs, phis, keys, jnp.asarray(t_e)))
rec["l24"]["echo_steps_s"] = round(2 * t_e * NT / dte, 1)
print(f"  L=24 device echo(t=5): {2 * t_e * NT / dte:8.1f} steps/s "
      f"A0={float(v):.5f}", flush=True)

path = _os.path.join(_os.path.dirname(_os.path.abspath(__file__)),
                     "parity_results.json")
db = json.load(open(path))
key = "device_general_hi" if POL == "y" else f"device_general_hi_{POL}"
db[key] = rec
text = json.dumps(db, indent=1)  # serialize FIRST: a failed encode must
# not truncate previously recorded anchors
with open(path, "w") as _f:
    _f.write(text)
print(f"recorded {key} ->", path, flush=True)
