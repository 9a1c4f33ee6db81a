"""TPU: the r2-blocked PER-SHARD GENERAL (lab-frame) cycle kernels
(ops/pallas_cycle_hi_general) on a (1,1) mesh at local_bits = L — the
engine multi-chip y/xy/circular/per-cycle-g runs use when the shard
exceeds VMEM (24 <= L_loc <= 30; the VMEM general per-shard kernel bounds
at 23). Forward + echo vs the XLA sharded engine with identical
presampled trajectories (deterministic value parity), plus rates.
Closes VERDICT r3 missing #5 with hardware evidence; the cross-shard
machinery itself is interpret-validated on the virtual mesh
(tests/test_sharded_kernel.py::test_general_hi_cycle_kernel_sharded_parity).
Reference drives: autocorr-delta-a-single-qiskit-fast-circular-
polarization.py:110-142.

Usage: python benchmarks/sharded_general_hi_probe.py [L] [T] [n_traj] [pol]
"""

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from dtc_tpu.io.disorder import generate_disorder
from dtc_tpu.models.drives import build_kick_schedule
from dtc_tpu.parallel.mesh import make_mesh
from dtc_tpu.parallel.sharded import (
    make_sharded_autocorr_forward,
    make_sharded_autocorr_forward_general,
    make_sharded_echo,
    make_sharded_echo_general,
)

L = int(_sys.argv[1]) if len(_sys.argv) > 1 else 24
T = int(_sys.argv[2]) if len(_sys.argv) > 2 else 20
NTRAJ = int(_sys.argv[3]) if len(_sys.argv) > 3 else 2
POL = _sys.argv[4] if len(_sys.argv) > 4 else "y"
P, q = 0.05, 11
T_ECHO = min(6, T)

hs_np, phis_np = generate_disorder(L, 1, seed=7)
hs = jnp.asarray(hs_np[0, :L])
phis = jnp.asarray(phis_np[0, : L - 1])
sched = build_kick_schedule(POL, 0.97, T)
K = sched.K
mesh = make_mesh(n_amp=1, n_traj=1)
keys = jax.random.split(jax.random.PRNGKey(3), 2 * NTRAJ)


def timed(fn, reps=1, groups=5):
    out = np.asarray(fn())
    assert np.all(np.isfinite(out)) and np.max(np.abs(out)) <= 1 + 1e-3
    dts = []
    for _ in range(groups):
        t0 = time.time()
        for _ in range(reps):
            out = np.asarray(fn())
        dts.append((time.time() - t0) / reps)
    return out, float(np.median(dts))


rec = {"n_traj": NTRAJ, "T": T, "pol": POL, "K": K}

print(f"L={L} T={T} n_traj={NTRAJ} pol={POL} (K={K}): compiling per-shard "
      f"general hi FORWARD...", flush=True)
f_g = make_sharded_autocorr_forward_general(mesh, L=L, T=T, K=K, p=P, q=q)
t0 = time.time()
a_g, dt_g = timed(lambda: f_g(sched.angles, hs, phis, keys))
print(f"  compile+first: {time.time() - t0:.0f} s", flush=True)
rate_g = T * NTRAJ / dt_g
print(f"  general hi cycle kernel: {rate_g:8.1f} traj-cyc/s "
      f"({dt_g*1e3:.0f} ms)  A(t<4)={a_g[:4].round(5)}", flush=True)
rec["fwd_traj_cyc_s"] = round(rate_g, 1)

f_x = make_sharded_autocorr_forward(mesh, L=L, T=T, K=K, p=P, q=q,
                                    has_y=True)
t0 = time.time()
a_x, dt_x = timed(lambda: f_x(sched.angles, hs, phis, keys))
print(f"  XLA sharded compile+first: {time.time() - t0:.0f} s", flush=True)
err = float(np.max(np.abs(a_g - a_x)))
rate_x = T * NTRAJ / dt_x
print(f"  XLA sharded: {rate_x:8.1f} traj-cyc/s ({dt_x*1e3:.0f} ms)  "
      f"speedup {rate_g/rate_x:.2f}x   parity {err:.2e}", flush=True)
rec.update(fwd_xla_traj_cyc_s=round(rate_x, 1), fwd_max_dev=err,
           fwd_speedup=round(rate_g / rate_x, 2))
path = _os.path.join(_os.path.dirname(_os.path.abspath(__file__)),
                     "parity_results.json")
blob = json.load(open(path)) if _os.path.exists(path) else {}
blob[f"sharded_general_hi_l{L}_{POL}"] = dict(rec)
text = json.dumps(blob, indent=1)  # serialize FIRST: a failed
# encode must not truncate previously recorded anchors
with open(path, "w") as _f:
    _f.write(text)
print(f"recorded (forward) -> sharded_general_hi_l{L}_{POL}", flush=True)
assert err < 5e-4, err

print(f"echo at t={T_ECHO}: compiling per-shard general hi ECHO...",
      flush=True)
e_g = make_sharded_echo_general(mesh, L=L, T=T_ECHO, K=K, p=P, q=q)
e_x = make_sharded_echo(mesh, L=L, T=T_ECHO, K=K, p=P, q=q, has_y=True)
tv = jnp.asarray(T_ECHO)
t0 = time.time()
b_g, dt_eg = timed(lambda: e_g(sched.angles, hs, phis, keys, tv))
print(f"  compile+first: {time.time() - t0:.0f} s", flush=True)
b_x, dt_ex = timed(lambda: e_x(sched.angles, hs, phis, keys, tv))
err_e = abs(float(b_g) - float(b_x))
rate_eg = 2 * T_ECHO * NTRAJ / dt_eg
rate_ex = 2 * T_ECHO * NTRAJ / dt_ex
print(f"  general hi echo kernel: {rate_eg:8.1f} traj-cyc/s  "
      f"XLA {rate_ex:8.1f}  speedup {rate_eg/rate_ex:.2f}x   "
      f"parity {err_e:.2e}", flush=True)
rec.update(echo_traj_cyc_s=round(rate_eg, 1),
           echo_xla_traj_cyc_s=round(rate_ex, 1), echo_max_dev=err_e,
           echo_speedup=round(rate_eg / rate_ex, 2))
assert err_e < 5e-4, err_e

blob = json.load(open(path)) if _os.path.exists(path) else {}
blob[f"sharded_general_hi_l{L}_{POL}"] = rec
text = json.dumps(blob, indent=1)  # serialize FIRST: a failed
# encode must not truncate previously recorded anchors
with open(path, "w") as _f:
    _f.write(text)
print(f"recorded -> {path} sharded_general_hi_l{L}_{POL}", flush=True)
