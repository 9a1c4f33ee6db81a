"""TPU: device-noise GENERAL polarizations at kernel rate (VERDICT r3
next #5 stretch) — the lab-frame general kernels with device events
commuted into the post-kick Pauli hook (core.device_evolve.
device_general_kernel_forward_batch / _echo_batch), vs the dense gather
engine (device_autocorr_forward/echo — the previous ONLY path for these
drives, which bounds at ~L=24).

Parity leg runs both engines on the same synthetic Eagle calibration;
the gather engine samples with fold_in salts (different RNG stream), so
the check is statistical over trajectories at matched scale plus the
deterministic noiseless A0(t)==1 invariant; trajectory-exact parity vs
the original-order oracle is CPU-carried (tests/test_device.py).

Usage: python benchmarks/device_general_probe.py [L] [NTRAJ] [POL]
"""

import json
import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import time

import jax
import jax.numpy as jnp
import numpy as np

from dtc_tpu.core.device_evolve import (
    device_autocorr_forward,
    device_general_kernel_echo_batch,
    device_general_kernel_forward_batch,
)
from dtc_tpu.io.disorder import generate_disorder
from dtc_tpu.models.device_noise import fake_device_model
from dtc_tpu.models.drives import build_kick_schedule, n_kick_slots

L = int(_sys.argv[1]) if len(_sys.argv) > 1 else 20
NTRAJ = int(_sys.argv[2]) if len(_sys.argv) > 2 else 64
POL = _sys.argv[3] if len(_sys.argv) > 3 else "y"
T = 50
K = n_kick_slots(POL)
hs, phis = generate_disorder(L, 1, seed=7)
hs_j = jnp.asarray(hs[0, :L])
phis_j = jnp.asarray(phis[0, : L - 1])
model = fake_device_model(L, "brisbane", seed=9)
af = model.ancilla_interferometric_factor() * model.readout_z_factor(11)
p1 = jnp.asarray(model.p_1q)
p2 = jnp.asarray(model.p_2q)
sched = build_kick_schedule(POL, 0.97, T)
keys = jax.random.split(jax.random.PRNGKey(3), NTRAJ)
kw = dict(L=L, T=T, K=K, q=11, ancilla_factor=float(af))


def timed(fn, groups=5):
    out = np.asarray(fn())
    assert np.all(np.isfinite(out)) and np.max(np.abs(out)) <= 1 + 1e-3
    dts = []
    for _ in range(groups):
        t0 = time.time()
        out = np.asarray(fn())
        dts.append(time.time() - t0)
    return out, float(np.median(dts))


t0 = time.time()
a_k, dt_k = timed(lambda: device_general_kernel_forward_batch(
    hs_j, phis_j, p1, p2, sched.angles, keys, **kw))
print(f"general device kernel compile+first: {time.time() - t0:.0f} s",
      flush=True)
rate_k = T * NTRAJ / dt_k
print(f"kernel fwd ({POL}): {rate_k:8.1f} traj-cyc/s ({dt_k*1e3:.0f} ms)",
      flush=True)

# gather engine at a reduced trajectory count (it is the slow engine) —
# but large enough that the per-t variance estimate is usable (NG=8 gave
# heavy-tailed z values that tripped the 4.5 band on correct code).
# Chunked at 8 trajectories per call: a single 16-trajectory gather call
# at L=20 reproducibly crashes the TPU worker (the documented live-batch
# wall — its pauli-gather temps scale with the batch).
NG = max(16, NTRAJ // 4)
GCH = 8
gkeys = jax.random.split(jax.random.PRNGKey(11), NG)


def gather_all():
    outs = [device_autocorr_forward(hs_j, phis_j, p1, p2, sched.angles,
                                    gkeys[i:i + GCH], **kw)
            for i in range(0, NG, GCH)]
    return np.concatenate([np.asarray(o) for o in outs], axis=0)


t0 = time.time()
a_g, dt_g = timed(gather_all, groups=3)
print(f"gather engine compile+first: {time.time() - t0:.0f} s", flush=True)
rate_g = T * NG / dt_g
print(f"gather fwd ({POL}): {rate_g:8.1f} traj-cyc/s ({dt_g*1e3:.0f} ms)",
      flush=True)

# statistical parity: independent RNG streams -> z-test per time point.
# The denominator is floored at the bf16x3 dot-precision scale (~2e-4,
# CLAUDE.md rule 5): at near-deterministic time points (t=0 exactly, and
# early cycles in the DTC phase) the trajectory spread is ~0 and an
# unfloored z turns benign engine-precision differences into huge values
# (the round-4 first run recorded max z 11.41 from exactly this; the
# rate DISTRIBUTIONS match — oracle-vs-gather at L=14, N=768/side, max
# z 1.57 on CPU).
mk, sk = a_k.mean(0), a_k.std(0) / np.sqrt(NTRAJ)
mg, sg = a_g.mean(0), a_g.std(0) / np.sqrt(NG)
PREC_FLOOR = 3e-4
z = np.abs(mk - mg) / np.sqrt(sk**2 + sg**2 + PREC_FLOOR**2)
print(f"fwd ensemble z-score: max {z.max():.2f} (want < ~4.5)", flush=True)

# echo: rate over a strided sweep + noiseless invariant
ts_sweep = jnp.arange(1, T + 1, 2)
t0 = time.time()
e_k, dt_e = timed(lambda: device_general_kernel_echo_batch(
    hs_j, phis_j, p1, p2, sched.angles, keys[:max(2, NTRAJ // 8)],
    ts_sweep, **kw), groups=3)
print(f"general device echo kernel compile+first: {time.time() - t0:.0f} s",
      flush=True)
n_echo = max(2, NTRAJ // 8)
steps = n_echo * int(2 * np.sum(np.asarray(ts_sweep)))
rate_e = steps / dt_e
print(f"kernel echo ({POL}): {rate_e:8.1f} active steps/s "
      f"({dt_e:.2f} s)  A0(1)={e_k[:, 0].mean():.4f}", flush=True)
e0 = np.asarray(device_general_kernel_echo_batch(
    hs_j, phis_j, jnp.zeros_like(p1), jnp.zeros_like(p2), sched.angles,
    keys[:2], jnp.asarray([1, T // 2]), L=L, T=T, K=K, q=11,
    ancilla_factor=1.0))
err0 = float(np.max(np.abs(e0 - 1.0)))
print(f"noiseless A0(t)==1: max dev {err0:.2e}", flush=True)

path = _os.path.join(_os.path.dirname(_os.path.abspath(__file__)),
                     "parity_results.json")
blob = json.load(open(path)) if _os.path.exists(path) else {}
ok = bool(z.max() < 4.5 and err0 < 5e-4)
blob[f"device_general_l{L}"] = {
    "pol": POL, "n_traj": NTRAJ, "n_gather": NG, "T": T,
    "kernel_traj_cyc_s": round(rate_k, 1),
    "gather_traj_cyc_s": round(rate_g, 1),
    "speedup": round(rate_k / rate_g, 2),
    "fwd_max_z": round(float(z.max()), 2),
    "echo_steps_s": round(rate_e, 1),
    "echo_noiseless_dev": err0,
    "pass": ok,
}
text = json.dumps(blob, indent=1)  # serialize FIRST: a failed
# encode must not truncate previously recorded anchors
with open(path, "w") as _f:
    _f.write(text)
print(f"recorded -> {path} device_general_l{L}  pass={ok}")
assert ok, (float(z.max()), err0)
