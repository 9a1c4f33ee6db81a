"""BASELINE config 4 anchor: device-noise (FakeBrisbane-analogue) forward
trajectories at L=27 on the real chip — parity + throughput of the kernel
path vs the sigma device engine (VERDICT r2 missing #3).

The kernel path (core.device_evolve.device_kernel_forward_batch) runs the
UNCHANGED HBM-streamed x kernel with device event structure packed into the
compact rows (width=256 at L=27: per-class sigma checkpoints in the
sig/flip lanes — ops.pallas_noise.pack_device_cycle_params_compact). The
sigma device engine (device_sigma_forward_batch, the previous only path at
this scale) is the parity oracle: identical keys -> identical presampled
events -> deterministic agreement at the bf16x3 dot level.

Calibration comes from the documented synthetic Eagle-class model
(models.device_noise.fake_device_model('brisbane')), mirroring
NoiseModel.from_backend(FakeBrisbane()) usage
(autocorr-delta-a-single-qiskit-fast.py:77-79,
...-energy-fakebrisbane.py:80-96).

Usage: python benchmarks/device_l27_probe.py [L] [NTRAJ]
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
    device_kernel_forward_batch,
    device_sigma_forward_batch,
)
from dtc_tpu.io.disorder import generate_disorder
from dtc_tpu.models.device_noise import fake_device_model
from dtc_tpu.models.drives import build_kick_schedule

L = int(_sys.argv[1]) if len(_sys.argv) > 1 else 27
NTRAJ = int(_sys.argv[2]) if len(_sys.argv) > 2 else 2
T = 50
hs, phis = generate_disorder(L, 1, seed=7)
hs_j = jnp.asarray(hs[0, :L])
phis_j = jnp.asarray(phis[0, : L - 1])
model = fake_device_model(L, "brisbane", seed=9)
af = model.ancilla_interferometric_factor() * model.readout_z_factor(L // 2)
p1 = jnp.asarray(model.p_1q)
p2 = jnp.asarray(model.p_2q)
sched = build_kick_schedule("x", 0.97, T)
keys = jax.random.split(jax.random.PRNGKey(3), NTRAJ)
kw = dict(L=L, T=T, q=L // 2 if L // 2 < 14 else 11, ancilla_factor=float(af))


def timed(fn, reps=2, groups=5):
    out = np.asarray(fn())
    assert np.all(np.isfinite(out)) and np.max(np.abs(out)) <= 1 + 1e-3
    dts = []
    for _ in range(groups):
        t0 = time.time()
        for _ in range(reps):
            out = np.asarray(fn())
        dts.append((time.time() - t0) / reps)
    return out, float(np.median(dts))


path = _os.path.join(_os.path.dirname(_os.path.abspath(__file__)),
                     "parity_results.json")

if "--echo-only" not in _sys.argv:
    t0 = time.time()
    f_k = lambda: device_kernel_forward_batch(  # noqa: E731
        hs_j, phis_j, p1, p2, sched.angles, keys, **kw)
    a_k, dt_k = timed(f_k)
    print(f"device kernel compile+first: {time.time() - t0:.0f} s")

    f_s = lambda: device_sigma_forward_batch(  # noqa: E731
        hs_j, phis_j, p1, p2, sched.angles, keys, **kw)
    a_s, dt_s = timed(f_s, reps=1, groups=3)

    err = float(np.max(np.abs(a_k - a_s)))
    rate_k = T * NTRAJ / dt_k
    rate_s = T * NTRAJ / dt_s
    print(f"device kernel (streamed rows): {rate_k:8.1f} traj-cyc/s "
          f"({dt_k*1e3:.0f} ms)")
    print(f"device sigma engine          : {rate_s:8.1f} traj-cyc/s "
          f"({dt_s*1e3:.0f} ms)")
    print(f"speedup                      : {dt_s / dt_k:.2f}x")
    print(f"max |diff| (same keys)       : {err:.2e}")

    blob = json.load(open(path)) if _os.path.exists(path) else {}
    blob[f"device_l{L}"] = {
        "n_traj": NTRAJ, "T": T, "kernel_traj_cyc_s": round(rate_k, 1),
        "sigma_traj_cyc_s": round(rate_s, 1), "max_dev": err,
    }
    text = json.dumps(blob, indent=1)  # serialize FIRST: a failed
# encode must not truncate previously recorded anchors
with open(path, "w") as _f:
    _f.write(text)
    print(f"recorded -> {path} device_l{L}")
    assert err < 5e-4, err

if "--no-echo" not in _sys.argv:
    # ------------------------------------------------------------------
    # device ECHO at kernel rate (the half that previously had NO path at
    # all at this scale: the dense gather engine crashes the worker above
    # ~L=24). Rate over the full t=1..T sweep; value parity vs the eager
    # sigma-frame oracle (device_sigma_echo_batch, identical presampled
    # events) at small t where the deopted oracle is affordable.
    from dtc_tpu.core.device_evolve import (
        device_kernel_echo_batch,
        device_sigma_echo_batch,
    )

    # strided sweep (half the pairs): the rate metric is active steps/s,
    # which is stride-invariant; the full 100-pair sweep put ~12 min of
    # uninterrupted kernel time in one timed group, long enough to trip
    # the worker under co-tenant contention
    ts_sweep = jnp.arange(1, T + 1, 2)
    t0 = time.time()
    e_k = lambda: device_kernel_echo_batch(  # noqa: E731
        hs_j, phis_j, p1, p2, sched.angles, keys, ts_sweep, **kw)
    a_ek, dt_ek = timed(e_k, reps=1, groups=3)
    print(f"device echo kernel compile+first: {time.time() - t0:.0f} s")
    # active steps: sum over swept t of 2t, per trajectory
    steps = NTRAJ * int(2 * np.sum(np.asarray(ts_sweep)))
    rate_ek = steps / dt_ek
    print(f"device echo kernel: sweep t=1..{T} x {NTRAJ} traj = "
          f"{rate_ek:8.1f} active steps/s ({dt_ek:.2f} s) "
          f"A0(1,2)={np.asarray(a_ek)[0, :2].round(4)}", flush=True)
    # record the rate IMMEDIATELY: the parity leg below can die on the
    # oracle's own memory wall without invalidating the measurement.
    # Guarded creates: under --echo-only the forward leg may never have
    # recorded this L (or the file may not exist) — an unguarded
    # blob[f"device_l{L}"] would KeyError here and lose the minutes of
    # kernel time just spent.
    blob = json.load(open(path)) if _os.path.exists(path) else {}
    blob.setdefault(f"device_l{L}", {"n_traj": NTRAJ, "T": T}).update(
        echo_steps_s=round(rate_ek, 1))
    text = json.dumps(blob, indent=1)  # serialize FIRST: a failed
# encode must not truncate previously recorded anchors
with open(path, "w") as _f:
    _f.write(text)

    # Value parity: the eager sigma-frame oracle (identical presampled
    # events) — but at L=27 its remat'd while-body holds ~20 x 512 MB f32
    # temps and the compile helper rejects it (measured), so fall back to
    # the noiseless invariant: zero error rates => U^dag U = I => A0 == 1
    # exactly (the same self-validation the streamed-hi probes use where
    # no oracle compiles; noise-on parity is interpret-validated at L=17
    # in tests/test_device.py at 2.4e-5).
    ts_small = jnp.arange(1, 4)
    a_eks = np.asarray(device_kernel_echo_batch(
        hs_j, phis_j, p1, p2, sched.angles, keys[:1], ts_small, **kw))
    try:
        t0 = time.time()
        a_es = np.asarray(device_sigma_echo_batch(
            hs_j, phis_j, p1, p2, sched.angles, keys[:1], ts_small, **kw))
        err_e = float(np.max(np.abs(a_eks - a_es)))
        check = {"echo_max_dev": err_e, "echo_check": "sigma_oracle_t<=3"}
        print(f"sigma echo oracle (t<=3): {time.time() - t0:.0f} s, "
              f"max |diff| (same keys) = {err_e:.2e}")
    except Exception as exc:  # noqa: BLE001 — oracle OOM is expected at 27
        print(f"sigma echo oracle unavailable at L={L} "
              f"({type(exc).__name__}); using noiseless invariant")
        z = jnp.zeros_like(p1)
        kw0 = dict(kw, ancilla_factor=1.0)
        a_e0 = np.asarray(device_kernel_echo_batch(
            hs_j, phis_j, z, jnp.zeros_like(p2), sched.angles, keys[:1],
            ts_small, **kw0))
        err_e = float(np.max(np.abs(a_e0 - 1.0)))
        check = {"echo_noiseless_dev": err_e,
                 "echo_check": "noiseless A0(t)==1 (sigma oracle OOMs)"}
        print(f"noiseless A0(t)==1: max dev {err_e:.2e}")
        assert np.all(np.asarray(a_eks) <= 1.0 + 5e-4)  # noisy decays
    blob = json.load(open(path)) if _os.path.exists(path) else {}
    blob.setdefault(f"device_l{L}", {}).update(**check)
    text = json.dumps(blob, indent=1)  # serialize FIRST: a failed
# encode must not truncate previously recorded anchors
with open(path, "w") as _f:
    _f.write(text)
    print(f"recorded -> {path} device_l{L} (echo)")
    assert err_e < 5e-4, err_e
