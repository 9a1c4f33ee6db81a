"""TPU: the r2-blocked streamed ECHO kernel (ops/pallas_streamed_hi) at
and past the original streamed kernel's envelope — the single-chip
L=29/30 echo engine (the echo half of every reference study,
autocorr-delta-a-single-qiskit-fast.py:140-147).

Per-L validation ladder (one L per invocation so a failed compile
doesn't lose earlier results):
  28 — noisy parity vs the ORIGINAL streamed echo kernel (identical
       presampled keys) + rate comparison at the shared size.
  29 — noiseless A0(t) == 1 invariant (the sigma echo reference OOMs
       here, same as the original streamed kernel's L=28 situation) +
       a noisy run checked against the p=0 run's decay ordering; rates.
  30 — noiseless invariant + cross-geometry re-cut of every pass-B DMA
       boundary on the noisy values; rates.

Usage: python benchmarks/l29plus_hi_echo_probe.py <L> [T]
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
from dtc_tpu.ops.pallas_streamed_hi import streamed_hi_echo_batch

L = int(_sys.argv[1]) if len(_sys.argv) > 1 else 29
T = int(_sys.argv[2]) if len(_sys.argv) > 2 else 8
P, q = 0.05, 11
AF = (1 - P) ** 6
NTRAJ = 1

hs_np, phis_np = generate_disorder(L, 1, seed=7)
hs = jnp.asarray(hs_np[:, :L])
phis = jnp.asarray(phis_np[:, : L - 1])
sched = build_kick_schedule("x", 0.97, T)
keys = jax.random.split(jax.random.PRNGKey(3), NTRAJ)[None]
ts = jnp.arange(1, T + 1, 2)  # [1, 3, 5, 7] at T=8
n_cyc = int(2 * np.sum(np.asarray(ts))) * NTRAJ  # active cycles per call
kw = dict(L=L, T=T, p=P, q=q, ancilla_factor=AF)


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


print(f"L={L} T={T} ts={np.asarray(ts)}: compiling streamed-hi echo...",
      flush=True)
t0 = time.time()
e_hi, dt_hi = timed(lambda: streamed_hi_echo_batch(
    hs, phis, sched.angles, keys, ts, **kw))
print(f"  compile+first: {time.time() - t0:.0f} s", flush=True)
rate_hi = n_cyc / dt_hi
print(f"  streamed-hi echo: {rate_hi:8.1f} traj-cyc/s ({dt_hi*1e3:.0f} ms)"
      f"  A0={e_hi[0, 0].round(5)}", flush=True)

rec = {"n_traj": NTRAJ, "T": T, "ts": np.asarray(ts).tolist(),
       "hi_traj_cyc_s": round(rate_hi, 1)}

if L <= 28:
    from dtc_tpu.ops.pallas_streamed import streamed_echo_batch
    t0 = time.time()
    e_ref, dt_ref = timed(lambda: streamed_echo_batch(
        hs, phis, sched.angles, keys, ts, **kw))
    print(f"  original streamed echo compile+first: {time.time() - t0:.0f} s",
          flush=True)
    err = float(np.max(np.abs(e_hi - e_ref)))
    rate_ref = n_cyc / dt_ref
    print(f"  original streamed echo: {rate_ref:8.1f} traj-cyc/s "
          f"({dt_ref*1e3:.0f} ms)   hi/orig: {dt_ref/dt_hi:.2f}x   "
          f"parity {err:.2e}", flush=True)
    rec.update(ref="streamed_echo", ref_traj_cyc_s=round(rate_ref, 1),
               max_dev=err)
    assert err < 5e-4, err
else:
    # noiseless invariant: U_F^-t U_F^t |psi> == |psi>  =>  A0(t) == 1
    e0, _ = timed(lambda: streamed_hi_echo_batch(
        hs, phis, sched.angles, keys, ts, L=L, T=T, p=0.0, q=q,
        ancilla_factor=1.0), groups=1)
    err0 = float(np.max(np.abs(e0 - 1.0)))
    print(f"  noiseless A0(t)==1: max dev {err0:.2e}", flush=True)
    rec.update(noiseless_dev=err0)
    assert err0 < 5e-4, err0
    # noisy values must decay below the noiseless line
    assert np.all(e_hi <= 1.0 + 5e-4)
    if L >= 30:
        from dtc_tpu.ops.pallas_streamed_hi import _hi_geometry
        MS, CS = _hi_geometry(L)
        alt = (MS // 2, 2 * CS)
        t0 = time.time()
        e_alt, _ = timed(lambda: streamed_hi_echo_batch(
            hs, phis, sched.angles, keys, ts, geom=alt, **kw), groups=1)
        print(f"  alt-geom {alt} compile+first: {time.time() - t0:.0f} s",
              flush=True)
        err = float(np.max(np.abs(e_hi - e_alt)))
        print(f"  cross-geom parity {err:.2e}", flush=True)
        rec.update(ref=f"geom{alt}", max_dev=err)
        assert err < 5e-4, err

path = _os.path.join(_os.path.dirname(_os.path.abspath(__file__)),
                     "parity_results.json")
blob = json.load(open(path)) if _os.path.exists(path) else {}
blob[f"streamed_hi_echo_l{L}"] = rec
text = json.dumps(blob, indent=1)  # serialize FIRST: a failed
# encode must not truncate previously recorded anchors
with open(path, "w") as _f:
    _f.write(text)
print(f"recorded -> {path} streamed_hi_echo_l{L}", flush=True)
