"""TPU timing: LAB-frame per-shard general cycle kernel
(make_sharded_autocorr_forward_general) vs the XLA sigma-frame sharded
engine on a (traj=1, amp=1) mesh — the single-chip bound on the multi-chip
path for y/xy/circular and per-cycle-g drives (VERDICT r2 missing #5).

Measures the y drive (K=1) and the time-dependent circular drive (K=2, the
reference's ...-fast-circular-polarization.py:110-142 family), forward AND
echo (make_sharded_echo_general — the masked-2T switch scan over the
forward/daggered general cycle kernels; reversed per-cycle schedules per
...-fast-circular-polarization.py:164-172). Values must agree with the XLA
sharded engine to the bf16x3 dot level (identical presampled keys).

Usage: python benchmarks/sharded_general_probe.py [L] [NTRAJ]
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

L = int(_sys.argv[1]) if len(_sys.argv) > 1 else 20
NTRAJ = int(_sys.argv[2]) if len(_sys.argv) > 2 else 8
T, P = 50, 0.05
hs, phis = generate_disorder(L, 1, seed=7)
hs_j = jnp.asarray(hs[0, :L])
phis_j = jnp.asarray(phis[0, : L - 1])
keys = jax.random.split(jax.random.PRNGKey(3), NTRAJ)
mesh = make_mesh(n_amp=1, n_traj=1, devices=jax.devices()[:1])


def timed(fn, reps=3, groups=5):
    """Median over timing groups (CLAUDE.md: single TPU readings swing
    ~40% under transient contention — never report a lone mean)."""
    out = np.asarray(fn())  # warm + validate
    assert np.all(np.isfinite(out)) and np.max(np.abs(out)) <= 1 + 1e-3
    dts = []
    for _ in range(groups):
        t0 = time.time()
        for _ in range(reps):
            out = np.asarray(fn())
        dts.append((time.time() - t0) / reps)
    return out, float(np.median(dts))


results = {}
for name, kwargs in [("y", {}),
                     ("circular_left", dict(circular_frequency=0.5))]:
    sched = build_kick_schedule(name, 0.97, T, **kwargs)
    t0 = time.time()
    f_g = make_sharded_autocorr_forward_general(
        mesh, L=L, T=T, K=sched.K, p=P, q=L // 2)
    a_g, dt_g = timed(lambda: f_g(sched.angles, hs_j, phis_j, keys))
    print(f"[{name}] general kernel compile+first: {time.time() - t0:.0f} s")

    f_x = make_sharded_autocorr_forward(
        mesh, L=L, T=T, K=sched.K, p=P, q=L // 2, has_y=True)
    a_x, dt_x = timed(lambda: f_x(sched.angles, hs_j, phis_j, keys))

    err = float(np.max(np.abs(a_g - a_x)))
    rate_g = T * NTRAJ / dt_g
    rate_x = T * NTRAJ / dt_x
    print(f"[{name}] general kernel sharded: {rate_g:8.0f} traj-cyc/s "
          f"({dt_g*1e3:.0f} ms)")
    print(f"[{name}] XLA sharded (sigma)   : {rate_x:8.0f} traj-cyc/s "
          f"({dt_x*1e3:.0f} ms)")
    print(f"[{name}] speedup               : {dt_x / dt_g:.2f}x")
    print(f"[{name}] max |diff|            : {err:.2e}")
    results[name] = {
        "kernel_traj_cyc_s": round(rate_g), "xla_traj_cyc_s": round(rate_x),
        "speedup": round(dt_x / dt_g, 2), "max_dev": err,
    }
    assert err < 5e-4, err

    # echo at t=T (2T active steps per evaluation)
    t0 = time.time()
    e_g = make_sharded_echo_general(
        mesh, L=L, T=T, K=sched.K, p=P, q=L // 2)
    tv = jnp.asarray(T)
    v_g, dt_eg = timed(lambda: e_g(sched.angles, hs_j, phis_j, keys, tv))
    print(f"[{name}] general echo compile+first: {time.time() - t0:.0f} s")
    e_x = make_sharded_echo(mesh, L=L, T=T, K=sched.K, p=P, q=L // 2,
                            has_y=True)
    v_x, dt_ex = timed(lambda: e_x(sched.angles, hs_j, phis_j, keys, tv))
    err_e = abs(float(v_g) - float(v_x))
    rate_eg = 2 * T * NTRAJ / dt_eg
    rate_ex = 2 * T * NTRAJ / dt_ex
    print(f"[{name}] general echo kernel   : {rate_eg:8.0f} steps/s "
          f"({dt_eg*1e3:.0f} ms)  XLA {rate_ex:8.0f} "
          f"({dt_ex*1e3:.0f} ms)  speedup {dt_ex / dt_eg:.2f}x  "
          f"dev {err_e:.2e}")
    results[name]["echo_steps_s"] = round(rate_eg)
    results[name]["echo_xla_steps_s"] = round(rate_ex)
    results[name]["echo_speedup"] = round(dt_ex / dt_eg, 2)
    results[name]["echo_max_dev"] = err_e
    assert err_e < 5e-4, err_e

path = _os.path.join(_os.path.dirname(_os.path.abspath(__file__)),
                     "parity_results.json")
blob = json.load(open(path)) if _os.path.exists(path) else {}
blob[f"sharded_general_l{L}"] = {"n_traj": NTRAJ, "T": T, **results}
text = json.dumps(blob, indent=1)  # serialize FIRST: a failed
# encode must not truncate previously recorded anchors
with open(path, "w") as _f:
    _f.write(text)
print(f"recorded -> {path} sharded_general_l{L}")
