"""TPU timing: per-shard Pallas cycle kernel (ops/pallas_cycle via
make_sharded_autocorr_forward_kernel) vs the XLA sigma-frame sharded engine
on a (traj=1, amp=1) mesh — the single-chip bound on the multi-chip path
(docs/PERFORMANCE.md roadmap #4).

With one shard the kernel path = scan of one pallas_call per cycle with the
state DMA-round-tripped HBM->VMEM->HBM each cycle, so this measures the
per-cycle dispatch + DMA tax the sharded path pays relative to the
whole-trajectory blocked kernel (which keeps the state in VMEM across all T
cycles). Values must agree with the XLA sharded engine to the bf16x3 dot
level (identical presampled keys).

Usage: python benchmarks/sharded_kernel_probe.py [L] [NTRAJ]
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
from dtc_tpu.parallel.mesh import make_mesh
from dtc_tpu.parallel.sharded import (
    make_sharded_autocorr_forward,
    make_sharded_autocorr_forward_kernel,
)

L = int(_sys.argv[1]) if len(_sys.argv) > 1 else 20
NTRAJ = int(_sys.argv[2]) if len(_sys.argv) > 2 else 8
T, P = 50, 0.05
hs, phis = generate_disorder(L, 1, seed=7)
hs_j = jnp.asarray(hs[0, :L])
phis_j = jnp.asarray(phis[0, : L - 1])
sched = build_kick_schedule("x", 0.97, T)
keys = jax.random.split(jax.random.PRNGKey(3), NTRAJ)


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


mesh = make_mesh(n_amp=1, n_traj=1, devices=jax.devices()[:1])
t0 = time.time()
f_k = make_sharded_autocorr_forward_kernel(mesh, L=L, T=T, p=P, q=L // 2)
a_k, dt_k = timed(lambda: f_k(sched.angles, hs_j, phis_j, keys))
print(f"kernel path compile+first: {time.time() - t0:.0f} s")

f_x = make_sharded_autocorr_forward(mesh, L=L, T=T, K=1, p=P, q=L // 2)
a_x, dt_x = timed(lambda: f_x(sched.angles, hs_j, phis_j, keys))

err = float(np.max(np.abs(a_k - a_x)))
rate_k = T * NTRAJ / dt_k
rate_x = T * NTRAJ / dt_x
print(f"cycle-kernel sharded : {rate_k:8.0f} traj-cyc/s ({dt_k*1e3:.0f} ms)")
print(f"XLA sharded (sigma)  : {rate_x:8.0f} traj-cyc/s ({dt_x*1e3:.0f} ms)")
print(f"speedup              : {dt_x / dt_k:.2f}x")
print(f"max |diff|           : {err:.2e}")
assert err < 5e-4, err

# ---- echo builder (roadmap #5): masked-2T switch scan over the
# forward/inverse cycle kernels. A t=T call runs 2T active steps (zero
# padding), so its steps/s is directly comparable to the forward kernel's
# per-cycle rate; the XLA sharded echo at the same t gives the speedup the
# builder delivers on the echo half of every multi-chip forward+echo study.
from dtc_tpu.parallel.sharded import (  # noqa: E402
    make_sharded_echo,
    make_sharded_echo_kernel,
)

t_full = jnp.asarray(T)
t0 = time.time()
e_k = make_sharded_echo_kernel(mesh, L=L, T=T, p=P, q=L // 2)


def timed_scalar(fn, reps=3, groups=5):
    v = float(np.asarray(fn()))
    assert np.isfinite(v) and abs(v) <= 1 + 1e-3, v
    dts = []
    for _ in range(groups):
        t0 = time.time()
        for _ in range(reps):
            v = float(np.asarray(fn()))
        dts.append((time.time() - t0) / reps)
    return v, float(np.median(dts))


v_k, dte_k = timed_scalar(
    lambda: e_k(sched.angles, hs_j, phis_j, keys, t_full))
print(f"echo kernel compile+first: {time.time() - t0:.0f} s")
e_x = make_sharded_echo(mesh, L=L, T=T, K=1, p=P, q=L // 2)
v_x, dte_x = timed_scalar(
    lambda: e_x(sched.angles, hs_j, phis_j, keys, t_full))
steps = 2 * T * NTRAJ
print(f"echo(T={T}) kernel   : {steps / dte_k:8.0f} steps/s "
      f"({dte_k*1e3:.0f} ms)  value {v_k:.4f}")
print(f"echo(T={T}) XLA      : {steps / dte_x:8.0f} steps/s "
      f"({dte_x*1e3:.0f} ms)  value {v_x:.4f}")
print(f"echo speedup         : {dte_x / dte_k:.2f}x")
print(f"echo |diff|          : {abs(v_k - v_x):.2e}")
assert abs(v_k - v_x) < 5e-4, (v_k, v_x)

# sweep-level: t = 1..T (the shape every forward+echo study runs);
# active steps = sum(2t) = T(T+1), padding steps are the no-op branch
t0 = time.time()
for t in range(1, T + 1):
    v = float(np.asarray(e_k(sched.angles, hs_j, phis_j, keys,
                             jnp.asarray(t))))
dt_sweep = time.time() - t0
print(f"echo sweep t=1..{T}  : {T * (T + 1) * NTRAJ / dt_sweep:8.0f} "
      f"active steps/s ({dt_sweep:.1f} s)")
