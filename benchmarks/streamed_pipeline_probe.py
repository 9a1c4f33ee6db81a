"""TPU: 4-slot prefetch-ring streamed forward — parity + DMA-gap timing.

Round-1 baseline (2-slot, load-after-compute): L=22 871 traj-cyc/s
(1.15 ms/cycle vs the 0.4 ms DMA bound), L=24 346 (at roofline).
Roadmap #1: deeper prefetch should close the L=22 gap.

Usage: python benchmarks/streamed_pipeline_probe.py [L ...]
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
from dtc_tpu.ops.pallas_streamed import streamed_forward_batch

Ls = [int(a) for a in _sys.argv[1:]] or [22]
T, P = 50, 0.05

for L in Ls:
    q = L // 2 if L // 2 < 14 else 11
    n_traj = max(2, 1 << max(0, 25 - L))
    hs_np, phis_np = generate_disorder(L, 1, seed=7)
    hs = jnp.asarray(hs_np[:, :L])
    phis = jnp.asarray(phis_np[:, : L - 1])
    sched = build_kick_schedule("x", 0.97, T)
    keys = jax.random.split(jax.random.PRNGKey(3), n_traj)[None]

    print(f"L={L} ({n_traj} traj): compiling...", flush=True)
    t0 = time.time()
    r = np.asarray(streamed_forward_batch(hs, phis, sched.angles, keys,
                                          L=L, T=T, p=P, q=q))
    print(f"  first call: {time.time() - t0:.0f}s", flush=True)
    assert np.all(np.isfinite(r)) and np.max(np.abs(r)) <= 1 + 1e-3

    # parity vs the sigma engine (identical presampling); the sigma
    # reference holds the full (traj, 2^L) complex64 batch, so cap it at
    # one trajectory for L >= 28 (2 traj at L=29 is ~8 GB + temporaries
    # on a 16 GB chip)
    k2 = keys[:, :1] if L >= 28 else keys[:, :2]
    r2 = np.asarray(streamed_forward_batch(hs, phis, sched.angles, k2,
                                           L=L, T=T, p=P, q=q))
    s2 = np.asarray(sigma_forward_batch(
        hs, phis, sched.angles, k2, L=L, T=T, K=1, p=P, q=q,
        initial_state="vacuum", dtype_name="complex64", ancilla_factor=1.0,
        has_y=False))
    err = float(np.max(np.abs(r2 - s2)))
    print(f"  parity vs sigma: {err:.2e}", flush=True)
    assert err < 5e-4, err

    dts = []
    for _ in range(3):
        t0 = time.time()
        r = np.asarray(streamed_forward_batch(hs, phis, sched.angles, keys,
                                              L=L, T=T, p=P, q=q))
        dts.append(time.time() - t0)
    assert np.all(np.isfinite(r)) and np.max(np.abs(r)) <= 1 + 1e-3
    dt = float(np.median(dts))
    rate = n_traj * T / dt
    ms_per_cycle = dt / (n_traj * T) * 1e3
    # per-cycle HBM traffic: 2 passes x read+write x planar state
    gb_per_cycle = 4 * (1 << L) * 8 / 1e9
    print(f"  {rate:.0f} traj-cyc/s  ({ms_per_cycle:.2f} ms/cycle; "
          f"{gb_per_cycle / (ms_per_cycle / 1e3):.0f} GB/s effective)",
          flush=True)
