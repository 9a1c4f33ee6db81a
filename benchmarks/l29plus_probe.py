"""TPU: single-chip noisy trajectories PAST the streamed-kernel envelope.

The streamed kernel stops at L=28 (the L=29 pass-B slab geometry
reproducibly kills the Mosaic compile helper — documented negative result,
ops/pallas_streamed.py). Beyond it the XLA sigma-frame engine is the
single-chip path (BASELINE config 5's L=32 runs it sharded; this probe
records what ONE chip delivers at L=29/30 so the multi-chip scaling claim
has a measured single-chip anchor).

Validates A(0) = (1-p)^6 and the noiseless echo invariant at L=29, then
times forward cycles. Memory: complex64 state = 2^L * 8 B (4 GB at L=29,
8 GB at L=30); one trajectory at a time.
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

T, P, q = 10, 0.05, 11
AF = (1 - P) ** 6


def run(L, reps=3, groups=3):
    hs_np, phis_np = generate_disorder(L, 1, seed=7)
    hs = jnp.asarray(hs_np[:, :L])
    phis = jnp.asarray(phis_np[:, : L - 1])
    sched = build_kick_schedule("x", 0.97, T)
    keys = jax.random.split(jax.random.PRNGKey(3), 1)[None]

    def fwd():
        return np.asarray(sigma_forward_batch(
            hs, phis, sched.angles, keys, L=L, T=T, K=1, p=P, q=q,
            initial_state="vacuum", dtype_name="complex64",
            ancilla_factor=AF, has_y=False))

    print(f"L={L}: compiling + running sigma forward...", flush=True)
    t0 = time.time()
    r = fwd()
    print(f"  first call: {time.time() - t0:.0f}s", flush=True)
    assert np.all(np.isfinite(r)) and np.max(np.abs(r)) <= 1 + 1e-3
    assert abs(r[0, 0, 0] - AF) < 1e-5, r[0, 0, 0]  # A(0) = (1-p)^6

    dts = []
    for _ in range(groups):
        t0 = time.time()
        for _ in range(reps):
            r = fwd()
        dts.append((time.time() - t0) / reps)
    dt = float(np.median(dts))
    print(f"  sigma: {T / dt:.1f} traj-cyc/s ({dt:.2f}s/run, median of "
          f"{groups} groups)  A(t<4)={r[0, 0, :4].round(5)}", flush=True)
    return T / dt


if __name__ == "__main__":
    rate29 = run(29)
    try:
        rate30 = run(30)
    except Exception as e:  # HBM capacity depends on the chip generation
        print(f"L=30 failed ({type(e).__name__}): {e}", flush=True)
        rate30 = None
    print({"L29_traj_cyc_s": round(rate29, 1),
           "L30_traj_cyc_s": None if rate30 is None else round(rate30, 1)},
          flush=True)
