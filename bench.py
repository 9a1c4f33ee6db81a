"""Headline benchmark: noisy Floquet cycles/sec at L=20 (BASELINE.json).

One cycle = RX kick layer (kron-grouped MXU matmuls) + sampled depolarizing
Pauli-string layer + fused RZZ+RZ diagonal, applied to a branch-pair
trajectory state (the unit that yields one interferometric autocorrelation
sample). Baseline target: >= 1000 cycles/sec "density-matrix-equivalent" on
one chip — our trajectory ensemble is the DM-equivalent path at L=20 (exact
DM is 16 TB dense; the trajectory mean equals the DM expectation).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

import jax
import jax.numpy as jnp

from dtc_tpu.experiments.engine import _forward_batch
from dtc_tpu.io.disorder import generate_disorder
from dtc_tpu.models.drives import build_kick_schedule


def main():
    L, T, p, g = 20, 50, 0.05, 0.97
    n_traj = 64

    hs, phis = generate_disorder(L, 1, seed=0)
    sched = build_kick_schedule("x", g, T)
    hs_j = jnp.asarray(hs[:, :L])
    phis_j = jnp.asarray(phis[:, : L - 1])
    kw = dict(L=L, T=T, K=1, p=p, q=L // 2, initial_state="vacuum",
              dtype_name="complex64", ancilla_factor=(1 - p) ** 6)

    def run(seed):
        keys = jax.random.split(jax.random.PRNGKey(seed), n_traj)[None]
        return _forward_batch(hs_j, phis_j, sched.angles, keys, **kw)

    out = run(0)
    out.block_until_ready()  # compile + warmup

    n_rep = 5
    t0 = time.perf_counter()
    for i in range(n_rep):
        out = run(i + 1)
    out.block_until_ready()
    dt = (time.perf_counter() - t0) / n_rep

    cycles_per_sec = (T * n_traj) / dt
    print(json.dumps({
        "metric": "noisy Floquet cycles/sec (L=20 trajectory ensemble, p=0.05)",
        "value": round(cycles_per_sec, 1),
        "unit": "cycles/s",
        "vs_baseline": round(cycles_per_sec / 1000.0, 2),
    }))


if __name__ == "__main__":
    main()
