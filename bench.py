"""Headline benchmark: noisy Floquet cycles/sec at L=20 (BASELINE.json).

One cycle = RX kick layer (kron-grouped MXU matmuls) + sampled depolarizing
noise (sigma-frame: fused elementwise phase, no gather) + fused RZZ+RZ
diagonal, applied to a branch-pair trajectory state (the unit that yields one
interferometric autocorrelation sample). The trajectory ensemble is the
density-matrix-equivalent path at L=20 (exact DM is 16 TB dense; the
trajectory mean equals the DM expectation). Baseline target: >= 1000
cycles/sec on one chip.

Results are MATERIALIZED and validated every repetition (A(0) must equal
(1-p)^6 and all values must be finite/bounded) — this backend can fault
asynchronously, and an unchecked block_until_ready can time a failed run.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import subprocess
import sys
import time

# DTC_TPU_RESIDENT_NB=2 is +8% on this exact shape with bit-identical
# outputs (benchmarks/nb_probe.py), but its first-time Mosaic compile is
# minutes and UNBOUNDED under compile-server load (a 15+ min queue was
# measured; an abandoned probe compile then clogs the server for the very
# run that falls back) — so the bench stays on the ~5 s nb=1 compile
# unless the caller opts in explicitly after warming the shape.
# See docs/PERFORMANCE.md "Compile caching on the tunneled backend".

import jax
import jax.numpy as jnp
import numpy as np

from dtc_tpu.experiments.engine import _forward_batch
from dtc_tpu.io.disorder import generate_disorder
from dtc_tpu.models.drives import build_kick_schedule
from dtc_tpu.utils.profiling import effective_hbm_gbps


def run_case(L, T, p, n_traj, n_rep=3, n_groups=5, g=0.97):
    hs, phis = generate_disorder(L, 1, seed=0)
    sched = build_kick_schedule("x", g, T)
    hs_j = jnp.asarray(hs[:, :L])
    phis_j = jnp.asarray(phis[:, : L - 1])
    af = (1 - p) ** 6
    kw = dict(L=L, T=T, K=1, p=p, q=L // 2, initial_state="vacuum",
              dtype_name="complex64", ancilla_factor=af)

    def dispatch(seed):
        keys = jax.random.split(jax.random.PRNGKey(seed), n_traj)[None]
        return _forward_batch(hs_j, phis_j, sched.angles, keys, **kw)

    def check(a):
        assert np.isfinite(a).all(), "non-finite autocorrelations"
        assert np.all(np.abs(a) <= 1.0 + 1e-3), "unphysical |A|>1"
        assert abs(a[0, :, 0].mean() - af) < 1e-3, f"A(0) != (1-p)^6: {a[0,:,0].mean()}"

    check(np.asarray(dispatch(0)))  # compile + warmup + validate
    # median over timing groups: single-group readings on this chip swing
    # up to ~40% under transient co-tenant / compile-helper contention.
    # Within a group the reps are dispatched BEFORE the first result is
    # pulled: a synchronous asarray-per-rep loop exposes this tunneled
    # backend's ~9 ms per-call dispatch latency (benchmarks/percall_probe.py)
    # in every rep, which is launch overhead, not engine throughput. EVERY
    # rep is still materialized and validated — only the launches overlap.
    group_dts = []
    for gi in range(n_groups):
        t0 = time.perf_counter()
        handles = [dispatch(gi * n_rep + i + 1) for i in range(n_rep)]
        arrs = [np.asarray(h) for h in handles]
        group_dts.append((time.perf_counter() - t0) / n_rep)
        for a in arrs:
            check(a)
    dt = float(np.median(group_dts))
    return (T * n_traj) / dt, dt


# Measured DMA throughput of this chip's HBM<->VMEM path (median of
# in-kernel-repeated double-buffered copies, benchmarks/dma_probe.py).
# The VMEM-resident kernel's whole point is to beat this: its state never
# leaves VMEM, so its equivalent gate-apply bandwidth may exceed 1.0x.
DMA_ROOFLINE_GBPS = 326.0


def _wait_for_tpu(max_wait_s: float = 900.0, probe_timeout_s: float = 120.0):
    """Block (boundedly) until the tunneled TPU backend answers.

    The axon tunnel has transient outages during which backend init HANGS
    for tens of minutes before raising UNAVAILABLE (a ~25 min hang was
    observed) — so probe device discovery in a subprocess with a hard
    timeout, and only touch jax in THIS process once a probe has succeeded.
    Returns True when the backend answered; False on timeout (the bench then
    proceeds and fails loudly rather than silently hanging forever).
    """
    deadline = time.time() + max_wait_s
    attempt = 0
    while True:
        attempt += 1
        try:
            r = subprocess.run(
                [sys.executable, "-c",
                 "import jax; d = jax.devices(); "
                 "assert d and d[0].platform != 'cpu', d"],
                capture_output=True, timeout=probe_timeout_s)
            if r.returncode == 0:
                return True
        except subprocess.TimeoutExpired:
            pass
        if time.time() >= deadline:
            print(f"TPU backend unreachable after {attempt} probes "
                  f"({max_wait_s:.0f}s); proceeding anyway", file=sys.stderr)
            return False
        time.sleep(min(30.0, max(0.0, deadline - time.time())))


def main():
    import jax

    # An explicitly forced CPU platform (e.g. `python -m dtc_tpu --platform
    # cpu bench`) means there is no TPU to wait for — the probe subprocess
    # would otherwise retry default (TPU) discovery for the full window.
    if "cpu" not in str(jax.config.jax_platforms or ""):
        _wait_for_tpu()
    L, T, n_traj = 20, 50, 32
    cycles_per_sec, dt = run_case(L=L, T=T, p=0.05, n_traj=n_traj)
    hbm_gbps = effective_hbm_gbps(L, n_cycles=T, n_states=n_traj, seconds=dt)
    print(json.dumps({
        "metric": "noisy Floquet cycles/sec (L=20 trajectory ensemble, p=0.05, validated)",
        "value": round(cycles_per_sec, 1),
        "unit": "cycles/s",
        "vs_baseline": round(cycles_per_sec / 1000.0, 2),
        "gate_apply_gbps": round(hbm_gbps, 1),
        "dma_roofline_gbps": DMA_ROOFLINE_GBPS,
        "dma_roofline_frac": round(hbm_gbps / DMA_ROOFLINE_GBPS, 2),
    }))


if __name__ == "__main__":
    main()
