"""TPU timing: carried-state vs kernel-batcher adaptive stepper at L=20.

Measures one instance of the real-time adaptive-g loop (optimizer mode,
golden-section) for both stepper implementations on identical configs.
The kernel stepper re-evolves from t=0 through the accumulated schedule on
the VMEM-resident per-cycle-schedule kernels; the carried stepper advances
states cycle-by-cycle on the deopted in-scan XLA path (VERDICT r1 weak #6).
"""

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import time

import numpy as np

from dtc_tpu.io.disorder import generate_disorder
from dtc_tpu.utils.config import SimConfig

L, TF, NTRAJ = 20, 12, 32
CFG = SimConfig(L=L, tf=TF, inst=1, noise_prob=0.05, use_noise=1,
                n_trajectories=NTRAJ, use_optimization=1,
                optimization_iterations=4, seed=3)


def run_mode(mode):
    _os.environ["DTC_TPU_ADAPTIVE"] = mode
    from dtc_tpu.experiments.adaptive import run_adaptive_realtime

    hs, phis = generate_disorder(L, 1, seed=7)
    t0 = time.time()
    r = run_adaptive_realtime(CFG, hs, phis, write=False,
                              optimizer_method="golden")
    dt = time.time() - t0
    g = np.asarray(r["g_history"][0])
    e = np.asarray(r["echo"][0])
    assert np.all(np.isfinite(e)) and np.all(np.abs(e) <= 1.01)
    assert np.all((g >= CFG.g_min - 1e-9) & (g <= CFG.g_max + 1e-9))
    print(f"{mode:8s}: {dt:7.1f}s  g[:4]={g[:4].round(4)} "
          f"echo[:4]={e[:4].round(4)}", flush=True)
    return dt


if __name__ == "__main__":
    dt_kernel = run_mode("kernel")
    dt_carried = run_mode("carried")
    print(f"speedup: {dt_carried / dt_kernel:.1f}x "
          f"(carried {dt_carried:.0f}s / kernel {dt_kernel:.0f}s)")
