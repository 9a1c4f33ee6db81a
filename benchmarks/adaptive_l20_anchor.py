"""External adaptive-g anchor at the headline scale (VERDICT r3 next #4).

Two legs, both against the reference's shipped L=20 controlled-g dataset
(/root/reference/controlled-autocorr_data_L20/autocorr_data_vacuum_realtime_
adaptive_optimization_iter5_g0.84_L20_inst1_..._target1.0_gain0.01.csv,
single instance, 1024 Aer shots, produced by
autocorr-delta-a-single-qiskit-fast-controlled-g.py:311-338,423-532):

1. REPLAY — feed the shipped g_history_inst1 column back in as a (T,)
   per-cycle g vector (the exact g the reference's feedback loop applied at
   every cycle) and run the real L=20 trajectory driver forward + echo.
   Physics parity is then deterministic up to shot + ensemble noise and
   independent of any feedback law. The same replay is also checked for the
   fixed-g standard columns (g=0.84 and g=0.97) shipped in the same file.

2. END-TO-END — run the BASELINE config-3 loops (L=20, target=1.0,
   5 optimizer iters; gain 0.01/0.05) on the kernel stepper
   (KernelAdaptiveStepper rides the per-cycle-schedule VMEM-resident
   kernels) and record wall-clock + loop sanity: g stays in bounds, echo
   decays from ~af, and the realized g-history drifts upward from g0=0.84
   toward the self-correcting regime like the reference's shipped history
   (0.84 -> ~0.95). The optimizer-mode leg ignores feedback_gain exactly
   like the reference (controlled-g.py:423-532 reads gain only for the
   filename in optimization mode), so the gain axis is exercised through
   the FEEDBACK-law legs (use_optimization=0, the linear law of the
   shipped L4 realtime_adaptive datasets) — gain 0.01 vs 0.05 there are
   genuinely different control trajectories.

Results -> benchmarks/parity_results.json under "adaptive_l20".
Usage: python benchmarks/adaptive_l20_anchor.py [NTRAJ] [LOOP_NTRAJ] [--loop-only]
  --loop-only skips the replay legs (leg 1) and merges the loop records
  into the existing adaptive_l20 entry.
"""

import json
import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import time

import numpy as np

from dtc_tpu.experiments.autocorr import run_autocorr
from dtc_tpu.io import csvio
from dtc_tpu.utils.config import SimConfig

REF = "/root/reference"
LOOP_ONLY = "--loop-only" in _sys.argv
_args = [a for a in _sys.argv[1:] if not a.startswith("--")]
NTRAJ = int(_args[0]) if _args else 2048
LOOP_NTRAJ = int(_args[1]) if len(_args) > 1 else 256
SIGMA_SHOT = 1.0 / np.sqrt(1024)

ref = csvio.read_columns(_os.path.join(
    REF, "controlled-autocorr_data_L20",
    "autocorr_data_vacuum_realtime_adaptive_optimization_iter5_g0.84_L20_"
    "inst1_randomphi1_delta0.0_amplitude1.0_noise0.05_usenoise1_target1.0_"
    "gain0.01.csv"))
g_hist = np.asarray(ref["g_history_inst1"], dtype=float)
n_pts = len(g_hist)

sig_ens = 0.75 / np.sqrt(NTRAJ)
band = 3.5 * np.sqrt(SIGMA_SHOT**2 + sig_ens**2)
bias_band = 3.0 * np.sqrt(SIGMA_SHOT**2 + sig_ens**2) / np.sqrt(n_pts) + 0.01

results = {"n_traj": NTRAJ}
ok = True

LEGS = [
    ("replay_ghist", np.concatenate([g_hist, g_hist[-1:]]),
     "forward_adaptive_inst1", "echo_adaptive_inst1"),
    ("fixed_g84", 0.84, "forward_standard_g84_inst1",
     "echo_standard_g84_inst1"),
    ("fixed_g97", 0.97, "forward_standard_g97_inst1",
     "echo_standard_g97_inst1"),
]
for name, g, col_f, col_e in (() if LOOP_ONLY else LEGS):
    ref_f = np.asarray(ref[col_f], dtype=float)
    ref_e = np.asarray(ref[col_e], dtype=float)
    cfg = SimConfig(L=20, g=g, inst=1, tf=n_pts + 1, noise_prob=0.05,
                    use_noise=1, n_trajectories=NTRAJ, seed=11)
    t0 = time.time()
    r = run_autocorr(cfg, disorder_dir=REF, write=False)
    dt = time.time() - t0
    # reference row t = t+1 applied cycles (controlled-g.py:311-338)
    dev_f = r["av_autocorr"][1:n_pts + 1] - ref_f
    dev_e = r["av_autocorr_echo"][1:n_pts + 1] - ref_e
    row = {
        "max_dev_forward": float(np.max(np.abs(dev_f))),
        "max_dev_echo": float(np.max(np.abs(dev_e))),
        "bias_forward": float(np.mean(dev_f)),
        "bias_echo": float(np.mean(dev_e)),
        "band": float(band), "bias_band": float(bias_band),
        "seconds": round(dt, 1),
    }
    row["pass"] = bool(
        row["max_dev_forward"] < band and row["max_dev_echo"] < band
        and abs(row["bias_forward"]) < bias_band
        and abs(row["bias_echo"]) < bias_band)
    ok = ok and row["pass"]
    results[name] = row
    print(f"{name:13s}: fwd max|dev| {row['max_dev_forward']:.4f} "
          f"echo {row['max_dev_echo']:.4f} (band {band:.4f}) "
          f"bias {row['bias_forward']:+.4f}/{row['bias_echo']:+.4f} "
          f"(band {bias_band:.4f}) {dt:.0f}s pass={row['pass']}", flush=True)

# ---------------------------------------------------------------- leg 2
from dtc_tpu.experiments.adaptive import run_adaptive_realtime  # noqa: E402

# optimizer-mode loop (gain unused, exactly like the reference's
# optimization mode) + the two FEEDBACK-law loops where gain matters
LOOP_LEGS = [("loop_opt_iter5", 1, 0.01), ("loop_gain0.01", 0, 0.01),
             ("loop_gain0.05", 0, 0.05)]
for name, use_opt, gain in LOOP_LEGS:
    cfg = SimConfig(L=20, g=0.84, inst=1, tf=n_pts, noise_prob=0.05,
                    use_noise=1, n_trajectories=LOOP_NTRAJ, seed=11,
                    target_echo=1.0, feedback_gain=gain,
                    use_optimization=use_opt, optimization_iterations=5)
    t0 = time.time()
    r = run_adaptive_realtime(cfg, disorder_dir=REF, write=False)
    dt = time.time() - t0
    gh = np.asarray(r["g_history"][0])
    ech = np.asarray(r["echo"][0])
    af = (1 - 0.05) ** 6
    common = bool(np.all((gh >= cfg.g_min) & (gh <= cfg.g_max))
                  and ech[0] > 0.5 * af and ech[-1] < ech[0])
    if use_opt:
        # optimizer jumps straight into the self-correcting regime like
        # the reference's shipped history (0.84 -> ~0.95 late mean)
        sane = common and bool(gh[5:].mean() > 0.86)
    else:
        # linear law: echo < target always, so g must rise monotonically
        # from g0 at a gain-proportional pace until clipped
        sane = common and bool(np.all(np.diff(gh) >= -1e-12)
                               and gh[-1] > gh[0] + 100 * gain * 0.003)
    ok = ok and sane
    results[name] = {
        "n_traj": LOOP_NTRAJ, "tf": n_pts, "use_optimization": use_opt,
        "gain": gain, "seconds": round(dt, 1),
        "g_final": float(gh[-1]), "g_mean_late": float(gh[5:].mean()),
        "echo_first": float(ech[0]), "echo_last": float(ech[-1]),
        "sane": sane,
    }
    print(f"{name}: {dt:.0f}s  g: 0.84 -> {gh[-1]:.3f} "
          f"(late mean {gh[5:].mean():.3f})  echo {ech[0]:.3f} -> "
          f"{ech[-1]:.3f}  sane={sane}", flush=True)

path = _os.path.join(_os.path.dirname(_os.path.abspath(__file__)),
                     "parity_results.json")
blob = json.load(open(path)) if _os.path.exists(path) else {}
blob.setdefault("adaptive_l20", {}).update(results)
# serialize FIRST: json.dump(…, open(path, "w")) truncates the artifact
# before encoding, so a non-serializable value (e.g. a stray np.bool_)
# would destroy every previously recorded anchor in the file
text = json.dumps(blob, indent=1)
with open(path, "w") as f:
    f.write(text)
print(f"recorded -> {path} adaptive_l20  (all pass: {ok})")
assert ok
