"""External parity at the HEADLINE scale: our L=20 trajectory engines vs the
reference's own shipped Aer data (VERDICT r2 missing #2).

The reference ships 1024-shot single-instance L=20 measurements for all four
static polarizations with the exact disorder inputs used to produce them
(/root/reference/autocorr_data_L20_polarization/autocorr_data_vacuum_g0.97_
L20_inst1_..._pol{x,y,xy,yx}_with_envelopes.csv + hs_L20.csv/phis_L20.csv,
g=0.97, p=0.05, tf=20, vacuum). This probe runs the engines that ACTUALLY
execute at L=20 on TPU — the blocked-plane resident kernel for x, the
blocked general (lab-frame) kernel for y/xy/yx — through the real driver
(experiments.autocorr.run_autocorr), forward AND echo, and tests every
point against the reference measurement within
3.5 * sqrt(sigma_shot^2 + sigma_ens^2), sigma_shot = 1/sqrt(1024), plus a
bias test on the mean deviation. Results are recorded into
benchmarks/parity_results.json under "l20_reference".

This converts the <=1e-6 BASELINE parity chain (oracle -> c128 sigma ->
kernels, all internal) into EXTERNAL evidence at the scale the headline
bench runs. Usage: python benchmarks/l20_reference_parity.py [NTRAJ]
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
NTRAJ = int(_sys.argv[1]) if len(_sys.argv) > 1 else 2048
# optional pol filter (e.g. `... 8192 yx` re-runs one leg at higher
# trajectory count and merges it into the recorded entry)
POLS = tuple(_sys.argv[2].split(",")) if len(_sys.argv) > 2 else (
    "x", "y", "xy", "yx")
SIGMA_SHOT = 1.0 / np.sqrt(1024)

results = {"n_traj": NTRAJ}
ok = True
for pol in POLS:
    ref = csvio.read_columns(_os.path.join(
        REF, "autocorr_data_L20_polarization",
        "autocorr_data_vacuum_g0.97_L20_inst1_randomphi1_delta0.0_"
        f"amplitude1.0_noise0.05_usenoise1_pol{pol}_with_envelopes.csv"))
    ref_f = np.asarray(ref["av_autocorr"], dtype=float)
    ref_e = np.asarray(ref["av_autocorr_echo"], dtype=float)
    T = len(ref_f)

    cfg = SimConfig(L=20, g=0.97, inst=1, tf=T, noise_prob=0.05, use_noise=1,
                    polarization=pol, n_trajectories=NTRAJ, seed=11)
    t0 = time.time()
    r = run_autocorr(cfg, disorder_dir=REF, write=False)
    dt = time.time() - t0

    # ensemble standard error from the spread of independent half-ensembles
    # is not available post-mean; bound it conservatively by 1/sqrt(NTRAJ)
    # (per-trajectory values are bounded by the ancilla factor ~0.735)
    sig_ens = 0.75 / np.sqrt(NTRAJ)
    band = 3.5 * np.sqrt(SIGMA_SHOT**2 + sig_ens**2)
    dev_f = r["av_autocorr"][:T] - ref_f
    dev_e = r["av_autocorr_echo"][:T] - ref_e
    bias_band = 3.0 * np.sqrt(SIGMA_SHOT**2 + sig_ens**2) / np.sqrt(T) + 0.01
    row = {
        "max_dev_forward": float(np.max(np.abs(dev_f))),
        "max_dev_echo": float(np.max(np.abs(dev_e))),
        "bias_forward": float(np.mean(dev_f)),
        "bias_echo": float(np.mean(dev_e)),
        "band": float(band),
        "bias_band": float(bias_band),
        "seconds": round(dt, 1),
    }
    passed = (row["max_dev_forward"] < band and row["max_dev_echo"] < band
              and abs(row["bias_forward"]) < bias_band
              and abs(row["bias_echo"]) < bias_band)
    row["pass"] = bool(passed)
    ok = ok and passed
    results[pol] = row
    print(f"pol {pol:3s}: fwd max|dev| {row['max_dev_forward']:.4f} "
          f"echo {row['max_dev_echo']:.4f} (band {band:.4f}) "
          f"bias f/e {row['bias_forward']:+.4f}/{row['bias_echo']:+.4f} "
          f"(band {bias_band:.4f}) {'OK' if passed else 'FAIL'} "
          f"[{dt:.0f} s]")

path = _os.path.join(_os.path.dirname(_os.path.abspath(__file__)),
                     "parity_results.json")
blob = json.load(open(path)) if _os.path.exists(path) else {}
if len(POLS) < 4 and isinstance(blob.get("l20_reference"), dict):
    # partial re-run: merge the re-measured legs into the recorded entry,
    # keeping the other pols' rows; note the per-leg trajectory count
    merged = dict(blob["l20_reference"])
    for pol in POLS:
        results[pol]["n_traj"] = NTRAJ
        merged[pol] = results[pol]
    blob["l20_reference"] = merged
else:
    blob["l20_reference"] = results
text = json.dumps(blob, indent=1)  # serialize FIRST: a failed
# encode must not truncate previously recorded anchors
with open(path, "w") as _f:
    _f.write(text)
print(f"recorded -> {path} l20_reference")
assert ok, results
