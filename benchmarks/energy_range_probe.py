"""TPU: observables-kernel rates + E(0) exactness across its full range
(17 <= L <= 23) — breadth companion to the L=20 anchor
(energy_l20_anchor.py). Each L: compile, one validated run (E(0) must
equal sum(h)+sum(phi) for vacuum — measured exact to ~1e-5 at every L —
and every Z_q(0) = 1), then a timed group.

Records parity_results.json "energy_range".
Usage: python benchmarks/energy_range_probe.py [T] [NTRAJ]
"""

import json
import os as _os
import sys as _sys
import time

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from dtc_tpu.io.disorder import generate_disorder
from dtc_tpu.models.drives import build_kick_schedule
from dtc_tpu.models.hamiltonian import hamiltonian_terms
from dtc_tpu.ops.pallas_observables import observables_forward_batch

T = int(_sys.argv[1]) if len(_sys.argv) > 1 else 20
NTRAJ = int(_sys.argv[2]) if len(_sys.argv) > 2 else 8
rows = {}
for L in range(17, 24):
    hs, phis = generate_disorder(L, 1, seed=11)
    terms = hamiltonian_terms(L, 0.97, hs[0], phis[0], "full")
    hsj = jnp.asarray(hs[:, :L])
    phj = jnp.asarray(phis[:, : L - 1])
    keys = jax.random.split(jax.random.PRNGKey(3), NTRAJ)[None]
    sched = build_kick_schedule("x", 0.97, T)

    def run():
        return observables_forward_batch(
            hsj, phj, jnp.asarray(terms.hs)[None],
            jnp.asarray(terms.phis)[None], sched.angles, keys,
            L=L, T=T, K=1, p=0.1)

    t0 = time.time()
    e_d, x_s, zs = (np.asarray(a) for a in run())
    compile_s = time.time() - t0
    e0 = float(np.sum(hs[0, :L]) + np.sum(phis[0, : L - 1]))
    de0 = float(np.max(np.abs(e_d[0, :, 0] - e0)))
    dz0 = float(np.max(np.abs(zs[0, :, 0] - 1.0)))
    assert de0 < 1e-2 and dz0 < 1e-4 and np.all(np.isfinite(e_d)), (L, de0)
    dts = []
    for _ in range(3):
        t0 = time.time()
        e_d = np.asarray(run()[0])
        dts.append(time.time() - t0)
    rate = T * NTRAJ / float(np.median(dts))
    rows[f"L{L}"] = {"traj_cyc_s": round(rate, 1),
                     "compile_s": round(compile_s, 1),
                     "dE0": de0, "dZ0": dz0}
    print(f"L={L}: {rate:8.1f} traj-cyc/s  (compile {compile_s:.0f}s, "
          f"dE0 {de0:.1e})", flush=True)

path = _os.path.join(_os.path.dirname(_os.path.abspath(__file__)),
                     "parity_results.json")
blob = json.load(open(path)) if _os.path.exists(path) else {}
blob["energy_range"] = {"T": T, "n_traj": NTRAJ, "rows": rows}
text = json.dumps(blob, indent=1)  # serialize FIRST: a failed encode
# must not truncate previously recorded anchors
with open(path, "w") as _f:
    _f.write(text)
print(f"recorded -> {path} energy_range", flush=True)
