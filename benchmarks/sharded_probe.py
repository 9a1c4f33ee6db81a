"""TPU timing: sharded sigma-frame engine on a (1,1) mesh vs the unsharded
sigma engine — the shard_map wrapper + degenerate collectives should cost
approximately nothing on one chip (VERDICT r1 next-item 3).

Values must also agree trajectory-for-trajectory (same presampled keys).
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
from dtc_tpu.parallel.mesh import make_mesh
from dtc_tpu.parallel.sharded import make_sharded_autocorr_forward

L, T, P, NTRAJ = 20, 50, 0.05, 32
hs, phis = generate_disorder(L, 1, seed=7)
hs_j = jnp.asarray(hs[0, :L])
phis_j = jnp.asarray(phis[0, : L - 1])
sched = build_kick_schedule("x", 0.97, T)
keys = jax.random.split(jax.random.PRNGKey(3), NTRAJ)
af = (1 - P) ** 6


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
f_sh = make_sharded_autocorr_forward(mesh, L=L, T=T, K=1, p=P, q=L // 2)
a_sh, dt_sh = timed(lambda: f_sh(sched.angles, hs_j, phis_j, keys))

a_un, dt_un = timed(lambda: np.asarray(sigma_forward_batch(
    hs_j[None], phis_j[None], sched.angles, keys[None], L=L, T=T, K=1, p=P,
    q=L // 2, initial_state="vacuum", dtype_name="complex64",
    ancilla_factor=af, has_y=False)).mean(axis=1)[0])

err = float(np.max(np.abs(a_sh - a_un)))
rate_sh = T * NTRAJ / dt_sh
rate_un = T * NTRAJ / dt_un
print(f"sharded (1,1) mesh : {rate_sh:8.0f} traj-cyc/s ({dt_sh*1e3:.0f} ms)")
print(f"unsharded sigma    : {rate_un:8.0f} traj-cyc/s ({dt_un*1e3:.0f} ms)")
print(f"wrapper overhead   : {dt_sh / dt_un - 1:+.1%}")
print(f"max |diff|         : {err:.2e}")
assert err < 5e-5, err
