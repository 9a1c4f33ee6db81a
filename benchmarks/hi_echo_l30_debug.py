"""Diagnose the L=30 streamed-hi ECHO zero-output failure (round 4).

Observed: at L=30 (R2=512, default geom (16,128), alt (8,256)) the echo
kernel returns all-zero A0 for noisy AND noiseless runs, while (a) the
L=29 echo (R2=256) is healthy and (b) the L=30 FORWARD kernel records
plausible rates. This probe bisects with the wrapper's debug_state hook:

  state norm ~ 1, a_out zero  -> measurement/accumulator path at R2=512
  state norm 0                -> a zeroing DMA/init path (e.g. a 2^32-byte
                                 plane-stride wrap: plane 1's base offset
                                 at L=30 is exactly 2^32 bytes)
  state norm 2 / garbage      -> aliasing between planes

Also re-runs L=29 with debug_state for a healthy baseline.

Usage: python benchmarks/hi_echo_l30_debug.py [L]
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp

from dtc_tpu.io.disorder import generate_disorder
from dtc_tpu.models.drives import build_kick_schedule
from dtc_tpu.ops.pallas_streamed_hi import streamed_hi_echo_batch

L = int(_sys.argv[1]) if len(_sys.argv) > 1 else 30
T = 2
hs, phis = generate_disorder(L, 1, seed=7)
hs_j = jnp.asarray(hs[:, :L])
phis_j = jnp.asarray(phis[:, : L - 1])
sched = build_kick_schedule("x", 0.97, T)
keys = jax.random.split(jax.random.PRNGKey(3), 1)[None]
ts = jnp.asarray([1])

val, (st_re, st_im) = streamed_hi_echo_batch(
    hs_j, phis_j, sched.angles, keys, ts, L=L, T=T, p=0.0, q=11,
    ancilla_factor=1.0, debug_state=True)
val = np.asarray(val)
print(f"L={L}: A0(1) = {val}", flush=True)
# plane norms via device-side reduction (the planes are 4 GB each at
# L=30 — never pull them to host whole)
n_re = float(jnp.sum(st_re * st_re))
n_im = float(jnp.sum(st_im * st_im))
print(f"  |re|^2 = {n_re:.6f}  |im|^2 = {n_im:.6f} "
      f"(norm {n_re + n_im:.6f}; healthy echo end-state ~ 1.0)", flush=True)
# where is the weight? row-block profile of the real plane
prof = np.asarray(jnp.sum(st_re * st_re, axis=(1, 2)))
nz = np.nonzero(prof > 1e-9)[0]
print(f"  re-plane nonzero R2 rows: {nz[:8]}..{nz[-8:] if len(nz) else ''} "
      f"({len(nz)} rows)", flush=True)
amp0 = float(st_re[0, 0, 0])
print(f"  st_re[0,0,0] (b0 amplitude if echo returned) = {amp0:.6f}",
      flush=True)
