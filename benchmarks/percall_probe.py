"""Probe: can a python loop over a donated single-cycle jit dodge the
noisy-scan deopt (docs/PERFORMANCE.md: any per-cycle traced operand in a
scan body costs ~15-30x) for L > 21 where the resident kernel can't go?

Complex state passes BETWEEN jits (allowed on this backend); per-cycle
noise factors enter each call as plain inputs, so no call contains a
traced-operand loop at all.
"""

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from dtc_tpu.core.sigma_evolve import (
    forward_cycle_fac,
    presample_noise,
    sigma_forward_batch,
)
from dtc_tpu.core.statevector import initial_statevector
from dtc_tpu.io.disorder import generate_disorder
from dtc_tpu.models.drives import build_kick_schedule
from dtc_tpu.ops.diag import z_sign_mask, zz_z_phase_mask

L = int(sys.argv[1]) if len(sys.argv) > 1 else 22
T, p, K = 10, 0.05, 1
q = L // 2
hs_np, phis_np = generate_disorder(L, 1, seed=7)
h = jnp.asarray(hs_np[0, :L])
ph = jnp.asarray(phis_np[0, :L - 1])
sched = build_kick_schedule("x", 0.97, T)
key = jax.random.PRNGKey(5)
dtype = jnp.complex64


@jax.jit
def setup():
    psi0 = initial_statevector(L, "vacuum", dtype=dtype)
    d0 = zz_z_phase_mask(h, ph, L, dtype=dtype)
    exp_h = jnp.exp(1j * h.astype(jnp.float32)).astype(dtype)
    exp_p = jnp.exp(1j * ph.astype(jnp.float32)).astype(dtype)
    return psi0, d0, exp_h, exp_p


@jax.jit
def sample():
    xm, zm, sig_b, csum = presample_noise(key, p, T * K, L)
    return zm.reshape(T, K), sig_b.reshape(T, K), csum.reshape(T, K)[:, -1]


@jax.jit
def measure(st, sig0):
    zq = z_sign_mask(q, L)
    sq = jnp.where((sig0 >> q) & 1, -1.0, 1.0)
    return sq * jnp.real(jnp.vdot(st, zq * st))


@jax.jit
def one_cycle(st, pend_zm, pend_sig, ang, d0, exp_h, exp_p, zm, sig_b,
              sig_after):
    st, pend = forward_cycle_fac(
        st, (pend_zm, pend_sig), ang, d0, exp_h, exp_p,
        (zm, sig_b, sig_after), L=L, K=K, p=p, dtype=dtype, has_y=False)
    return st, pend[0], pend[1]


one_cycle_d = jax.jit(one_cycle, donate_argnums=(0,))


def run_percall():
    psi0, d0, exp_h, exp_p = setup()
    zm, sig_b, sig_after = sample()
    st = psi0 + 0.0
    pz = jnp.uint32(0)
    ps = jnp.uint32(0)
    outs = []
    for t in range(T):
        st, pz, ps = one_cycle_d(st, pz, ps, sched.angles[t], d0, exp_h,
                                 exp_p, zm[t], sig_b[t], sig_after[t])
    return float(np.asarray(measure(st, jnp.uint32(0))))


# warm both paths
v1 = run_percall()
keys = jax.random.split(key, 1)[None]
out = np.asarray(sigma_forward_batch(
    h[None], ph[None], sched.angles, keys, L=L, T=T, K=K, p=p, q=q,
    initial_state="vacuum", dtype_name="complex64", ancilla_factor=1.0,
    has_y=False))

t0 = time.time()
for _ in range(3):
    v1 = run_percall()
dt1 = (time.time() - t0) / 3
print(f"L={L} per-call loop: {dt1 * 1e3:.1f} ms for {T} cycles "
      f"({T / dt1:.0f} cyc/s)", flush=True)

t0 = time.time()
for _ in range(3):
    out = np.asarray(sigma_forward_batch(
        h[None], ph[None], sched.angles, keys, L=L, T=T, K=K, p=p, q=q,
        initial_state="vacuum", dtype_name="complex64", ancilla_factor=1.0,
        has_y=False))
dt2 = (time.time() - t0) / 3
print(f"L={L} in-scan sigma: {dt2 * 1e3:.1f} ms ({T / dt2:.0f} cyc/s)",
      flush=True)
