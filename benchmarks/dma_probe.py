"""Probe: manual HBM<->VMEM DMA on this backend (feasibility + GB/s).

Double-buffered row-slab sweep over a (R, 16384) f32 array living in HBM:
load slab -> multiply by 2 -> store slab. Validates make_async_copy both
directions and measures effective HBM bandwidth for the streamed-kernel
design (docs/PERFORMANCE.md: fast L >= 22 needs HBM-resident state).
"""

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

R = int(sys.argv[1]) if len(sys.argv) > 1 else 1024   # rows (64 KB each)
RS = 64                                               # slab rows
C = 16384


SWEEPS = 20


def kernel(x_hbm, y_hbm, slab, sems):
    n_slabs = R // RS

    def load(slot, i):
        return pltpu.make_async_copy(
            x_hbm.at[pl.ds(i * RS, RS)], slab.at[slot], sems.at[slot])

    def store(slot, i):
        return pltpu.make_async_copy(
            slab.at[slot], y_hbm.at[pl.ds(i * RS, RS)], sems.at[2 + slot])

    def body(i, _):
        slot = i % 2
        nxt = (i + 1) % 2
        load(slot, i).wait()
        slab[slot] = slab[slot] * 2.0
        store(slot, i).start()

        # before loading into the other slot, its previous store must have
        # drained (the load overwrites that slab)
        @pl.when(i + 1 < n_slabs)
        def _():
            @pl.when(i >= 1)
            def _():
                store(nxt, i - 1).wait()

            load(nxt, i + 1).start()

        return _

    def sweep(_, __):
        load(0, 0).start()
        jax.lax.fori_loop(0, n_slabs, body, None)
        store((n_slabs - 2) % 2, n_slabs - 2).wait()
        store((n_slabs - 1) % 2, n_slabs - 1).wait()
        return __

    jax.lax.fori_loop(0, SWEEPS, sweep, None)


@jax.jit
def run(x):
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((R, C), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        scratch_shapes=[
            pltpu.VMEM((2, RS, C), jnp.float32),
            pltpu.SemaphoreType.DMA((4,)),
        ],
    )(x)


x = jnp.arange(R * C, dtype=jnp.float32).reshape(R, C) / (R * C)
y = np.asarray(run(x))
np.testing.assert_allclose(y, np.asarray(x) * 2.0, rtol=1e-6)
print("DMA roundtrip OK", flush=True)

t0 = time.time()
for _ in range(10):
    y = run(x)
y.block_until_ready()
dt = (time.time() - t0) / 10
gb = SWEEPS * 2 * R * C * 4 / 1e9
print(f"slab sweep: {dt * 1e3:.2f} ms -> {gb / dt:.0f} GB/s effective "
      f"({R * C * 4 / 1e6:.0f} MB array)", flush=True)
