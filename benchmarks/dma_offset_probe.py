"""Minimal repro for the suspected 2^32-byte DMA-offset wrap (round 4).

Theory: the L=30 streamed-hi state (2, 512, 128, 16384) f32 puts plane 1
at byte offset exactly 2^32; if Mosaic async-copy offsets wrap at u32,
every plane-1 window aliases plane 0 — consistent with the L=30 echo
returning all zeros while L=29 (plane stride 2^31) is healthy.

The probe allocates (2, R, 128, C) with per-(plane, row) constant values
value = plane * 1000 + row, DMAs single rows st.at[:, i] into VMEM (the
hi kernels' loadA pattern) and writes both planes' means per probed row.
Expected (i, 1000 + i); a wrap reads (i, i).

Usage: python benchmarks/dma_offset_probe.py [R]   (512 = 8.6 GB, 2^32
plane stride; 256 = healthy control at 2^31)
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

R = int(_sys.argv[1]) if len(_sys.argv) > 1 else 512
C = 16384
ROWS = [0, 1, R // 2, R - 1]


def _kernel(st_in, out_ref, st_hbm, slab, sems):
    del st_in
    arow = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
    alane = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
    apos = arow * 128 + alane
    acc = jnp.zeros((8, 128), jnp.float32)
    for k, i in enumerate(ROWS):
        cp = pltpu.make_async_copy(st_hbm.at[:, i], slab, sems.at[0])
        cp.start()
        cp.wait()
        acc = acc + jnp.where(apos == k, jnp.mean(slab[0]), 0.0)
        acc = acc + jnp.where(apos == 16 + k, jnp.mean(slab[1]), 0.0)
    out_ref[:, :] = acc


@functools.partial(jax.jit, static_argnames=())
def probe(state):
    out, _ = pl.pallas_call(
        _kernel,
        out_shape=[
            jax.ShapeDtypeStruct((8, 128), jnp.float32),
            jax.ShapeDtypeStruct((2, R, 128, C), jnp.float32),
        ],
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=[
            pl.BlockSpec((8, 128), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        input_output_aliases={0: 1},
        scratch_shapes=[
            pltpu.VMEM((2, 128, C), jnp.float32),
            pltpu.SemaphoreType.DMA((1,)),
        ],
    )(state)
    return out


def build_state():
    row = jnp.arange(R, dtype=jnp.float32)
    plane = jnp.asarray([0.0, 1000.0])
    vals = plane[:, None] + row[None, :]
    return jnp.broadcast_to(vals[:, :, None, None], (2, R, 128, C))


state = build_state()
out = np.asarray(probe(state))
print(f"R={R} (plane stride {R * 128 * C * 4 / 2**30:.2f} GiB)")
fails = 0
for k, i in enumerate(ROWS):
    p0 = out[0, k]
    p1 = out[0, 16 + k]
    ok = abs(p0 - i) < 1e-3 and abs(p1 - (1000 + i)) < 1e-3
    wrap = abs(p1 - i) < 1e-3
    fails += 0 if ok else 1
    print(f"  row {i:4d}: plane0 {p0:9.1f} (want {i}), plane1 {p1:9.1f} "
          f"(want {1000 + i})"
          f"{'  <-- WRAP: plane1 read plane0' if wrap else ''}"
          f"  {'OK' if ok else 'FAIL'}")
print("RESULT", "OK" if fails == 0 else f"FAIL({fails})")
