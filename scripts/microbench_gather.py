"""Micro-ablation: lane-gather cost vs width inside one Pallas kernel.

Times a kernel that issues NG independent lane gathers of (R, 128) for
R in {8, 16, 32, 64}, holding total gathered rows constant (NG*R = 512
rows per grid step), plus the same with a dependent subtract — the
stream engine's scatter-round inner loop shape. Difference timing over
grid sizes; reports ns per gathered (8,128)-row-group so the widths are
directly comparable.
"""
import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROWS_PER_STEP = 512
LANES = 128


def make_kernel(r, ng):
    def kernel(src_ref, idx_ref, out_ref):
        acc = jnp.zeros((8, LANES), jnp.float32)
        for g in range(ng):
            u = jnp.take_along_axis(src_ref[g * r:(g + 1) * r],
                                    idx_ref[g * r:(g + 1) * r], axis=1)
            # fold to (8,128) so every gather is consumed
            for h in range(r // 8):
                acc = acc + u[h * 8:(h + 1) * 8]
        out_ref[...] = acc
    return kernel


def run(r, nsteps):
    ng = ROWS_PER_STEP // r
    src = jnp.asarray(
        np.random.rand(ROWS_PER_STEP, LANES).astype(np.float32))
    idx = jnp.asarray(
        np.random.randint(0, LANES, (ROWS_PER_STEP, LANES)).astype(
            np.int8))

    f = pl.pallas_call(
        make_kernel(r, ng),
        grid=(nsteps,),
        in_specs=[pl.BlockSpec((ROWS_PER_STEP, LANES), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec((8, LANES), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, LANES), jnp.float32),
    )
    return f(src, idx)


def timeit(r):
    k1, k2 = 200, 3400
    f1 = jax.jit(functools.partial(run, r, k1))
    f2 = jax.jit(functools.partial(run, r, k2))
    for f in (f1, f2):
        np.asarray(f())
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        np.asarray(f1())
        ta = time.perf_counter() - t0
        t0 = time.perf_counter()
        np.asarray(f2())
        tb = time.perf_counter() - t0
        ts.append((tb - ta) / (k2 - k1))
    dt = float(np.median(ts))
    ng = ROWS_PER_STEP // r
    print(f"R={r:3d}: {dt*1e9:8.1f} ns/step, {dt*1e9/ng:7.2f} ns/gather, "
          f"{dt*1e9/(ROWS_PER_STEP//8):6.2f} ns per 8-row group")


if __name__ == "__main__":
    for r in (8, 16, 32, 64):
        timeit(r)
