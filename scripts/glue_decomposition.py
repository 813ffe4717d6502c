"""Decompose the small-matrix glue floor (round-4 verdict weak #6 tail).

dense_blocks_medium measures 7.8 us/SpMV under the chained harness vs
the 4.5 us target; the round-5 notes attribute the gap to "real glue
(x panel transpose + dispatch + combine)" without a split. This script
measures the split on-chip with the same chained difference method
(everything inside one fori_loop, so dispatch cancels):

  loop   — x perturbation + checksum only          (loop overhead)
  panels — loop + x_to_panels(x)                   (+ panel transpose)
  kern   — loop + class chain on fixed panels      (+ kernels, no glue)
  kernT  — kern + y2dT.T.reshape + slice           (+ y assembly)
  full   — the real spmv (panels + kern + assembly + residual)

Usage: python scripts/glue_decomposition.py [matrix] [--iters N]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from tilespmv_tpu.io import generate  # noqa: E402
from tilespmv_tpu import tile_create, TileSpMV  # noqa: E402
from tilespmv_tpu.ops.pallas import kernels as K  # noqa: E402
from tilespmv_tpu.ops.spmv import spmv  # noqa: E402

ap = argparse.ArgumentParser()
ap.add_argument("matrix", nargs="?", default="dense_blocks_medium")
ap.add_argument("--iters", type=int, default=4000)
ap.add_argument("--reps", type=int, default=3)
args = ap.parse_args()

csr = generate.get_matrix(args.matrix)
op = TileSpMV(tile_create(csr))
plan = op.plan
print(f"{args.matrix}: {plan.summary()}", flush=True)
x = jnp.asarray(((np.arange(csr.n) % 10) / 4.0).astype(np.float32))
nw = plan.n_windows


def classes(p, xp, acc=None):
    if p.dense is not None:
        acc = K.dense_class_call(p.dense, xp, nw, prev=acc)
    if p.band is not None:
        acc = K.band_class_call(p.band, xp, nw, prev=acc)
    for s in p.sparses:
        acc = K.sparse_class_call(s, xp, nw, prev=acc)
    return acc


def body_loop(p, xc):
    return xc  # carrier only


def body_panels(p, xc):
    return K.x_to_panels(p, xc).reshape(-1)


def body_kern(p, xc, xp0):
    # fixed panels + a data-dependent perturbation so the loop can't hoist
    acc = classes(p, xp0 + xc[0] * 1e-30)
    return acc.reshape(-1)


def body_kernT(p, xc, xp0):
    acc = classes(p, xp0 + xc[0] * 1e-30)
    return acc.T.reshape(-1)[: p.m]


def body_full(p, xc):
    return spmv(p, xc, backend="pallas")


def make_loop(body, *extra):
    @jax.jit
    def run(p, xv, n):
        def step(_, carry):
            xc, a = carry
            y = body(p, xc, *extra)
            s = jnp.sum(y)
            return xc + s * 1e-30, a + s
        _, a = jax.lax.fori_loop(0, n, step,
                                 (xv, jnp.zeros((), xv.dtype)))
        return a
    return run


def timeit(run, n):
    t0 = time.perf_counter()
    float(run(plan, x, n))
    return time.perf_counter() - t0


xp0 = K.x_to_panels(plan, x)
variants = {
    "loop": make_loop(body_loop),
    "panels": make_loop(body_panels),
    "kern": make_loop(body_kern, xp0),
    "kernT": make_loop(body_kernT, xp0),
    "full": make_loop(body_full),
}
N = args.iters
res = {}
for rep in range(args.reps):
    for name, run in variants.items():
        timeit(run, 16)  # compile + warm
        t_small = timeit(run, N // 10)
        t_big = timeit(run, N)
        us = (t_big - t_small) / (N - N // 10) * 1e6
        res.setdefault(name, []).append(us)
        print(f"rep {rep} {name}: {us:.3f} us/iter", flush=True)

med = {k: float(np.median(v)) for k, v in res.items()}
print("\nmedians (us/iter):", {k: round(v, 3) for k, v in med.items()})
print(f"panel transpose : {med['panels'] - med['loop']:.3f}")
print(f"kernels         : {med['kern'] - med['loop']:.3f}")
print(f"y assembly      : {med['kernT'] - med['kern']:.3f}")
print(f"full - (sum)    : "
      f"{med['full'] - med['kernT'] - (med['panels'] - med['loop']):.3f}"
      f"  (residual + slice + unshared glue)")
print(f"full            : {med['full']:.3f}")
