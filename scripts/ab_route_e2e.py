"""Interleaved e2e A/B of window routing (onehot vs prefix) on TPU.

The per-class profile numbers for this choice inverted between
sessions (0184488 measured prefix 402.6 vs onehot 551.6 ns/chunk;
the next day the same script gave onehot 407-417 vs prefix 559-640).
Class-level timings on the tunnel sit in the noisy sub-30 us regime,
so this arbiter times the FULL mixed_large SpMV (~0.15 ms scale,
reliable to ~±10%) under each route, alternating arms A,B,A,B,... in
one process so slow drift in tunnel/chip state cancels.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np  # noqa: E402

from tilespmv_tpu.io import generate  # noqa: E402
import tilespmv_tpu as tsp  # noqa: E402
from tilespmv_tpu.ops.pallas import lane_plan  # noqa: E402
from tilespmv_tpu.utils.profiling import _timed  # noqa: E402

name = sys.argv[1] if len(sys.argv) > 1 else "mixed_large"
rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 4
csr = generate.get_matrix(name)
tm = tsp.tile_create(csr)
x = ((np.arange(csr.n) % 10) / 4.0).astype(np.float32)
ref = csr.matvec(x.astype(np.float64))
nrm = np.max(np.abs(ref))

ops = {}
for route in ("onehot", "prefix"):
    lane_plan.DENSE_ROUTE = route
    op = tsp.TileSpMV(tm)
    y = np.asarray(op(x))
    err = np.max(np.abs(y - ref)) / nrm
    print(f"{route}: rel_err={err:.3e} "
          f"{'PASS' if err < 1e-3 else 'FAIL'}", flush=True)
    ops[route] = op

import functools  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from tilespmv_tpu.ops.spmv import spmv  # noqa: E402

xj = jnp.asarray(x, dtype=np.float32)
fn = functools.partial(spmv, backend="pallas")
times = {"onehot": [], "prefix": []}
for r in range(rounds):
    for route in (("onehot", "prefix") if r % 2 == 0 else
                  ("prefix", "onehot")):
        # plan + x are jit ARGUMENTS (no constant embedding); _timed
        # re-traces fresh partials so the route flip can't hit a stale
        # cache (CLAUDE.md round-4 gotcha)
        dt = _timed(fn, ops[route].plan, xj)
        times[route].append(dt * 1e6)
        print(f"  round {r} {route}: {dt*1e6:.1f} us", flush=True)

for route, ts in times.items():
    a = np.asarray(ts)
    print(f"{route}: median {np.median(a):.1f} us  "
          f"min {a.min():.1f}  max {a.max():.1f}", flush=True)
