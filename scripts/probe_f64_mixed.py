"""Stage-timed probe of the mixed_large f64 path (bench.py's f64 row
timed out at 17+ min on the tunnel — find which stage eats it).

Usage (TPU):  PYTHONPATH=/root/repo:/root/.axon_site \
                  python scripts/probe_f64_mixed.py [name]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
import numpy as np

from tilespmv_tpu.core.convert import tile_create
from tilespmv_tpu.io import generate
from tilespmv_tpu.ops.pallas.lane_plan import build_lane_plan

NAME = sys.argv[1] if len(sys.argv) > 1 else "mixed_large"

t0 = time.perf_counter()
csr = generate.get_matrix(NAME)
print(f"gen      {time.perf_counter()-t0:7.1f} s", flush=True)

t0 = time.perf_counter()
tm = tile_create(csr)
print(f"convert  {time.perf_counter()-t0:7.1f} s", flush=True)

t0 = time.perf_counter()
plan = build_lane_plan(tm, compute_dtype=jnp.float64)
print(f"plan     {time.perf_counter()-t0:7.1f} s", flush=True)
bytes_total = sum(
    int(np.prod(l.shape)) * l.dtype.itemsize
    for l in jax.tree_util.tree_leaves(plan) if hasattr(l, "shape"))
print(f"plan bytes {bytes_total/1e6:.1f} MB "
      f"(~{bytes_total/20e6:.0f} s upload at 20 MB/s)", flush=True)

from tilespmv_tpu.ops.pallas.kernels import spmv_pallas  # noqa: E402

x = jnp.asarray(np.linspace(-1, 1, plan.n), jnp.float64)
f = jax.jit(lambda p, xx: spmv_pallas(p, xx))
t0 = time.perf_counter()
y = np.asarray(f(plan, x))
print(f"compile+first-call {time.perf_counter()-t0:7.1f} s", flush=True)

t0 = time.perf_counter()
y = np.asarray(f(plan, x))
print(f"second call {time.perf_counter()-t0:7.1f} s", flush=True)

ref = csr.matvec(np.asarray(x, np.float64))
mag = np.abs(csr.data).sum() / csr.m
err = np.max(np.abs(y - ref) / (1 + np.abs(ref)))
print(f"err {err:.2e}", flush=True)

from tilespmv_tpu.utils.profiling import _timed  # noqa: E402
us = _timed(lambda p, xx: spmv_pallas(p, xx), plan, x) * 1e6
print(f"timed   {us:9.1f} us", flush=True)
