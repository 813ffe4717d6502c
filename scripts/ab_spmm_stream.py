"""On-TPU A/B of the fused 2-RHS stream SpMM (round-4 task 5).

Measures one SpMV, then SpMM at k in {4, 8} with STREAM_SPMM_FUSED off
and on, on mixed_large (the committed round-3 SpMM flagship: k=8 ran
7.19x one SpMV with the per-RHS stream; target <= 6.5x).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import tilespmv_tpu as tsp  # noqa: E402
from tilespmv_tpu.io import generate  # noqa: E402
from tilespmv_tpu.ops.pallas import kernels  # noqa: E402
from tilespmv_tpu.ops.spmv import spmm  # noqa: E402
from tilespmv_tpu.utils.profiling import _timed  # noqa: E402

name = sys.argv[1] if len(sys.argv) > 1 else "mixed_large"
csr = generate.get_matrix(name)
op = tsp.TileSpMV(csr)
plan = op.plan
rng = np.random.default_rng(0)
x1 = rng.standard_normal(csr.n).astype(np.float32)
t1 = _timed(op._fn if hasattr(op, "_fn") else (lambda xx: op(xx)),
            jnp.asarray(x1))
print(f"one SpMV: {t1*1e3:.3f} ms", flush=True)

rows = np.repeat(np.arange(csr.m), np.diff(csr.indptr))
for k in (4, 8):
    xs = rng.standard_normal((csr.n, k)).astype(np.float32)
    ref = np.zeros((csr.m, k))
    np.add.at(ref, rows, csr.data[:, None] * xs[csr.indices].astype(
        np.float64))
    for fused in (False, True):
        kernels.STREAM_SPMM_FUSED = fused

        def fn(xj):
            return spmm(plan, xj, backend="pallas")

        Y = np.asarray(fn(jnp.asarray(xs)))
        bad = int((np.abs(Y - ref) > 0.01 * np.abs(ref) + 1e-4).sum())
        dt = _timed(fn, jnp.asarray(xs))
        print(f"k={k} fused={int(fused)}: {dt*1e3:.3f} ms = "
              f"{dt/t1:.2f}x SpMV  bad={bad}", flush=True)
kernels.STREAM_SPMM_FUSED = True
