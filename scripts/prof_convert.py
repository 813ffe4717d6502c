"""Ad-hoc: where does tile_create spend its time? (CPU-only)"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np  # noqa: E402

from tilespmv_tpu.core import convert, native  # noqa: E402
from tilespmv_tpu.config import DEFAULT_CONFIG  # noqa: E402
from tilespmv_tpu.io import generate  # noqa: E402

name = sys.argv[1] if len(sys.argv) > 1 else "powerlaw_large"
csr = generate.get_matrix(name)
m, n = csr.shape
nnz = int(csr.indptr[-1])
print(f"{name}: m={m} nnz={nnz}")

t0 = time.perf_counter()
indptr = np.ascontiguousarray(csr.indptr[: m + 1], dtype=np.int64)
a = native.analyze(m, n, indptr, csr.indices[:nnz], csr.data[:nnz],
                   DEFAULT_CONFIG)
t1 = time.perf_counter()
print(f"native analyze: {t1 - t0:.3f} s (tilenum={a['tile_rowidx'].shape[0]})")

t0 = time.perf_counter()
tm = convert.tile_create(csr)
t1 = time.perf_counter()
print(f"tile_create total: {t1 - t0:.3f} s")

# plan build on top
from tilespmv_tpu.ops.plan import build_plan  # noqa: E402,F401
from tilespmv_tpu.ops.pallas import lane_plan  # noqa: E402

t0 = time.perf_counter()
lp = lane_plan.build_lane_plan(tm)
t1 = time.perf_counter()
print(f"lane plan: {t1 - t0:.3f} s")
