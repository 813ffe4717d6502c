"""On-TPU A/B of the dense-class routing (onehot vs prefix).

Round-4 verdict task 6: land the 18% one-hot win as CORRECT code.
Builds the mixed_large plan under each DENSE_ROUTE, verifies the full
vector against the CPU reference (1e-3 rel gate — the prefix route's
boundary differences add only f32 prefix rounding), and reports the
dense-class per-chunk time via profile_engines.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from tilespmv_tpu.io import generate  # noqa: E402
import tilespmv_tpu as tsp  # noqa: E402
from tilespmv_tpu.ops.pallas import lane_plan  # noqa: E402
from tilespmv_tpu.ops.pallas.lane_plan import build_lane_plan  # noqa: E402
from tilespmv_tpu.utils.profiling import profile_engines  # noqa: E402

name = sys.argv[1] if len(sys.argv) > 1 else "mixed_large"
csr = generate.get_matrix(name)
tm = tsp.tile_create(csr)
x = ((np.arange(csr.n) % 10) / 4.0).astype(np.float32)
ref = csr.matvec(x.astype(np.float64))
nrm = np.max(np.abs(ref))

for route in ("onehot", "prefix"):
    lane_plan.DENSE_ROUTE = route
    op = tsp.TileSpMV(tm)
    d = op.plan.dense
    y = np.asarray(op(x))
    err = np.max(np.abs(y - ref)) / nrm
    print(f"route={route}: nchunks={d.val.shape[0]} t={d.t_lanes} "
          f"cb={d.c_batch} meta_rows={d.meta.shape[1]} rel_err={err:.3e} "
          f"{'PASS' if err < 1e-3 else 'FAIL'}", flush=True)
    prof = profile_engines(op, x)
    nch = d.val.shape[0]
    for k, v in sorted(prof.items()):
        print(f"  {k}: {v['us']:.1f} us", flush=True)
    if "dense" in prof:
        print(f"  dense ns/chunk: {prof['dense']['us']*1e3/nch:.1f}",
              flush=True)
