"""On-TPU interleaved A/B: dense-class c_batch (grid steps) on small
dense-heavy matrices.

Round-5 finding (scripts/glue_decomposition.py): dense_blocks_medium's
8.2 us/SpMV is NOT glue — panel transpose costs 0.16 us and y assembly
0.01; the dense-class kernel itself is 7.5 us. The planner's _pick_cb
model (step fixed cost + padding traffic) chose c_batch=4, collapsing
the 4 chunks into ONE grid step — and a 1-step grid cannot overlap its
2.15 MB plan fetch with compute (Pallas pipelining needs >= 2 steps).
This script measures whether more, smaller steps (c_batch 1/2 at
t_lanes 512, and t_lanes 256) buy back the overlap, with the chained
difference method (k2 sized for seconds-long deltas at ~1% spread).

Usage: python scripts/ab_dense_cbatch.py [matrix ...] [--rounds N]
"""
import argparse
import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np  # noqa: E402

from tilespmv_tpu.io import generate  # noqa: E402
from tilespmv_tpu import tile_create  # noqa: E402
from tilespmv_tpu.ops.pallas import lane_plan as lp  # noqa: E402
from tilespmv_tpu.ops.spmv import spmv  # noqa: E402
from tilespmv_tpu.utils.abtest import interleaved_ab  # noqa: E402

ap = argparse.ArgumentParser()
ap.add_argument("matrices", nargs="*", default=["dense_blocks_medium"])
ap.add_argument("--rounds", type=int, default=3)
args = ap.parse_args()

for name in args.matrices or ["dense_blocks_medium"]:
    print(f"=== {name} ===", flush=True)
    csr = generate.get_matrix(name)
    tm = tile_create(csr)
    x = ((np.arange(csr.n) % 10) / 4.0).astype(np.float32)
    ref = csr.matvec(x.astype(np.float64))
    scale = np.max(np.abs(ref)) or 1.0

    arms = {}
    plans = {"auto": lp.build_lane_plan(tm)}
    for t in (512, 256):
        plans[f"t{t}_cb1"] = lp.build_lane_plan(tm, force_t=t)
    fn = functools.partial(spmv, backend="pallas")
    import jax.numpy as jnp
    xj = jnp.asarray(x)
    for tag, plan in plans.items():
        d = plan.dense
        if d is None:
            print(f"{tag}: no dense class, skipped")
            continue
        y = np.asarray(fn(plan, xj), np.float64)
        err = np.max(np.abs(y - ref)) / scale
        steps = int(np.asarray(d.cw).shape[0])
        print(f"{tag}: t_lanes={d.t_lanes} c_batch={d.c_batch} "
              f"k_panels={d.k_panels} steps={steps} err={err:.2e}",
              flush=True)
        assert err < 1e-2
        arms[tag] = (fn, plan, xj)

    # ~8 us/iter -> 50k iters = 0.4 s delta (round-5 tunnel-noise fact)
    res = interleaved_ab(arms, rounds=args.rounds, k1=2500, k2=52500)
    print(f"{name}: winner {res['winner']} "
          f"({res['median_us']})", flush=True)
