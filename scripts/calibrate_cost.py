"""Calibrate the execution cost model (lane_plan.COST) on the real TPU.

For each corpus matrix, force every "densify bands >= theta" routing
candidate (lane_plan.ROUTE_FORCE_THETA), benchmark the whole operator,
and per-engine-profile the winning and losing configurations. Output:

* a per-matrix table: measured ms per theta, the auto choices of both
  routing arms, and the regret of each arm vs the best forced theta
  (round-2 verdict task 5 acceptance: auto never >10% worse);
* per-class in-situ ns/chunk rows to refit COST's constants.

Usage (TPU):  PYTHONPATH=/root/repo:/root/.axon_site \
                  python scripts/calibrate_cost.py [names...]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np

from tilespmv_tpu.io import generate
from tilespmv_tpu.bench.harness import benchmark_op
from tilespmv_tpu.ops.pallas import lane_plan
from tilespmv_tpu.ops.spmv import TileSpMV
from tilespmv_tpu.utils.profiling import profile_engines

NB = len(lane_plan.W_CHOICES)
NAMES = sys.argv[1:] or ["mixed_large", "ell_medium", "uniform_sparse",
                         "dense_blocks_medium", "mixed_medium"]


def run(csr, theta=None, mode=None):
    old_t, old_m = lane_plan.ROUTE_FORCE_THETA, lane_plan.ROUTE_MODE
    try:
        lane_plan.ROUTE_FORCE_THETA = theta
        if mode is not None:
            lane_plan.ROUTE_MODE = mode
        op = TileSpMV(csr, backend="pallas")
        res = benchmark_op(op, warmup=1, timed_reps=3)
        return op, res
    finally:
        lane_plan.ROUTE_FORCE_THETA, lane_plan.ROUTE_MODE = old_t, old_m


for name in NAMES:
    csr = generate.get_matrix(name)
    rows = {}
    for theta in range(NB + 1):
        op, res = run(csr, theta=theta)
        classes = [f"W{s.width}:{s.val.shape[0]}c" for s in op.plan.sparses]
        if op.plan.dense is not None:
            classes.append(f"D:{op.plan.dense.val.shape[0]}c"
                           f"T{op.plan.dense.t_lanes}")
        rows[theta] = (res.ms, classes)
        print(f"{name} theta={theta}: {res.ms:.4f} ms  {classes}",
              flush=True)
    best_theta = min(rows, key=lambda t: rows[t][0])
    for mode in ("fixed", "model"):
        op, res = run(csr, mode=mode)
        regret = res.ms / rows[best_theta][0] - 1.0
        flag = "" if regret <= 0.10 else "  ** REGRET > 10% **"
        print(f"{name} auto[{mode}]: {res.ms:.4f} ms "
              f"(best theta={best_theta} {rows[best_theta][0]:.4f} ms, "
              f"regret {regret:+.1%}){flag}", flush=True)
        if mode == "model":
            prof = profile_engines(op)
            for k, v in prof.items():
                print(f"    {k:12s} {v['us']:9.1f} us  "
                      f"{ {kk: vv for kk, vv in v.items() if kk not in ('us', 'bytes', 'gbps')} }",
                      flush=True)
