"""Measure the small-matrix glue floor after class-output chaining
(round-2 verdict task 6 acceptance: dense_blocks_medium <= 0.0045 ms,
mixed_medium believable and below round-1's 0.010 ms).

Times the full operator with benchmark_op (escalating difference
method) on the sub-10-us corpus rows.

Usage (TPU):  PYTHONPATH=/root/repo:/root/.axon_site \
                  python scripts/ab_glue_floor.py [names...]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from tilespmv_tpu.bench.harness import benchmark_op
from tilespmv_tpu.io import generate
from tilespmv_tpu.ops.spmv import TileSpMV

NAMES = sys.argv[1:] or ["dense_blocks_medium", "mixed_medium",
                         "banded_medium", "mixed_small"]

for name in NAMES:
    csr = generate.get_matrix(name)
    op = TileSpMV(csr, backend="pallas")
    plan = op.plan
    ncls = (int(plan.dense is not None) + int(plan.band is not None)
            + len(plan.sparses) + int(plan.stream is not None)
            + int(plan.stream2 is not None))
    res = benchmark_op(op, name=name)
    rel = "" if res.reliable else "  [UNRELIABLE]"
    print(f"{name:20s} classes={ncls} ms={res.ms:.4f} "
          f"GFLOPS={res.gflops:.2f} spread={res.spread:.0%}{rel}",
          flush=True)
