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

DEEP = "--deep" in sys.argv
NAMES = [a for a in sys.argv[1:] if not a.startswith("-")] or [
    "dense_blocks_medium", "mixed_medium", "banded_medium",
    "mixed_small"]

# --deep (round-4 verdict #6): push the chained-iteration count far
# past the default so each timed call runs SECONDS of back-to-back
# SpMVs inside one jitted fori_loop — if the tunnel's 27-55% spread on
# sub-10-us rows is per-RPC jitter it averages out; if it is
# multiplicative chip/tunnel drift, the spread survives and the glue
# floor stays honestly unmeasurable.
kw = (dict(iters_per_rep=50_000, timed_reps=15, budget_s=30.0)
      if DEEP else {})

for name in NAMES:
    csr = generate.get_matrix(name)
    op = TileSpMV(csr, backend="pallas")
    plan = op.plan
    ncls = (int(plan.dense is not None) + int(plan.band is not None)
            + len(plan.sparses) + int(plan.stream is not None)
            + int(plan.stream2 is not None))
    res = benchmark_op(op, name=name, **kw)
    rel = "" if res.reliable else "  [UNRELIABLE]"
    print(f"{name:20s} classes={ncls} ms={res.ms:.4f} "
          f"GFLOPS={res.gflops:.2f} spread={res.spread:.0%} "
          f"iters={res.iters}{rel}", flush=True)
