"""COO absorb-vs-stream decision table + margin sensitivity sweep.

Round-4 verdict (weak #7): STREAM_ABSORB_MARGIN = 0.7 (absorb must beat
the stream estimate by 30%) was set, not swept, and the absorb cost
model had advisor-flagged inconsistencies. This script prints, for
every corpus matrix that reaches the absorb decision, the fixed cost
model's (absorb_ns, stream_ns) pair and the decision at margins
0.85 / 0.70 / 0.50 (absorb must win by 15% / 30% / 50%). The estimates
do not depend on the margin, so each matrix is planned once.

Run on CPU: python scripts/absorb_decision_table.py [names...]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

import tilespmv_tpu as tsp  # noqa: E402
from tilespmv_tpu.io import generate  # noqa: E402
from tilespmv_tpu.ops.pallas import lane_plan  # noqa: E402

MARGINS = (0.85, 0.70, 0.50)

names = sys.argv[1:] or sorted(generate.CORPUS)
print(f"{'matrix':28s} {'absorb_us':>10s} {'stream_us':>10s} "
      f"{'ratio':>6s}  " + "  ".join(f"m={m:.2f}" for m in MARGINS))
for name in names:
    csr = generate.get_matrix(name)
    tm = tsp.tile_create(csr)
    lane_plan.LAST_ABSORB_ESTIMATE = None
    plan = lane_plan.build_lane_plan(tm)
    est = lane_plan.LAST_ABSORB_ESTIMATE
    kinds = {c["kind"] for c in plan.summary()["classes"]}
    built = "stream" if "stream" in kinds else "absorb"
    if est is None:
        print(f"{name:28s} {'-':>10s} {'-':>10s} {'-':>6s}  "
              f"(no stream candidate; built={built})")
        continue
    a, s = est
    ratio = a / s if s else float("inf")
    decisions = "  ".join(
        f"{'absorb' if a < m * s else 'stream':6s}" for m in MARGINS)
    print(f"{name:28s} {a/1e3:10.1f} {s/1e3:10.1f} {ratio:6.2f}  "
          f"{decisions}  built={built}", flush=True)
