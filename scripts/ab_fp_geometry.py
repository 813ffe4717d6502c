"""On-TPU interleaved e2e A/B: FREE-PLACEMENT stream geometry vs the
aligned default (round-5 follow-up to the corpus sweep).

Motivation (measured round 5): tall_rect (131072 x 4096, 8 nnz/row,
100% stream) runs at 190 ps/entry — the worst non-hypersparse corpus
row — because at span 64 a slab's 8 sublanes map to 8 CONSECUTIVE
1024-col x cells while the matrix has only nq=4 cells total: sublanes
4-7 are structurally dead (slab fill 0.47, 2175 slabs vs the 1149 the
free-placement packing reaches).  pick_geometry_fp rejects FP there
only because its per-SpMV XLA x-copy gather is priced pessimistically
at 2x streaming traffic (94 of the 210 us modeled cost) — a price set
"until measured" (stream_plan.FP_MARGIN comment).  This script measures
it: full-operator arms (plan as jit argument), alternated within one
process per the round-4 arbitration lesson (utils/abtest.py).

Usage: python scripts/ab_fp_geometry.py [matrix ...] [--rounds N]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np  # noqa: E402

from tilespmv_tpu.io import generate  # noqa: E402
from tilespmv_tpu import tile_create, TileSpMV  # noqa: E402
from tilespmv_tpu.ops.pallas import stream_plan as sp  # noqa: E402
from tilespmv_tpu.utils.abtest import interleaved_ab, spmv_arms  # noqa: E402

ap = argparse.ArgumentParser()
ap.add_argument("matrices", nargs="*", default=["tall_rect"])
ap.add_argument("--rounds", type=int, default=4)
args = ap.parse_args()

real_pick = sp.pick_geometry_fp


def force_fp(g_row, g_col, m, cells=None):
    span, dual, _ = real_pick(g_row, g_col, m, cells=cells)
    return span, dual, True


for name in args.matrices or ["tall_rect"]:
    print(f"=== {name} ===", flush=True)
    csr = generate.get_matrix(name)
    tm = tile_create(csr)
    rng = np.random.default_rng(7)
    x = rng.standard_normal(csr.n)
    ref = csr.matvec(x)
    scale = np.max(np.abs(ref)) or 1.0

    t0 = time.time()
    op_aligned = TileSpMV(tm)
    t_aligned = time.time() - t0
    sp.pick_geometry_fp = force_fp
    try:
        t0 = time.time()
        op_fp = TileSpMV(tm)
        t_fp = time.time() - t0
    finally:
        sp.pick_geometry_fp = real_pick

    for tag, op, tb in (("aligned", op_aligned, t_aligned),
                        ("fp", op_fp, t_fp)):
        err = np.max(np.abs(np.asarray(op(x), np.float64) - ref)) / scale
        cl = op.plan.summary()["classes"]
        print(f"{tag}: build {tb:.1f}s err {err:.2e} classes {cl}",
              flush=True)
        assert err < 1e-2, f"{tag} arm FAILED correctness"

    res = interleaved_ab(spmv_arms({"aligned": op_aligned, "fp": op_fp},
                                   x), rounds=args.rounds)
    a, f = res["median_us"]["aligned"], res["median_us"]["fp"]
    print(f"{name}: aligned {a:.1f} us vs fp {f:.1f} us -> "
          f"{'FP WINS' if f < a else 'aligned wins'} x{max(a, f)/min(a, f):.3f}",
          flush=True)
