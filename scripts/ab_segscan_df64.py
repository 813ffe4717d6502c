"""Interleaved e2e A/B: df64 stream segmented scan vs legacy full scan.

The segmented form (stream_plan._seg_masks) confines the compensated
Kogge-Stone to runs via plan-time bit planes: csum[run end] becomes the
run sum pair, dropping the rstart boundary gathers + boundary two_sum
per round, and the scan depth shrinks from log2(128)=7 to
ceil(log2(max run length)) for the class.

Usage: python scripts/ab_segscan_df64.py [matrix] [rounds]
"""
import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import tilespmv_tpu as tsp  # noqa: E402
from tilespmv_tpu.io import generate  # noqa: E402
from tilespmv_tpu.ops.pallas import stream_plan as sp  # noqa: E402
from tilespmv_tpu.ops.pallas.lane_plan import build_lane_plan  # noqa: E402
from tilespmv_tpu.ops.spmv import spmv  # noqa: E402
from tilespmv_tpu.utils import abtest  # noqa: E402

name = sys.argv[1] if len(sys.argv) > 1 else "powerlaw_large"
rounds = next((int(a) for a in sys.argv[2:] if a.isdigit()), 4)
csr = generate.get_matrix(name)
tm = tsp.tile_create(csr)
x = ((np.arange(csr.n) % 10) / 4.0)
ref = csr.matvec(x)
nrm = np.max(np.abs(ref))
xj = jnp.asarray(x, jnp.float64)

arms = {}
for tag, seg in (("legacy", False), ("segscan", True)):
    old = sp.STREAM_SEGSCAN_DF64
    try:
        sp.STREAM_SEGSCAN_DF64 = seg
        plan = build_lane_plan(tm, compute_dtype=np.float64)
    finally:
        sp.STREAM_SEGSCAN_DF64 = old
    st = plan.stream
    print(f"{tag}: slabs={st.nslabs} s={st.s_batch} "
          f"levels={st.scan_levels} "
          f"stream2={plan.stream2 is not None}", flush=True)
    y = np.asarray(spmv(plan, xj, backend="pallas"), np.float64)
    err = np.max(np.abs(y - ref)) / nrm
    print(f"{tag}: rel_err={err:.3e} "
          f"{'PASS' if err < 1e-9 else 'FAIL'}", flush=True)
    assert err < 1e-9
    arms[tag] = (functools.partial(spmv, backend="pallas"), plan, xj)

res = abtest.interleaved_ab(arms, rounds=rounds)
print(f"{name} df64: winner={res['winner']} "
      + "  ".join(f"{k}={v:.1f}us" for k, v in res["median_us"].items()))
