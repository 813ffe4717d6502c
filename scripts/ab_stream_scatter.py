"""Interleaved e2e A/B: stream scatter encoding "rounds" vs "offs".

Round-4 verdict #1: test a fundamentally different per-entry encoding.
"offs" (stream_plan._runs_planes_offs) replaces the per-round boundary
gathers + dynamic rsrc sublane gathers with ONE run-ordered boundary
gather pair per slab plus 8 static sublane-offset passes (lane gather +
static rotate + add) — per slab: 10 dynamic gathers + 7 static rotates
instead of 16 + 8 dynamic sublane gathers + 8 subs.

Usage: python scripts/ab_stream_scatter.py [matrix] [rounds]
"""
import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np  # noqa: E402

import tilespmv_tpu as tsp  # noqa: E402
from tilespmv_tpu.io import generate  # noqa: E402
from tilespmv_tpu.ops.pallas import stream_plan as sp  # noqa: E402
from tilespmv_tpu.ops.pallas.lane_plan import build_lane_plan  # noqa: E402
from tilespmv_tpu.ops.spmv import spmv  # noqa: E402
from tilespmv_tpu.utils import abtest  # noqa: E402

name = sys.argv[1] if len(sys.argv) > 1 else "powerlaw_large"
rounds = next((int(a) for a in sys.argv[2:] if a.isdigit()), 4)
dtype = np.float64 if "--f64" in sys.argv else np.float32
if dtype == np.float64:
    import jax
    jax.config.update("jax_enable_x64", True)

csr = generate.get_matrix(name)
tm = tsp.tile_create(csr)
x = ((np.arange(csr.n) % 10) / 4.0).astype(dtype)
ref = csr.matvec(x.astype(np.float64))
nrm = np.max(np.abs(ref))

import jax.numpy as jnp  # noqa: E402

xj = jnp.asarray(x, dtype=dtype)
arm_names = [a for a in sys.argv[2:]
             if a in ("rounds", "offs", "roll")] or ["rounds", "roll"]
arms = {}
for scat in arm_names:
    old = sp.STREAM_SCATTER
    try:
        sp.STREAM_SCATTER = scat
        plan = build_lane_plan(tm, compute_dtype=dtype)
    finally:
        sp.STREAM_SCATTER = old
    st = plan.stream
    print(f"{scat}: slabs={st.nslabs if st else 0} "
          f"s={st.s_batch if st else '-'} "
          f"span={st.span_rows if st else '-'} "
          f"dual={st.dual if st else '-'} "
          f"stream2={'yes' if plan.stream2 is not None else 'no'}",
          flush=True)
    y = np.asarray(spmv(plan, xj, backend="pallas"), np.float64)
    err = np.max(np.abs(y - ref)) / nrm
    tol = 1e-9 if dtype == np.float64 else 1e-3
    print(f"{scat}: rel_err={err:.3e} "
          f"{'PASS' if err < tol else 'FAIL'}", flush=True)
    assert err < tol
    arms[scat] = (functools.partial(spmv, backend="pallas"), plan, xj)

res = abtest.interleaved_ab(arms, rounds=rounds)
print(f"{name}: winner={res['winner']} medians "
      + "  ".join(f"{k}={v:.1f}us" for k, v in res["median_us"].items()))
