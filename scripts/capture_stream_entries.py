"""Capture the stream-class entry list (g_row, g_col, val) for a corpus
matrix into /tmp/stream_entries_<name>.npz — input for slab-geometry
studies (scripts/geometry_study.py) without re-running conversion."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np  # noqa: E402

name = sys.argv[1] if len(sys.argv) > 1 else "powerlaw_large"
out = f"/tmp/stream_entries_{name}.npz"
if os.path.exists(out):
    print("already captured:", out)
    sys.exit(0)

import jax  # noqa: E402
jax.config.update("jax_platforms", "cpu")

from tilespmv_tpu.io import generate  # noqa: E402
from tilespmv_tpu import tile_create  # noqa: E402
from tilespmv_tpu.ops.pallas import lane_plan, stream_plan  # noqa: E402

captured = {}
real_build = stream_plan.build_stream_chunks


def hook(g_row, g_col, val, m, **kw):
    captured["g_row"] = np.asarray(g_row)
    captured["g_col"] = np.asarray(g_col)
    captured["val"] = np.asarray(val)
    captured["m"] = m
    return real_build(g_row, g_col, val, m, **kw)


lane_plan.build_stream_chunks = hook
csr = generate.get_matrix(name)
tm = tile_create(csr)
plan = lane_plan.build_lane_plan(tm)
if not captured:
    print("no stream class for", name)
    sys.exit(1)
np.savez(out, **captured)
st = plan.stream
print("saved", out, "nz:", captured["g_row"].size, "m:", captured["m"],
      "| built class: nslabs", st.nslabs, "s_batch", st.s_batch,
      "span", st.span_rows,
      "stream2", None if plan.stream2 is None else plan.stream2.nslabs)
