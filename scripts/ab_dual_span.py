"""On-TPU A/B of the dual-span stream-slab geometry (round-4 task 1).

Uses captured stream-class entries (scripts/capture_stream_entries.py),
builds the mono and dual plans exactly as build_lane_plan does (split
machinery included), verifies each against the host oracle, and times
the chained class calls on the real chip.
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from tilespmv_tpu.ops.pallas import stream_plan  # noqa: E402
from tilespmv_tpu.ops.pallas.stream_plan import (  # noqa: E402
    build_stream_chunks, split_stream_chunks, pick_geometry)
from tilespmv_tpu.ops.pallas.kernels import stream_class_call  # noqa: E402
from tilespmv_tpu.utils.profiling import _timed  # noqa: E402

name = sys.argv[1] if len(sys.argv) > 1 else "powerlaw_large"
d = np.load(f"/tmp/stream_entries_{name}.npz")
r, c, v, m = (d["g_row"], d["g_col"], d["val"].astype(np.float64),
              int(d["m"]))
nwin = -(-m // 1024)
rng = np.random.default_rng(0)
x = ((np.arange(m) % 10) / 4.0)
ref = np.zeros(m)
np.add.at(ref, r, v * x[c])
rows = -(-m // 128) + stream_plan.MAX_SPAN_ROWS
x2d = np.zeros((rows, 128), np.float32)
x2d.reshape(-1)[:m] = x
xj = jnp.asarray(x2d)

print("auto geometry:", pick_geometry(r, c, m), flush=True)


def run(dual, span):
    t0 = time.time()
    st, _ = build_stream_chunks(r, c, v, m, compute_dtype=np.float32,
                                span_rows=span, dual=dual,
                                use_native=not dual,
                                device=False, stack=False)
    base, heavy = split_stream_chunks(st, raw_planes=True)
    t_build = time.time() - t0

    # plans are jit ARGUMENTS (closing over them embeds the plane
    # arrays as HLO constants -> remote-compile HTTP 413)
    if heavy is not None:
        def call(b, h, xa):
            return stream_class_call(h, xa, nwin,
                                     prev=stream_class_call(b, xa, nwin))

        args = (base, heavy)
    else:
        def call(b, xa):
            return stream_class_call(b, xa, nwin)

        args = (base,)

    y = np.asarray(jax.jit(call)(*args, xj), np.float64)
    yv = np.zeros(nwin * 1024)
    for w in range(nwin):
        yv[w * 1024:(w + 1) * 1024] = y[:, w * 128:(w + 1) * 128].reshape(-1)
    err = np.max(np.abs(yv[:m] - ref)) / np.max(np.abs(ref))
    dt = _timed(call, *args, xj)
    tot = base.nslabs + (heavy.nslabs if heavy is not None else 0)
    print(f"dual={dual} span={span}: slabs={tot} "
          f"(base {base.nslabs}@s{base.s_batch}"
          f"{' heavy %d@s%d' % (heavy.nslabs, heavy.s_batch) if heavy is not None else ''})"
          f" build={t_build:.1f}s err={err:.2e} "
          f"time={dt*1e3:.3f} ms  ns/slab={dt*1e9/tot:.1f}", flush=True)
    return dt


t_mono = run(False, 64)
t_dual = run(True, 64)
print(f"dual speedup: {t_mono/t_dual:.3f}x", flush=True)
