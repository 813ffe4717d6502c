"""A/B the two-rate stream split on the real TPU (round-2 verdict task 7).

For each named matrix: build the auto plan (split allowed + any-s cost
search) and forced single-rate plans for s in S_FORCED, then time

* the stream class alone (difference method, stream_class_call), and
* the full operator (spmv_pallas jitted end to end),

so the split's second dispatch is priced against its padding savings.

Usage (TPU):  PYTHONPATH=/root/repo:/root/.axon_site \
                  python scripts/ab_stream_split.py [names...]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from tilespmv_tpu.core.convert import tile_create
from tilespmv_tpu.io import generate
from tilespmv_tpu.ops.pallas.kernels import spmv_pallas, stream_class_call
from tilespmv_tpu.ops.pallas.lane_plan import build_lane_plan
from tilespmv_tpu.utils.profiling import _timed

NAMES = sys.argv[1:] or ["powerlaw_large", "mixed_large"]
S_FORCED = (4, 8, 11, 16)


def time_plan(plan, n):
    # plan/stream classes are pytrees and MUST be jit arguments —
    # closing over them embeds the plane arrays as program constants
    # and blows the remote-compile payload limit (HTTP 413)
    x = jnp.asarray(((np.arange(n) % 10) / 4.0), jnp.float32)
    full = _timed(lambda p, xx: spmv_pallas(p, xx), plan, x) * 1e6
    stream_us = float("nan")
    if plan.stream is not None:
        x128 = (jnp.zeros(plan.x_padded_len128, jnp.float32)
                .at[:n].set(x).reshape(-1, 128))
        nw2 = plan.n_stream_windows
        if plan.stream2 is not None:
            def callp(s1, s2, x2):
                y = stream_class_call(s1, x2, nw2)
                return stream_class_call(s2, x2, nw2, prev=y)
            stream_us = _timed(callp, plan.stream, plan.stream2,
                               x128) * 1e6
        else:
            stream_us = _timed(
                lambda s_, x2: stream_class_call(s_, x2, nw2),
                plan.stream, x128) * 1e6
    return full, stream_us


for name in NAMES:
    csr = generate.get_matrix(name)
    tm = tile_create(csr)
    configs = [("auto", None)] + [(f"s={s}", s) for s in S_FORCED]
    for label, s in configs:
        plan = build_lane_plan(tm, stream_s_batch=s)
        st = plan.stream
        if st is None:
            print(f"{name}: no stream class; skipping")
            break
        split = "+split" if plan.stream2 is not None else ""
        nsl = st.nslabs + (plan.stream2.nslabs if plan.stream2 else 0)
        full, stream_us = time_plan(plan, plan.n)
        print(f"{name:16s} {label:6s}{split:7s} slabs={nsl:6d} "
              f"s={st.s_batch:3d} full={full:9.1f} us  "
              f"stream={stream_us:9.1f} us", flush=True)
