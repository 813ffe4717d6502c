"""Per-engine cost profiling + tracing hooks.

TPU-native version of the reference's per-format cost instrumentation
(`DEBUG_FORMATCOST` / `formatprofile`, reference main.cu:12 and
tilespmv_cuda.h:102-110,525-533): times each execution-plan class
separately so the cost of every tile format family is visible, plus a
`jax.profiler` trace context for deep dives.
"""
from __future__ import annotations

import contextlib
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np


def _timed(fn, *args, reps: int = 3, k1: int = 25, k2: int = 425) -> float:
    """Difference-method timing of an on-device fn(*args) (see
    bench/harness.py for why: the tunneled backend only synchronizes on a
    host transfer). Operands are jit *arguments* — closing over them would
    embed them as program constants (and blow up the compile payload).
    Never returns a negative (jitter on tiny kernels)."""
    from jax import lax

    def looped(iters, *a):
        # perturb the last operand (x) with a result-dependent epsilon so
        # XLA cannot hoist the call out of the loop; with no operands the
        # accumulator carry itself is the hoist guard
        def body(i, carry):
            eps, acc = carry
            if a:
                out = fn(*a[:-1], a[-1] + eps.astype(a[-1].dtype))
            else:
                out = fn() + acc.astype(jnp.float32) * 0.0
            # df64 class calls return a (hi, lo) pair — reduce leaves
            s = sum(jnp.sum(o).astype(jnp.float32)
                    for o in jax.tree_util.tree_leaves(out))
            return eps + s * 1e-30, acc + s
        _, acc = lax.fori_loop(
            0, iters, body,
            (jnp.zeros((), jnp.float32), jnp.zeros((), jnp.float32)))
        return acc

    f1 = jax.jit(functools.partial(looped, k1))
    f2 = jax.jit(functools.partial(looped, k2))
    for f in (f1, f2):
        float(f(*args))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(f1(*args))
        ta = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(f2(*args))
        tb = time.perf_counter() - t0
        ts.append((tb - ta) / (k2 - k1))
    return max(float(np.median(ts)), 1e-9)


def profile_engines(op, x=None) -> dict[str, dict]:
    """Per-class timing breakdown of a TileSpMV operator.

    Returns {class_name: {"us": .., "bytes": .., "gbps": ..}} — the analog
    of the reference's per-format cost profile. Pallas backend only.
    """
    from ..ops.pallas.kernels import (band_class_call, dense_class_call,
                                      sparse_class_call, stream_class_call,
                                      x_to_panels)
    from ..ops.pallas.lane_plan import LanePlan

    plan = op.plan
    if not isinstance(plan, LanePlan):
        raise ValueError("profile_engines requires the pallas backend")
    if x is None:
        x = ((np.arange(plan.n) % 10) / 4.0)
    xj = jnp.asarray(x, dtype=op.compute_dtype)
    x_pad = jnp.zeros(plan.x_padded_len, xj.dtype).at[: plan.n].set(xj)
    x_panels = jax.jit(functools.partial(x_to_panels, plan))(xj)

    def nbytes(*arrays):
        return sum(int(np.prod(a.shape)) * a.dtype.itemsize for a in arrays)

    interp = jax.default_backend() == "cpu"
    out = {}
    if plan.dense is not None:
        d = plan.dense
        fn_d = functools.partial(dense_class_call,
                                 n_windows=plan.n_windows,
                                 interpret=interp)
        dt = _timed(fn_d, d, x_panels)
        b = nbytes(d.val, d.meta)
        out["dense"] = {"us": dt * 1e6, "bytes": b, "gbps": b / dt / 1e9,
                        "chunks": int(d.val.shape[0]),
                        "t_lanes": d.t_lanes}
    if plan.band is not None:
        bd = plan.band
        fn_b = functools.partial(band_class_call,
                                 n_windows=plan.n_windows,
                                 interpret=interp)
        dt = _timed(fn_b, bd, x_panels)
        b = nbytes(bd.val, bd.bloc)
        out["band"] = {"us": dt * 1e6, "bytes": b, "gbps": b / dt / 1e9,
                       "chunks": int(bd.val.shape[0]),
                       "c_cols": bd.c_cols}
    for i, s in enumerate(plan.sparses):
        fn_s = functools.partial(sparse_class_call,
                                 n_windows=plan.n_windows,
                                 interpret=interp)
        dt = _timed(fn_s, s, x_panels)
        b = nbytes(s.val, s.meta)
        out[f"sparse_w{s.width}"] = {
            "us": dt * 1e6, "bytes": b, "gbps": b / dt / 1e9,
            "chunks": int(s.val.shape[0]), "t_lanes": s.t_lanes}
    if plan.stream is not None:
        x128 = (jnp.zeros(plan.x_padded_len128, xj.dtype)
                .at[: plan.n].set(xj).reshape(-1, 128))
        for key, st in (("stream", plan.stream),
                        ("stream2", plan.stream2)):
            if st is None:
                continue
            fn_st = functools.partial(
                stream_class_call, n_windows=plan.n_stream_windows,
                interpret=interp)
            dt = _timed(fn_st, st, x128)
            b = nbytes(st.val, st.vidx, st.planes)
            out[key] = {"us": dt * 1e6, "bytes": b, "gbps": b / dt / 1e9,
                        "slabs": int(st.nslabs), "rounds": st.rounds,
                        "s_batch": st.s_batch}
    if plan.residual.val.shape[0]:
        r = plan.residual

        def res_fn(rv, xp):
            contrib = rv * xp[r.col]
            return jax.ops.segment_sum(contrib, r.row,
                                       num_segments=plan.y_padded_len,
                                       indices_are_sorted=True)
        dt = _timed(res_fn, r.val, x_pad)
        b = nbytes(r.val, r.row, r.col)
        out["residual"] = {"us": dt * 1e6, "bytes": b, "gbps": b / dt / 1e9}
    return out


@contextlib.contextmanager
def trace_context(logdir: str):
    """jax.profiler trace wrapper (the deep-dive analog of the reference's
    gettimeofday spans, main.cu:62-65)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
