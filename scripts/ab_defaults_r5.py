"""Re-arbitrate sub-30-us kernel defaults under the interleaved e2e
harness (round-4 verdict #5).

The round-4 routing inversion proved isolated class timings cannot
settle defaults on this tunnel; utils/abtest.py lifts the proven
method (arms alternated in one process, fresh jit partials, plans as
jit args). Each group below times the FULL SpMV per arm on the real
chip.

Usage: python scripts/ab_defaults_r5.py [route|xg|dual|band_acc|all]
"""
import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np  # noqa: E402

import tilespmv_tpu as tsp  # noqa: E402
from tilespmv_tpu.io import generate  # noqa: E402
from tilespmv_tpu.ops.pallas import kernels, lane_plan  # noqa: E402
from tilespmv_tpu.ops.pallas.lane_plan import build_lane_plan  # noqa: E402
from tilespmv_tpu.utils import abtest  # noqa: E402


def _xj(csr, dtype=np.float32):
    import jax.numpy as jnp
    return jnp.asarray(((np.arange(csr.n) % 10) / 4.0), dtype=dtype)


def _check(plan, x, csr, tol=1e-3):
    import jax.numpy as jnp  # noqa: F401

    from tilespmv_tpu.ops.spmv import spmv
    y = np.asarray(spmv(plan, x, backend="pallas"), np.float64)
    ref = csr.matvec(np.asarray(x, np.float64))
    err = np.max(np.abs(y - ref)) / max(1e-30, np.max(np.abs(ref)))
    assert err < tol, f"arm produces wrong results: rel_err={err:.3e}"
    return err


def group_route(rounds=4, name="mixed_large", **timed_kw):
    """DENSE_ROUTE onehot vs prefix, e2e on `name`. Sub-10-us matrices
    need seconds-long deltas (round-5 tight-harness lesson): pass e.g.
    k1=2000, k2=60000 so the difference spans >=0.3 s."""
    from tilespmv_tpu.ops.spmv import spmv
    csr = generate.get_matrix(name)
    tm = tsp.tile_create(csr)
    x = _xj(csr)
    arms = {}
    for route in ("onehot", "prefix"):
        old = lane_plan.DENSE_ROUTE
        try:
            lane_plan.DENSE_ROUTE = route
            plan = build_lane_plan(tm)
        finally:
            lane_plan.DENSE_ROUTE = old
        _check(plan, x, csr)
        arms[route] = (functools.partial(spmv, backend="pallas"),
                       plan, x)
    print(f"== route ({name} e2e) ==", flush=True)
    return abtest.interleaved_ab(arms, rounds=rounds, **timed_kw)


def group_ohdtype(rounds=4, name="mixed_large", **timed_kw):
    """Window one-hot build dtype bf16 vs f32, e2e on `name` (round-5
    second session). bf16 is bit-identical (every MXU consumer casts the
    one-hot to bf16 anyway) but drops a full-surface convert pass."""
    from tilespmv_tpu.ops.spmv import spmv
    csr = generate.get_matrix(name)
    tm = tsp.tile_create(csr)
    plan = build_lane_plan(tm)
    x = _xj(csr)
    arms = {}
    for oh in ("bf16", "f32"):
        def fn(plan_, x_, _oh=oh):
            old = dict(kernels.WINDOW_BLOCK_VARIANT)
            try:
                kernels.WINDOW_BLOCK_VARIANT["ohdtype"] = _oh
                return spmv(plan_, x_, backend="pallas")
            finally:
                kernels.WINDOW_BLOCK_VARIANT.update(old)
        arms[oh] = (fn, plan, x)
    _check(plan, x, csr)
    print(f"== onehot dtype ({name} e2e) ==", flush=True)
    return abtest.interleaved_ab(arms, rounds=rounds, **timed_kw)


def group_xg(rounds=4):
    """Stream x-staging chunk vs narrow, e2e on mixed_large (mono-64
    plans only — dual/wide spans force chunk)."""
    from tilespmv_tpu.ops.spmv import spmv
    csr = generate.get_matrix("mixed_large")
    tm = tsp.tile_create(csr)
    plan = build_lane_plan(tm)
    x = _xj(csr)
    arms = {}
    for xg in ("chunk", "narrow"):
        def fn(plan_, x_, _xg=xg):
            old = dict(kernels.STREAM_VARIANT)
            try:
                kernels.STREAM_VARIANT["xg"] = _xg
                return spmv(plan_, x_, backend="pallas")
            finally:
                kernels.STREAM_VARIANT.update(old)
        arms[xg] = (fn, plan, x)
    print("== stream xg (mixed_large e2e) ==", flush=True)
    return abtest.interleaved_ab(arms, rounds=rounds)


def group_dual(rounds=4):
    """Stream dual-span forced on/off, e2e on mixed_large (pick_geometry
    keeps mixed_large mono; confirm e2e)."""
    from tilespmv_tpu.ops.spmv import spmv
    csr = generate.get_matrix("mixed_large")
    tm = tsp.tile_create(csr)
    x = _xj(csr)
    arms = {}
    for name, dual in (("mono", False), ("dual", True)):
        plan = build_lane_plan(tm, stream_dual=dual)
        _check(plan, x, csr)
        arms[name] = (functools.partial(spmv, backend="pallas"),
                      plan, x)
    print("== stream dual (mixed_large e2e) ==", flush=True)
    return abtest.interleaved_ab(arms, rounds=rounds)


def group_band_acc(rounds=4):
    """Band df64 accumulation tree vs serial vs ilv2, e2e on
    banded_large f64 (round-4: a wash under the 2-plane layout; confirm
    under the harness)."""
    import jax
    jax.config.update("jax_enable_x64", True)

    from tilespmv_tpu.ops.spmv import spmv
    csr = generate.get_matrix("banded_large")
    tm = tsp.tile_create(csr)
    plan = build_lane_plan(tm, compute_dtype=np.float64)
    x = _xj(csr, np.float64)
    arms = {}
    for acc in ("tree", "serial", "ilv2"):
        def fn(plan_, x_, _acc=acc):
            old = dict(kernels.BAND_DF64_VARIANT)
            try:
                kernels.BAND_DF64_VARIANT["acc"] = _acc
                return spmv(plan_, x_, backend="pallas")
            finally:
                kernels.BAND_DF64_VARIANT.update(old)
        arms[acc] = (fn, plan, x)
    print("== band df64 acc (banded_large e2e) ==", flush=True)
    return abtest.interleaved_ab(arms, rounds=rounds)


GROUPS = dict(route=group_route, xg=group_xg, dual=group_dual,
              band_acc=group_band_acc, ohdtype=group_ohdtype)

if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    results = {}
    for name in (GROUPS if which == "all" else [which]):
        results[name] = GROUPS[name](rounds=rounds)
    print("\n=== defaults table (interleaved-arm medians, us) ===")
    for name, res in results.items():
        med = res["median_us"]
        print(f"{name}: " + "  ".join(
            f"{k}={v:.1f}" for k, v in sorted(med.items(),
                                              key=lambda kv: kv[1]))
            + f"  -> {res['winner']}")
