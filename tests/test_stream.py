"""Entry-level stream engine (ops/pallas/stream_plan.py) tests.

Validates the slab builder + Pallas kernel (interpret mode) against an
exact scatter-add golden model, including hub rows (long same-row runs),
non-multiple shapes, and the full spmv path with the stream engine forced.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from tilespmv_tpu.io import generate
from tilespmv_tpu.core.convert import tile_create
from tilespmv_tpu.ops.pallas.lane_plan import build_lane_plan
from tilespmv_tpu.ops.pallas.kernels import spmv_pallas, stream_class_call
from tilespmv_tpu.ops.pallas.stream_plan import (RW_ROWS,
                                                 build_stream_chunks)


def _run_stream(m, n, nnz, seed, heavy_row=False):
    rng = np.random.default_rng(seed)
    row = rng.integers(0, m, nnz).astype(np.int64)
    col = rng.integers(0, n, nnz).astype(np.int64)
    if heavy_row:
        row[: nnz // 3] = rng.integers(0, 3, nnz // 3)  # hub rows
    val = rng.standard_normal(nnz)
    sc, spill = build_stream_chunks(row, col, val, m)
    nw2 = max(1, -(-m // RW_ROWS))
    x = rng.standard_normal(n).astype(np.float32)
    # span slack for the kernel's chunk-permuted x staging; these small
    # matrices (n <= 8192: one superspan at any width) always pick the
    # 64-row span, so a 128-row pad suffices
    xpad = np.zeros(((n + 127) // 128 + 128) * 128, np.float32)
    xpad[:n] = x
    ys = stream_class_call(sc, jnp.asarray(xpad.reshape(-1, 128)), nw2,
                           interpret=True)
    got = (np.asarray(ys).reshape(8, nw2, 128).transpose(1, 0, 2)
           .reshape(-1)[:m].astype(np.float64))
    np.add.at(got, spill[0], spill[2] * x[spill[1]])
    want = np.zeros(m, np.float64)
    np.add.at(want, row, val * x[col].astype(np.float64))
    err = np.max(np.abs(got - want) / (1.0 + np.abs(want)))
    assert err < 1e-5, f"stream relerr {err}"


@pytest.mark.parametrize("m,n,nnz,seed,heavy", [
    (2048, 2048, 5000, 1, False),
    (4096, 4096, 40000, 2, False),
    (1000, 3000, 20000, 3, False),      # non-multiple m/n
    (4096, 4096, 30000, 4, True),       # hub rows: long same-row runs
    (128, 128, 300, 5, False),
])
def test_stream_engine_matches_golden(m, n, nnz, seed, heavy):
    _run_stream(m, n, nnz, seed, heavy_row=heavy)


def test_stream_dense_windows_no_spill():
    # dense windows force the full round budget; nothing should spill
    rng = np.random.default_rng(6)
    m = n = 8192
    nnz = 200000
    row = rng.integers(0, m, nnz).astype(np.int64)
    col = rng.integers(0, n, nnz).astype(np.int64)
    val = rng.standard_normal(nnz)
    sc, spill = build_stream_chunks(row, col, val, m)
    assert spill[0].size < nnz // 100
    _run_stream(m, n, nnz, 6)


def test_full_spmv_with_stream_forced():
    csr = generate.get_matrix("mixed_small")
    tm = tile_create(csr)
    plan = build_lane_plan(tm, use_stream=True)
    assert plan.stream is not None
    x = np.linspace(-1, 1, csr.n).astype(np.float32)
    y = np.asarray(spmv_pallas(plan, jnp.asarray(x), interpret=True))
    want = csr.to_dense().astype(np.float64) @ x
    err = np.max(np.abs(y - want) / (1.0 + np.abs(want)))
    assert err < 1e-4


def test_full_spmv_nondyadic_inputs():
    # non-dyadic x/values catch bf16 truncation in the one-hot matmuls
    csr = generate.get_matrix("mixed_small")
    tm = tile_create(csr)
    plan = build_lane_plan(tm, use_stream=False)
    rng = np.random.default_rng(0)
    x = rng.standard_normal(csr.n).astype(np.float32)
    y = np.asarray(spmv_pallas(plan, jnp.asarray(x), interpret=True))
    want = csr.to_dense().astype(np.float64) @ x
    err = np.max(np.abs(y - want) / (1.0 + np.abs(want)))
    assert err < 1e-4


def _skewed_csr(heavy_nnz=40000, light_nnz=8, n_windows=24, seed=7):
    """Windows 0-1 scatter entries over every superspan (many slabs);
    the rest confine ~8 entries to one superspan (1 slab) — the
    window-load skew split_stream_chunks exists for."""
    from tilespmv_tpu.io.mmio import CSRMatrix
    rng = np.random.default_rng(seed)
    m = n = n_windows * 1024
    rows, cols = [], []
    for w in range(n_windows):
        k = heavy_nnz if w < 2 else light_nnz
        rows.append(rng.integers(w * 1024, (w + 1) * 1024, k))
        cols.append(rng.integers(0, n if w < 2 else 8192, k))
    r = np.concatenate(rows)
    c = np.concatenate(cols)
    key = np.unique(r.astype(np.int64) * n + c)
    r, c = key // n, key % n
    v = rng.standard_normal(r.size)
    indptr = np.concatenate(
        [[0], np.cumsum(np.bincount(r, minlength=m))]).astype(np.int64)
    return CSRMatrix((m, n), indptr, c.astype(np.int64), v)


def test_stream_split_two_rate_classes():
    # skewed window loads -> (base, heavy) pair with disjoint windows,
    # heavy chained into base's output buffer via input_output_aliasing
    csr = _skewed_csr()
    tm = tile_create(csr)
    plan = build_lane_plan(tm)
    assert plan.stream is not None and plan.stream2 is not None
    assert plan.stream.s_batch < plan.stream2.s_batch
    base_w = set(np.asarray(plan.stream.cw).tolist())
    heavy_w = set(np.asarray(plan.stream2.cw).tolist())
    assert not (base_w & heavy_w)
    nw2 = plan.n_stream_windows
    assert base_w | heavy_w == set(range(nw2))
    x = np.linspace(-1, 1, csr.n).astype(np.float32)
    y = np.asarray(spmv_pallas(plan, jnp.asarray(x), interpret=True))
    want = np.zeros(csr.m)
    np.add.at(want, np.repeat(np.arange(csr.m), np.diff(csr.indptr)),
              csr.data * x[csr.indices].astype(np.float64))
    err = np.max(np.abs(y - want) / (1.0 + np.abs(want)))
    assert err < 1e-4

    # forcing one global s_batch must keep the class single
    p1 = build_lane_plan(tm, stream_s_batch=8)
    assert p1.stream2 is None


def test_stream_split_df64_exact():
    import jax
    jax.config.update("jax_enable_x64", True)
    csr = _skewed_csr(seed=11)
    tm = tile_create(csr)
    plan = build_lane_plan(tm, compute_dtype=jnp.float64)
    assert plan.stream2 is not None and plan.stream.df64
    x = np.linspace(-1, 1, csr.n)
    y = np.asarray(spmv_pallas(plan, jnp.asarray(x), interpret=True))
    want = np.zeros(csr.m)
    np.add.at(want, np.repeat(np.arange(csr.m), np.diff(csr.indptr)),
              csr.data * x[csr.indices])
    err = np.max(np.abs(y - want) / (1.0 + np.abs(want)))
    assert err < 1e-10


def test_pick_s_batch_matches_window_population():
    from tilespmv_tpu.ops.pallas.stream_plan import (pick_s_batch,
                                                     pick_stream_split)
    # 64 windows of 11 slabs: one step per window at s=11 beats the
    # power-of-2 candidates (5 padding slabs at s=16, 3 steps at s=4)
    wcnt = np.full(64, 11, np.int64)
    assert pick_s_batch(wcnt) == 11
    s1, s2, heavy = pick_stream_split(wcnt)
    assert s2 is None and s1 == 11      # uniform loads: no split
    # skewed: many 1-slab windows + a few 100-slab windows -> two rates
    wcnt = np.concatenate([np.ones(60, np.int64),
                           np.full(4, 100, np.int64)])
    s1, s2, heavy = pick_stream_split(wcnt)
    assert s2 is not None and s1 < s2
    assert heavy.sum() == 4 and heavy[-4:].all()


def test_adaptive_span_rows_very_sparse():
    """Very sparse large matrices widen the stream superspan (fewer,
    fuller slabs: 16% -> 63% fill at 524k^2; BASELINE.md round 3). The
    picker must widen here and the wide-span kernel must stay exact."""
    from tilespmv_tpu.io.mmio import CSRMatrix
    from tilespmv_tpu.ops.pallas.stream_plan import pick_span_rows
    from tilespmv_tpu.ops.spmv import TileSpMV
    rng = np.random.default_rng(41)
    m = n = 32768
    nnz = 30000
    key = np.unique(rng.integers(0, m, nnz).astype(np.int64) * n
                    + rng.integers(0, n, nnz).astype(np.int64))
    row, col = key // n, key % n
    val = rng.standard_normal(row.size)
    assert pick_span_rows(row, col, m) > 64
    indptr = np.concatenate(
        [[0], np.cumsum(np.bincount(row, minlength=m))]).astype(np.int64)
    csr = CSRMatrix((m, n), indptr, col.astype(np.int64), val)
    op = TileSpMV(csr, backend="pallas")
    st = op.plan.stream
    # hypersparse populations must leave the default geometry by ONE of
    # the two escape hatches: a widened superspan (round 3) or the
    # dual-span packing (round 4 — cheaper here: merging arbitrary
    # groups at span 64 stages half the chunks of a 256-row span)
    assert st is not None and (st.span_rows > 64 or st.dual)
    x = rng.standard_normal(n).astype(np.float32)
    y = np.asarray(op(x))
    ref = np.zeros(m)
    np.add.at(ref, row, val * x[col].astype(np.float64))
    # the reference harness gate (1% relative with an absolute floor:
    # near-zero rows see the engine's absolute prefix-difference error)
    assert not (np.abs(y - ref) > 0.01 * np.abs(ref) + 1e-4).any()


def test_adaptive_span_rows_df64():
    """The double-f32 stream kernel carries the widened superspan too
    (same plan, (hi, lo) staging loops sized by span_rows)."""
    import jax
    if not jax.config.jax_enable_x64:
        pytest.skip("x64 disabled")
    from tilespmv_tpu.io.mmio import CSRMatrix
    from tilespmv_tpu.ops.spmv import TileSpMV
    rng = np.random.default_rng(43)
    m = n = 32768
    key = np.unique(rng.integers(0, m, 25000).astype(np.int64) * n
                    + rng.integers(0, n, 25000).astype(np.int64))
    row, col = key // n, key % n
    val = rng.standard_normal(row.size)
    indptr = np.concatenate(
        [[0], np.cumsum(np.bincount(row, minlength=m))]).astype(np.int64)
    csr = CSRMatrix((m, n), indptr, col.astype(np.int64), val)
    op = TileSpMV(csr, compute_dtype=jnp.float64)
    assert op.backend == "pallas"
    assert op.plan.stream is not None and op.plan.stream.df64
    assert op.plan.stream.span_rows > 64 or op.plan.stream.dual
    x = rng.standard_normal(n)
    y = np.asarray(op(x))
    ref = np.zeros(m)
    np.add.at(ref, row, val * x[col])
    mag = np.abs(val).sum() / m
    assert np.max(np.abs(y - ref) / (1 + mag + np.abs(ref))) < 1e-10


def test_split_composes_with_wide_span():
    """The two-rate split re-batches wide-span classes too: span_rows
    must survive the rebuild and the pair must stay exact."""
    from tilespmv_tpu.io.mmio import CSRMatrix
    from tilespmv_tpu.ops.spmv import TileSpMV
    rng = np.random.default_rng(59)
    m = n = 32768
    # skewed: two heavy windows + sparse tail, sparse enough overall
    # that the picker widens the span
    rows = [rng.integers(0, 2048, 30000)]
    cols = [rng.integers(0, n, 30000)]
    for w in range(2, 32):
        rows.append(rng.integers(w * 1024, (w + 1) * 1024, 120))
        cols.append(rng.integers(0, n, 120))
    r = np.concatenate(rows).astype(np.int64)
    c = np.concatenate(cols).astype(np.int64)
    key = np.unique(r * n + c)
    r, c = key // n, key % n
    v = rng.standard_normal(r.size)
    indptr = np.concatenate(
        [[0], np.cumsum(np.bincount(r, minlength=m))]).astype(np.int64)
    csr = CSRMatrix((m, n), indptr, c.astype(np.int64), v)
    op = TileSpMV(csr, backend="pallas")
    st = op.plan.stream
    assert st is not None
    if op.plan.stream2 is not None:
        assert op.plan.stream2.span_rows == st.span_rows
    x = rng.standard_normal(n).astype(np.float32)
    y = np.asarray(op(x))
    ref = np.zeros(m)
    np.add.at(ref, r, v * x[c].astype(np.float64))
    assert not (np.abs(y - ref) > 0.01 * np.abs(ref) + 1e-4).any()


# --- dual-span slab geometry (round 4) ---

def _golden(m, row, col, val, x):
    want = np.zeros(m, np.float64)
    np.add.at(want, row, val * x[col].astype(np.float64))
    return want


def _call_stream(sc, x, m, interpret=True):
    from tilespmv_tpu.ops.pallas.stream_plan import MAX_SPAN_ROWS
    nw2 = max(1, -(-m // RW_ROWS))
    rows = -(-x.shape[0] // 128) + MAX_SPAN_ROWS
    xpad = np.zeros(rows * 128, x.dtype)
    xpad[: x.shape[0]] = x
    ys = stream_class_call(sc, jnp.asarray(xpad.reshape(-1, 128)), nw2,
                           interpret=interpret)
    if sc.df64:
        y = (np.asarray(ys[0], np.float64)
             + np.asarray(ys[1], np.float64))
    else:
        y = np.asarray(ys, np.float64)
    return (y.reshape(8, nw2, 128).transpose(1, 0, 2).reshape(-1)[:m])


@pytest.mark.parametrize("dtype,tol", [(np.float32, 1e-5),
                                       (np.float64, 1e-12)])
def test_dual_span_matches_golden(dtype, tol):
    # many ~0.3-0.7-slab (window, span) groups: the dual packing's
    # target population; check correctness + that slabs actually merge
    rng = np.random.default_rng(11)
    m = n = 16 * 1024
    nnz = 100_000
    row = rng.integers(0, m, nnz).astype(np.int64)
    col = rng.integers(0, n, nnz).astype(np.int64)
    key = row * n + col
    _, ix = np.unique(key, return_index=True)
    row, col = row[ix], col[ix]
    val = rng.standard_normal(row.size)
    x = rng.standard_normal(n).astype(dtype)
    mono, _ = build_stream_chunks(row, col, val, m, compute_dtype=dtype,
                                  span_rows=64, dual=False)
    dual, _ = build_stream_chunks(row, col, val, m, compute_dtype=dtype,
                                  span_rows=64, dual=True,
                                  use_native=False)
    assert dual.dual and dual.sbase2 is not None
    assert dual.nslabs < mono.nslabs
    vB = np.asarray(dual.vidx).astype(np.int32)
    assert int((vB >> 13 & 1).sum()) > 0     # shared slabs exist
    want = _golden(m, row, col, val, x)
    for sc in (mono, dual):
        got = _call_stream(sc, x, m)
        err = np.max(np.abs(got - want) / (1.0 + np.abs(want)))
        assert err < tol, (sc.dual, err)


def test_dual_span_split_composes():
    # the two-rate (base, heavy) split must carry sbase2/dual through
    from tilespmv_tpu.ops.pallas.stream_plan import split_stream_chunks
    rng = np.random.default_rng(12)
    m = n = 8 * 1024
    heavy_w = rng.integers(0, 1024, 60_000).astype(np.int64)
    light = rng.integers(1024, m, 4_000).astype(np.int64)
    row = np.concatenate([heavy_w, light])
    col = rng.integers(0, n, row.size).astype(np.int64)
    key = row * n + col
    _, ix = np.unique(key, return_index=True)
    row, col = row[ix], col[ix]
    val = rng.standard_normal(row.size)
    x = rng.standard_normal(n).astype(np.float32)
    st, _ = build_stream_chunks(row, col, val, m, span_rows=64,
                                dual=True, use_native=False,
                                device=False, stack=False)
    base, heavy = split_stream_chunks(st, raw_planes=True)
    assert base.dual and base.sbase2 is not None
    want = _golden(m, row, col, val, x)
    got = _call_stream(base, x, m)
    if heavy is not None:
        assert heavy.dual and heavy.sbase2 is not None
        got2 = _call_stream(heavy, x, m)
        # disjoint window sets: heavy overwrites its own windows
        hw = np.zeros(-(-m // RW_ROWS), bool)
        hw[np.asarray(heavy.cw)] = True
        wmask = hw[np.arange(m) // RW_ROWS]
        got = np.where(wmask, got2, got)
    err = np.max(np.abs(got - want) / (1.0 + np.abs(want)))
    assert err < 1e-5, err


def test_pick_geometry_defaults():
    from tilespmv_tpu.ops.pallas.stream_plan import pick_geometry
    rng = np.random.default_rng(13)
    # dense-ish windows with big groups: mono at the default span
    m = n = 4096
    row = rng.integers(0, m, 120_000).astype(np.int64)
    col = rng.integers(0, n, 120_000).astype(np.int64)
    span, dual = pick_geometry(row, col, m)
    assert span == 64 and dual is False


def test_free_placement_stream_class():
    """Forced free-placement geometry (StreamChunks.xmap): each sublane
    slot maps to an arbitrary 1024-value x block via a plan-time gather
    map; the kernel runs the plain mono span-64 path over the x copy.
    Built for block-clustered hypersparse populations; the cost gate
    (pick_geometry_fp) correctly REJECTS uniform hypersparse (cells too
    small) — that rejection is asserted too."""
    import jax.numpy as jnp

    from tilespmv_tpu.ops.pallas import stream_plan as sp
    from tilespmv_tpu.ops.pallas.kernels import stream_class_call
    rng = np.random.default_rng(11)
    # sublane-collision population: ~100-entry (window, block) cells
    # whose blocks are all congruent mod 8, so EVERY aligned geometry
    # (any span, mono or dual) lands them in one sublane per group
    # while free placement spreads them 8 per slab
    m = n = 65536
    ncells = 384
    cw = rng.integers(0, m // 1024, ncells)
    cb = rng.integers(0, n // 8192, ncells) * 8
    rows = np.repeat(cw, 100) * 1024 + rng.integers(0, 1024, 100 * ncells)
    cols = np.repeat(cb, 100) * 1024 + rng.integers(0, 1024, 100 * ncells)
    vals = rng.standard_normal(100 * ncells)
    span, dual, fp = sp.pick_geometry_fp(rows, cols, m)
    assert fp, "clustered population must take free placement"
    st, _ = sp.build_stream_chunks(rows, cols, vals, m, fp=True)
    assert st.xmap is not None and st.span_rows == sp.SPAN_ROWS
    x = np.linspace(-1, 1, n).astype(np.float32)
    xrows = -(-n // 128) + sp.MAX_SPAN_ROWS
    xrows = -(-xrows // sp.SPAN_ROWS) * sp.SPAN_ROWS
    x2d = (jnp.zeros(xrows * 128, jnp.float32).at[:n].set(x)
           .reshape(-1, 128))
    nw = m // 1024
    y = np.asarray(stream_class_call(st, x2d, nw, interpret=True))
    ref = np.zeros(nw * 1024)
    np.add.at(ref, rows, vals * x[cols])
    yflat = np.asarray(y).reshape(8, nw, 128).transpose(1, 0, 2)
    # output layout: window w's row (q*128 + j) at [q, w*128 + j]
    yflat = yflat.reshape(nw * 1024)
    err = np.max(np.abs(yflat - ref)) / np.max(np.abs(ref))
    assert err < 1e-4, err
    # uniform hypersparse must REJECT fp (cells avg ~10 entries)
    ur = rng.integers(0, m, 40000)
    uc_ = rng.integers(0, n, 40000)
    _, _, fp_u = sp.pick_geometry_fp(ur, uc_, m)
    assert not fp_u


def test_scatter_encodings_match_rounds():
    """offs and roll scatter encodings (round-5 candidates; rounds
    stays the measured default) produce identical results."""
    import jax.numpy as jnp

    from tilespmv_tpu import tile_create
    from tilespmv_tpu.ops.pallas import stream_plan as sp
    from tilespmv_tpu.ops.pallas.kernels import spmv_pallas
    from tilespmv_tpu.ops.pallas.lane_plan import build_lane_plan
    csr = generate.power_law(2048, 2048, 10, seed=6)
    tm = tile_create(csr)
    x = np.linspace(-1, 1, csr.n).astype(np.float32)
    ys = {}
    old = sp.STREAM_SCATTER
    try:
        for scat in ("rounds", "offs", "roll"):
            sp.STREAM_SCATTER = scat
            plan = build_lane_plan(tm)
            assert plan.stream.scatter == scat
            ys[scat] = np.asarray(spmv_pallas(plan, jnp.asarray(x),
                                              interpret=True))
    finally:
        sp.STREAM_SCATTER = old
    # the encodings reduce in different orders, so agreement is to f32
    # rounding, not bitwise
    np.testing.assert_allclose(ys["rounds"], ys["offs"], rtol=1e-5,
                               atol=1e-4)
    np.testing.assert_allclose(ys["rounds"], ys["roll"], rtol=1e-5,
                               atol=1e-4)
