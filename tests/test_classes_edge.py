"""Edge cases for the round-2 execution classes: band (brick) class on
partial tile rows, W-class capacity boundaries, fused SpMM k range, and
the df64 unique-row chunk cutting."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tilespmv_tpu.io import generate
from tilespmv_tpu.io.mmio import csr_from_coo
from tilespmv_tpu.core.convert import tile_create
from tilespmv_tpu.ops.pallas.lane_plan import (W_CHOICES, build_lane_plan)
from tilespmv_tpu.ops.pallas.kernels import spmv_pallas
from tilespmv_tpu.ops.spmv import TileSpMV


def _check(csr, plan=None, tol=1e-4):
    if plan is None:
        plan = build_lane_plan(tile_create(csr))
    x = np.linspace(-1.0, 1.0, csr.n).astype(np.float32)
    y = np.asarray(spmv_pallas(plan, jnp.asarray(x), interpret=True))
    ref = csr.to_dense().astype(np.float64) @ x
    err = np.max(np.abs(y - ref) / (1.0 + np.abs(ref)))
    assert err < tol, err
    return plan


def test_band_class_partial_last_tile_row():
    """m not a multiple of 16: the last band stripe has rowlen < 16."""
    csr = generate.banded(1000, 1000, 8, seed=3)
    plan = _check(csr)
    assert plan.band is not None


def test_band_class_partial_window():
    """tilem < ROW_WINDOW: band lanes only partially cover the window."""
    csr = generate.banded(640, 640, 8, seed=4)
    plan = _check(csr)
    assert plan.band is not None


def test_w_class_capacity_boundary(monkeypatch):
    """Tiles with exactly W-1 entries sit at each class's capacity; use
    enough tiles that the thin-class merging keeps real W classes.
    Routing is pinned to the fixed-threshold arm: the cost model may
    legitimately densify packed 95-entry populations, but this test's
    job is exercising the W-kernel capacity boundaries."""
    from tilespmv_tpu.ops.pallas import lane_plan
    monkeypatch.setattr(lane_plan, "ROUTE_MODE", "fixed")
    rng = np.random.default_rng(7)
    rows, cols = [], []
    t = 0
    # > 4*MIN_CLASS_TILES total so the small-matrix collapse
    # doesn't merge everything into one class
    for W, reps in ((16, 1100), (96, 1100)):
        for rep in range(reps):
            sl = rng.choice(256, W - 1, replace=False)
            rows.append((t // 64) * 16 + sl // 16)
            cols.append((t % 64) * 16 + sl % 16)
            t += 1
    rows = np.concatenate(rows)
    cols = np.concatenate(cols)
    vals = rng.standard_normal(rows.size)
    m = int(rows.max()) + 1
    n = int(cols.max()) + 1
    csr = csr_from_coo(m, n, rows, cols, vals)
    plan = _check(csr)
    widths = {s.width for s in plan.sparses}
    assert 16 in widths and 96 in widths


def test_fused_spmm_k_range():
    csr = generate.banded(512, 512, 10, seed=5)
    op = TileSpMV(csr, backend="pallas")
    ref = csr.to_dense().astype(np.float64)
    rng = np.random.default_rng(6)
    for k in (2, 5, 16):
        xs = rng.standard_normal((csr.n, k)).astype(np.float32)
        Y = np.asarray(op.matmat(xs))
        want = ref @ xs
        assert np.max(np.abs(Y - want) / (1 + np.abs(want))) < 1e-4, k


def test_fused_spmm_mixed_classes():
    """Fused SpMM is no longer band-gated (round-2 verdict, task 9):
    dense + W-class + stream plans run the per-class fused kernels."""
    csr = generate.mixed_structure(1024, 1024, seed=9)
    op = TileSpMV(csr, backend="pallas")
    assert op.plan.dense is not None or op.plan.sparses
    ref = csr.to_dense().astype(np.float64)
    rng = np.random.default_rng(7)
    xs = rng.standard_normal((csr.n, 8)).astype(np.float32)
    Y = np.asarray(op.matmat(xs))
    want = ref @ xs
    assert np.max(np.abs(Y - want) / (1 + np.abs(want))) < 1e-4


def test_spmm_k1_and_k17_fall_back_to_vmap():
    csr = generate.banded(512, 512, 10, seed=5)
    op = TileSpMV(csr, backend="pallas")
    ref = csr.to_dense().astype(np.float64)
    rng = np.random.default_rng(8)
    for k in (1, 17):
        xs = rng.standard_normal((csr.n, k)).astype(np.float32)
        Y = np.asarray(op.matmat(xs))
        want = ref @ xs
        assert np.max(np.abs(Y - want) / (1 + np.abs(want))) < 1e-4, k


def _df64_tiles_case(n_tile_rows: int, tiles_per_row: int, seed: int):
    rng = np.random.default_rng(seed)
    rows, cols = [], []
    for tr in range(n_tile_rows):
        for tc in rng.choice(64, tiles_per_row, replace=False):
            sl = np.arange(256)
            rows.append(tr * 16 + sl // 16)
            cols.append(int(tc) * 16 + sl % 16)
    rows = np.concatenate(rows)
    cols = np.concatenate(cols)
    vals = rng.standard_normal(rows.size)
    csr = csr_from_coo(n_tile_rows * 16, 1024, rows, cols, vals)
    op = TileSpMV(csr, compute_dtype=jnp.float64)
    assert op.backend == "pallas"
    x = rng.standard_normal(csr.n)
    y = np.asarray(op(x))
    ref = csr.to_dense().astype(np.float64) @ x
    mag = np.abs(csr.to_dense()) @ np.abs(x)
    assert np.max(np.abs(y - ref) / (1e-300 + mag)) < 1e-10
    return op.plan


def test_df64_dense_round_cutting():
    """df64 dense chunks may hold at most one tile per window column.
    A well-filled population (64 rows per round >= DF64_ROUND_FILL_MIN)
    stays dense, cut into rounds with bounded lane padding."""
    if not jax.config.jax_enable_x64:
        pytest.skip("x64 disabled")
    plan = _df64_tiles_case(64, 8, seed=9)
    d = plan.dense
    assert d is not None and d.df64
    ntiles = 64 * 8
    assert d.val.shape[0] * d.t_lanes <= 4 * ntiles


def test_df64_deep_tiles_stream_explosion():
    """Thin (window, round) groups would densify at huge lane padding
    (one round per tile on heavy rows); they run as entries in the
    exact df64 stream engine instead (lane_plan.DF64_ROUND_FILL_MIN)."""
    if not jax.config.jax_enable_x64:
        pytest.skip("x64 disabled")
    plan = _df64_tiles_case(8, 8, seed=9)    # 8 tiles/round < FILL_MIN
    assert plan.dense is None
    assert plan.stream is not None and plan.stream.df64


def test_band_rejected_for_scattered_matrices():
    csr = generate.random_uniform(4096, 4096, 0.01, seed=10)
    plan = build_lane_plan(tile_create(csr))
    assert plan.band is None


def test_cost_model_routing_arm(monkeypatch):
    """The model routing arm (lane_plan.ROUTE_MODE = "model"): a PACKED
    population of ~80-entry tiles (full lanes, local panels) densifies —
    matching the round-2 isolated crossover measurement — and the
    resulting plan stays exact. The default arm stays "fixed" until the
    COST constants are TPU-calibrated (see ROUTE_MODE comment)."""
    from tilespmv_tpu.ops.pallas import lane_plan
    monkeypatch.setattr(lane_plan, "ROUTE_MODE", "model")
    rng = np.random.default_rng(11)
    rows, cols = [], []
    for t in range(1024):
        sl = rng.choice(256, 80, replace=False)
        rows.append((t // 64) * 16 + sl // 16)
        cols.append((t % 64) * 16 + sl % 16)
    rows = np.concatenate(rows)
    cols = np.concatenate(cols)
    vals = rng.standard_normal(rows.size)
    csr = csr_from_coo(int(rows.max()) + 1, int(cols.max()) + 1,
                       rows, cols, vals)
    packed = _check(csr)
    assert packed.dense is not None and not packed.sparses


def test_route_modes_agree_on_exactness():
    """Both routing arms produce exact plans on a mixed matrix (they may
    route different classes; the result must not change)."""
    from tilespmv_tpu.ops.pallas import lane_plan
    csr = generate.mixed_structure(2048, 2048, seed=13)
    old = lane_plan.ROUTE_MODE
    try:
        for mode in ("fixed", "model"):
            lane_plan.ROUTE_MODE = mode
            _check(csr)
    finally:
        lane_plan.ROUTE_MODE = old
