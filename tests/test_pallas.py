"""Pallas engine tests (interpret mode on CPU; compiled path runs on TPU).

The same kernels compile and run on the real chip — interpret mode
exercises identical kernel code and plan layouts (SURVEY.md §5: Pallas
kernels are race-free by construction; interpreter mode is the debug tool).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tilespmv_tpu import TileConfig, tile_create
from tilespmv_tpu.io import generate
from tilespmv_tpu.ops.pallas.lane_plan import (PANEL_TC, ROW_WINDOW,
                                               T_CHOICES, build_lane_plan)
from tilespmv_tpu.ops.pallas.kernels import spmv_pallas
from tilespmv_tpu.ops.spmv import TileSpMV


def _check(csr, rtol=2e-4):
    tm = tile_create(csr)
    plan = build_lane_plan(tm)
    x = np.linspace(-1, 1, csr.n).astype(np.float32)
    y = np.asarray(spmv_pallas(plan, jnp.asarray(x), interpret=True))
    y_golden = csr.to_dense().astype(np.float32) @ x
    np.testing.assert_allclose(y, y_golden, rtol=rtol, atol=1e-4)
    return plan


ARCHETYPES = {
    "mixed": lambda: generate.mixed_structure(512, 512, seed=1),
    "banded": lambda: generate.banded(600, 600, 5, seed=2),
    "uniform": lambda: generate.random_uniform(512, 512, 0.003, seed=3),
    "powerlaw": lambda: generate.power_law(512, 512, 10, seed=4),
    "ell": lambda: generate.ell_regular(512, 512, 6, seed=5),
    "dense_blocks": lambda: generate.dense_blocks(512, 512, num_blocks=96,
                                                  seed=6),
    "full_rows": lambda: generate.full_rows(512, 512, num_rows=4, seed=7),
    "full_cols": lambda: generate.full_cols(512, 512, num_cols=4, seed=8),
}


@pytest.mark.parametrize("name", sorted(ARCHETYPES))
def test_pallas_archetypes(name):
    _check(ARCHETYPES[name]())


def test_pallas_partial_tiles():
    _check(generate.mixed_structure(1000, 777, seed=11))


def test_pallas_wide_matrix_spans():
    # many column spans per row window exercises the chunk splitting
    csr = generate.random_uniform(64, 65536, 0.0005, seed=12)
    _check(csr)


def test_pallas_row_window_boundaries():
    # tiles straddling ROW_WINDOW boundaries
    m = ROW_WINDOW * 16 * 2 + 160
    csr = generate.banded(m, m, 2, seed=13)
    _check(csr)


def test_pallas_hyb_overflow_residual():
    cfg = TileConfig(enable_hyb=True, hyb_cv_threshold=0.3, hyb_max_coo=64)
    csr = generate.power_law(512, 512, 20, seed=14)
    tm = tile_create(csr, cfg)
    plan = build_lane_plan(tm)
    if plan.residual.val.shape[0] == 0:
        pytest.skip("selector produced no HYB overflow for this seed")
    x = np.linspace(-1, 1, 512).astype(np.float32)
    y = np.asarray(spmv_pallas(plan, jnp.asarray(x), interpret=True))
    np.testing.assert_allclose(y, csr.to_dense().astype(np.float32) @ x,
                               rtol=2e-4, atol=1e-4)


def test_tilespmv_pallas_backend():
    csr = generate.mixed_structure(512, 512, seed=15)
    op = TileSpMV(csr, backend="pallas")
    x = np.linspace(-1, 1, 512).astype(np.float32)
    y = np.asarray(op(x))
    np.testing.assert_allclose(y, csr.to_dense().astype(np.float32) @ x,
                               rtol=2e-4, atol=1e-4)


def test_lane_plan_structure():
    csr = generate.mixed_structure(1024, 1024, seed=16)
    tm = tile_create(csr)
    plan = build_lane_plan(tm)
    d = plan.dense
    assert d.val.shape[1:] == (16, 16, d.t_lanes)
    assert d.t_lanes in T_CHOICES
    # every step's panel ids are within the padded x panel range
    assert int(jnp.max(d.pb)) < plan.n_panels
    # chunk windows are non-decreasing (VMEM-resident revisiting relies
    # on consecutive chunks sharing the output block)
    cw = np.asarray(d.cw)
    assert np.all(np.diff(cw) >= 0)
    # first-flags mark exactly the window transitions
    first = np.asarray(d.cfirst).astype(bool)
    assert first[0]
    np.testing.assert_array_equal(first[1:], np.diff(cw) > 0)


def test_lane_plan_bytes_and_flops():
    csr = generate.banded(1024, 1024, 4, seed=17)
    tm = tile_create(csr)
    plan = build_lane_plan(tm)
    assert plan.flops() == 2 * csr.nnz
    assert plan.bytes_accessed() > 0


def test_prefix_route_matches_golden():
    """The prefix dense/W routing (triangular-MXU lane prefix + boundary
    gathers over plan-time rend planes) lost the round-4 interleaved e2e
    arbitration and is no longer the default, but stays exact and
    re-flippable (lane_plan.DENSE_ROUTE comment). Pin its correctness so
    the non-default path cannot silently rot (round-4 advisor)."""
    from tilespmv_tpu.ops.pallas import lane_plan
    csr = generate.mixed_structure(1024, 1024, seed=16)
    tm = tile_create(csr)
    x = np.linspace(-1, 1, csr.n).astype(np.float32)
    y_golden = csr.to_dense().astype(np.float32) @ x
    old = lane_plan.DENSE_ROUTE
    try:
        lane_plan.DENSE_ROUTE = "prefix"
        # fresh plan per route: flipping the module variant does not
        # re-trace an existing op's jit cache (CLAUDE.md round-4 gotcha)
        plan = build_lane_plan(tm)
        assert plan.dense is not None and plan.dense.route == "prefix"
        # prefix meta planes present: DENSE_MROWS + 2 * rpp rows
        assert plan.dense.meta.shape[1] > lane_plan.DENSE_MROWS
        y = np.asarray(spmv_pallas(plan, jnp.asarray(x), interpret=True))
        np.testing.assert_allclose(y, y_golden, rtol=2e-4, atol=1e-4)
    finally:
        lane_plan.DENSE_ROUTE = old
