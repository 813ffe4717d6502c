"""Converter + selector tests (reference csr2tile.h semantics)."""
import numpy as np
import pytest

from tilespmv_tpu import (FMT_COO, FMT_CSR, FMT_DNS, FMT_DNSCOL, FMT_DNSROW,
                          FMT_ELL, TileConfig, csr_from_coo, tile_create)
from tilespmv_tpu.io import generate
from tilespmv_tpu.ops.cpu_reference import plan_chunks, spmv_cpu


def _tile_matrix_from_dense(dense):
    dense = np.asarray(dense, dtype=np.float64)
    rows, cols = np.nonzero(dense)
    csr = csr_from_coo(dense.shape[0], dense.shape[1], rows, cols,
                       dense[rows, cols])
    return tile_create(csr)


def _single_tile(dense16):
    """Convert a single 16x16 tile and return its TileMatrix."""
    assert dense16.shape == (16, 16)
    return _tile_matrix_from_dense(dense16)


def tiled_to_dense(tm):
    """Reconstruct the dense matrix from all payload buckets via spmv with
    unit vectors — cheap for the small test matrices."""
    n = tm.n
    out = np.zeros((tm.m, n))
    for j in range(n):
        e = np.zeros(n)
        e[j] = 1.0
        out[:, j] = spmv_cpu(tm, e)
    return out


# ---------------- selector unit tests (csr2tile.h:140-328) ----------------

def test_selector_dense():
    d = np.zeros((16, 16))
    d.ravel()[:192] = 1.0  # exactly at threshold 0.75*256 = 192
    tm = _single_tile(d)
    assert tm.fmt.tolist() == [FMT_DNS]


def test_selector_dense_below_threshold():
    d = np.zeros((16, 16))
    d.ravel()[:191] = 1.0  # one below threshold -> not dense
    # 191 nnz, irregular rows -> CSR (rows 0..10 full + partial row 11)
    tm = _single_tile(d)
    assert tm.fmt.tolist() != [FMT_DNS]


def test_selector_coo():
    d = np.zeros((16, 16))
    idx = np.random.default_rng(0).choice(256, 12, replace=False)
    d.ravel()[idx] = 1.0  # exactly at COO_NNZ_TH = 12
    tm = _single_tile(d)
    assert tm.fmt.tolist() == [FMT_COO]
    assert tm.residual.nnz == 12  # extracted (csr2tile.h:899-960)


def test_selector_coo_boundary_13_is_not_coo():
    d = np.zeros((16, 16))
    idx = np.random.default_rng(1).choice(256, 13, replace=False)
    d.ravel()[idx] = 1.0
    tm = _single_tile(d)
    assert tm.fmt.tolist() != [FMT_COO]


def test_selector_dense_row():
    d = np.zeros((16, 16))
    d[3, :] = 1.0
    d[7, :] = 2.0  # two full rows, others empty -> dense-row
    tm = _single_tile(d)
    assert tm.fmt.tolist() == [FMT_DNSROW]
    np.testing.assert_array_equal(tm.dnsrow.row_ids, [3, 7])


def test_selector_dense_col():
    d = np.zeros((16, 16))
    d[:, 2] = 1.0
    d[:, 9] = 3.0  # two full cols -> dense-col
    tm = _single_tile(d)
    assert tm.fmt.tolist() == [FMT_DNSCOL]
    np.testing.assert_array_equal(tm.dnscol.col_ids, [2, 9])


def test_selector_dense_row_precedes_dense_col():
    # A full-rows AND full-cols tile: reference checks dense-row first
    # (csr2tile.h:171-198). All 16 rows full would be dense; use partial.
    d = np.zeros((16, 16))
    d[0:16, 0:16] = 0.0
    d[5, :] = 1.0  # one full row; col counts are 1 each (not full cols)
    tm = _single_tile(d)
    assert tm.fmt.tolist() == [FMT_DNSROW]


def test_selector_ell():
    d = np.zeros((16, 16))
    for r in range(16):
        d[r, (r * 3) % 16] = 1.0
        d[r, (r * 3 + 5) % 16] = 2.0
        d[r, (r * 7 + 3) % 16] = 3.0
    # wait: rows might collide making some rows have <3 entries; ensure
    # distinct cols per row
    d = np.zeros((16, 16))
    for r in range(16):
        for k in range(3):
            d[r, (r + 5 * k) % 16] = 1.0 + k
    # 48 nnz, uniform 3 per row -> cv = 0 <= 0.2 -> ELL
    tm = _single_tile(d)
    assert tm.fmt.tolist() == [FMT_ELL]
    assert tm.ell.width.tolist() == [3]


def test_selector_csr_fallback():
    d = np.zeros((16, 16))
    rng = np.random.default_rng(2)
    # highly irregular rows: row r gets r entries (cv > 0.2), 120 nnz total
    for r in range(16):
        cols = rng.choice(16, r, replace=False)
        d[r, cols] = 1.0
    tm = _single_tile(d)
    assert tm.fmt.tolist() == [FMT_CSR]


def test_selector_ell_cv_boundary():
    # rows alternating 4 and 6 entries: mean 5, std 1, cv = 0.2 -> ELL
    d = np.zeros((16, 16))
    for r in range(16):
        k = 4 if r % 2 == 0 else 6
        d[r, :k] = 1.0
    tm = _single_tile(d)
    assert tm.fmt.tolist() == [FMT_ELL]
    assert tm.ell.width.tolist() == [6]


# ---------------- structural invariants ----------------

def test_tile_grid_structure():
    csr = generate.mixed_structure(256, 256, seed=0)
    tm = tile_create(csr)
    tm.validate()
    assert tm.tilem == 16 and tm.tilen == 16
    # tile_nnz sums to nnz
    assert int(tm.tile_nnz[-1]) == csr.nnz
    # tiles sorted by (row, col)
    key = tm.tile_rowidx.astype(np.int64) * tm.tilen + tm.tile_columnidx
    assert np.all(np.diff(key) > 0)


def test_partial_tiles():
    # m, n not multiples of 16 exercise rowlen/collen logic
    # (csr2tile.h:144,148)
    csr = generate.mixed_structure(100, 75, seed=3)
    tm = tile_create(csr)
    tm.validate()
    dense = tiled_to_dense(tm)
    np.testing.assert_allclose(dense, csr.to_dense(), rtol=1e-14)


def test_truncate_rows_parity():
    # reference main.cu:71 truncates rows down to a multiple of 16
    csr = generate.mixed_structure(100, 75, seed=3)
    tm = tile_create(csr, TileConfig(truncate_rows_to_tile=True))
    assert tm.m == 96
    dense = tiled_to_dense(tm)
    np.testing.assert_allclose(dense, csr.to_dense()[:96], rtol=1e-14)


@pytest.mark.parametrize("name", ["mixed_small", "mixed_medium"])
def test_roundtrip_matches_dense(name):
    csr = generate.get_matrix(name)
    tm = tile_create(csr)
    tm.validate()
    x = ((np.arange(tm.n) % 10) / 4.0).astype(np.float64)
    y = spmv_cpu(tm, x)
    y_golden = csr.matvec(x)
    # dyadic-rational values -> exact equality, like the reference's CPU
    # check (tilespmv_cpu.h:277)
    np.testing.assert_array_equal(y, y_golden)


def test_residual_equals_coo_tiles():
    csr = generate.mixed_structure(256, 256, seed=5)
    tm = tile_create(csr)
    x = np.linspace(0.5, 1.5, tm.n)
    y_inline = spmv_cpu(tm, x, include_coo_tiles=True,
                        include_residual=False)
    y_resid = spmv_cpu(tm, x, include_coo_tiles=False,
                       include_residual=True)
    np.testing.assert_allclose(y_inline, y_resid, rtol=1e-12)


def test_hyb_enabled_roundtrip():
    cfg = TileConfig(enable_hyb=True, hyb_cv_threshold=0.3, hyb_max_coo=64)
    csr = generate.power_law(256, 256, 20, seed=6)
    tm = tile_create(csr, cfg)
    tm.validate()
    x = ((np.arange(tm.n) % 10) / 4.0).astype(np.float64)
    y = spmv_cpu(tm, x, include_coo_tiles=True, include_residual=False)
    np.testing.assert_array_equal(y, csr.matvec(x))
    # with residual on, HYB overflow comes from the residual instead
    y2 = spmv_cpu(tm, x, include_coo_tiles=False, include_residual=True)
    np.testing.assert_array_equal(y2, csr.matvec(x))


def test_format_histogram_counts():
    csr = generate.mixed_structure(512, 512, seed=7)
    tm = tile_create(csr)
    hist = tm.format_histogram()
    assert sum(hist.values()) == tm.tilenum
    # the mixed corpus must hit at least CSR/COO/ELL/dense
    assert hist["coo"] > 0 and hist["dns"] > 0


# ---------------- chunk planner (tilespmv_cpu.h:68-118) ----------------

def test_plan_chunks_short_rows_single_chunk():
    csr = generate.banded(64, 64, 1, seed=0)
    tm = tile_create(csr)
    row_idx, is_split, start, stop = plan_chunks(tm)
    counts = np.diff(tm.tile_ptr)
    assert (~is_split[counts[row_idx] <= tm.config.chunk_tiles]).all()
    # chunks tile ranges cover every tile exactly once
    covered = np.concatenate(
        [np.arange(s, e) for s, e in zip(start, stop)]) if len(start) else []
    np.testing.assert_array_equal(np.sort(covered), np.arange(tm.tilenum))


def test_plan_chunks_long_row_split():
    # one tile-row with 16 tiles -> ceil(16/4) = 4 chunks, all split
    d = np.zeros((16, 256))
    d[0, ::16] = 1.0  # 16 tiles each with 1 nnz
    tm = _tile_matrix_from_dense(d)
    row_idx, is_split, start, stop = plan_chunks(tm)
    assert len(row_idx) == 4
    assert is_split.all()
    np.testing.assert_array_equal(stop - start, [4, 4, 4, 4])
