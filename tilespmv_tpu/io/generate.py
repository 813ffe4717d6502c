"""Synthetic sparse-matrix corpus.

The reference benchmarks over 2,757 downloaded SuiteSparse matrices
(reference: external/CSR5_cuda/2757-matrix.csv, bench0.sh). This environment
has no network, so the framework ships deterministic generators that
reproduce the structural archetypes SuiteSparse covers — banded stencils,
power-law rows, dense blocks, full rows/columns, regular (ELL-like) rows —
so every per-tile format and the residual path get exercised and benchmarked.

All generators return canonical :class:`CSRMatrix` and are deterministic in
`seed`.
"""
from __future__ import annotations

import numpy as np

from .mmio import CSRMatrix, csr_from_coo


def _vals(rng: np.random.Generator, n: int, dtype) -> np.ndarray:
    # i % 10 value pattern keeps comparisons well conditioned, like the
    # reference driver's overwrite (main.cu:68-69); offset avoids zeros.
    return ((rng.integers(0, 10, n) + 1).astype(np.float64) / 4.0).astype(dtype)


def random_uniform(m: int, n: int, density: float, seed: int = 0,
                   dtype=np.float64) -> CSRMatrix:
    """Uniform random sparsity — mostly COO/CSR tiles + residual."""
    rng = np.random.default_rng(seed)
    nnz = max(1, int(m * n * density))
    rows = rng.integers(0, m, nnz)
    cols = rng.integers(0, n, nnz)
    return csr_from_coo(m, n, rows, cols, _vals(rng, nnz, dtype))


def banded(m: int, n: int, bandwidth: int, seed: int = 0,
           dtype=np.float64) -> CSRMatrix:
    """Diagonal band — dense and ELL tiles along the diagonal."""
    rng = np.random.default_rng(seed)
    offs = np.arange(-bandwidth, bandwidth + 1)
    rows = np.repeat(np.arange(m), offs.size)
    cols = rows + np.tile(offs, m)
    ok = (cols >= 0) & (cols < n)
    rows, cols = rows[ok], cols[ok]
    return csr_from_coo(m, n, rows, cols, _vals(rng, rows.size, dtype))


def ell_regular(m: int, n: int, row_nnz: int, seed: int = 0,
                dtype=np.float64) -> CSRMatrix:
    """Every row has exactly `row_nnz` entries at regular strides — ELL tiles."""
    rng = np.random.default_rng(seed)
    base = rng.integers(0, max(1, n // max(1, row_nnz)), (m, 1))
    stride = max(1, n // max(1, row_nnz))
    cols = (base + np.arange(row_nnz)[None, :] * stride) % n
    rows = np.repeat(np.arange(m), row_nnz)
    return csr_from_coo(m, n, rows, cols.ravel(), _vals(rng, rows.size, dtype))


def dense_blocks(m: int, n: int, block: int = 16, num_blocks: int = 8,
                 seed: int = 0, dtype=np.float64) -> CSRMatrix:
    """Fully dense `block x block` blocks on a grid — dense tiles."""
    rng = np.random.default_rng(seed)
    bi = rng.integers(0, max(1, m // block), num_blocks)
    bj = rng.integers(0, max(1, n // block), num_blocks)
    rr, cc = np.meshgrid(np.arange(block), np.arange(block), indexing="ij")
    rows = (bi[:, None, None] * block + rr[None]).ravel()
    cols = (bj[:, None, None] * block + cc[None]).ravel()
    ok = (rows < m) & (cols < n)
    rows, cols = rows[ok], cols[ok]
    return csr_from_coo(m, n, rows, cols, _vals(rng, rows.size, dtype))


def full_rows(m: int, n: int, num_rows: int = 8, seed: int = 0,
              dtype=np.float64) -> CSRMatrix:
    """A few completely dense rows — dense-row tiles."""
    rng = np.random.default_rng(seed)
    ridx = rng.choice(m, size=min(num_rows, m), replace=False)
    rows = np.repeat(ridx, n)
    cols = np.tile(np.arange(n), ridx.size)
    return csr_from_coo(m, n, rows, cols, _vals(rng, rows.size, dtype))


def full_cols(m: int, n: int, num_cols: int = 8, seed: int = 0,
              dtype=np.float64) -> CSRMatrix:
    """A few completely dense columns — dense-col tiles."""
    rng = np.random.default_rng(seed)
    cidx = rng.choice(n, size=min(num_cols, n), replace=False)
    cols = np.tile(cidx, m)
    rows = np.repeat(np.arange(m), cidx.size)
    return csr_from_coo(m, n, rows, cols, _vals(rng, rows.size, dtype))


def power_law(m: int, n: int, avg_nnz_per_row: int = 8, alpha: float = 1.5,
              seed: int = 0, dtype=np.float64) -> CSRMatrix:
    """Power-law row lengths (scale-free graphs) — CSR tiles + long rows."""
    rng = np.random.default_rng(seed)
    raw = rng.pareto(alpha, m) + 1.0
    lens = np.minimum((raw / raw.mean() * avg_nnz_per_row).astype(np.int64), n)
    lens = np.maximum(lens, 1)
    rows = np.repeat(np.arange(m), lens)
    cols = rng.integers(0, n, rows.size)
    return csr_from_coo(m, n, rows, cols, _vals(rng, rows.size, dtype))


def mixed_structure(m: int, n: int, seed: int = 0,
                    dtype=np.float64) -> CSRMatrix:
    """Superposition hitting all seven formats + residual in one matrix."""
    parts = [
        banded(m, n, 2, seed=seed, dtype=dtype),
        random_uniform(m, n, 2.0 / max(m, 1), seed=seed + 1, dtype=dtype),
        dense_blocks(m, n, num_blocks=max(2, m // 128), seed=seed + 2,
                     dtype=dtype),
        full_rows(m, n, num_rows=2, seed=seed + 3, dtype=dtype),
        full_cols(m, n, num_cols=2, seed=seed + 4, dtype=dtype),
        ell_regular(m, n, 4, seed=seed + 5, dtype=dtype),
    ]
    rows = np.concatenate(
        [np.repeat(np.arange(p.m), np.diff(p.indptr)) for p in parts])
    cols = np.concatenate([p.indices.astype(np.int64) for p in parts])
    vals = np.concatenate([p.data for p in parts])
    return csr_from_coo(m, n, rows, cols, vals)


# Named corpus used by tests and the benchmark sweep. Shapes chosen so the
# small ones convert instantly and the large ones stress HBM bandwidth.
CORPUS = {
    "mixed_small": lambda: mixed_structure(256, 256, seed=0),
    "mixed_medium": lambda: mixed_structure(4096, 4096, seed=1),
    "banded_medium": lambda: banded(8192, 8192, 8, seed=2),
    "uniform_sparse": lambda: random_uniform(8192, 8192, 0.001, seed=3),
    "powerlaw_medium": lambda: power_law(8192, 8192, 16, seed=4),
    "ell_medium": lambda: ell_regular(8192, 8192, 12, seed=5),
    "dense_blocks_medium": lambda: dense_blocks(4096, 4096, num_blocks=2048,
                                                seed=6),
    "mixed_large": lambda: mixed_structure(65536, 65536, seed=7),
    "banded_large": lambda: banded(262144, 262144, 16, seed=8),
    "powerlaw_large": lambda: power_law(262144, 262144, 24, seed=9),
    # SuiteSparse-scale web-graph archetype (~5.5M nnz at 2e-5 density):
    # exercises the stream engine's adaptive superspan (64 -> 256 rows,
    # 16% -> 63% slab fill; BASELINE.md round 3)
    "powerlaw_huge": lambda: power_law(524288, 524288, 11, seed=77),
}


def get_matrix(name: str) -> CSRMatrix:
    if name not in CORPUS:
        raise KeyError(f"unknown corpus matrix {name!r}; "
                       f"available: {sorted(CORPUS)}")
    return CORPUS[name]()
