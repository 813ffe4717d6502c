"""Real .mtx files through the FULL reference workflow: file load ->
symmetric expansion -> tile_create -> CPU exact check -> device SpMV ->
1%-relative check (reference main.cu:63-197). Fixtures cover the format
corner cases the reference parser handles (mmio_highlevel.h:617-731):
general real, symmetric lower-triangle, pattern, integer, hermitian
complex — plus a larger generated matrix round-tripped through save_mtx
(bulk writer) and the CLI driver itself.
"""
import os
import subprocess
import sys

import numpy as np
import jax.numpy as jnp
import pytest

from tilespmv_tpu.io import generate
from tilespmv_tpu.io.mmio import load_mtx, save_mtx
from tilespmv_tpu.core.convert import tile_create
from tilespmv_tpu.ops.cpu_reference import spmv_cpu
from tilespmv_tpu.ops.spmv import TileSpMV

FIX = os.path.join(os.path.dirname(__file__), "fixtures")

CASES = [
    ("nist_example.mtx", (5, 5), 8),        # the canonical NIST example
    ("bcsstk_style_sym.mtx", (6, 6), 20),   # symmetric -> expanded
    ("graph_pattern.mtx", (7, 7), 18),      # pattern symmetric -> 1.0s
    ("counts_integer.mtx", (4, 6), 7),      # integer general
]


@pytest.mark.parametrize("fname,shape,nnz_expanded", CASES)
def test_fixture_full_workflow(fname, shape, nnz_expanded):
    csr = load_mtx(os.path.join(FIX, fname))
    assert csr.shape == shape
    assert csr.nnz == nnz_expanded
    # golden scalar CSR (main.cu:101-110)
    x = ((np.arange(csr.n) % 10) / 4.0 + 0.25)
    golden = csr.to_dense().astype(np.float64) @ x
    # CPU tiled path: exact (tilespmv_cpu.h:274-284)
    tm = tile_create(csr)
    y_cpu = spmv_cpu(tm, x)
    np.testing.assert_array_equal(y_cpu, golden)
    # device path: 1% relative (main.cu:186-197)
    op = TileSpMV(csr)
    y_dev = np.asarray(op(x.astype(np.float32)))
    assert np.all(np.abs(golden - y_dev) <= 0.01 * np.abs(golden) + 1e-4)


def test_hermitian_complex_loads():
    csr = load_mtx(os.path.join(FIX, "fields_complex.mtx"))
    assert csr.shape == (3, 3)
    # hermitian expansion mirrors conjugates; our CSR keeps the real part
    # convention documented in io/mmio.py (complex -> real view)
    assert csr.nnz >= 4


def test_save_load_roundtrip_large(tmp_path):
    """Bulk save_mtx writer round-trips a 100k-entry matrix quickly."""
    csr = generate.power_law(4096, 4096, avg_nnz_per_row=24, seed=9)
    path = str(tmp_path / "big.mtx")
    save_mtx(path, csr)
    back = load_mtx(path)
    assert back.shape == csr.shape and back.nnz == csr.nnz
    np.testing.assert_array_equal(back.indptr, csr.indptr)
    np.testing.assert_array_equal(back.indices, csr.indices)
    np.testing.assert_allclose(back.data, csr.data, rtol=0, atol=0)


def test_cli_on_mtx_file(tmp_path):
    """The CLI driver runs the reference end-to-end flow on a FILE
    (load -> i%10 values -> convert -> CPU exact -> device check -> csv),
    matching main.cu's invocation `./test -d 0 matrix.mtx`."""
    csr = generate.mixed_structure(512, 512, seed=21)
    path = str(tmp_path / "m.mtx")
    save_mtx(path, csr)
    csv = str(tmp_path / "results.csv")
    env = dict(os.environ)
    env["PYTHONPATH"] = os.pathsep.join(
        [os.path.dirname(os.path.dirname(os.path.abspath(__file__)))]
        + env.get("PYTHONPATH", "").split(os.pathsep))
    r = subprocess.run(
        [sys.executable, "-m", "tilespmv_tpu.cli", path, "-d", "cpu",
         "--iters", "1", "--reps", "1", "--warmup", "0", "--csv", csv],
        capture_output=True, text=True, env=env, timeout=900)
    assert r.returncode == 0, r.stderr[-2000:]
    assert os.path.exists(csv)
    assert "PASS" in r.stdout or "pass" in r.stdout.lower()
