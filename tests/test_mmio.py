"""Matrix Market loader tests (reference mmio_highlevel.h:593-760 parity)."""
import io

import numpy as np
import pytest

from tilespmv_tpu.io.mmio import (MatrixMarketError, csr_from_coo, load_mtx,
                                  save_mtx)


def _load(text: str):
    return load_mtx(io.StringIO(text))


def test_real_general():
    csr = _load("""%%MatrixMarket matrix coordinate real general
% comment
3 4 4
1 1 2.0
2 3 -1.5
3 4 4.0
1 2 1.0
""")
    assert csr.shape == (3, 4)
    assert csr.nnz == 4
    dense = csr.to_dense()
    expect = np.zeros((3, 4))
    expect[0, 0] = 2.0
    expect[1, 2] = -1.5
    expect[2, 3] = 4.0
    expect[0, 1] = 1.0
    np.testing.assert_array_equal(dense, expect)
    # canonical: sorted columns within rows
    assert np.all(np.diff(csr.indices[:2]) > 0)


def test_pattern_sets_ones():
    csr = _load("""%%MatrixMarket matrix coordinate pattern general
2 2 2
1 1
2 2
""")
    np.testing.assert_array_equal(csr.data, [1.0, 1.0])


def test_integer_field():
    csr = _load("""%%MatrixMarket matrix coordinate integer general
2 2 1
2 1 7
""")
    assert csr.to_dense()[1, 0] == 7.0


def test_complex_keeps_real_part():
    # mmio_highlevel.h:662-665: fval = real part
    csr = _load("""%%MatrixMarket matrix coordinate complex general
2 2 1
1 2 3.5 -1.0
""")
    assert csr.to_dense()[0, 1] == 3.5


def test_symmetric_expansion():
    # off-diagonal entries mirrored; diagonal kept once
    # (mmio_highlevel.h:687-731)
    csr = _load("""%%MatrixMarket matrix coordinate real symmetric
3 3 3
1 1 1.0
2 1 5.0
3 2 2.0
""")
    dense = csr.to_dense()
    assert csr.nnz == 5
    assert dense[0, 1] == 5.0 and dense[1, 0] == 5.0
    assert dense[1, 2] == 2.0 and dense[2, 1] == 2.0
    assert dense[0, 0] == 1.0
    assert csr.is_symmetric


def test_skew_symmetric_negates_mirror():
    csr = _load("""%%MatrixMarket matrix coordinate real skew-symmetric
2 2 1
2 1 3.0
""")
    dense = csr.to_dense()
    assert dense[1, 0] == 3.0 and dense[0, 1] == -3.0


def test_duplicates_summed():
    csr = _load("""%%MatrixMarket matrix coordinate real general
2 2 3
1 1 1.0
1 1 2.5
2 2 1.0
""")
    assert csr.nnz == 2
    assert csr.to_dense()[0, 0] == 3.5


def test_array_format():
    csr = _load("""%%MatrixMarket matrix array real general
2 2
1.0
0.0
3.0
4.0
""")
    dense = csr.to_dense()
    np.testing.assert_array_equal(dense, [[1.0, 3.0], [0.0, 4.0]])


def test_bad_banner():
    with pytest.raises(MatrixMarketError):
        _load("%%NotMatrixMarket x y z w\n1 1 1\n")


def test_out_of_bounds_entry():
    with pytest.raises(MatrixMarketError):
        _load("""%%MatrixMarket matrix coordinate real general
2 2 1
3 1 1.0
""")


def test_save_load_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    rows = rng.integers(0, 50, 200)
    cols = rng.integers(0, 40, 200)
    vals = rng.standard_normal(200)
    csr = csr_from_coo(50, 40, rows, cols, vals)
    p = tmp_path / "t.mtx"
    save_mtx(str(p), csr)
    back = load_mtx(str(p))
    np.testing.assert_allclose(back.to_dense(), csr.to_dense(), rtol=1e-15)


def test_matvec_golden():
    # scalar CSR golden model (main.cu:101-110)
    rng = np.random.default_rng(3)
    rows = rng.integers(0, 30, 100)
    cols = rng.integers(0, 20, 100)
    vals = rng.integers(0, 10, 100).astype(np.float64)
    csr = csr_from_coo(30, 20, rows, cols, vals)
    x = (np.arange(20) % 10).astype(np.float64)
    np.testing.assert_allclose(csr.matvec(x), csr.to_dense() @ x, rtol=1e-14)


def test_save_mtx_pattern_roundtrip(tmp_path):
    # reference mmio.h:686-780 writer set: pattern drops values, the
    # loader reads 1.0 back
    rng = np.random.default_rng(5)
    rows = rng.integers(0, 40, 150)
    cols = rng.integers(0, 40, 150)
    csr = csr_from_coo(40, 40, rows, cols, np.ones(150))
    p = tmp_path / "p.mtx"
    save_mtx(str(p), csr, field="pattern")
    assert "pattern" in open(p).readline()
    back = load_mtx(str(p))
    np.testing.assert_array_equal(back.to_dense() != 0,
                                  csr.to_dense() != 0)
    np.testing.assert_allclose(back.data, 1.0)


def test_save_mtx_integer_roundtrip(tmp_path):
    rng = np.random.default_rng(6)
    rows = rng.integers(0, 30, 120)
    cols = rng.integers(0, 30, 120)
    vals = rng.integers(-9, 10, 120).astype(np.float64)
    csr = csr_from_coo(30, 30, rows, cols, vals)
    p = tmp_path / "i.mtx"
    save_mtx(str(p), csr, field="integer")
    back = load_mtx(str(p))
    np.testing.assert_allclose(back.to_dense(), csr.to_dense(),
                               rtol=1e-15)
    import pytest as _pytest
    csr.data[0] = 0.5
    with _pytest.raises(Exception):
        save_mtx(str(p), csr, field="integer")


def test_save_mtx_symmetric_roundtrip(tmp_path):
    # symmetric writer keeps the lower triangle; the loader's expansion
    # reconstructs the mirror
    rng = np.random.default_rng(7)
    rows = rng.integers(0, 25, 100)
    cols = rng.integers(0, 25, 100)
    vals = rng.standard_normal(100)
    a = csr_from_coo(25, 25, np.concatenate([rows, cols]),
                     np.concatenate([cols, rows]),
                     np.concatenate([vals, vals]))
    p = tmp_path / "s.mtx"
    save_mtx(str(p), a, field="real", symmetry="symmetric")
    hdr = open(p).readline()
    assert "symmetric" in hdr
    back = load_mtx(str(p))
    # diagonal entries were summed in `a` (i==j duplicated in the coo
    # above), so compare dense forms directly
    np.testing.assert_allclose(back.to_dense(), a.to_dense(),
                               rtol=1e-12, atol=1e-12)


def test_cli_sweep_dir(tmp_path):
    # --sweep-dir: drop-in real-corpus mode over a directory of .mtx
    import subprocess
    import sys as _sys
    import shutil
    import os as _os
    fixtures = _os.path.join(_os.path.dirname(__file__), "fixtures")
    d = tmp_path / "corpus"
    d.mkdir()
    for f in ("nist_example.mtx", "bcsstk_style_sym.mtx"):
        shutil.copy(_os.path.join(fixtures, f), d / f)
    csv = tmp_path / "sweep.csv"
    env = dict(_os.environ, JAX_PLATFORMS="cpu",
               PYTHONPATH=_os.path.dirname(_os.path.dirname(__file__)))
    r = subprocess.run(
        [_sys.executable, "-m", "tilespmv_tpu.cli",
         "--sweep-dir", str(d), "--csv", str(csv),
         "-d", "cpu", "--iters", "2", "--reps", "1", "--warmup", "0"],
        capture_output=True, text=True, env=env, timeout=600)
    assert r.returncode == 0, r.stdout + r.stderr
    assert "2/2 ok" in r.stdout
    lines = open(csv).read().strip().splitlines()
    assert len(lines) == 2   # one reference-schema row per matrix


def test_save_mtx_complex_roundtrip(tmp_path):
    # complex writer (mmio.h:780-830): `re im` pairs, im written as 0
    # (CSRMatrix carries the real part only, matching the loader's
    # complex handling at mmio_highlevel.h:648-676)
    rng = np.random.default_rng(8)
    rows = rng.integers(0, 35, 140)
    cols = rng.integers(0, 35, 140)
    vals = rng.standard_normal(140)
    csr = csr_from_coo(35, 35, rows, cols, vals)
    p = tmp_path / "c.mtx"
    save_mtx(str(p), csr, field="complex")
    hdr = open(p).readline()
    assert "complex" in hdr
    # body rows carry 4 columns: i j re im
    first_entry = open(p).readlines()[2].split()
    assert len(first_entry) == 4
    back = load_mtx(str(p))
    np.testing.assert_allclose(back.to_dense(), csr.to_dense(),
                               rtol=1e-15)
