"""Nibble codec tests (reference encode.h:29-63 semantics)."""
import numpy as np
import pytest

from tilespmv_tpu.core import encode


def test_pack_unpack_roundtrip():
    rng = np.random.default_rng(0)
    for n in (0, 1, 2, 7, 16, 101):
        idx = rng.integers(0, 16, n).astype(np.uint8)
        packed = encode.pack_nibbles(idx)
        assert packed.shape[0] == (n + 1) // 2
        out = encode.unpack_nibbles(packed, n)
        np.testing.assert_array_equal(out, idx)


def test_pack_layout_matches_reference():
    # even index -> high nibble, odd -> low (encode.h:33-49)
    packed = encode.pack_nibbles(np.array([0xA, 0x3], dtype=np.uint8))
    assert packed[0] == (0xA << 4) | 0x3


def test_pack_rejects_wide_indices():
    with pytest.raises(ValueError):
        encode.pack_nibbles(np.array([16], dtype=np.uint8))


def test_coo_pack_roundtrip():
    rng = np.random.default_rng(1)
    rows = rng.integers(0, 16, 37).astype(np.uint8)
    cols = rng.integers(0, 16, 37).astype(np.uint8)
    packed = encode.pack_coo(rows, cols)
    r, c = encode.unpack_coo(packed)
    np.testing.assert_array_equal(r, rows)
    np.testing.assert_array_equal(c, cols)
    # (row<<4)|col layout, csr2tile.h:975-980
    assert packed[0] == (rows[0] << 4) | cols[0]
