"""Distributed SpMV tests on the virtual 8-device CPU mesh."""
import numpy as np
import pytest

import jax

from tilespmv_tpu.io import generate
from tilespmv_tpu.parallel import DistributedSpMV, make_mesh


@pytest.fixture(scope="module")
def mesh8():
    assert len(jax.devices()) == 8, "conftest must provide 8 CPU devices"
    return make_mesh(8)


@pytest.mark.parametrize("x_mode", ["allgather", "replicated"])
def test_distributed_matches_golden(mesh8, x_mode):
    csr = generate.mixed_structure(1024, 1024, seed=3)
    op = DistributedSpMV(csr, mesh=mesh8, x_mode=x_mode)
    x = np.linspace(-1, 1, 1024).astype(np.float32)
    y = np.asarray(op(x))
    y_golden = csr.to_dense().astype(np.float32) @ x
    np.testing.assert_allclose(y, y_golden, rtol=1e-4, atol=1e-4)


def test_distributed_uneven_rows(mesh8):
    # m not divisible by ndev*16: last shard is mostly padding
    csr = generate.mixed_structure(1000, 777, seed=4)
    op = DistributedSpMV(csr, mesh=mesh8)
    x = np.linspace(0.5, 1.5, 777).astype(np.float32)
    y = np.asarray(op(x))
    np.testing.assert_allclose(y, csr.to_dense().astype(np.float32) @ x,
                               rtol=1e-4, atol=1e-4)


def test_distributed_output_sharding(mesh8):
    csr = generate.banded(2048, 2048, 4, seed=5)
    op = DistributedSpMV(csr, mesh=mesh8)
    x = np.ones(2048, np.float32)
    y = op(x)
    # y rows land on the device owning them
    assert len(y.sharding.device_set) == 8


def test_distributed_small_mesh():
    mesh = make_mesh(2)
    csr = generate.mixed_structure(256, 256, seed=6)
    op = DistributedSpMV(csr, mesh=mesh)
    x = np.linspace(-1, 1, 256).astype(np.float32)
    np.testing.assert_allclose(np.asarray(op(x)),
                               csr.to_dense().astype(np.float32) @ x,
                               rtol=1e-4, atol=1e-4)
