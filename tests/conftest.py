"""Test configuration.

Tests run on a virtual 8-device CPU mesh so sharding/collective code paths
are exercised without TPU hardware (SURVEY.md §4). The env vars must be set
before JAX initializes its backends, hence this conftest sets them at import
time.
"""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(1234)
