"""Test configuration.

Tests run on a virtual 8-device CPU mesh so sharding/collective code paths
are exercised without TPU hardware (SURVEY.md §4). NOTE: this environment's
sitecustomize pre-imports JAX and pins the tunneled TPU platform before any
env var we could set, so the platform must be switched via jax.config here
(backends are still uninitialized at conftest import time).
"""
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
# f64 is a first-class compute dtype (reference MAT_VAL_TYPE double);
# the Pallas kernels trace themselves with x64 off (_x32_trace)
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(1234)
