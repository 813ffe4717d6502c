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

# Persistent compilation cache: the suite is compile-bound on this
# 1-core box (every Pallas interpret/shard_map program is an XLA:CPU
# compile); caching makes repeat runs several minutes faster.
import pathlib  # noqa: E402

_cache = pathlib.Path(__file__).resolve().parents[1] / ".cache" / "jax"
_cache.mkdir(parents=True, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", str(_cache))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_enable_xla_caches",
                  "all")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(1234)
