"""On-TPU A/B of the band-class df64 accumulation (round-4 task 2).

banded_large f64 runs 3.1x f32 (0.249-0.263 ms) while its value traffic
says ~2.5x (~0.20 ms); the gap is the serial compensated VPU chain.
Times each BAND_DF64_VARIANT on banded_large with a full-vector check
(gate 1e-11 relative) via profile_engines' band row.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import jax  # noqa: E402

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402
import tilespmv_tpu as tsp  # noqa: E402
from tilespmv_tpu.io import generate  # noqa: E402
from tilespmv_tpu.ops.pallas import kernels  # noqa: E402
from tilespmv_tpu.utils.profiling import profile_engines  # noqa: E402

name = sys.argv[1] if len(sys.argv) > 1 else "banded_large"
csr = generate.get_matrix(name)
tm = tsp.tile_create(csr)
rng = np.random.default_rng(0)
x = rng.standard_normal(csr.n)
ref = csr.matvec(x)
nrm = np.max(np.abs(ref))

for variant in ("serial", "ilv2", "ilv4", "tree"):
    kernels.BAND_DF64_VARIANT["acc"] = variant
    # fresh operator per variant: a cached jit would otherwise keep the
    # first-traced kernel regardless of the dict flip
    op = tsp.TileSpMV(tm, compute_dtype=jnp.float64)
    y = np.asarray(op(x))
    err = np.max(np.abs(y - ref)) / nrm
    prof = profile_engines(op, x)
    band_us = prof.get("band", {}).get("us", float("nan"))
    total = sum(v["us"] for v in prof.values())
    print(f"{variant:7s}: rel_err={err:.2e} "
          f"{'PASS' if err < 1e-11 else 'FAIL'}  band={band_us:.1f} us "
          f"total={total:.1f} us", flush=True)
kernels.BAND_DF64_VARIANT["acc"] = "serial"
