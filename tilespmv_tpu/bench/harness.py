"""Benchmark harness.

Measures steady-state SpMV time the way the reference does — warmup
iterations followed by a timed loop (reference tilespmv_cuda.h:1058-1139,
WARMUP_NUM=200 / BENCH_REPEAT=1000) — but with the repeat loop compiled
*on device* (`lax.fori_loop` with a real data dependence between
iterations), because per-dispatch latency from the host would otherwise
dominate: a GPU kernel launch is ~5 us, while this environment's host->TPU
dispatch is ~1 ms.

Reported metrics (reference parity + roofline):
  ms per SpMV, GFLOPS = 2*nnz/t (tilespmv_cuda.h:1138), Gnnz/s,
  effective GB/s over the plan's true byte traffic, and the fraction of the
  chip's HBM roofline that represents.
"""
from __future__ import annotations

import dataclasses
import functools
import time
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.plan import SpMVPlan
from ..ops.spmv import TileSpMV, spmv
from . import roofline


@dataclasses.dataclass
class BenchResult:
    name: str
    m: int
    n: int
    nnz: int
    ms: float
    gflops: float
    gnnz_per_s: float
    gbytes_per_s: float
    roofline_frac: float
    chip: str
    backend: str
    iters: int

    def csv_row(self) -> str:
        """Reference results.csv schema: filename,m,n,nnz,ms,gflops
        (tilespmv_cuda.h:1145-1146)."""
        return (f"{self.name},{self.m},{self.n},{self.nnz},"
                f"{self.ms:.6f},{self.gflops:.4f}")

    def to_dict(self) -> dict:
        return dataclasses.asdict(self)


@functools.partial(jax.jit, static_argnames=("backend", "iters"))
def _spmv_loop(plan: SpMVPlan, x: jax.Array, iters: int,
               backend: str) -> jax.Array:
    """Run `iters` chained SpMVs on device; returns a scalar checksum.

    The tiny y-dependent perturbation of x defeats loop-invariant hoisting
    and dead-code elimination without affecting the result beyond one ulp
    scale (1e-30 * sum(y) underflows against typical x). The scalar return
    keeps the forced host transfer (see `_timed`) tiny.
    """

    def body(_, carry):
        x_cur, acc = carry
        y = spmv(plan, x_cur, backend=backend)
        s = jnp.sum(y) * jnp.asarray(1e-30, y.dtype)
        return x_cur + s, acc + jnp.sum(y)

    x0 = x
    acc0 = jnp.zeros((), dtype=x0.dtype)
    _, acc = jax.lax.fori_loop(0, iters, body, (x0, acc0))
    return acc


def _timed(fn, *args) -> float:
    """Wall time of fn(*args) forced to completion by fetching its scalar.

    NOTE: on this environment's tunneled TPU backend, `block_until_ready`
    returns before execution finishes, and the host round trip costs ~30 ms
    — only a host transfer of the result truly synchronizes.
    """
    t0 = time.perf_counter()
    out = fn(*args)
    float(jnp.sum(out))
    return time.perf_counter() - t0


def benchmark_op(op: TileSpMV, x: Optional[np.ndarray] = None,
                 name: str = "matrix", warmup: int = 2,
                 timed_reps: int = 5, iters_per_rep: int = 100) -> BenchResult:
    """Benchmark one compiled operator on the current default device.

    Uses the difference method: per-iteration time is
    (T(k_big) - T(k_small)) / (k_big - k_small), which cancels the fixed
    dispatch + host-round-trip latency exactly — crucial because that fixed
    cost (~30 ms over the tunnel) would otherwise swamp microsecond-scale
    kernels.
    """
    plan = op.plan
    if x is None:
        x = ((np.arange(plan.n) % 10) / 4.0)
    xj = jnp.asarray(x, dtype=op.compute_dtype)

    # Calibrate: pick k_big so the k_big-vs-k_small delta (the quantity we
    # actually measure) is ~50 ms — far above host-round-trip jitter. One
    # extra compile, but tiny matrices would otherwise measure noise.
    k_cal = 32
    t_cal = _timed(functools.partial(_spmv_loop, backend=op.backend,
                                     iters=k_cal), plan, xj)
    t_cal = _timed(functools.partial(_spmv_loop, backend=op.backend,
                                     iters=k_cal), plan, xj)  # warm
    per_iter_est = max((t_cal - 0.02) / k_cal, 1e-7)
    k_big = int(np.clip(0.05 / per_iter_est, iters_per_rep, 1_000_000))
    k_small = max(1, k_big // 16)

    for _ in range(max(warmup, 1)):
        _timed(functools.partial(_spmv_loop, backend=op.backend,
                                 iters=k_small), plan, xj)
        _timed(functools.partial(_spmv_loop, backend=op.backend,
                                 iters=k_big), plan, xj)

    diffs = []
    for _ in range(timed_reps):
        t_small = _timed(functools.partial(_spmv_loop, backend=op.backend,
                                           iters=k_small), plan, xj)
        t_big = _timed(functools.partial(_spmv_loop, backend=op.backend,
                                         iters=k_big), plan, xj)
        diffs.append((t_big - t_small) / (k_big - k_small))
    dt = float(np.median(diffs))
    dt = max(dt, 1e-9)

    chip = roofline.detect_chip()
    flops = plan.flops()
    nbytes = plan.bytes_accessed()
    gflops = flops / dt / 1e9
    return BenchResult(
        name=name, m=plan.m, n=plan.n, nnz=plan.nnz,
        ms=dt * 1e3, gflops=gflops,
        gnnz_per_s=plan.nnz / dt / 1e9,
        gbytes_per_s=nbytes / dt / 1e9,
        roofline_frac=(nbytes / dt / 1e9) / roofline.peak_bandwidth_gbps(chip),
        chip=chip, backend=op.backend, iters=timed_reps * iters_per_rep)


def append_results_csv(path: str, result: BenchResult) -> None:
    """Append-only CSV in the reference's schema
    (tilespmv_cuda.h:1141-1147)."""
    with open(path, "a") as f:
        f.write(result.csv_row() + "\n")
