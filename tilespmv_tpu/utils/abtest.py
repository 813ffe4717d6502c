"""Interleaved e2e A/B harness — the only arbitration method that
settles kernel/routing defaults on this environment.

Round-4 lesson (BASELINE.md, ROUND4_NOTES.md §6): isolated class-level
timings in the sub-30-us regime do NOT replicate across sessions on the
tunneled TPU — the dense-route "prefix" win (402.6 vs 551.6 ns/chunk)
inverted the next day, twice. What does replicate: timing the FULL
operation per arm, with arms ALTERNATED within one process
(A,B / B,A / ...) so slow drift in tunnel/chip state cancels, each
timing from a fresh jit partial (flipping module-level variant dicts
does not re-trace an existing jit cache) with plans passed as jit
ARGUMENTS (closing over them embeds arrays as HLO constants ->
remote-compile HTTP 413 on large matrices).

This module lifts scripts/ab_route_e2e.py's method into a first-class
utility; every A/B script arbitrates through it.
"""
from __future__ import annotations

from typing import Callable, Mapping, Sequence

import numpy as np

from .profiling import _timed


def interleaved_ab(arms: Mapping[str, Sequence], rounds: int = 4,
                   verbose: bool = True, **timed_kw) -> dict:
    """Time each arm `rounds` times, interleaved within one process.

    `arms`: name -> (fn, *args). Each timing calls
    profiling._timed(fn, *args) — difference-method over on-device
    repeat loops, fresh jit partials per call. Round r runs the arms in
    forward order when r is even, reversed when odd, so a drifting
    environment biases neither arm.

    Returns {"times_us": {name: [..]}, "median_us": {name: ..},
    "winner": name, "margin": best/runner-up median ratio}.
    """
    names = list(arms)
    times: dict[str, list] = {k: [] for k in names}
    for r in range(rounds):
        order = names if r % 2 == 0 else list(reversed(names))
        for name in order:
            fn, *args = arms[name]
            dt = _timed(fn, *args, **timed_kw)
            times[name].append(dt * 1e6)
            if verbose:
                print(f"  round {r} {name}: {dt * 1e6:.1f} us",
                      flush=True)
    med = {k: float(np.median(v)) for k, v in times.items()}
    ranked = sorted(med, key=med.get)
    winner = ranked[0]
    margin = (med[ranked[1]] / med[winner]
              if len(ranked) > 1 and med[winner] > 0 else float("inf"))
    if verbose:
        for k in ranked:
            a = np.asarray(times[k])
            print(f"{k}: median {med[k]:.1f} us  min {a.min():.1f}  "
                  f"max {a.max():.1f}", flush=True)
        print(f"winner: {winner} (x{margin:.3f} vs runner-up)",
              flush=True)
    return dict(times_us=times, median_us=med, winner=winner,
                margin=margin)


def spmv_arms(ops: Mapping[str, object], x) -> dict:
    """Build interleaved_ab arms from {name: TileSpMV}: full-SpMV
    timing with the plan as a jit argument."""
    import functools

    import jax.numpy as jnp

    from ..ops.spmv import spmv
    arms = {}
    for name, op in ops.items():
        xj = jnp.asarray(x, dtype=op.compute_dtype)
        fn = functools.partial(spmv, backend=op.backend)
        arms[name] = (fn, op.plan, xj)
    return arms


def build_op_variant(csr, module, variants: Mapping[str, object],
                     **op_kw):
    """Construct a fresh TileSpMV under temporarily-flipped module
    variables (restored afterwards). A fresh op per arm is mandatory:
    an existing op's jit cache does not see the flip."""
    from ..ops.spmv import TileSpMV
    old = {k: getattr(module, k) for k in variants}
    try:
        for k, v in variants.items():
            setattr(module, k, v)
        return TileSpMV(csr, backend="pallas", **op_kw)
    finally:
        for k, v in old.items():
            setattr(module, k, v)
