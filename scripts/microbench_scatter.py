"""Micro-ablation: rounds-scatter vs offs-scatter inner loops.

The offs encoding lost the e2e A/B by +44 ns/slab on powerlaw_large
despite issuing 10 dynamic gathers per slab where rounds issues 24 —
this isolates WHERE. One grid step emulates S slabs' post-prefix
machinery over a synthetic csum block:

  rounds: per (round t, slab s): 2 lane gathers of csum + sub +
          dynamic sublane gather (the production inner loop)
  offs:   per slab: 2 lane gathers + sub -> diff; 8 dependent lane
          gathers of diff; rolls hoisted per step
  offs_nodep: offs with the 8 pick gathers reading csum directly
          (no diff dependency) — isolates the dependency-chain cost
  offs_noroll: offs without the final rotates — isolates roll cost

Reports ns/slab for each arm (difference timing over grid sizes).
"""
import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

S = 13
SUBS, LANES = 8, 128
ROUNDS = 8


def _tree_sum(parts):
    while len(parts) > 1:
        nxt = [parts[k] + parts[k + 1] for k in range(0, len(parts) - 1, 2)]
        if len(parts) % 2:
            nxt.append(parts[-1])
        parts = nxt
    return parts[0]


def _roll_subs(a, d):
    if d == 0:
        return a
    return jnp.concatenate([a[SUBS - d:], a[:SUBS - d]], axis=0)


def make_kernel(arm):
    def kernel(csum_ref, pe_ref, out_ref):
        csum = csum_ref[...]
        pe = pe_ref[...]
        sb8 = S * SUBS
        ys = []
        if arm == "rounds":
            for t in range(ROUNDS):
                base = t * 3 * sb8
                for s in range(S):
                    cs = csum[s * SUBS:(s + 1) * SUBS]
                    o = base + s * SUBS
                    ue = jnp.take_along_axis(cs, pe[o: o + SUBS], axis=1)
                    us = jnp.take_along_axis(cs, pe[sb8 + o: sb8 + o + SUBS],
                                             axis=1)
                    ys.append(jnp.take_along_axis(
                        ue - us, pe[2 * sb8 + o: 2 * sb8 + o + SUBS],
                        axis=0))
        else:
            picks = [[] for _ in range(SUBS)]
            for s in range(S):
                cs = csum[s * SUBS:(s + 1) * SUBS]
                base = s * 96
                if arm == "offs_nodep":
                    diff = cs
                else:
                    ue = jnp.take_along_axis(cs, pe[base: base + SUBS],
                                             axis=1)
                    us = jnp.take_along_axis(
                        cs, pe[base + SUBS: base + 2 * SUBS], axis=1)
                    diff = ue - us
                for d in range(SUBS):
                    o = base + (2 + d) * SUBS
                    picks[d].append(jnp.take_along_axis(
                        diff, pe[o: o + SUBS], axis=1))
            if arm == "offs_noroll":
                ys = [_tree_sum(pk) for pk in picks]
            else:
                ys = [_roll_subs(_tree_sum(pk), d)
                      for d, pk in enumerate(picks)]
        out_ref[...] = _tree_sum(ys)
    return kernel


def run(arm, nsteps):
    csum = jnp.asarray(np.random.rand(S * SUBS, LANES).astype(np.float32))
    rows = max(3 * S * SUBS * ROUNDS, 96 * S)
    pe = jnp.asarray(np.random.randint(
        0, SUBS if arm == "rounds" else LANES,
        (rows, LANES)).astype(np.int8))
    f = pl.pallas_call(
        make_kernel(arm),
        grid=(nsteps,),
        in_specs=[pl.BlockSpec((S * SUBS, LANES), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((rows, LANES), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((SUBS, LANES), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((SUBS, LANES), jnp.float32),
    )
    return f(csum, pe)


def timeit(arm):
    k1, k2 = 100, 1700
    f1 = jax.jit(functools.partial(run, arm, k1))
    f2 = jax.jit(functools.partial(run, arm, k2))
    for f in (f1, f2):
        np.asarray(f())
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        np.asarray(f1())
        ta = time.perf_counter() - t0
        t0 = time.perf_counter()
        np.asarray(f2())
        tb = time.perf_counter() - t0
        ts.append((tb - ta) / (k2 - k1))
    dt = float(np.median(ts))
    print(f"{arm:12s}: {dt * 1e9 / S:7.1f} ns/slab  "
          f"({dt * 1e6:.2f} us/step)", flush=True)


if __name__ == "__main__":
    arms = sys.argv[1:] or ["rounds", "offs", "offs_nodep", "offs_noroll"]
    for arm in arms:
        timeit(arm)
