"""Interleaved e2e A/B of window routing (onehot vs prefix) on TPU.

The per-class profile numbers for this choice inverted between
sessions (0184488 measured prefix 402.6 vs onehot 551.6 ns/chunk;
the next day the same script gave onehot 407-417 vs prefix 559-640).
Class-level timings on the tunnel sit in the noisy sub-30 us regime,
so this arbiter times the FULL SpMV under each route through the
shared interleaved harness (utils/abtest.py — round-4 verdict #5
lifted this script's method there).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np  # noqa: E402

from scripts.ab_defaults_r5 import group_route  # noqa: E402

name = sys.argv[1] if len(sys.argv) > 1 else "mixed_large"
rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 4
assert name == "mixed_large", "group_route times mixed_large"
res = group_route(rounds=rounds)
print(f"winner: {res['winner']}  medians: "
      + "  ".join(f"{k}={v:.1f}us"
                  for k, v in res["median_us"].items()))
