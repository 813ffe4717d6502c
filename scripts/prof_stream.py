"""Ad-hoc: per-engine profile of a corpus matrix (real TPU)."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np

from tilespmv_tpu.io import generate
from tilespmv_tpu.ops.spmv import TileSpMV
from tilespmv_tpu.utils.profiling import profile_engines

name = sys.argv[1] if len(sys.argv) > 1 else "powerlaw_large"
csr = generate.get_matrix(name)
op = TileSpMV(csr, backend="pallas")
prof = profile_engines(op)
total = 0.0
for k, v in prof.items():
    extra = {kk: vv for kk, vv in v.items() if kk not in ("us", "bytes",
                                                          "gbps")}
    print(f"{k:14s} {v['us']:9.1f} us  {v['gbps']:6.1f} GB/s  {extra}")
    total += v["us"]
    if k == "stream":
        print(f"    -> {v['us'] * 1e3 / v['slabs']:.1f} ns/slab")
print(f"{'TOTAL':14s} {total:9.1f} us")
