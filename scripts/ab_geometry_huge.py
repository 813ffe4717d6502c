"""E2e interleaved A/B of the stream slab geometry on powerlaw_huge.

Round-5 continuation: the dual second-span price was refit (2.3 -> 1.4
ns/chunk) from the mixed_large and powerlaw_large e2e arbitrations, but
powerlaw_huge (524k^2, 5.5M nnz, 10.5/row — the matrix that motivated
ADAPTIVE superspans in round 3) was never e2e-arbitrated: its wide mono
span was picked by the model alone. This script times the FULL SpMV per
forced (span_rows, dual) arm under utils/abtest.py (arms alternated in
one process, plans as jit args) and reports what the model picked vs
what the chip says.

Usage: python scripts/ab_geometry_huge.py [name] [rounds]
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np  # noqa: E402

import tilespmv_tpu as tsp  # noqa: E402
from tilespmv_tpu.io import generate  # noqa: E402
from tilespmv_tpu.ops.pallas.lane_plan import build_lane_plan  # noqa: E402
from tilespmv_tpu.ops.spmv import spmv  # noqa: E402
from tilespmv_tpu.utils import abtest  # noqa: E402


def main():
    name = sys.argv[1] if len(sys.argv) > 1 else "powerlaw_huge"
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    csr = generate.get_matrix(name)
    tm = tsp.tile_create(csr)
    import jax.numpy as jnp
    x = jnp.asarray(((np.arange(csr.n) % 10) / 4.0), np.float32)
    ref = csr.matvec(np.asarray(x, np.float64))

    # auto arm first: what does the model pick end to end?
    t0 = time.time()
    auto_plan = build_lane_plan(tm)
    auto_geo = (None if auto_plan.stream is None else
                (auto_plan.stream.span_rows, bool(auto_plan.stream.dual)))
    print(f"auto pick: {auto_geo} (build {time.time()-t0:.1f}s)",
          flush=True)

    cands = [(256, False), (256, True), (128, True), (512, True)]
    arms = {}
    arms["auto"] = (functools.partial(spmv, backend="pallas"),
                    auto_plan, x)
    for span, dual in cands:
        if (span, dual) == auto_geo:
            continue
        t0 = time.time()
        plan = build_lane_plan(tm, stream_span_rows=span,
                               stream_dual=dual)
        y = np.asarray(spmv(plan, x, backend="pallas"), np.float64)
        err = np.max(np.abs(y - ref)) / max(1e-30, np.max(np.abs(ref)))
        assert err < 1e-3, f"span={span} dual={dual}: rel_err={err:.2e}"
        tag = f"{span}{'d' if dual else 'm'}"
        print(f"{tag}: build {time.time()-t0:.1f}s err {err:.2e}",
              flush=True)
        arms[tag] = (functools.partial(spmv, backend="pallas"), plan, x)

    print(f"== geometry ({name} e2e, {len(arms)} arms) ==", flush=True)
    res = abtest.interleaved_ab(arms, rounds=rounds)
    print(f"winner: {res['winner']} (margin {res['margin']:.3f}x)",
          flush=True)


if __name__ == "__main__":
    main()
