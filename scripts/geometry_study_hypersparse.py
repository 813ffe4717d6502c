"""Hypersparse tail diagnosis (round-4 verdict #3): why the stream
engine's per-entry cost is ~2.8x the flagship's on hypersparse_large,
what was tried, and the structural floor.

hypersparse_large: 262144^2, 687,189 nnz, 2.62 nnz/row, uniformly
random. Its occupied (window, 1024-value block) cells number 65,534
with 10.5 entries each — locality does not exist at any granularity:

  per-cell entries at block size B = nnz_win * B / n ~ 0.0105 * B/1024

so slab fill is CELL-COUNT bound, not capacity bound, at every span,
and x staging (the chunk gather+select loop) has a span-independent
asymptote:

  staging/entry = STAGE_CHUNK_NS * (span/8) / (entries per slab)
               ~ 2.3 * 262144 / (128 * 2684)  ~ 0.22 ns/entry
  -> 687k entries * 0.22 = ~151 us of staging alone.

Printed below: the slab-count/cost table over spans {64..512} x
{mono, dual}, the free-placement candidate, and the decisions. Usage:
  python scripts/geometry_study_hypersparse.py          (CPU, model)
  python scripts/geometry_study_hypersparse.py --bench  (TPU, measure)

Measured conclusion (v5e, round 5): 256-dual is model-optimal
(~236 us kernel + ~68 us steps; measured e2e ~0.26-0.27 ms); span 512
mono ties and 512-dual loses (staging growth beats slab savings); the
free-placement geometry is 6.4x worse (cells too small to fill slots);
the offs/roll scatter encodings do not touch staging. The round-4
verdict's <=0.20 ms bar is unreachable inside this engine family —
the remaining cost is ~55% x-staging asymptote + ~30% slab floor +
~25% step sequencing, all calibrated constants. The engine still runs
hypersparse_large at ~390 ps/entry vs the absorb alternative's
estimated 2.1 ns/entry (W16 classes, 1.4 entries/tile).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

if "--bench" not in sys.argv:
    import jax
    jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

import tilespmv_tpu as tsp  # noqa: E402
from tilespmv_tpu.io import generate  # noqa: E402
from tilespmv_tpu.ops.pallas import stream_plan as sp  # noqa: E402

csr = generate.get_matrix("hypersparse_large")
tm = tsp.tile_create(csr)
bk = tm.coo
cc = np.diff(bk.nnz_ptr)
ow = np.repeat(np.arange(bk.num_tiles), cc)
g_r = tm.tile_rowidx[bk.tile_ids].astype(np.int64)[ow] * 16 + bk.row
g_c = tm.tile_columnidx[bk.tile_ids[ow]].astype(np.int64) * 16 + bk.col
nz = g_r.size
print(f"hypersparse_large: {csr.m}^2, nnz={csr.nnz} "
      f"({csr.nnz / csr.m:.2f}/row), stream entries={nz}")
cells = sp._occupied_cells(g_r, g_c)
uw, uq, uc, nq = cells
print(f"(window, 1024-block) cells: {uw.size}, "
      f"avg {nz / uw.size:.1f} entries/cell")

print(f"\n{'geometry':16s} {'slabs':>6s} {'fill':>6s} {'model_us':>9s}")
for r in sp.SPAN_CHOICES:
    C, gwin = sp._group_counts_cells(uw, uq, uc, nq, r)
    for dual in (False, True):
        slabs = (sp._dual_slab_count(C, gwin) if dual
                 else int((-(-C.max(axis=1) // sp.CAP)).sum()))
        chunks = (2 if dual else 1) * (r // 8)
        cost = slabs * (sp.SLAB_FLOOR_NS + sp.STAGE_CHUNK_NS * chunks)
        fill = nz / (slabs * 8 * sp.CAP)
        tag = f"span{r}-{'dual' if dual else 'mono'}"
        print(f"{tag:16s} {slabs:6d} {fill:6.3f} {cost / 1e3:9.1f}")
fp_ns, wslabs = sp._fp_cost(cells)
print(f"{'free-placement':16s} {int(wslabs.sum()):6d} "
      f"{nz / (int(wslabs.sum()) * 8 * sp.CAP):6.3f} {fp_ns / 1e3:9.1f}"
      f"   (cells too small: slot fill = avg cell count / 127)")
span, dual, fp = sp.pick_geometry_fp(g_r, g_c, csr.m)
print(f"\npick: span={span} dual={dual} fp={fp}")
C, gwin = sp._group_counts_cells(uw, uq, uc, nq, span)
slabs_pick = (sp._dual_slab_count(C, gwin) if dual
              else int((-(-C.max(axis=1) // sp.CAP)).sum()))
chunks_pick = (2 if dual else 1) * (span // 8)
stage_e = sp.STAGE_CHUNK_NS * chunks_pick / (nz / slabs_pick)
print(f"staging asymptote at the pick: {stage_e:.2f} ns/entry "
      f"-> {nz * stage_e / 1e3:.0f} us floor (span-independent: "
      f"entries/slab and chunks/slab both scale with span)")

if "--bench" in sys.argv:
    from tilespmv_tpu.bench.harness import benchmark_op
    from tilespmv_tpu.ops.spmv import TileSpMV
    op = TileSpMV(tm, backend="pallas")
    res = benchmark_op(op, name="hypersparse_large")
    print(f"\nmeasured: {res.ms:.4f} ms  {res.gflops:.2f} GFLOPS  "
          f"{res.ms * 1e9 / csr.nnz:.0f} ps/entry  "
          f"reliable={res.reliable}")
