"""Distributed tiled SpMV: row-partitioned tile grid over a device mesh.

New subsystem with no reference counterpart (the reference is single-GPU,
SURVEY.md §2.3). Design:

* The row space is split into `ndev` contiguous, tile-aligned blocks; each
  block is converted and planned independently (the per-device work is a
  complete single-chip TileSpMV problem).
* Per-device plans are *unified*: every device gets the same set of
  CSR-nnz-class / ELL-width-class engines, padded to the same shapes
  (padding tiles are inert: zero values scattered to block row 0). This
  makes the per-device program identical — pure SPMD — so the stacked plan
  shards with a single `P('row')` prefix spec.
* `shard_map` over the 1-D mesh runs the single-chip engine stack on each
  device's shard. x is either replicated (`x_mode="replicated"`) or sharded
  and reassembled with `jax.lax.all_gather` over ICI
  (`x_mode="allgather"`, the default — the all-gather overlaps with the
  leading engine work under XLA's scheduler).
* y comes back sharded by rows (`P('row')`) — no reduction needed, since a
  row block is owned by exactly one device.

This is the analog of how the reference balances work across warps
(tilespmv_cpu.h:68-118) lifted to the chip level: contiguous tile-row
ranges per worker, atomics replaced by ownership.
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import DEFAULT_CONFIG, TileConfig
from ..core.convert import tile_create
from ..io.mmio import CSRMatrix
from ..ops.plan import ResidualEngine, SpMVPlan, build_plan
from ..ops.spmv import spmv
from .mesh import ROW_AXIS, make_mesh


def _row_block(csr: CSRMatrix, r0: int, r1: int,
               rows_padded: int) -> CSRMatrix:
    """Rows [r0, r1) of `csr`, re-based to local indices and padded with
    empty rows to `rows_padded`."""
    r1c = max(r0, min(r1, csr.m))
    indptr = csr.indptr[r0: r1c + 1] if r0 <= csr.m else csr.indptr[-1:]
    if indptr.size == 0:
        indptr = csr.indptr[-1:]
    start = int(indptr[0])
    stop = int(indptr[-1])
    local_ptr = (indptr - start).astype(np.int64)
    pad_rows = rows_padded - (local_ptr.size - 1)
    if pad_rows > 0:
        local_ptr = np.concatenate(
            [local_ptr, np.full(pad_rows, local_ptr[-1], np.int64)])
    return CSRMatrix((rows_padded, csr.n), local_ptr,
                     csr.indices[start:stop], csr.data[start:stop])


def _pad_leading(a: jax.Array, target: int) -> jax.Array:
    if a.shape[0] == target:
        return a
    pad = [(0, target - a.shape[0])] + [(0, 0)] * (a.ndim - 1)
    return jnp.pad(a, pad)


def _pad_residual(e: ResidualEngine, target: int) -> ResidualEngine:
    """Pad a residual engine with zero-valued entries at the last local
    row (keeps rows sorted so segment sums stay valid)."""
    n0 = e.val.shape[0]
    if n0 == target:
        return e
    last_row = e.row[-1] if n0 else jnp.zeros((), jnp.int32)
    return ResidualEngine(
        val=_pad_leading(e.val, target),
        row=jnp.concatenate(
            [e.row, jnp.full(target - n0, last_row, jnp.int32)]),
        col=_pad_leading(e.col, target))


def _unify_plans(plans: list[SpMVPlan]) -> list[SpMVPlan]:
    """Give every plan the same treedef and leaf shapes (see module doc)."""
    from ..ops.plan import (ColEngine, CsrEngine, DenseEngine, EllEngine,
                            ResidualEngine, RowEngine)
    cdt = plans[0].dense.val.dtype

    def unify_simple(get, rebuild):
        target = max(get(p).val.shape[0] for p in plans)
        target = max(target, 8)
        out = []
        for p in plans:
            e = get(p)
            out.append(rebuild(e, target))
        return out

    denses = unify_simple(
        lambda p: p.dense,
        lambda e, t: DenseEngine(val=_pad_leading(e.val, t),
                                 tilerow=_pad_leading(e.tilerow, t),
                                 tilecol=_pad_leading(e.tilecol, t)))
    rows_ = unify_simple(
        lambda p: p.rows,
        lambda e, t: RowEngine(val=_pad_leading(e.val, t),
                               grow=_pad_leading(e.grow, t),
                               tilecol=_pad_leading(e.tilecol, t)))
    cols_ = unify_simple(
        lambda p: p.cols,
        lambda e, t: ColEngine(val=_pad_leading(e.val, t),
                               gcol=_pad_leading(e.gcol, t),
                               tilerow=_pad_leading(e.tilerow, t)))

    b = plans[0].tile_size
    # union of ELL width classes / CSR nnz classes across devices
    ell_widths = sorted({e.val.shape[1] for p in plans for e in p.ells})
    csr_ws = sorted({e.val.shape[1] for p in plans for e in p.csrs})

    def unified_ells(p):
        by_w = {e.val.shape[1]: e for e in p.ells}
        out = []
        for w in ell_widths:
            nt = max(max((e2.val.shape[0] for p2 in plans
                          for e2 in p2.ells if e2.val.shape[1] == w),
                         default=8), 8)
            e = by_w.get(w)
            if e is None:
                out.append(EllEngine(
                    val=jnp.zeros((nt, w, b), cdt),
                    col=jnp.zeros((nt, w, b), jnp.uint8),
                    tilerow=jnp.zeros(nt, jnp.int32),
                    tilecol=jnp.zeros(nt, jnp.int32)))
            else:
                out.append(EllEngine(
                    val=_pad_leading(e.val, nt),
                    col=_pad_leading(e.col, nt),
                    tilerow=_pad_leading(e.tilerow, nt),
                    tilecol=_pad_leading(e.tilecol, nt)))
        return tuple(out)

    def unified_csrs(p):
        by_w = {e.val.shape[1]: e for e in p.csrs}
        out = []
        for w in csr_ws:
            nt = max(max((e2.val.shape[0] for p2 in plans
                          for e2 in p2.csrs if e2.val.shape[1] == w),
                         default=8), 8)
            e = by_w.get(w)
            if e is None:
                out.append(CsrEngine(
                    val=jnp.zeros((nt, w), cdt),
                    rowcol=jnp.zeros((nt, w), jnp.uint8),
                    tilerow=jnp.zeros(nt, jnp.int32),
                    tilecol=jnp.zeros(nt, jnp.int32)))
            else:
                out.append(CsrEngine(
                    val=_pad_leading(e.val, nt),
                    rowcol=_pad_leading(e.rowcol, nt),
                    tilerow=_pad_leading(e.tilerow, nt),
                    tilecol=_pad_leading(e.tilecol, nt)))
        return tuple(out)

    res_n = max(max(p.residual.val.shape[0] for p in plans), 8)

    def unified_residual(p):
        return _pad_residual(p.residual, res_n)

    total_nnz = sum(p.nnz for p in plans)
    out = []
    for i, p in enumerate(plans):
        out.append(SpMVPlan(
            dense=denses[i], rows=rows_[i], cols=cols_[i],
            ells=unified_ells(p), csrs=unified_csrs(p),
            residual=unified_residual(p),
            m=p.m, n=p.n, tilem=p.tilem, tilen=p.tilen,
            tile_size=p.tile_size,
            nnz=total_nnz,  # uniform static metadata across shards
        ))
    return out


def _unify_lane_plans(plans: list) -> list:
    """Give per-shard LanePlans identical treedefs/shapes (SPMD): every
    shard gets every class, chunk counts padded to the max with inert
    chunks appended at the last window (cw stays monotone)."""
    from ..ops.pallas.lane_plan import (BAND_K, META_XLOC, BandChunks,
                                        DenseChunks, SparseChunks,
                                        LanePlan, empty_dense_class,
                                        empty_sparse_class)
    from ..ops.pallas.stream_plan import (StreamChunks, empty_stream_chunks)
    n_windows = max(p.n_windows for p in plans)
    # df64 classes store f32 part-planes, so the VALUE dtype cannot
    # distinguish precisions — read the static class flags instead
    df64 = any((p.dense is not None and p.dense.df64)
               or (p.band is not None and p.band.df64)
               or (p.stream is not None and p.stream.df64)
               for p in plans)
    cdt = jnp.float64 if df64 else None
    if cdt is None:
        for p in plans:
            if p.dense is not None:
                cdt = p.dense.val.dtype
            for s in p.sparses:
                cdt = s.val.dtype
    cdt = cdt or jnp.float32
    t_dense = max((p.dense.t_lanes for p in plans if p.dense is not None),
                  default=128)

    def pad_class(c, target, n_windows, is_dense):
        # per-step cw/cfirst padding below assumes one chunk per step;
        # shard plans are built with force_t (which pins c_batch=1)
        assert c.c_batch == 1, "SPMD unification requires c_batch == 1"
        nc = c.val.shape[0]
        if nc == target:
            return c
        extra = target - nc
        t = c.t_lanes
        meta_pad = np.zeros((extra,) + tuple(c.meta.shape[1:]), np.int32)
        meta_pad[:, META_XLOC] = -1
        kw = dict(
            val=jnp.concatenate(
                [c.val, jnp.zeros((extra,) + c.val.shape[1:], c.val.dtype)]),
            meta=jnp.concatenate([c.meta, jnp.asarray(meta_pad)]),
            pb=jnp.concatenate(
                [c.pb, jnp.zeros(extra * c.k_panels, jnp.int32)]),
            cw=jnp.concatenate(
                [c.cw, jnp.full(extra, n_windows - 1, jnp.int32)]),
            cfirst=jnp.concatenate([c.cfirst, jnp.zeros(extra, jnp.int32)]),
        )
        if is_dense:
            return DenseChunks(t_lanes=t, k_panels=c.k_panels,
                               df64=c.df64, route=c.route, **kw)
        return SparseChunks(width=c.width, t_lanes=t,
                            k_panels=c.k_panels, route=c.route, **kw)

    route_dense = next((p.dense.route for p in plans
                        if p.dense is not None), "onehot")
    denses = []
    for p in plans:
        d = p.dense if p.dense is not None else empty_dense_class(
            n_windows, t_dense, cdt, k_panels=4, route=route_dense)
        denses.append(d)
    nd = max(d.val.shape[0] for d in denses)
    denses = [pad_class(d, nd, n_windows, True) for d in denses]

    # band class: pad C (brick columns) and window count across shards;
    # shards without one get an all-inert band (initializes its output)
    has_band = any(p.band is not None for p in plans)
    bands = [None] * len(plans)
    if has_band:
        import numpy as _np
        cmax = max(p.band.c_cols for p in plans if p.band is not None)
        vparts = 2 if df64 else 1   # df64 band val rows: (hi, lo) per C

        def pad_band(b):
            if b is None:
                return BandChunks(
                    val=jnp.zeros((n_windows, vparts * cmax, 16, 16, 256),
                                  jnp.float32 if df64 else cdt),
                    bloc=jnp.zeros((n_windows, 1, 256), jnp.int32),
                    pb=jnp.zeros(n_windows * BAND_K, jnp.int32),
                    cw=jnp.asarray(_np.arange(n_windows,
                                              dtype=_np.int32)),
                    cfirst=jnp.ones(n_windows, jnp.int32),
                    c_cols=cmax, k_panels=BAND_K, df64=df64)
            val = b.val
            if b.c_cols < cmax:
                # extra brick columns are zero: they multiply x at
                # in-range panel lanes and add nothing (df64: 3 part
                # rows per brick column)
                val = jnp.pad(val,
                              [(0, 0), (0, vparts * (cmax - b.c_cols)),
                               (0, 0), (0, 0), (0, 0)])
            nw = b.cw.shape[0]
            if nw < n_windows:
                extra = n_windows - nw
                val = jnp.concatenate(
                    [val, jnp.zeros((extra,) + tuple(val.shape[1:]),
                                    val.dtype)])
                return BandChunks(
                    val=val,
                    bloc=jnp.concatenate(
                        [b.bloc, jnp.zeros((extra, 1, 256), jnp.int32)]),
                    pb=jnp.concatenate(
                        [b.pb, jnp.zeros(extra * b.k_panels,
                                         jnp.int32)]),
                    cw=jnp.asarray(_np.arange(n_windows,
                                              dtype=_np.int32)),
                    cfirst=jnp.ones(n_windows, jnp.int32),
                    c_cols=cmax, k_panels=b.k_panels, df64=b.df64)
            return BandChunks(val=val, bloc=b.bloc, pb=b.pb, cw=b.cw,
                              cfirst=b.cfirst, c_cols=cmax,
                              k_panels=b.k_panels, df64=b.df64)
        bands = [pad_band(p.band) for p in plans]

    # sparse classes unify per width: every shard gets every width that
    # appears anywhere, padded to that width's max chunk count
    widths = sorted({s.width for p in plans for s in p.sparses})
    sparses = [[] for _ in plans]
    for w in widths:
        route_w = next((s.route for p in plans for s in p.sparses
                        if s.width == w), "onehot")
        per = []
        for p in plans:
            match = [s for s in p.sparses if s.width == w]
            per.append(match[0] if match
                       else empty_sparse_class(n_windows, w, cdt,
                                               k_panels=4,
                                               route=route_w))
        ns = max(s.val.shape[0] for s in per)
        for i, s in enumerate(per):
            sparses[i].append(pad_class(s, ns, n_windows, False))
    sparses = [tuple(s) for s in sparses]

    has_stream = any(p.stream is not None for p in plans)
    streams = [None] * len(plans)
    if has_stream:
        nw2 = max(p.n_stream_windows for p in plans)
        rounds = max(p.stream.rounds for p in plans
                     if p.stream is not None)
        # s_batch is a STATIC pytree field: an empty shard class must
        # match the real shards' rate or the stacked plans' treedefs
        # diverge
        s_b = next(p.stream.s_batch for p in plans
                   if p.stream is not None)
        per = [p.stream if p.stream is not None
               else empty_stream_chunks(nw2, cdt, rounds=rounds,
                                        s_batch=s_b)
               for p in plans]
        ns = max(s.nslabs for s in per)
        # df64 segmented scan: segmask presence and scan depth are
        # static pytree data — unify to the max depth, giving empty
        # shards all-zero masks (zero mask = no in-run neighbors, the
        # scan is a no-op on their zero contributions)
        seg_lv = max((s.scan_levels for s in per
                      if s.segmask is not None), default=-1)

        def pad_stream(s):
            planes = s.planes  # per-STEP stacked: (nsteps, R*3*8*S, 128)
            if s.rounds < rounds:
                # extra rounds are all-zero: rend == rstart -> zero diff
                planes = jnp.pad(
                    planes,
                    [(0, 0),
                     (0, (rounds - s.rounds) * 3 * 8 * s.s_batch),
                     (0, 0)])
            segmask = s.segmask
            if seg_lv >= 0 and segmask is None:
                segmask = jnp.zeros_like(s.vidx, dtype=jnp.int8)
            extra = ns - s.nslabs
            if not extra and s.rounds == rounds \
                    and s.scan_levels == seg_lv and (
                        (segmask is None) == (s.segmask is None)):
                return s

            def padn(a):
                return jnp.concatenate(
                    [a, jnp.zeros((extra,) + a.shape[1:], a.dtype)])
            xsteps = extra // s.s_batch
            return StreamChunks(
                val=padn(s.val), vidx=padn(s.vidx),
                planes=jnp.concatenate(
                    [planes, jnp.zeros((xsteps,) + planes.shape[1:],
                                       planes.dtype)]),
                sbase=jnp.concatenate(
                    [s.sbase, jnp.zeros(extra, jnp.int32)]),
                cw=jnp.concatenate(
                    [s.cw, jnp.full(xsteps, nw2 - 1, jnp.int32)]),
                cfirst=jnp.concatenate(
                    [s.cfirst, jnp.zeros(xsteps, jnp.int32)]),
                sactive=jnp.concatenate(
                    [s.sactive, jnp.zeros(xsteps, jnp.int32)]),
                val_lo=padn(s.val_lo) if s.df64 else None,
                sbase2=(jnp.concatenate(
                    [s.sbase2, jnp.zeros(extra, jnp.int32)])
                    if s.sbase2 is not None else None),
                segmask=padn(segmask) if segmask is not None else None,
                s_batch=s.s_batch, rounds_=rounds, df64=s.df64,
                span_rows=s.span_rows, dual=s.dual,
                scan_levels=seg_lv)
        streams = [pad_stream(s) for s in per]

    res_n = max(max(p.residual.val.shape[0] for p in plans), 8)
    total_nnz = sum(p.nnz for p in plans)
    out = []
    for i, p in enumerate(plans):
        e = _pad_residual(p.residual, res_n)
        out.append(LanePlan(
            dense=denses[i], band=bands[i], sparses=sparses[i], residual=e,
            stream=streams[i],
            m=p.m, n=p.n, tilem=p.tilem, tilen=p.tilen,
            tile_size=p.tile_size, nnz=total_nnz, n_windows=n_windows))
    return out


@dataclasses.dataclass(frozen=True)
class HaloPlan:
    """Selective x-exchange plan (SURVEY.md §2.3): which 128-value x
    blocks each device must receive from each peer, derived from the
    per-partition set of occupied columns.

    Each shard's matrix is *column-renumbered* into a compact local x
    layout — [its own x2d rows ++ one `max_pk`-row packet segment per
    peer] — so the runtime is a sender-side row gather + one all-to-all
    + a concat: spans stay contiguous, no scatter."""
    rx: int              # own x2d rows per device
    max_pk: int          # packet rows per (src, dst) pair (padded)
    n_x_pad: int         # padded global x length (ndev * rx * 128)
    traffic_ratio: float  # halo bytes / all-gather bytes (per device)
    send_idx: np.ndarray  # (ndev, ndev*max_pk) local x2d rows to send
    local_blocks: list    # per-shard CSRMatrix over the OWN x segment
    foreign_blocks: list  # per-shard CSRMatrix over the packet segments
                          # (split so the all-to-all overlaps with the
                          # local-columns compute, SURVEY §5)


def _plan_halo(blocks: list, n: int, ndev: int) -> HaloPlan:
    XB = 128
    rx = max(1, -(-n // (ndev * XB)))
    n_x_pad = ndev * rx * XB
    # needed foreign blocks per (dst, src)
    need = []
    for d, blk in enumerate(blocks):
        gb = np.unique(blk.indices.astype(np.int64) >> 7)
        need.append(gb)
    per_pair = [[need[d][(need[d] // rx) == e] for e in range(ndev)]
                for d in range(ndev)]
    max_pk = max((pp.shape[0] for d in range(ndev)
                  for e, pp in enumerate(per_pair[d]) if e != d),
                 default=0)
    max_pk = max(max_pk, 1)
    # sender side: device e sends to d the blocks per_pair[d][e]
    send_idx = np.zeros((ndev, ndev * max_pk), np.int32)
    for e in range(ndev):
        for d in range(ndev):
            if d == e:
                continue
            loc = (per_pair[d][e] - e * rx).astype(np.int32)
            send_idx[e, d * max_pk: d * max_pk + loc.shape[0]] = loc
    # compact column map per shard: own rows first, then peer segments.
    # The matrix splits into a local part (own columns, computable before
    # the exchange lands) and a foreign part (packet columns).
    local_blocks, foreign_blocks = [], []
    n_own = rx * XB
    n_c = (rx + ndev * max_pk) * XB
    for d, blk in enumerate(blocks):
        cmap = np.full(ndev * rx, -1, np.int64)
        own = np.arange(d * rx, (d + 1) * rx)
        cmap[own] = np.arange(rx)
        for e in range(ndev):
            if e == d:
                continue
            gb = per_pair[d][e]
            cmap[gb] = rx + e * max_pk + np.arange(gb.shape[0])
        cols = blk.indices.astype(np.int64)
        newcols = cmap[cols >> 7] * XB + (cols & (XB - 1))
        rowid = np.repeat(np.arange(blk.m), np.diff(blk.indptr))
        for is_local in (True, False):
            sel = (newcols < n_own) if is_local else (newcols >= n_own)
            r_s, c_s, v_s = rowid[sel], newcols[sel], blk.data[sel]
            order = np.lexsort((c_s, r_s))
            indptr = np.concatenate(
                [[0], np.cumsum(np.bincount(r_s, minlength=blk.m))]
            ).astype(np.int64)
            sub = CSRMatrix(
                (blk.m, n_own if is_local else n_c), indptr,
                c_s[order].astype(np.int64), v_s[order])
            (local_blocks if is_local else foreign_blocks).append(sub)
    ag_bytes = (ndev - 1) * rx
    halo_bytes = ndev * max_pk
    ratio = halo_bytes / max(ag_bytes, 1)
    return HaloPlan(rx=rx, max_pk=max_pk, n_x_pad=n_x_pad,
                    traffic_ratio=ratio, send_idx=send_idx,
                    local_blocks=local_blocks,
                    foreign_blocks=foreign_blocks)


def _plan_blocks(tile_matrices, backend, compute_dtype):
    """Per-shard plans with shard-uniform knobs (shared by the 1-D and
    2-D partitions): force_t pins chunk shapes, the stream decision is
    global so every shard compiles the same program."""
    if backend == "pallas":
        from ..ops.pallas.lane_plan import (STREAM_MIN_ENTRIES,
                                            build_lane_plan)
        coo_total = sum(int(tm.coo.val.shape[0]) if tm.coo.num_tiles else 0
                        for tm in tile_matrices)
        use_stream = coo_total >= STREAM_MIN_ENTRIES
        # shard-uniform stream knobs: s_batch=8 (on-chip singles measure
        # 118.9 ns/slab at 8 vs 153.6 at 4 — calibrate_slab_ns round 3)
        # and the default span width
        plans = [build_lane_plan(tm, compute_dtype=compute_dtype,
                                 force_t=128, use_stream=use_stream,
                                 stream_s_batch=8, stream_span_rows=64)
                 for tm in tile_matrices]
        return _unify_lane_plans(plans)
    plans = [build_plan(tm, compute_dtype=compute_dtype)
             for tm in tile_matrices]
    return _unify_plans(plans)


class DistributedSpMV:
    """Row-partitioned SpMV over a 1-D device mesh.

    >>> op = DistributedSpMV(csr, mesh=make_mesh())
    >>> y = op(x)          # y sharded P('row') over the mesh

    backend "pallas" runs the lane-major Pallas engines per shard;
    "xla" the jnp engines; "auto" picks pallas for 16-sized tiles.
    """

    def __init__(self, csr: CSRMatrix,
                 mesh: Optional[Mesh] = None,
                 config: TileConfig = DEFAULT_CONFIG,
                 compute_dtype=jnp.float32,
                 backend: str = "auto",
                 x_mode: str = "allgather"):
        if x_mode not in ("allgather", "replicated", "halo", "auto"):
            raise ValueError(f"unknown x_mode {x_mode!r}")
        if backend == "auto":
            backend = "pallas" if config.tile_size == 16 else "xla"
        self.mesh = mesh if mesh is not None else make_mesh()
        ndev = self.mesh.devices.size
        b = config.tile_size
        m, n = csr.shape
        tilem_total = -(-m // b)
        tilem_per = -(-tilem_total // ndev)
        rows_per = tilem_per * b
        self.m, self.n = m, n
        self.rows_per_device = rows_per
        self.compute_dtype = jnp.dtype(compute_dtype)
        self.backend = backend
        # x padded to a multiple of ndev for even sharding
        self.n_pad = -(-n // ndev) * ndev

        blocks = [_row_block(csr, d * rows_per, (d + 1) * rows_per,
                             rows_per) for d in range(ndev)]

        if x_mode in ("halo", "auto"):
            halo = _plan_halo(blocks, n, ndev)
            if x_mode == "auto":
                # halo pays when the exchanged packets are meaningfully
                # smaller than an all-gather of the full x
                x_mode = ("halo" if ndev > 1 and halo.traffic_ratio < 0.75
                          else "allgather")
            elif ndev == 1:
                x_mode = "replicated"
        if x_mode == "halo":
            self.halo = halo
            self._send_idx = jax.device_put(
                jnp.asarray(halo.send_idx),
                NamedSharding(self.mesh, P(ROW_AXIS)))
        else:
            self.halo = None
        self.x_mode = x_mode

        if x_mode == "halo":
            # two plan stacks per shard: the LOCAL plan reads only the
            # shard's own x segment, so its compute is independent of the
            # packet exchange and XLA can overlap the all-to-all with it
            # (SURVEY §5: collectives overlapped with local tile compute)
            self.tile_matrices = [tile_create(b, config)
                                  for b in halo.local_blocks]
            tms_f = [tile_create(b, config) for b in halo.foreign_blocks]
            plans_l = _plan_blocks(self.tile_matrices, backend,
                                   compute_dtype)
            plans_f = _plan_blocks(tms_f, backend, compute_dtype)
            self.local_plan_struct = plans_l[0]
            sharding = NamedSharding(self.mesh, P(ROW_AXIS))
            self.plan_sharded = (
                jax.device_put(jax.tree.map(lambda *xs: jnp.stack(xs),
                                            *plans_l), sharding),
                jax.device_put(jax.tree.map(lambda *xs: jnp.stack(xs),
                                            *plans_f), sharding))
        else:
            self.tile_matrices = [tile_create(block, config)
                                  for block in blocks]
            plans = _plan_blocks(self.tile_matrices, backend,
                                 compute_dtype)
            self.local_plan_struct = plans[0]
            stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *plans)
            # place the stacked plan sharded over the mesh
            self.plan_sharded = jax.device_put(
                stacked, NamedSharding(self.mesh, P(ROW_AXIS)))

        backend_ = backend
        x_mode_ = x_mode
        n_ = n
        halo_ = self.halo

        if x_mode == "halo":
            def local_step(plan_stacks, x_in, sidx):
                stack_l, stack_f = plan_stacks
                local_l = jax.tree.map(lambda a: a[0], stack_l)
                local_f = jax.tree.map(lambda a: a[0], stack_f)
                # start the selective exchange, then compute the local-
                # columns plan while the packets are in flight (XLA's
                # scheduler runs the async all-to-all concurrently — the
                # local plan has no data dependence on it)
                x2 = x_in.reshape(halo_.rx, 128)
                send = jnp.take(x2, sidx[0], axis=0)  # (ndev*max_pk, 128)
                recv = jax.lax.all_to_all(send, ROW_AXIS,
                                          split_axis=0, concat_axis=0,
                                          tiled=True)
                y_local = spmv(local_l, x_in[: local_l.n],
                               backend=backend_)
                x_c = jnp.concatenate([x2, recv], axis=0).reshape(-1)
                y_foreign = spmv(local_f, x_c[: local_f.n],
                                 backend=backend_)
                return y_local + y_foreign

            self._step = jax.jit(jax.shard_map(
                local_step, mesh=self.mesh,
                in_specs=((P(ROW_AXIS), P(ROW_AXIS)), P(ROW_AXIS),
                          P(ROW_AXIS)),
                out_specs=P(ROW_AXIS), check_vma=False))
        else:
            def local_step(plan_stack: SpMVPlan,
                           x_in: jax.Array) -> jax.Array:
                local = jax.tree.map(lambda a: a[0], plan_stack)
                if x_mode_ == "allgather":
                    x_full = jax.lax.all_gather(x_in, ROW_AXIS, tiled=True)
                else:
                    x_full = x_in
                return spmv(local, x_full[:n_], backend=backend_)

            in_x_spec = P(ROW_AXIS) if x_mode == "allgather" else P()
            # check_vma=False: pallas_call outputs carry no
            # varying-mesh-axis annotation yet
            self._step = jax.jit(jax.shard_map(
                local_step, mesh=self.mesh,
                in_specs=(P(ROW_AXIS), in_x_spec),
                out_specs=P(ROW_AXIS), check_vma=False))

    @property
    def shape(self) -> tuple[int, int]:
        return (self.m, self.n)

    def __call__(self, x) -> jax.Array:
        x = jnp.asarray(x, dtype=self.compute_dtype)
        if x.shape != (self.n,):
            raise ValueError(f"x has shape {x.shape}, expected ({self.n},)")
        if self.x_mode == "halo":
            x = jnp.pad(x, (0, self.halo.n_x_pad - self.n))
            x = jax.device_put(x, NamedSharding(self.mesh, P(ROW_AXIS)))
            y = self._step(self.plan_sharded, x, self._send_idx)
            return y[: self.m]
        if self.n_pad != self.n:
            x = jnp.pad(x, (0, self.n_pad - self.n))
        if self.x_mode == "allgather":
            x = jax.device_put(x, NamedSharding(self.mesh, P(ROW_AXIS)))
        else:
            x = jax.device_put(x, NamedSharding(self.mesh, P()))
        y = self._step(self.plan_sharded, x)
        return y[: self.m]

    def flops(self) -> int:
        return 2 * self.local_plan_struct.nnz
