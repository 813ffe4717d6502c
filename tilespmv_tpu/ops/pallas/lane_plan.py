"""Lane-major chunked execution plan for the Pallas engines.

Why a second plan layout: XLA's gather/scatter lowers to element-serial
loops on TPU (measured ~6.5 ns/element on v5e — a thousand times slower
than streaming). The Pallas engines therefore need a layout where *nothing*
is dynamically indexed per element:

* tiles are processed in chunks of T tiles, with the tile index in the
  **lane** dimension — every per-tile quantity is a (.., T) array and all
  per-tile math is a full-width VPU op;
* within each output row-window, tiles are **sorted by tile-column** and
  packed into grid steps that reference at most K distinct 256-tile-column
  x *panels* ((16, 256) pre-transposed blocks, pipeline-fetched by
  scalar-prefetch index maps). The x-block gather is then width-128
  hardware lane gathers (`tpu.dynamic_gather`) — no per-element gathers
  and no in-kernel dynamic reads;
* the y scatter becomes a **one-hot aggregation matmul**: chunks are grouped
  by output row-window (ROW_WINDOW tile-rows); the chunk's (16, T) tile
  results are multiplied by a (T, ROW_WINDOW) one-hot row matrix and
  accumulated into the window's (16, ROW_WINDOW) output block, which Pallas
  keeps resident in VMEM across the window's consecutive chunks.

This mirrors the reference's warp-per-tile-row-chunk structure
(tilespmv_cpu.h:68-118, tilespmv_cuda.h:41-47) rebuilt for a VLIW vector
machine: the warp becomes the lane chunk, shared-memory staging becomes
the VMEM x-span, and atomics become one-hot matmul aggregation.

Execution-time format routing (the TPU analog of the reference's per-tile
format dispatch, tilespmv_cuda.h:394-792): every non-COO tile is routed by
its stored-entry count into either

* the **dense class** — full (16, 16) value blocks, 16 VPU FMA steps; used
  for tiles with >= DENSE_MIN_NNZ entries, where streaming the padded
  block is cheaper than decoding indices; or
* a **packed sparse-entry class** of width W in W_CHOICES — W value slots
  per tile (slot 0 reserved zero), 4-bit intra-tile column indices packed
  8 per int32 word (the nibble codec of reference encode.h:29-50, packed
  deeper for HBM traffic), and a 16-entry packed row-pointer plane. The
  kernel gathers x per slot by hardware sublane gathers, forms the
  row sums with one triangular-matrix MXU prefix multiply plus a packed
  boundary gather — ~5 bytes/nnz instead of the 1 KB densified block
  (this is the device-side tile-CSR/ELL execution the reference runs at
  tilespmv_cuda.h:531-605, without warp shuffles).

COO tiles run in the entry-level stream engine (stream_plan.py, the CSR5
analog) or — when dense enough per tile — in a sparse class. The per-tile
*storage* formats (TileMatrix) are unchanged — this is an execution-time
re-mapping driven by the TPU cost model, the same selector idea as
reference csr2tile.h:108-328 applied to different hardware.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ...core.tile_matrix import TileMatrix
from ..plan import ResidualEngine
from .stream_plan import (MAX_SPAN_ROWS, RW_ROWS, SPAN_ROWS, StreamChunks,
                          build_stream_chunks)

T_CHOICES = (128, 256, 512)   # tiles per chunk (lane-dim width classes)
STREAM_MIN_ENTRIES = 2048     # below this the per-tile COO class wins
PANEL_TC = 256         # tile-columns per x panel (one (16, 256) VMEM block)
K_CHOICES = (1, 2, 4, 8)      # x panels addressable by one chunk
ROW_WINDOW = 256       # tile-rows per output block (16 x 256 floats = 16KB)

# sparse-entry class widths (slot 0 is a reserved zero pad, so a width-W
# class holds tiles with <= W-1 stored entries); tiles at or above
# DENSE_MIN_NNZ stored entries densify instead. Crossover measured TWICE
# on v5e with conflicting answers (BASELINE.md): isolated uniform 16k-tile
# populations prefer dense from ~64 entries (clean 1 KB streams), but on
# mixed_large the W96 class beats densifying its scattered ~80-entry ELL
# tiles (13.5 vs ~31 us — fragmented dense chunks waste lanes and HBM).
# The in-situ evidence wins: keep the wide classes.
W_CHOICES = (16, 24, 32, 48, 64, 96)
DENSE_MIN_NNZ = 96
SPARSE_T = 128         # sparse classes pin T=128 (sublane-gather shapes)
MIN_CLASS_TILES = 512  # merge thinner classes upward (per-call overhead)
# COO tiles go to a sparse class instead of the stream engine when their
# mean entry count crosses this (measured: stream wins near 1 nnz/tile)
COO_SPARSE_MIN_AVG = 4.0
# ... and even near-singleton populations leave the stream engine when
# they are WINDOW-sparse: a (window, span) group far below slab capacity
# pads its slab and still pays the full step cost (a 5-point stencil's
# 31744 corner singletons cost ~106 us as 256 one-slab steps at 12%
# fill, vs ~35 us absorbed into the W16 class). The absorb estimate
# must beat the stream cost model by this factor to flip the routing —
# stream is the measured-calibrated engine, so ties keep it.
STREAM_ABSORB_MARGIN = 0.7
# last (absorb_ns, stream_ns) estimate pair from build_lane_plan's
# COO routing decision, for observability (round-4 advisor)
LAST_ABSORB_ESTIMATE = None
# df64 densification keeps a (window, round) tile group only when it can
# fill this many of the chunk's T lanes; deeper/thinner groups run as
# entries in the exact df64 stream engine (heavy tile-rows otherwise
# force one round per tile — 51x padding on mixed_large). On-chip A/B
# (mixed_large df64): 48 measured 424 us, 4..24 flat at 298-325 — the
# dense df64 class beats the stream for multi-entry tiles even at low
# lane fill, so keep only truly degenerate rounds out
DF64_ROUND_FILL_MIN = 12

# dense-class meta rows (int32): x span location and window-local tile row
META_XLOC = 0
META_LROW = 1
DENSE_MROWS = 2
# f32 window routing for the dense AND W-classes (see
# DenseChunks.route): "prefix" replaces the per-chunk one-hot build
# with a triangular-MXU lane prefix + boundary-difference gathers over
# plan-time rend planes (meta rows DENSE_MROWS..DENSE_MROWS+2*rpp).
# Default is ONE-HOT: the prefix route's original win (402.6 vs 551.6
# ns/chunk, commit 0184488) did NOT replicate the next day — the same
# script gave onehot 407-417 vs prefix 559-640, twice, and the
# interleaved full-SpMV arbiter (scripts/ab_route_e2e.py, arms
# alternated A,B,B,A within one process so tunnel drift cancels)
# measured onehot 148.5 us vs prefix 172.3 us e2e on mixed_large in
# all 4 rounds. Keep the prefix implementation: it is exact, tested,
# and re-flippable if a future chip inverts the trade again.
DENSE_ROUTE = "onehot"

# band (brick) class: tile-row stripes whose non-COO tiles span at most
# BAND_MAX_COLS consecutive tile-columns become one dense (16, 16*C)
# brick with lane = tile-row. The kernel then needs NO index decode, NO
# x gather beyond C static panel row slices, and NO output routing
# (lanes ARE the window's tile-rows) — pure HBM streaming. This is the
# diagonal/DIA-style execution class; the reference has no counterpart
# (its dense format stops at single 16x16 tiles, csr2tile.h:549-567).
BAND_MAX_COLS = 8
BAND_MIN_STRIPE_FILL = 0.30   # stripe nnz / (ext*256) to qualify
BAND_MIN_CLASS_FILL = 0.30    # selected nnz / (nchunks*C*256*T)
BAND_MIN_WINDOW_FRAC = 0.7    # fraction of windows with a band chunk
BAND_K = 4                    # panels per band step


def sparse_meta_rows(width: int) -> int:
    """Meta rows of a width-W sparse class: xloc, lrow, W/8 packed-nibble
    column rows, 4 packed-byte row-pointer rows."""
    return 2 + width // 8 + 4


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class DenseChunks:
    """Densified-tile class: (nchunks, 16, 16, T) value blocks.
    `cw`/`cfirst` are per grid *step* (`c_batch` same-window chunks)."""
    val: Any       # (nchunks, 16, 16, T)
    meta: Any      # (nchunks, DENSE_MROWS, T) int32
    pb: Any        # (nchunks*K,) int32 — x panel ids (flat: 2-D scalar
    #                prefetch arrays pad to 128 lanes in SMEM)
    cw: Any        # (nsteps,) int32 — output window id
    cfirst: Any    # (nsteps,) int32 — 1 if first step of its window

    t_lanes: int = dataclasses.field(metadata=dict(static=True))
    k_panels: int = dataclasses.field(default=1,
                                      metadata=dict(static=True))
    c_batch: int = dataclasses.field(default=1,
                                     metadata=dict(static=True))
    df64: bool = dataclasses.field(default=False,
                                   metadata=dict(static=True))
    # "onehot": route each chunk's (16, T) result to the window block by
    # an exact one-hot matmul. "prefix": lanes are lrow-sorted with lane
    # 0 reserved inert, the kernel takes an exact-3-split triangular-MXU
    # prefix along lanes and routes by boundary-difference lane gathers
    # over plan-time rend planes — the one-hot compare/select surface
    # (~18% of the f32 chunk time, round-3 ablation) disappears.
    route: str = dataclasses.field(default="onehot",
                                   metadata=dict(static=True))


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class BandChunks:
    """Brick class: one chunk per output window, lane = tile-row; val
    holds C j-major (16, T) column slabs per brick."""
    val: Any       # (nchunks, C, 16, 16, T): [ci, col_blk, j, i, t]
    bloc: Any      # (nchunks, 1, T) int32: panel-slot*256 + col offset
    pb: Any        # (nchunks*K,) int32 panel ids
    cw: Any        # (nchunks,) int32
    cfirst: Any    # (nchunks,) int32

    c_cols: int = dataclasses.field(metadata=dict(static=True))
    k_panels: int = dataclasses.field(default=BAND_K,
                                      metadata=dict(static=True))
    df64: bool = dataclasses.field(default=False,
                                   metadata=dict(static=True))


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class SparseChunks:
    """Packed sparse-entry class: (nchunks, W, T) value slots (slot 0
    reserved zero, entries row-sorted), 4-bit columns and row pointers
    packed into the meta rows (see sparse_meta_rows)."""
    val: Any       # (nchunks, W, T)
    meta: Any      # (nchunks, sparse_meta_rows(W), T) int32
    pb: Any        # (nchunks*K,) int32
    cw: Any        # (nsteps,) int32
    cfirst: Any    # (nsteps,) int32

    width: int = dataclasses.field(metadata=dict(static=True))
    t_lanes: int = dataclasses.field(metadata=dict(static=True))
    k_panels: int = dataclasses.field(default=1,
                                      metadata=dict(static=True))
    c_batch: int = dataclasses.field(default=1,
                                     metadata=dict(static=True))
    # window routing: "onehot" matmul or "prefix" boundary gathers over
    # appended meta rows (see DenseChunks.route)
    route: str = dataclasses.field(default="onehot",
                                   metadata=dict(static=True))


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class LanePlan:
    dense: Optional[DenseChunks]
    band: Optional[BandChunks]
    sparses: tuple  # of SparseChunks, ascending width
    residual: ResidualEngine  # leftover entries (HYB overflow / fallback)
    stream: Optional[StreamChunks]  # entry-level engine (COO tiles)

    m: int = dataclasses.field(metadata=dict(static=True))
    n: int = dataclasses.field(metadata=dict(static=True))
    tilem: int = dataclasses.field(metadata=dict(static=True))
    tilen: int = dataclasses.field(metadata=dict(static=True))
    tile_size: int = dataclasses.field(metadata=dict(static=True))
    nnz: int = dataclasses.field(metadata=dict(static=True))
    n_windows: int = dataclasses.field(metadata=dict(static=True))

    # heavy half of a split stream pair (stream_plan.split_stream_chunks):
    # disjoint window set, chained into `stream`'s output buffer
    stream2: Optional[StreamChunks] = None

    @property
    def n_panels(self) -> int:
        return max(1, -(-self.tilen // PANEL_TC))

    @property
    def x_padded_len(self) -> int:
        return self.n_panels * PANEL_TC * self.tile_size

    @property
    def y_padded_len(self) -> int:
        return self.n_windows * ROW_WINDOW * self.tile_size

    @property
    def x_padded_len128(self) -> int:
        # stream-class x layout: (rows, 128) with max-span slack; rows
        # rounded to whole 64-row spans so the kernel's chunked
        # x-staging can permute spans without an extra pad copy
        rows = -(-self.n // 128) + MAX_SPAN_ROWS
        return -(-rows // SPAN_ROWS) * SPAN_ROWS * 128

    @property
    def n_stream_windows(self) -> int:
        return max(1, -(-self.m // RW_ROWS))

    def flops(self) -> int:
        return 2 * self.nnz

    def bytes_accessed(self) -> int:
        def nbytes(a):
            return int(np.prod(a.shape)) * a.dtype.itemsize
        total = 0
        if self.dense is not None:
            d = self.dense
            total += nbytes(d.val) + nbytes(d.meta)
        if self.band is not None:
            total += nbytes(self.band.val) + nbytes(self.band.bloc)
        for s in self.sparses:
            total += nbytes(s.val) + nbytes(s.meta)
        for st in (self.stream, self.stream2):
            if st is not None:
                total += (nbytes(st.val) + nbytes(st.vidx)
                          + nbytes(st.planes))
        total += (nbytes(self.residual.val) + nbytes(self.residual.row)
                  + nbytes(self.residual.col))
        total += self.x_padded_len * 4 + self.m * 4
        return total

    def summary(self) -> dict:
        """Static per-class plan statistics — the observability
        counterpart of utils.profiling.profile_engines (which needs a
        device); role-equivalent of the reference's DEBUG_FORMATCOST
        prints (main.cu) at plan rather than run time."""
        s: dict = dict(m=self.m, n=self.n, nnz=self.nnz,
                       plan_mbytes=round(self.bytes_accessed() / 1e6, 2),
                       classes=[])
        if self.dense is not None:
            d = self.dense
            s["classes"].append(dict(
                kind="dense", chunks=int(d.val.shape[0]),
                t_lanes=d.t_lanes, k_panels=d.k_panels,
                c_batch=d.c_batch, df64=bool(d.df64)))
        if self.band is not None:
            b = self.band
            s["classes"].append(dict(
                kind="band", c_cols=int(b.c_cols),
                chunks=int(b.val.shape[0]), df64=bool(b.df64)))
        for w in self.sparses:
            s["classes"].append(dict(
                kind=f"w{w.width}", chunks=int(w.val.shape[0]),
                k_panels=w.k_panels))
        for tag, st in (("stream", self.stream),
                        ("stream2", self.stream2)):
            if st is not None:
                s["classes"].append(dict(
                    kind=tag, slabs=int(st.nslabs), s_batch=st.s_batch,
                    rounds=st.rounds, span_rows=st.span_rows,
                    df64=bool(st.df64)))
        s["residual_nnz"] = int(self.residual.val.shape[0])
        return s


def _expand(ptr):
    sizes = np.diff(ptr)
    owner = np.repeat(np.arange(sizes.shape[0]), sizes)
    off = np.arange(int(ptr[-1])) - ptr[owner]
    return owner, off


def _all_entries(tm: TileMatrix):
    """Every non-COO tile's stored entries as intra-tile triplets.

    Returns (trow, tcol, counts, r, c, v) with tiles sorted by
    (trow, tcol) and entries grouped per tile, sorted by (row, col).
    ELL/HYB padding slots are kept (zero value at column 0) — they cost a
    slot but keep the stored-entry semantics of the reference layouts
    (csr2tile.h:485-548)."""
    parts = []   # (trow, tcol, owner, r, c, v) per bucket

    def geom(tile_ids):
        trow = tm.tile_rowidx[tile_ids].astype(np.int64)
        tcol = tm.tile_columnidx[tile_ids].astype(np.int64)
        return trow, tcol

    bk = tm.dns
    if bk.num_tiles:
        trow, tcol = geom(bk.tile_ids)
        rowlen = tm.rowlen(trow)
        owner, off = _expand(bk.ptr)
        parts.append((trow, tcol, owner, off % rowlen[owner],
                      off // rowlen[owner], bk.val))

    bk = tm.csr
    if bk.num_tiles:
        trow, tcol = geom(bk.tile_ids)
        owner, _ = _expand(bk.nnz_ptr)
        parts.append((trow, tcol, owner, bk.row.astype(np.int64),
                      bk.col.astype(np.int64), bk.val))

    bk = tm.ell
    if bk.num_tiles:
        trow, tcol = geom(bk.tile_ids)
        rowlen = tm.rowlen(trow)
        owner, off = _expand(bk.ptr)
        parts.append((trow, tcol, owner, off % rowlen[owner],
                      bk.col.astype(np.int64), bk.val))

    # HYB: ELL part only (overflow entries live in the residual, like the
    # reference's fused kernel, tilespmv_cuda.h:635-660)
    bk = tm.hyb
    if bk.num_tiles:
        trow, tcol = geom(bk.tile_ids)
        rowlen = tm.rowlen(trow)
        owner, off = _expand(bk.ell_ptr)
        parts.append((trow, tcol, owner, off % rowlen[owner],
                      bk.ell_col.astype(np.int64), bk.ell_val))

    bk = tm.dnsrow
    if bk.num_tiles:
        trow, tcol = geom(bk.tile_ids)
        collen = tm.collen(tcol)
        owner, off = _expand(bk.ptr)
        rank = off // collen[owner]
        ci = off % collen[owner]
        ri = bk.row_ids[bk.row_ptr[owner] + rank].astype(np.int64)
        parts.append((trow, tcol, owner, ri, ci, bk.val))

    bk = tm.dnscol
    if bk.num_tiles:
        trow, tcol = geom(bk.tile_ids)
        rowlen = tm.rowlen(trow)
        owner, off = _expand(bk.ptr)
        rank = off // rowlen[owner]
        ri = off % rowlen[owner]
        ci = bk.col_ids[bk.col_ptr[owner] + rank].astype(np.int64)
        parts.append((trow, tcol, owner, ri, ci, bk.val))

    if not parts:
        z = np.zeros(0, np.int64)
        return z, z, z, z, z, np.zeros(0, np.float64)

    ntiles = 0
    own_all, tr_all, tc_all, r_all, c_all, v_all = [], [], [], [], [], []
    for trow, tcol, owner, r, c, v in parts:
        own_all.append(owner + ntiles)
        tr_all.append(trow)
        tc_all.append(tcol)
        r_all.append(r)
        c_all.append(c)
        v_all.append(v.astype(np.float64))
        ntiles += trow.shape[0]
    trow = np.concatenate(tr_all)
    tcol = np.concatenate(tc_all)
    owner = np.concatenate(own_all)
    r = np.concatenate(r_all)
    c = np.concatenate(c_all)
    v = np.concatenate(v_all)

    # sort tiles by (trow, tcol); entries by (tile, row, col) — composite
    # single-key argsorts (~3x cheaper than lexsort at this scale)
    tilen_span = int(tcol.max()) + 1 if ntiles else 1
    order_t = np.argsort(trow * tilen_span + tcol, kind="stable")
    rank_t = np.empty(ntiles, np.int64)
    rank_t[order_t] = np.arange(ntiles)
    trow, tcol = trow[order_t], tcol[order_t]
    counts = np.bincount(rank_t[owner], minlength=ntiles)
    order_e = np.argsort((rank_t[owner] << 8) | (r << 4) | c,
                         kind="stable")
    return trow, tcol, counts, r[order_e], c[order_e], v[order_e]


def df64_split(v: np.ndarray):
    """f64 -> (a1, a2, vl) f32 triple: vh = a1 + a2 exactly with 12-bit
    mantissas (Dekker pre-split, so in-kernel products a*b are EXACT in
    f32 — the v5e VPU does not contract mul-sub into an FMA, measured),
    and vl = v - vh captures the f64 tail to ~2^-48."""
    vh = v.astype(np.float32)
    vl = (v - vh.astype(np.float64)).astype(np.float32)
    t = np.float32(4097.0) * vh
    a1 = t - (t - vh)
    a2 = vh - a1
    return a1, a2, vl


def _densify(trow, tcol, counts, r, c, v, b: int):
    """(nt, b, b) dense blocks from per-tile triplets (tiles stay in
    order)."""
    nt = trow.shape[0]
    owner = np.repeat(np.arange(nt), counts)
    blocks = np.zeros((nt, b, b), np.float64)
    # np.add (not assign): ELL pad slots share (r=pad, c=0) with real
    # entries only when the real entry also has value there; adding keeps
    # explicit zeros harmless
    np.add.at(blocks, (owner, r, c), v)
    return blocks


# measured v5e constants driving the chunk-batch cost model: per-grid-step
# fixed cost (Mosaic step sequencing + DMA issue) and streaming bandwidth
STEP_FIXED_S = 0.25e-6
HBM_BPS = 800e9


def _window_stats(trow, tcol):
    """Per output window: tile count and distinct x-panel count."""
    win = trow // ROW_WINDOW
    key = win * (1 << 24) + (tcol >> 8)          # (window, panel)
    cnt = np.unique(win, return_counts=True)[1].astype(np.float64)
    wp = np.unique(key) >> 24
    panels = np.unique(wp, return_counts=True)[1].astype(np.float64)
    return cnt, panels


def _pick_k(trow, tcol, cap_tiles) -> int:
    """Panels per step: enough that step cutting is count-limited, not
    panel-limited (a cap_tiles-tile run covers ~cap/tiles-per-panel
    panels). Panel fetches ride the Pallas pipeline, so larger K costs
    only gather radix (2 lane gathers per panel per 128 lanes)."""
    cnt, panels = _window_stats(trow, tcol)
    per_panel = max(1.0, float(cnt.sum() / panels.sum()))
    need = cap_tiles / per_panel + 1.0
    for k in K_CHOICES:
        if k >= need:
            return k
    return K_CHOICES[-1]


def _pick_cb(trow: np.ndarray, tcol: np.ndarray, tilem: int,
             t_lanes: int, k_panels: int, chunk_bytes: int) -> int:
    """Chunks per grid step. Batching amortizes the ~0.25 us per-step
    fixed cost, but each window's chunk count is padded UP to a multiple
    of c_batch and every padding chunk streams a full zero val block,
    and the FIRST step's payload fetch cannot overlap compute (Pallas
    pipelining needs a second step to prefetch behind) — so pick the
    batch by minimizing (step fixed cost + padding bytes + one step's
    un-overlapped fetch) over the per-window chunk counts. The startup
    term is what stops small grids collapsing to one step: measured on
    dense_blocks_medium (4 chunks, t=512), the old pick cb=4 (1 step)
    ran 7.81 us vs cb=1 (4 steps) 6.26 us — a 1.25x loss to serialized
    fetch (scripts/ab_dense_cbatch.py, interleaved, ~0% spread)."""
    cnt, panels = _window_stats(trow, tcol)
    ln = max(len(cnt), len(panels))
    cnt = np.pad(cnt, (0, ln - len(cnt)))
    panels = np.pad(panels, (0, ln - len(panels)))
    nch = np.ceil(cnt / t_lanes)
    best, best_cost = 1, None
    for cb in (1, 2, 4, 8):
        steps = np.maximum(np.ceil(nch / cb), np.ceil(panels / k_panels))
        pad = steps * cb - nch
        cost = float((steps * STEP_FIXED_S
                      + pad * chunk_bytes / HBM_BPS).sum()
                     ) + cb * chunk_bytes / HBM_BPS
        if best_cost is None or cost < best_cost * 0.98:
            best, best_cost = cb, cost
    return best


# ---------------------------------------------------------------------------
# Per-matrix execution cost model (round-2 verdict task 5; the TPU
# re-derivation of the reference's byte-minimizing selector search,
# csr2tile.h:279-306). Every chunked class costs
#
#     steps * step_ns  +  padded_chunk_bytes / hbm  +  chunks * vpu_ns
#     + one dispatch,
#
# with the SAME per-window step-count estimate _pick_cb optimizes. This
# resolves the round-2 isolated-vs-in-situ crossover contradiction
# (BASELINE.md): isolated uniform populations fill their chunks (dense
# ~1.8 ns/tile, beats W96's ~5 ns/tile from ~64 entries up), but
# scattered tiles cut panel-limited steps and pad lanes, so the SAME
# dense class on mixed_large streams mostly-zero 1 KB blocks and loses
# to W96 by >2x — the fixed DENSE_MIN_NNZ threshold could not be right
# in both regimes because the crossover depends on lane fill and panel
# locality, which the step/padding terms carry explicitly.
COST = dict(
    step_ns=250.0,          # per-grid-step fixed cost (round-1 measured)
    call_ns=3000.0,         # per-pallas-call dispatch (tunnel-measured;
    #                         relative routing is insensitive to ±2 us)
    hbm_b_per_ns=800.0,     # 800 GB/s streaming = 800 bytes/ns
    vpu_ns_per_el=2.2e-3,   # VPU peak, ns per lane element
    sparse_chunk_ns=120.0,  # per sparse chunk: prefix matmul + decode
    sparse_slot_ns=1.3,     # per value slot: sublane gather, amortized
    #                         (anchored to mixed_large W96 = 13.5 us and
    #                         the isolated dense>=64 crossover, round 2)
)
# routing mode: "model" = cost-model threshold search, "fixed" = the
# round-2 DENSE_MIN_NNZ constant (also used under force_t so SPMD
# shards can never route divergently). Default stays "fixed" until the
# constants are calibrated against forced-routing A/B runs on the real
# chip (scripts/calibrate_cost.py): the two round-2 anchors (isolated
# packed populations densify from ~64 entries; mixed_large's clustered
# 80-entry band measured W96 13.5 us vs dense ~31 us) cannot both be
# reproduced by the geometry terms alone — the dense side of the
# in-situ anchor runs ~2x over its byte/step model, so an uncalibrated
# per-chunk execution constant would be a guess, and flipping the
# default on a guess is how round 2's contradiction happened.
ROUTE_MODE = "fixed"
# calibration hook (scripts/calibrate_cost.py): force "densify bands >=
# theta" regardless of mode; None = disabled
ROUTE_FORCE_THETA = None
# above this tile count the candidate search runs on a 1-in-8 window
# sample (costs scale uniformly across candidates; conversion stays fast)
ROUTE_SAMPLE_TILES = 200_000


def _est_class_cost(trow, tcol, t_lanes, k_panels, c_batch,
                    chunk_bytes, vpu_chunk_ns) -> float:
    """Predicted execution ns of one chunked class (see COST above).

    Includes the per-step x-PANEL fetch traffic (k_panels 16 KB blocks
    re-fetched whenever the scalar-prefetch index changes — i.e. every
    step on tcol-sorted packings): on mixed_large's 72 scattered dense
    tiles this is 4.2 MB of panel reads against 32 KB of values, the
    dominant share of the round-2 "dense runs ~2x over its byte/step
    model" anomaly (verdict weak item 3)."""
    cnt, panels = _window_stats(trow, tcol)
    ln = max(len(cnt), len(panels))
    cnt = np.pad(cnt, (0, ln - len(cnt)))
    panels = np.pad(panels, (0, ln - len(panels)))
    nch = np.ceil(cnt / t_lanes)
    steps = np.maximum(np.ceil(nch / c_batch), np.ceil(panels / k_panels))
    nchunks = float((steps * c_batch).sum())
    panel_bytes = k_panels * 16 * PANEL_TC * 4
    return (float(steps.sum()) * (COST["step_ns"]
                                  + panel_bytes / COST["hbm_b_per_ns"])
            + nchunks * chunk_bytes / COST["hbm_b_per_ns"]
            + nchunks * vpu_chunk_ns
            + COST["call_ns"])


def _merge_thin_classes(widx: np.ndarray) -> np.ndarray:
    """Merge thin W classes upward (fewer kernel launches); the top class
    merges into dense; small matrices collapse all sparse classes into
    the widest one in use (one launch beats the padding it wastes)."""
    widx = widx.copy()
    for k in range(len(W_CHOICES)):
        cnt_k = int(np.sum(widx == k))
        if 0 < cnt_k < MIN_CLASS_TILES:
            widx[widx == k] = k + 1
    sp_mask = widx < len(W_CHOICES)
    if 0 < int(sp_mask.sum()) < 4 * MIN_CLASS_TILES:
        widx[sp_mask] = int(widx[sp_mask].max())
    return widx


def _dense_cost(dtr, dtc, tilem: int) -> float:
    t = _pick_t(dtr, dtc, tilem)
    cbytes = (16 * 16 * t + DENSE_MROWS * t) * 4
    kp = _pick_k(dtr, dtc, t)
    cb = _pick_cb(dtr, dtc, tilem, t, kp, cbytes)
    kp = _pick_k(dtr, dtc, cb * t)
    return _est_class_cost(dtr, dtc, t, kp, cb, cbytes,
                           16 * 16 * t * COST["vpu_ns_per_el"])


def _sparse_cost(str_, stc, width: int, tilem: int) -> float:
    t = SPARSE_T
    cbytes = (width * t + sparse_meta_rows(width) * t) * 4
    kp = _pick_k(str_, stc, t)
    cb = _pick_cb(str_, stc, tilem, t, kp, cbytes)
    kp = _pick_k(str_, stc, cb * t)
    return _est_class_cost(
        str_, stc, t, kp, cb, cbytes,
        COST["sparse_chunk_ns"] + width * COST["sparse_slot_ns"])


def _route_classes(trow, tcol, counts, tilem: int,
                   fixed: bool = False) -> np.ndarray:
    """Assign each non-band tile to the dense class or a W class.

    Returns widx in [0, len(W_CHOICES)]; len(W_CHOICES) = dense. Model
    mode evaluates every densify-from-band-theta-up candidate with the
    cost model and keeps the argmin; fixed mode applies the round-2
    DENSE_MIN_NNZ constant (ablation / SPMD-deterministic arm)."""
    nb = len(W_CHOICES)
    band_idx = np.searchsorted(np.asarray(W_CHOICES), counts + 1)
    if ROUTE_FORCE_THETA is not None:
        widx = np.where(band_idx >= ROUTE_FORCE_THETA, nb, band_idx)
        return _merge_thin_classes(widx)
    if fixed or ROUTE_MODE == "fixed" or counts.size == 0:
        widx = band_idx.copy()
        widx[counts >= DENSE_MIN_NNZ] = nb
        return _merge_thin_classes(widx)

    etr, etc_, ebi = trow, tcol, band_idx
    if counts.size > ROUTE_SAMPLE_TILES:
        sm = (trow // ROW_WINDOW) % 8 == 0
        if sm.any():
            etr, etc_, ebi = trow[sm], tcol[sm], band_idx[sm]

    best_widx, best_cost = None, None
    for theta in range(nb + 1):
        wfull = np.where(band_idx >= theta, nb, band_idx)
        wfull = _merge_thin_classes(wfull)
        # per-band merged target from the FULL population (the sampled
        # copy must mirror the real merge decisions, not re-derive them
        # from 1/8-scale counts)
        target = np.full(nb + 1, nb, np.int64)
        for b_ in range(min(theta, nb)):
            sel_b = np.nonzero(band_idx == b_)[0]
            if sel_b.size:
                target[b_] = wfull[sel_b[0]]
        weval = target[ebi]
        cost = 0.0
        dm = weval >= nb
        if dm.any():
            cost += _dense_cost(etr[dm], etc_[dm], tilem)
        for k in range(nb):
            sm_k = weval == k
            if sm_k.any():
                cost += _sparse_cost(etr[sm_k], etc_[sm_k], W_CHOICES[k],
                                     tilem)
        if best_cost is None or cost < best_cost * 0.99:
            best_widx, best_cost = wfull, cost
    return best_widx


def _pick_t(trow: np.ndarray, tcol: np.ndarray, tilem: int) -> int:
    """Lane width per chunk: wide chunks amortize per-chunk fixed costs
    (measured ~4x on v5e), narrow ones waste less padding — and chunks
    are cut by column span, so the expected tiles per chunk is the
    per-window count divided by the window's span count, not the raw
    average (fragmented windows would leave wide chunks mostly inert)."""
    cnt, _ = _window_stats(trow, tcol)
    per_chunk = float(np.average(cnt, weights=cnt))
    for t in reversed(T_CHOICES):
        if per_chunk >= 0.75 * t:
            return t
    return T_CHOICES[0]


def _chunk_metadata(trow: np.ndarray, tcol: np.ndarray, tilem: int,
                    t_lanes: int, k_panels: int, c_batch: int = 1,
                    unique_rows: bool = False,
                    prefix_route: bool = False):
    """Cut row-window-local grid *steps* of `c_batch` chunks x `t_lanes`
    tiles over <= `k_panels` distinct x panels per step.

    Tiles must arrive sorted by (trow, tcol). Within each ROW_WINDOW of
    tile-rows, tiles are re-sorted by tile-column and packed greedily: a
    step closes after c_batch*t_lanes tiles or when it would need a
    (k_panels+1)-th distinct 256-tile-column x panel; the step's tiles
    are then split into c_batch chunks (trailing chunks inert). Panels
    are fetched per STEP through the Pallas pipeline (scalar-prefetch
    block index maps), so they need not be contiguous — scattered tiles
    still pack full steps. Returns per-step control scalars (cw/cfirst),
    the (nchunks, T) source permutation (`src`, -1 = inert lane), the
    flat (nsteps*K,) panel ids, and xloc/lrow planes (xloc =
    panel-slot * 256 + column-within-panel).
    """
    T = t_lanes
    K = k_panels
    # prefix_route reserves lane 0 of every chunk as an inert zero so
    # the lane-prefix boundary gather has a true zero column (rend
    # indices point at it for rows with no tile) — <1% capacity cost
    lane_cap = T - 1 if prefix_route else T
    cap = c_batch * lane_cap
    n_windows = max(1, -(-tilem // ROW_WINDOW))
    win_of_tile = trow // ROW_WINDOW

    chunks_src, cw, pb_list, slot_all = [], [], [], []
    for w in range(n_windows):
        sel = np.nonzero(win_of_tile == w)[0]
        nst = 0
        if sel.size:
            if unique_rows:
                # double-f32 classes: a window column must receive at
                # most ONE tile per step (plain f32 adds inside the
                # one-hot scatter would lose the compensated precision).
                # Deal tiles into ROUNDS — the k-th tile (by column) of
                # a tile-row goes to round k — so rows are unique within
                # a round by construction; rounds are then cut into
                # steps by the usual panel/cap limits. (The previous
                # close-at-first-duplicate rule degenerated to ~3-tile
                # steps on band+dense mixes: 40x lane padding and 20 GB
                # of host arrays on mixed_large df64.)
                tr_w = trow[sel]                   # sorted (trow, tcol)
                new_r = np.ones(sel.size, bool)
                new_r[1:] = tr_w[1:] != tr_w[:-1]
                grp = np.maximum.accumulate(
                    np.where(new_r, np.arange(sel.size), 0))
                occ = np.arange(sel.size) - grp    # round of each tile
                order = np.lexsort((tcol[sel], occ))
            else:
                order = np.argsort(tcol[sel], kind="stable")
            s = sel[order]
            pan = tcol[s] >> 8
            newp = np.ones(s.size, bool)
            newp[1:] = pan[1:] != pan[:-1]
            prank = np.cumsum(newp) - 1
            if unique_rows:
                # consume the whole panel budget at a round boundary so
                # the searchsorted below closes the step exactly there
                occ_s = occ[order]
                rb = np.zeros(s.size, np.int64)
                rb[1:] = occ_s[1:] != occ_s[:-1]
                prank = prank + np.cumsum(rb) * K
            start = 0
            while start < s.size:
                # close at cap tiles or at the K-th new panel
                stop = int(np.searchsorted(prank, prank[start] + K,
                                           side="left"))
                stop = min(stop, start + cap, s.size)
                step_tiles = s[start:stop]
                step_pan = pan[start:stop]
                pans = np.unique(step_pan)
                pb_list.append(np.concatenate(
                    [pans, np.full(K - pans.size, pans[0], np.int64)]))
                slot = np.searchsorted(pans, step_pan)
                # split into c_batch chunks of lane_cap real tiles
                for cbi in range(c_batch):
                    lane = step_tiles[cbi * lane_cap:(cbi + 1) * lane_cap]
                    sl = slot[cbi * lane_cap:(cbi + 1) * lane_cap]
                    chunks_src.append(np.concatenate(
                        [lane, np.full(T - lane.size, -1, np.int64)]))
                    slot_all.append(np.concatenate(
                        [sl, np.zeros(T - sl.size, np.int64)]))
                cw.append(w)
                nst += 1
                start = stop
        if nst == 0:
            # >= 1 step so every window's output block gets initialized
            for cbi in range(c_batch):
                chunks_src.append(np.full(T, -1, np.int64))
                slot_all.append(np.zeros(T, np.int64))
            pb_list.append(np.zeros(K, np.int64))
            cw.append(w)
            nst += 1
    src = np.stack(chunks_src)
    slot = np.stack(slot_all)
    pb = np.stack(pb_list).astype(np.int32)          # (nsteps, K)
    nchunks = src.shape[0]
    cw_steps = np.asarray(cw, np.int32)
    cfirst = np.ones(cw_steps.shape[0], np.int32)
    cfirst[1:] = (cw_steps[1:] != cw_steps[:-1]).astype(np.int32)

    valid = src >= 0
    safe = np.where(valid, src, 0)
    tr = np.where(valid, trow[safe], 0)
    tc = np.where(valid, tcol[safe], 0)
    cw_chunk = np.repeat(cw_steps.astype(np.int64), 1)  # per step
    lrow = (tr - np.repeat(cw_chunk, c_batch)[:, None] * ROW_WINDOW
            ).astype(np.int32)
    lrow = np.where(valid, lrow, 0).astype(np.int32)
    xloc = (slot * PANEL_TC + (tc & (PANEL_TC - 1))).astype(np.int32)
    xloc = np.where(valid, xloc, -1).astype(np.int32)

    md = dict(src=src, valid=valid, xloc=xloc, lrow=lrow, cw=cw_steps,
              cfirst=cfirst, pb=pb.reshape(-1),
              n_windows=n_windows, nchunks=nchunks)
    if prefix_route:
        # sort each chunk's lanes inerts-first then by lrow (reordering
        # lanes is free: panels/xloc/val are all per-lane), and build the
        # boundary planes: rend[r] = lane of the LAST tile with
        # lrow <= r (an inert front lane when there is none), so the
        # window row block is the boundary difference
        # prefix[rend[r]] - prefix[rend[r-1]] of the chunk's lane prefix
        key = np.where(valid, lrow, -1)
        order = np.argsort(key, axis=1, kind="stable")
        for f in ("src", "valid", "xloc", "lrow"):
            md[f] = np.take_along_axis(md[f], order, axis=1)
        ni = (T - md["valid"].sum(axis=1)).astype(np.int64)   # >= 1
        cnt = np.zeros((nchunks, ROW_WINDOW), np.int64)
        ch_of = np.repeat(np.arange(nchunks), md["valid"].sum(axis=1))
        np.add.at(cnt, (ch_of, md["lrow"][md["valid"]]), 1)
        rend = ((ni - 1)[:, None] + np.cumsum(cnt, axis=1)).astype(
            np.int32)
        md["rend"] = rend
        md["rend_prev"] = np.concatenate(
            [(ni - 1)[:, None].astype(np.int32), rend[:, :-1]], axis=1)
    return md


def empty_dense_class(n_windows: int, t_lanes: int,
                      compute_dtype=jnp.float32,
                      k_panels: int = 1,
                      route: str = "onehot") -> DenseChunks:
    """A class of all-inert chunks, one per window (initializes the class
    output to zero; used to unify shard plans for SPMD)."""
    cdt = np.dtype(compute_dtype)
    df64 = cdt == np.dtype(np.float64)
    rpp = -(-ROW_WINDOW // t_lanes)
    mrows = DENSE_MROWS + (2 * rpp if route == "prefix" else 0)
    meta = np.zeros((n_windows, mrows, t_lanes), np.int32)
    meta[:, META_XLOC] = -1
    # prefix route: all lanes inert -> every boundary index points at
    # lane 0 (prefix[0] - prefix[0] == 0 for every row)
    return DenseChunks(
        val=jnp.zeros((n_windows, 48 if df64 else 16, 16, t_lanes),
                      jnp.float32 if df64 else cdt),
        meta=jnp.asarray(meta),
        pb=jnp.zeros(n_windows * k_panels, jnp.int32),
        cw=jnp.asarray(np.arange(n_windows, dtype=np.int32)),
        cfirst=jnp.ones(n_windows, jnp.int32),
        t_lanes=t_lanes, k_panels=k_panels, df64=df64, route=route)


def empty_sparse_class(n_windows: int, width: int = 16,
                       compute_dtype=jnp.float32,
                       k_panels: int = 1,
                       route: str = "onehot") -> SparseChunks:
    cdt = np.dtype(compute_dtype)
    rpp = -(-ROW_WINDOW // SPARSE_T)
    mrows = sparse_meta_rows(width) + (2 * rpp if route == "prefix"
                                       else 0)
    meta = np.zeros((n_windows, mrows, SPARSE_T), np.int32)
    meta[:, META_XLOC] = -1
    return SparseChunks(
        val=jnp.zeros((n_windows, width, SPARSE_T), cdt),
        meta=jnp.asarray(meta),
        pb=jnp.zeros(n_windows * k_panels, jnp.int32),
        cw=jnp.asarray(np.arange(n_windows, dtype=np.int32)),
        cfirst=jnp.ones(n_windows, jnp.int32),
        width=width, t_lanes=SPARSE_T, k_panels=k_panels, route=route)


def _pack_sparse_class(trow, tcol, counts, r, c, v, width: int,
                       tilem: int, cdt, force_cb1: bool) -> SparseChunks:
    """Pack per-tile triplets (tiles sorted by (trow, tcol), entries
    row-sorted per tile, counts <= width-1) into a width-W class."""
    W = width
    T = SPARSE_T
    route = DENSE_ROUTE if cdt != np.dtype(np.float64) else "onehot"
    chunk_bytes = (W * T + sparse_meta_rows(W) * T) * 4
    K = 4 if force_cb1 else _pick_k(trow, tcol, T)
    cb = 1 if force_cb1 else _pick_cb(trow, tcol, tilem, T, K, chunk_bytes)
    K = 4 if force_cb1 else _pick_k(trow, tcol, cb * T)
    md = _chunk_metadata(trow, tcol, tilem, T, K, cb,
                         prefix_route=route == "prefix")
    nchunks = md["nchunks"]

    # tile -> (chunk, lane)
    nt = trow.shape[0]
    src, valid = md["src"], md["valid"]
    chunk_of = np.zeros(nt, np.int64)
    lane_of = np.zeros(nt, np.int64)
    ci, li = np.nonzero(valid)
    chunk_of[src[ci, li]] = ci
    lane_of[src[ci, li]] = li

    owner = np.repeat(np.arange(nt), counts)
    off = np.arange(owner.shape[0]) - np.concatenate(
        [[0], np.cumsum(counts)])[:-1][owner]
    slot = off + 1                       # slot 0 reserved zero
    ech, eln = chunk_of[owner], lane_of[owner]

    val = np.zeros((nchunks, W, T), cdt)
    val[ech, slot, eln] = v.astype(cdt)

    base_rows = sparse_meta_rows(W)
    rpp = -(-ROW_WINDOW // T)
    mrows = base_rows + (2 * rpp if route == "prefix" else 0)
    meta = np.zeros((nchunks, mrows, T), np.int32)
    meta[:, META_XLOC] = md["xloc"]
    meta[:, META_LROW] = md["lrow"]
    if route == "prefix":
        # window-routing boundary planes appended after the class rows
        for rr in range(rpp):
            seg = slice(rr * T, (rr + 1) * T)
            wseg = md["rend"][:, seg].shape[1]
            meta[:, base_rows + rr, :wseg] = md["rend"][:, seg]
            meta[:, base_rows + rpp + rr, :wseg] = md["rend_prev"][:, seg]
    # 4-bit columns, 8 per int32 word: slot s -> word s//8, nibble s%8
    colw = np.zeros((nchunks, W // 8, T), np.uint32)
    np.add.at(colw, (ech, slot // 8, eln),
              (c.astype(np.uint32) << ((slot % 8) * 4)).astype(np.uint32))
    meta[:, 2: 2 + W // 8] = colw.view(np.int32)
    # packed row pointers: rend[r] = slot of last entry in rows <= r
    # (= cumulative count, slot-indexed); 4 bytes per int32 word
    rc = np.zeros((nt, 16), np.int64)
    np.add.at(rc, (owner, r), 1)
    rend = np.cumsum(rc, axis=1)         # (nt, 16) in [0, W-1]
    rw = np.zeros((nchunks, 4, T), np.uint32)
    for k in range(16):
        np.add.at(rw, (chunk_of, k // 4, lane_of),
                  (rend[:, k].astype(np.uint32) << ((k % 4) * 8)))
    meta[:, 2 + W // 8: 2 + W // 8 + 4] = rw.view(np.int32)

    return SparseChunks(
        val=jnp.asarray(val), meta=jnp.asarray(meta),
        pb=jnp.asarray(md["pb"]), cw=jnp.asarray(md["cw"]),
        cfirst=jnp.asarray(md["cfirst"]),
        width=W, t_lanes=T, k_panels=K, c_batch=cb,
        route=route), md["n_windows"]


def _select_band(trow, tcol, counts, tilem, n_windows, er, ec, ev, cdt):
    """Pick brick-able stripes and pack them; returns (BandChunks | None,
    selected-tile mask)."""
    T = ROW_WINDOW
    nt = trow.shape[0]
    stripes, sfirst = np.unique(trow, return_index=True)
    send = np.append(sfirst[1:], nt)
    smin = np.minimum.reduceat(tcol, sfirst)
    smax = np.maximum.reduceat(tcol, sfirst)
    snnz = np.add.reduceat(counts, sfirst)
    ext = smax - smin + 1
    ok = (ext <= BAND_MAX_COLS) & (snnz >= BAND_MIN_STRIPE_FILL
                                   * ext * 256)
    if not ok.any():
        return None, None
    C = int(ext[ok].max())
    # per-window panel budget: the union of [b, b+C) panels must fit
    sel_w = stripes[ok] // T
    okw = np.zeros(n_windows, bool)
    uw = np.unique(sel_w)
    for w in uw:
        m_ = ok & (stripes // T == w)
        pans = np.unique(np.concatenate(
            [smin[m_] >> 8, (smin[m_] + C - 1) >> 8]))
        if pans.size <= BAND_K:
            okw[w] = True
    ok &= okw[stripes // T]
    if not ok.any():
        return None, None
    # coverage guards: enough windows and enough fill to justify the
    # per-window zero-padded brick chunks
    nsel_w = int(okw.sum())
    # fill over the LANES the class will actually occupy (selected
    # stripes), plus a window-coverage guard for the per-window padding
    fill = float(snnz[ok].sum()) / (max(1, int(ok.sum())) * C * 256)
    lane_frac = int(ok.sum()) / (nsel_w * T)
    if (nsel_w < BAND_MIN_WINDOW_FRAC * n_windows
            or fill < BAND_MIN_CLASS_FILL
            or lane_frac < 0.25 * min(1.0, tilem / T)):
        return None, None

    nchunks = n_windows
    df64 = cdt == np.dtype(np.float64)
    # df64 stores an exact (hi, lo) f32 pair per column block — 8
    # bytes/value, same as f64 itself. The class measured TRAFFIC-bound
    # on v5e (round 4: serial/ilv2/ilv4/tree accumulation variants all
    # ~208 us), so the old 3-part pre-split (a1, a2, vl = 12 B/value)
    # paid 50% extra HBM for VPU work the chip had headroom to do at
    # runtime (_x_split in the kernel).
    vparts = 2 if df64 else 1
    val = np.zeros((nchunks, vparts * C, 16, 16, T),
                   np.float32 if df64 else cdt)
    bloc = np.zeros((nchunks, 1, T), np.int32)
    pb = np.zeros((nchunks, BAND_K), np.int32)
    tile_mask = np.zeros(nt, bool)
    ok_stripe_of_tile = np.zeros(tilem + 1, np.int64) - 1
    ok_idx = np.nonzero(ok)[0]
    base_of_stripe = np.zeros(tilem + 1, np.int64)
    for w in range(n_windows):
        m_ = ok & (stripes // T == w)
        if not m_.any():
            continue
        pans = np.unique(np.concatenate(
            [smin[m_] >> 8, (smin[m_] + C - 1) >> 8]))
        pb[w, : pans.size] = pans
        pb[w, pans.size:] = pans[0]
        lanes = stripes[m_] % T
        slot = np.searchsorted(pans, smin[m_] >> 8)
        bloc[w, 0, lanes] = (slot * PANEL_TC
                             + (smin[m_] - (pans[slot] << 8))).astype(
                                 np.int32)
    ok_set = np.zeros(tilem, bool)
    ok_set[stripes[ok]] = True
    base_of_stripe[stripes] = smin
    tile_mask = ok_set[trow]
    # scatter entries of selected tiles
    e_owner = np.repeat(np.arange(nt), counts)
    e_sel = tile_mask[e_owner]
    et = e_owner[e_sel]
    cbv = (tcol[et] - base_of_stripe[trow[et]])
    win = trow[et] // T
    lane = trow[et] % T
    # np.add (not assign): ELL/HYB pad slots share (row, col 0) with real
    # entries; adding keeps the real value intact (pads add zero)
    if df64:
        acc = np.zeros((nchunks, C, 16, 16, T), np.float64)
        np.add.at(acc, (win, cbv, ec[e_sel], er[e_sel], lane), ev[e_sel])
        vh = acc.astype(np.float32)
        val[:, 0::2] = vh
        val[:, 1::2] = (acc - vh.astype(np.float64)).astype(np.float32)
    else:
        np.add.at(val, (win, cbv, ec[e_sel], er[e_sel], lane),
                  ev[e_sel].astype(cdt))

    band = BandChunks(
        val=jnp.asarray(val), bloc=jnp.asarray(bloc),
        pb=jnp.asarray(pb.reshape(-1)),
        cw=jnp.asarray(np.arange(n_windows, dtype=np.int32)),
        cfirst=jnp.ones(n_windows, jnp.int32),
        c_cols=C, k_panels=BAND_K, df64=df64)
    return band, tile_mask


def _coo_stream_cost_ns(g_row: np.ndarray, g_col: np.ndarray,
                        m: int) -> tuple[float, int | None, bool | None]:
    """Stream-engine cost estimate for an entry population, using the
    calibrated step/slab/skip model at the geometry and s_batch the
    builder itself would pick (stream_plan.pick_geometry /
    pick_s_batch). Returns (cost_ns, span_rows, dual) so the caller can
    hand the already-picked geometry to the builder instead of paying
    the occupied-cells sort twice — (cost, None, None) when the
    free-placement geometry wins (the builder re-decides; FP
    populations are small, the repeated cells sort is cheap)."""
    from . import stream_plan as sp
    cells = sp._occupied_cells(g_row, g_col)
    span, dual, fp = sp.pick_geometry_fp(g_row, g_col, m, cells=cells)
    uw, uq, uc, nq = cells
    if fp:
        _, wcnt_fp = sp._fp_cost(cells)
        nwin = max(1, -(-m // sp.RW_ROWS))
        wcnt = np.zeros(nwin, np.int64)
        wcnt[: wcnt_fp.shape[0]] = wcnt_fp
        s1, s2, heavy = sp.pick_stream_split(wcnt)
        if s2 is None:
            step_ns = float(sp._window_costs(wcnt, s1).sum())
        else:
            step_ns = float(np.where(heavy, sp._window_costs(wcnt, s2),
                                     sp._window_costs(wcnt, s1)).sum()
                            ) + sp.EXTRA_CLASS_NS
        # the calibrated window costs already price span-64 slabs
        # (staging included); add the per-SpMV XLA x-copy gather at its
        # pessimistic 2x-traffic rate
        xcopy_ns = float(wcnt.sum()) * sp.SPAN_ROWS * 128 * 4 * 2 / 800.0
        return step_ns + xcopy_ns, None, None
    C, gwin = sp._group_counts_cells(uw, uq, uc, nq, span)
    per_group = (-(-C.max(axis=1) // sp.CAP)).astype(np.int64)
    nwin = max(1, -(-m // sp.RW_ROWS))
    wcnt = np.zeros(nwin, np.int64)
    np.add.at(wcnt, gwin, per_group)
    if dual:
        # the sequential dual packing merges group tails; scale the
        # mono per-window counts to the dual total (estimate only)
        ratio = sp._dual_slab_count(C, gwin) / max(1, per_group.sum())
        wcnt = np.maximum(wcnt > 0, np.rint(wcnt * ratio).astype(
            np.int64))
    # price with the same two-rate split the real build uses (round-4
    # advisor: a single pick_s_batch rate overestimated the stream side,
    # biasing borderline matrices toward absorb)
    s1, s2, heavy = sp.pick_stream_split(wcnt)
    if s2 is None:
        cost = float(sp._window_costs(wcnt, s1).sum())
    else:
        cost = float(np.where(heavy, sp._window_costs(wcnt, s2),
                              sp._window_costs(wcnt, s1)).sum()
                     ) + sp.EXTRA_CLASS_NS
    return cost, span, dual


def _coo_absorb_cost_ns(ctr: np.ndarray, ctc: np.ndarray,
                        ccounts: np.ndarray, tilem: int) -> float:
    """Cost estimate of absorbing the COO tiles into the sparse-entry
    W-classes instead: the router's own _sparse_cost model (step +
    panel traffic + chunk bytes + per-slot gather), per width class the
    tiles would actually land in (round-4 advisor: the old ad-hoc
    formula assumed every tile fits a W16 slot and priced chunk bytes
    inconsistently with _sparse_cost). An estimate of the marginal
    chunks only — merging with existing W-class tiles can only share
    chunks, so this is an upper bound."""
    band_idx = np.searchsorted(np.asarray(W_CHOICES), ccounts + 1)
    cost = 0.0
    for k in np.unique(band_idx):
        sel = band_idx == k
        W = W_CHOICES[min(int(k), len(W_CHOICES) - 1)]
        cost += _sparse_cost(ctr[sel], ctc[sel], W, tilem)
    return cost


def build_lane_plan(tm: TileMatrix, compute_dtype=jnp.float32,
                    force_t: int | None = None,
                    use_stream: bool | None = None,
                    stream_s_batch: int | None = None,
                    stream_span_rows: int | None = None,
                    stream_dual: bool | None = None) -> LanePlan:
    """Compile a TileMatrix into the lane-major Pallas plan.

    `force_t` pins the dense-class chunk lane width and c_batch=1 for
    every class (used by the distributed layer so shard plans share one
    program). `use_stream` forces the COO tiles into (True) or out of
    (False) the entry-level stream engine; None = auto by entry count
    and per-tile density."""
    b = tm.config.tile_size
    if b != 16:
        raise NotImplementedError("pallas engines require tile_size=16")
    cdt = np.dtype(compute_dtype)

    trow, tcol, counts, er, ec, ev = _all_entries(tm)
    n_windows = max(1, -(-tm.tilem // ROW_WINDOW))

    # --- COO tiles: the entry-level stream engine when they are many and
    # near-singleton; otherwise they join the per-tile routing below
    bk = tm.coo
    coo_entries = int(bk.val.shape[0]) if bk.num_tiles else 0
    coo_avg = coo_entries / max(1, bk.num_tiles) if bk.num_tiles else 0.0
    coo_g = None            # (g_row, g_col) of the COO entries, if the
    #                         absorb decision below already built them
    if use_stream is None:
        use_stream = (coo_entries >= STREAM_MIN_ENTRIES
                      and coo_avg < COO_SPARSE_MIN_AVG)
        if use_stream:
            # window-sparse populations (entries per (window, span)
            # group far below slab capacity) pad slabs and pay per-step
            # cost; reroute to the W-classes when the absorb estimate
            # clearly wins (see STREAM_ABSORB_MARGIN). f64 uses the
            # SAME f32-modeled decision: the round-4 bounce-back
            # concern (DF64_ROUND_FILL_MIN returning absorbed
            # singletons to the stream) did not materialize — measured
            # round 5 (interleaved arms, v5e): absorb wins stencil2d
            # f64 1.22x, stencil3d 1.17x, diag_hubs 1.16x, all ending
            # as pure dense-df64 plans.
            ccounts0 = np.diff(bk.nnz_ptr)
            owner0 = np.repeat(np.arange(bk.num_tiles), ccounts0)
            ctr0 = tm.tile_rowidx[bk.tile_ids].astype(np.int64)
            g_r = ctr0[owner0] * b + bk.row
            g_c = (tm.tile_columnidx[bk.tile_ids[owner0]]
                   .astype(np.int64) * b + bk.col)
            stream_ns, a_span, a_dual = _coo_stream_cost_ns(g_r, g_c,
                                                            tm.m)
            ctc0 = tm.tile_columnidx[bk.tile_ids].astype(np.int64)
            absorb_ns = _coo_absorb_cost_ns(ctr0, ctc0, ccounts0,
                                            tm.tilem)
            # observability hook (round-4 advisor): the decision-table
            # script and tests read the last estimate pair
            global LAST_ABSORB_ESTIMATE
            LAST_ABSORB_ESTIMATE = (absorb_ns, stream_ns)
            if absorb_ns < STREAM_ABSORB_MARGIN * stream_ns:
                use_stream = False
            else:
                coo_g = (g_r, g_c)
                if stream_span_rows is None and stream_dual is None:
                    # hand the already-picked geometry to the builder
                    # (the occupied-cells sort dominates planning on
                    # stream-heavy matrices; don't pay it twice)
                    stream_span_rows, stream_dual = a_span, a_dual
    if not use_stream and bk.num_tiles:
        ccounts = np.diff(bk.nnz_ptr)
        ctr = tm.tile_rowidx[bk.tile_ids].astype(np.int64)
        ctc = tm.tile_columnidx[bk.tile_ids].astype(np.int64)
        owner = np.repeat(np.arange(bk.num_tiles), ccounts)
        trow = np.concatenate([trow, ctr])
        tcol = np.concatenate([tcol, ctc])
        counts = np.concatenate([counts, ccounts])
        er = np.concatenate([er, bk.row.astype(np.int64)])
        ec = np.concatenate([ec, bk.col.astype(np.int64)])
        ev = np.concatenate([ev, bk.val.astype(np.float64)])
        order_t = np.argsort(trow * (int(tcol.max()) + 1) + tcol,
                             kind="stable")
        rank_t = np.empty(trow.shape[0], np.int64)
        rank_t[order_t] = np.arange(trow.shape[0])
        e_owner = np.repeat(np.arange(trow.shape[0]), counts)
        order_e = np.argsort((rank_t[e_owner] << 8) | (er << 4) | ec,
                             kind="stable")
        trow, tcol, counts = trow[order_t], tcol[order_t], counts[order_t]
        er, ec, ev = er[order_e], ec[order_e], ev[order_e]

    # --- band (brick) class: qualifying tile-row stripes leave the
    # per-tile routing entirely (see BAND_MAX_COLS comment). The class
    # has no T/c_batch variation (one window-chunk per window, K fixed),
    # so it is SPMD-safe: the distributed unifier pads C and window
    # counts across shards.
    band = None
    if trow.size:
        band, band_tile_mask = _select_band(trow, tcol, counts, tm.tilem,
                                            n_windows, er, ec, ev, cdt)
        if band is not None:
            esel = ~band_tile_mask[np.repeat(np.arange(trow.shape[0]),
                                             counts)]
            trow, tcol, counts, er, ec, ev = (
                trow[~band_tile_mask], tcol[~band_tile_mask],
                counts[~band_tile_mask], er[esel], ec[esel], ev[esel])

    # --- execution routing: per tile, dense block vs sparse-entry class,
    # chosen by the execution cost model (see COST above; force_t pins
    # the fixed threshold so SPMD shards can never route divergently)
    stream_extra = (np.zeros(0, np.int64), np.zeros(0, np.int64),
                    np.zeros(0, np.float64))
    if cdt == np.dtype(np.float64):
        # double-f32 W-class kernels would pay 4 sublane gathers per
        # (slot, operand half); densified tiles run the existing dense
        # df64 kernel instead — ~15x the packed bytes per W-tile but
        # still HBM-streaming (the f64 budget is ~5x f32, and these
        # matrices' tile counts are small compared to the COO/stream
        # population, which has its own df64 engine)
        if counts.size:
            # unique-rows (rounds) cutting pads each round to T lanes,
            # so rounds with few tiles densify at huge padding (a heavy
            # tile-row forces one round per tile: mixed_large measured
            # 51x padding and 14 GB of host arrays). h_w[r] = #rows of
            # window w with > r tiles is non-increasing in r, so
            # dropping under-filled (window, round) groups keeps exactly
            # the well-filled prefix rounds; deeper tiles run as entries
            # in the exact df64 stream engine instead.
            win = trow // ROW_WINDOW
            new_r = np.ones(trow.size, bool)
            new_r[1:] = trow[1:] != trow[:-1]
            grp = np.maximum.accumulate(
                np.where(new_r, np.arange(trow.size), 0))
            occ = np.arange(trow.size) - grp
            key = win * (int(occ.max()) + 1) + occ
            _, inv, kcnt = np.unique(key, return_inverse=True,
                                     return_counts=True)
            deep = kcnt[inv] < DF64_ROUND_FILL_MIN
            if deep.any():
                eo = np.repeat(np.arange(trow.shape[0]), counts)
                edeep = deep[eo]
                stream_extra = (trow[eo][edeep] * b + er[edeep],
                                tcol[eo][edeep] * b + ec[edeep],
                                ev[edeep].astype(np.float64))
                trow, tcol, counts = (trow[~deep], tcol[~deep],
                                      counts[~deep])
                er, ec, ev = er[~edeep], ec[~edeep], ev[~edeep]
        widx = np.full(counts.shape, len(W_CHOICES), np.int64)
    else:
        widx = _route_classes(trow, tcol, counts, tm.tilem,
                              fixed=force_t is not None)
    dense_mask = widx >= len(W_CHOICES)

    entry_owner = np.repeat(np.arange(trow.shape[0]), counts)
    dense = None
    if dense_mask.any():
        sel = np.nonzero(dense_mask)[0]
        esel = dense_mask[entry_owner]
        blocks = _densify(trow[sel], tcol[sel], counts[sel],
                          er[esel], ec[esel], ev[esel], b)
        dtr, dtc = trow[sel], tcol[sel]
        if cdt == np.dtype(np.float64):
            # unique-rows (rounds) cutting bounds the achievable step
            # fill by tiles/rounds, where a window's round count is its
            # max tiles-per-tile-row — use that, not the span estimate
            uniq_tr, c_tr = np.unique(dtr, return_counts=True)
            uw = uniq_tr // ROW_WINDOW
            first = np.ones(uw.size, bool)
            first[1:] = uw[1:] != uw[:-1]
            rounds = np.maximum.reduceat(
                c_tr, np.nonzero(first)[0]).sum()
            per_step = dtr.size / max(1, int(rounds))
            t_lanes = force_t or next(
                (t for t in reversed(T_CHOICES) if per_step >= 0.75 * t),
                T_CHOICES[0])
            # c_batch beyond the achievable step size only emits inert
            # trailing chunks (each a full (48,16,T) payload of zeros)
            cb = 1 if force_t else max(
                1, min(8, int(per_step / t_lanes + 0.5)))
            kp = 4 if force_t else _pick_k(dtr, dtc, cb * t_lanes)
        else:
            t_lanes = force_t or _pick_t(dtr, dtc, tm.tilem)
            chunk_bytes = (16 * 16 * t_lanes + DENSE_MROWS * t_lanes) * 4
            kp = 4 if force_t else _pick_k(dtr, dtc, t_lanes)
            cb = 1 if force_t else _pick_cb(dtr, dtc, tm.tilem, t_lanes,
                                            kp, chunk_bytes)
            kp = 4 if force_t else _pick_k(dtr, dtc, cb * t_lanes)
        df64 = cdt == np.dtype(np.float64)
        # f32 dense routes per DENSE_ROUTE (default one-hot — the
        # prefix route lost the interleaved e2e arbitration, see the
        # DENSE_ROUTE comment above); df64 always one-hot (its
        # compensated accumulators cannot ride a prefix difference)
        route = DENSE_ROUTE if not df64 else "onehot"
        md = _chunk_metadata(dtr, dtc, tm.tilem, t_lanes, kp, cb,
                             unique_rows=df64,
                             prefix_route=route == "prefix")
        valid = md["valid"]
        safe = np.where(valid, md["src"], 0)
        vt = blocks[safe]                   # (nchunks, T, b_i, b_j) f64
        vt[~valid] = 0.0
        # j-major layout (nchunks, b_j, b_i, T): the kernel's j-th FMA step
        # reads a contiguous (16, T) slab. df64: three interleaved f32
        # parts per j (rows 3j, 3j+1, 3j+2 — Dekker pre-split + tail)
        vt = np.ascontiguousarray(vt.transpose(0, 3, 2, 1))
        if df64:
            a1, a2, vl = df64_split(vt)
            val = np.zeros((vt.shape[0], 3 * b, b, t_lanes), np.float32)
            val[:, 0::3] = a1
            val[:, 1::3] = a2
            val[:, 2::3] = vl
        else:
            val = vt.astype(cdt)
        rpp = -(-ROW_WINDOW // t_lanes)   # meta rows per boundary plane
        mrows = DENSE_MROWS + (2 * rpp if route == "prefix" else 0)
        meta = np.zeros((md["nchunks"], mrows, t_lanes), np.int32)
        meta[:, META_XLOC] = md["xloc"]
        meta[:, META_LROW] = md["lrow"]
        if route == "prefix":
            for rr in range(rpp):
                seg = slice(rr * t_lanes, (rr + 1) * t_lanes)
                w = md["rend"][:, seg].shape[1]
                meta[:, DENSE_MROWS + rr, :w] = md["rend"][:, seg]
                meta[:, DENSE_MROWS + rpp + rr, :w] = \
                    md["rend_prev"][:, seg]
        dense = DenseChunks(
            val=jnp.asarray(val), meta=jnp.asarray(meta),
            pb=jnp.asarray(md["pb"]), cw=jnp.asarray(md["cw"]),
            cfirst=jnp.asarray(md["cfirst"]), t_lanes=t_lanes,
            k_panels=kp, c_batch=cb, df64=df64, route=route)
        n_windows = max(n_windows, md["n_windows"])

    sparses = []
    for k, W in enumerate(W_CHOICES):
        sel_mask = widx == k
        if not sel_mask.any():
            continue
        sel = np.nonzero(sel_mask)[0]
        esel = sel_mask[entry_owner]
        sc, nw = _pack_sparse_class(
            trow[sel], tcol[sel], counts[sel], er[esel], ec[esel],
            ev[esel], W, tm.tilem, cdt, force_cb1=force_t is not None)
        sparses.append(sc)
        n_windows = max(n_windows, nw)

    # --- stream engine for the COO tiles (decided above)
    stream = None
    stream2 = None
    spill = (np.zeros(0, np.int64), np.zeros(0, np.int64),
             np.zeros(0, np.float64))
    if use_stream or stream_extra[2].size:
        s_rows, s_cols, s_vals = [stream_extra[0]], [stream_extra[1]], \
            [stream_extra[2]]
        if use_stream and bk.num_tiles:
            if coo_g is not None:
                s_rows.append(coo_g[0])
                s_cols.append(coo_g[1])
            else:
                ccounts = np.diff(bk.nnz_ptr)
                owner = np.repeat(np.arange(bk.num_tiles), ccounts)
                s_rows.append(tm.tile_rowidx[bk.tile_ids[owner]]
                              .astype(np.int64) * b + bk.row)
                s_cols.append(tm.tile_columnidx[bk.tile_ids[owner]]
                              .astype(np.int64) * b + bk.col)
            s_vals.append(bk.val.astype(np.float64))
        g_row = np.concatenate(s_rows)
        g_col = np.concatenate(s_cols)
        g_val = np.concatenate(s_vals)
        if g_val.size:
            will_split = stream_s_batch is None
            if will_split:
                # fused build + two-rate (base, heavy) split: the
                # native path exports each class directly in its final
                # kernel layout (build_stream_classes; the split fires
                # when the SLAB_NS cost model says two rates beat one)
                from .stream_plan import build_stream_classes
                (stream, stream2), spill = build_stream_classes(
                    g_row, g_col, g_val, tm.m, compute_dtype=cdt,
                    span_rows=stream_span_rows, dual=stream_dual)
            else:
                # the distributed layer forces a shared s_batch (its
                # shard plans must agree) — single class, no split
                stream, spill = build_stream_chunks(
                    g_row, g_col, g_val, tm.m, compute_dtype=cdt,
                    s_batch=stream_s_batch, span_rows=stream_span_rows,
                    dual=stream_dual)
        else:
            from .stream_plan import empty_stream_chunks
            stream = empty_stream_chunks(max(1, -(-tm.m // RW_ROWS)), cdt,
                                         s_batch=stream_s_batch or 4)

    # leftover residual: HYB overflow (COO tiles are handled on-chip
    # above; including them here would double count) + stream spill
    res_rows = [spill[0]]
    res_cols = [spill[1]]
    res_vals = [spill[2]]
    hb = tm.hyb
    if hb.coo_val.size:
        sizes = np.diff(hb.coo_ptr)
        owner = np.repeat(np.arange(hb.num_tiles), sizes)
        res_rows.append(tm.tile_rowidx[hb.tile_ids[owner]].astype(np.int64)
                        * b + hb.coo_row)
        res_cols.append(tm.tile_columnidx[hb.tile_ids[owner]]
                        .astype(np.int64) * b + hb.coo_col)
        res_vals.append(hb.coo_val.astype(np.float64))
    g_row = np.concatenate(res_rows)
    g_col = np.concatenate(res_cols)
    g_val = np.concatenate(res_vals)
    if g_val.size:
        order = np.lexsort((g_col, g_row))
        residual = ResidualEngine(
            val=jnp.asarray(g_val[order].astype(cdt)),
            row=jnp.asarray(g_row[order].astype(np.int32)),
            col=jnp.asarray(g_col[order].astype(np.int32)))
    else:
        residual = ResidualEngine(val=jnp.zeros(0, cdt),
                                  row=jnp.zeros(0, jnp.int32),
                                  col=jnp.zeros(0, jnp.int32))

    sparses.sort(key=lambda s: s.width)
    return LanePlan(dense=dense, band=band, sparses=tuple(sparses),
                    residual=residual, stream=stream, stream2=stream2,
                    m=tm.m, n=tm.n, tilem=tm.tilem, tilen=tm.tilen,
                    tile_size=b, nnz=tm.nnz, n_windows=n_windows)
