"""Entry-level stream engine plan for very sparse tiles (the COO class).

Why: the lane-major chunked classes (lane_plan.py) charge per-TILE
machinery (x panel gathers, row-pointer decode) that near-singleton
16x16 tiles (power-law graphs: ~1 nnz per occupied tile) cannot
amortize. This engine routes *entries* directly with the TPU's hardware
dynamic gather (`tpu.dynamic_gather`, exposed as `jnp.take_along_axis`
inside Pallas; measured ~2.5 ns per (8,128) gather in context):

* a **slab** is an (8, 128) block of nonzero entries belonging to one
  output window and one aligned 8192-value x *superspan*: sublane w
  holds an instance of the superspan's w-th 1024-value block, entries
  sorted by row, lane 0 reserved zero (fixed alignment keeps the
  per-block instance counts balanced, so the max-over-sublanes slab
  count stays near the mean);
* **x gather**: ONE dynamic (64, 128) read stages the slab's superspan
  (dynamic VMEM reads cost ~40-70 ns each on v5e — they must be
  per-slab, not per-sublane); per sublane a lane gather picks the
  entry's value-within-128, a sublane gather its row-of-8 — broadcast
  static indices, duplication free, no conflicts;
* **y scatter**: an inclusive prefix sum along lanes (one (8,128) @
  (128,128) matmul against a constant triangular matrix), then per-run
  sums are extracted as csum[end] - csum[start] with *plan-time* index
  planes and routed to the (8,128) output window (1024 rows) by a
  sublane gather. Runs are separated into **rounds** by a proper edge
  coloring `(src_sublane + target_sublane) % 8` of each (slab, lane)
  cell's bipartite contributor graph, compacted per cell — 3 hardware
  gathers per round, at most 8 rounds, and never a conflict or spill (a
  (source, target, lane) triple identifies a run uniquely). Measured on
  v5e: this 3-gather form beats a run-sum-precompute + permuted-gather
  variant by ~25% — the engine is VPU/gather-issue bound, not
  traffic bound, so fewer ops-per-round wins over fewer plane bytes.

Plane budget per slab: 4 KB values + 2 KB int16 x-indices + 3R KB int8
round planes (R in {4, 8}), ~30 bytes/entry at typical fill.

This is the framework's residual engine — the role CSR5
(`external/CSR5_cuda/`, reference csr5_spmv_cuda.h:202-312) plays for the
reference's extracted very-sparse matrix, rebuilt around the TPU's
register-level gather instead of warp segmented sums (CSR5's 2-bit
bit-flag bookkeeping becomes the 10 KB of gather planes; its
partition/calibrate/tail kernels collapse into the round structure).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

RW_ROWS = 1024     # y rows per output window: (8 sublanes) x (128 lanes)
LANES = 128
SUBS = 8
CAP = LANES - 1    # usable entry lanes per sublane (lane 0 reserved)
ROUNDS = 8         # modular (src+tgt)%8 coloring: always exactly 8
XBLOCK_ROWS = 8    # x2d128 rows per sublane's x window (1024 values)
SPAN_ROWS = 64     # default x2d128 rows per slab superspan (8 windows)
# a class may widen its superspan when (window, span) groups would
# otherwise be mostly empty — very sparse LARGE matrices (e.g. 2.2e-5
# density at 524k^2 ran at 18% slab fill with 64-row spans). Wider
# spans cost more x-staging chunks per slab (the span read itself
# measures free — BASELINE.md round 3), so the builder picks the
# cost-minimizing size per class (pick_span_rows).
SPAN_CHOICES = (64, 128, 256, 512)
MAX_SPAN_ROWS = SPAN_CHOICES[-1]  # x padding slack past the end

# y-scatter encoding the builders emit: "rounds" (rounds design) or
# "offs" (run-ordered boundary planes + static-offset scatter — see
# OFFS_SLAB_ROWS below). Arbitrated e2e under the interleaved harness
# (scripts/ab_stream_scatter.py); default = measured winner.
STREAM_SCATTER = "rounds"
# df64 segmented scan (StreamChunks.segmask): plan-time run-membership
# bit planes confine the compensated Kogge-Stone to runs, so
# csum[run end] IS the run sum pair — the rstart boundary gathers and
# the per-round boundary two-sum disappear and the depth shrinks to
# ceil(log2(max run length)). Arbitrated e2e on v5e (round 5,
# scripts/ab_segscan_df64.py): powerlaw_large df64 1728 -> 1372 us
# (1.26x), rel_err < 1e-9 both arms. Default ON; forces the NumPy
# builders for df64 (the native export does not emit segmask planes —
# plan build 21 -> ~45 s on powerlaw_large, paid once per matrix and
# amortized by plan serialization).
STREAM_SEGSCAN_DF64 = True


def _seg_masks(slab_of: np.ndarray, sub_of: np.ndarray,
               lane_of: np.ndarray, r: np.ndarray, nslabs: int):
    """Segmented-scan bit planes + depth from entry placements (same
    contract as _runs_planes): bit k at (slab, sub, lane) set iff the
    element 2^k lanes back belongs to the same run."""
    nz = r.shape[0]
    skey = slab_of * SUBS + sub_of
    newrun = np.ones(nz, bool)
    newrun[1:] = (skey[1:] != skey[:-1]) | (r[1:] != r[:-1])
    run_start = np.maximum.accumulate(
        np.where(newrun, np.arange(nz), 0))
    off = np.arange(nz) - run_start            # offset within run
    levels = int(off.max()).bit_length() if nz else 0
    bits = np.zeros(nz, np.int64)
    for k in range(levels):
        bits |= ((off >> k) > 0).astype(np.int64) << k
    mask = np.zeros((nslabs, SUBS, LANES), np.int8)
    mask[slab_of, sub_of, lane_of] = bits.astype(np.int8)
    return mask, levels

# int8 plane rows per slab in the RAW (builder) layout: R rounds x
# [rend | rstart | rsrc] x 8 sublanes (rows t*24 + {0,8,16} + s); R is a
# multiple of 4 so the row count stays a multiple of the 32-row int8 tile
def plane_rows(rounds: int) -> int:
    return rounds * 3 * SUBS


# int8 plane rows per STEP in the stacked (kernel) layout: for each
# round t, all s_batch slabs' rend planes (S*8 rows), then all rstart,
# then all rsrc. The kernel's prefix stack csum is (S*8, 128) in the
# same (slab, sublane) row order, so one wide lane gather per round
# covers every slab's rend (and one more its rstart) — 2 + S gather
# issues per round instead of 3*S (lane gathers are native at
# R in {8,16,32,64} sublanes).
def step_plane_rows(rounds: int, s_batch: int) -> int:
    return rounds * 3 * SUBS * s_batch


def stack_step_planes(planes: np.ndarray, s_batch: int,
                      rounds: int) -> np.ndarray:
    """(nslabs, plane_rows(R), 128) raw per-slab planes -> per-step
    stacked (nsteps, step_plane_rows(R, S), 128)."""
    nslabs = planes.shape[0]
    nsteps = nslabs // s_batch
    p = planes.reshape(nsteps, s_batch, rounds, 3, SUBS, LANES)
    return np.ascontiguousarray(p.transpose(0, 2, 3, 1, 4, 5)).reshape(
        nsteps, step_plane_rows(rounds, s_batch), LANES)


# --- "offs" scatter encoding (round-4 verdict #1: the different
# per-entry encoding). Same entry placement as the rounds design; the
# post-prefix machinery changes:
#   * boundary planes are RUN-ORDERED, not round-split: run j of
#     (slab, sublane s) stores its end lane at ue[s, j] and its start-1
#     lane at us[s, j] — ONE pair of lane gathers extracts ALL run sums
#     per slab (the rounds design pays 2 gathers PER ROUND);
#   * runs are then scattered by their STATIC sublane offset
#     d = (tgt - src) % 8: g_d[s, l'] = run index j of the sublane-s run
#     targeting cell ((s + d) % 8, l'). Per offset: one lane gather +
#     one static sublane rotate + one add. Collision-free by
#     construction: two runs of one sublane with equal offset and equal
#     target lane would share a target row — impossible, runs within a
#     sublane have distinct rows. The dynamic rsrc sublane gathers (and
#     the per-round boundary gathers) disappear entirely.
# Plane layout per slab: [ue(8) | us(8) | g_0..g_7 (64)] = 80 rows,
# padded to 96 (int8 operands want row counts in 32-row tiles).
OFFS_SLAB_ROWS = 96
# "roll" scatter (the second candidate): the rounds design's exact
# per-round boundary-gather dataflow, but rounds ordered by the STATIC
# offset d = (tgt - src) % 8 so the dynamic rsrc sublane gather becomes
# a per-step hoisted rotate. Plane layout per slab:
# [ue_d0(8) us_d0(8) ue_d1(8) ... us_d7(8)] = 128 rows.
ROLL_SLAB_ROWS = 128


def scatter_slab_rows(scatter: str) -> int:
    return OFFS_SLAB_ROWS if scatter == "offs" else ROLL_SLAB_ROWS


def stack_offs_planes(planes: np.ndarray, s_batch: int) -> np.ndarray:
    """Per-slab offs/roll planes -> per-step stack (plain reshape: the
    kernels read each slab's planes as contiguous static slices)."""
    nsteps = planes.shape[0] // s_batch
    return planes.reshape(nsteps, planes.shape[1] * s_batch, LANES)


def _runs_planes_roll(slab_of: np.ndarray, sub_of: np.ndarray,
                      lane_of: np.ndarray, r: np.ndarray, nslabs: int):
    """Roll-scatter planes: the rounds planes re-keyed by the static
    offset d = (tgt - src) % 8 with NO rsrc plane (the target row is
    src + d, a static rotate). Same collision-freedom proof as offs."""
    nz = r.shape[0]
    skey = slab_of * SUBS + sub_of
    newrun = np.ones(nz, bool)
    newrun[1:] = (skey[1:] != skey[:-1]) | (r[1:] != r[:-1])
    runs = np.nonzero(newrun)[0]
    run_end_e = np.append(runs[1:], nz) - 1

    c_slab = slab_of[runs]
    c_src = sub_of[runs]
    c_row = r[runs]
    c_start = lane_of[runs] - 1
    c_end = lane_of[run_end_e]
    rloc = c_row - (c_row >> 10 << 10)
    c_tgt = (rloc >> 7).astype(np.int64)
    c_j = rloc & (LANES - 1)
    d = ((c_tgt - c_src) % SUBS).astype(np.int64)

    planes = np.zeros((nslabs, ROLL_SLAB_ROWS, LANES), np.int8)
    planes[c_slab, 2 * SUBS * d + c_src, c_j] = c_end.astype(np.int8)
    planes[c_slab, 2 * SUBS * d + SUBS + c_src, c_j] = c_start.astype(
        np.int8)
    return planes, SUBS


def _runs_planes_offs(slab_of: np.ndarray, sub_of: np.ndarray,
                      lane_of: np.ndarray, r: np.ndarray, nslabs: int):
    """Offs-scatter planes from entry placements (same input contract
    as _runs_planes). Returns (planes (nslabs, OFFS_SLAB_ROWS, 128)
    int8, n_offsets=8)."""
    nz = r.shape[0]
    skey = slab_of * SUBS + sub_of
    newrun = np.ones(nz, bool)
    newrun[1:] = (skey[1:] != skey[:-1]) | (r[1:] != r[:-1])
    runs = np.nonzero(newrun)[0]
    run_end_e = np.append(runs[1:], nz) - 1

    c_slab = slab_of[runs]
    c_src = sub_of[runs]
    c_row = r[runs]
    c_start = lane_of[runs] - 1          # exclusive (>= 0: lane 0 pad)
    c_end = lane_of[run_end_e]           # inclusive
    rloc = c_row - (c_row >> 10 << 10)
    c_tgt = (rloc >> 7).astype(np.int64)
    c_j = rloc & (LANES - 1)
    # run index within (slab, sublane); slot 0 reserved as the zero run
    # (ue = us = 0 -> diff 0), so empty g_d cells point at j = 0
    j = _rank_within(c_slab * SUBS + c_src) + 1
    if j.size and int(j.max()) > LANES - 1:
        raise AssertionError("offs planes overflowed run slots")
    d = ((c_tgt - c_src) % SUBS).astype(np.int64)

    planes = np.zeros((nslabs, OFFS_SLAB_ROWS, LANES), np.int8)
    planes[c_slab, c_src, j] = c_end.astype(np.int8)
    planes[c_slab, SUBS + c_src, j] = c_start.astype(np.int8)
    planes[c_slab, 2 * SUBS + d * SUBS + c_src, c_j] = j.astype(np.int8)
    return planes, SUBS


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class StreamChunks:
    """Entry-level slabs: (nslabs, 8, 128) value/index planes.

    Slabs are processed `s_batch` per grid step (a *step* amortizes the
    grid bookkeeping and gives Mosaic independent gather chains to
    interleave); every step's slabs share one output window, so each
    window's slab count is padded to a multiple of `s_batch`. `cw` and
    `cfirst` are per *step*; `sbase` is per (slab, sublane)."""
    val: Any      # (nslabs, 8, 128) f32 (the HI plane under df64)
    vidx: Any     # (nslabs, 8, 128) int16: row-of-8<<7 | lane-of-128
    planes: Any   # (nsteps, step_plane_rows(R, S), 128) int8 — stacked
    #               per-step round planes (see stack_step_planes)
    sbase: Any    # (nslabs,) int32: x2d128 row base of the superspan
    cw: Any       # (nsteps,) int32: output window id
    cfirst: Any   # (nsteps,) int32: 1 = first step of its window
    sactive: Any  # (nsteps,) int32: 0 = every slab in the step is empty
    #               (slabs are load-sorted per window, so padding slabs
    #                cluster into skippable steps)
    val_lo: Any = None  # (nslabs, 8, 128) f32 LO plane (df64 only):
    #               val + val_lo == the f64 value exactly
    sbase2: Any = None  # (nslabs,) int32 — dual-span classes only: the
    #               slab's SECOND superspan base (== sbase on slabs
    #               that carry one span); entries with vidx bit 13 set
    #               read their x from this span
    segmask: Any = None  # (nslabs, 8, 128) int8 — df64 segmented-scan
    #               bit planes (bit k set at lane l iff element l-2^k
    #               is in the same run): the compensated Kogge-Stone
    #               adds only within runs, so csum[run end] IS the run
    #               sum pair and the per-round rstart gathers + boundary
    #               two-sum disappear; scan depth = scan_levels instead
    #               of log2(128). Built by the NumPy df64 builders under
    #               STREAM_SEGSCAN_DF64.
    xmap: Any = None  # (nslabs*64,) int32 — FREE-PLACEMENT classes
    #               only: per-slab x gather rows. Each sublane slot maps
    #               to an ARBITRARY 1024-value x block (no span
    #               alignment); the call gathers
    #               xcopy = x2d128[xmap] once at the XLA level and the
    #               kernel runs the plain mono span-64 path over it
    #               (sbase = slab*64). Built for hypersparse
    #               populations whose aligned (window, span) groups are
    #               mostly empty: staging stays at the 8-chunk span-64
    #               cost while packing reaches the per-cell ceiling.

    s_batch: int = dataclasses.field(default=4,
                                     metadata=dict(static=True))
    rounds_: int = dataclasses.field(default=ROUNDS,
                                     metadata=dict(static=True))
    df64: bool = dataclasses.field(default=False,
                                   metadata=dict(static=True))
    span_rows: int = dataclasses.field(default=SPAN_ROWS,
                                       metadata=dict(static=True))
    # dual-span slab geometry (round-4): a slab may carry entries of a
    # second (window, superspan) group — both groups use the straight
    # block->sublane map and share the 127-lane sublane capacity,
    # entries merged row-sorted so runs and the (src+tgt)%8 coloring
    # are unchanged. Kills the group-tail quantization that capped
    # powerlaw_large at 68% slab fill (a ~730-entry group is 0.72
    # slabs). Costs a second span read + 8 more staging gathers/slab,
    # so the builder enables it per class by cost model
    # (pick_geometry).
    dual: bool = dataclasses.field(default=False,
                                   metadata=dict(static=True))
    # y-scatter encoding: "rounds" = per-round boundary gathers + rsrc
    # sublane gathers (the round-1..4 design); "offs" = run-ordered
    # boundary planes + static sublane-offset scatter (round 5 — see
    # the _runs_planes_offs comment). Plan layout differs only in
    # `planes`.
    scatter: str = dataclasses.field(default="rounds",
                                     metadata=dict(static=True))
    # segmented-scan depth (df64 + segmask only): ceil(log2(max run
    # length)) for this class; -1 = legacy full 7-level scan with
    # rstart boundary gathers
    scan_levels: int = dataclasses.field(default=-1,
                                         metadata=dict(static=True))

    @property
    def nslabs(self) -> int:
        return self.val.shape[0]

    @property
    def nsteps(self) -> int:
        return self.cw.shape[0]

    @property
    def rounds(self) -> int:
        return self.rounds_


def empty_stream_chunks(n_windows: int,
                        compute_dtype=jnp.float32,
                        s_batch: int = 4,
                        rounds: int = 4) -> StreamChunks:
    """All-inert slabs, one step per window (zero-initializes the class
    output; used by the SPMD unifier)."""
    cdt = np.dtype(compute_dtype)
    df64 = cdt == np.dtype(np.float64)
    ns = n_windows * s_batch
    return StreamChunks(
        val=jnp.zeros((ns, SUBS, LANES), jnp.float32 if df64 else cdt),
        vidx=jnp.zeros((ns, SUBS, LANES), jnp.int16),
        planes=jnp.zeros((n_windows, step_plane_rows(rounds, s_batch),
                          LANES), jnp.int8),
        sbase=jnp.zeros(ns, jnp.int32),
        cw=jnp.asarray(np.arange(n_windows, dtype=np.int32)),
        cfirst=jnp.ones(n_windows, jnp.int32),
        sactive=jnp.zeros(n_windows, jnp.int32),
        val_lo=jnp.zeros((ns, SUBS, LANES), jnp.float32) if df64 else None,
        s_batch=s_batch, rounds_=rounds, df64=df64)


# measured v5e stream-engine cost constants (BASELINE.md round 3): every
# slab in an ACTIVE step — padding included — costs ~SLAB_NS[s] of
# gather issue + VPU ops (smaller batches hide gather latency worse, so
# the per-slab cost rises as s shrinks), each active step pays a fixed
# sequencing cost, and an all-empty (skipped) step only its zero-init
# branch. Slabs are load-sorted per window, so padding beyond the last
# active slab lands in the final active step or in skippable steps.
# refit on v5e (scripts/calibrate_slab_ns.py, round 3: joint least
# squares over mixed_large/mixed_medium/uniform_sparse/powerlaw_large,
# s in {1,2,4,8,11,16,32}; the s=11 row validates the interpolation and
# the s=32 row measured WORSE per slab than 16 — 95.3 vs 94.1 ns plus
# extra padding — so S_MAX stays 16). SKIP_NS was unconstrained by the
# refit (no calibration matrix had skipped steps); keep the estimate.
SLAB_NS = {1: 146.6, 2: 113.0, 4: 90.6, 8: 87.2, 16: 77.8}
STEP_NS = 267.0
# a SKIPPED (all-padding) step is NOT nearly free: the Pallas pipeline
# still DMAs its s_batch dead slabs' val/vidx/plane chunks, so the cost
# scales with the step's slab slots. Round-4 on-chip refit over the
# skipcal matrices (empty windows finally constrained it; the round-3
# 60 ns flat estimate was 11x off at s=16):
#   skip_ns(s) = 179 + 47.5 * s
SKIP0_NS = 179.0
SKIP_SLOT_NS = 47.5
# round-3 compat alias (tests/scripts referenced the flat constant)
SKIP_NS = SKIP0_NS + SKIP_SLOT_NS * 4
S_MAX = 16


def skip_ns(s: int) -> float:
    """Cost of one skipped step at `s` slabs/step (dead-slab DMAs)."""
    return SKIP0_NS + SKIP_SLOT_NS * s
# second stream dispatch + scheduling slack when the class is split into
# a (base, heavy) pair (see split_stream_chunks)
EXTRA_CLASS_NS = 4000.0


def slab_ns(s: int) -> float:
    """Per-slab cost at `s` slabs per step: the measured power-of-2
    anchors (SLAB_NS) log2-interpolated so ANY s in 1..S_MAX can be
    priced — a window population with ~11 real slabs each is cheapest
    at s_batch 11 (one step, one padding slab), a shape no power-of-2
    candidate offers. scripts/calibrate_slab_ns.py refits the anchors
    on-chip. Mirrored in native/streamplan.cpp — keep in sync."""
    ks = sorted(SLAB_NS)
    return float(np.interp(np.log2(s), np.log2(ks),
                           [SLAB_NS[k] for k in ks]))


def _window_costs(counts: np.ndarray, s: int) -> np.ndarray:
    """Per-window cost at s slabs/step: ceil(c/s) steps, each paying the
    step cost plus s slab slots (padding bills at the class rate);
    empty windows one skipped step whose DMA cost scales with s."""
    return np.where(
        counts == 0, skip_ns(s),
        (-(-counts // s)).astype(np.float64) * (STEP_NS + s * slab_ns(s)))


def pick_s_batch(wcnt: np.ndarray) -> int:
    """Cost-minimizing slabs-per-step over the per-window slab counts
    (round-2 verdict task 7: the blind power-of-2 fit padded mixed
    clustered+uniform matrices with ~55 us of empty slabs). Larger
    batches amortize the step cost and give Mosaic more independent
    gather chains; smaller ones waste fewer padding slabs on lightly
    loaded windows. Searches every s in 1..S_MAX (mixed_large's 64
    windows of ~11 slabs want s_batch 11-12, not 8 or 16)."""
    counts = np.asarray(wcnt, np.int64)
    best, best_cost = 1, None
    for s in range(1, S_MAX + 1):
        cost = float(_window_costs(counts, s).sum())
        if best_cost is None or cost < best_cost * 0.98:
            best, best_cost = s, cost
    return best


def pick_stream_split(wcnt: np.ndarray):
    """Two-class slabs-per-step choice over the per-window slab counts.

    Returns (s_base, s_heavy | None, heavy_mask | None). Each window
    joins whichever class is cheaper for it (_window_costs); the best
    (s_base, s_heavy) pair must beat the best single class by
    EXTRA_CLASS_NS plus 2% to win (round-2 verdict task 7: one global
    s_batch padded mixed clustered+uniform matrices with ~55 us of
    empty slabs)."""
    counts = np.asarray(wcnt, np.int64)
    cost = {s: _window_costs(counts, s) for s in range(1, S_MAX + 1)}
    s_single = min(cost, key=lambda s: cost[s].sum())
    best = (float(cost[s_single].sum()), s_single, None, None)
    for s1 in range(1, S_MAX + 1):
        for s2 in range(s1 + 1, S_MAX + 1):
            heavy = cost[s2] < cost[s1]
            if not heavy.any() or heavy.all():
                continue
            tot = (float(np.where(heavy, cost[s2], cost[s1]).sum())
                   + EXTRA_CLASS_NS)
            if tot < best[0] * 0.98:
                best = (tot, s1, s2, heavy)
    return best[1], best[2], best[3]


# measured v5e per-slab decomposition (BASELINE.md round 3): the rounds
# machinery + fixed work is ~83 ns/slab, x staging ~2.3 ns per
# (span_rows/8) chunk (8 chunks = 18.5 ns at the default span)
SLAB_FLOOR_NS = 83.0
STAGE_CHUNK_NS = 2.3
# a dual slab's SECOND span stages cheaper than the model's flat
# 2.3 ns/chunk (its gathers overlap the first span's): refit from the
# two e2e arbitrations — powerlaw_large r4 (dual won at slab ratio
# 0.79, consistent with ~1.9) and mixed_large r5 (dual won 143.2 vs
# 151.7 us at slab ratio 0.886, requiring < 1.5) — split at 1.4
DUAL_EXTRA_CHUNK_NS = 1.4


def pick_span_rows(g_row: np.ndarray, g_col: np.ndarray, m: int) -> int:
    """Cost-minimizing superspan width for this entry population.

    Wider spans merge (window, span) groups — fewer, fuller slabs — at
    ~2.3 ns/slab extra staging per additional x chunk. Slab counts per
    candidate are exact (bincount over (window, span, sublane) keys;
    a group's slab count is the max over its 8 sublanes of
    ceil(count/127)). A wider span must beat the DEFAULT span's cost by
    >5% to displace it (the flagship corpus sits near 70% fill where 64
    wins; comparing against the running best instead would let 256 in
    via 128 on ~9.75% combined advantage — round-3 advisor finding)."""
    nwin = max(1, -(-m // RW_ROWS))
    # count occupied (window, 1024-col block) cells once; every
    # candidate's (span, sublane) grid is an aggregation of it (a
    # sub-window at span r covers r/64 consecutive 1024-col blocks).
    # Occupied-cell counts (not a dense nwin x nq table, which would be
    # GBs on huge-dimension matrices).
    q = (g_col >> 10).astype(np.int64)
    nq = int(q.max()) + 1
    uk, uc = np.unique((g_row >> 10).astype(np.int64) * nq + q,
                       return_counts=True)
    uw, uq = uk // nq, uk % nq
    best, best_cost = SPAN_CHOICES[0], None
    cost_default = None
    for r in SPAN_CHOICES:
        g = r // 64
        # (window, span, sublane) key of each occupied cell; counts per
        # key; then slabs = sum over (window, span) groups of
        # ceil(max-over-sublanes / CAP)
        gkey = (uw * nq + (uq // (8 * g)) * (8 * g)) * 8 + (uq // g) % 8
        gk8, inv = np.unique(gkey, return_inverse=True)
        c = np.bincount(inv, weights=uc).astype(np.int64)
        _, ginv = np.unique(gk8 // 8, return_inverse=True)
        mx = np.zeros(int(ginv[-1]) + 1, np.int64)
        np.maximum.at(mx, ginv, c)
        slabs = int((-(-mx // CAP)).sum())
        cost = slabs * (SLAB_FLOOR_NS + STAGE_CHUNK_NS * (r // 8))
        if cost_default is None:
            cost_default = cost
        if best_cost is None or (cost < best_cost
                                 and cost < cost_default * 0.95):
            best, best_cost = r, cost
    return best


def _occupied_cells(g_row: np.ndarray, g_col: np.ndarray):
    """Occupied (window, 1024-col block) cells with entry counts — the
    one O(nz log nz) pass every geometry candidate aggregates from."""
    q = (g_col >> 10).astype(np.int64)
    nq = int(q.max()) + 1
    uk, uc = np.unique((g_row >> 10).astype(np.int64) * nq + q,
                       return_counts=True)
    return uk // nq, uk % nq, uc, nq


def _group_counts_cells(uw, uq, uc, nq, r: int):
    """Per-(window, superspan) group sublane histograms at span width
    `r` from the occupied cells (no per-entry work). Returns (C (G, 8)
    int64 counts, gwin (G,) window ids) in (window, span) order."""
    g = r // 64
    gkey = (uw * nq + (uq // (8 * g)) * (8 * g)) * 8 + (uq // g) % 8
    gk8, inv = np.unique(gkey, return_inverse=True)
    c8 = np.bincount(inv, weights=uc).astype(np.int64)
    ug, ginv = np.unique(gk8 // 8, return_inverse=True)
    C = np.zeros((ug.size, SUBS), np.int64)
    C[ginv, gk8 % 8] = c8
    return C, (ug // nq).astype(np.int64)


def _group_counts(g_row: np.ndarray, g_col: np.ndarray, r: int):
    """_group_counts_cells over freshly computed cells (test helper)."""
    uw, uq, uc, nq = _occupied_cells(g_row, g_col)
    return _group_counts_cells(uw, uq, uc, nq, r)


def _dual_slab_count(C: np.ndarray, gwin: np.ndarray) -> int:
    """Slab count of the sequential dual-span greedy packing (the same
    walk _build_dual performs), from group histograms alone."""
    total = 0
    L = np.zeros(SUBS, np.int64)
    prev_w = -1
    for i in range(C.shape[0]):
        w = int(gwin[i])
        if w != prev_w:
            if L.any():
                total += 1
            L[:] = 0
            prev_w = w
        c = C[i].copy()
        if L.any():
            c -= np.minimum(c, CAP - L)
            total += 1
            L[:] = 0
        mx = int(c.max())
        kf = max(0, -(-mx // CAP) - 1) if mx else 0
        total += kf
        L = np.clip(c - kf * CAP, 0, None)
    if L.any():
        total += 1
    return total


# free-placement margin: the FP candidate must beat the best aligned
# geometry's modeled cost by this factor (its XLA x-gather cost is
# priced pessimistically at 2x copy traffic until measured)
FP_MARGIN = 0.8


def _fp_cost(cells) -> tuple[float, np.ndarray]:
    """Free-placement cost model from occupied (window, 1024-block)
    cells: slabs pack 8 arbitrary cell-slots each (a cell with > CAP
    entries splits into ceil(cnt/CAP) slots), staging stays at the
    span-64 8-chunk cost, plus the per-SpMV XLA x-copy gather
    (nslabs * 32 KB, priced at 2x streaming). Returns (cost_ns,
    per-window slab counts)."""
    uw, uq, uc, nq = cells
    slots_per_cell = -(-uc // CAP)
    nwin = int(uw.max()) + 1 if uw.size else 1
    wslots = np.zeros(nwin, np.int64)
    np.add.at(wslots, uw, slots_per_cell)
    wslabs = -(-wslots // SUBS)
    slabs = int(wslabs.sum())
    kernel_ns = slabs * (SLAB_FLOOR_NS + STAGE_CHUNK_NS * SUBS)
    xcopy_ns = slabs * SPAN_ROWS * LANES * 4 * 2 / 800.0
    return kernel_ns + xcopy_ns, wslabs


def pick_geometry_fp(g_row: np.ndarray, g_col: np.ndarray, m: int,
                     cells=None):
    """(span_rows, dual, fp): the aligned pick plus the free-placement
    candidate (see StreamChunks.xmap). FP must beat the aligned winner
    by FP_MARGIN — it pays an XLA x-gather per SpMV, so only
    populations whose aligned groups are mostly empty (hypersparse)
    take it."""
    if cells is None:
        cells = _occupied_cells(g_row, g_col)
    span, dual = pick_geometry(g_row, g_col, m, cells=cells)
    C, gwin = _group_counts_cells(*cells, span)
    if dual:
        slabs = _dual_slab_count(C, gwin)
    else:
        slabs = int((-(-C.max(axis=1) // CAP)).sum())
    stage = STAGE_CHUNK_NS * (span // 8) + (
        DUAL_EXTRA_CHUNK_NS * (span // 8) if dual else 0.0)
    aligned_cost = slabs * (SLAB_FLOOR_NS + stage)
    fp_ns, _ = _fp_cost(cells)
    return span, dual, bool(fp_ns < FP_MARGIN * aligned_cost)


def pick_geometry(g_row: np.ndarray, g_col: np.ndarray, m: int,
                  cells=None):
    """Jointly pick (span_rows, dual) by the slab cost model.

    Mono slabs pay SLAB_FLOOR + STAGE_CHUNK per x chunk (span_rows/8
    chunks); dual slabs stage TWO spans (double the chunks) but the
    sequential packing merges group tails, so hypersparse populations
    trade staging for fill. A non-default SPAN must beat the 64-row
    default by >5% (same hysteresis as pick_span_rows); dual at the
    DEFAULT span wins plain ties — the round-5 defaults table measured
    dual 143.2 vs mono 151.7 us e2e on mixed_large while the model
    sized it at only -2%, so the 5% hysteresis was suppressing a real
    win (the model's staging term overprices dual's second span).
    `cells` takes a precomputed _occupied_cells result (the O(nz log
    nz) sort dominates planning on big populations — callers that
    already have it must not pay it twice)."""
    best, best_cost, cost_default = (SPAN_CHOICES[0], False), None, None
    uw, uq, uc, nq = (cells if cells is not None
                      else _occupied_cells(g_row, g_col))
    for r in SPAN_CHOICES:
        C, gwin = _group_counts_cells(uw, uq, uc, nq, r)
        s_mono = int((-(-C.max(axis=1) // CAP)).sum())
        cands = [(False, s_mono)]
        # dual never helps when mono fill is already high
        if g_row.size < 0.92 * s_mono * SUBS * CAP:
            cands.append((True, _dual_slab_count(C, gwin)))
        for dual, slabs in cands:
            stage = STAGE_CHUNK_NS * (r // 8) + (
                DUAL_EXTRA_CHUNK_NS * (r // 8) if dual else 0.0)
            cost = slabs * (SLAB_FLOOR_NS + stage)
            if cost_default is None:
                cost_default = cost
            margin = 1.0 if (dual and r == SPAN_CHOICES[0]) else 0.95
            if best_cost is None or (cost < best_cost
                                     and cost < cost_default * margin):
                best, best_cost = (r, dual), cost
    return best


def _runs_planes(slab_of: np.ndarray, sub_of: np.ndarray,
                 lane_of: np.ndarray, r: np.ndarray, nslabs: int):
    """Round planes from entry placements. Entries must arrive
    (slab, sublane)-contiguous and row-sorted within each (slab,
    sublane); lane 0 is reserved. Returns (planes_raw, rounds) — the
    compacted (src+tgt)%8 proper-coloring construction shared by the
    mono and dual builders (see the module docstring)."""
    nz = r.shape[0]
    skey = slab_of * SUBS + sub_of
    newrun = np.ones(nz, bool)
    newrun[1:] = (skey[1:] != skey[:-1]) | (r[1:] != r[:-1])
    runs = np.nonzero(newrun)[0]
    run_end_e = np.append(runs[1:], nz) - 1

    c_slab = slab_of[runs]
    c_src = sub_of[runs]
    c_row = r[runs]
    c_start = lane_of[runs] - 1          # exclusive (>= 0: lane 0 pad)
    c_end = lane_of[run_end_e]           # inclusive
    rloc = c_row - (c_row >> 10 << 10)
    c_tgt = (rloc >> 7).astype(np.int64)
    c_j = rloc & (LANES - 1)
    color = ((c_src + c_tgt) % SUBS).astype(np.uint8)
    used = np.zeros((nslabs, LANES), np.uint8)
    np.bitwise_or.at(used, (c_slab, c_j), np.uint8(1) << color)
    pop = np.array([bin(m_).count("1") for m_ in range(256)], np.int64)
    below = (used[c_slab, c_j]
             & ((np.uint16(1) << color) - 1).astype(np.uint8))
    t = pop[below]
    rounds = max(4, int(-(-(int(t.max()) + 1) // 4) * 4)) if t.size else 4

    planes = np.zeros((nslabs, plane_rows(rounds), LANES), np.int8)
    planes[c_slab, t * 3 * SUBS + c_src, c_j] = c_end.astype(np.int8)
    planes[c_slab, t * 3 * SUBS + SUBS + c_src, c_j] = c_start.astype(
        np.int8)
    # default rsrc: point every (t, q, j) at a source sublane with no
    # contributor there (zero diff), then overwrite the routed targets
    busybits = np.zeros((nslabs, rounds, LANES), np.uint8)
    np.bitwise_or.at(busybits, (c_slab, t, c_j),
                     (1 << c_src).astype(np.uint8))
    lut = np.zeros(256, np.int8)
    for mask in range(255):
        lut[mask] = next(s_ for s_ in range(SUBS) if not (mask >> s_) & 1)
    first_free = lut[busybits]                    # (nslabs, R, 128)
    for tt in range(rounds):
        base = tt * 3 * SUBS + 2 * SUBS
        planes[:, base: base + SUBS, :] = first_free[:, tt, None, :]
    planes[c_slab, t * 3 * SUBS + 2 * SUBS + c_tgt, c_j] = (
        c_src.astype(np.int8))
    return planes, rounds


def unstack_step_planes(planes: np.ndarray, s_batch: int,
                        rounds: int) -> np.ndarray:
    """Inverse of stack_step_planes: per-step stacked
    (nsteps, step_plane_rows(R, S), 128) -> raw per-slab
    (nslabs, plane_rows(R), 128)."""
    nsteps = planes.shape[0]
    p = planes.reshape(nsteps, rounds, 3, s_batch, SUBS, LANES)
    return np.ascontiguousarray(p.transpose(0, 3, 1, 2, 4, 5)).reshape(
        nsteps * s_batch, plane_rows(rounds), LANES)


def split_stream_chunks(st: StreamChunks, raw_planes: bool = False):
    """Re-batch a built stream class into a (base, heavy) pair when the
    SLAB_NS cost model says two slabs-per-step rates beat one.

    The two classes' window sets are DISJOINT: the heavy class writes
    into the base class's output buffer through input_output_aliasing
    (kernels.stream_class_call's `prev`), overwriting only its own
    window blocks, so the split costs one extra dispatch and zero extra
    XLA ops. Returns (base, heavy | None); (st, None) when the single
    class stands. Operates on any finished StreamChunks (native or
    NumPy builder) — padding slabs are load==0 and are stripped and
    re-padded at each class's rate. `raw_planes`: st.planes is still in
    the RAW per-slab layout (build_stream_chunks with stack=False) — a
    host-only fast path skipping one stack+unstack round trip."""
    offs = st.scatter != "rounds"

    def _stack(pr, s):
        return (stack_offs_planes(pr, s) if offs
                else stack_step_planes(pr, s, st.rounds_))

    def _as_built(sc):
        if raw_planes:
            sc = dataclasses.replace(
                sc, planes=_stack(np.asarray(sc.planes), sc.s_batch))
        return to_device(sc)

    S0, R = st.s_batch, st.rounds_
    cw = np.asarray(st.cw)
    if cw.size == 0:
        return _as_built(st), None
    n_windows = int(cw[-1]) + 1
    val = np.asarray(st.val)
    nslabs = val.shape[0]
    load = np.count_nonzero(val.reshape(nslabs, -1), axis=1)
    if st.df64:
        # an entry can round to hi == 0.0 with lo != 0; padding slabs
        # are zero in BOTH planes
        load = load + np.count_nonzero(
            np.asarray(st.val_lo).reshape(nslabs, -1), axis=1)
    win_of_slab = np.repeat(cw.astype(np.int64), S0)
    real = load > 0
    wcnt = np.bincount(win_of_slab[real], minlength=n_windows)
    s1, s2, heavy = pick_stream_split(wcnt)
    if s2 is None and s1 == S0:
        return _as_built(st), None
    if s2 is None:
        # no split, but a better single rate than the builder's pick
        # (the native builder and pick_s_batch share constants, so this
        # only fires if they drift) — re-batch everything at s1
        heavy = np.zeros(n_windows, bool)

    vidx = np.asarray(st.vidx)
    sbase = np.asarray(st.sbase)
    sbase2 = np.asarray(st.sbase2) if st.sbase2 is not None else None
    xmap = (np.asarray(st.xmap).reshape(-1, SPAN_ROWS)
            if st.xmap is not None else None)
    segmask = (np.asarray(st.segmask)
               if st.segmask is not None else None)
    if raw_planes:
        planes_raw = np.asarray(st.planes)
    elif offs:
        planes_raw = np.asarray(st.planes).reshape(
            -1, scatter_slab_rows(st.scatter), LANES)
    else:
        planes_raw = unstack_step_planes(np.asarray(st.planes), S0, R)
    val_lo = np.asarray(st.val_lo) if st.df64 else None

    def build(wmask, s):
        sel_w = np.nonzero(wmask)[0]
        cnt = wcnt[sel_w]
        padded = np.maximum(1, -(-cnt // s)) * s
        starts = np.concatenate([[0], np.cumsum(padded)])[:-1]
        tot = int(padded.sum())
        v = np.zeros((tot, SUBS, LANES), val.dtype)
        vi = np.zeros((tot, SUBS, LANES), np.int16)
        pr = np.zeros((tot, scatter_slab_rows(st.scatter) if offs
                       else plane_rows(R), LANES), np.int8)
        sb = np.zeros(tot, np.int32)
        sb2 = np.zeros(tot, np.int32) if sbase2 is not None else None
        xm = (np.zeros((tot, SPAN_ROWS), np.int32)
              if xmap is not None else None)
        sm = (np.zeros((tot, SUBS, LANES), np.int8)
              if segmask is not None else None)
        ld = np.zeros(tot, np.int64)
        vl = (np.zeros((tot, SUBS, LANES), np.float32)
              if val_lo is not None else None)
        sel_slab = real & wmask[win_of_slab]
        idx = np.nonzero(sel_slab)[0]        # window-major, load-sorted
        if idx.size:
            w_of = win_of_slab[idx]
            dst = starts[np.searchsorted(sel_w, w_of)] + _rank_within(w_of)
            v[dst] = val[idx]
            vi[dst] = vidx[idx]
            pr[dst] = planes_raw[idx]
            sb[dst] = sbase[idx]
            if sb2 is not None:
                sb2[dst] = sbase2[idx]
            if xm is not None:
                xm[dst] = xmap[idx]
            if sm is not None:
                sm[dst] = segmask[idx]
            ld[dst] = load[idx]
            if vl is not None:
                vl[dst] = val_lo[idx]
        win_full = np.repeat(sel_w, padded)
        cwc = win_full[::s].astype(np.int32)
        cf = np.ones(cwc.shape[0], np.int32)
        cf[1:] = (cwc[1:] != cwc[:-1]).astype(np.int32)
        sact = (ld.reshape(-1, s).sum(axis=1) > 0).astype(np.int32)
        if xm is not None:
            # free-placement: span base is slab * SPAN_ROWS in the
            # class's own x copy
            sb = np.arange(tot, dtype=np.int32) * SPAN_ROWS
        return StreamChunks(
            val=jnp.asarray(v), vidx=jnp.asarray(vi),
            planes=jnp.asarray(_stack(pr, s)),
            sbase=jnp.asarray(sb), cw=jnp.asarray(cwc),
            xmap=(jnp.asarray(xm.reshape(-1)) if xm is not None
                  else None),
            segmask=(jnp.asarray(sm) if sm is not None else None),
            cfirst=jnp.asarray(cf), sactive=jnp.asarray(sact),
            val_lo=jnp.asarray(vl) if vl is not None else None,
            sbase2=jnp.asarray(sb2) if sb2 is not None else None,
            s_batch=s, rounds_=R, df64=st.df64,
            span_rows=st.span_rows, dual=st.dual, scatter=st.scatter,
            # per-class scan depth: the base/heavy halves can need
            # fewer levels than the joint build (mask bit k set iff
            # run offset >= 2^k, so the class max mask value's
            # bit_length is exactly its depth)
            scan_levels=(int(sm.max()).bit_length() if sm is not None
                         else st.scan_levels))

    return build(~heavy, s1), (build(heavy, s2) if s2 is not None
                               else None)


def _rank_within(key: np.ndarray) -> np.ndarray:
    """0-based rank of each element within its equal-key group."""
    n = key.shape[0]
    order = np.argsort(key, kind="stable")
    ks = key[order]
    new = np.ones(n, bool)
    new[1:] = ks[1:] != ks[:-1]
    startpos = np.maximum.accumulate(np.where(new, np.arange(n), 0))
    rk = np.empty(n, np.int64)
    rk[order] = np.arange(n) - startpos
    return rk


def build_stream_chunks(g_row: np.ndarray, g_col: np.ndarray,
                        val: np.ndarray, m: int,
                        compute_dtype=jnp.float32,
                        s_batch: Optional[int] = None,
                        use_native: bool = True,
                        span_rows: Optional[int] = None,
                        device: bool = True,
                        stack: bool = True,
                        dual: Optional[bool] = None,
                        fp: Optional[bool] = None):
    """Compile a global COO entry list into stream slabs.

    Returns (StreamChunks | None, spill); spill is always empty in this
    scheme (kept for API symmetry — the modular coloring cannot
    conflict) but still typed as (row, col, val) arrays.

    `dual=None` lets pick_geometry choose the dual-span slab layout by
    cost model when `span_rows` is also unset; the distributed layer
    pins both (shard plans must agree on static geometry).
    """
    cdt = np.dtype(compute_dtype)
    n_windows = max(1, -(-m // RW_ROWS))
    nz = g_row.shape[0]
    empty_spill = (np.zeros(0, np.int64), np.zeros(0, np.int64),
                   np.zeros(0, np.float64))
    if nz == 0:
        return None, empty_spill
    if span_rows is None and dual is None:
        span_rows, dual, fp_pick = pick_geometry_fp(g_row, g_col, m)
        if fp is None:
            fp = fp_pick
    elif span_rows is None:
        span_rows = pick_span_rows(g_row, g_col, m)
    dual = bool(dual)
    if fp:
        return _build_fp(g_row, g_col, val, m, cdt, s_batch, device,
                         stack), empty_spill
    if STREAM_SCATTER != "rounds":
        # the native builder emits rounds planes; offs/roll planes come
        # from the NumPy reference builder (native export once a
        # non-rounds default is measured-in)
        use_native = False
    sh = 7 + int(span_rows).bit_length() - 1     # log2(span_rows * 128)
    vmask = 16 * span_rows - 1                   # sub-window col mask

    if dual:
        return _build_dual(g_row, g_col, val, m, cdt, s_batch,
                           span_rows, device, stack,
                           use_native=use_native), empty_spill

    if use_native and cdt in (np.dtype(np.float32), np.dtype(np.float64)):
        from ...core import native
        raw = native.stream_plan(g_row, g_col, val, m, s_batch,
                                 want_lo=cdt == np.dtype(np.float64),
                                 span_rows=span_rows)
        if raw is not None:
            win_full = np.repeat(raw["cw"], raw["s_batch"])
            seg = (raw.get("segmask") if STREAM_SEGSCAN_DF64 else None)
            return _finish_stream(raw["val"], raw["vidx"], raw["planes"],
                                  raw["sbase"], win_full,
                                  raw["s_batch"], raw["rounds"],
                                  val_lo_arr=raw.get("val_lo"),
                                  span_rows=span_rows,
                                  device=device, stack=stack,
                                  segmask_arr=seg,
                                  scan_levels=(raw["scan_levels"]
                                               if seg is not None
                                               else -1)), \
                empty_spill

    win = (g_row >> 10).astype(np.int64)
    span = (g_col >> sh).astype(np.int64)    # aligned superspan

    # --- per (window, superspan) group: sublane = 3 col bits below the
    # span, entries row-sorted within sublane, split at CAP; the group's
    # slab count is the max over its 8 sublanes ---
    order = np.argsort((win << 44) | (span << 24)
                       | ((g_col >> (sh - 3)) & 7) << 20
                       | (g_row & (RW_ROWS - 1)), kind="stable")
    r = g_row[order]
    c = g_col[order]
    v = val[order]
    win = win[order]
    span = span[order]
    sub_of = ((c >> (sh - 3)) & 7).astype(np.int64)

    gkey = win * (1 << 24) + span
    newg = np.ones(nz, bool)
    newg[1:] = gkey[1:] != gkey[:-1]
    gid = np.cumsum(newg) - 1                    # entry -> group
    ngroups = int(gid[-1]) + 1
    # rank within (group, sublane)
    pis = _rank_within(gid * SUBS + sub_of)
    k = pis // CAP                               # slab-within-group
    lane_of = pis % CAP + 1                      # lane 0 reserved
    nsl_per_group = np.zeros(ngroups, np.int64)
    np.maximum.at(nsl_per_group, gid, k + 1)
    gslab_start0 = np.concatenate([[0], np.cumsum(nsl_per_group)])[:-1]
    # raw slab -> window/base
    nslabs_raw = int(nsl_per_group.sum())
    gstart = np.nonzero(newg)[0]
    raw_win = np.repeat(win[gstart], nsl_per_group)
    raw_base = np.repeat(span[gstart] * span_rows, nsl_per_group)
    slab_raw = gslab_start0[gid] + k

    # --- pad each window's slab count to a multiple of s_batch ---
    wcnt = np.bincount(raw_win, minlength=n_windows)
    slabs_per_win = np.maximum(1, wcnt)
    if s_batch is None:
        s_batch = pick_s_batch(wcnt)
    slabs_pad = -(-slabs_per_win // s_batch) * s_batch
    slab_start = np.concatenate([[0], np.cumsum(slabs_pad)])[:-1]
    nslabs = int(slabs_pad.sum())
    old2new = slab_start[raw_win] + _rank_within(raw_win)
    slab_of = old2new[slab_raw]

    sbase = np.zeros(nslabs, np.int32)
    sbase[old2new] = raw_base.astype(np.int32)

    val_arr = np.zeros((nslabs, SUBS, LANES), cdt)
    vidx_arr = np.zeros((nslabs, SUBS, LANES), np.int16)
    val_arr[slab_of, sub_of, lane_of] = v
    vidx_arr[slab_of, sub_of, lane_of] = (c & vmask).astype(np.int16)

    if STREAM_SCATTER == "offs":
        planes, rounds = _runs_planes_offs(slab_of, sub_of, lane_of, r,
                                           nslabs)
    elif STREAM_SCATTER == "roll":
        planes, rounds = _runs_planes_roll(slab_of, sub_of, lane_of, r,
                                           nslabs)
    else:
        planes, rounds = _runs_planes(slab_of, sub_of, lane_of, r,
                                      nslabs)
    segmask, levels = (
        _seg_masks(slab_of, sub_of, lane_of, r, nslabs)
        if STREAM_SEGSCAN_DF64 and cdt == np.dtype(np.float64)
        else (None, -1))

    win_arr = np.repeat(np.arange(n_windows), slabs_pad)
    return _finish_stream(val_arr, vidx_arr, planes, sbase, win_arr,
                          s_batch, rounds, span_rows=span_rows,
                          device=device, stack=stack,
                          scatter=STREAM_SCATTER, segmask_arr=segmask,
                          scan_levels=levels), empty_spill


def _build_fp(g_row, g_col, val, m, cdt, s_batch, device, stack
              ) -> Optional[StreamChunks]:
    """Free-placement slabs: each of a slab's 8 sublane slots maps to
    an ARBITRARY (same-window) 1024-value x block via the plan-time
    xmap gather rows (StreamChunks.xmap) — no span alignment, so
    hypersparse populations pack at their per-cell ceiling while
    staging stays at the mono span-64 cost. The kernel is the plain
    mono path over the gathered x copy (sbase = slab * 64)."""
    n_windows = max(1, -(-m // RW_ROWS))
    nz = g_row.shape[0]
    if nz == 0:
        return None
    win = (g_row >> 10).astype(np.int64)
    blk = (g_col >> 10).astype(np.int64)
    order = np.lexsort((g_row, blk, win))
    r = g_row[order]
    c = g_col[order]
    v = val[order]
    win_o, blk_o = win[order], blk[order]

    ckey = win_o * (np.int64(1) << 34) + blk_o
    newc = np.ones(nz, bool)
    newc[1:] = ckey[1:] != ckey[:-1]
    cid = np.cumsum(newc) - 1
    rank_in_cell = _rank_within(cid)
    slot_in_cell = rank_in_cell // CAP
    lane_of = rank_in_cell % CAP + 1
    ccnt = np.bincount(cid)
    slots_per_cell = -(-ccnt // CAP)
    slot_start = np.concatenate([[0], np.cumsum(slots_per_cell)])[:-1]
    slot_of = slot_start[cid] + slot_in_cell
    cstart = np.nonzero(newc)[0]
    slot_win = np.repeat(win_o[cstart], slots_per_cell)
    slot_blk = np.repeat(blk_o[cstart], slots_per_cell)

    # pack slots 8 per slab within each window (slots arrive
    # (window, block)-sorted); pad window slab counts to s_batch
    srank = _rank_within(slot_win)
    raw_slab_in_win = srank // SUBS
    sub_of_slot = srank % SUBS
    wcnt = np.zeros(n_windows, np.int64)
    np.maximum.at(wcnt, slot_win, raw_slab_in_win + 1)
    slabs_per_win = np.maximum(1, wcnt)
    if s_batch is None:
        s_batch = pick_s_batch(wcnt)
    slabs_pad = -(-slabs_per_win // s_batch) * s_batch
    slab_start = np.concatenate([[0], np.cumsum(slabs_pad)])[:-1]
    nslabs = int(slabs_pad.sum())
    slab_of_slot = slab_start[slot_win] + raw_slab_in_win
    slab_of = slab_of_slot[slot_of]
    sub_of = sub_of_slot[slot_of]

    val_arr = np.zeros((nslabs, SUBS, LANES), cdt)
    vidx_arr = np.zeros((nslabs, SUBS, LANES), np.int16)
    val_arr[slab_of, sub_of, lane_of] = v.astype(cdt)
    vidx_arr[slab_of, sub_of, lane_of] = (c & (RW_ROWS - 1)).astype(
        np.int16)

    xmap = np.zeros((nslabs, SPAN_ROWS), np.int32)
    cc = np.arange(XBLOCK_ROWS, dtype=np.int32)
    xmap[slab_of_slot, cc[:, None] * SUBS + sub_of_slot[None, :]] = (
        slot_blk[None, :] * XBLOCK_ROWS + cc[:, None]).astype(np.int32)

    if STREAM_SCATTER == "offs":
        planes, rounds = _runs_planes_offs(slab_of, sub_of, lane_of, r,
                                           nslabs)
    elif STREAM_SCATTER == "roll":
        planes, rounds = _runs_planes_roll(slab_of, sub_of, lane_of, r,
                                           nslabs)
    else:
        planes, rounds = _runs_planes(slab_of, sub_of, lane_of, r,
                                      nslabs)
    segmask, levels = (
        _seg_masks(slab_of, sub_of, lane_of, r, nslabs)
        if STREAM_SEGSCAN_DF64 and cdt == np.dtype(np.float64)
        else (None, -1))
    win_arr = np.repeat(np.arange(n_windows), slabs_pad)
    return _finish_stream(val_arr, vidx_arr, planes, None, win_arr,
                          s_batch, rounds, span_rows=SPAN_ROWS,
                          device=device, stack=stack,
                          scatter=STREAM_SCATTER, xmap_arr=xmap,
                          segmask_arr=segmask, scan_levels=levels)


def _build_dual(g_row, g_col, val, m, cdt, s_batch, span_rows,
                device, stack, use_native: bool = True
                ) -> Optional[StreamChunks]:
    """Dual-span slab packing: walk each window's (superspan) groups in
    span order; an open slab carries the previous group's leftover
    (span A) and takes min(count, free) of the next group per sublane
    (span B, vidx bit 13); remaining entries fill fresh mono slabs whose
    final partial stays open for the next group. Entries of both groups
    are merged row-sorted per (slab, sublane), so runs, the coloring,
    and every downstream stage are the mono machinery unchanged."""
    n_windows = max(1, -(-m // RW_ROWS))
    if STREAM_SCATTER != "rounds":
        use_native = False
    if use_native and cdt in (np.dtype(np.float32), np.dtype(np.float64)):
        from ...core import native
        raw = native.stream_plan(g_row, g_col, val, m, s_batch,
                                 want_lo=cdt == np.dtype(np.float64),
                                 span_rows=span_rows, dual=True)
        if raw is not None and "sbase2" in raw:
            win_full = np.repeat(raw["cw"], raw["s_batch"])
            seg = (raw.get("segmask") if STREAM_SEGSCAN_DF64 else None)
            return _finish_stream(raw["val"], raw["vidx"], raw["planes"],
                                  raw["sbase"], win_full,
                                  raw["s_batch"], raw["rounds"],
                                  val_lo_arr=raw.get("val_lo"),
                                  span_rows=span_rows,
                                  device=device, stack=stack,
                                  sbase2_arr=raw["sbase2"], dual=True,
                                  segmask_arr=seg,
                                  scan_levels=(raw["scan_levels"]
                                               if seg is not None
                                               else -1))
    nz = g_row.shape[0]
    sh = 7 + int(span_rows).bit_length() - 1
    vmask = 16 * span_rows - 1
    win = (g_row >> 10).astype(np.int64)
    span = (g_col >> sh).astype(np.int64)
    sub = ((g_col >> (sh - 3)) & 7).astype(np.int64)
    order = np.lexsort((g_row, sub, span, win))
    r = g_row[order]
    c = g_col[order]
    v = val[order].astype(np.float64)
    win_o, span_o, sub_o = win[order], span[order], sub[order]

    gkey = win_o * (np.int64(1) << 34) + span_o
    newg = np.ones(nz, bool)
    newg[1:] = gkey[1:] != gkey[:-1]
    gid = np.cumsum(newg) - 1
    ngroups = int(gid[-1]) + 1
    gstart = np.nonzero(newg)[0]
    gwin = win_o[gstart]
    gspan = span_o[gstart]
    C = np.zeros((ngroups, SUBS), np.int64)
    np.add.at(C, (gid, sub_o), 1)

    # --- sequential greedy packing over group histograms ---
    take = np.zeros((ngroups, SUBS), np.int64)
    shared_slab = np.full(ngroups, -1, np.int64)
    base = np.zeros(ngroups, np.int64)
    sA, sB, swin = [], [], []            # per raw slab
    L = np.zeros(SUBS, np.int64)
    open_id = -1
    prev_w = -1
    for g in range(ngroups):
        w = int(gwin[g])
        if w != prev_w:
            open_id = -1
            L[:] = 0
            prev_w = w
        cv = C[g].copy()
        if open_id >= 0:
            t = np.minimum(cv, CAP - L)
            take[g] = t
            shared_slab[g] = open_id
            sB[open_id] = int(gspan[g]) * span_rows
            cv -= t
            open_id = -1
            L[:] = 0
        base[g] = len(sA)
        mx = int(cv.max())
        kf = max(0, -(-mx // CAP) - 1) if mx else 0
        leftover = np.clip(cv - kf * CAP, 0, None)
        nfresh = kf + (1 if leftover.any() else 0)
        pbase = int(gspan[g]) * span_rows
        for _ in range(nfresh):
            sA.append(pbase)
            sB.append(pbase)
            swin.append(w)
        open_id = len(sA) - 1 if leftover.any() else -1
        L = leftover
    nslabs_raw = len(sA)
    if nslabs_raw == 0:
        return None
    raw_win = np.asarray(swin, np.int64)
    sbaseA_raw = np.asarray(sA, np.int64)
    sbaseB_raw = np.asarray(sB, np.int64)

    # --- per-entry slab assignment ---
    rank = _rank_within(gid * SUBS + sub_o)
    tk = take[gid, sub_o]
    is_shared = rank < tk
    rr = rank - tk
    slab_of = np.where(is_shared, shared_slab[gid],
                       base[gid] + np.maximum(rr, 0) // CAP)
    isB = is_shared

    # shared slabs hold ONE shared-slab per raw id; fix up: a shared
    # slab is a slab the group ENTERED — its own raw id came from the
    # PREVIOUS group's leftover emission, so slab_of is already final.
    # re-sort entries (slab, sublane, row) and assign lanes
    order2 = np.lexsort((r, sub_o, slab_of))
    slab_of = slab_of[order2]
    sub_o2 = sub_o[order2]
    r2 = r[order2]
    c2 = c[order2]
    v2 = v[order2]
    isB2 = isB[order2]
    lane_of = _rank_within(slab_of * SUBS + sub_o2) + 1
    if lane_of.max() > CAP:
        raise AssertionError("dual packing overflowed a sublane")

    # --- pad each window's slab count to a multiple of s_batch ---
    wcnt = np.bincount(raw_win, minlength=n_windows)
    slabs_per_win = np.maximum(1, wcnt)
    if s_batch is None:
        s_batch = pick_s_batch(wcnt)
    slabs_pad = -(-slabs_per_win // s_batch) * s_batch
    slab_start = np.concatenate([[0], np.cumsum(slabs_pad)])[:-1]
    nslabs = int(slabs_pad.sum())
    old2new = slab_start[raw_win] + _rank_within(raw_win)
    slab_of = old2new[slab_of]
    sbase = np.zeros(nslabs, np.int32)
    sbase2 = np.zeros(nslabs, np.int32)
    sbase[old2new] = sbaseA_raw.astype(np.int32)
    sbase2[old2new] = sbaseB_raw.astype(np.int32)

    val_arr = np.zeros((nslabs, SUBS, LANES), cdt)
    vidx_arr = np.zeros((nslabs, SUBS, LANES), np.int16)
    val_arr[slab_of, sub_o2, lane_of] = v2.astype(cdt)
    vidx_arr[slab_of, sub_o2, lane_of] = (
        (c2 & vmask) | (isB2.astype(np.int64) << 13)).astype(np.int16)

    if STREAM_SCATTER == "offs":
        planes, rounds = _runs_planes_offs(slab_of, sub_o2, lane_of, r2,
                                           nslabs)
    elif STREAM_SCATTER == "roll":
        planes, rounds = _runs_planes_roll(slab_of, sub_o2, lane_of, r2,
                                           nslabs)
    else:
        planes, rounds = _runs_planes(slab_of, sub_o2, lane_of, r2,
                                      nslabs)
    segmask, levels = (
        _seg_masks(slab_of, sub_o2, lane_of, r2, nslabs)
        if STREAM_SEGSCAN_DF64 and cdt == np.dtype(np.float64)
        else (None, -1))
    win_arr = np.repeat(np.arange(n_windows), slabs_pad)
    return _finish_stream(val_arr, vidx_arr, planes, sbase, win_arr,
                          s_batch, rounds, span_rows=span_rows,
                          device=device, stack=stack,
                          sbase2_arr=sbase2, dual=True,
                          scatter=STREAM_SCATTER, segmask_arr=segmask,
                          scan_levels=levels)


def build_stream_classes(g_row: np.ndarray, g_col: np.ndarray,
                         val: np.ndarray, m: int,
                         compute_dtype=jnp.float32,
                         span_rows: Optional[int] = None,
                         dual: Optional[bool] = None,
                         use_native: bool = True):
    """Build the stream plan AND its two-rate (base, heavy) split in one
    pass. Returns ((base, heavy | None), spill).

    Fast path: the native builder runs once (slabs-per-step 1), Python
    decides the split on per-slab metadata only, and C++ exports each
    class directly in its final kernel layout — no NumPy reorder or
    plane unstack/stack round trips (they dominated powerlaw_large's
    planning profile; round-4 task 3). Falls back to
    build_stream_chunks + split_stream_chunks when the library is
    unavailable (bit-identical results — equivalence-tested)."""
    cdt = np.dtype(compute_dtype)
    empty_spill = (np.zeros(0, np.int64), np.zeros(0, np.int64),
                   np.zeros(0, np.float64))
    if g_row.shape[0] == 0:
        return (None, None), empty_spill
    fp = False
    if span_rows is None and dual is None:
        span_rows, dual, fp = pick_geometry_fp(g_row, g_col, m)
    elif span_rows is None:
        span_rows = pick_span_rows(g_row, g_col, m)
    dual = bool(dual)
    if fp:
        # free-placement class: NumPy builder + host split (the native
        # export emits aligned-span plans only)
        st = _build_fp(g_row, g_col, val, m, cdt, None, device=False,
                       stack=False)
        if st is None:
            return (None, None), empty_spill
        return split_stream_chunks(st, raw_planes=True), empty_spill
    if STREAM_SCATTER != "rounds":
        use_native = False   # native class export emits rounds planes
    if use_native and cdt in (np.dtype(np.float32), np.dtype(np.float64)):
        from ...core import native
        out = native.stream_plan_classes(
            g_row, g_col, val, m,
            want_lo=cdt == np.dtype(np.float64),
            span_rows=span_rows, dual=dual,
            split_fn=pick_stream_split)
        if out is not None:
            df64 = cdt == np.dtype(np.float64)
            use_seg = STREAM_SEGSCAN_DF64 and df64
            classes = [StreamChunks(
                val=jnp.asarray(cd["val"]),
                vidx=jnp.asarray(cd["vidx"]),
                planes=jnp.asarray(cd["planes"]),
                sbase=jnp.asarray(cd["sbase"]),
                cw=jnp.asarray(cd["cw"]),
                cfirst=jnp.asarray(cd["cfirst"]),
                sactive=jnp.asarray(cd["sactive"]),
                val_lo=(jnp.asarray(cd["val_lo"])
                        if "val_lo" in cd else None),
                sbase2=(jnp.asarray(cd["sbase2"])
                        if "sbase2" in cd else None),
                segmask=(jnp.asarray(cd["segmask"])
                         if use_seg and "segmask" in cd else None),
                s_batch=cd["s_batch"], rounds_=cd["rounds"],
                df64=df64, span_rows=span_rows, dual=dual,
                scan_levels=(cd.get("scan_levels", -1)
                             if use_seg and "segmask" in cd else -1))
                for cd in out]
            return (classes[0],
                    classes[1] if len(classes) > 1 else None), \
                empty_spill
    st, spill = build_stream_chunks(
        g_row, g_col, val, m, compute_dtype=compute_dtype,
        span_rows=span_rows, dual=dual, use_native=use_native,
        device=False, stack=False)
    if st is None:
        return (None, None), spill
    return split_stream_chunks(st, raw_planes=True), spill


def to_device(sc: StreamChunks) -> StreamChunks:
    """Upload a host-array StreamChunks (build_stream_chunks with
    device=False) onto the default device; a no-op on device arrays."""
    return dataclasses.replace(
        sc, val=jnp.asarray(sc.val), vidx=jnp.asarray(sc.vidx),
        planes=jnp.asarray(sc.planes), sbase=jnp.asarray(sc.sbase),
        cw=jnp.asarray(sc.cw), cfirst=jnp.asarray(sc.cfirst),
        sactive=jnp.asarray(sc.sactive),
        val_lo=None if sc.val_lo is None else jnp.asarray(sc.val_lo),
        sbase2=None if sc.sbase2 is None else jnp.asarray(sc.sbase2),
        xmap=None if sc.xmap is None else jnp.asarray(sc.xmap),
        segmask=None if sc.segmask is None else jnp.asarray(sc.segmask))


def _finish_stream(val_arr, vidx_arr, planes, sbase, win_arr, s_batch,
                   rounds, val_lo_arr=None,
                   span_rows: int = SPAN_ROWS,
                   device: bool = True,
                   stack: bool = True,
                   sbase2_arr=None,
                   dual: bool = False,
                   scatter: str = "rounds",
                   xmap_arr=None,
                   segmask_arr=None,
                   scan_levels: int = -1) -> StreamChunks:
    """Order slabs by load within each window (so empty padding slabs
    cluster into trailing steps the kernel can skip), stack the round
    planes per step, and build the per-step control scalars. f64 values
    are split into an exact (hi, lo) f32 plane pair for the double-f32
    stream kernel; the native builder exports the pair pre-split
    (`val_lo_arr`). `stack=False` keeps the planes in the RAW per-slab
    layout — a host-only intermediate for split_stream_chunks, which
    would otherwise unstack them right back."""
    nslabs = val_arr.shape[0]
    load = np.count_nonzero(val_arr.reshape(nslabs, -1), axis=1)
    order = np.lexsort((-load, win_arr))
    val_arr = val_arr[order]
    vidx_arr = vidx_arr[order]
    planes = planes[order]
    if stack:
        planes = (stack_offs_planes(planes, s_batch)
                  if scatter != "rounds"
                  else stack_step_planes(planes, s_batch, rounds))
    if xmap_arr is not None:
        # free-placement: the x copy is gathered in slab order, so the
        # span base is just slab * SPAN_ROWS
        xmap_arr = xmap_arr[order]
        sbase = np.arange(nslabs, dtype=np.int64) * SPAN_ROWS
    sbase = sbase[order] if xmap_arr is None else sbase
    if segmask_arr is not None:
        segmask_arr = segmask_arr[order]
    if sbase2_arr is not None:
        sbase2_arr = sbase2_arr[order]
    load = load[order]
    if val_lo_arr is not None:
        val_lo_arr = val_lo_arr[order]

    win_step = win_arr[::s_batch]
    cw = win_step.astype(np.int32)
    cfirst = np.ones(cw.shape[0], np.int32)
    cfirst[1:] = (win_step[1:] != win_step[:-1]).astype(np.int32)
    sactive = (load.reshape(-1, s_batch).sum(axis=1) > 0).astype(np.int32)

    df64 = val_arr.dtype == np.float64 or val_lo_arr is not None
    put = jnp.asarray if device else (lambda a: a)
    val_lo = None
    if val_lo_arr is not None:
        val_lo = put(val_lo_arr)
    elif df64:
        hi = val_arr.astype(np.float32)
        val_lo = put((val_arr - hi).astype(np.float32))
        val_arr = hi

    return StreamChunks(
        val=put(val_arr),
        vidx=put(vidx_arr),
        planes=put(planes),
        sbase=put(sbase.astype(np.int32)),
        cw=put(cw),
        cfirst=put(cfirst),
        sactive=put(sactive),
        val_lo=val_lo,
        sbase2=(put(sbase2_arr.astype(np.int32))
                if sbase2_arr is not None else None),
        xmap=(put(xmap_arr.reshape(-1).astype(np.int32))
              if xmap_arr is not None else None),
        segmask=(put(segmask_arr) if segmask_arr is not None else None),
        s_batch=s_batch, rounds_=rounds, df64=df64,
        span_rows=span_rows, dual=dual, scatter=scatter,
        scan_levels=scan_levels)
