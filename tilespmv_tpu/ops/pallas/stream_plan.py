"""Entry-level stream engine plan for very sparse tiles (the COO class).

Why: the lane-major chunked classes (lane_plan.py) route x and y with
one-hot matmuls whose build cost is (SPAN_TC + ROW_WINDOW) VPU
compare/selects *per tile lane* — ~1.1 ns/tile on v5e. For matrices
dominated by near-singleton 16x16 tiles (power-law graphs: ~1 nnz per
occupied tile) that machinery charges ~256 lanes of one-hot work per
nonzero. This module instead uses the TPU's hardware dynamic gather
(`tpu.dynamic_gather`, exposed as `jnp.take_along_axis` inside Pallas;
measured ~13 ns per (8,128) lane gather, ~4 ns per (8,128) sublane
gather) to route *entries* directly:

* a **slab** is an (8, 128) block of nonzero entries: sublane s holds
  entries whose x index falls in the slab's s-th 1024-value x window;
  within a sublane, entries are sorted by row; lane 0 of every sublane is
  a reserved zero pad (so exclusive prefix bounds never underflow);
* **x gather**: one dynamic contiguous copy stages the slab's 8192-value
  x span (64 rows of x2d128); per window a lane gather picks the entry's
  value-within-128-row, a sublane gather picks its row-within-window —
  both with broadcast static indices, so duplication is free and there
  are no conflicts;
* **y scatter**: an inclusive prefix sum along lanes (one (8,128) @
  (128,128) matmul against a constant triangular matrix — no serial roll
  chain), then per-(row-run) sums are extracted as csum[end] - csum[start]
  with *plan-time* index matrices and routed to the (8,128) output window
  (1024 rows) by a sublane gather. Multiple row-runs landing on the same
  output lane column are separated into **rounds**; round assignment is a
  per-(slab, lane) bipartite edge coloring (source sublane x target
  sublane), so each round's gathers are conflict-free. Rare contributors
  that would exceed `max_rounds` are spilled to the XLA residual path.

This is the framework's residual engine — the role CSR5
(`external/CSR5_cuda/`, reference csr5_spmv_cuda.h:202-312) plays for the
reference's extracted very-sparse matrix, rebuilt around the TPU's
register-level gather instead of warp segmented sums.
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
# A sublane addresses one x window of `subwin_rows` x2d128 rows (8 rows =
# 1024 values by default; sparse matrices pick 16 = 2048 values so their
# sublanes fill). The slab's span is the 8 windows = 8*subwin_rows rows.
MAX_SPAN_ROWS = 128   # staging slack for the widest window choice
SPAN_ROWS = 64        # span rows at the default subwin_rows = 8
SUBWIN = 1024         # x values per sublane window at the default


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class StreamChunks:
    """Entry-level slabs: (nslabs, 8, 128) value/index planes.

    Slabs are processed `s_batch` per grid step (a *step* amortizes the
    grid bookkeeping and gives Mosaic independent gather chains to
    interleave); every step's slabs share one output window, so each
    window's slab count is padded to a multiple of `s_batch`. `cw` and
    `cfirst` are per *step*; `sbase` is per slab."""
    val: Any      # (nslabs, 8, 128) compute dtype
    vidx: Any     # (nslabs, 8, 128) int16: (hi<<7 | lo) within sublane window
    rend: Any     # (nslabs, R*8, 128) int8: inclusive run end lane
    rstart: Any   # (nslabs, R*8, 128) int8: exclusive run start lane
    rsrc: Any     # (nslabs, R*8, 128) int8: source sublane per target
    sbase: Any    # (nslabs,) int32: x2d128 row base of the slab's span
    cw: Any       # (nsteps,) int32: output window id
    cfirst: Any   # (nsteps,) int32: 1 = first step of its window

    rounds: int = dataclasses.field(metadata=dict(static=True))
    s_batch: int = dataclasses.field(metadata=dict(static=True))
    subwin_rows: int = dataclasses.field(default=8,
                                         metadata=dict(static=True))

    @property
    def nslabs(self) -> int:
        return self.val.shape[0]

    @property
    def nsteps(self) -> int:
        return self.cw.shape[0]

    @property
    def span_rows(self) -> int:
        return SUBS * self.subwin_rows


def empty_stream_chunks(n_windows: int, rounds: int,
                        compute_dtype=jnp.float32,
                        s_batch: int = 4,
                        subwin_rows: int = 8) -> StreamChunks:
    """All-inert slabs, one step per window (zero-initializes the class
    output; used by the SPMD unifier)."""
    cdt = np.dtype(compute_dtype)
    ns = n_windows * s_batch
    return StreamChunks(
        val=jnp.zeros((ns, SUBS, LANES), cdt),
        vidx=jnp.zeros((ns, SUBS, LANES), jnp.int16),
        rend=jnp.zeros((ns, rounds * SUBS, LANES), jnp.int8),
        rstart=jnp.zeros((ns, rounds * SUBS, LANES), jnp.int8),
        rsrc=jnp.zeros((ns, rounds * SUBS, LANES), jnp.int8),
        sbase=jnp.zeros(ns, jnp.int32),
        cw=jnp.asarray(np.arange(n_windows, dtype=np.int32)),
        cfirst=jnp.ones(n_windows, jnp.int32),
        rounds=rounds, s_batch=s_batch, subwin_rows=subwin_rows)


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


def _assign_rounds(slab: np.ndarray, j: np.ndarray, src: np.ndarray,
                   tgt: np.ndarray, nslabs: int) -> np.ndarray:
    """Proper edge coloring of each (slab, lane column) cell's bipartite
    contributor graph (source sublane x target sublane), sort-free.

    Within a cell, target <-> row is a bijection, so (src, tgt) pairs are
    distinct: the graph is *simple* on Z8 x Z8, and color = (src + tgt)
    mod 8 is always proper (all-distinct targets per source and vice
    versa). Colors are then compacted per cell (rank among used colors,
    via an 8-bit used-mask and a popcount LUT) so lightly loaded cells
    need few rounds. Never exceeds 8 rounds; nothing ever spills."""
    color = ((src + tgt) % SUBS).astype(np.uint8)
    used = np.zeros((nslabs, LANES), np.uint8)
    np.bitwise_or.at(used, (slab, j), np.uint8(1) << color)
    pop = np.zeros(256, np.int64)
    for mask in range(256):
        pop[mask] = bin(mask).count("1")
    below = used[slab, j] & ((np.uint16(1) << color) - 1).astype(np.uint8)
    return pop[below]


def build_stream_chunks(g_row: np.ndarray, g_col: np.ndarray,
                        val: np.ndarray, m: int,
                        compute_dtype=jnp.float32, max_rounds: int = 8,
                        pad_rounds: Optional[int] = None,
                        s_batch: Optional[int] = None,
                        use_native: bool = True,
                        subwin_rows: Optional[int] = None):
    """Compile a global COO entry list into stream slabs.

    Returns (StreamChunks | None, spill) where spill = (row, col, val)
    arrays of entries that exceeded the round budget (route them through
    the XLA residual engine).
    """
    cdt = np.dtype(compute_dtype)
    n_windows = max(1, -(-m // RW_ROWS))
    nz = g_row.shape[0]
    empty_spill = (np.zeros(0, np.int64), np.zeros(0, np.int64),
                   np.zeros(0, np.float64))
    if nz == 0:
        return None, empty_spill

    if subwin_rows is None:
        # 16-row (2048-value) windows improve slab fill but double the
        # span staging traffic. Measured crossover on v5e: fill >= ~50%
        # at 1024-value windows -> keep 8 (powerlaw_large, 63% fill:
        # 1.05 -> 1.26 ms with 16); below it -> 16 wins (13.5M power-law,
        # 40% fill: 4.01 -> 3.53 ms).
        ncols = int(g_col.max()) + 1
        est_per_subwin = nz * SUBWIN * RW_ROWS / (max(m, 1) * ncols)
        subwin_rows = 16 if est_per_subwin < 64 else 8
    subwin = subwin_rows * LANES
    span_cols = SUBS * subwin

    # native fast path (native/streamplan.cpp) — bit-compatible plan
    # semantics; the NumPy path below is the reference implementation.
    # The C++ core hardcodes sub_shift for subwin_rows in {8, 16}; any
    # other value must take the NumPy path (it would corrupt the
    # SUBS-strided plan buffers otherwise).
    if (use_native and cdt == np.dtype(np.float32)
            and pad_rounds is None and max_rounds >= 8
            and subwin_rows in (8, 16)):
        from ...core import native
        raw = native.stream_plan(g_row, g_col, val, m, s_batch,
                                 subwin_rows)
        if raw is not None:
            return StreamChunks(
                val=jnp.asarray(raw["val"]),
                vidx=jnp.asarray(raw["vidx"]),
                rend=jnp.asarray(raw["rend"]),
                rstart=jnp.asarray(raw["rstart"]),
                rsrc=jnp.asarray(raw["rsrc"]),
                sbase=jnp.asarray(raw["sbase"]),
                cw=jnp.asarray(raw["cw"]),
                cfirst=jnp.asarray(raw["cfirst"]),
                rounds=raw["rounds"],
                s_batch=raw["s_batch"],
                subwin_rows=subwin_rows), empty_spill

    win = (g_row >> 10).astype(np.int64)
    # single composite-key argsort (3x cheaper than lexsort)
    order0 = np.argsort((win << 33) | g_col.astype(np.int64),
                        kind="stable")
    r = g_row[order0].astype(np.int64)
    c = g_col[order0].astype(np.int64)
    v = val[order0]
    win = win[order0]

    # --- cut (window, 8192-col span) group boundaries. Greedy cutting is
    # a per-window chain, but all windows advance together: each sweep
    # round opens one group per still-active window (vectorized
    # searchsorted over the globally (window, col)-sorted stream) ---
    uwin, wstart = np.unique(win, return_index=True)
    wend = np.append(wstart[1:], nz)
    # c is sorted within a window only; search the composite key instead
    key_wc = (win << 33) | c
    frontier = wstart.copy()
    starts_parts, bases_parts, wins_parts = [], [], []
    active = frontier < wend
    while active.any():
        f = frontier[active]
        bases = (c[f] >> 7) << 7
        starts_parts.append(f)
        bases_parts.append(bases)
        wins_parts.append(uwin[active])
        nxt = np.searchsorted(
            key_wc, (uwin[active] << 33) | (bases + span_cols))
        frontier[active] = np.minimum(nxt, wend[active])
        active = frontier < wend
    g_starts = np.concatenate(starts_parts)
    gbase = np.concatenate(bases_parts)
    gwin = np.concatenate(wins_parts)
    order_g = np.argsort(g_starts, kind="stable")
    g_starts, gbase, gwin = g_starts[order_g], gbase[order_g], gwin[order_g]
    ngroups = g_starts.shape[0]
    gsz = np.diff(np.append(g_starts, nz))

    # bucket entries by 1024-col sublane window, sort by row, split at CAP
    # per sublane — one global lexsort over (group, sublane, row)
    group_of = np.repeat(np.arange(ngroups), gsz)
    shift = int(np.log2(subwin))
    sub_all = (c - gbase[group_of]) >> shift
    # rows within a group share one window -> 10-bit local row suffices
    ord2 = np.argsort(((group_of * SUBS + sub_all) << 10)
                      | (r & (RW_ROWS - 1)), kind="stable")
    r, c, v = r[ord2], c[ord2], v[ord2]
    sub_of = sub_all[ord2]
    key2 = group_of * SUBS + sub_of          # group_of unchanged by ord2
    newk = np.ones(nz, bool)
    newk[1:] = key2[1:] != key2[:-1]
    startpos = np.maximum.accumulate(np.where(newk, np.arange(nz), 0))
    pis = np.arange(nz) - startpos
    k = pis // CAP
    lane_of = pis % CAP + 1
    # slabs per group = max over its sublanes of ceil(count / CAP)
    gstart_sorted = np.concatenate([[0], np.cumsum(gsz)])[:-1]
    nsl_per_group = np.maximum.reduceat(k, gstart_sorted) + 1
    gslab_start = np.concatenate([[0], np.cumsum(nsl_per_group)])[:-1]
    slab_of = gslab_start[group_of] + k
    nslabs = int(nsl_per_group.sum())
    base_arr = np.repeat(gbase, nsl_per_group)
    win_arr = np.repeat(gwin, nsl_per_group)

    # inert slab for windows with no entries (initializes their output)
    missing = np.setdiff1d(np.arange(n_windows), uwin, assume_unique=True)
    if missing.size:
        base_arr = np.concatenate([base_arr,
                                   np.zeros(missing.size, np.int64)])
        win_arr = np.concatenate([win_arr, missing])
        nslabs += missing.size

    # final entry order (slab, sublane, lane): entries of one (slab,
    # sublane) are already contiguous and lane-ordered in the current
    # (group, sublane, row) order, so the permutation is arithmetic
    key3 = slab_of * SUBS + sub_of
    cnt3 = np.bincount(key3, minlength=nslabs * SUBS)
    off3 = np.concatenate([[0], np.cumsum(cnt3)])[:-1]
    newpos = off3[key3] + (lane_of - 1)
    sort2 = np.empty(nz, np.int64)
    sort2[newpos] = np.arange(nz)
    r, c, v = r[sort2], c[sort2], v[sort2]
    slab_of, sub_of, lane_of = slab_of[sort2], sub_of[sort2], lane_of[sort2]

    # order slabs by (window, base) so same-window slabs are consecutive
    slab_order = np.lexsort((np.arange(nslabs), base_arr, win_arr))
    slab_rank = np.empty(nslabs, np.int64)
    slab_rank[slab_order] = np.arange(nslabs)
    slab_of = slab_rank[slab_of]
    base_arr = base_arr[slab_order]
    win_arr = win_arr[slab_order]

    # pad each window's slab count to a multiple of s_batch (a grid step
    # processes s_batch same-window slabs)
    uw2, cnt = np.unique(win_arr, return_counts=True)
    if s_batch is None:
        # wide steps amortize grid bookkeeping (measured ~40% on v5e) but
        # waste padding in thinly populated windows
        avg = nslabs / max(1, uw2.shape[0])
        s_batch = 1
        while s_batch < 16 and s_batch * 2 <= avg:
            s_batch *= 2
    pcnt = -(-cnt // s_batch) * s_batch
    new_start = np.concatenate([[0], np.cumsum(pcnt)])[:-1]
    old_start = np.concatenate([[0], np.cumsum(cnt)])[:-1]
    k_of = np.searchsorted(uw2, win_arr)
    old2new = new_start[k_of] + (np.arange(nslabs) - old_start[k_of])
    n_padded = int(pcnt.sum())
    win_new = np.repeat(uw2, pcnt)
    base_new = np.zeros(n_padded, np.int64)
    base_new[old2new] = base_arr
    slab_of = old2new[slab_of]
    win_arr, base_arr, nslabs = win_new, base_new, n_padded

    val_arr = np.zeros((nslabs, SUBS, LANES), cdt)
    vidx_arr = np.zeros((nslabs, SUBS, LANES), np.int16)
    val_arr[slab_of, sub_of, lane_of] = v
    vidx_arr[slab_of, sub_of, lane_of] = (
        (c - base_arr[slab_of] - sub_of * subwin)).astype(np.int16)

    # --- contributors: maximal same-row runs within (slab, sublane) ---
    key = (slab_of * SUBS + sub_of)
    newrun = np.ones(nz, bool)
    newrun[1:] = (key[1:] != key[:-1]) | (r[1:] != r[:-1])
    runs = np.nonzero(newrun)[0]
    run_end = np.append(runs[1:], nz) - 1
    c_slab = slab_of[runs]
    c_src = sub_of[runs]
    c_row = r[runs]
    c_start = lane_of[runs] - 1          # exclusive (>= 0: lane 0 reserved)
    c_end = lane_of[run_end]             # inclusive
    rloc = c_row - win_arr[c_slab] * RW_ROWS
    c_tgt = rloc >> 7
    c_j = rloc & (LANES - 1)

    t = _assign_rounds(c_slab, c_j, c_src, c_tgt, nslabs)
    keep = t < max_rounds
    rounds_used = int(t[keep].max()) + 1 if keep.any() else 1
    # int8 sublane tiling wants R*8 a multiple of 32 -> R multiple of 4
    rounds = pad_rounds or (-(-rounds_used // 4) * 4)
    if rounds < rounds_used:
        keep &= t < rounds

    rend = np.zeros((nslabs, rounds, SUBS, LANES), np.int8)
    rstart = np.zeros((nslabs, rounds, SUBS, LANES), np.int8)
    kslab, kt = c_slab[keep], t[keep]
    ksrc, ktgt, kj = c_src[keep], c_tgt[keep], c_j[keep]
    rend[kslab, kt, ksrc, kj] = c_end[keep].astype(np.int8)
    rstart[kslab, kt, ksrc, kj] = c_start[keep].astype(np.int8)
    # default target routing: point every (slab, t, q, j) at a source
    # sublane with no contributor there (rend == rstart -> zero diff).
    # Busy sources tracked as an 8-bit mask; first free via a 256-LUT.
    busybits = np.zeros((nslabs, rounds, LANES), np.uint8)
    np.bitwise_or.at(busybits, (kslab, kt, kj),
                     (1 << ksrc).astype(np.uint8))
    lut = np.zeros(256, np.int8)
    for mask in range(255):
        lut[mask] = next(s for s in range(SUBS) if not (mask >> s) & 1)
    first_free = lut[busybits]                 # (S, R, 128)
    rsrc = np.ascontiguousarray(np.broadcast_to(
        first_free[:, :, None, :], (nslabs, rounds, SUBS, LANES)))
    rsrc[kslab, kt, ktgt, kj] = ksrc.astype(np.int8)

    # spilled entries (rare): whole runs whose round exceeded the budget
    if (~keep).any():
        run_of = np.cumsum(newrun) - 1           # entry -> run id
        spill_mask = ~keep[run_of]
        s_row = r[spill_mask]
        s_col = c[spill_mask]
        s_val = v[spill_mask].copy()
        val_arr[slab_of[spill_mask], sub_of[spill_mask],
                lane_of[spill_mask]] = 0.0
        spill = (s_row, s_col, s_val)
    else:
        spill = empty_spill

    win_step = win_arr[::s_batch]
    cw = win_step.astype(np.int32)
    cfirst = np.ones(win_step.shape[0], np.int32)
    cfirst[1:] = (win_step[1:] != win_step[:-1]).astype(np.int32)
    sbase = (base_arr >> 7).astype(np.int32)

    return StreamChunks(
        val=jnp.asarray(val_arr),
        vidx=jnp.asarray(vidx_arr),
        rend=jnp.asarray(rend.reshape(nslabs, rounds * SUBS, LANES)),
        rstart=jnp.asarray(rstart.reshape(nslabs, rounds * SUBS, LANES)),
        rsrc=jnp.asarray(rsrc.reshape(nslabs, rounds * SUBS, LANES)),
        sbase=jnp.asarray(sbase), cw=jnp.asarray(cw),
        cfirst=jnp.asarray(cfirst), rounds=rounds,
        s_batch=s_batch, subwin_rows=subwin_rows), spill
