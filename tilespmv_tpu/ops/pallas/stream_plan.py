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
SPAN_ROWS = 64     # x2d128 rows staged per slab (64*128 = 8192 x values)
SUBWIN = 1024      # x values addressable by one sublane (8 span rows)
LANES = 128
SUBS = 8
CAP = LANES - 1    # usable entry lanes per sublane (lane 0 reserved)


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
    vidx: Any     # (nslabs, 8, 128) int32: (hi<<7 | lo) within sublane window
    rend: Any     # (nslabs, R*8, 128) int8: inclusive run end lane
    rstart: Any   # (nslabs, R*8, 128) int8: exclusive run start lane
    rsrc: Any     # (nslabs, R*8, 128) int8: source sublane per target
    sbase: Any    # (nslabs,) int32: x2d128 row base of the slab's span
    cw: Any       # (nsteps,) int32: output window id
    cfirst: Any   # (nsteps,) int32: 1 = first step of its window

    rounds: int = dataclasses.field(metadata=dict(static=True))
    s_batch: int = dataclasses.field(metadata=dict(static=True))

    @property
    def nslabs(self) -> int:
        return self.val.shape[0]

    @property
    def nsteps(self) -> int:
        return self.cw.shape[0]


def empty_stream_chunks(n_windows: int, rounds: int,
                        compute_dtype=jnp.float32,
                        s_batch: int = 4) -> StreamChunks:
    """All-inert slabs, one step per window (zero-initializes the class
    output; used by the SPMD unifier)."""
    cdt = np.dtype(compute_dtype)
    ns = n_windows * s_batch
    return StreamChunks(
        val=jnp.zeros((ns, SUBS, LANES), cdt),
        vidx=jnp.zeros((ns, SUBS, LANES), jnp.int32),
        rend=jnp.zeros((ns, rounds * SUBS, LANES), jnp.int8),
        rstart=jnp.zeros((ns, rounds * SUBS, LANES), jnp.int8),
        rsrc=jnp.zeros((ns, rounds * SUBS, LANES), jnp.int8),
        sbase=jnp.zeros(ns, jnp.int32),
        cw=jnp.asarray(np.arange(n_windows, dtype=np.int32)),
        cfirst=jnp.ones(n_windows, jnp.int32),
        rounds=rounds, s_batch=s_batch)


def _assign_rounds(slab: np.ndarray, j: np.ndarray, src: np.ndarray,
                   tgt: np.ndarray, max_iters: int = 24) -> np.ndarray:
    """Greedy bipartite edge coloring: per (slab, lane column j), no two
    contributors may share a round with equal source sublane or equal
    target sublane. Returns the round of each contributor (may exceed any
    cap; caller spills)."""
    n = slab.shape[0]
    t = np.zeros(n, np.int64)
    if n == 0:
        return t
    base = np.int64(1024)  # > max rounds we will ever reach
    for _ in range(max_iters):
        bumped = False
        for comp in (src, tgt):
            key = ((slab * LANES + j) * SUBS + comp) * base + t
            order = np.argsort(key, kind="stable")
            ks = key[order]
            dup = np.zeros(n, bool)
            dup[order[1:]] = ks[1:] == ks[:-1]
            if dup.any():
                t[dup] += 1
                bumped = True
        if not bumped:
            return t
    return t


def build_stream_chunks(g_row: np.ndarray, g_col: np.ndarray,
                        val: np.ndarray, m: int,
                        compute_dtype=jnp.float32, max_rounds: int = 8,
                        pad_rounds: Optional[int] = None,
                        s_batch: Optional[int] = None):
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

    win = (g_row >> 10).astype(np.int64)
    order0 = np.lexsort((g_col, win))
    r = g_row[order0].astype(np.int64)
    c = g_col[order0].astype(np.int64)
    v = val[order0]
    win = win[order0]

    # --- cut (window, 8192-col span) groups; within each, bucket entries
    # by 1024-col sublane window, sort by row, split at CAP per sublane ---
    slab_of = np.empty(nz, np.int64)
    sub_of = np.empty(nz, np.int64)
    lane_of = np.empty(nz, np.int64)
    perm = np.empty(nz, np.int64)  # final entry order (slab,sub,row)
    slab_base: list[int] = []
    slab_win: list[int] = []
    nslabs = 0
    pos = 0

    uwin, wstart = np.unique(win, return_index=True)
    wend = np.append(wstart[1:], nz)
    for wi in range(uwin.shape[0]):
        s, e = int(wstart[wi]), int(wend[wi])
        cols = c[s:e]
        i = s
        while i < e:
            base = (int(c[i]) >> 7) << 7
            j = s + int(np.searchsorted(cols, base + SPAN_ROWS * LANES))
            sub = (c[i:j] - base) >> 10
            ord2 = np.lexsort((r[i:j], sub))
            gsub = sub[ord2]
            # position within each sublane run
            changes = np.nonzero(np.diff(gsub))[0] + 1
            starts = np.concatenate([[0], changes])
            run_id = np.zeros(j - i, np.int64)
            run_id[changes] = 1
            run_id = np.cumsum(run_id)
            pis = np.arange(j - i) - starts[run_id]
            k = pis // CAP
            nsl = int(k.max()) + 1 if j > i else 0
            idx = i + ord2
            slab_of[pos:pos + j - i] = nslabs + k
            sub_of[pos:pos + j - i] = gsub
            lane_of[pos:pos + j - i] = pis % CAP + 1
            perm[pos:pos + j - i] = idx
            slab_base.extend([base] * nsl)
            slab_win.extend([int(uwin[wi])] * nsl)
            nslabs += nsl
            pos += j - i
            i = j

    # inert slab for windows with no entries (initializes their output)
    have = np.zeros(n_windows, bool)
    have[np.asarray(slab_win, np.int64)] = True
    for w in np.nonzero(~have)[0]:
        slab_base.append(0)
        slab_win.append(int(w))
        nslabs += 1

    # re-take entries in final order
    r, c, v = r[perm], c[perm], v[perm]
    sort2 = np.lexsort((lane_of, sub_of, slab_of))
    r, c, v = r[sort2], c[sort2], v[sort2]
    slab_of, sub_of, lane_of = slab_of[sort2], sub_of[sort2], lane_of[sort2]

    base_arr = np.asarray(slab_base, np.int64)
    win_arr = np.asarray(slab_win, np.int64)

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

    val_arr = np.zeros((nslabs, SUBS, LANES), np.float64)
    vidx_arr = np.zeros((nslabs, SUBS, LANES), np.int32)
    val_arr[slab_of, sub_of, lane_of] = v
    vidx_arr[slab_of, sub_of, lane_of] = (
        (c - base_arr[slab_of] - sub_of * SUBWIN)).astype(np.int32)

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

    t = _assign_rounds(c_slab, c_j, c_src, c_tgt)
    keep = t < max_rounds
    rounds_used = int(t[keep].max()) + 1 if keep.any() else 1
    # int8 sublane tiling wants R*8 a multiple of 32 -> R multiple of 4
    rounds = pad_rounds or (-(-rounds_used // 4) * 4)
    if rounds < rounds_used:
        keep &= t < rounds

    rend = np.zeros((nslabs, rounds, SUBS, LANES), np.int32)
    rstart = np.zeros((nslabs, rounds, SUBS, LANES), np.int32)
    kslab, kt = c_slab[keep], t[keep]
    ksrc, ktgt, kj = c_src[keep], c_tgt[keep], c_j[keep]
    rend[kslab, kt, ksrc, kj] = c_end[keep].astype(np.int32)
    rstart[kslab, kt, ksrc, kj] = c_start[keep].astype(np.int32)
    # default target routing: point every (slab, t, q, j) at a source
    # sublane with no contributor there (rend == rstart -> zero diff)
    free = rend == rstart                      # (S, R, 8, 128)
    first_free = np.argmax(free, axis=2)       # (S, R, 128)
    rsrc = np.broadcast_to(first_free[:, :, None, :],
                           (nslabs, rounds, SUBS, LANES)).astype(np.int32)
    rsrc = np.ascontiguousarray(rsrc)
    rsrc[kslab, kt, ktgt, kj] = ksrc.astype(np.int32)

    # spilled entries (rare): whole runs whose round exceeded the budget
    if (~keep).any():
        bad = np.nonzero(~keep)[0]
        spill_idx = np.concatenate(
            [np.arange(runs[b], run_end[b] + 1) for b in bad])
        s_row = r[spill_idx]
        s_col = c[spill_idx]
        s_val = v[spill_idx].copy()
        val_arr[slab_of[spill_idx], sub_of[spill_idx],
                lane_of[spill_idx]] = 0.0
        spill = (s_row, s_col, s_val)
    else:
        spill = empty_spill

    win_step = win_arr[::s_batch]
    cw = win_step.astype(np.int32)
    cfirst = np.ones(win_step.shape[0], np.int32)
    cfirst[1:] = (win_step[1:] != win_step[:-1]).astype(np.int32)
    sbase = (base_arr >> 7).astype(np.int32)

    return StreamChunks(
        val=jnp.asarray(val_arr.astype(cdt)),
        vidx=jnp.asarray(vidx_arr),
        rend=jnp.asarray(rend.astype(np.int8).reshape(
            nslabs, rounds * SUBS, LANES)),
        rstart=jnp.asarray(rstart.astype(np.int8).reshape(
            nslabs, rounds * SUBS, LANES)),
        rsrc=jnp.asarray(rsrc.astype(np.int8).reshape(
            nslabs, rounds * SUBS, LANES)),
        sbase=jnp.asarray(sbase), cw=jnp.asarray(cw),
        cfirst=jnp.asarray(cfirst), rounds=rounds,
        s_batch=s_batch), spill
