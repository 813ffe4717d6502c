"""Pallas TPU kernels for the lane-major SpMV engines.

Four kernels built from one three-stage pattern (see lane_plan.py for the
design rationale and the mapping from the reference's warp-level CUDA
kernels, tilespmv_cuda.h:394-792):

1. **x gather** — the step's x panels ((16, 256) pre-transposed blocks)
   arrive through the Pallas pipeline (scalar-prefetch block index maps,
   double-buffered); width-128 hardware lane gathers
   (`tpu.dynamic_gather` via `jnp.take_along_axis`) pick each tile's
   16-value x block. Exact in both compiled and interpret mode — no MXU
   one-hot, no dynamic in-kernel VMEM reads (~70 ns each on v5e).
2. **tile math** —
   * dense class: 16 full-width VPU FMA steps over (16, T) slabs
     (the densified 16x16 tile times its x block);
   * band (brick) class: lane = tile-row, so C x 16 pure FMA steps with
     zero index decode and zero output routing;
   * sparse class: 4-bit packed columns are decoded with per-sublane
     shifts, x is routed per slot by hardware sublane gathers, and the
     16 per-row sums come from ONE triangular-matrix MXU prefix multiply
     plus a packed row-pointer boundary gather (replaces the reference's
     per-entry nibble decode + warp shuffle reduce,
     tilespmv_cuda.h:531-605).
3. **y aggregation** — the chunk's (16, T) result is multiplied by a
   (T, ROW_WINDOW) one-hot row matrix on the MXU and accumulated into the
   output row-window block, which stays VMEM-resident across the window's
   consecutive chunks (replaces atomicAdd, tilespmv_cuda.h:384-390). The
   band class skips this entirely (its lanes ARE the window's rows).
"""
from __future__ import annotations

import contextlib
import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from jax._src.config import enable_x64 as _enable_x64_ctx


def _x32_trace():
    """Kernels are pure 32-bit programs; under jax_enable_x64 (the f64
    API path) jnp helpers would promote gather indices to int64, which
    Mosaic rejects — trace them with x64 off."""
    return _enable_x64_ctx(False)

from .lane_plan import (DENSE_MROWS, META_LROW, META_XLOC, PANEL_TC,
                        ROW_WINDOW, BandChunks, DenseChunks, LanePlan,
                        SparseChunks, sparse_meta_rows)
from .stream_plan import (LANES, OFFS_SLAB_ROWS, ROLL_SLAB_ROWS,
                          SPAN_ROWS, SUBS, XBLOCK_ROWS, StreamChunks)

_B = 16  # tile edge; kernels are specialized to 16


_HIPREC = jax.lax.Precision.HIGHEST


def _tree_sum(parts):
    while len(parts) > 1:
        nxt = [parts[k] + parts[k + 1] for k in range(0, len(parts) - 1, 2)]
        if len(parts) % 2:
            nxt.append(parts[-1])
        parts = nxt
    return parts[0]


def _split_dot(a, oh, acc_dtype):
    """a @ oh with `oh` an exact 0/1 one-hot. The MXU multiplies in bf16,
    so split `a` into an exact bf16 hi+lo pair and accumulate both passes
    in f32 (~2^-17 relative error; a single default-precision f32 dot
    would silently truncate x/y to bf16)."""
    if acc_dtype != jnp.float32:
        return jax.lax.dot(a, oh.astype(a.dtype), precision=_HIPREC,
                           preferred_element_type=acc_dtype)
    a_hi = a.astype(jnp.bfloat16)
    a_lo = (a - a_hi.astype(acc_dtype)).astype(jnp.bfloat16)
    ohb = oh.astype(jnp.bfloat16)
    # bf16 x bf16 accumulates natively in f32 on the MXU; Mosaic rejects
    # an explicit f32-precision request on bf16 operands
    return (jax.lax.dot(a_hi, ohb, preferred_element_type=acc_dtype)
            + jax.lax.dot(a_lo, ohb, preferred_element_type=acc_dtype))


def _split_dot_left(lt, a, acc_dtype):
    """lt @ a with `lt` an exact 0/1 matrix (split applied to `a`)."""
    if acc_dtype != jnp.float32:
        return jax.lax.dot(lt.astype(a.dtype), a, precision=_HIPREC,
                           preferred_element_type=acc_dtype)
    a_hi = a.astype(jnp.bfloat16)
    a_lo = (a - a_hi.astype(acc_dtype)).astype(jnp.bfloat16)
    ltb = lt.astype(jnp.bfloat16)
    return (jax.lax.dot(ltb, a_hi, preferred_element_type=acc_dtype)
            + jax.lax.dot(ltb, a_lo, preferred_element_type=acc_dtype))


def _x_split(xq):
    """Runtime Dekker split of a gathered x block into 12-bit halves
    (b1 + b2 == xq exactly), for exact f32 products against the
    plan-time pre-split A values."""
    t = jnp.float32(4097.0) * xq
    b1 = t - (t - xq)
    return b1, xq - b1


def _df64_mac(sh, sm, cm, a1, a2, vl, b1, b2, xh, xl):
    """(sh, sm, cm) += a * x in double-f32: the dominant product is the
    EXACT sum a1*b1 + (a1*b2 + a2*b1) + a2*b2 (12-bit factors), two-sum
    compensated into sh; the tail (spill + cross terms) goes through a
    Kahan-compensated second accumulator. Relative error ~1e-11 over
    1e3-term rows (bounded by the 2^-36 rounding of the tail bundle)."""
    p1 = a1 * b1
    p2 = a1 * b2 + a2 * b1
    p3 = a2 * b2
    cross = (a1 + a2) * xl + vl * xh
    t = sh + p1
    bb = t - sh
    e = (sh - (t - bb)) + (p1 - bb)
    u = e + p2 + p3 + cross
    yk = u - cm
    t2 = sm + yk
    cm = (t2 - sm) - yk
    return t, t2, cm


def _split_dot3(a, oh):
    """a @ oh with `oh` an exact 0/1 one-hot and EXACT f32 splitting: a
    f32 value is exactly the sum of three bf16 parts (8-bit mantissas),
    so three MXU passes reproduce the f32 scatter with only the f32
    accumulation rounding (needed by the double-f32 paths — the 2-way
    split's ~2^-17 error would swamp them)."""
    a1 = a.astype(jnp.bfloat16)
    r1 = a - a1.astype(jnp.float32)
    a2 = r1.astype(jnp.bfloat16)
    a3 = (r1 - a2.astype(jnp.float32)).astype(jnp.bfloat16)
    ohb = oh.astype(jnp.bfloat16)
    return (jax.lax.dot(a1, ohb, preferred_element_type=jnp.float32)
            + jax.lax.dot(a2, ohb, preferred_element_type=jnp.float32)
            + jax.lax.dot(a3, ohb, preferred_element_type=jnp.float32))


def _gather_xg(panels, meta_ref, b, t: int, k_panels: int, acc_dtype,
               rhs: int = 0):
    """Pick xg (16, T) — each tile's 16-value x block — with width-128
    hardware lane gathers over the step's `k_panels` pre-transposed
    (16, PANEL_TC) x panels. The panels arrive as pipeline-fetched block
    operands (scalar-prefetch index maps): dynamic in-kernel VMEM reads
    cost ~70 ns each on v5e, pipelined fetches are free. Exact in both
    compiled and interpret mode. `rhs` selects RHS r's panel lanes
    [r*PANEL_TC, (r+1)*PANEL_TC) in a multi-RHS panel stack."""
    loc = jnp.maximum(meta_ref[b, META_XLOC], 0)            # (T,)
    ngrp = PANEL_TC // 128
    off = rhs * ngrp
    xgs = []
    for g0 in range(0, t, 128):
        idx = jnp.broadcast_to(loc[g0:g0 + 128][None, :], (_B, 128))
        out = None
        for k in range(k_panels):
            for h in range(ngrp):
                tk = jnp.take_along_axis(
                    panels[k][:, (off + h) * 128:(off + h + 1) * 128],
                    idx & 127, axis=1)
                if out is None:
                    out = tk
                else:
                    out = jnp.where((idx >> 7) == k * ngrp + h, tk, out)
        xgs.append(out)
    return jnp.concatenate(xgs, axis=1) if len(xgs) > 1 else xgs[0]


TRI_DTYPE = {"v": "bf16"}  # "f32" restores the round-4 operand dtype


def _tri(m):
    """0/1 triangular MXU operand: exact in bf16, and every consumer
    casts it to bf16 (f32 acc) or to acc_dtype (exact from bf16), so
    storing it bf16 makes the in-kernel astype a no-op (deletes a
    per-chunk/per-step full-surface convert) and halves its VMEM."""
    return jnp.asarray(m, jnp.bfloat16 if TRI_DTYPE["v"] == "bf16"
                       else jnp.float32)


WINDOW_BLOCK_VARIANT = {"onehot": "lr", "ohdtype": "f32"}
# "onehot" ablation: "const" (WRONG results) hoists the one-hot build
#   out of the loop to isolate its compare/select surface cost
#   (scripts/ablate_dense.py).
# "ohdtype": the one-hot is exact in bf16 (values 0/1), and every MXU
#   consumer casts it to bf16 anyway (_split_dot/_split_dot3), so
#   building it in bf16 drops a full-surface f32->bf16 convert pass
#   (surface = t*ROW_WINDOW elements per chunk; the one-hot build is
#   the dense class's main un-overlapped VPU cost on few-chunk grids).
#   DEFAULT IS "f32": mid round 5 this terminal's compile helper was
#   updated and now rejects EVERY 16-bit-operand compare in Mosaic
#   ("16-bit iota not supported by hardware" for the i16 iota, then
#   "Target does not support this comparison" for both i16 and bf16
#   eq) — the bf16 build cannot compile here any more. The arm is kept
#   for environments whose Mosaic accepts 16-bit compares; flip only
#   after a compile check.


def _assert_ablation(arm: str):
    """Wrong-results ablation arms are timing probes only: refuse to
    trace them unless the ablation harness has set TILESPMV_ABLATE=1
    (round-3 advisor: a crashed script that left STREAM_VARIANT mutated
    would otherwise silently corrupt every subsequent result
    in-process)."""
    if os.environ.get("TILESPMV_ABLATE") != "1":
        raise RuntimeError(
            f"ablation arm {arm!r} produces WRONG results and is "
            "disabled; set TILESPMV_ABLATE=1 (scripts/ablate_*.py do)")


def _window_block(yc, meta_ref, b, t: int, acc_dtype,
                  interpret: bool = False, exact3: bool = False):
    """Route a chunk result to its (16, ROW_WINDOW) output block.
    `exact3` uses the exact 3-way bf16 split (double-f32 paths)."""
    lr = meta_ref[b, META_LROW]  # (T,)
    if interpret:
        return jnp.zeros((yc.shape[0], ROW_WINDOW), acc_dtype).at[:, lr].add(
            yc)
    oh_t = (jnp.bfloat16 if WINDOW_BLOCK_VARIANT["ohdtype"] == "bf16"
            else jnp.float32)
    # bf16 arm: the compare must run in a 16-bit type — an int32
    # compare's i1 mask lives in (8,128) layout and Mosaic cannot
    # relayout it for a bf16 select ((16,128) tiling). The original
    # int16 compare stopped compiling mid round 5 when this terminal's
    # compile helper was updated ("16-bit iota not supported by
    # hardware", then "Target does not support this comparison" for the
    # i16 eq) — so the bf16 arm now compares in BFLOAT16 itself: lane
    # ids 0..ROW_WINDOW-1 < 256 are exactly representable (bf16 carries
    # 8 significant bits), the iota is generated in int32 (tpu.iota is
    # 32-bit only) and converted, and the eq mask natively shares the
    # select's (16,128) tiling.
    cmp_t = jnp.int32 if oh_t == jnp.float32 else jnp.bfloat16
    iota_r = jax.lax.broadcasted_iota(
        jnp.int32, (t, ROW_WINDOW), 1).astype(cmp_t)
    lr_c = lr[:, None].astype(cmp_t)
    if WINDOW_BLOCK_VARIANT["onehot"] == "const":
        _assert_ablation("const")
        ohr = jnp.where(iota_r == 0, jnp.asarray(1.0, oh_t),
                        jnp.asarray(0.0, oh_t))
    else:
        ohr = jnp.where(lr_c == iota_r,
                        jnp.asarray(1.0, oh_t),
                        jnp.asarray(0.0, oh_t))
    if exact3:
        return _split_dot3(yc, ohr)
    return _split_dot(yc, ohr, acc_dtype)  # (16, RW)


def _two_sum(a, b):
    """Knuth exact two-sum: returns (s, e) with s + e == a + b."""
    t = a + b
    bb = t - a
    return t, (a - (t - bb)) + (b - bb)


def _write_out_df64(i, cfirst, yh, yl, out_h_ref, out_l_ref,
                    prev_h_ref=None, prev_l_ref=None):
    """Accumulate a (hi, lo) pair into the window outputs with a
    compensated hi add (plain f32 += of hi parts would throw away the
    double-f32 precision across chunks/steps). With prev refs (the
    previous class's outputs aliased into this call's — see
    spmv_pallas), the window's first step seeds from them instead of
    overwriting, fusing the per-class XLA adds away."""
    @pl.when(cfirst[i] == 1)
    def _():
        if prev_h_ref is None:
            out_h_ref[...] = yh
            out_l_ref[...] = yl
        else:
            t, e = _two_sum(prev_h_ref[...], yh)
            out_h_ref[...] = t
            out_l_ref[...] = prev_l_ref[...] + yl + e

    @pl.when(cfirst[i] == 0)
    def _():
        t, e = _two_sum(out_h_ref[...], yh)
        out_h_ref[...] = t
        out_l_ref[...] += yl + e


def _write_out(i, cfirst, yblk, out_ref, prev_ref=None):
    @pl.when(cfirst[i] == 1)
    def _():
        out_ref[...] = (yblk if prev_ref is None
                        else prev_ref[...] + yblk)

    @pl.when(cfirst[i] == 0)
    def _():
        out_ref[...] += yblk


def _boundary_gather(cs, idx, t: int):
    """Lane-gather cs (16, t) at idx (16, 128) — idx values in [0, t);
    width-128 native gathers with a chunk-select chain past t=128."""
    if t == 128:
        return jnp.take_along_axis(cs, idx, axis=1)
    out = jnp.take_along_axis(cs[:, :128], idx & 127, axis=1)
    for k in range(1, t // 128):
        tk = jnp.take_along_axis(cs[:, k * 128:(k + 1) * 128],
                                 idx & 127, axis=1)
        out = jnp.where((idx >> 7) == k, tk, out)
    return out


def _prefix_route_block(yc, meta_ref, b, t: int, utri_ref, acc_dtype,
                        base_row: int = DENSE_MROWS):
    """Route a chunk result to its (16, ROW_WINDOW) output block via a
    lane prefix + boundary differences: lanes are lrow-sorted with lane
    0 inert (lane_plan._chunk_metadata prefix_route), cs = yc @ UTRI
    (exact 3-way bf16 split, f32 accumulation), and row r's block is
    cs[:, rend[r]] - cs[:, rend_prev[r]] with plan-time index planes
    at meta rows base_row.. (DENSE_MROWS for the dense class,
    sparse_meta_rows(W) for the W-classes). Replaces the one-hot
    compare/select build (~18% of the f32 chunk time; measured 402.6
    vs 551.6 ns/chunk on mixed_large's dense class)."""
    cs = _split_dot3(yc, utri_ref[...]) if acc_dtype == jnp.float32 \
        else jax.lax.dot(yc, utri_ref[...].astype(acc_dtype),
                         precision=_HIPREC,
                         preferred_element_type=acc_dtype)
    rpp = -(-ROW_WINDOW // t)
    halves = []
    for h in range(ROW_WINDOW // 128):
        row = base_row + (h * 128) // t
        col = (h * 128) % t
        ie = meta_ref[b, row, col: col + 128]
        ip = meta_ref[b, row + rpp, col: col + 128]
        ge = _boundary_gather(cs, jnp.broadcast_to(ie[None, :],
                                                   (_B, 128)), t)
        gs = _boundary_gather(cs, jnp.broadcast_to(ip[None, :],
                                                   (_B, 128)), t)
        halves.append(ge - gs)
    return jnp.concatenate(halves, axis=1)        # (16, ROW_WINDOW)


def _dense_kernel(pb, cw, cfirst,                  # scalar prefetch
                  *refs,  # panels[, utri], val, meta[, prev...], out[, lo]
                  t: int, k_panels: int, c_batch: int, acc_dtype,
                  df64: bool = False, has_prev: bool = False,
                  interpret: bool = False, route: str = "onehot"):
    panel_refs = refs[:k_panels]
    n_out = 2 if df64 else 1
    outs = refs[len(refs) - n_out:]
    prevs = (refs[len(refs) - 2 * n_out: len(refs) - n_out]
             if has_prev else (None,) * n_out)
    prefix = route == "prefix" and not interpret
    utri_ref = refs[k_panels] if prefix else None
    off = k_panels + (1 if prefix else 0)
    val_ref, meta_ref = refs[off], refs[off + 1]
    out_ref = outs[0]
    i = pl.program_id(0)
    if not df64:
        panels = [pr[0].astype(acc_dtype) for pr in panel_refs]
        blks = []
        for b in range(c_batch):
            xg = _gather_xg(panels, meta_ref, b, t, k_panels, acc_dtype)
            # val is j-major: val[b, j] is the contiguous (16_i, T) slab
            # of the tiles' j-th columns. (A 4-way interleaved
            # accumulator variant measured WORSE — 571 vs 489 ns/chunk
            # on v5e: the extra live vregs cost more than the serial
            # FMA latency Mosaic already pipelines.)
            yc = functools.reduce(
                lambda a, j: a + (val_ref[b, j].astype(acc_dtype)
                                  * xg[j, :][None, :]),
                range(_B), jnp.zeros((_B, t), acc_dtype))
            if prefix:
                blks.append(_prefix_route_block(yc, meta_ref, b, t,
                                                utri_ref, acc_dtype))
            else:
                blks.append(_window_block(yc, meta_ref, b, t, acc_dtype,
                                          interpret))
        _write_out(i, cfirst, _tree_sum(blks), out_ref, prevs[0])
        return
    # double-f32 (see _df64_mac); both accumulators are routed through
    # the window one-hot separately and leave through two outputs
    out_lo_ref = outs[1]
    panels_h = [pr[0, 0] for pr in panel_refs]
    panels_l = [pr[0, 1] for pr in panel_refs]
    wh = wl = None
    for b in range(c_batch):
        xh = _gather_xg(panels_h, meta_ref, b, t, k_panels, jnp.float32)
        xl = _gather_xg(panels_l, meta_ref, b, t, k_panels, jnp.float32)
        b1, b2 = _x_split(xh)
        sh = jnp.zeros((_B, t), jnp.float32)
        sm = jnp.zeros((_B, t), jnp.float32)
        cm = jnp.zeros((_B, t), jnp.float32)
        for j in range(_B):
            sh, sm, cm = _df64_mac(
                sh, sm, cm,
                val_ref[b, 3 * j], val_ref[b, 3 * j + 1],
                val_ref[b, 3 * j + 2],
                b1[j, :][None, :], b2[j, :][None, :],
                xh[j, :][None, :], xl[j, :][None, :])
        bh = _window_block(sh, meta_ref, b, t, jnp.float32, interpret,
                           exact3=True)
        bl = _window_block(sm, meta_ref, b, t, jnp.float32, interpret,
                           exact3=True)
        if wh is None:
            wh, wl = bh, bl
        else:
            # compensated within-step accumulation across the batch
            wh, e = _two_sum(wh, bh)
            wl = wl + bl + e
    _write_out_df64(i, cfirst, wh, wl, out_ref, out_lo_ref,
                    prevs[0], prevs[1])


def _sparse_kernel(pb, cw, cfirst,
                   *refs,  # panels, ltri[, utri], val, meta[, prev], out
                   width: int, t: int, k_panels: int, c_batch: int,
                   acc_dtype, has_prev: bool = False,
                   interpret: bool = False, route: str = "onehot"):
    """Packed sparse-entry class: see module doc stage 2. Entry slots are
    row-sorted with slot 0 a reserved zero, so the 16 per-row sums are
    boundary differences of one inclusive prefix over slots."""
    panel_refs = refs[:k_panels]
    out_ref = refs[-1]
    prev_ref = refs[-2] if has_prev else None
    prefix = route == "prefix" and not interpret
    if prefix:
        ltri_ref, utri_ref, val_ref, meta_ref = \
            refs[k_panels: k_panels + 4]
    else:
        utri_ref = None
        ltri_ref, val_ref, meta_ref = refs[k_panels: k_panels + 3]
    panels = [pr[0].astype(acc_dtype) for pr in panel_refs]
    i = pl.program_id(0)
    W = width
    ncw = W // 8
    iota8 = jax.lax.broadcasted_iota(jnp.int32, (SUBS, t), 0)
    iota16 = jax.lax.broadcasted_iota(jnp.int32, (_B, t), 0)
    blks = []
    for b in range(c_batch):
        xg = _gather_xg(panels, meta_ref, b, t, k_panels, acc_dtype)
        xga, xgb = xg[:SUBS], xg[SUBS:]
        # per 8-slot block: decode 4-bit columns (8 nibbles per int32,
        # one per sublane) and route x by hardware sublane gathers
        contribs = []
        for k in range(ncw):
            word = jnp.broadcast_to(meta_ref[b, 2 + k][None, :], (SUBS, t))
            c4 = jnp.right_shift(word, iota8 * 4) & 15
            va = jnp.take_along_axis(xga, c4 & 7, axis=0)
            vb = jnp.take_along_axis(xgb, c4 & 7, axis=0)
            xv = jnp.where(c4 < SUBS, va, vb)
            contribs.append(val_ref[b, k * SUBS:(k + 1) * SUBS]
                            .astype(acc_dtype) * xv)
        contrib = jnp.concatenate(contribs, axis=0)        # (W, T)
        # inclusive prefix over slots: one lower-triangular MXU multiply
        if interpret:
            cs = jnp.cumsum(contrib, axis=0)
        else:
            cs = _split_dot_left(ltri_ref[...], contrib, acc_dtype)
        # packed row pointers -> boundary gather: rend[r] = slot of last
        # entry in rows <= r (0 if none -> cs[0] = 0, slot 0 reserved)
        rows4 = meta_ref[b, 2 + ncw: 2 + ncw + 4]          # (4, T)
        rep = jnp.repeat(rows4, 4, axis=0)                 # (16, T)
        rend = jnp.right_shift(rep, (iota16 % 4) * 8) & 255
        gh = []
        for h in range(2):
            idxh = rend[h * SUBS:(h + 1) * SUBS]
            out = jnp.take_along_axis(cs[:SUBS], idxh & 7, axis=0)
            for k in range(1, ncw):
                sk = jnp.take_along_axis(cs[k * SUBS:(k + 1) * SUBS],
                                         idxh & 7, axis=0)
                out = jnp.where((idxh >> 3) == k, sk, out)
            gh.append(out)
        g = jnp.concatenate(gh, axis=0)                    # (16, T)
        gprev = jnp.concatenate(
            [jnp.zeros((1, t), acc_dtype), g[: _B - 1]], axis=0)
        yc = g - gprev
        if prefix:
            blks.append(_prefix_route_block(
                yc, meta_ref, b, t, utri_ref, acc_dtype,
                base_row=sparse_meta_rows(W)))
        else:
            blks.append(_window_block(yc, meta_ref, b, t, acc_dtype,
                                      interpret))
    _write_out(i, cfirst, _tree_sum(blks), out_ref, prev_ref)


# band df64 accumulation strategy (all CORRECT, err <= 1e-11 gates):
#   serial — one running (sh, sm, cm) compensated chain (round-3 form)
#   ilv2/ilv4 — 2/4 independent accumulator sets, exact two-sum merge
#   tree — Dekker product pairs + _pair_tree_sum (the stream df64 form)
# measured on v5e banded_large (scripts/ab_band_df64.py, round 4) with
# the 2-plane (hi, lo) value layout: serial 144.1 / ilv2 143.6 /
# ilv4 142.1 / tree 137.4 us (all 6.4e-12) — the class is traffic-bound
# (the 3-part 12 B/value layout measured 207-211 us across ALL
# variants), so the layout change bought 32% and tree's extra ILP ~5%
BAND_DF64_VARIANT = {"acc": "tree"}


def _band_kernel(pb, cw, cfirst,
                 *refs,       # panels, val, bloc[, prev...], out[, lo]
                 c_cols: int, k_panels: int, acc_dtype, df64: bool,
                 has_prev: bool = False, interpret: bool = False):
    """Brick class: lane = tile-row, so there is no index decode and no
    output routing — C x 16 pure FMA steps against static panel rows
    picked by one radix lane-gather per brick column block."""
    panel_refs = refs[:k_panels]
    n_out = 2 if df64 else 1
    outs = refs[len(refs) - n_out:]
    prevs = (refs[len(refs) - 2 * n_out: len(refs) - n_out]
             if has_prev else (None,) * n_out)
    val_ref, bloc_ref = refs[k_panels], refs[k_panels + 1]
    out_ref = outs[0]
    i = pl.program_id(0)
    T = ROW_WINDOW
    bloc = bloc_ref[0, 0]                       # (T,) int32
    ngrp = PANEL_TC // 128

    def gather_xq(panels, cb):
        loc = bloc + cb
        xqs = []
        for g0 in range(0, T, 128):
            idx = jnp.broadcast_to(loc[g0:g0 + 128][None, :], (_B, 128))
            out = None
            for k in range(k_panels):
                for h in range(ngrp):
                    tk = jnp.take_along_axis(
                        panels[k][:, h * 128:(h + 1) * 128], idx & 127,
                        axis=1)
                    if out is None:
                        out = tk
                    else:
                        out = jnp.where((idx >> 7) == k * ngrp + h, tk,
                                        out)
            xqs.append(out)
        return jnp.concatenate(xqs, axis=1)     # (16, T)

    if not df64:
        panels = [pr[0].astype(acc_dtype) for pr in panel_refs]
        acc = jnp.zeros((_B, T), acc_dtype)
        for cb in range(c_cols):
            xq = gather_xq(panels, cb)
            for j in range(_B):
                acc = acc + (val_ref[0, cb, j].astype(acc_dtype)
                             * xq[j, :][None, :])
        _write_out(i, cfirst, acc, out_ref, prevs[0])
        return
    # double-f32: panels carry (hi, lo) planes, A carries (a1, a2, vl)
    # parts, the hi/lo sums leave through two outputs
    out_lo_ref = outs[1]
    panels_h = [pr[0, 0] for pr in panel_refs]
    panels_l = [pr[0, 1] for pr in panel_refs]
    if interpret:
        # exact-f64 oracle: XLA:CPU fusion rewrites compensated (hi, lo)
        # chains whose intermediates stay fusion-internal (round-3
        # gotcha — the tree variant drifted 8e-9 under interpret while
        # exact on-chip), so the CPU path never runs the pair pipeline
        panels64 = [ph.astype(jnp.float64) + pl.astype(jnp.float64)
                    for ph, pl in zip(panels_h, panels_l)]
        acc = jnp.zeros((_B, T), jnp.float64)
        for cb in range(c_cols):
            xq = gather_xq(panels64, cb)
            for j in range(_B):
                a = (val_ref[0, 2 * cb, j].astype(jnp.float64)
                     + val_ref[0, 2 * cb + 1, j].astype(jnp.float64))
                acc = acc + a * xq[j, :][None, :]
        yh = acc.astype(jnp.float32)
        yl = (acc - yh.astype(jnp.float64)).astype(jnp.float32)
        _write_out_df64(i, cfirst, yh, yl, out_ref, out_lo_ref,
                        prevs[0], prevs[1])
        return
    variant = BAND_DF64_VARIANT["acc"]
    if variant == "tree":
        # Dekker product pairs tree-combined (the stream df64 form):
        # no serial (sh, sm, cm) chain — the 16 j-products and the
        # log2 tree expose independent VPU chains Mosaic can overlap
        pair = None
        for cb in range(c_cols):
            xh = gather_xq(panels_h, cb)
            xl = gather_xq(panels_l, cb)
            pairs = []
            for j in range(_B):
                ah = val_ref[0, 2 * cb, j]
                vl = val_ref[0, 2 * cb + 1, j]
                a1, a2 = _x_split(ah)       # runtime Dekker pre-split
                xhj = xh[j, :][None, :]
                xlj = xl[j, :][None, :]
                b1, b2 = _x_split(xhj)
                ph = ah * xhj
                plo = (((a1 * b1 - ph) + a1 * b2 + a2 * b1) + a2 * b2
                       + ah * xlj + vl * xhj)
                pairs.append((ph, plo))
            h, l = _pair_tree_sum(pairs)
            if pair is None:
                pair = (h, l)
            else:
                t, e = _two_sum(pair[0], h)
                pair = (t, pair[1] + l + e)
        _write_out_df64(i, cfirst, pair[0], pair[1], out_ref, out_lo_ref,
                        prevs[0], prevs[1])
        return
    nway = {"serial": 1, "ilv2": 2, "ilv4": 4}[variant]
    # nway independent (sh, sm, cm) accumulator sets cut the serial
    # two-sum dependency chain by nway; merged exactly at the end
    accs = [[jnp.zeros((_B, T), jnp.float32) for _ in range(3)]
            for _ in range(nway)]
    for cb in range(c_cols):
        xh = gather_xq(panels_h, cb)
        xl = gather_xq(panels_l, cb)
        b1, b2 = _x_split(xh)
        for j in range(_B):
            a = accs[j % nway]
            a1, a2 = _x_split(val_ref[0, 2 * cb, j])
            a[0], a[1], a[2] = _df64_mac(
                a[0], a[1], a[2],
                a1, a2, val_ref[0, 2 * cb + 1, j],
                b1[j, :][None, :], b2[j, :][None, :],
                xh[j, :][None, :], xl[j, :][None, :])
    sh, sm = accs[0][0], accs[0][1] - accs[0][2]
    for a in accs[1:]:
        sh, e = _two_sum(sh, a[0])
        sm = sm + (a[1] - a[2]) + e
    _write_out_df64(i, cfirst, sh, sm, out_ref, out_lo_ref,
                    prevs[0], prevs[1])


def _panel_spec(k: int, k_panels: int, df64: bool = False):
    """BlockSpec fetching the step's k-th x panel by scalar-prefetch id
    (double-buffered by the Mosaic pipeline). df64 panels carry a (hi,
    lo) f32 plane pair."""
    if df64:
        return pl.BlockSpec(
            (1, 2, _B, PANEL_TC),
            lambda i, pb, cw, cfirst, k=k: (pb[i * k_panels + k], 0, 0,
                                            0),
            memory_space=pltpu.VMEM)
    return pl.BlockSpec(
        (1, _B, PANEL_TC),
        lambda i, pb, cw, cfirst, k=k: (pb[i * k_panels + k], 0, 0),
        memory_space=pltpu.VMEM)


def _grid_spec(nsteps, k_panels, tensor_specs, extra_vmem: int = 0,
               df64: bool = False, n_out: int = 1,
               with_prev: bool = False):
    ospec = pl.BlockSpec(
        (_B, ROW_WINDOW),
        lambda i, pb, cw, cfirst: (0, cw[i]),
        memory_space=pltpu.VMEM)
    return pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(nsteps,),
        in_specs=([_panel_spec(k, k_panels, df64)
                   for k in range(k_panels)]
                  + [pl.BlockSpec(memory_space=pltpu.VMEM)] * extra_vmem
                  + tensor_specs
                  # previous class's y2dT (aliased into this call's
                  # output, see spmv_pallas): same window block map
                  + ([ospec] * n_out if with_prev else [])),
        out_specs=(ospec, ospec) if n_out == 2 else ospec,
    )


def _alias_map(k_panels: int, extra_vmem: int, n_tensors: int,
               n_out: int):
    """input_output_aliases for the trailing prev inputs: indices count
    the scalar-prefetch args too (empirically verified)."""
    base = 3 + k_panels + extra_vmem + n_tensors
    return {base + j: j for j in range(n_out)}


def _chunk_spec(shape_tail, lead: int = 1):
    """BlockSpec for a (nchunks, ...) operand: `lead` chunks per grid
    step."""
    nd = len(shape_tail)
    return pl.BlockSpec(
        (lead,) + shape_tail,
        lambda i, *refs: (i,) + (0,) * nd,
        memory_space=pltpu.VMEM)


def dense_class_call(d: DenseChunks, x_panels: jax.Array, n_windows: int,
                     interpret: bool = False, prev=None):
    """Run the dense-tile class; returns y2dT (16, n_windows*ROW_WINDOW)
    — a (hi, lo) f32 pair when the class is double-f32. `prev` chains
    another class's y2dT through input_output_aliasing (accumulated
    in-kernel instead of by an XLA add)."""
    n_out = 2 if d.df64 else 1
    prefix = d.route == "prefix" and not interpret
    kernel = functools.partial(_dense_kernel, t=d.t_lanes,
                               k_panels=d.k_panels, c_batch=d.c_batch,
                               acc_dtype=jnp.float32, df64=d.df64,
                               has_prev=prev is not None,
                               interpret=interpret, route=d.route)
    vrows = 3 * _B if d.df64 else _B
    tensor_specs = [
        _chunk_spec((vrows, _B, d.t_lanes), lead=d.c_batch),     # val
        _chunk_spec((d.meta.shape[1], d.t_lanes), lead=d.c_batch),  # meta
    ]
    extra_vmem = 1 if prefix else 0
    utri_args = ()
    if prefix:
        # inclusive-prefix operand for the boundary-difference routing
        utri_args = (_tri(np.triu(
            np.ones((d.t_lanes, d.t_lanes), np.float32))),)
    nsteps = d.cw.shape[0]
    oshape = jax.ShapeDtypeStruct((_B, n_windows * ROW_WINDOW),
                                  jnp.float32)
    prev_args = () if prev is None else (
        tuple(prev) if n_out == 2 else (prev,))
    with _x32_trace():
        return pl.pallas_call(
            kernel,
            grid_spec=_grid_spec(nsteps, d.k_panels, tensor_specs,
                                 extra_vmem=extra_vmem,
                                 df64=d.df64, n_out=n_out,
                                 with_prev=prev is not None),
            out_shape=(oshape, oshape) if d.df64 else oshape,
            input_output_aliases=(
                _alias_map(d.k_panels, extra_vmem, 2, n_out)
                if prev is not None else {}),
            interpret=interpret,
        )(d.pb, d.cw, d.cfirst, *([x_panels] * d.k_panels), *utri_args,
          d.val, d.meta, *prev_args)


def sparse_class_call(s: SparseChunks, x_panels: jax.Array,
                      n_windows: int,
                      interpret: bool = False, prev=None) -> jax.Array:
    """Run one sparse-entry class; returns y2dT (16, n_windows*RW).
    `prev` chains another class's y2dT through input_output_aliasing
    (accumulated in-kernel instead of by an XLA add)."""
    acc_dtype = (jnp.float32 if x_panels.dtype != jnp.float64
                 else jnp.float64)
    prefix = (s.route == "prefix" and not interpret
              and acc_dtype == jnp.float32)
    kernel = functools.partial(_sparse_kernel, width=s.width, t=s.t_lanes,
                               k_panels=s.k_panels, c_batch=s.c_batch,
                               acc_dtype=acc_dtype,
                               has_prev=prev is not None,
                               interpret=interpret,
                               route="prefix" if prefix else "onehot")
    tensor_specs = [
        _chunk_spec((s.width, s.t_lanes), lead=s.c_batch),    # val
        _chunk_spec((s.meta.shape[1], s.t_lanes), lead=s.c_batch),
    ]
    # 0/1 triangular MXU operands are exact in bf16, and every consumer
    # casts them to bf16 (f32 acc) or to acc_dtype (exact from bf16) —
    # creating them bf16 deletes a per-chunk full-surface convert
    ltri = _tri(np.tril(np.ones((s.width, s.width), np.float32)))
    utri_args = ()
    extra_vmem = 1
    if prefix:
        utri_args = (_tri(np.triu(
            np.ones((s.t_lanes, s.t_lanes), np.float32))),)
        extra_vmem = 2
    nsteps = s.cw.shape[0]
    prev_args = () if prev is None else (prev,)
    with _x32_trace():
        return pl.pallas_call(
            kernel,
            grid_spec=_grid_spec(nsteps, s.k_panels, tensor_specs,
                                 extra_vmem=extra_vmem,
                                 with_prev=prev is not None),
            out_shape=jax.ShapeDtypeStruct((_B, n_windows * ROW_WINDOW),
                                           acc_dtype),
            input_output_aliases=(
                _alias_map(s.k_panels, extra_vmem, 2, 1)
                if prev is not None else {}),
            interpret=interpret,
        )(s.pb, s.cw, s.cfirst, *([x_panels] * s.k_panels), ltri,
          *utri_args, s.val, s.meta, *prev_args)


def band_class_call(bd: BandChunks, x_panels: jax.Array, n_windows: int,
                    interpret: bool = False, prev=None):
    """Run the brick class; returns y2dT (16, n_windows*ROW_WINDOW) —
    a (hi, lo) f32 pair when the class is double-f32. `prev` chains
    another class's y2dT through input_output_aliasing (accumulated
    in-kernel instead of by an XLA add)."""
    acc_dtype = jnp.float32
    n_out = 2 if bd.df64 else 1
    kernel = functools.partial(_band_kernel, c_cols=bd.c_cols,
                               k_panels=bd.k_panels, df64=bd.df64,
                               acc_dtype=acc_dtype,
                               has_prev=prev is not None,
                               interpret=interpret)
    nsteps = bd.cw.shape[0]
    vparts = 2 if bd.df64 else 1   # df64: (hi, lo) pair rows
    tensor_specs = [
        _chunk_spec((vparts * bd.c_cols, _B, _B, ROW_WINDOW),
                    lead=1),                                     # val
        _chunk_spec((1, ROW_WINDOW), lead=1),                    # bloc
    ]
    oshape = jax.ShapeDtypeStruct((_B, n_windows * ROW_WINDOW),
                                  jnp.float32)
    out_shape = (oshape, oshape) if bd.df64 else oshape
    prev_args = () if prev is None else (
        tuple(prev) if n_out == 2 else (prev,))
    # the df64 interpret branch computes in exact f64 (see
    # _band_kernel) — trace it with x64 left on
    ctx = (contextlib.nullcontext() if interpret and bd.df64
           else _x32_trace())
    with ctx:
        return pl.pallas_call(
            kernel,
            grid_spec=_grid_spec(nsteps, bd.k_panels, tensor_specs,
                                 df64=bd.df64, n_out=n_out,
                                 with_prev=prev is not None),
            out_shape=out_shape,
            input_output_aliases=(
                _alias_map(bd.k_panels, 0, 2, n_out) if prev is not None
                else {}),
            interpret=interpret,
        )(bd.pb, bd.cw, bd.cfirst, *([x_panels] * bd.k_panels), bd.val,
          bd.bloc, *prev_args)


def _band_spmm_kernel(pb, cw, cfirst,
                      *refs,       # panels, val, bloc, out
                      c_cols: int, k_panels: int, k_rhs: int, acc_dtype,
                      interpret: bool = False):
    """Fused multi-RHS brick kernel: A's val blocks stream from HBM ONCE
    for all k right-hand sides (the vmapped SpMM re-reads A per RHS).
    Panels carry the k RHS x planes stacked in the lane dim."""
    panel_refs = refs[:k_panels]
    val_ref, bloc_ref, out_ref = refs[k_panels:]
    panels = [pr[0].astype(acc_dtype) for pr in panel_refs]
    i = pl.program_id(0)
    T = ROW_WINDOW
    bloc = bloc_ref[0, 0]                       # (T,) int32
    ngrp = PANEL_TC // 128
    accs = [jnp.zeros((_B, T), acc_dtype) for _ in range(k_rhs)]
    for cb in range(c_cols):
        loc = bloc + cb
        xqs = []
        for r in range(k_rhs):
            parts = []
            for g0 in range(0, T, 128):
                idx = jnp.broadcast_to(loc[g0:g0 + 128][None, :],
                                       (_B, 128))
                out = None
                for k in range(k_panels):
                    for h in range(ngrp):
                        src = panels[k][:, (r * ngrp + h) * 128:
                                        (r * ngrp + h + 1) * 128]
                        tk = jnp.take_along_axis(src, idx & 127, axis=1)
                        if out is None:
                            out = tk
                        else:
                            out = jnp.where((idx >> 7) == k * ngrp + h,
                                            tk, out)
                parts.append(out)
            xqs.append(jnp.concatenate(parts, axis=1))
        for j in range(_B):
            slab = val_ref[0, cb, j].astype(acc_dtype)
            for r in range(k_rhs):
                accs[r] = accs[r] + slab * xqs[r][j, :][None, :]
    blk = jnp.concatenate(accs, axis=0)          # (k*16, T)
    _write_out(i, cfirst, blk, out_ref)


def band_spmm_call(bd: BandChunks, x_panels_k: jax.Array, n_windows: int,
                   k_rhs: int, interpret: bool = False) -> jax.Array:
    """Fused band SpMM; x_panels_k is (n_panels, 16, k*PANEL_TC) with
    RHS r's panel at lanes [r*256, (r+1)*256). Returns
    (k*16, n_windows*ROW_WINDOW)."""
    acc_dtype = jnp.float32
    kernel = functools.partial(_band_spmm_kernel, c_cols=bd.c_cols,
                               k_panels=bd.k_panels, k_rhs=k_rhs,
                               acc_dtype=acc_dtype, interpret=interpret)
    nsteps = bd.cw.shape[0]
    tensor_specs = [
        _chunk_spec((bd.c_cols, _B, _B, ROW_WINDOW), lead=1),    # val
        _chunk_spec((1, ROW_WINDOW), lead=1),                    # bloc
    ]

    def panel_spec(k, K):
        return pl.BlockSpec(
            (1, _B, k_rhs * PANEL_TC),
            lambda i, pb, cw, cfirst, k=k: (pb[i * K + k], 0, 0),
            memory_space=pltpu.VMEM)

    ospec = pl.BlockSpec(
        (k_rhs * _B, ROW_WINDOW),
        lambda i, pb, cw, cfirst: (0, cw[i]),
        memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(nsteps,),
        in_specs=([panel_spec(k, bd.k_panels)
                   for k in range(bd.k_panels)] + tensor_specs),
        out_specs=ospec,
    )
    with _x32_trace():
        return pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct(
                (k_rhs * _B, n_windows * ROW_WINDOW), acc_dtype),
            interpret=interpret,
        )(bd.pb, bd.cw, bd.cfirst, *([x_panels_k] * bd.k_panels), bd.val,
          bd.bloc)


def _dense_spmm_kernel(pb, cw, cfirst,
                       *refs,      # panels, val, meta, out
                       t: int, k_panels: int, c_batch: int, k_rhs: int,
                       acc_dtype, interpret: bool = False):
    """Fused multi-RHS dense-class kernel: each val slab streams from
    HBM ONCE for all k right-hand sides (panels carry the k RHS x
    planes stacked in the lane dim, like _band_spmm_kernel)."""
    panel_refs = refs[:k_panels]
    val_ref, meta_ref, out_ref = refs[k_panels:]
    panels = [pr[0].astype(acc_dtype) for pr in panel_refs]
    i = pl.program_id(0)
    blks = [[] for _ in range(k_rhs)]
    for b in range(c_batch):
        xgs = [_gather_xg(panels, meta_ref, b, t, k_panels, acc_dtype,
                          rhs=r) for r in range(k_rhs)]
        ycs = [jnp.zeros((_B, t), acc_dtype) for _ in range(k_rhs)]
        for j in range(_B):
            slab = val_ref[b, j].astype(acc_dtype)
            for r in range(k_rhs):
                ycs[r] = ycs[r] + slab * xgs[r][j, :][None, :]
        for r in range(k_rhs):
            blks[r].append(_window_block(ycs[r], meta_ref, b, t,
                                         acc_dtype, interpret))
    out = jnp.concatenate([_tree_sum(bl) for bl in blks], axis=0)
    _write_out(i, cfirst, out, out_ref)


def _sparse_spmm_kernel(pb, cw, cfirst,
                        *refs,     # panels, ltri, val, meta, out
                        width: int, t: int, k_panels: int, c_batch: int,
                        k_rhs: int, acc_dtype, interpret: bool = False):
    """Fused multi-RHS W-class kernel: the nibble-column decode, packed
    row pointers, and val slots are read ONCE; per RHS only the x
    routing, prefix, and boundary gathers repeat."""
    panel_refs = refs[:k_panels]
    ltri_ref, val_ref, meta_ref, out_ref = refs[k_panels:]
    panels = [pr[0].astype(acc_dtype) for pr in panel_refs]
    i = pl.program_id(0)
    W = width
    ncw = W // 8
    iota8 = jax.lax.broadcasted_iota(jnp.int32, (SUBS, t), 0)
    iota16 = jax.lax.broadcasted_iota(jnp.int32, (_B, t), 0)
    blks = [[] for _ in range(k_rhs)]
    for b in range(c_batch):
        # decode shared across RHS
        c4s = []
        for k in range(ncw):
            word = jnp.broadcast_to(meta_ref[b, 2 + k][None, :], (SUBS, t))
            c4s.append(jnp.right_shift(word, iota8 * 4) & 15)
        rows4 = meta_ref[b, 2 + ncw: 2 + ncw + 4]
        rep = jnp.repeat(rows4, 4, axis=0)
        rend = jnp.right_shift(rep, (iota16 % 4) * 8) & 255
        vals = [val_ref[b, k * SUBS:(k + 1) * SUBS].astype(acc_dtype)
                for k in range(ncw)]
        for r in range(k_rhs):
            xg = _gather_xg(panels, meta_ref, b, t, k_panels, acc_dtype,
                            rhs=r)
            xga, xgb = xg[:SUBS], xg[SUBS:]
            contribs = []
            for k in range(ncw):
                c4 = c4s[k]
                va = jnp.take_along_axis(xga, c4 & 7, axis=0)
                vb = jnp.take_along_axis(xgb, c4 & 7, axis=0)
                xv = jnp.where(c4 < SUBS, va, vb)
                contribs.append(vals[k] * xv)
            contrib = jnp.concatenate(contribs, axis=0)
            if interpret:
                cs = jnp.cumsum(contrib, axis=0)
            else:
                cs = _split_dot_left(ltri_ref[...], contrib, acc_dtype)
            gh = []
            for h in range(2):
                idxh = rend[h * SUBS:(h + 1) * SUBS]
                out = jnp.take_along_axis(cs[:SUBS], idxh & 7, axis=0)
                for k in range(1, ncw):
                    sk = jnp.take_along_axis(cs[k * SUBS:(k + 1) * SUBS],
                                             idxh & 7, axis=0)
                    out = jnp.where((idxh >> 3) == k, sk, out)
                gh.append(out)
            g = jnp.concatenate(gh, axis=0)
            gprev = jnp.concatenate(
                [jnp.zeros((1, t), acc_dtype), g[: _B - 1]], axis=0)
            blks[r].append(_window_block(g - gprev, meta_ref, b, t,
                                         acc_dtype, interpret))
    out = jnp.concatenate([_tree_sum(bl) for bl in blks], axis=0)
    _write_out(i, cfirst, out, out_ref)


def _spmm_panel_spec(k, K, k_rhs):
    return pl.BlockSpec(
        (1, _B, k_rhs * PANEL_TC),
        lambda i, pb, cw, cfirst, k=k: (pb[i * K + k], 0, 0),
        memory_space=pltpu.VMEM)


def _spmm_grid_spec(nsteps, k_panels, k_rhs, tensor_specs,
                    extra_vmem: int = 0):
    ospec = pl.BlockSpec(
        (k_rhs * _B, ROW_WINDOW),
        lambda i, pb, cw, cfirst: (0, cw[i]),
        memory_space=pltpu.VMEM)
    return pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(nsteps,),
        in_specs=([_spmm_panel_spec(k, k_panels, k_rhs)
                   for k in range(k_panels)]
                  + [pl.BlockSpec(memory_space=pltpu.VMEM)] * extra_vmem
                  + tensor_specs),
        out_specs=ospec,
    )


def dense_spmm_call(d: DenseChunks, x_panels_k: jax.Array, n_windows: int,
                    k_rhs: int, interpret: bool = False) -> jax.Array:
    """Fused dense-class SpMM; returns (k*16, n_windows*ROW_WINDOW) with
    RHS r's y2dT at rows [r*16, (r+1)*16)."""
    kernel = functools.partial(_dense_spmm_kernel, t=d.t_lanes,
                               k_panels=d.k_panels, c_batch=d.c_batch,
                               k_rhs=k_rhs, acc_dtype=jnp.float32,
                               interpret=interpret)
    tensor_specs = [
        _chunk_spec((_B, _B, d.t_lanes), lead=d.c_batch),        # val
        # meta may carry prefix-route boundary rows; the SpMM kernel
        # routes through the retained META_LROW one-hot either way
        _chunk_spec((d.meta.shape[1], d.t_lanes), lead=d.c_batch),
    ]
    nsteps = d.cw.shape[0]
    with _x32_trace():
        return pl.pallas_call(
            kernel,
            grid_spec=_spmm_grid_spec(nsteps, d.k_panels, k_rhs,
                                      tensor_specs),
            out_shape=jax.ShapeDtypeStruct(
                (k_rhs * _B, n_windows * ROW_WINDOW), jnp.float32),
            interpret=interpret,
        )(d.pb, d.cw, d.cfirst, *([x_panels_k] * d.k_panels), d.val,
          d.meta)


def sparse_spmm_call(s: SparseChunks, x_panels_k: jax.Array,
                     n_windows: int, k_rhs: int,
                     interpret: bool = False) -> jax.Array:
    """Fused W-class SpMM; layout as dense_spmm_call."""
    kernel = functools.partial(_sparse_spmm_kernel, width=s.width,
                               t=s.t_lanes, k_panels=s.k_panels,
                               c_batch=s.c_batch, k_rhs=k_rhs,
                               acc_dtype=jnp.float32, interpret=interpret)
    tensor_specs = [
        _chunk_spec((s.width, s.t_lanes), lead=s.c_batch),    # val
        # meta may carry prefix-route rows; SpMM routes via META_LROW
        _chunk_spec((s.meta.shape[1], s.t_lanes), lead=s.c_batch),
    ]
    ltri = _tri(np.tril(np.ones((s.width, s.width), np.float32)))
    nsteps = s.cw.shape[0]
    with _x32_trace():
        return pl.pallas_call(
            kernel,
            grid_spec=_spmm_grid_spec(nsteps, s.k_panels, k_rhs,
                                      tensor_specs, extra_vmem=1),
            out_shape=jax.ShapeDtypeStruct(
                (k_rhs * _B, n_windows * ROW_WINDOW), jnp.float32),
            interpret=interpret,
        )(s.pb, s.cw, s.cfirst, *([x_panels_k] * s.k_panels), ltri, s.val,
          s.meta)


def spmm_pallas(plan: LanePlan, xs: jax.Array,
                interpret: bool = False) -> jax.Array:
    """Y = A @ X (X: (n, k)) with the Pallas engines, fused per class:
    dense/band/W-class val blocks stream from HBM ONCE for all k RHS
    (the vmapped fallback re-reads A per RHS); the stream class and
    residual run per-RHS (their cost is gather-issue, not A traffic).
    Beyond-reference capability (the reference is SpMV-only)."""
    k = xs.shape[1]
    panels = [x_to_panels(plan, xs[:, r]) for r in range(k)]
    xk = jnp.concatenate(panels, axis=2)

    parts = []
    if plan.dense is not None:
        parts.append(dense_spmm_call(plan.dense, xk, plan.n_windows, k,
                                     interpret=interpret))
    if plan.band is not None:
        parts.append(band_spmm_call(plan.band, xk, plan.n_windows, k,
                                    interpret=interpret))
    for s in plan.sparses:
        parts.append(sparse_spmm_call(s, xk, plan.n_windows, k,
                                      interpret=interpret))
    if parts:
        tot = functools.reduce(jnp.add, parts)   # (k*16, nw*RW)
        cols = [tot[r * _B:(r + 1) * _B].T.reshape(-1) for r in range(k)]
        y = jnp.stack(cols, axis=1)              # (y_padded_len, k)
    else:
        y = jnp.zeros((plan.y_padded_len, k), xs.dtype)

    if plan.stream is not None:
        nw2 = plan.n_stream_windows
        ycols = [None] * k
        xs128 = [(jnp.zeros(plan.x_padded_len128, dtype=xs.dtype)
                  .at[: plan.n].set(xs[:, r])).reshape(-1, 128)
                 for r in range(k)]
        fuse = (STREAM_SPMM_FUSED and not plan.stream.df64
                and xs.dtype != jnp.float64)

        def flat(ys):
            return (ys.reshape(SUBS, nw2, LANES)
                    .transpose(1, 0, 2).reshape(-1))

        r = 0
        while r < k:
            if fuse and r + 1 < k:
                ya, yb = stream_class_call2(plan.stream, xs128[r],
                                            xs128[r + 1], nw2,
                                            interpret=interpret)
                if plan.stream2 is not None:
                    ya, yb = stream_class_call2(plan.stream2, xs128[r],
                                                xs128[r + 1], nw2,
                                                interpret=interpret,
                                                prev=(ya, yb))
                ycols[r] = flat(ya)
                ycols[r + 1] = flat(yb)
                r += 2
                continue
            ys = stream_class_call(plan.stream, xs128[r], nw2,
                                   interpret=interpret)
            if plan.stream2 is not None:
                ys = stream_class_call(plan.stream2, xs128[r], nw2,
                                       interpret=interpret, prev=ys)
            ycols[r] = flat(ys)
            r += 1
        ys2 = jnp.stack(ycols, axis=1)
        ln = max(y.shape[0], ys2.shape[0])
        y = (jnp.zeros((ln, k), ys2.dtype).at[: y.shape[0]].add(y)
             .at[: ys2.shape[0]].add(ys2))

    if plan.residual.val.shape[0]:
        contrib = plan.residual.val[:, None] * xs[plan.residual.col, :]
        y = y.at[plan.residual.row].add(contrib)
    return y[: plan.m].astype(xs.dtype)


def _stream_kernel(sbase, sbase2, cw, cfirst, sactive,  # scalar prefetch
                   *refs,
                   s_batch: int, rounds: int, acc_dtype,
                   df64: bool = False, has_prev: bool = False,
                   interpret: bool = False, span_rows: int = SPAN_ROWS,
                   dual: bool = False, scatter: str = "rounds",
                   scan_levels: int = -1, has_segmask: bool = False):
    """One step = `s_batch` (8,128) entry slabs: hardware-gather x per
    slab superspan, prefix-sum by one batched matmul, then 3-gather
    boundary-difference scatter rounds (see stream_plan.py module doc).
    Slab bodies are independent chains so Mosaic can interleave their
    gather latencies. Steps whose slabs are all empty (load-sorted
    padding) skip the whole body. The df64 variant carries (hi, lo) f32
    pairs end to end (see _stream_step_df64). `has_prev`: the split
    heavy class (stream_plan.split_stream_chunks) aliases the base
    class's output and owns a DISJOINT window set, so the prev refs are
    structural only — its windows are plain overwrites — and are
    dropped here."""
    i = pl.program_id(0)
    n_out = 2 if df64 else 1
    if has_prev:
        refs = refs[: -2 * n_out] + refs[-n_out:]
    seg_ref = None
    if has_segmask:
        seg_ref = refs[6]
        refs = refs[:6] + refs[7:]
    out_refs = refs[-2:] if df64 else refs[-1:]

    @pl.when((sactive[i] == 0) & (cfirst[i] == 1))
    def _():
        for r in out_refs:
            r[...] = jnp.zeros_like(r)

    @pl.when(sactive[i] == 1)
    def _():
        if df64:
            _stream_step_df64(sbase, sbase2, cfirst, *refs, i=i,
                              s_batch=s_batch,
                              rounds=rounds, interpret=interpret,
                              span_rows=span_rows, dual=dual,
                              scatter=scatter, scan_levels=scan_levels,
                              seg_ref=seg_ref)
        else:
            _stream_step(sbase, sbase2, cfirst, *refs, i=i,
                         s_batch=s_batch,
                         rounds=rounds, acc_dtype=acc_dtype,
                         interpret=interpret, span_rows=span_rows,
                         dual=dual, scatter=scatter)


# In-situ ablation switches (scripts/ablate_stream.py flips these before
# tracing; committed defaults = measured winners on v5e):
#   xg: how the slab's x values are staged.
#     "chunk"  — the x buffer is viewed as (rows, 1024) so sublane w's
#        whole window IS row w of an (8,1024) span read; per 128-lane
#        chunk one narrow (8,128) lane gather + select. No sublane
#        gathers, no row-broadcasts, no concat.
#     "narrow" — (64,128) span; 8 narrow (8,128) lane gathers (one per
#        window) + per-window sublane gathers. The microbench
#        (scripts/microbench_gather.py) measures (8,128) lane gathers
#        at ~0.9 ns vs ~21.6 ns for one (64,128).
#     "wide"   — round-1/2 form: ONE (64,128) lane gather + per-window
#        sublane gathers.
#   wide_scatter: one (S*8,128) lane gather per round over the stacked
#     planes instead of per-slab (8,128) gathers — measured SLOWER
#     (gather cost scales superlinearly with sublane count; powerlaw
#     1.06 -> 1.14 ms), kept as an ablation arm.
STREAM_VARIANT = {"xg": "chunk", "wide_scatter": False}

# fused 2-RHS stream SpMM (stream_class_call2): shares the per-slab
# decode, val loads, plane reads, and step machinery across RHS pairs;
# flipped by scripts/ab_spmm_stream.py, committed default = measured
STREAM_SPMM_FUSED = True


def _roll_subs(a, d: int):
    """Static sublane rotate: out[t] = a[(t - d) % 8]."""
    if d == 0:
        return a
    return jnp.concatenate([a[SUBS - d:], a[:SUBS - d]], axis=0)


def _stream_step(sbase, sbase2, cfirst, x2d_ref, ltri_ref, val_ref,
                 vidx_ref, planes_ref, out_ref, *, i, s_batch, rounds,
                 acc_dtype, interpret, span_rows=SPAN_ROWS,
                 dual=False, scatter="rounds"):
    xg = STREAM_VARIANT["xg"]
    if (span_rows != SPAN_ROWS or dual) and xg in ("narrow", "wide"):
        xg = "chunk"   # the legacy arms hard-code mono 64-row spans
    wide_scatter = STREAM_VARIANT["wide_scatter"]
    hmask = span_rows // 8 - 1           # chunk-within-block bits
    contribs = []
    for s in range(s_batch):
        si = i * s_batch + s
        if xg == "noread":
            # ABLATION ONLY (wrong results): skip the span read and all
            # x staging to isolate their cost share
            _assert_ablation("noread")
            contribs.append(val_ref[s].astype(acc_dtype))
            continue
        if xg == "readonly":
            # ABLATION ONLY (wrong results): span read kept, gather/
            # select staging skipped — separates the two costs
            _assert_ablation("readonly")
            span = x2d_ref[pl.ds(sbase[si], SPAN_ROWS), :]
            contribs.append(val_ref[s].astype(acc_dtype)
                            * span[:SUBS].astype(acc_dtype))
            continue
        vidx = vidx_ref[s].astype(jnp.int32)   # stored int16
        if xg == "chunk":
            # x2d_ref rows are PERMUTED within each span: row
            # s*R + c*8 + w holds window w's c-th 128-value chunk, so
            # chunk c of ALL 8 windows is one static (8,128) slice (row
            # order = window). Per chunk: one narrow lane gather +
            # select — no sublane gathers, no broadcasts, no concat.
            # Dual-span slabs stage a SECOND span the same way and pick
            # per entry by vidx bit 13 (stream_plan._build_dual).
            span = x2d_ref[pl.ds(sbase[si], span_rows), :]   # (R, 128)
            lo = vidx & (LANES - 1)
            hi3 = (vidx >> 7) & hmask
            xv = None
            for c in range(span_rows // 8):
                tk = jnp.take_along_axis(
                    span[c * SUBS:(c + 1) * SUBS], lo, axis=1)
                xv = tk if xv is None else jnp.where(hi3 == c, tk, xv)
            if dual:
                spanb = x2d_ref[pl.ds(sbase2[si], span_rows), :]
                xvb = None
                for c in range(span_rows // 8):
                    tk = jnp.take_along_axis(
                        spanb[c * SUBS:(c + 1) * SUBS], lo, axis=1)
                    xvb = tk if xvb is None else jnp.where(hi3 == c, tk,
                                                           xvb)
                xv = jnp.where((vidx >> 13) == 1, xvb, xv)
            xv = xv.astype(acc_dtype)
            contribs.append(val_ref[s].astype(acc_dtype) * xv)
            continue
        span = x2d_ref[pl.ds(sbase[si], SPAN_ROWS), :]   # (64, 128)
        hi = (vidx >> 7) & 7                   # row-of-8 in the x window
        lo = vidx & (LANES - 1)
        rows = []
        if xg == "narrow":
            # per window: one narrow (8,128) lane gather of the window's
            # 8 candidate x rows at the entry's lane, then a sublane
            # gather selects the entry's row
            for w in range(SUBS):
                u = jnp.take_along_axis(
                    span[XBLOCK_ROWS * w: XBLOCK_ROWS * (w + 1), :],
                    jnp.broadcast_to(lo[w: w + 1], (SUBS, LANES)), axis=1)
                hiw = jnp.broadcast_to(hi[w: w + 1], (SUBS, LANES))
                vv = jnp.take_along_axis(u, hiw, axis=0)
                rows.append(vv[0:1])         # all rows equal
        else:
            # ONE (64,128) lane gather for all 8 windows at once
            u64 = jnp.take_along_axis(span, jnp.repeat(lo, XBLOCK_ROWS,
                                                       axis=0), axis=1)
            for w in range(SUBS):
                u = u64[XBLOCK_ROWS * w: XBLOCK_ROWS * (w + 1), :]
                hiw = jnp.broadcast_to(hi[w: w + 1], (SUBS, LANES))
                vv = jnp.take_along_axis(u, hiw, axis=0)
                rows.append(vv[0:1])         # all rows equal
        xv = jnp.concatenate(rows, axis=0).astype(acc_dtype)
        contribs.append(val_ref[s].astype(acc_dtype) * xv)
    cstack = jnp.concatenate(contribs, axis=0)      # (8*S, 128)

    # inclusive prefix sum along lanes: MXU passes against a constant
    # triangular matrix (no serial roll chain). The MXU multiplies in
    # bf16, so split the f32 operand into an exact hi+lo bf16 pair and
    # accumulate both passes in f32 (~2^-17 relative csum error).
    dnums = (((1,), (0,)), ((), ()))
    if interpret:
        # interpret mode emulates MXU dots with a downcast accumulator;
        # use an exact XLA cumsum there instead
        csum = jnp.cumsum(cstack, axis=1)
    elif acc_dtype == jnp.float32:
        lt = ltri_ref[...].astype(jnp.bfloat16)
        c_hi = cstack.astype(jnp.bfloat16)
        c_lo = (cstack - c_hi.astype(acc_dtype)).astype(jnp.bfloat16)
        csum = (jax.lax.dot_general(c_hi, lt, dnums,
                                    preferred_element_type=acc_dtype)
                + jax.lax.dot_general(c_lo, lt, dnums,
                                      preferred_element_type=acc_dtype))
    else:
        csum = jax.lax.dot_general(cstack,
                                   ltri_ref[...].astype(acc_dtype),
                                   dnums,
                                   precision=jax.lax.Precision.HIGHEST,
                                   preferred_element_type=acc_dtype)

    # 3 hardware gathers per (slab, round) over the per-STEP stacked
    # planes (stream_plan.stack_step_planes): run-end and run-start lane
    # gathers of the prefix, then the rsrc sublane gather routes each
    # target row at its source's boundary difference
    # (tpu.dynamic_gather takes the int8 planes directly). The
    # wide_scatter arm replaces the 2*S narrow lane gathers per round
    # with 2 (S*8,128)-wide ones — measured slower on v5e (see
    # STREAM_VARIANT), kept for the ablation.
    pe = planes_ref[0]                     # (R*3*S*8, 128) int8
    sb8 = s_batch * SUBS

    ys = []
    if scatter == "offs":
        # run-ordered boundary extraction (ONE gather pair per slab for
        # ALL runs) + static sublane-offset scatter: per offset d, one
        # lane gather places the runs with tgt-src == d at their target
        # lanes; the static rotate that crosses sublanes COMMUTES with
        # addition, so picks are summed across the step's slabs first
        # and only 7 rotates run per STEP — no dynamic sublane gathers,
        # no per-round boundary re-gathers
        # (stream_plan._runs_planes_offs).
        picks = [[] for _ in range(SUBS)]
        for s in range(s_batch):
            cs = csum[s * SUBS:(s + 1) * SUBS]
            base = s * OFFS_SLAB_ROWS
            ue = jnp.take_along_axis(cs, pe[base: base + SUBS], axis=1)
            us = jnp.take_along_axis(cs, pe[base + SUBS: base + 2 * SUBS],
                                     axis=1)
            diff = ue - us
            for d in range(SUBS):
                o = base + (2 + d) * SUBS
                picks[d].append(jnp.take_along_axis(diff, pe[o: o + SUBS],
                                                    axis=1))
        ys = [_roll_subs(_tree_sum(pk), d)
              for d, pk in enumerate(picks)]
    elif scatter == "roll":
        # the rounds dataflow (independent per-round boundary gather
        # pairs from csum) with rounds keyed by the STATIC offset
        # d = tgt - src, so the dynamic rsrc sublane gather becomes one
        # hoisted rotate per step (stream_plan._runs_planes_roll)
        for d in range(SUBS):
            picks = []
            for s in range(s_batch):
                cs = csum[s * SUBS:(s + 1) * SUBS]
                o = s * ROLL_SLAB_ROWS + 2 * SUBS * d
                ue = jnp.take_along_axis(cs, pe[o: o + SUBS], axis=1)
                us = jnp.take_along_axis(cs, pe[o + SUBS: o + 2 * SUBS],
                                         axis=1)
                picks.append(ue - us)
            ys.append(_roll_subs(_tree_sum(picks), d))
    elif wide_scatter:
        def wide_gather(idx):
            if sb8 <= 64:
                return jnp.take_along_axis(csum, idx, axis=1)
            return jnp.concatenate(
                [jnp.take_along_axis(csum[o: o + 64], idx[o: o + 64],
                                     axis=1)
                 for o in range(0, sb8, 64)], axis=0)

        for t in range(rounds):
            base = t * 3 * sb8
            ue = wide_gather(pe[base: base + sb8])
            us = wide_gather(pe[base + sb8: base + 2 * sb8])
            diff = ue - us
            for s in range(s_batch):
                o = base + 2 * sb8 + s * SUBS
                ys.append(jnp.take_along_axis(
                    diff[s * SUBS:(s + 1) * SUBS], pe[o: o + SUBS],
                    axis=0))
    else:
        for t in range(rounds):
            base = t * 3 * sb8
            for s in range(s_batch):
                cs = csum[s * SUBS:(s + 1) * SUBS]
                o = base + s * SUBS
                ue = jnp.take_along_axis(cs, pe[o: o + SUBS], axis=1)
                us = jnp.take_along_axis(cs, pe[sb8 + o: sb8 + o + SUBS],
                                         axis=1)
                ys.append(jnp.take_along_axis(
                    ue - us, pe[2 * sb8 + o: 2 * sb8 + o + SUBS], axis=0))
    y = _tree_sum(ys)

    @pl.when(cfirst[i] == 1)
    def _():
        out_ref[...] = y

    @pl.when(cfirst[i] == 0)
    def _():
        out_ref[...] += y


def _stream_kernel2(sbase, sbase2, cw, cfirst, sactive,  # scalar prefetch
                    *refs, s_batch: int, rounds: int, acc_dtype,
                    has_prev: bool = False, interpret: bool = False,
                    span_rows: int = SPAN_ROWS, dual: bool = False,
                    scatter: str = "rounds"):
    """Fused 2-RHS stream step (f32): the slab decode, x staging loops'
    index planes, val loads, round-plane reads, and the step machinery
    are shared across both right-hand sides; the two contribution
    stacks ride ONE doubled MXU prefix call. Round-4 task 5 — the
    gathers themselves stay per-RHS (they index per-RHS csum data), so
    the win is the shared fixed work, measured on-chip."""
    i = pl.program_id(0)
    if has_prev:
        refs = refs[:-4] + refs[-2:]
    xa_ref, xb_ref, ltri_ref, val_ref, vidx_ref, planes_ref = refs[:6]
    out_a, out_b = refs[-2:]

    @pl.when((sactive[i] == 0) & (cfirst[i] == 1))
    def _():
        out_a[...] = jnp.zeros_like(out_a)
        out_b[...] = jnp.zeros_like(out_b)

    @pl.when(sactive[i] == 1)
    def _():
        hmask = span_rows // 8 - 1
        ca, cb = [], []
        for s in range(s_batch):
            si = i * s_batch + s
            vidx = vidx_ref[s].astype(jnp.int32)
            lo = vidx & (LANES - 1)
            hi3 = (vidx >> 7) & hmask

            def stage(xref):
                span = xref[pl.ds(sbase[si], span_rows), :]
                xv = None
                for c in range(span_rows // 8):
                    tk = jnp.take_along_axis(
                        span[c * SUBS:(c + 1) * SUBS], lo, axis=1)
                    xv = tk if xv is None else jnp.where(hi3 == c, tk,
                                                         xv)
                if dual:
                    spanb = xref[pl.ds(sbase2[si], span_rows), :]
                    xvb = None
                    for c in range(span_rows // 8):
                        tk = jnp.take_along_axis(
                            spanb[c * SUBS:(c + 1) * SUBS], lo, axis=1)
                        xvb = (tk if xvb is None
                               else jnp.where(hi3 == c, tk, xvb))
                    xv = jnp.where((vidx >> 13) == 1, xvb, xv)
                return xv.astype(acc_dtype)

            va = val_ref[s].astype(acc_dtype)
            ca.append(va * stage(xa_ref))
            cb.append(va * stage(xb_ref))
        cstack = jnp.concatenate(ca + cb, axis=0)     # (2*8S, 128)
        dnums = (((1,), (0,)), ((), ()))
        if interpret:
            csum = jnp.cumsum(cstack, axis=1)
        else:
            lt = ltri_ref[...].astype(jnp.bfloat16)
            c_hi = cstack.astype(jnp.bfloat16)
            c_lo = (cstack - c_hi.astype(acc_dtype)).astype(jnp.bfloat16)
            csum = (jax.lax.dot_general(c_hi, lt, dnums,
                                        preferred_element_type=acc_dtype)
                    + jax.lax.dot_general(
                        c_lo, lt, dnums,
                        preferred_element_type=acc_dtype))
        pe = planes_ref[0]
        sb8 = s_batch * SUBS
        csa, csb = csum[:sb8], csum[sb8:]
        ys_a, ys_b = [], []
        if scatter == "offs":
            picks_a = [[] for _ in range(SUBS)]
            picks_b = [[] for _ in range(SUBS)]
            for s in range(s_batch):
                base = s * OFFS_SLAB_ROWS
                pe_e = pe[base: base + SUBS]
                pe_s = pe[base + SUBS: base + 2 * SUBS]
                for cs, picks in ((csa, picks_a), (csb, picks_b)):
                    sl = cs[s * SUBS:(s + 1) * SUBS]
                    diff = (jnp.take_along_axis(sl, pe_e, axis=1)
                            - jnp.take_along_axis(sl, pe_s, axis=1))
                    for d in range(SUBS):
                        o = base + (2 + d) * SUBS
                        picks[d].append(jnp.take_along_axis(
                            diff, pe[o: o + SUBS], axis=1))
            ys_a = [_roll_subs(_tree_sum(pk), d)
                    for d, pk in enumerate(picks_a)]
            ys_b = [_roll_subs(_tree_sum(pk), d)
                    for d, pk in enumerate(picks_b)]
        elif scatter == "roll":
            for d in range(SUBS):
                pka, pkb = [], []
                for s in range(s_batch):
                    o = s * ROLL_SLAB_ROWS + 2 * SUBS * d
                    pe_e = pe[o: o + SUBS]
                    pe_s = pe[o + SUBS: o + 2 * SUBS]
                    for cs, pk in ((csa, pka), (csb, pkb)):
                        sl = cs[s * SUBS:(s + 1) * SUBS]
                        pk.append(jnp.take_along_axis(sl, pe_e, axis=1)
                                  - jnp.take_along_axis(sl, pe_s,
                                                        axis=1))
                ys_a.append(_roll_subs(_tree_sum(pka), d))
                ys_b.append(_roll_subs(_tree_sum(pkb), d))
        else:
            for t in range(rounds):
                base = t * 3 * sb8
                for s in range(s_batch):
                    o = base + s * SUBS
                    pe_e = pe[o: o + SUBS]
                    pe_s = pe[sb8 + o: sb8 + o + SUBS]
                    rsrc = pe[2 * sb8 + o: 2 * sb8 + o + SUBS]
                    for cs, ys in ((csa, ys_a), (csb, ys_b)):
                        sl = cs[s * SUBS:(s + 1) * SUBS]
                        ue = jnp.take_along_axis(sl, pe_e, axis=1)
                        us = jnp.take_along_axis(sl, pe_s, axis=1)
                        ys.append(jnp.take_along_axis(ue - us, rsrc,
                                                      axis=0))
        ya = _tree_sum(ys_a)
        yb = _tree_sum(ys_b)

        @pl.when(cfirst[i] == 1)
        def _():
            out_a[...] = ya
            out_b[...] = yb

        @pl.when(cfirst[i] == 0)
        def _():
            out_a[...] += ya
            out_b[...] += yb


def stream_class_call2(sc: StreamChunks, xa2d: jax.Array,
                       xb2d: jax.Array, n_windows: int,
                       interpret: bool = False, prev=None):
    """Run the stream class on TWO RHS vectors in one fused kernel
    (f32 only). Returns (ya, yb); `prev` is an optional (pa, pb) pair
    aliased in for the split heavy class."""
    S = sc.s_batch
    nsteps = sc.nsteps
    R = sc.span_rows
    def permute(x2d):
        if sc.xmap is not None:
            return jnp.take(x2d, sc.xmap, axis=0)
        if x2d.shape[0] % R:
            x2d = jnp.pad(x2d, [(0, R - x2d.shape[0] % R), (0, 0)])
        return (x2d.reshape(-1, SUBS, R // 8, LANES)
                .transpose(0, 2, 1, 3).reshape(-1, LANES))
    xa2d = permute(xa2d)
    xb2d = permute(xb2d)
    ospec = pl.BlockSpec(
        (SUBS, LANES),
        lambda i, sbase, sbase2, cw, cfirst, sactive: (0, cw[i]),
        memory_space=pltpu.VMEM)
    sb2 = sc.sbase2 if sc.sbase2 is not None else sc.sbase
    ltri = _tri(np.triu(np.ones((LANES, LANES), np.float32)))
    kernel = functools.partial(_stream_kernel2, s_batch=S,
                               rounds=sc.rounds, acc_dtype=jnp.float32,
                               has_prev=prev is not None,
                               interpret=interpret, span_rows=R,
                               dual=sc.dual, scatter=sc.scatter)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(nsteps,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),   # xa
            pl.BlockSpec(memory_space=pltpu.VMEM),   # xb
            pl.BlockSpec(memory_space=pltpu.VMEM),   # ltri
            _chunk_spec((SUBS, LANES), lead=S),      # val
            _chunk_spec((SUBS, LANES), lead=S),      # vidx
            _chunk_spec((sc.planes.shape[1], LANES), lead=1),  # planes
        ] + ([ospec, ospec] if prev is not None else []),
        out_specs=(ospec, ospec),
    )
    oshape = jax.ShapeDtypeStruct((SUBS, n_windows * LANES),
                                  jnp.float32)
    with _x32_trace():
        return pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=(oshape, oshape),
            input_output_aliases=({11: 0, 12: 1}
                                  if prev is not None else {}),
            interpret=interpret,
        )(sc.sbase, sb2, sc.cw, sc.cfirst, sc.sactive, xa2d, xb2d,
          ltri, sc.val, sc.vidx, sc.planes,
          *(tuple(prev) if prev is not None else ()))


def _pair_tree_sum(pairs):
    """Tree reduction of (hi, lo) double-f32 pairs: each combine is a
    Knuth two-sum on the hi parts with the error folded into lo — the
    parallel form of a compensated accumulation (exposes independent
    chains where a running Kahan sum would serialize)."""
    while len(pairs) > 1:
        nxt = []
        for k in range(0, len(pairs) - 1, 2):
            (h1, l1), (h2, l2) = pairs[k], pairs[k + 1]
            h, e = _two_sum(h1, h2)
            nxt.append((h, l1 + l2 + e))
        if len(pairs) % 2:
            nxt.append(pairs[-1])
        pairs = nxt
    return pairs[0]


def _shift_lanes(a, k):
    """Shift lanes right by k with zero fill (static k)."""
    return jnp.pad(a, [(0, 0), (k, 0)])[:, : a.shape[1]]


def _stream_step_df64(sbase, sbase2, cfirst, xh_ref, xl_ref, val_ref,
                      vlo_ref, vidx_ref, planes_ref, out_ref, out_lo_ref,
                      *, i, s_batch, rounds, interpret,
                      span_rows=SPAN_ROWS, dual=False,
                      scatter="rounds", scan_levels=-1, seg_ref=None):
    """Double-f32 stream step: the PLAN (slabs, round planes) is
    identical to f32; only the arithmetic changes —

    * values and x arrive as exact (hi, lo) f32 pairs;
    * per-entry products are Dekker-exact pairs (ph + pl ~ a*x to
      ~2^-48);
    * the lane prefix sum is a compensated Kogge-Stone scan (7 shifted
      two-sum levels) instead of the bf16 triangular MXU multiply — the
      matmul cannot carry the compensation;
    * boundary differences and the cross-round/slab reduction combine
      pairs with two-sums (_pair_tree_sum), and the window accumulation
      uses the compensated dual-output writeback (_write_out_df64).

    Covers the reference's double default for its very-sparse extracted
    matrix (common.h:12-14 + the CSR5 double templates,
    external/CSR5_cuda/anonymouslib_cuda.h:12).

    Under interpret=True the whole step runs in exact f64 instead:
    XLA:CPU fusion rewrites the compensated chain when its
    intermediates stay fusion-internal (observed round 3: ~1-ulp hi
    drift on a single-slab step that vanishes the moment csh is made a
    graph output), and interpret mode is the CPU oracle — the same
    policy as the f32 kernel's exact-cumsum interpret branch."""
    hmask = span_rows // 8 - 1

    def stage_pair(src_ref, lo, hi3, vidx, s):
        """Chunk-staged x from a slab's span(s) in `src_ref` — the
        dual arm stages the second span and selects by vidx bit 13."""
        si = i * s_batch + s
        span = src_ref[pl.ds(sbase[si], span_rows), :]
        xv = None
        for c in range(span_rows // 8):
            tk = jnp.take_along_axis(span[c * SUBS:(c + 1) * SUBS], lo,
                                     axis=1)
            xv = tk if xv is None else jnp.where(hi3 == c, tk, xv)
        if dual:
            spanb = src_ref[pl.ds(sbase2[si], span_rows), :]
            xvb = None
            for c in range(span_rows // 8):
                tk = jnp.take_along_axis(spanb[c * SUBS:(c + 1) * SUBS],
                                         lo, axis=1)
                xvb = tk if xvb is None else jnp.where(hi3 == c, tk, xvb)
            xv = jnp.where((vidx >> 13) == 1, xvb, xv)
        return xv

    if interpret:
        ys64 = jnp.zeros((SUBS, LANES), jnp.float64)
        pe = planes_ref[0]
        sb8 = s_batch * SUBS
        for s in range(s_batch):
            vidx = vidx_ref[s].astype(jnp.int32)
            lo = vidx & (LANES - 1)
            hi3 = (vidx >> 7) & hmask
            xh = stage_pair(xh_ref, lo, hi3, vidx, s)
            xl = stage_pair(xl_ref, lo, hi3, vidx, s)
            prod = ((val_ref[s].astype(jnp.float64)
                     + vlo_ref[s].astype(jnp.float64))
                    * (xh.astype(jnp.float64) + xl.astype(jnp.float64)))
            csum = jnp.cumsum(prod, axis=1)
            if scatter == "offs":
                base = s * OFFS_SLAB_ROWS
                ue = jnp.take_along_axis(csum, pe[base: base + SUBS],
                                         axis=1)
                us = jnp.take_along_axis(
                    csum, pe[base + SUBS: base + 2 * SUBS], axis=1)
                diff = ue - us
                for d in range(SUBS):
                    o = base + (2 + d) * SUBS
                    ys64 = ys64 + _roll_subs(
                        jnp.take_along_axis(diff, pe[o: o + SUBS],
                                            axis=1), d)
                continue
            if scatter == "roll":
                for d in range(SUBS):
                    o = s * ROLL_SLAB_ROWS + 2 * SUBS * d
                    ue = jnp.take_along_axis(csum, pe[o: o + SUBS],
                                             axis=1)
                    us = jnp.take_along_axis(
                        csum, pe[o + SUBS: o + 2 * SUBS], axis=1)
                    ys64 = ys64 + _roll_subs(ue - us, d)
                continue
            for t in range(rounds):
                o = t * 3 * sb8 + s * SUBS
                ue = jnp.take_along_axis(csum, pe[o: o + SUBS], axis=1)
                us = jnp.take_along_axis(csum, pe[sb8 + o: sb8 + o + SUBS],
                                         axis=1)
                ys64 = ys64 + jnp.take_along_axis(
                    ue - us, pe[2 * sb8 + o: 2 * sb8 + o + SUBS], axis=0)
        yh = ys64.astype(jnp.float32)
        yl = (ys64 - yh.astype(jnp.float64)).astype(jnp.float32)
        _write_out_df64(i, cfirst, yh, yl, out_ref, out_lo_ref)
        return
    chs, cls = [], []
    for s in range(s_batch):
        vidx = vidx_ref[s].astype(jnp.int32)
        lo = vidx & (LANES - 1)
        hi3 = (vidx >> 7) & hmask
        # chunk-staged x (see the "chunk" arm in _stream_step): rows of
        # the span are permuted to (chunk, window) order
        xh = stage_pair(xh_ref, lo, hi3, vidx, s)
        xl = stage_pair(xl_ref, lo, hi3, vidx, s)
        vh = val_ref[s]
        vl = vlo_ref[s]
        # Dekker-exact product pair: ph = fl(vh*xh), plo = error + cross
        a1, a2 = _x_split(vh)
        b1, b2 = _x_split(xh)
        ph = vh * xh
        plo = (((a1 * b1 - ph) + a1 * b2 + a2 * b1) + a2 * b2
               + vh * xl + vl * xh)
        chs.append(ph)
        cls.append(plo)
    csh = jnp.concatenate(chs, axis=0)      # (S*8, 128)
    csl = jnp.concatenate(cls, axis=0)

    if seg_ref is not None:
        # SEGMENTED compensated Kogge-Stone (round 5): plan-time bit
        # planes confine the scan to runs, so csum[run end] IS the run
        # sum pair — the rstart boundary gathers and the per-round
        # boundary two-sum disappear, and the depth shrinks from
        # log2(128) to ceil(log2(max run length)) for this class.
        mb = jnp.concatenate([seg_ref[s].astype(jnp.int32)
                              for s in range(s_batch)], axis=0)
        k = 1
        for lvl in range(scan_levels):
            m = ((mb >> lvl) & 1).astype(jnp.float32)
            rh = _shift_lanes(csh, k) * m
            rl = _shift_lanes(csl, k) * m
            csh, e = _two_sum(csh, rh)
            csl = csl + rl + e
            k *= 2
    else:
        # compensated Kogge-Stone inclusive scan along lanes
        k = 1
        while k < LANES:
            rh = _shift_lanes(csh, k)
            rl = _shift_lanes(csl, k)
            csh, e = _two_sum(csh, rh)
            csl = csl + rl + e
            k *= 2

    pe = planes_ref[0]
    sb8 = s_batch * SUBS
    ys = []
    if scatter == "offs":
        picks = [[] for _ in range(SUBS)]
        for s in range(s_batch):
            hsl = csh[s * SUBS:(s + 1) * SUBS]
            lsl = csl[s * SUBS:(s + 1) * SUBS]
            base = s * OFFS_SLAB_ROWS
            pe_e = pe[base: base + SUBS]
            pe_s = pe[base + SUBS: base + 2 * SUBS]
            ue_h = jnp.take_along_axis(hsl, pe_e, axis=1)
            us_h = jnp.take_along_axis(hsl, pe_s, axis=1)
            ue_l = jnp.take_along_axis(lsl, pe_e, axis=1)
            us_l = jnp.take_along_axis(lsl, pe_s, axis=1)
            dh, e = _two_sum(ue_h, -us_h)
            dl = (ue_l - us_l) + e
            for d in range(SUBS):
                o = base + (2 + d) * SUBS
                g = pe[o: o + SUBS]
                picks[d].append((jnp.take_along_axis(dh, g, axis=1),
                                 jnp.take_along_axis(dl, g, axis=1)))
        for d, pk in enumerate(picks):
            h, l = _pair_tree_sum(pk)
            ys.append((_roll_subs(h, d), _roll_subs(l, d)))
    elif scatter == "roll":
        for d in range(SUBS):
            picks = []
            for s in range(s_batch):
                hsl = csh[s * SUBS:(s + 1) * SUBS]
                lsl = csl[s * SUBS:(s + 1) * SUBS]
                o = s * ROLL_SLAB_ROWS + 2 * SUBS * d
                pe_e = pe[o: o + SUBS]
                if seg_ref is not None:
                    picks.append(
                        (jnp.take_along_axis(hsl, pe_e, axis=1),
                         jnp.take_along_axis(lsl, pe_e, axis=1)))
                    continue
                pe_s = pe[o + SUBS: o + 2 * SUBS]
                ue_h = jnp.take_along_axis(hsl, pe_e, axis=1)
                us_h = jnp.take_along_axis(hsl, pe_s, axis=1)
                ue_l = jnp.take_along_axis(lsl, pe_e, axis=1)
                us_l = jnp.take_along_axis(lsl, pe_s, axis=1)
                dh, e = _two_sum(ue_h, -us_h)
                picks.append((dh, (ue_l - us_l) + e))
            h, l = _pair_tree_sum(picks)
            ys.append((_roll_subs(h, d), _roll_subs(l, d)))
    else:
        for t in range(rounds):
            base = t * 3 * sb8
            for s in range(s_batch):
                hsl = csh[s * SUBS:(s + 1) * SUBS]
                lsl = csl[s * SUBS:(s + 1) * SUBS]
                o = base + s * SUBS
                pe_e = pe[o: o + SUBS]
                rsrc = pe[2 * sb8 + o: 2 * sb8 + o + SUBS]
                if seg_ref is not None:
                    # segmented scan: csum[end] is the run sum pair
                    dh = jnp.take_along_axis(hsl, pe_e, axis=1)
                    dl = jnp.take_along_axis(lsl, pe_e, axis=1)
                else:
                    pe_s = pe[sb8 + o: sb8 + o + SUBS]
                    ue_h = jnp.take_along_axis(hsl, pe_e, axis=1)
                    us_h = jnp.take_along_axis(hsl, pe_s, axis=1)
                    ue_l = jnp.take_along_axis(lsl, pe_e, axis=1)
                    us_l = jnp.take_along_axis(lsl, pe_s, axis=1)
                    dh, e = _two_sum(ue_h, -us_h)
                    dl = (ue_l - us_l) + e
                ys.append((jnp.take_along_axis(dh, rsrc, axis=0),
                           jnp.take_along_axis(dl, rsrc, axis=0)))
    yh, yl = _pair_tree_sum(ys)
    _write_out_df64(i, cfirst, yh, yl, out_ref, out_lo_ref)


def stream_class_call(sc: StreamChunks, x2d128: jax.Array, n_windows: int,
                      interpret: bool = False, prev=None) -> jax.Array:
    """Run the entry-level stream class; returns y (8, n_windows*128)
    where window w's row (q*128 + j) lives at [q, w*128 + j] — a
    (hi, lo) f32 pair of such planes when the class is double-f32.
    `prev`: the base class's output when `sc` is the heavy half of a
    split pair (stream_plan.split_stream_chunks) — aliased into this
    call's output; window sets are disjoint, so unvisited blocks pass
    prev through untouched."""
    S = sc.s_batch
    nsteps = sc.nsteps
    R = sc.span_rows
    if sc.xmap is not None:
        # free-placement class: gather each slab's 8 arbitrary x blocks
        # into a per-slab span copy at the XLA level (xmap rows already
        # emit the (chunk, window) order the kernel expects); the
        # kernel then runs the plain mono span-64 path with
        # sbase = slab * 64
        x2d128 = jnp.take(x2d128, sc.xmap, axis=0)
    elif STREAM_VARIANT["xg"] == "chunk" or sc.df64 or R != SPAN_ROWS:
        # permute rows within each R-row span from (window, chunk) to
        # (chunk, window) order — one small XLA transpose per call; the
        # kernel then reads every chunk as a static (8,128) slice
        if x2d128.shape[0] % R:
            x2d128 = jnp.pad(
                x2d128, [(0, R - x2d128.shape[0] % R), (0, 0)])
        x2d128 = (x2d128.reshape(-1, SUBS, R // 8, LANES)
                  .transpose(0, 2, 1, 3).reshape(-1, LANES))
    ospec = pl.BlockSpec(
        (SUBS, LANES),
        lambda i, sbase, sbase2, cw, cfirst, sactive: (0, cw[i]),
        memory_space=pltpu.VMEM)
    # mono classes pass sbase twice (the kernel never reads sbase2;
    # one spec path either way)
    sb2 = sc.sbase2 if sc.sbase2 is not None else sc.sbase
    if sc.df64:
        xh = x2d128.astype(jnp.float32)
        xl = (x2d128 - xh.astype(jnp.float64)).astype(jnp.float32)
        # segmented scan only in the compiled path (the interpret
        # branch is the exact-f64 oracle and keeps the legacy
        # boundary-difference form, which the planes still carry)
        seg = (sc.segmask is not None and not interpret)
        kernel = functools.partial(_stream_kernel, s_batch=S,
                                   rounds=sc.rounds,
                                   acc_dtype=jnp.float32, df64=True,
                                   has_prev=prev is not None,
                                   interpret=interpret, span_rows=R,
                                   dual=sc.dual, scatter=sc.scatter,
                                   scan_levels=sc.scan_levels if seg
                                   else -1,
                                   has_segmask=seg)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=5,
            grid=(nsteps,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),   # x hi
                pl.BlockSpec(memory_space=pltpu.VMEM),   # x lo
                _chunk_spec((SUBS, LANES), lead=S),      # val hi
                _chunk_spec((SUBS, LANES), lead=S),      # val lo
                _chunk_spec((SUBS, LANES), lead=S),      # vidx
                _chunk_spec((sc.planes.shape[1], LANES), lead=1),
            ] + ([_chunk_spec((SUBS, LANES), lead=S)] if seg else [])
            + ([ospec, ospec] if prev is not None else []),
            out_specs=(ospec, ospec),
        )
        oshape = jax.ShapeDtypeStruct((SUBS, n_windows * LANES),
                                      jnp.float32)
        n_in = 11 + int(seg)
        # the interpret branch of _stream_step_df64 computes in exact
        # f64 (no Mosaic = no int64-index restriction), so trace it
        # with x64 left on
        ctx = (contextlib.nullcontext() if interpret else _x32_trace())
        with ctx:
            return pl.pallas_call(
                kernel,
                grid_spec=grid_spec,
                out_shape=(oshape, oshape),
                input_output_aliases=({n_in: 0, n_in + 1: 1}
                                      if prev is not None else {}),
                interpret=interpret,
            )(sc.sbase, sb2, sc.cw, sc.cfirst, sc.sactive, xh, xl,
              sc.val, sc.val_lo, sc.vidx, sc.planes,
              *((sc.segmask,) if seg else ()),
              *(tuple(prev) if prev is not None else ()))
    acc_dtype = (jnp.float32 if x2d128.dtype != jnp.float64
                 else jnp.float64)
    ltri = _tri(np.triu(np.ones((LANES, LANES), np.float32)))
    kernel = functools.partial(_stream_kernel, s_batch=S,
                               rounds=sc.rounds, acc_dtype=acc_dtype,
                               has_prev=prev is not None,
                               interpret=interpret, span_rows=R,
                               dual=sc.dual, scatter=sc.scatter)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(nsteps,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),   # x2d128
            pl.BlockSpec(memory_space=pltpu.VMEM),   # ltri
            _chunk_spec((SUBS, LANES), lead=S),      # val
            _chunk_spec((SUBS, LANES), lead=S),      # vidx
            _chunk_spec((sc.planes.shape[1], LANES), lead=1),  # planes
        ] + ([ospec] if prev is not None else []),
        out_specs=ospec,
    )
    with _x32_trace():
        return pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((SUBS, n_windows * LANES),
                                           acc_dtype),
            input_output_aliases={10: 0} if prev is not None else {},
            interpret=interpret,
        )(sc.sbase, sb2, sc.cw, sc.cfirst, sc.sactive, x2d128, ltri,
          sc.val, sc.vidx, sc.planes,
          *((prev,) if prev is not None else ()))


def x_to_panels(plan: LanePlan, x: jax.Array) -> jax.Array:
    """x as (n_panels, 16, PANEL_TC) transposed panels: [p, j, c] =
    x[p*PANEL_TC*16 + c*16 + j] (full-lane VMEM layout; one XLA transpose
    per call). For f64 x, returns (n_panels, 2, 16, PANEL_TC) f32 (hi,
    lo) panel pairs (hi + lo == x exactly)."""
    b = plan.tile_size
    x_pad = jnp.zeros(plan.x_padded_len, dtype=x.dtype).at[: plan.n].set(x)
    p = x_pad.reshape(plan.n_panels, PANEL_TC, b).transpose(0, 2, 1)
    if x.dtype != jnp.float64:
        return p
    hi = p.astype(jnp.float32)
    lo = (p - hi.astype(jnp.float64)).astype(jnp.float32)
    return jnp.stack([hi, lo], axis=1)


def spmv_pallas(plan: LanePlan, x: jax.Array,
                interpret: bool = False) -> jax.Array:
    """y = A @ x with the Pallas engines. Jittable."""
    x_panels = x_to_panels(plan, x)

    df64 = x.dtype == jnp.float64
    # Classes CHAIN: each call takes the previous class's y2dT through
    # input_output_aliasing and seeds its window outputs from it
    # in-kernel, so a multi-class plan pays zero XLA adds between
    # classes (verdict task 6: small-matrix glue floor).
    acc = None
    if plan.dense is not None:
        acc = dense_class_call(plan.dense, x_panels, plan.n_windows,
                               interpret=interpret, prev=acc)
    if plan.band is not None:
        acc = band_class_call(plan.band, x_panels, plan.n_windows,
                              interpret=interpret, prev=acc)
    for s in plan.sparses:
        acc = sparse_class_call(s, x_panels, plan.n_windows,
                                interpret=interpret, prev=acc)
    if acc is not None:
        if df64:
            # (hi, lo) pair: promote to f64 at the XLA level
            y2dt = (acc[0].astype(jnp.float64)
                    + acc[1].astype(jnp.float64))
        else:
            y2dt = acc
        y = y2dt.T.reshape(-1)  # (n_windows*RW*16,) global row order
    else:
        y = jnp.zeros(plan.y_padded_len, dtype=x.dtype)

    if plan.stream is not None:
        x_pad128 = (jnp.zeros(plan.x_padded_len128, dtype=x.dtype)
                    .at[: plan.n].set(x))
        nw2 = plan.n_stream_windows
        ys = stream_class_call(plan.stream, x_pad128.reshape(-1, 128), nw2,
                               interpret=interpret)
        if plan.stream2 is not None:
            # split heavy class: disjoint windows, writes into ys's
            # buffer through aliasing — no XLA merge needed
            ys = stream_class_call(plan.stream2,
                                   x_pad128.reshape(-1, 128), nw2,
                                   interpret=interpret, prev=ys)
        if plan.stream.df64:
            # (hi, lo) plane pair -> f64 at the XLA level
            ys = ys[0].astype(jnp.float64) + ys[1].astype(jnp.float64)
        # [q, w*128 + j] holds row w*1024 + q*128 + j
        ys_flat = ys.reshape(SUBS, nw2, LANES).transpose(1, 0, 2).reshape(-1)
        ln = max(y.shape[0], ys_flat.shape[0])
        y = (jnp.zeros(ln, ys_flat.dtype).at[: y.shape[0]].add(y)
             .at[: ys_flat.shape[0]].add(ys_flat))

    if plan.residual.val.shape[0]:
        contrib = plan.residual.val * x[plan.residual.col]
        y = y.at[plan.residual.row].add(contrib)
    return y[: plan.m].astype(x.dtype)
