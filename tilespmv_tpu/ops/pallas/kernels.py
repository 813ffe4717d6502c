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

import functools

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
from .stream_plan import (LANES, SPAN_ROWS, SUBS, RW_ROWS, XBLOCK_ROWS,
                          StreamChunks)

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


def _gather_xg(panels, meta_ref, b, t: int, k_panels: int, acc_dtype):
    """Pick xg (16, T) — each tile's 16-value x block — with width-128
    hardware lane gathers over the step's `k_panels` pre-transposed
    (16, PANEL_TC) x panels. The panels arrive as pipeline-fetched block
    operands (scalar-prefetch index maps): dynamic in-kernel VMEM reads
    cost ~70 ns each on v5e, pipelined fetches are free. Exact in both
    compiled and interpret mode."""
    loc = jnp.maximum(meta_ref[b, META_XLOC], 0)            # (T,)
    ngrp = PANEL_TC // 128
    xgs = []
    for g0 in range(0, t, 128):
        idx = jnp.broadcast_to(loc[g0:g0 + 128][None, :], (_B, 128))
        out = None
        for k in range(k_panels):
            for h in range(ngrp):
                tk = jnp.take_along_axis(
                    panels[k][:, h * 128:(h + 1) * 128], idx & 127, axis=1)
                if out is None:
                    out = tk
                else:
                    out = jnp.where((idx >> 7) == k * ngrp + h, tk, out)
        xgs.append(out)
    return jnp.concatenate(xgs, axis=1) if len(xgs) > 1 else xgs[0]


def _window_block(yc, meta_ref, b, t: int, acc_dtype,
                  interpret: bool = False, exact3: bool = False):
    """Route a chunk result to its (16, ROW_WINDOW) output block.
    `exact3` uses the exact 3-way bf16 split (double-f32 paths)."""
    lr = meta_ref[b, META_LROW]  # (T,)
    if interpret:
        return jnp.zeros((yc.shape[0], ROW_WINDOW), acc_dtype).at[:, lr].add(
            yc)
    iota_r = jax.lax.broadcasted_iota(jnp.int32, (t, ROW_WINDOW), 1)
    ohr = jnp.where(lr[:, None] == iota_r,
                    jnp.asarray(1.0, jnp.float32),
                    jnp.asarray(0.0, jnp.float32))
    if exact3:
        return _split_dot3(yc, ohr)
    return _split_dot(yc, ohr, acc_dtype)  # (16, RW)


def _two_sum(a, b):
    """Knuth exact two-sum: returns (s, e) with s + e == a + b."""
    t = a + b
    bb = t - a
    return t, (a - (t - bb)) + (b - bb)


def _write_out_df64(i, cfirst, yh, yl, out_h_ref, out_l_ref):
    """Accumulate a (hi, lo) pair into the window outputs with a
    compensated hi add (plain f32 += of hi parts would throw away the
    double-f32 precision across chunks/steps)."""
    @pl.when(cfirst[i] == 1)
    def _():
        out_h_ref[...] = yh
        out_l_ref[...] = yl

    @pl.when(cfirst[i] == 0)
    def _():
        t, e = _two_sum(out_h_ref[...], yh)
        out_h_ref[...] = t
        out_l_ref[...] += yl + e


def _write_out(i, cfirst, yblk, out_ref):
    @pl.when(cfirst[i] == 1)
    def _():
        out_ref[...] = yblk

    @pl.when(cfirst[i] == 0)
    def _():
        out_ref[...] += yblk


def _dense_kernel(pb, cw, cfirst,                  # scalar prefetch
                  *refs,                     # panels, val, meta, out[,lo]
                  t: int, k_panels: int, c_batch: int, acc_dtype,
                  df64: bool = False, interpret: bool = False):
    panel_refs = refs[:k_panels]
    val_ref, meta_ref, out_ref = refs[k_panels: k_panels + 3]
    i = pl.program_id(0)
    if not df64:
        panels = [pr[0].astype(acc_dtype) for pr in panel_refs]
        blks = []
        for b in range(c_batch):
            xg = _gather_xg(panels, meta_ref, b, t, k_panels, acc_dtype)
            # val is j-major: val[b, j] is the contiguous (16_i, T) slab
            # of the tiles' j-th columns
            yc = functools.reduce(
                lambda a, j: a + (val_ref[b, j].astype(acc_dtype)
                                  * xg[j, :][None, :]),
                range(_B), jnp.zeros((_B, t), acc_dtype))
            blks.append(_window_block(yc, meta_ref, b, t, acc_dtype,
                                      interpret))
        _write_out(i, cfirst, _tree_sum(blks), out_ref)
        return
    # double-f32 (see _df64_mac); both accumulators are routed through
    # the window one-hot separately and leave through two outputs
    out_lo_ref = refs[-1]
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
    _write_out_df64(i, cfirst, wh, wl, out_ref, out_lo_ref)


def _sparse_kernel(pb, cw, cfirst,
                   *refs,      # panels, ltri, val, meta, out
                   width: int, t: int, k_panels: int, c_batch: int,
                   acc_dtype, interpret: bool = False):
    """Packed sparse-entry class: see module doc stage 2. Entry slots are
    row-sorted with slot 0 a reserved zero, so the 16 per-row sums are
    boundary differences of one inclusive prefix over slots."""
    panel_refs = refs[:k_panels]
    ltri_ref, val_ref, meta_ref, out_ref = refs[k_panels:]
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
        blks.append(_window_block(yc, meta_ref, b, t, acc_dtype,
                                  interpret))
    _write_out(i, cfirst, _tree_sum(blks), out_ref)


def _band_kernel(pb, cw, cfirst,
                 *refs,          # panels, val, bloc, out[, out_lo]
                 c_cols: int, k_panels: int, acc_dtype, df64: bool,
                 interpret: bool = False):
    """Brick class: lane = tile-row, so there is no index decode and no
    output routing — C x 16 pure FMA steps against static panel rows
    picked by one radix lane-gather per brick column block."""
    panel_refs = refs[:k_panels]
    val_ref, bloc_ref, out_ref = refs[k_panels: k_panels + 3]
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
        _write_out(i, cfirst, acc, out_ref)
        return
    # double-f32: panels carry (hi, lo) planes, A carries (a1, a2, vl)
    # parts, the hi/lo sums leave through two outputs
    out_lo_ref = refs[-1]
    panels_h = [pr[0, 0] for pr in panel_refs]
    panels_l = [pr[0, 1] for pr in panel_refs]
    sh = jnp.zeros((_B, T), jnp.float32)
    sm = jnp.zeros((_B, T), jnp.float32)
    cm = jnp.zeros((_B, T), jnp.float32)
    for cb in range(c_cols):
        xh = gather_xq(panels_h, cb)
        xl = gather_xq(panels_l, cb)
        b1, b2 = _x_split(xh)
        for j in range(_B):
            sh, sm, cm = _df64_mac(
                sh, sm, cm,
                val_ref[0, 3 * cb, j], val_ref[0, 3 * cb + 1, j],
                val_ref[0, 3 * cb + 2, j],
                b1[j, :][None, :], b2[j, :][None, :],
                xh[j, :][None, :], xl[j, :][None, :])
    _write_out_df64(i, cfirst, sh, sm, out_ref, out_lo_ref)


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
               df64: bool = False, n_out: int = 1):
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
                  + tensor_specs),
        out_specs=(ospec, ospec) if n_out == 2 else ospec,
    )


def _chunk_spec(shape_tail, lead: int = 1):
    """BlockSpec for a (nchunks, ...) operand: `lead` chunks per grid
    step."""
    nd = len(shape_tail)
    return pl.BlockSpec(
        (lead,) + shape_tail,
        lambda i, *refs: (i,) + (0,) * nd,
        memory_space=pltpu.VMEM)


def dense_class_call(d: DenseChunks, x_panels: jax.Array, n_windows: int,
                     interpret: bool = False):
    """Run the dense-tile class; returns y2dT (16, n_windows*ROW_WINDOW)
    — a (hi, lo) f32 pair when the class is double-f32."""
    kernel = functools.partial(_dense_kernel, t=d.t_lanes,
                               k_panels=d.k_panels, c_batch=d.c_batch,
                               acc_dtype=jnp.float32, df64=d.df64,
                               interpret=interpret)
    vrows = 3 * _B if d.df64 else _B
    tensor_specs = [
        _chunk_spec((vrows, _B, d.t_lanes), lead=d.c_batch),     # val
        _chunk_spec((DENSE_MROWS, d.t_lanes), lead=d.c_batch),   # meta
    ]
    nsteps = d.cw.shape[0]
    oshape = jax.ShapeDtypeStruct((_B, n_windows * ROW_WINDOW),
                                  jnp.float32)
    with _x32_trace():
        return pl.pallas_call(
            kernel,
            grid_spec=_grid_spec(nsteps, d.k_panels, tensor_specs,
                                 df64=d.df64, n_out=2 if d.df64 else 1),
            out_shape=(oshape, oshape) if d.df64 else oshape,
            interpret=interpret,
        )(d.pb, d.cw, d.cfirst, *([x_panels] * d.k_panels), d.val, d.meta)


def sparse_class_call(s: SparseChunks, x_panels: jax.Array,
                      n_windows: int,
                      interpret: bool = False) -> jax.Array:
    """Run one sparse-entry class; returns y2dT (16, n_windows*RW)."""
    acc_dtype = (jnp.float32 if x_panels.dtype != jnp.float64
                 else jnp.float64)
    mrows = sparse_meta_rows(s.width)
    kernel = functools.partial(_sparse_kernel, width=s.width, t=s.t_lanes,
                               k_panels=s.k_panels, c_batch=s.c_batch,
                               acc_dtype=acc_dtype, interpret=interpret)
    tensor_specs = [
        _chunk_spec((s.width, s.t_lanes), lead=s.c_batch),    # val
        _chunk_spec((mrows, s.t_lanes), lead=s.c_batch),      # meta
    ]
    ltri = jnp.asarray(np.tril(np.ones((s.width, s.width), np.float32)))
    nsteps = s.cw.shape[0]
    with _x32_trace():
        return pl.pallas_call(
            kernel,
            grid_spec=_grid_spec(nsteps, s.k_panels, tensor_specs,
                                 extra_vmem=1),
            out_shape=jax.ShapeDtypeStruct((_B, n_windows * ROW_WINDOW),
                                           acc_dtype),
            interpret=interpret,
        )(s.pb, s.cw, s.cfirst, *([x_panels] * s.k_panels), ltri, s.val,
          s.meta)


def band_class_call(bd: BandChunks, x_panels: jax.Array, n_windows: int,
                    interpret: bool = False):
    """Run the brick class; returns y2dT (16, n_windows*ROW_WINDOW) —
    a (hi, lo) f32 pair when the class is double-f32."""
    acc_dtype = jnp.float32
    kernel = functools.partial(_band_kernel, c_cols=bd.c_cols,
                               k_panels=bd.k_panels, df64=bd.df64,
                               acc_dtype=acc_dtype, interpret=interpret)
    nsteps = bd.cw.shape[0]
    vparts = 3 if bd.df64 else 1
    tensor_specs = [
        _chunk_spec((vparts * bd.c_cols, _B, _B, ROW_WINDOW),
                    lead=1),                                     # val
        _chunk_spec((1, ROW_WINDOW), lead=1),                    # bloc
    ]
    oshape = jax.ShapeDtypeStruct((_B, n_windows * ROW_WINDOW),
                                  jnp.float32)
    out_shape = (oshape, oshape) if bd.df64 else oshape
    with _x32_trace():
        return pl.pallas_call(
            kernel,
            grid_spec=_grid_spec(nsteps, bd.k_panels, tensor_specs,
                                 df64=bd.df64, n_out=2 if bd.df64 else 1),
            out_shape=out_shape,
            interpret=interpret,
        )(bd.pb, bd.cw, bd.cfirst, *([x_panels] * bd.k_panels), bd.val,
          bd.bloc)


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


def _stream_kernel(sbase, cw, cfirst, sactive,      # scalar prefetch
                   x2d_ref, ltri_ref, val_ref, vidx_ref, planes_ref,
                   out_ref,                          # output
                   *, s_batch: int, rounds: int, acc_dtype,
                   interpret: bool = False):
    """One step = `s_batch` (8,128) entry slabs: hardware-gather x per
    slab superspan, prefix-sum by one batched matmul, then 3-gather
    boundary-difference scatter rounds (see stream_plan.py module doc).
    Slab bodies are independent chains so Mosaic can interleave their
    gather latencies. Steps whose slabs are all empty (load-sorted
    padding) skip the whole body."""
    i = pl.program_id(0)

    @pl.when((sactive[i] == 0) & (cfirst[i] == 1))
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    @pl.when(sactive[i] == 1)
    def _():
        _stream_step(sbase, cfirst, x2d_ref, ltri_ref, val_ref, vidx_ref,
                     planes_ref, out_ref, i, s_batch=s_batch,
                     rounds=rounds, acc_dtype=acc_dtype,
                     interpret=interpret)


def _stream_step(sbase, cfirst, x2d_ref, ltri_ref, val_ref, vidx_ref,
                 planes_ref, out_ref, i, *, s_batch, rounds, acc_dtype,
                 interpret):
    contribs = []
    for s in range(s_batch):
        si = i * s_batch + s
        span = x2d_ref[pl.ds(sbase[si], SPAN_ROWS), :]   # (64, 128)
        vidx = vidx_ref[s].astype(jnp.int32)   # stored int16
        hi = (vidx >> 7) & 7                   # row-of-8 in the x window
        lo = vidx & (LANES - 1)
        # ONE (64,128) lane gather picks, for every window, all 8
        # candidate x rows at the entry's lane; a per-window sublane
        # gather then selects the entry's row (width-64 lane gathers are
        # native: R in {8,16,32,64})
        u64 = jnp.take_along_axis(span, jnp.repeat(lo, XBLOCK_ROWS,
                                                   axis=0), axis=1)
        rows = []
        for w in range(SUBS):
            u = u64[XBLOCK_ROWS * w: XBLOCK_ROWS * (w + 1), :]
            hiw = jnp.broadcast_to(hi[w: w + 1], (SUBS, LANES))
            vv = jnp.take_along_axis(u, hiw, axis=0)
            rows.append(vv[0:1])             # all rows equal
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
        csum = jax.lax.dot_general(cstack, ltri_ref[...], dnums,
                                   precision=jax.lax.Precision.HIGHEST,
                                   preferred_element_type=acc_dtype)

    ys = []
    for s in range(s_batch):
        cs = csum[s * SUBS:(s + 1) * SUBS]
        pe = planes_ref[s]                 # (R*24, 128) int8
        # 3 hardware gathers per round: run ends, run starts (lane
        # gathers of the prefix), then the rsrc sublane gather routes
        # each target row at its source's boundary difference
        # (tpu.dynamic_gather takes the int8 planes directly)
        for t in range(rounds):
            base = t * 3 * SUBS
            ue = jnp.take_along_axis(cs, pe[base: base + SUBS], axis=1)
            us = jnp.take_along_axis(cs, pe[base + SUBS: base + 2 * SUBS],
                                     axis=1)
            ys.append(jnp.take_along_axis(
                ue - us, pe[base + 2 * SUBS: base + 3 * SUBS], axis=0))
    y = _tree_sum(ys)

    @pl.when(cfirst[i] == 1)
    def _():
        out_ref[...] = y

    @pl.when(cfirst[i] == 0)
    def _():
        out_ref[...] += y


def stream_class_call(sc: StreamChunks, x2d128: jax.Array, n_windows: int,
                      interpret: bool = False) -> jax.Array:
    """Run the entry-level stream class; returns y (8, n_windows*128)
    where window w's row (q*128 + j) lives at [q, w*128 + j]."""
    S = sc.s_batch
    nsteps = sc.nsteps
    acc_dtype = (jnp.float32 if x2d128.dtype != jnp.float64
                 else jnp.float64)
    ltri = jnp.asarray(
        np.triu(np.ones((LANES, LANES), np.float32)).astype(acc_dtype))
    kernel = functools.partial(_stream_kernel, s_batch=S,
                               rounds=sc.rounds, acc_dtype=acc_dtype,
                               interpret=interpret)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(nsteps,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),   # x2d128
            pl.BlockSpec(memory_space=pltpu.VMEM),   # ltri
            _chunk_spec((SUBS, LANES), lead=S),      # val
            _chunk_spec((SUBS, LANES), lead=S),      # vidx
            _chunk_spec((sc.planes.shape[1], LANES), lead=S),  # planes
        ],
        out_specs=pl.BlockSpec(
            (SUBS, LANES),
            lambda i, sbase, cw, cfirst, sactive: (0, cw[i]),
            memory_space=pltpu.VMEM),
    )
    with _x32_trace():
        return pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((SUBS, n_windows * LANES),
                                           acc_dtype),
            interpret=interpret,
        )(sc.sbase, sc.cw, sc.cfirst, sc.sactive, x2d128, ltri, sc.val,
          sc.vidx, sc.planes)


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
    parts = []
    if plan.dense is not None:
        parts.append(dense_class_call(plan.dense, x_panels, plan.n_windows,
                                      interpret=interpret))
    if plan.band is not None:
        parts.append(band_class_call(plan.band, x_panels, plan.n_windows,
                                     interpret=interpret))
    for s in plan.sparses:
        parts.append(sparse_class_call(s, x_panels, plan.n_windows,
                                       interpret=interpret))
    if parts:
        if df64:
            # (hi, lo) pairs: promote to f64 at the XLA level
            y2dt = functools.reduce(
                jnp.add, [p[0].astype(jnp.float64)
                          + p[1].astype(jnp.float64) for p in parts])
        else:
            y2dt = functools.reduce(jnp.add, parts)
        y = y2dt.T.reshape(-1)  # (n_windows*RW*16,) global row order
    else:
        y = jnp.zeros(plan.y_padded_len, dtype=x.dtype)

    if plan.stream is not None:
        x_pad128 = (jnp.zeros(plan.x_padded_len128, dtype=x.dtype)
                    .at[: plan.n].set(x))
        nw2 = plan.n_stream_windows
        ys = stream_class_call(plan.stream, x_pad128.reshape(-1, 128), nw2,
                               interpret=interpret)
        # [q, w*128 + j] holds row w*1024 + q*128 + j
        ys_flat = ys.reshape(SUBS, nw2, LANES).transpose(1, 0, 2).reshape(-1)
        ln = max(y.shape[0], ys_flat.shape[0])
        y = (jnp.zeros(ln, ys_flat.dtype).at[: y.shape[0]].add(y)
             .at[: ys_flat.shape[0]].add(ys_flat))

    if plan.residual.val.shape[0]:
        contrib = plan.residual.val * x[plan.residual.col]
        y = y.at[plan.residual.row].add(contrib)
    return y[: plan.m].astype(x.dtype)
