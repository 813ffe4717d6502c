"""Pallas TPU kernels for the lane-major SpMV engines.

Two kernels, both built from the same three-stage pattern (see
lane_plan.py for the design rationale and the mapping from the reference's
warp-level CUDA kernels, tilespmv_cuda.h:394-792):

1. **x gather** — one dynamic contiguous copy stages the chunk's x span
   (SPAN_TC tile-columns, 16 KB f32) into VMEM scratch; a one-hot (SPAN_TC, T)
   selection matrix built from in-register compares multiplies it on the
   MXU to produce the per-tile x blocks xg (16, T). No per-element gathers.
2. **tile math** —
   * dense class: 16 full-width VPU FMA steps over (16, T) slabs
     (the densified 16x16 tile times its x block);
   * sparse class: per-slot packed (row<<4|col) decode with 16-way
     compare/select one-hot sums on the VPU (the intra-tile gather and
     row reduction of the reference's tile-CSR/COO device code,
     tilespmv_cuda.h:461-559, without shuffles).
3. **y aggregation** — the chunk's (16, T) result is multiplied by a
   (T, ROW_WINDOW) one-hot row matrix on the MXU and accumulated into the
   output row-window block, which stays VMEM-resident across the window's
   consecutive chunks (replaces atomicAdd, tilespmv_cuda.h:384-390).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .lane_plan import (META_LROW, META_RC0, META_ROWS, META_XLOC,
                        ROW_WINDOW, SPAN_TC, DenseChunks, LanePlan,
                        SparseChunks)
from .stream_plan import LANES, SUBS, RW_ROWS, StreamChunks

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


def _gather_xg(ci, cbase, x2d_ref, meta_ref, xs_scr, b, t: int, acc_dtype,
               interpret: bool = False):
    """Stage chunk `ci`'s x span and build xg (16, T) via a one-hot MXU
    matmul (`b` = slot within the step's batch)."""
    xs_scr[b * SPAN_TC:(b + 1) * SPAN_TC, :] = (
        x2d_ref[pl.ds(cbase[ci], SPAN_TC), :])              # (SPAN_TC, 16)
    xst = xs_scr[b * SPAN_TC:(b + 1) * SPAN_TC, :].T.astype(acc_dtype)
    loc = meta_ref[b, META_XLOC]                            # (T,)
    if interpret:
        # interpret-mode dots emulate the MXU with a downcast accumulator;
        # use an exact XLA gather instead
        return jnp.where(loc[None, :] >= 0,
                         jnp.take(xst, jnp.maximum(loc, 0), axis=1),
                         jnp.asarray(0.0, acc_dtype))
    iota = jax.lax.broadcasted_iota(jnp.int32, (SPAN_TC, t), 0)
    oh = jnp.where(loc[None, :] == iota, jnp.asarray(1.0, jnp.float32),
                   jnp.asarray(0.0, jnp.float32))
    return _split_dot(xst, oh, acc_dtype)                   # (16, T)


def _window_block(yc, meta_ref, b, t: int, acc_dtype,
                  interpret: bool = False):
    """Route a chunk result to its (16, ROW_WINDOW) output block."""
    lr = meta_ref[b, META_LROW]  # (T,)
    if interpret:
        return jnp.zeros((yc.shape[0], ROW_WINDOW), acc_dtype).at[:, lr].add(
            yc)
    iota_r = jax.lax.broadcasted_iota(jnp.int32, (t, ROW_WINDOW), 1)
    ohr = jnp.where(lr[:, None] == iota_r,
                    jnp.asarray(1.0, jnp.float32),
                    jnp.asarray(0.0, jnp.float32))
    return _split_dot(yc, ohr, acc_dtype)  # (16, RW)


def _write_out(i, cfirst, yblk, out_ref):
    @pl.when(cfirst[i] == 1)
    def _():
        out_ref[...] = yblk

    @pl.when(cfirst[i] == 0)
    def _():
        out_ref[...] += yblk


def _dense_kernel(cbase, cw, cfirst,               # scalar prefetch
                  x2d_ref, val_ref, meta_ref,      # inputs
                  out_ref,                         # output
                  xs_scr,                          # scratch
                  *, t: int, c_batch: int, acc_dtype,
                  interpret: bool = False):
    i = pl.program_id(0)
    blks = []
    for b in range(c_batch):
        xg = _gather_xg(i * c_batch + b, cbase, x2d_ref, meta_ref, xs_scr,
                        b, t, acc_dtype, interpret)
        # val is j-major: val[b, j] is the contiguous (16_i, T) slab of
        # the tiles' j-th columns
        yc = functools.reduce(
            lambda a, j: a + (val_ref[b, j].astype(acc_dtype)
                              * xg[j, :][None, :]),
            range(_B), jnp.zeros((_B, t), acc_dtype))
        blks.append(_window_block(yc, meta_ref, b, t, acc_dtype,
                                  interpret))
    _write_out(i, cfirst, _tree_sum(blks), out_ref)


def _sparse_kernel(cbase, cw, cfirst,
                   x2d_ref, val_ref, meta_ref,
                   out_ref, xs_scr,
                   *, width: int, t: int, c_batch: int, acc_dtype,
                   interpret: bool = False):
    i = pl.program_id(0)
    blks = []
    for b in range(c_batch):
        xg = _gather_xg(i * c_batch + b, cbase, x2d_ref, meta_ref, xs_scr,
                        b, t, acc_dtype, interpret)
        v = val_ref[b].astype(acc_dtype)            # (W, T)
        # unpack the (row<<4|col) bytes from meta words (4 slots per
        # int32); arithmetic shift then mask keeps byte 3 correct despite
        # the sign bit
        rc = jnp.concatenate(
            [(meta_ref[b, META_RC0 + w // 4][None, :] >> ((w % 4) * 8))
             & 255 for w in range(width)], axis=0)  # (W, T)
        row = rc >> 4
        col = rc & 15
        # intra-tile x gather: 16-way select sum (one-hot over x block)
        xv = jnp.zeros((width, t), acc_dtype)
        for k in range(_B):
            xv += jnp.where(col == k, xg[k, :][None, :],
                            jnp.asarray(0.0, acc_dtype))
        contrib = v * xv                            # (W, T)
        # intra-tile row reduce: 16-way masked sums
        rows = [jnp.sum(jnp.where(row == k, contrib,
                                  jnp.asarray(0.0, acc_dtype)),
                        axis=0, keepdims=True)
                for k in range(_B)]
        yc = jnp.concatenate(rows, axis=0)          # (16, T)
        blks.append(_window_block(yc, meta_ref, b, t, acc_dtype,
                                  interpret))
    _write_out(i, cfirst, _tree_sum(blks), out_ref)


def _grid_spec(nsteps, tensor_specs, x_dtype=jnp.float32,
               c_batch: int = 1):
    return pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(nsteps,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] + tensor_specs,
        out_specs=pl.BlockSpec(
            (_B, ROW_WINDOW),
            lambda i, cbase, cw, cfirst: (0, cw[i]),
            memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((c_batch * SPAN_TC, _B), x_dtype),
        ],
    )


def _chunk_spec(shape_tail, lead: int = 1):
    """BlockSpec for a (nchunks, ...) operand: `lead` chunks per grid
    step."""
    nd = len(shape_tail)
    return pl.BlockSpec(
        (lead,) + shape_tail,
        lambda i, *refs: (i,) + (0,) * nd,
        memory_space=pltpu.VMEM)


def dense_class_call(d: DenseChunks, x2d: jax.Array, n_windows: int,
                     interpret: bool = False) -> jax.Array:
    """Run the dense-tile class; returns y2dT (16, n_windows*ROW_WINDOW)."""
    nsteps = d.val.shape[0] // d.c_batch
    acc_dtype = jnp.float32 if x2d.dtype != jnp.float64 else jnp.float64
    kernel = functools.partial(_dense_kernel, t=d.t_lanes,
                               c_batch=d.c_batch,
                               acc_dtype=acc_dtype, interpret=interpret)
    tensor_specs = [
        _chunk_spec((_B, _B, d.t_lanes), lead=d.c_batch),     # val
        _chunk_spec((META_ROWS, d.t_lanes), lead=d.c_batch),  # meta
    ]
    return pl.pallas_call(
        kernel,
        grid_spec=_grid_spec(nsteps, tensor_specs, x2d.dtype, d.c_batch),
        out_shape=jax.ShapeDtypeStruct((_B, n_windows * ROW_WINDOW),
                                       acc_dtype),
        interpret=interpret,
    )(d.cbase, d.cw, d.cfirst, x2d, d.val, d.meta)


def sparse_class_call(s: SparseChunks, x2d: jax.Array, n_windows: int,
                      interpret: bool = False) -> jax.Array:
    """Run one sparse-entry class; returns y2dT (16, n_windows*RW)."""
    nsteps = s.val.shape[0] // s.c_batch
    acc_dtype = jnp.float32 if x2d.dtype != jnp.float64 else jnp.float64
    kernel = functools.partial(_sparse_kernel, width=s.width, t=s.t_lanes,
                               c_batch=s.c_batch,
                               acc_dtype=acc_dtype, interpret=interpret)
    tensor_specs = [
        _chunk_spec((s.width, s.t_lanes), lead=s.c_batch),    # val
        _chunk_spec((META_ROWS, s.t_lanes), lead=s.c_batch),  # meta
    ]
    return pl.pallas_call(
        kernel,
        grid_spec=_grid_spec(nsteps, tensor_specs, x2d.dtype, s.c_batch),
        out_shape=jax.ShapeDtypeStruct((_B, n_windows * ROW_WINDOW),
                                       acc_dtype),
        interpret=interpret,
    )(s.cbase, s.cw, s.cfirst, x2d, s.val, s.meta)


def _stream_kernel(sbase, cw, cfirst,               # scalar prefetch
                   x2d_ref, ltri_ref, val_ref, vidx_ref,
                   rend_ref, rstart_ref, rsrc_ref,   # inputs
                   out_ref,                          # output
                   span_scr,                         # scratch
                   *, rounds: int, s_batch: int, subwin_rows: int,
                   acc_dtype, interpret: bool = False):
    """One step = `s_batch` (8,128) entry slabs: hardware-gather x,
    prefix-sum by one batched matmul, boundary-gather scatter (see
    stream_plan.py module doc). Slab bodies are independent chains so
    Mosaic can interleave their gather latencies."""
    i = pl.program_id(0)
    span_rows = SUBS * subwin_rows
    for s in range(s_batch):
        span_scr[s * span_rows:(s + 1) * span_rows, :] = (
            x2d_ref[pl.ds(sbase[i * s_batch + s], span_rows), :])
    spans = span_scr[...]

    contribs = []
    for s in range(s_batch):
        span = spans[s * span_rows:(s + 1) * span_rows]
        vidx = vidx_ref[s].astype(jnp.int32)   # stored int16
        hi = vidx >> 7                         # [0, subwin_rows)
        lo = vidx & (LANES - 1)
        rows = []
        for w in range(SUBS):
            blk = span[subwin_rows * w: subwin_rows * (w + 1), :]
            low = jnp.broadcast_to(lo[w: w + 1],
                                   (subwin_rows, LANES))
            hiw = jnp.broadcast_to(hi[w: w + 1], (SUBS, LANES))
            u = jnp.take_along_axis(blk, low, axis=1)
            if subwin_rows == SUBS:
                vv = jnp.take_along_axis(u, hiw, axis=0)
            else:
                # sublane gathers are radix 8: select between halves
                h7 = hiw & 7
                va = jnp.take_along_axis(u[:SUBS], h7, axis=0)
                vb = jnp.take_along_axis(u[SUBS: 2 * SUBS], h7, axis=0)
                vv = jnp.where(hiw < SUBS, va, vb)
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
        # tpu.dynamic_gather consumes int8 indices directly
        rend = rend_ref[s]                        # (R*8, 128) int8
        rstart = rstart_ref[s]
        rsrc = rsrc_ref[s]
        for t in range(rounds):
            sl = slice(t * SUBS, (t + 1) * SUBS)
            ue = jnp.take_along_axis(cs, rend[sl], axis=1)
            us = jnp.take_along_axis(cs, rstart[sl], axis=1)
            ys.append(jnp.take_along_axis(ue - us, rsrc[sl], axis=0))
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
    kernel = functools.partial(_stream_kernel, rounds=sc.rounds,
                               s_batch=S, subwin_rows=sc.subwin_rows,
                               acc_dtype=acc_dtype,
                               interpret=interpret)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(nsteps,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),   # x2d128
            pl.BlockSpec(memory_space=pltpu.VMEM),   # ltri
            _chunk_spec((SUBS, LANES), lead=S),      # val
            _chunk_spec((SUBS, LANES), lead=S),      # vidx
            _chunk_spec((sc.rounds * SUBS, LANES), lead=S),   # rend
            _chunk_spec((sc.rounds * SUBS, LANES), lead=S),   # rstart
            _chunk_spec((sc.rounds * SUBS, LANES), lead=S),   # rsrc
        ],
        out_specs=pl.BlockSpec(
            (SUBS, LANES),
            lambda i, sbase, cw, cfirst: (0, cw[i]),
            memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((S * SUBS * sc.subwin_rows, LANES), x2d128.dtype),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((SUBS, n_windows * LANES), acc_dtype),
        interpret=interpret,
    )(sc.sbase, sc.cw, sc.cfirst, x2d128, ltri, sc.val, sc.vidx,
      sc.rend, sc.rstart, sc.rsrc)


def spmv_pallas(plan: LanePlan, x: jax.Array,
                interpret: bool = False) -> jax.Array:
    """y = A @ x with the Pallas engines. Jittable."""
    b = plan.tile_size
    x_pad = jnp.zeros(plan.x_padded_len, dtype=x.dtype).at[: plan.n].set(x)
    x2d = x_pad.reshape(-1, b)

    parts = []
    if plan.dense is not None:
        parts.append(dense_class_call(plan.dense, x2d, plan.n_windows,
                                      interpret=interpret))
    for s in plan.sparses:
        parts.append(sparse_class_call(s, x2d, plan.n_windows,
                                       interpret=interpret))
    if parts:
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
        contrib = plan.residual.val * x_pad[plan.residual.col]
        y = y.at[plan.residual.row].add(contrib)
    return y[: plan.m].astype(x.dtype)
