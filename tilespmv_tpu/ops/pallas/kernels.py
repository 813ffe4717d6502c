"""Pallas TPU kernels for the lane-major SpMV engines.

Two kernels, both built from the same three-stage pattern (see
lane_plan.py for the design rationale and the mapping from the reference's
warp-level CUDA kernels, tilespmv_cuda.h:394-792):

1. **x gather** — one dynamic contiguous copy stages the chunk's x span
   (SPAN_TC tile-columns, 8 KB) into VMEM scratch; a one-hot (SPAN_TC, T)
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

_B = 16  # tile edge; kernels are specialized to 16


def _gather_xg(i, cbase, x2d_ref, meta_ref, xs_scr, t: int, acc_dtype):
    """Stage the chunk's x span and build xg (16, T) via a one-hot MXU
    matmul."""
    xs_scr[...] = x2d_ref[pl.ds(cbase[i], SPAN_TC), :]      # (SPAN_TC, 16)
    xst = xs_scr[...].T.astype(acc_dtype)                   # (16, SPAN_TC)
    loc = meta_ref[0, META_XLOC]                            # (T,)
    iota = jax.lax.broadcasted_iota(jnp.int32, (SPAN_TC, t), 0)
    oh = jnp.where(loc[None, :] == iota, jnp.asarray(1.0, acc_dtype),
                   jnp.asarray(0.0, acc_dtype))
    return jnp.dot(xst, oh, preferred_element_type=acc_dtype)  # (16, T)


def _aggregate(i, cfirst, yc, meta_ref, out_ref, t: int, acc_dtype):
    """Accumulate the chunk result into its row-window output block."""
    lr = meta_ref[0, META_LROW]  # (T,)
    iota_r = jax.lax.broadcasted_iota(jnp.int32, (t, ROW_WINDOW), 1)
    ohr = jnp.where(lr[:, None] == iota_r, jnp.asarray(1.0, acc_dtype),
                    jnp.asarray(0.0, acc_dtype))
    yblk = jnp.dot(yc, ohr, preferred_element_type=acc_dtype)  # (16, RW)

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
                  *, t: int, acc_dtype):
    i = pl.program_id(0)
    xg = _gather_xg(i, cbase, x2d_ref, meta_ref, xs_scr, t, acc_dtype)
    # val is j-major: val[0, j] is the contiguous (16_i, T) slab of the
    # tiles' j-th columns
    yc = functools.reduce(
        lambda a, j: a + (val_ref[0, j].astype(acc_dtype)
                          * xg[j, :][None, :]),
        range(_B), jnp.zeros((_B, t), acc_dtype))
    _aggregate(i, cfirst, yc, meta_ref, out_ref, t, acc_dtype)


def _sparse_kernel(cbase, cw, cfirst,
                   x2d_ref, val_ref, meta_ref,
                   out_ref, xs_scr,
                   *, width: int, t: int, acc_dtype):
    i = pl.program_id(0)
    xg = _gather_xg(i, cbase, x2d_ref, meta_ref, xs_scr, t, acc_dtype)
    v = val_ref[0].astype(acc_dtype)                # (W, T)
    # unpack the (row<<4|col) bytes from meta words (4 slots per int32);
    # arithmetic shift then mask keeps byte 3 correct despite the sign bit
    rc = jnp.concatenate(
        [(meta_ref[0, META_RC0 + w // 4][None, :] >> ((w % 4) * 8)) & 255
         for w in range(width)], axis=0)            # (W, T)
    row = rc >> 4
    col = rc & 15
    # intra-tile x gather: 16-way select sum (one-hot over the x block)
    xv = jnp.zeros((width, t), acc_dtype)
    for k in range(_B):
        xv += jnp.where(col == k, xg[k, :][None, :],
                        jnp.asarray(0.0, acc_dtype))
    contrib = v * xv                                # (W, T)
    # intra-tile row reduce: 16-way masked sums
    rows = [jnp.sum(jnp.where(row == k, contrib,
                              jnp.asarray(0.0, acc_dtype)),
                    axis=0, keepdims=True)
            for k in range(_B)]
    yc = jnp.concatenate(rows, axis=0)              # (16, T)
    _aggregate(i, cfirst, yc, meta_ref, out_ref, t, acc_dtype)


def _grid_spec(nchunks, tensor_specs):
    return pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(nchunks,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] + tensor_specs,
        out_specs=pl.BlockSpec(
            (_B, ROW_WINDOW),
            lambda i, cbase, cw, cfirst: (0, cw[i]),
            memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((SPAN_TC, _B), jnp.float32),
        ],
    )


def _chunk_spec(shape_tail):
    """BlockSpec for a (nchunks, ...) operand: one chunk per grid step."""
    nd = len(shape_tail)
    return pl.BlockSpec(
        (1,) + shape_tail,
        lambda i, *refs: (i,) + (0,) * nd,
        memory_space=pltpu.VMEM)


def dense_class_call(d: DenseChunks, x2d: jax.Array, n_windows: int,
                     interpret: bool = False) -> jax.Array:
    """Run the dense-tile class; returns y2dT (16, n_windows*ROW_WINDOW)."""
    nchunks = d.val.shape[0]
    acc_dtype = jnp.float32 if x2d.dtype != jnp.float64 else jnp.float64
    kernel = functools.partial(_dense_kernel, t=d.t_lanes,
                               acc_dtype=acc_dtype)
    tensor_specs = [
        _chunk_spec((_B, _B, d.t_lanes)),     # val
        _chunk_spec((META_ROWS, d.t_lanes)),  # meta
    ]
    return pl.pallas_call(
        kernel,
        grid_spec=_grid_spec(nchunks, tensor_specs),
        out_shape=jax.ShapeDtypeStruct((_B, n_windows * ROW_WINDOW),
                                       acc_dtype),
        interpret=interpret,
    )(d.cbase, d.cw, d.cfirst, x2d, d.val, d.meta)


def sparse_class_call(s: SparseChunks, x2d: jax.Array, n_windows: int,
                      interpret: bool = False) -> jax.Array:
    """Run one sparse-entry class; returns y2dT (16, n_windows*RW)."""
    nchunks = s.val.shape[0]
    acc_dtype = jnp.float32 if x2d.dtype != jnp.float64 else jnp.float64
    kernel = functools.partial(_sparse_kernel, width=s.width, t=s.t_lanes,
                               acc_dtype=acc_dtype)
    tensor_specs = [
        _chunk_spec((s.width, s.t_lanes)),    # val
        _chunk_spec((META_ROWS, s.t_lanes)),  # meta (incl. packed rowcol)
    ]
    return pl.pallas_call(
        kernel,
        grid_spec=_grid_spec(nchunks, tensor_specs),
        out_shape=jax.ShapeDtypeStruct((_B, n_windows * ROW_WINDOW),
                                       acc_dtype),
        interpret=interpret,
    )(s.cbase, s.cw, s.cfirst, x2d, s.val, s.meta)


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

    if plan.residual.val.shape[0]:
        contrib = plan.residual.val * x_pad[plan.residual.col]
        y = y.at[plan.residual.row].add(contrib)
    return y[: plan.m].astype(x.dtype)
