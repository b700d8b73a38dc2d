"""Fused Pallas kernels for the branch-and-bound center-vote peak.

The XLA formulation of :func:`cppf_tpu.ops.voting.ppf_vote_peak` materialises
per-chunk one-hot matrices ([grid_edge, chunk] f32) in HBM before each
projection matmul — ~10 GB of HBM traffic per 7.2M-vote workload, ~50 ms on a
v5e.  These kernels build the one-hots **in VMEM** and feed the MXU directly,
so HBM traffic drops to the vote coordinate vectors themselves (~200 MB).

Layout trick: every vote vector (floor coords fx/fy/fz, fractions rx/ry/rz,
weight w) is a flat [V] array; a block of C votes enters the kernel as a
[1, C] lane vector.  One-hot matrices are built **lane-major** ([rows, C]) by
broadcasting the [1, C] block against a [rows, C] row-iota — no transposes or
relayouts — and each projection is one ``dot_general`` contracting the lane
dim of both operands per C-vote chunk.

Semantics (identical to the XLA path, up to f32 summation order):

- ``bound_projections``: Mxy/Mxz/Myz 2D projections of the separable
  trilinear (or nearest) splat, with y/z columns pooled by static factors.
- ``refine_window``: exact fine-grid counts in a ``window``³ box at a
  dynamic window-aligned origin ``o`` (scalar-prefetched).

Replaces the accumulation of reference models/voting.py:31-63 for the peak
(argmax) consumer; oracle-tested against the XLA path in tests/test_pallas.py.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _hat_rows(f, r, w, rows: int, lo, pool: int, splat: str):
    """[rows, C] one-hot splat-weight matrix for one axis.

    f/r/w are [1, C] (int32/f32/f32); ``lo`` is subtracted from f (dynamic
    int32 scalar or 0); ``pool`` divides the row index (static).  For the
    trilinear splat the two hat nonzeros land on rows (f-lo)//pool and
    (f+1-lo)//pool with weights (1-r)·w and r·w; nearest is the rounded
    single-row case.
    """
    c = f.shape[1]
    row = jax.lax.broadcasted_iota(jnp.int32, (rows, c), 0)
    if splat == "nearest":
        n = jnp.where(r > 0.5, f + 1, f) - lo
        if pool > 1:
            n = n // pool
        return jnp.where(row == n, w, 0.0)
    d0 = f - lo
    d1 = d0 + 1
    if pool > 1:
        d0, d1 = d0 // pool, d1 // pool
    return (jnp.where(row == d0, (1.0 - r) * w, 0.0)
            + jnp.where(row == d1, r * w, 0.0))


def _bound_kernel(fx_r, fy_r, fz_r, rx_r, ry_r, rz_r, w_r, out_ref, *,
                  gx, gy, by_n, bz_n, pfy, pfz, rows_p, cols_p, splat, mxu_dtype):
    fx = fx_r[:].reshape(1, -1)
    fy = fy_r[:].reshape(1, -1)
    fz = fz_r[:].reshape(1, -1)
    rx = rx_r[:].reshape(1, -1)
    ry = ry_r[:].reshape(1, -1)
    rz = rz_r[:].reshape(1, -1)
    w = w_r[:].reshape(1, -1)
    one = jnp.ones_like(w)

    # rows: x one-hot (w-weighted) stacked over y one-hot (w-weighted)
    ax = _hat_rows(fx, rx, w, gx, 0, 1, splat)
    ay = _hat_rows(fy, ry, w, gy, 0, 1, splat)
    rows = jnp.concatenate([ax, ay], axis=0)
    rows = jnp.pad(rows, ((0, rows_p - gx - gy), (0, 0)))
    # cols: pooled y one-hot next to pooled z one-hot (unweighted)
    cy = _hat_rows(fy, ry, one, by_n, 0, pfy, splat)
    cz = _hat_rows(fz, rz, one, bz_n, 0, pfz, splat)
    cols = jnp.concatenate([cy, cz], axis=0)
    cols = jnp.pad(cols, ((0, cols_p - by_n - bz_n), (0, 0)))

    # precision pinned: these one-hot/trilinear operands are exact in bf16
    # (f32 accumulation via preferred_element_type); an ambient
    # default_matmul_precision("float32") (net/decode f32 mode) would
    # otherwise reach Mosaic as fp32-contract-on-bf16 — a compile error.
    m = jax.lax.dot_general(rows.astype(mxu_dtype), cols.astype(mxu_dtype),
                            (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32,
                            precision=jax.lax.Precision.DEFAULT)

    @pl.when(pl.program_id(0) == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    out_ref[:] += m


@partial(jax.jit, static_argnames=("gx", "gy", "by_n", "bz_n", "pfy", "pfz",
                                   "splat", "chunk", "interpret", "mxu_dtype"))
def bound_projections(fx, fy, fz, rx, ry, rz, w, *, gx: int, gy: int,
                      by_n: int, bz_n: int, pfy: int, pfz: int,
                      splat: str = "trilinear", chunk: int = 8192,
                      interpret: bool | None = None,
                      mxu_dtype: str = "float32"):
    """Projections (Mxy [gx,by_n], Mxz [gx,bz_n], Myz [gy,bz_n]) of the vote
    splat, y columns pooled by ``pfy`` and z by ``pfz``.  Inputs are flat [V]
    vote vectors (V a multiple of ``chunk``; padding votes must carry w=0,
    floors clipped to [0, g-2] as _vote_coords guarantees).

    ``mxu_dtype="bfloat16"`` feeds the MXU bf16 one-hot operands (f32
    accumulation) — ~4x the f32 matmul rate on v5e.  Entries then carry a
    relative error ≤ ~2^-7 from operand rounding; callers using the result
    as an upper bound must inflate it accordingly (see ppf_vote_peak).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    v = fx.shape[0]
    assert v % chunk == 0, (v, chunk)
    rows_p = _round_up(gx + gy, 8)
    cols_p = _round_up(by_n + bz_n, 128)
    spec = pl.BlockSpec((chunk,), lambda i: (i,), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        partial(_bound_kernel, gx=gx, gy=gy, by_n=by_n, bz_n=bz_n, pfy=pfy,
                pfz=pfz, rows_p=rows_p, cols_p=cols_p, splat=splat,
                mxu_dtype=jnp.dtype(mxu_dtype)),
        grid=(v // chunk,),
        in_specs=[spec] * 7,
        out_specs=pl.BlockSpec((rows_p, cols_p), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows_p, cols_p), jnp.float32),
        interpret=interpret,
    )(fx, fy, fz, rx, ry, rz, w)
    mxy = out[:gx, :by_n]
    mxz = out[:gx, by_n:by_n + bz_n]
    myz = out[gx:gx + gy, by_n:by_n + bz_n]
    return mxy, mxz, myz


def _refine_kernel(o_ref, fx_r, fy_r, fz_r, rx_r, ry_r, rz_r, w_r, out_ref,
                   *, w8, splat):
    fx = fx_r[:].reshape(1, -1)
    fy = fy_r[:].reshape(1, -1)
    fz = fz_r[:].reshape(1, -1)
    rx = rx_r[:].reshape(1, -1)
    ry = ry_r[:].reshape(1, -1)
    rz = rz_r[:].reshape(1, -1)
    w = w_r[:].reshape(1, -1)

    ax = _hat_rows(fx, rx, w, w8, o_ref[0], 1, splat)           # [w8, C]
    # column j of the [w8, w8*w8] window = (jy, jz) = (j // w8, j % w8):
    # build hat_y on j//w8 and hat_z on j%w8 directly at [w8*w8, C]
    c = fx.shape[1]
    jcol = jax.lax.broadcasted_iota(jnp.int32, (w8 * w8, c), 0)
    jy, jz = jcol // w8, jcol % w8

    def hat(f, r, lo, col):
        if splat == "nearest":
            n = jnp.where(r > 0.5, f + 1, f) - lo
            return jnp.where(col == n, 1.0, 0.0)
        d = f - lo
        return (jnp.where(col == d, 1.0 - r, 0.0)
                + jnp.where(col == d + 1, r, 0.0))

    ayz = hat(fy, ry, o_ref[1], jy) * hat(fz, rz, o_ref[2], jz)  # [w8*w8, C]

    m = jax.lax.dot_general(ax, ayz, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32,
                            precision=jax.lax.Precision.DEFAULT)

    @pl.when(pl.program_id(0) == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    out_ref[:] += m


@partial(jax.jit, static_argnames=("w8", "splat", "chunk", "interpret"))
def refine_window(o, fx, fy, fz, rx, ry, rz, w, *, w8: int = 16,
                  splat: str = "trilinear", chunk: int = 8192,
                  interpret: bool | None = None):
    """Exact fine counts in the ``w8``³ window at origin ``o`` ([3] int32,
    dynamic, window-aligned).  Returns [w8, w8*w8] (x rows; (y,z) columns
    flattened y-major), matching the XLA refine accumulation in
    ppf_vote_peak.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    v = fx.shape[0]
    assert v % chunk == 0, (v, chunk)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(v // chunk,),
        in_specs=[pl.BlockSpec((chunk,), lambda i, o_ref: (i,))] * 7,
        out_specs=pl.BlockSpec((w8, w8 * w8), lambda i, o_ref: (0, 0)),
    )
    return pl.pallas_call(
        partial(_refine_kernel, w8=w8, splat=splat),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((w8, w8 * w8), jnp.float32),
        interpret=interpret,
    )(jnp.asarray(o, jnp.int32), fx, fy, fz, rx, ry, rz, w)


def _dense_kernel(fx_r, fy_r, fz_r, rx_r, ry_r, rz_r, w_r, out_ref, *,
                  cz, px, py, pz, rows_p, col_tile, splat, mxu_dtype,
                  precision):
    fx = fx_r[:].reshape(1, -1)
    fy = fy_r[:].reshape(1, -1)
    fz = fz_r[:].reshape(1, -1)
    rx = rx_r[:].reshape(1, -1)
    ry = ry_r[:].reshape(1, -1)
    rz = rz_r[:].reshape(1, -1)
    w = w_r[:].reshape(1, -1)

    ax = _hat_rows(fx, rx, w, rows_p, 0, px, splat)              # [rows_p, C]
    # column j = jy * cz + jz over the pooled (y, z) plane; this program
    # handles the ``col_tile`` columns starting at program_id(0) * col_tile
    c = fx.shape[1]
    jcol = (pl.program_id(0) * col_tile
            + jax.lax.broadcasted_iota(jnp.int32, (col_tile, c), 0))
    jy, jz = jcol // cz, jcol % cz

    def hat(f, r, pool, col):
        if splat == "nearest":
            n = jnp.where(r > 0.5, f + 1, f)
            if pool > 1:
                n = n // pool
            return jnp.where(col == n, 1.0, 0.0)
        d0 = f
        d1 = f + 1
        if pool > 1:
            d0, d1 = d0 // pool, d1 // pool
        return (jnp.where(col == d0, 1.0 - r, 0.0)
                + jnp.where(col == d1, r, 0.0))

    ayz = hat(fy, ry, py, jy) * hat(fz, rz, pz, jz)              # [col_tile, C]

    m = jax.lax.dot_general(ax.astype(mxu_dtype), ayz.astype(mxu_dtype),
                            (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32,
                            precision=precision)

    @pl.when(pl.program_id(1) == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    out_ref[:] += m


@partial(jax.jit, static_argnames=("cx", "cy", "cz", "px", "py", "pz",
                                   "splat", "chunk", "interpret", "mxu_dtype",
                                   "precision"))
def dense_hist(fx, fy, fz, rx, ry, rz, w, *, cx: int, cy: int, cz: int,
               px: int = 1, py: int = 1, pz: int = 1,
               splat: str = "trilinear", chunk: int = 1024,
               interpret: bool | None = None,
               mxu_dtype: str = "float32",
               precision: str | None = None):
    """Dense (optionally pooled) vote histogram [cx, cy, cz] accumulated
    entirely in VMEM: per C-vote chunk, one x one-hot [cx, C] contracts a
    combined (y, z) one-hot [cy*cz, C] on the MXU (the VERDICT-r2 slab
    scheme, with the whole pooled plane as the slab).

    Inputs are flat [V] vote vectors (same contract as bound_projections:
    padding votes carry w=0, floors pre-clipped).  ``px/py/pz`` pool the
    axes by integer factors — the trilinear corner mass is pooled exactly
    (both hat corners land in their pooled cells), so the pooled histogram
    equals pool-summing the fine one.

    Cost is O(V · cy·cz) compare ops + O(V · cx·cy·cz / C) MXU MACs: right
    for instance-crop grids and pooled whole-frame grids (cy·cz up to a few
    thousand), NOT for unpooled whole-frame grids — pair that case with
    pooling + per-window fine passes (eval/zero_shot.py sparse mode).

    The (y,z) plane is tiled into ≤``col_tile`` column strips (grid dim 0,
    vote chunks inner on dim 1) so per-step VMEM stays ≤ ~4 MB whatever the
    plane size; each strip only compares against its own columns, so total
    compare work is plane-size-invariant — only the vote vectors are
    re-streamed from HBM per strip (7·V·4 bytes each).

    Precision: the TPU MXU computes f32 matmuls via bf16 passes at default
    precision, so even ``mxu_dtype="float32"`` carries ~2^-9 relative error
    vs the XLA scatter (measured 2e-3 max-rel on a 480k-vote grid) —
    irrelevant for heatmap consumers (proposal extraction thresholds).
    Pass ``precision="highest"`` for exact-f32 operand handling.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if precision is None:
        # pin like _bound_kernel/_refine_kernel: an ambient
        # default_matmul_precision("float32") (pose_f32 mode) with bf16
        # operands is a Mosaic compile error — these one-hot operands are
        # exact in bf16 anyway, so DEFAULT is the correct contract
        precision = jax.lax.Precision.DEFAULT
    v = fx.shape[0]
    assert v % chunk == 0, (v, chunk)
    cols = cy * cz
    assert cols <= 65536, f"pooled yz plane unreasonably large ({cy}x{cz})"
    rows_p = _round_up(cx, 8)
    cols_pp = _round_up(cols, 128)
    # strip width: keep the [col_tile, chunk] one-hot ≤ ~4 MB of VMEM
    col_tile = min(cols_pp, max(128, (1 << 20) // chunk // 128 * 128))
    n_tiles = -(-cols_pp // col_tile)
    cols_pp = n_tiles * col_tile
    spec = pl.BlockSpec((chunk,), lambda j, i: (i,), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        partial(_dense_kernel, cz=cz, px=px, py=py, pz=pz,
                rows_p=rows_p, col_tile=col_tile, splat=splat,
                mxu_dtype=jnp.dtype(mxu_dtype), precision=precision),
        grid=(n_tiles, v // chunk),
        in_specs=[spec] * 7,
        out_specs=pl.BlockSpec((rows_p, col_tile), lambda j, i: (0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows_p, cols_pp), jnp.float32),
        interpret=interpret,
    )(fx, fy, fz, rx, ry, rz, w)
    return out[:cx, :cols].reshape(cx, cy, cz)
