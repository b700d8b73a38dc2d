"""Pallas TPU kernel: fused sphere-bin axis counting.

Computes ``counts[s] = Σ_m [cand_m · sphere_s > cos_tol]`` — the axis-voting
histogram of reference nocs/inference.py:276-284 — as one kernel: each grid
step loads a block of candidate axes into VMEM, runs the [B,3]x[3,S] matmul
on the MXU, compares against the tolerance and accumulates the per-direction
counts into a VMEM scratch accumulator.  The [M,S] cosine matrix never exists
in HBM (the XLA version materialises one [chunk,S] block per step).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(cand_ref, sph_ref, tol_ref, out_ref, acc_ref):
    k = pl.program_id(0)

    @pl.when(k == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    cos = jnp.dot(cand_ref[:], sph_ref[:], preferred_element_type=jnp.float32)
    acc_ref[:] += jnp.sum((cos > tol_ref[0, 0]).astype(jnp.float32), axis=0, keepdims=True)

    @pl.when(k == pl.num_programs(0) - 1)
    def _done():
        out_ref[:] = acc_ref[:]


@partial(jax.jit, static_argnames=("block", "interpret"))
def sphere_bin_count_pallas(
    candidates: jnp.ndarray,
    sphere_pts: jnp.ndarray,
    cos_tol,
    block: int = 2048,
    interpret: bool = False,
) -> jnp.ndarray:
    """counts [S] of candidates within cos_tol of each sphere direction.

    candidates [M, 3] (rows beyond valid data must be zero vectors — their
    cosines are 0 < cos_tol and never count); sphere_pts [S, 3].
    """
    m = candidates.shape[0]
    s = sphere_pts.shape[0]
    s_pad = (s + 127) // 128 * 128
    m_pad = (m + block - 1) // block * block
    cand = jnp.pad(candidates.astype(jnp.float32), ((0, m_pad - m), (0, 0)))
    sph_t = jnp.pad(sphere_pts.astype(jnp.float32).T, ((0, 0), (0, s_pad - s)))
    tol = jnp.array([[cos_tol]], jnp.float32)

    grid = (m_pad // block,)
    out = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block, 3), lambda k: (k, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, s_pad), lambda k: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda k: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, s_pad), lambda k: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, s_pad), jnp.float32),
        scratch_shapes=[pltpu.VMEM((1, s_pad), jnp.float32)],
        interpret=interpret,
    )(cand, sph_t, tol)
    return out[0, :s]
