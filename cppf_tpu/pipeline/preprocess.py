"""Jitted point-cloud preprocessing: jitter → voxel downsample → normals.

Mirrors the reference's per-instance preprocessing (reference
nocs/inference.py:131-142): random jitter of res/4 clipped at res/2, sparse
voxel quantisation at ``res``, then KNN normal estimation — but as one
on-device program over padded static shapes instead of
NumPy → MinkowskiEngine → Open3D round-trips.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from cppf_tpu.ops.normals import estimate_normals
from cppf_tpu.ops.quantize import voxel_downsample


class PreprocessedCloud(NamedTuple):
    pc: jnp.ndarray        # [M, 3] padded, valid prefix compacted to front
    normals: jnp.ndarray   # [M, 3]
    n_valid: jnp.ndarray   # int32
    valid_mask: jnp.ndarray  # [M] bool
    nbr_idx: jnp.ndarray   # [M, knn] KNN indices (reused by the encoders)
    raw_idx: jnp.ndarray   # [M] index of each kept point in the RAW input
                           # cloud (the reference's high_res_indices,
                           # nocs/inference.py:140; maps points back to the
                           # depth pixels they came from)


@partial(jax.jit, static_argnames=("npoint_pad", "knn", "jitter"))
def preprocess_cloud(
    rng: jax.Array,
    pc_raw: jnp.ndarray,
    n_raw,
    res,
    npoint_pad: int = 8192,
    knn: int = 60,
    jitter: bool = True,
) -> PreprocessedCloud:
    """pc_raw: [N_raw, 3] padded with anything beyond ``n_raw``."""
    n = pc_raw.shape[0]
    raw_mask = jnp.arange(n) < n_raw
    if jitter:
        res_f = jnp.asarray(res, pc_raw.dtype)
        noise = jnp.clip(
            res_f / 4 * jax.random.normal(rng, pc_raw.shape, pc_raw.dtype),
            -res_f / 2,
            res_f / 2,
        )
        pc_raw = pc_raw + noise
    # keep padding away from real voxels
    pc_masked = jnp.where(raw_mask[:, None], pc_raw, 1e6)
    sel, n_unique = voxel_downsample(pc_masked, res, raw_mask)
    n_keep = jnp.minimum(n_unique, npoint_pad)
    take = jnp.where(jnp.arange(npoint_pad) < n_keep, sel[:npoint_pad], 0)
    pc = pc_raw[take]
    valid = jnp.arange(npoint_pad) < n_keep
    pc = jnp.where(valid[:, None], pc, 0.0)
    from cppf_tpu.ops.knn import knn_indices

    # Geometry estimation is pinned to f32 matmuls unconditionally: the TPU
    # MXU's default bf16 multiplies perturb the KNN distance ordering and
    # the covariance eig inputs, i.e. the NORMALS themselves — measured as
    # the largest single contributor to the CPU-vs-TPU decode divergence
    # (sofa up: 55.9° with only the pose pipeline pinned vs 17.9° with
    # preprocessing pinned too; CPU reference 13.2°).  Cost is negligible
    # next to the pair stages.
    with jax.default_matmul_precision("float32"):
        nbr_idx = knn_indices(pc, knn, valid)
        normals = estimate_normals(pc, knn, valid, nbr_idx=nbr_idx)
    normals = jnp.where(valid[:, None], normals, 0.0)
    return PreprocessedCloud(pc, normals, n_keep.astype(jnp.int32), valid, nbr_idx,
                             take.astype(jnp.int32))


@partial(jax.jit, static_argnames=("npoint_pad", "knn", "jitter"))
def preprocess_cloud_batch(
    rngs: jax.Array,
    pcs_raw: jnp.ndarray,
    n_raws: jnp.ndarray,
    res,
    npoint_pad: int = 8192,
    knn: int = 60,
    jitter: bool = True,
) -> PreprocessedCloud:
    """Batched preprocessing: rngs [B,2] keys, pcs_raw [B,N,3], n_raws [B].

    One vmapped program per frame instead of the reference's serial
    per-instance NumPy→MinkowskiEngine→Open3D loop (nocs/inference.py:131-142).
    """

    def one(rng, pc, n):
        return preprocess_cloud(rng, pc, n, res, npoint_pad=npoint_pad,
                                knn=knn, jitter=jitter)

    return jax.vmap(one)(rngs, pcs_raw, n_raws)
