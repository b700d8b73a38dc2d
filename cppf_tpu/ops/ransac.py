"""Fixed-iteration vectorised RANSAC plane segmentation.

Replaces Open3D's C++ ``PointCloud.segment_plane(distance_threshold,
ransac_n=3, num_iterations)`` (reference call sites
``utils/dataset.py:371-380`` for laptop lid/base labels and
``nocs/inference.py:169-172`` for the inference-time ``laptop_up`` axis).

All ``num_iterations`` candidate planes are evaluated at once: sample three
points per iteration, plane normal from the cross product, count inliers,
argmax, then one least-squares (PCA) refit on the winning inlier set — the
same overall contract as Open3D.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from cppf_tpu.ops.normals import _smallest_eigvec_3x3


@partial(jax.jit, static_argnames=("num_iterations",))
def segment_plane(
    rng: jax.Array,
    pc: jnp.ndarray,
    distance_threshold: float,
    num_iterations: int = 100,
    valid_mask: jnp.ndarray | None = None,
):
    """Returns (plane [4] with unit normal (a,b,c) and offset d such that
    a·x+b·y+c·z+d=0, inlier_mask [N] bool)."""
    n = pc.shape[0]
    if valid_mask is None:
        valid_mask = jnp.ones((n,), dtype=bool)
    n_valid = jnp.maximum(jnp.sum(valid_mask), 1)

    # sample 3 distinct-ish indices per iteration from the valid prefix;
    # valid points are assumed compacted to the front (our pipelines do so)
    u = jax.random.uniform(rng, (num_iterations, 3))
    idx = jnp.minimum((u * n_valid).astype(jnp.int32), n_valid - 1)
    p0, p1, p2 = pc[idx[:, 0]], pc[idx[:, 1]], pc[idx[:, 2]]
    nrm = jnp.cross(p1 - p0, p2 - p0)
    nrm = nrm / (jnp.linalg.norm(nrm, axis=-1, keepdims=True) + 1e-12)
    d = -jnp.sum(nrm * p0, -1)

    dist = jnp.abs(pc @ nrm.T + d[None, :])              # [N, I]
    inlier = jnp.logical_and(dist < distance_threshold, valid_mask[:, None])
    counts = jnp.sum(inlier, 0)
    best = jnp.argmax(counts)
    best_mask = inlier[:, best]

    # PCA refit on winning inliers (weighted covariance)
    w = best_mask.astype(pc.dtype)[:, None]
    cnt = jnp.maximum(jnp.sum(w), 3.0)
    mean = jnp.sum(pc * w, 0) / cnt
    centred = (pc - mean) * w
    cov = centred.T @ centred / cnt
    normal = _smallest_eigvec_3x3(cov)
    # keep orientation consistent with the RANSAC winner
    normal = normal * jnp.where(jnp.dot(normal, nrm[best]) < 0, -1.0, 1.0)
    plane = jnp.concatenate([normal, -jnp.sum(normal * mean)[None]])
    refined_mask = jnp.logical_and(
        jnp.abs(pc @ normal + plane[3]) < distance_threshold, valid_mask
    )
    return plane, refined_mask
