"""Voxel-grid sparse quantisation (point-cloud downsampling).

Replaces MinkowskiEngine's C++/CUDA ``ME.utils.sparse_quantize(pc,
return_index=True, quantization_size=res)`` (reference call sites
``utils/dataset.py:218``, ``nocs/inference.py:140``,
``sunrgbd/inference.py:129``): keep one representative point per occupied
voxel of edge ``res``.

TPU version: static-shaped.  Voxel ids are linearised with data-derived
strides (exact, no hashing), sorted stably, and first occurrences compacted
to the front.  Host NumPy version returns variable-length indices.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def voxel_downsample_np(pc: np.ndarray, res: float) -> np.ndarray:
    """Host variant → indices of the first point in each occupied voxel,
    ordered by first occurrence."""
    v = np.floor(pc / res).astype(np.int64)
    # lexicographic unique on rows, keeping first occurrence
    order = np.lexsort((v[:, 2], v[:, 1], v[:, 0]))
    vs = v[order]
    new_vox = np.any(np.diff(vs, axis=0) != 0, axis=1)
    first_mask = np.concatenate([[True], new_vox])
    # within equal voxels keep smallest original index: lexsort is stable on
    # the implicit original order only if we add it as the last key
    order = np.lexsort((np.arange(len(v)), v[:, 2], v[:, 1], v[:, 0]))
    vs = v[order]
    new_vox = np.any(np.diff(vs, axis=0) != 0, axis=1)
    first_mask = np.concatenate([[True], new_vox])
    idx = order[first_mask]
    return np.sort(idx)


@partial(jax.jit, static_argnames=())
def voxel_downsample(pc: jnp.ndarray, res, valid_mask: jnp.ndarray | None = None):
    """Jitted variant.

    pc: [N, 3] (padded); returns (indices [N] int32, n_unique int32).  The
    first ``n_unique`` entries of ``indices`` are representative original
    indices in ascending order; the rest point at index 0 (mask downstream).
    """
    n = pc.shape[0]
    v = jnp.floor(pc / res).astype(jnp.int32)
    if valid_mask is None:
        valid_mask = jnp.ones((n,), dtype=bool)
    big = jnp.iinfo(jnp.int32).max
    vmin = jnp.min(jnp.where(valid_mask[:, None], v, big), axis=0)
    vmax = jnp.max(jnp.where(valid_mask[:, None], v, -big), axis=0)
    c = v - vmin
    span = jnp.maximum(vmax - vmin + 1, 1)
    key = (c[:, 0] * span[1] + c[:, 1]) * span[2] + c[:, 2]
    key = jnp.where(valid_mask, key, big)

    order = jnp.argsort(key, stable=True)          # ascending; padding last
    key_sorted = key[order]
    first = jnp.concatenate([jnp.array([True]), key_sorted[1:] != key_sorted[:-1]])
    first = jnp.logical_and(first, key_sorted != big)
    n_unique = jnp.sum(first).astype(jnp.int32)

    # compact the selected original indices to the front, ascending
    sel = jnp.where(first, order, big)
    sel = jnp.sort(sel)
    sel = jnp.where(jnp.arange(n) < n_unique, sel, 0)
    return sel.astype(jnp.int32), n_unique
