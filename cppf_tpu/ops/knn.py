"""K-nearest-neighbour search on TPU.

Replaces the reference's dense ``torch.cdist`` + ``torch.topk`` pattern
(reference ``train.py:61``, ``models/model.py:47``) and the KNN inside
Open3D's normal estimation (reference ``utils/util.py:61-65``).

Row-chunked so the full N×N distance matrix is never materialised: peak
memory is O(chunk × N) instead of O(N²).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax


def pairwise_dist(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Euclidean distances [M, N] between two point sets (MXU-friendly)."""
    sq = jnp.sum(a * a, -1)[:, None] + jnp.sum(b * b, -1)[None, :] - 2.0 * (a @ b.T)
    return jnp.sqrt(jnp.maximum(sq, 0.0))


@partial(jax.jit, static_argnames=("k", "chunk"))
def knn_indices(pc: jnp.ndarray, k: int, valid_mask: jnp.ndarray | None = None, chunk: int = 1024) -> jnp.ndarray:
    """Indices [N, k] of the k nearest points (self included, like torch.topk
    over a cdist matrix with largest=False).

    ``valid_mask`` (bool [N]) excludes padding points from being neighbours.
    N is padded internally to a multiple of ``chunk``.
    """
    n = pc.shape[0]
    n_pad = (n + chunk - 1) // chunk * chunk
    pc_pad = jnp.pad(pc, ((0, n_pad - n), (0, 0)))
    if valid_mask is None:
        col_penalty = jnp.where(jnp.arange(n_pad) < n, 0.0, jnp.inf)
    else:
        vm = jnp.pad(valid_mask, (0, n_pad - n), constant_values=False)
        col_penalty = jnp.where(vm, 0.0, jnp.inf)

    sq_all = jnp.sum(pc_pad * pc_pad, -1)

    def row_block(block: jnp.ndarray) -> jnp.ndarray:
        d2 = sq_all[None, :] - 2.0 * (block @ pc_pad.T) + jnp.sum(block * block, -1)[:, None]
        d2 = d2 + col_penalty[None, :]
        _, idx = lax.top_k(-d2, k)
        return idx

    blocks = pc_pad.reshape(n_pad // chunk, chunk, 3)
    idx = lax.map(row_block, blocks).reshape(n_pad, k)
    return idx[:n].astype(jnp.int32)
