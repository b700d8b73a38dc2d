"""SPRIN point encoder and PPF pair head in flax.

Architecture parity targets in the reference (shapes/ops, not code):
- ``ResLayer``        reference models/model.py:8-31
- ``rifeat``          reference models/sprin.py:40-60 (6-d rotation-invariant
                      neighbourhood tuples)
- ``conv_kernel``     reference models/sprin.py:63-71 (Linear+LayerNorm+ReLU MLP)
- ``GlobalInfoProp``  reference models/sprin.py:74-83 (global max-pool concat)
- ``SparseSO3Conv``   reference models/sprin.py:86-107 (ranked kernel conv,
                      a PointConv-style ``einsum('nkr,nki->nri')`` — MXU-friendly)
- ``PointEncoder``    reference models/model.py:34-77
- ``PPFEncoder``      reference models/model.py:80-137

Design differences (TPU-first, not a translation):
- modules are unbatched ([N, ...]); vmap for batching.
- neighbourhoods are passed as precomputed index arrays (from
  ``cppf_tpu.ops.knn``) rather than a dense N² distance matrix argument, so
  the jitted pipeline can reuse one chunked KNN for normals + features.
- a ``valid_mask`` keeps padded points out of the global max-pool.
"""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp


class ResLayer(nn.Module):
    dim_out: int

    @nn.compact
    def __call__(self, x):
        h = nn.relu(nn.Dense(self.dim_out, name="fc1")(x))
        h = nn.Dense(self.dim_out, name="fc2")(h)
        if x.shape[-1] != self.dim_out:
            x = nn.Dense(self.dim_out, name="fc0")(x)
        return h + x


def rifeat(points_r: jnp.ndarray, points_s: jnp.ndarray) -> jnp.ndarray:
    """Rotation-invariant 6-tuples per (point, neighbour).

    points_r: [N, K, 3] neighbourhood; points_s: [N, 1, 3] evaluation point.
    Features: (|l1|, |l2|, |l3|, cosθ12, cosθ23, cosθ31) with
    l1 = mean(nbrs) − nbrs, l2 = nbrs − point, l3 = point − mean(nbrs).
    """
    r_mean = jnp.mean(points_r, -2, keepdims=True)
    l1 = r_mean - points_r
    l2 = points_r - points_s
    l3 = points_s - r_mean
    n1 = jnp.linalg.norm(l1, axis=-1, keepdims=True)
    n2 = jnp.linalg.norm(l2, axis=-1, keepdims=True)
    n3 = jnp.broadcast_to(jnp.linalg.norm(l3, axis=-1, keepdims=True), n2.shape)
    t1 = jnp.sum(l1 * l2, -1, keepdims=True) / (n1 * n2 + 1e-7)
    t2 = jnp.sum(l2 * l3, -1, keepdims=True) / (n2 * n3 + 1e-7)
    t3 = jnp.sum(l3 * l1, -1, keepdims=True) / (n3 * n1 + 1e-7)
    return jnp.concatenate([n1, n2, n3, t1, t2, t3], -1)


class ConvKernelMLP(nn.Module):
    """Linear→LayerNorm→ReLU stack ending in a plain Linear."""

    hidden: Sequence[int]
    out: int

    @nn.compact
    def __call__(self, x):
        for i, h in enumerate(self.hidden):
            x = nn.Dense(h, name=f"lin{i}")(x)
            x = nn.LayerNorm(name=f"ln{i}")(x)
            x = nn.relu(x)
        return nn.Dense(self.out, name="lin_out")(x)


class GlobalInfoProp(nn.Module):
    n_global: int

    @nn.compact
    def __call__(self, feat, valid_mask=None):
        tran = nn.Dense(self.n_global, name="linear")(feat)  # [N, g]
        if valid_mask is not None:
            tran = jnp.where(valid_mask[:, None], tran, -jnp.inf)
        glob = jnp.max(tran, -2, keepdims=True)
        glob = jnp.broadcast_to(glob, (*feat.shape[:-1], tran.shape[-1]))
        return jnp.concatenate([feat, glob], -1)


class SparseSO3Conv(nn.Module):
    rank: int
    n_out: int
    kernel_interns: Sequence[int]
    layer_norm: bool = True

    @nn.compact
    def __call__(self, feat_points, feat, eval_points):
        # feat_points: [N, K, 3]; feat: [N, K, Cin]; eval_points: [N, 3]
        r_inv_s = rifeat(feat_points, eval_points[:, None, :])
        kern = ConvKernelMLP(self.kernel_interns, self.rank, name="kernel")(r_inv_s)  # [N, K, rank]
        contracted = jnp.einsum("nkr,nki->nri", kern, feat)
        contracted = contracted.reshape(*contracted.shape[:-2], -1)  # [N, rank*Cin]
        out = nn.Dense(self.n_out, name="outnet")(contracted)
        if self.layer_norm:
            out = nn.LayerNorm(name="norm")(out)
        return out


class PointEncoder(nn.Module):
    """Per-point SPRIN features: [N, out_dim + out_dim//4].

    Neighbour features are (neighbour distance, normal cosine), like the
    reference; ``nbr_idx`` comes from ``cppf_tpu.ops.knn.knn_indices``.
    """

    spfcs: Sequence[int] = (32, 64, 32, 32)
    out_dim: int = 32
    num_layers: int = 1
    rank: int = 32

    @nn.compact
    def __call__(self, pc, pc_normal, nbr_idx, valid_mask=None):
        nbrs = pc[nbr_idx]                                   # [N, K, 3]
        centred = nbrs - pc[:, None, :]
        dist = jnp.linalg.norm(centred, axis=-1, keepdims=True)
        nrm_nbrs = pc_normal[nbr_idx]
        ncos = jnp.sum(nrm_nbrs * pc_normal[:, None, :], -1, keepdims=True)

        feat = SparseSO3Conv(self.rank, self.out_dim, self.spfcs, name="spconv0")(
            nbrs, jnp.concatenate([dist, ncos], -1), pc
        )
        feat = GlobalInfoProp(self.out_dim // 4, name="aggr0")(feat, valid_mask)
        for i in range(self.num_layers - 1):
            feat_nbrs = feat[nbr_idx]
            feat = SparseSO3Conv(self.rank, self.out_dim, self.spfcs, name=f"spconv{i+1}")(
                nbrs, feat_nbrs, pc
            )
            feat = GlobalInfoProp(self.out_dim // 4, name=f"aggr{i+1}")(feat, valid_mask)
        return feat


def ppf_tuple(pc, pc_normal, idxs):
    """4-d point-pair features (n_a·d̂, n_b·d̂, n_a·n_b, ‖d‖) for pairs."""
    a, b = idxs[:, 0], idxs[:, 1]
    d = pc[a] - pc[b]
    d_norm = jnp.linalg.norm(d, axis=-1)
    d_unit = d / (d_norm[:, None] + 1e-7)
    return jnp.concatenate(
        [
            jnp.sum(pc_normal[a] * d_unit, -1, keepdims=True),
            jnp.sum(pc_normal[b] * d_unit, -1, keepdims=True),
            jnp.sum(pc_normal[a] * pc_normal[b], -1, keepdims=True),
            d_norm[:, None],
        ],
        -1,
    )


class PPFEncoder(nn.Module):
    """Pair head: feat[a] ∥ feat[b] ∥ ppf(4) → residual MLP → out_dim logits.

    Output layout (reference train.py:68-75): translation bins [0 : 2B],
    up-angle bins [2B : 2B+R], right-angle bins [2B+R : 2B+2R], up-aux logit
    at −5, right-aux logit at −4, log-scale residual at [−3:].
    """

    ppffcs: Sequence[int] = (84, 32, 32, 16)
    out_dim: int = 2 * 32 + 2 * 36 + 2 + 3

    @nn.compact
    def __call__(self, pc, pc_normal, feat, idxs):
        x = jnp.concatenate(
            [feat[idxs[:, 0]], feat[idxs[:, 1]], ppf_tuple(pc, pc_normal, idxs)], -1
        )
        for i, dim in enumerate(self.ppffcs[1:]):
            x = ResLayer(dim, name=f"res{i}")(x)
        return nn.Dense(self.out_dim, name="final")(x)
