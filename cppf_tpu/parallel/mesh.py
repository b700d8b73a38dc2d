"""Device-mesh utilities and pair-axis-sharded voting.

The reference has no distributed code at all (single GPU, batch_size=1,
Hydra multirun over categories as separate processes — SURVEY.md §2).  The
natural TPU scale-out axes for this workload are:

- **data** — instances/frames/categories are embarrassingly parallel;
- **pair** — the 100k–5M point pairs per instance are embarrassingly
  parallel, and the vote grid / sphere histogram are additive, so sharding
  the pair dimension and ``psum``-ing the accumulators over ICI is the
  communication pattern (the "ring-attention-shaped" component: blockwise
  accumulation so the full pair set never materialises on one chip).

All collectives live behind this module so single-chip paths stay
collective-free.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
PAIR_AXIS = "pair"


def _factor(n: int) -> Tuple[int, int]:
    """Split n devices into (data, pair) as square-ish as possible."""
    best = (1, n)
    for d in range(1, int(np.sqrt(n)) + 1):
        if n % d == 0:
            best = (d, n // d)
    return best


def make_mesh(n_devices: Optional[int] = None, shape: Optional[Tuple[int, int]] = None) -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    if shape is None:
        shape = _factor(len(devs))
    assert shape[0] * shape[1] == len(devs)
    arr = np.array(devs).reshape(shape)
    return Mesh(arr, (DATA_AXIS, PAIR_AXIS))


def shard_batch_spec() -> dict:
    """PartitionSpecs for a training Batch: batch dim over data, pair dim
    over pair, points replicated within a data shard."""
    return {
        "pc": P(DATA_AXIS),
        "normals": P(DATA_AXIS),
        "n_valid": P(DATA_AXIS),
        "point_idxs": P(DATA_AXIS, PAIR_AXIS),
        "tr_prob": P(DATA_AXIS, PAIR_AXIS),
        "rot_prob": P(DATA_AXIS, PAIR_AXIS),
        "aux": P(DATA_AXIS, PAIR_AXIS),
        "scale_target": P(DATA_AXIS),
    }


def named_sharding(mesh: Mesh, spec: P) -> NamedSharding:
    return NamedSharding(mesh, spec)


def _pad_halfspace(halfspace, pad: int):
    """Pad a per-pair halfspace tuple's arrays to the sharded pair count."""
    a_ref, n_ref, gate, margin = halfspace
    return (jnp.pad(a_ref, ((0, pad), (0, 0))),
            jnp.pad(n_ref, ((0, pad), (0, 0))),
            jnp.pad(gate, (0, pad)), margin)


def sharded_ppf_vote(
    mesh: Mesh,
    pc: jnp.ndarray,
    preds_tr: jnp.ndarray,
    probs: jnp.ndarray,
    point_idxs: jnp.ndarray,
    corner: jnp.ndarray,
    res: float,
    grid_dims: jnp.ndarray,
    grid_shape: Tuple[int, int, int],
    n_rots: int = 72,
    adaptive: bool = False,
    pair_mask: Optional[jnp.ndarray] = None,
    splat: str = "trilinear",
    halfspace=None,
) -> jnp.ndarray:
    """Pair-sharded center voting: each device accumulates votes for its pair
    shard into a local grid replica; one ``psum`` over the pair axis merges
    them (ICI all-reduce).  Bit-identical content to the single-device grid
    up to float add order.  ``halfspace`` (per-pair, see
    :func:`cppf_tpu.ops.voting._vote_coords`) shards with the pairs."""
    from functools import partial

    from jax import shard_map

    from cppf_tpu.ops.voting import ppf_vote

    n_shards = mesh.shape[PAIR_AXIS]
    p = point_idxs.shape[0]
    pad = (-p) % n_shards
    point_idxs = jnp.pad(point_idxs, ((0, pad), (0, 0)))
    preds_tr = jnp.pad(preds_tr, ((0, pad), (0, 0)))
    if pair_mask is None:
        pair_mask = jnp.ones((p,), bool)
    pair_mask = jnp.pad(pair_mask, (0, pad))
    hs_args, hs_specs = (), ()
    hs_margin = None
    if halfspace is not None:
        hs_a, hs_n, hs_gate, hs_margin = _pad_halfspace(halfspace, pad)
        hs_args = (hs_a, hs_n, hs_gate)
        hs_specs = (P(PAIR_AXIS),) * 3

    @partial(
        shard_map,
        mesh=mesh,
        check_vma=False,
        in_specs=(P(), P(PAIR_AXIS), P(), P(PAIR_AXIS), P(), P(), P(PAIR_AXIS))
        + hs_specs,
        out_specs=P(),
    )
    def _vote(pc_, preds_tr_, probs_, idxs_, corner_, dims_, mask_, *hs_):
        hs = None if halfspace is None else (*hs_, hs_margin)
        local = ppf_vote(
            pc_, preds_tr_, probs_, idxs_, corner_, res, dims_, grid_shape,
            n_rots=n_rots, adaptive=adaptive, pair_mask=mask_, splat=splat,
            halfspace=hs,
        )
        return jax.lax.psum(local, PAIR_AXIS)

    return _vote(pc, preds_tr, probs, point_idxs, corner, grid_dims, pair_mask,
                 *hs_args)


def sharded_ppf_vote_peak(
    mesh: Mesh,
    pc: jnp.ndarray,
    preds_tr: jnp.ndarray,
    probs: jnp.ndarray,
    point_idxs: jnp.ndarray,
    corner: jnp.ndarray,
    res: float,
    grid_dims: jnp.ndarray,
    grid_shape: Tuple[int, int, int],
    n_rots: int = 72,
    adaptive: bool = False,
    pair_mask: Optional[jnp.ndarray] = None,
    splat: str = "trilinear",
    max_rounds: int = 0,
    halfspace=None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Pair-sharded branch-and-bound grid peak — the multi-device form of the
    production fast path (:func:`cppf_tpu.ops.voting.ppf_vote_peak`).

    Each device computes the bound projections and refine windows over its
    pair shard; both are **sums over votes**, so they merge with a ``psum``
    (injected via ``ppf_vote_peak``'s ``reduce_fn`` hook).  After each psum
    every device holds identical accumulators and therefore runs identical
    refine-loop control flow — no divergence, no gather of vote data.
    Matches the single-device peak up to f32 summation order.
    """
    from functools import partial

    from jax import shard_map

    from cppf_tpu.ops.voting import ppf_vote_peak

    n_shards = mesh.shape[PAIR_AXIS]
    p = point_idxs.shape[0]
    pad = (-p) % n_shards
    point_idxs = jnp.pad(point_idxs, ((0, pad), (0, 0)))
    preds_tr = jnp.pad(preds_tr, ((0, pad), (0, 0)))
    if pair_mask is None:
        pair_mask = jnp.ones((p,), bool)
    pair_mask = jnp.pad(pair_mask, (0, pad))
    hs_args, hs_specs = (), ()
    hs_margin = None
    if halfspace is not None:
        hs_a, hs_n, hs_gate, hs_margin = _pad_halfspace(halfspace, pad)
        hs_args = (hs_a, hs_n, hs_gate)
        hs_specs = (P(PAIR_AXIS),) * 3

    @partial(
        shard_map,
        mesh=mesh,
        check_vma=False,
        in_specs=(P(), P(PAIR_AXIS), P(), P(PAIR_AXIS), P(), P(), P(PAIR_AXIS))
        + hs_specs,
        out_specs=(P(), P()),
    )
    def _peak(pc_, preds_tr_, probs_, idxs_, corner_, dims_, mask_, *hs_):
        hs = None if halfspace is None else (*hs_, hs_margin)
        return ppf_vote_peak(
            pc_, preds_tr_, probs_, idxs_, corner_, res, dims_, grid_shape,
            n_rots=n_rots, adaptive=adaptive, pair_mask=mask_, splat=splat,
            max_rounds=max_rounds,
            reduce_fn=partial(jax.lax.psum, axis_name=PAIR_AXIS),
            halfspace=hs,
        )

    return _peak(pc, preds_tr, probs, point_idxs, corner, grid_dims, pair_mask,
                 *hs_args)
