"""The jitted training step.

Reference behaviour (train.py:37-94): Adam(lr=1e-3, weight_decay=1e-4,
L2-in-gradient), KLDiv on soft-binned tr/up(/right), BCE on aux bits, MSE on
log-scale; gradients flow through the PPF head *and* the point encoder (the
N² distance matrix itself is non-differentiable input).

TPU design: one jitted step over a *batch* of instances (vmap over the
reference's enforced batch_size=1), shardable over a ("data", "pair") mesh —
batch dim on data, pair dim on pair; XLA inserts the grad all-reduce.
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Any, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax

from cppf_tpu.config import Config
from cppf_tpu.models.encoders import PointEncoder, PPFEncoder
from cppf_tpu.ops.knn import knn_indices
from cppf_tpu.train.losses import ppf_losses, ppf_regression_losses


class Batch(NamedTuple):
    pc: jnp.ndarray           # [B, N, 3]
    normals: jnp.ndarray      # [B, N, 3]
    n_valid: jnp.ndarray      # [B]
    point_idxs: jnp.ndarray   # [B, P, 2]
    tr_prob: jnp.ndarray      # [B, P, 2, nb]   (cls_bins) or [B, P, 2] raw
    rot_prob: jnp.ndarray     # [B, P, 2, nr]   (cls_bins) or [B, P, 2] raw
    aux: jnp.ndarray          # [B, P, 2]
    scale_target: jnp.ndarray  # [B, 3]
    # |n_canon·axis| informativeness weights for the aux-bit BCE; None =
    # unweighted (the reference behaviour)
    aux_weight: Any = None    # [B, P, 2] or None
    # up-angle KL weights for articulated bodies (base_membership); None =
    # unweighted
    up_rot_weight: Any = None  # [B, P] or None


class TrainState(NamedTuple):
    params: Any               # {"point": ..., "ppf": ...}
    opt_state: Any
    step: jnp.ndarray


@dataclass(frozen=True)
class TrainStatics:
    tr_num_bins: int
    rot_num_bins: int
    regress_right: bool
    knn: int
    cls_bins: bool = True
    right_aux_boost: float = 1.0

    @classmethod
    def from_config(cls, cfg: Config):
        return cls(cfg.tr_num_bins, cfg.rot_num_bins, cfg.regress_right, cfg.knn,
                   cfg.cls_bins, cfg.right_aux_boost)


def make_optimizer(cfg: Config) -> optax.GradientTransformation:
    # torch.optim.Adam(weight_decay=wd) adds wd·θ to the gradient *before*
    # the moment updates — i.e. L2, not decoupled AdamW.
    return optax.chain(
        optax.add_decayed_weights(cfg.opt.weight_decay),
        optax.adam(cfg.opt.lr),
    )


def init_train_state(rng: jax.Array, cfg: Config, npoint_pad: int) -> TrainState:
    point_enc = PointEncoder(spfcs=(32, 64, 32, 32), out_dim=32, num_layers=1)
    ppf_enc = PPFEncoder(ppffcs=(84, 32, 32, 16), out_dim=cfg.out_dim)
    pc = jnp.zeros((npoint_pad, 3))
    nrm = jnp.zeros((npoint_pad, 3))
    nbr = jnp.zeros((npoint_pad, cfg.knn), jnp.int32)
    r1, r2 = jax.random.split(rng)
    p_point = point_enc.init(r1, pc, nrm, nbr)
    feat = point_enc.apply(p_point, pc, nrm, nbr)
    p_ppf = ppf_enc.init(r2, pc, nrm, feat, jnp.zeros((8, 2), jnp.int32))
    params = {"point": p_point, "ppf": p_ppf}
    tx = make_optimizer(cfg)
    return TrainState(params, tx.init(params), jnp.zeros((), jnp.int32))


def loss_fn(params, batch: Batch, statics: TrainStatics):
    point_enc = PointEncoder(spfcs=(32, 64, 32, 32), out_dim=32, num_layers=1)
    out_dim = (
        2 * statics.tr_num_bins + 2 * statics.rot_num_bins + 2 + 3
        if statics.cls_bins
        else 9
    )
    ppf_enc = PPFEncoder(ppffcs=(84, 32, 32, 16), out_dim=out_dim)

    def per_sample(pc, normals, n_valid, idxs, tr_prob, rot_prob, aux, st, aux_w, up_w):
        valid = jnp.arange(pc.shape[0]) < n_valid
        nbr = knn_indices(pc, statics.knn, valid)
        feat = point_enc.apply(params["point"], pc, normals, nbr, valid)
        preds = ppf_enc.apply(params["ppf"], pc, normals, feat, idxs)
        if statics.cls_bins:
            return ppf_losses(
                preds, tr_prob, rot_prob, aux, st,
                statics.tr_num_bins, statics.rot_num_bins, statics.regress_right,
                aux_weight=aux_w, up_rot_weight=up_w,
                right_aux_boost=statics.right_aux_boost,
            )
        return ppf_regression_losses(preds, tr_prob, rot_prob, aux, st,
                                     aux_weight=aux_w)

    totals, comps = jax.vmap(per_sample)(
        batch.pc, batch.normals, batch.n_valid, batch.point_idxs,
        batch.tr_prob, batch.rot_prob, batch.aux, batch.scale_target,
        batch.aux_weight, batch.up_rot_weight,
    )
    return jnp.mean(totals), jax.tree.map(jnp.mean, comps)


@partial(jax.jit, static_argnames=("statics", "tx"))
def train_step(
    state: TrainState, batch: Batch, statics: TrainStatics, tx: optax.GradientTransformation
) -> Tuple[TrainState, dict]:
    (_, comps), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params, batch, statics)
    updates, opt_state = tx.update(grads, state.opt_state, state.params)
    params = optax.apply_updates(state.params, updates)
    return TrainState(params, opt_state, state.step + 1), comps
