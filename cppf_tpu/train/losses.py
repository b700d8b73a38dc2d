"""Training losses.

Parity with reference train.py:77-87:
- KLDiv(reduction='batchmean') on soft-binned translation (2 components) and
  up/right angle distributions: mean over pairs of Σ_bins t·(log t − log q).
- BCEWithLogits on the two aux orientation bits.
- MSE on the 3-d log-scale residual (broadcast target over pairs).
"""
from __future__ import annotations

import jax.numpy as jnp


def kldiv_batchmean(log_q: jnp.ndarray, target: jnp.ndarray,
                    weight: jnp.ndarray | None = None) -> jnp.ndarray:
    """torch.nn.KLDivLoss(reduction='batchmean')(log_q, target): rows are the
    batch; 0·log0 = 0.  With ``weight`` ([rows]) a normalised weighted mean
    over rows (weights sum out, keeping the loss scale comparable)."""
    t = target
    pointwise = jnp.where(t > 0, t * (jnp.log(jnp.where(t > 0, t, 1.0)) - log_q), 0.0)
    if weight is None:
        return jnp.sum(pointwise) / t.shape[0]
    row = jnp.sum(pointwise, -1)
    return jnp.sum(weight * row) / jnp.maximum(jnp.sum(weight), 1e-6)


def bce_with_logits(logits: jnp.ndarray, target: jnp.ndarray,
                    weight: jnp.ndarray | None = None) -> jnp.ndarray:
    """BCEWithLogits; with ``weight`` a normalised weighted mean (weights sum
    out, so the loss scale stays comparable to the unweighted form)."""
    loss = jnp.maximum(logits, 0) - logits * target + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    if weight is None:
        return jnp.mean(loss)
    return jnp.sum(weight * loss) / jnp.maximum(jnp.sum(weight), 1e-6)


def mse(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean((pred - target) ** 2)


def ppf_losses(preds, tr_prob, rot_prob, aux, scale_target, tr_num_bins, rot_num_bins,
               regress_right: bool, aux_weight=None, up_rot_weight=None,
               right_aux_boost: float = 1.0):
    """Slice the head output (reference train.py:68-75) and compute all terms.

    preds: [P, out_dim]; tr_prob: [P,2,B]; rot_prob: [P,2,R]; aux: [P,2];
    scale_target: [3]; aux_weight: optional [P,2] per-pair informativeness
    weights for the orientation-bit BCEs (|n_canon·axis|; the reference's
    unweighted BCE trains the bit to chance on near-revolution bodies).
    ``right_aux_boost`` multiplies the right-bit BCE inside the total (the
    reported component stays the raw BCE so logs remain comparable): the
    right-sign task is ~0.7 of a ~9.0 total, and the probe on camera shows
    it learns but is gradient-starved (0.694→0.666 over 90 epochs) — no
    reference counterpart (its unweighted sum has the same starvation).
    Returns (total, dict of components).
    """
    import jax

    B, R = tr_num_bins, rot_num_bins
    preds_tr = preds[:, : 2 * B].reshape(-1, 2, B)
    preds_up = preds[:, 2 * B : 2 * B + R]
    preds_right = preds[:, 2 * B + R : 2 * B + 2 * R]
    preds_up_aux = preds[:, -5]
    preds_right_aux = preds[:, -4]
    preds_scale = preds[:, -3:]

    loss_tr = kldiv_batchmean(jax.nn.log_softmax(preds_tr[:, 0], -1), tr_prob[:, 0]) + \
        kldiv_batchmean(jax.nn.log_softmax(preds_tr[:, 1], -1), tr_prob[:, 1])
    loss_up = kldiv_batchmean(jax.nn.log_softmax(preds_up, -1), rot_prob[:, 0],
                              weight=up_rot_weight)
    w_up = aux_weight[:, 0] if aux_weight is not None else None
    loss_up_aux = bce_with_logits(preds_up_aux, aux[:, 0], w_up)
    loss_scale = mse(preds_scale, scale_target[None, :])

    total = loss_up + loss_tr + loss_up_aux + loss_scale
    comps = {
        "loss_tr": loss_tr,
        "loss_up": loss_up,
        "loss_up_aux": loss_up_aux,
        "loss_scale": loss_scale,
    }
    if regress_right:
        loss_right = kldiv_batchmean(jax.nn.log_softmax(preds_right, -1), rot_prob[:, 1])
        w_right = aux_weight[:, 1] if aux_weight is not None else None
        loss_right_aux = bce_with_logits(preds_right_aux, aux[:, 1], w_right)
        total = total + loss_right + right_aux_boost * loss_right_aux
        comps["loss_right"] = loss_right
        comps["loss_right_aux"] = loss_right_aux
    comps["loss"] = total
    return total, comps


def ppf_regression_losses(preds, tr_target, rot_target, aux, scale_target,
                          aux_weight=None):
    """Losses for the regression head variant (cls_bins=False; out_dim=9,
    reference nocs/zero_shot.ipynb cell 1, utils/dataset.py:232-243 guards).

    Layout: tr(2), rot(2), aux(2), scale(3).  The reference repo trains this
    variant outside the committed code; we use MSE on tr/rot (documented
    deviation).
    """
    loss_tr = mse(preds[:, :2], tr_target)
    loss_rot = mse(preds[:, 2:4], rot_target)
    loss_aux = bce_with_logits(preds[:, 4:6], aux, aux_weight)
    loss_scale = mse(preds[:, 6:9], scale_target[None, :])
    total = loss_tr + loss_rot + loss_aux + loss_scale
    return total, {
        "loss_tr": loss_tr,
        "loss_rot": loss_rot,
        "loss_aux": loss_aux,
        "loss_scale": loss_scale,
        "loss": total,
    }
