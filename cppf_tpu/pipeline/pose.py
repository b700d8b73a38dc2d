"""The fully-jitted 9D pose estimation program.

This is the TPU re-design of the reference's per-instance inference loop
(reference nocs/inference.py:174-339), which ping-pongs between torch-GPU,
NumPy and CuPy several times per instance.  Here the entire chain —

    KNN → SPRIN features → PPF pair head → bin decode (multinomial)
    → center vote grid → argmax → back-vote filter → axis voting on the
    sphere → aux sign disambiguation → R/T/S assembly

— is ONE jitted XLA program with static shapes; host code only feeds padded
point clouds and reads back a 9D pose.
"""
from __future__ import annotations

import contextlib
from dataclasses import dataclass
from functools import partial
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from cppf_tpu.config import Config
from cppf_tpu.core.geometry import assemble_rotation, fibonacci_sphere, orthonormal_right
from cppf_tpu.models.encoders import PointEncoder, PPFEncoder
from cppf_tpu.ops.knn import knn_indices
from cppf_tpu.ops.voting import (
    backvote,
    center_refine,
    grid_argmax,
    ppf_vote,
    ppf_vote_peak,
    rot_vote_sphere_count,
    sphere_bin_count,
)


@dataclass(frozen=True)
class PoseConfig:
    """Static (hashable) pipeline parameters — one jit specialisation each."""

    tr_num_bins: int = 32
    rot_num_bins: int = 36
    vote_range: Tuple[float, float] = (0.12, 0.12)
    scale_mean: Tuple[float, float, float] = (0.07, 0.03, 0.07)
    res: float = 4e-3
    knn: int = 60
    regress_right: bool = False
    z_right: bool = False
    up_sym: bool = False
    right_sym: bool = False
    num_rots: int = 72
    n_pairs: int = 100000
    rot_subsample: int = 10000
    angle_prec: float = 1.5
    adaptive_voting: bool = False
    grid_shape: Tuple[int, int, int] = (64, 64, 64)
    # "trilinear" = reference-exact 8-corner splat; "nearest" = fast mode
    splat: str = "trilinear"
    # "hier" = hierarchical exact peak (coarse bound + refine window, no
    # grid materialisation — the fast TPU path); "grid" = scatter-add the
    # full histogram then argmax (reference-shaped; needed only when the
    # heatmap itself is consumed, e.g. zero-shot proposals)
    center_mode: str = "hier"
    # refine-round cap for center_mode="hier" (0 = run to proven exactness);
    # converged models prove the bound in 1-2 rounds, so 2 gives the exact
    # argmax in production while bounding tail latency when votes are
    # diffuse (undertrained network — where the argmax is noise anyway)
    peak_rounds: int = 2
    # scale assembly multiplier: 2 for NOCS (reference nocs/inference.py:335),
    # 1 for SUN RGB-D (reference sunrgbd/inference.py:281)
    scale_multiplier: float = 2.0
    # Drop coplanar-indistinguishable pairs from voting (both normals
    # parallel and both perpendicular to the pair axis — the zero-shot
    # notebook's cell-6 filter, reference nocs/zero_shot.ipynb).  Such a
    # pair's vote circle passes through the true center AND its mirror
    # across the shared plane, so plane-dominated views (tables, beds seen
    # from above) split the center vote between the two symmetric peaks —
    # measured on SUN categories as meter-scale T errors even with a
    # GT-oracle network.  The reference's SUN driver does NOT filter
    # (sunrgbd/inference.py has no cell-6 analogue) and inherits the
    # ambiguity; this is a capability improvement over it.  The filter
    # gates the CENTER votes only: same-plane pairs are the bulk of the
    # angle-to-axis evidence on plane-dominated bodies (sofa A/B: filtering
    # them from the axis votes cost up 17.9→28.8° while the center-only
    # filter kept the T-lateral 158→96 mm win).
    filter_coplanar: bool = False
    # Half-space vote gating for coplanar-ambiguous pairs — the
    # vote-preserving alternative to filter_coplanar.  A same-plane pair's
    # vote circle passes through the true center AND its mirror across the
    # shared plane; dropping such pairs (filter_coplanar) starves the vote
    # on plane-dominated views, while keeping them splits the peak.  Here
    # they keep voting but only into the half-space BEHIND the observed
    # surface: every visible surface's outward normal faces the camera
    # (all drivers vote in a camera-at-origin frame), and the object
    # center lies behind the surface, so candidates with
    # (cand − a)·n̂_out > margin are exactly the mirror-side votes.  The
    # reference has no counterpart (its SUN driver inherits the mirror
    # ambiguity, sunrgbd/inference.py); measured on meter-scale furniture
    # where correlated plane-pair errors are the dominant T bias
    # (ROUND_NOTES session 7).  Takes precedence over filter_coplanar.
    coplanar_halfspace: bool = False
    # half-space slack in voxels (gates votes strictly outside the surface
    # plane by more than this; the true center of a thin body can sit
    # within a voxel of the plane itself)
    halfspace_margin: float = 2.0
    # Surface-patch-stratified pair sampling exponent α (0 = uniform, the
    # reference behaviour).  See :func:`sample_pair_indices`.
    pair_balance: float = 0.0
    # Pair-separation weighting exponent for the CENTER votes (0 = off, the
    # reference weights all pairs equally, models/voting.py:4-67).  Weight
    # each pair's votes by clip(sep / q75(sep), 0, 1)^α.  Rationale: dist2o
    # (center distance off the pair axis) is locally UNOBSERVABLE for a
    # short pair on a large flat region — the net regresses toward a prior
    # (measured round 5: bed scale-3.6 short-quartile pairs d2o bias
    # −947 mm vs long-quartile −139 mm; sofa/bed long pairs 2-4x lower MAD).
    # Noise cancels in the vote; this bias does not — it drags the peak
    # toward the visible surface (the furniture t_perp error).  Axis votes
    # are untouched (angle-to-axis is length-independent evidence).
    pair_sep_power: float = 0.0
    # Weight each pair's cone votes on the axis sphere by the confidence
    # (max softmax prob) of its predicted angle distribution.  On
    # near-revolution bodies most pairs' angle-to-right is azimuth-ambiguous
    # (the conditional is diffuse) and their uniform cone votes bury the few
    # handle/lens-anchored sharp votes; the reference counts all candidates
    # equally (nocs/inference.py:281-284) and inherits the failure.
    sharp_axis_votes: bool = False
    # Weight the aux-bit disambiguation BCE by |n_canon·axis|: a pair whose
    # canonicalised normal is near-perpendicular to the candidate axis has a
    # noise sign target (same argument as the train-side aux_weight,
    # core/targets.py), and 100k of those can out-vote the informative few.
    aux_align_weight: bool = False
    # Geometric right-axis focus for near-revolution bodies: after the center
    # peak and the up vote, score every point's radial protrusion about the
    # estimated up axis (core/targets.py::radial_asymmetry_about) and bias the
    # right-axis cone-vote subsample and aux disambiguation toward pairs that
    # touch the symmetry-breaking geometry (mug handle, camera lens).  Pairs
    # on the revolution wall cannot know the right angle from SE(3)-invariant
    # features (azimuth-ambiguous targets); the reference samples pairs
    # uniformly (nocs/inference.py:277-279) and inherits ~chance right axes
    # on these categories.  Purely inference-side, no retraining needed.
    asym_right_votes: bool = False
    # Second-pass center vote for near-revolution bodies with protruding
    # geometry: after the first center peak and the up vote, re-run the
    # center vote with per-point weights 0.05 + 0.95·radial_asymmetry —
    # wall pairs' dist2o predictions are azimuth-marginalised (the invariant
    # features cannot see which side the handle is on), which reads as
    # radius excess on the far wall and drags the peak 10-20 mm toward the
    # handle; handle-touching pairs see the azimuth and vote sharp.  Purely
    # inference-side; the reference has no second pass
    # (nocs/inference.py:199-214 votes once, uniformly).
    asym_center_refine: bool = False
    # Sub-voxel Gauss-Newton center solve on the back-vote survivors
    # (ops/voting.py::center_refine): removes the ~res/2 voxel-argmax
    # quantisation floor the reference accepts (nocs/inference.py:208-211).
    # Trust-region-clamped to 2·res and outlier-trimmed at the back-vote
    # tolerance, so it can only move within the peak's consistency band.
    subvoxel_refine: bool = False
    # Geometric right-axis SIGN for handle-bodied categories (mug): the
    # learned aux bit trains to ~chance on near-revolution families (the
    # reference inherits the same failure, nocs/inference.py:286-302), but
    # the handle's radial-asymmetry centroid direction ĥ fixes the sign
    # deterministically — the mug family's protrusion is canonically −z, so
    # right(+x) = ĥ × up.  Requires the unbiased (asym-refined) center:
    # with the handle-ward T bias the centroid direction inverts (session-5
    # failure, ROUND_NOTES).  Gates off when the protrusion is occluded
    # (falls back to the learned bit).
    geo_right_sign: bool = False
    # How the protrusion direction maps to the right axis: "cross" for
    # protrusion canonically perpendicular to right (mug handle at −z ⇒
    # right = ĥ × up), "direct" for protrusion canonically ALONG right
    # (table desk drawer pedestal at +x ⇒ right = ĥ).
    geo_right_dir: str = "cross"
    # Multi-hypothesis axis decode: take the top-K sphere-histogram peaks
    # (greedy 20° NMS so they are distinct directions, not neighbours of one
    # peak), score each ± by the aux-bit BCE over the surviving pairs, and
    # return the lowest-BCE hypothesis.  Plane-dominated bodies fail
    # bimodally with K=1: locally-planar pairs default to "90° to axis", so
    # views dominated by the WRONG plane lock the argmax onto that plane's
    # normal (sofa up = back normal in 4/12 poses, exactly 90° off; laptop
    # voting-only up 63.7° via lid/keyboard).  The aux logits were trained
    # against the TRUE axis, so the wrong-plane hypothesis scores a
    # distinctly worse BCE.  The reference takes the bare argmax
    # (nocs/inference.py:284) and inherits the flips.  K=1 = reference.
    axis_topk: int = 1
    # A weaker peak must beat the main peak's BCE AND hold at least this
    # fraction of its vote count to displace it (guards against low-count
    # noise directions winning on a noisy BCE).
    axis_topk_min_frac: float = 0.2
    # Gravity prior on the UP axis: gate the sphere histogram to directions
    # within this many degrees of ±up_prior_dir before the argmax (0 = off,
    # the reference behaviour).  Intended for the SUN RGB-D driver, whose
    # working frame is world-gravity-aligned (+y) because the reference's
    # own data plumbing applies Rtilt before storing clouds
    # (sunrgbd/inference.py:95-99) and every SUN GT box is gravity-aligned
    # by construction (eval.py:85-107 builds them from a heading angle
    # about world-up only).  The reference loads that metadata and then
    # ignores it at voting time — on plane-dominated furniture the
    # unconstrained argmax locks onto a wrong face normal (sofa: 4/12 views
    # exactly 90° off).  The sign still comes from the aux bit.
    up_prior_deg: float = 0.0
    up_prior_dir: Tuple[float, float, float] = (0.0, 1.0, 0.0)
    # Pin float32 matmul precision across the pose pipeline (network,
    # KNN, and the decode-half projections).  The TPU MXU's default bf16
    # multiplies tip near-tie axis decodes: sofa n=8 same checkpoint/seed,
    # TPU-default up 84.5° / right 47.9° vs f32 17.9°/14.9° — the f32 run
    # matches CPU almost bit-for-bit (T median identical at 188.8 mm).
    # Network-only pinning was measured insufficient (up 55.9°).  The
    # Pallas vote-hist dots pin their own DEFAULT precision (exact one-hot
    # operands), so this does not reach Mosaic.  CPU is unaffected.
    # "decode" (default): decode-half f32 only, network stays bf16 (see
    # _prec_net) — quality-equivalent per the round-5 A/B, ~6% faster.
    pose_f32: bool | str = "decode"

    @classmethod
    def from_config(cls, cfg: Config, n_pairs: Optional[int] = None, scale_multiplier: float = 2.0):
        g = cfg.resolved_grid_edge()
        return cls(
            tr_num_bins=cfg.tr_num_bins,
            rot_num_bins=cfg.rot_num_bins,
            vote_range=tuple(cfg.vote_range),
            scale_mean=tuple(cfg.scale_mean),
            res=cfg.res,
            knn=cfg.knn,
            regress_right=cfg.regress_right,
            z_right=cfg.z_right,
            up_sym=cfg.up_sym,
            right_sym=cfg.right_sym,
            num_rots=cfg.num_rots,
            n_pairs=n_pairs or cfg.infer_pairs,
            angle_prec=cfg.angle_prec,
            adaptive_voting=cfg.adaptive_voting,
            grid_shape=(g, g, g),
            scale_multiplier=scale_multiplier,
            filter_coplanar=cfg.filter_coplanar,
            coplanar_halfspace=cfg.coplanar_halfspace,
            pair_balance=cfg.pair_balance,
            pair_sep_power=cfg.pair_sep_power,
            sharp_axis_votes=cfg.sharp_axis_votes,
            aux_align_weight=cfg.aux_align_weight,
            asym_right_votes=cfg.asym_right_votes,
            asym_center_refine=cfg.asym_center_refine,
            subvoxel_refine=cfg.subvoxel_refine,
            geo_right_sign=cfg.geo_right_sign,
            geo_right_dir=cfg.geo_right_dir,
            axis_topk=cfg.axis_topk,
            pose_f32=cfg.pose_f32,
        )

    def sphere_points(self) -> np.ndarray:
        n = int(4 * np.pi / (self.angle_prec / 180 * np.pi))
        return fibonacci_sphere(n).astype(np.float32)


class PoseResult(NamedTuple):
    T: jnp.ndarray           # [3] center
    R: jnp.ndarray           # [3, 3] rotation (orthonormal columns)
    scale: jnp.ndarray       # [3] absolute per-axis scale
    RT: jnp.ndarray          # [4, 4] with R * |scale| convention of the eval
    scale_unit: jnp.ndarray  # scale / |scale| (the eval's `pred_scales`)
    up: jnp.ndarray
    right: jnp.ndarray
    n_filtered: jnp.ndarray  # pairs surviving the back-vote
    grid_max: jnp.ndarray


def make_models(cfg: Config) -> Tuple[PointEncoder, PPFEncoder]:
    """Construct the two encoders with reference hyper-parameters
    (reference train.py:34-35)."""
    return (
        PointEncoder(spfcs=(32, 64, 32, 32), out_dim=32, num_layers=1),
        PPFEncoder(ppffcs=(84, 32, 32, 16), out_dim=cfg.out_dim),
    )


def _masked_mean(x, mask, axis=None):
    m = mask.astype(x.dtype)
    while m.ndim < x.ndim:
        m = m[..., None]
    return jnp.sum(x * m, axis) / jnp.maximum(jnp.sum(m, axis), 1.0)


def _bce_logits(logits, targets, mask):
    """BCEWithLogits, mean over masked entries (reference nocs/inference.py:294-297)."""
    loss = jnp.maximum(logits, 0) - logits * targets + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    return _masked_mean(loss, mask)


def _vote_axis(
    rng: jax.Array,
    pc: jnp.ndarray,
    pc_normal: jnp.ndarray,
    point_idxs: jnp.ndarray,
    pair_mask: jnp.ndarray,
    angle_logits: jnp.ndarray,
    aux_logits: jnp.ndarray,
    sphere_pts: jnp.ndarray,
    pcfg: PoseConfig,
    pair_weights: jnp.ndarray | None = None,
    prior_gate: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """One orientation axis: rot-vote → sphere binning → aux sign flip
    (reference nocs/inference.py:258-303).

    ``pair_weights`` ([P], optional): importance of each pair for THIS axis —
    biases the cone-vote subsample distribution and weights the aux-bit
    disambiguation (see PoseConfig.asym_right_votes).

    ``prior_gate`` ([n_sphere] bool, optional): sphere directions eligible
    for the peak (see PoseConfig.up_prior_deg); gated-out directions keep
    their votes for nothing — they can never win the argmax.
    """
    rng_bin, rng_sub = jax.random.split(rng)
    # subsample `rot_subsample` surviving pairs (reference nocs/inference.py:277-279);
    # if the back-vote filter killed everything, fall back to all pairs.
    # Uniform-over-mask sampling via inverse CDF (cumsum + searchsorted):
    # jax.random.categorical would materialise a [rot_subsample, P] Gumbel
    # array (~20 ms at 10k x 100k); this is ~none
    p = point_idxs.shape[0]
    any_alive = jnp.any(pair_mask)
    keep = (pair_mask | ~any_alive).astype(jnp.float32)
    if pair_weights is not None:
        keep = keep * pair_weights
    cdf = jnp.cumsum(keep)
    u = jax.random.uniform(rng_sub, (pcfg.rot_subsample,)) * cdf[-1]
    sub = jnp.clip(jnp.searchsorted(cdf, u, side="right"), 0, p - 1)
    sub_idxs = point_idxs[sub]
    # multinomial bin decode → angle in [0, π] (reference nocs/inference.py:250-252),
    # drawn only for the subsampled pairs (same distribution, 10x less Gumbel)
    bin_idx = jax.random.categorical(rng_bin, angle_logits[sub], axis=-1)
    angles_sub = bin_idx.astype(pc.dtype) / (pcfg.rot_num_bins - 1) * jnp.pi
    cos_tol = jnp.cos(jnp.deg2rad(pcfg.angle_prec))
    vote_w = None
    if pcfg.sharp_axis_votes:
        # confidence of each subsampled pair's angle prediction, rescaled so a
        # uniform distribution weighs 0 and a one-hot weighs 1
        probs = jax.nn.softmax(angle_logits[sub], axis=-1)
        uniform = 1.0 / angle_logits.shape[-1]
        vote_w = jnp.clip((jnp.max(probs, -1) - uniform) / (1.0 - uniform), 0.0, 1.0)
    # fused: candidate axes stay componentwise, the [P, R, 3] tensor
    # (tile-padded ~42x) never reaches HBM
    counts = rot_vote_sphere_count(pc, angles_sub, sub_idxs, sphere_pts,
                                   cos_tol, n_rots=pcfg.num_rots,
                                   weights=vote_w)
    if prior_gate is not None:
        counts = jnp.where(prior_gate, counts, -1.0)
    # aux disambiguation over *all* surviving pairs (reference :286-302)
    ab = pc[point_idxs[:, 0]] - pc[point_idxs[:, 1]]
    ab_unit = ab / (jnp.linalg.norm(ab, axis=-1, keepdims=True) + 1e-7)
    n_a = pc_normal[point_idxs[:, 0]]
    n_canon = n_a * jnp.where(jnp.sum(n_a * ab_unit, -1, keepdims=True) < 0, -1.0, 1.0)
    base_aux_mask = pair_mask.astype(pc.dtype)
    if pair_weights is not None:
        base_aux_mask = base_aux_mask * pair_weights

    def _signed_bce(cand):
        align = jnp.sum(n_canon * cand, -1)
        target = (align > 0).astype(pc.dtype)
        aux_mask = base_aux_mask
        if pcfg.aux_align_weight:
            aux_mask = aux_mask * jnp.abs(align)
        up_loss = _bce_logits(aux_logits, target, aux_mask)
        down_loss = _bce_logits(aux_logits, 1.0 - target, aux_mask)
        return jnp.where(down_loss < up_loss, -cand, cand), jnp.minimum(up_loss, down_loss)

    if pcfg.axis_topk <= 1:
        best_dir, _ = _signed_bce(sphere_pts[jnp.argmax(counts)])
        return best_dir

    # top-K distinct peaks (greedy 20° NMS over BOTH hemispheres — the aux
    # flip owns the sign) re-scored by aux BCE; see PoseConfig.axis_topk
    cos_sup = jnp.cos(jnp.deg2rad(20.0))
    cands, cand_counts = [], []
    c = counts
    for _ in range(pcfg.axis_topk):
        i = jnp.argmax(c)
        cands.append(sphere_pts[i])
        cand_counts.append(counts[i])
        near = jnp.abs(sphere_pts @ sphere_pts[i]) > cos_sup
        c = jnp.where(near, -1.0, c)
    cands = jnp.stack(cands)                       # [K, 3]
    cand_counts = jnp.stack(cand_counts)           # [K]
    signed, bce = jax.vmap(_signed_bce)(cands)     # [K,3], [K]
    ok = cand_counts >= pcfg.axis_topk_min_frac * cand_counts[0]
    bce = jnp.where(ok, bce, jnp.inf)
    return signed[jnp.argmin(bce)]


def pair_predictions(
    rng: jax.Array,
    point_params,
    ppf_params,
    pc: jnp.ndarray,
    pc_normal: jnp.ndarray,
    n_valid,
    pcfg: PoseConfig,
    nbr_idx: jnp.ndarray | None = None,
):
    """Network half: sample pairs and run SPRIN + PPF head.

    Returns (point_idxs [P,2], preds [P, out_dim]).
    """
    n = pc.shape[0]
    valid_mask = jnp.arange(n) < n_valid
    point_encoder = PointEncoder(spfcs=(32, 64, 32, 32), out_dim=32, num_layers=1)
    out_dim = 2 * pcfg.tr_num_bins + 2 * pcfg.rot_num_bins + 2 + 3
    ppf_encoder = PPFEncoder(ppffcs=(84, 32, 32, 16), out_dim=out_dim)

    with _prec_net(pcfg):
        nbr = nbr_idx if nbr_idx is not None else knn_indices(pc, pcfg.knn, valid_mask)
        feat = point_encoder.apply(point_params, pc, pc_normal, nbr, valid_mask)

        point_idxs = sample_pair_indices(rng, pc, pc_normal, n_valid, pcfg)
        preds = ppf_encoder.apply(ppf_params, pc, pc_normal, feat, point_idxs)
    return point_idxs, preds


def sample_pair_indices(rng: jax.Array, pc: jnp.ndarray, pc_normal,
                        n_valid, pcfg: PoseConfig) -> jnp.ndarray:
    """Draw the [n_pairs, 2] pair sample (shared by the single-device and
    pair-sharded pipelines — identical draws for rng parity).

    ``pcfg.pair_balance == 0`` (default): uniform over valid points, the
    reference behaviour (nocs/inference.py:177).

    ``pair_balance = α > 0``: orientation-stratified.  Points are binned by
    their quantised normal direction (sign-folded — normal signs are
    solver-arbitrary) and each point weighted by ``1/count(bin)^α``, so
    with α=1 every occupied surface ORIENTATION contributes equal pair
    mass.  Rationale (no reference counterpart): per-pair vote errors are
    CORRELATED within a dominant plane (per-pair proj/odist bias ~6-7% of
    object scale does not average away — ROUND_NOTES r3 session 7), and a
    plane is one normal bin, so on plane-dominated meter-scale furniture
    the table-top's correlated mass collapses to one stratum while the
    legs/edges (many orientations, independent errors) keep theirs."""
    n = pc.shape[0]
    u = jax.random.uniform(rng, (pcfg.n_pairs, 2))
    if pcfg.pair_balance <= 0:
        return jnp.minimum((u * n_valid).astype(jnp.int32), n_valid - 1)
    valid = (jnp.arange(n) < n_valid).astype(pc.dtype)
    # sign-fold each normal to the hemisphere of its largest |component|
    # so arbitrary solver signs map to one bin per orientation
    lead = jnp.argmax(jnp.abs(pc_normal), axis=-1)
    sign = jnp.sign(jnp.take_along_axis(pc_normal, lead[:, None], 1)[:, 0])
    nrm = pc_normal * jnp.where(sign == 0, 1.0, sign)[:, None]
    q = jnp.round(nrm * 2.0).astype(jnp.int32)          # 5^3 direction bins
    h = (q[:, 0] * 25 + q[:, 1] * 5 + q[:, 2]) & (_STRATA_HASH - 1)
    counts = jnp.zeros((_STRATA_HASH,), pc.dtype).at[h].add(valid)
    w = valid / jnp.maximum(counts[h], 1.0) ** pcfg.pair_balance
    cdf = jnp.cumsum(w)
    idx = jnp.searchsorted(cdf, u * cdf[-1], side="right").astype(jnp.int32)
    return jnp.clip(idx, 0, n - 1)


# hash-table size for the pair_balance orientation-bin counts (power of two)
_STRATA_HASH = 256


def _protrusion_centroid(pc, T_est, up, n_valid, asym):
    """Radial-asymmetry-weighted centroid direction about the (T, up) line,
    projected off the axis.  Returns (h_dir, gate): ``gate`` is False when
    the protruding geometry is occluded (no asymmetry mass), so consumers
    fall back to their first-pass answer.  Shared by asym_center_refine and
    geo_right_sign (and their sharded twins)."""
    n = pc.shape[0]
    w_pt = jnp.where(jnp.arange(n) < n_valid, asym, 0.0)
    cen = jnp.sum(w_pt[:, None] * (pc - T_est), 0)
    cen = cen - jnp.dot(cen, up) * up
    cen_n = jnp.linalg.norm(cen)
    h_dir = cen / (cen_n + 1e-9)
    gate = (cen_n > 1e-6) & (jnp.sum(w_pt) > 1.0)
    return h_dir, gate


def _prec(pcfg: PoseConfig):
    """Decode-half matmul-precision context (see PoseConfig.pose_f32):
    f32 when pose_f32 is truthy (True or "decode")."""
    return (jax.default_matmul_precision("float32") if pcfg.pose_f32
            else contextlib.nullcontext())


def _prec_net(pcfg: PoseConfig):
    """Network-half matmul-precision context.  pose_f32="decode" keeps the
    SPRIN/PPF encoders on the TPU-default bf16 passes (MXU speed) while the
    decode projections stay f32 — the untested middle arm from the round-4
    precision postmortem (network-ONLY pinning was measured insufficient,
    up 55.9°; whether decode-only recovers full f32 quality is an A/B).
    "default" resets an enclosing f32 scope (the sharded twin wraps its
    whole body)."""
    if pcfg.pose_f32 == "decode":
        return jax.default_matmul_precision("default")
    return (jax.default_matmul_precision("float32") if pcfg.pose_f32
            else contextlib.nullcontext())


def vote_pose(
    rng: jax.Array,
    pc: jnp.ndarray,
    pc_normal: jnp.ndarray,
    point_idxs: jnp.ndarray,
    preds: jnp.ndarray,
    n_valid,
    sphere_pts: jnp.ndarray,
    pcfg: PoseConfig,
    probs: jnp.ndarray | None = None,
    laptop_up: jnp.ndarray | None = None,
    laptop_up_valid: jnp.ndarray | None = None,
) -> PoseResult:
    """Voting half: decode pair predictions into a 9D pose (no network)."""
    with _prec(pcfg):
        return _vote_pose_body(rng, pc, pc_normal, point_idxs, preds, n_valid,
                               sphere_pts, pcfg, probs, laptop_up,
                               laptop_up_valid)


def _vote_pose_body(
    rng: jax.Array,
    pc: jnp.ndarray,
    pc_normal: jnp.ndarray,
    point_idxs: jnp.ndarray,
    preds: jnp.ndarray,
    n_valid,
    sphere_pts: jnp.ndarray,
    pcfg: PoseConfig,
    probs: jnp.ndarray | None = None,
    laptop_up: jnp.ndarray | None = None,
    laptop_up_valid: jnp.ndarray | None = None,
) -> PoseResult:
    n = pc.shape[0]
    valid_mask = jnp.arange(n) < n_valid
    rng_tr, rng_up, rng_right, rng_fallback = jax.random.split(rng, 4)

    B, R = pcfg.tr_num_bins, pcfg.rot_num_bins
    tr_logits = preds[:, : 2 * B].reshape(-1, 2, B)
    up_logits = preds[:, 2 * B : 2 * B + R]
    right_logits = preds[:, 2 * B + R : 2 * B + 2 * R]
    up_aux = preds[:, -5]
    right_aux = preds[:, -4]
    scale_pred = preds[:, -3:]

    # --- decode translation bins (multinomial, reference :185-188) ---------
    rng_tr0, rng_tr1 = jax.random.split(rng_tr)
    v0, v1 = pcfg.vote_range
    idx0 = jax.random.categorical(rng_tr0, tr_logits[:, 0], axis=-1)
    idx1 = jax.random.categorical(rng_tr1, tr_logits[:, 1], axis=-1)
    proj_len = idx0.astype(pc.dtype) / (B - 1) * 2 * v0 - v0
    odist = idx1.astype(pc.dtype) / (B - 1) * v1
    preds_tr = jnp.stack([proj_len, odist], -1)

    # --- center voting ------------------------------------------------------
    big = jnp.asarray(1e9, pc.dtype)
    corner = jnp.min(jnp.where(valid_mask[:, None], pc, big), 0)
    top = jnp.max(jnp.where(valid_mask[:, None], pc, -big), 0)
    grid_dims = ((top - corner) / pcfg.res).astype(jnp.int32) + 1
    grid_dims = jnp.minimum(grid_dims, jnp.array(pcfg.grid_shape, jnp.int32))
    if probs is None:
        probs = jnp.ones((n,), pc.dtype)
    base_mask = jnp.ones((point_idxs.shape[0],), dtype=bool)
    halfspace = None
    if pcfg.filter_coplanar or pcfg.coplanar_halfspace:
        # coplanar-indistinguishable pairs (see PoseConfig.filter_coplanar):
        # both normals parallel and both ⟂ the pair axis → their vote circle
        # hits the mirrored center too.
        n1 = pc_normal[point_idxs[:, 0]]
        n2 = pc_normal[point_idxs[:, 1]]
        a_pts = pc[point_idxs[:, 0]]
        ab = a_pts - pc[point_idxs[:, 1]]
        abu = ab / (jnp.linalg.norm(ab, axis=-1, keepdims=True) + 1e-7)
        coplanar = (
            (jnp.abs(jnp.sum(n1 * n2, -1)) > 0.9)
            & (jnp.abs(jnp.sum(abu * n1, -1)) < 0.1)
            & (jnp.abs(jnp.sum(abu * n2, -1)) < 0.1)
        )
        if pcfg.coplanar_halfspace:
            # vote-preserving variant (PoseConfig.coplanar_halfspace): keep
            # coplanar pairs voting, but only into the object-interior
            # half-space.  Orient the normal toward the camera at the origin
            # — outward for any visible surface — and let the vote kernels
            # zero candidates more than `halfspace_margin` voxels in FRONT
            # of the surface plane (exactly the mirror-side votes).
            n_out = jnp.where(jnp.sum(n1 * a_pts, -1, keepdims=True) > 0,
                              -n1, n1)
            halfspace = (
                a_pts, n_out, coplanar,
                jnp.asarray(pcfg.halfspace_margin * pcfg.res, pc.dtype))
        else:
            # Disable the filter when it would leave <5% of pairs
            # (pure-plane views: ambiguity is then inherent and a starved
            # vote is worse than a mirrored one).
            keep = ~coplanar
            base_mask = keep | (jnp.mean(keep.astype(pc.dtype)) < 0.05)
    # center-vote pair weights: the coplanar gate (bool), optionally scaled
    # by the separation weight (see PoseConfig.pair_sep_power) — float pair
    # weights scale vote mass inside _vote_coords
    center_mask = base_mask
    if pcfg.pair_sep_power > 0:
        sep = jnp.linalg.norm(pc[point_idxs[:, 0]] - pc[point_idxs[:, 1]],
                              axis=-1)
        sep_ref = jnp.quantile(sep, 0.75)
        sep_w = jnp.clip(sep / jnp.maximum(sep_ref, 1e-6), 0.0, 1.0)
        center_mask = base_mask * sep_w ** pcfg.pair_sep_power
    if pcfg.center_mode == "hier":
        peak_idx, grid_max = ppf_vote_peak(
            pc, preds_tr, probs, point_idxs, corner, pcfg.res, grid_dims,
            pcfg.grid_shape, n_rots=pcfg.num_rots, adaptive=pcfg.adaptive_voting,
            splat=pcfg.splat, max_rounds=pcfg.peak_rounds, pair_mask=center_mask,
            halfspace=halfspace,
        )
        T_est = corner + peak_idx.astype(pc.dtype) * pcfg.res
    else:
        grid = ppf_vote(
            pc, preds_tr, probs, point_idxs, corner, pcfg.res, grid_dims,
            pcfg.grid_shape, n_rots=pcfg.num_rots, adaptive=pcfg.adaptive_voting,
            splat=pcfg.splat, pair_mask=center_mask, halfspace=halfspace,
        )
        T_est = grid_argmax(grid, corner, pcfg.res)
        grid_max = jnp.max(grid)

    # --- back-vote filter (reference :216-231) ------------------------------
    _, pair_mask = backvote(
        pc, preds_tr, point_idxs, corner, pcfg.res, grid_dims, T_est,
        3.0 * pcfg.res, n_rots=pcfg.num_rots,
    )
    # base_mask (coplanar filter) gates the CENTER votes only: a same-plane
    # pair's vote circle hits the mirrored center too (bias), but its
    # angle-to-axis predictions are the bulk of the up evidence on plane-
    # dominated bodies — filtering them from the axis votes measured
    # up 17.9->28.8 deg on sofa while center-only filtering keeps the
    # T-lateral win (158->96 mm).
    if pcfg.subvoxel_refine:
        T_est = center_refine(pc, preds_tr, point_idxs, T_est,
                              pair_mask & base_mask,
                              pcfg.res)

    # --- orientation axes ----------------------------------------------------
    up_gate = None
    if pcfg.up_prior_deg > 0:
        prior_dir = jnp.asarray(pcfg.up_prior_dir, pc.dtype)
        up_gate = jnp.abs(sphere_pts @ prior_dir) >= jnp.cos(
            jnp.deg2rad(pcfg.up_prior_deg))
    up = _vote_axis(
        rng_up, pc, pc_normal, point_idxs, pair_mask, up_logits, up_aux,
        sphere_pts, pcfg, prior_gate=up_gate,
    )

    # --- second-pass asym-weighted center vote (PoseConfig.asym_center_refine)
    if pcfg.asym_center_refine:
        from cppf_tpu.core.targets import radial_asymmetry_about

        asym_c = radial_asymmetry_about(pc, T_est, up, n_valid)
        probs_c = (0.05 + 0.95 * asym_c) * probs
        if pcfg.center_mode == "hier":
            peak_idx2, _ = ppf_vote_peak(
                pc, preds_tr, probs_c, point_idxs, corner, pcfg.res, grid_dims,
                pcfg.grid_shape, n_rots=pcfg.num_rots,
                adaptive=pcfg.adaptive_voting, splat=pcfg.splat,
                max_rounds=pcfg.peak_rounds, pair_mask=center_mask,
                halfspace=halfspace,
            )
            T_ref = corner + peak_idx2.astype(pc.dtype) * pcfg.res
        else:
            grid2 = ppf_vote(
                pc, preds_tr, probs_c, point_idxs, corner, pcfg.res, grid_dims,
                pcfg.grid_shape, n_rots=pcfg.num_rots,
                adaptive=pcfg.adaptive_voting, splat=pcfg.splat,
                pair_mask=center_mask, halfspace=halfspace,
            )
            T_ref = grid_argmax(grid2, corner, pcfg.res)
        # Take only the azimuthal component of the correction: the bias acts
        # along the protrusion direction (the marginalised dist2o reads as
        # radius excess on the wall opposite the handle), while the first
        # pass's full-wall consensus is the *lower-noise* estimate along the
        # other axes — the refined peak rests on far fewer votes.  The
        # protrusion direction is the asymmetry-weighted centroid about the
        # up axis; with the geometry occluded the asymmetry mass vanishes
        # and the correction gates itself off.
        u_h, gate = _protrusion_centroid(pc, T_est, up, n_valid, asym_c)
        T_est = jnp.where(
            gate, T_est + jnp.dot(T_ref - T_est, u_h) * u_h, T_est)
        _, pair_mask = backvote(
            pc, preds_tr, point_idxs, corner, pcfg.res, grid_dims, T_est,
            3.0 * pcfg.res, n_rots=pcfg.num_rots,
        )
        if pcfg.subvoxel_refine:
            T_est = center_refine(pc, preds_tr, point_idxs, T_est,
                                  pair_mask & base_mask,
                                  pcfg.res)

    if pcfg.regress_right:
        right_w = None
        asym = None
        if pcfg.asym_right_votes or pcfg.geo_right_sign:
            from cppf_tpu.core.targets import radial_asymmetry_about

            asym = radial_asymmetry_about(pc, T_est, up, n_valid)
        if pcfg.asym_right_votes:
            # small floor keeps a trickle of votes when the view hides the
            # asymmetric geometry entirely (handle occluded)
            right_w = 0.05 + 0.95 * jnp.maximum(
                asym[point_idxs[:, 0]], asym[point_idxs[:, 1]]
            )
        right = _vote_axis(
            rng_right, pc, pc_normal, point_idxs, pair_mask, right_logits,
            right_aux, sphere_pts, pcfg, pair_weights=right_w,
        )
        if pcfg.geo_right_sign:
            h_dir, gate = _protrusion_centroid(pc, T_est, up, n_valid, asym)
            ref_dir = (h_dir if pcfg.geo_right_dir == "direct"
                       else jnp.cross(h_dir, up))
            flip = gate & (jnp.dot(right, ref_dir) < 0)
            right = jnp.where(flip, -right, right)
        right = orthonormal_right(up, right)
    else:
        right = jnp.stack([jnp.zeros_like(up[0]), -up[2], up[1]])
        right = right / (jnp.linalg.norm(right) + 1e-9)

    # laptop plane override (reference :314-323)
    if laptop_up is not None:
        # Caller contract: ``laptop_up`` is the base-plane normal oriented
        # TOWARD the camera (visible-surface rule, n·p < 0 on plane points
        # — see eval.nocs_inference.laptop_up_from_aux).  The r4 lesson:
        # deriving the sign from the voted axes ((up+right)·n, the old
        # rule) breaks exactly when the vote's up sign is at chance — the
        # flip followed the bad vote (override up 151° on the r4 laptop
        # retrain).  With a geometrically-trusted sign, the only decision
        # left is whether the vote confused up with right (clamshell
        # half-open: base normal can match the voted right), so compare
        # the LINE alignments and overwrite up whenever the plane agrees
        # with up no worse than with right — including the flipped-up case
        # (up·lup ≈ −1 < |right·lup|).  Upgrades reference
        # nocs/inference.py:314-323.
        lv = laptop_up_valid if laptop_up_valid is not None else jnp.array(True)
        lup = laptop_up
        wrong = jnp.dot(up, lup) < jnp.abs(jnp.dot(right, lup))
        new_up = jnp.where(wrong & lv, lup, up)
        new_right = jnp.where(wrong & lv, orthonormal_right(lup, up), right)
        up, right = new_up, new_right

    # degenerate right fallback (reference :325-328)
    degen = jnp.linalg.norm(right) < 1e-7
    rand_right = jax.random.normal(rng_fallback, (3,), pc.dtype)
    rand_right = orthonormal_right(up, rand_right)
    right = jnp.where(degen, rand_right, right)

    R_est = assemble_rotation(up, right, pcfg.z_right)

    # --- scale (reference :335-339) -----------------------------------------
    scale_mean = jnp.asarray(pcfg.scale_mean, pc.dtype)
    pred_scale = (
        jnp.exp(_masked_mean(scale_pred, pair_mask, axis=0)) * scale_mean * pcfg.scale_multiplier
    )
    scale_norm = jnp.linalg.norm(pred_scale)
    RT = jnp.eye(4, dtype=pc.dtype)
    RT = RT.at[:3, :3].set(R_est * scale_norm)
    RT = RT.at[:3, 3].set(T_est)

    return PoseResult(
        T=T_est,
        R=R_est,
        scale=pred_scale,
        RT=RT,
        scale_unit=pred_scale / scale_norm,
        up=up,
        right=right,
        n_filtered=jnp.sum(pair_mask),
        grid_max=grid_max,
    )


@partial(jax.jit, static_argnames=("pcfg",))
def estimate_pose(
    rng: jax.Array,
    point_params,
    ppf_params,
    pc: jnp.ndarray,
    pc_normal: jnp.ndarray,
    n_valid,
    sphere_pts: jnp.ndarray,
    pcfg: PoseConfig,
    probs: jnp.ndarray | None = None,
    laptop_up: jnp.ndarray | None = None,
    laptop_up_valid: jnp.ndarray | None = None,
    nbr_idx: jnp.ndarray | None = None,
) -> PoseResult:
    """Single-instance 9D pose, fully on device.

    pc/pc_normal: [N, 3] padded, valid points compacted to the front;
    n_valid: number of real points.  ``laptop_up`` optionally overrides the
    up axis as in the reference's laptop special case
    (reference nocs/inference.py:314-323).
    """
    rng_pairs, rng_vote = jax.random.split(rng)
    point_idxs, preds = pair_predictions(
        rng_pairs, point_params, ppf_params, pc, pc_normal, n_valid, pcfg, nbr_idx
    )
    return vote_pose(
        rng_vote, pc, pc_normal, point_idxs, preds, n_valid, sphere_pts, pcfg,
        probs, laptop_up, laptop_up_valid,
    )


@partial(jax.jit, static_argnames=("pcfg",))
def estimate_pose_batch(
    rngs: jax.Array,
    point_params,
    ppf_params,
    pcs: jnp.ndarray,
    pc_normals: jnp.ndarray,
    n_valids: jnp.ndarray,
    sphere_pts: jnp.ndarray,
    pcfg: PoseConfig,
    nbr_idxs: jnp.ndarray | None = None,
) -> PoseResult:
    """Multi-instance batched pose estimation (one compiled program).

    The reference processes instances in a serial Python loop
    (nocs/inference.py:120); here a whole frame's crops run as one program.
    Instances iterate via ``lax.map`` rather than ``vmap``: each instance's
    voting ops already fill the chip, so batching buys dispatch/RPC
    amortisation (one device call per frame group), not parallelism — and
    the hier center path's Pallas kernels tile flat [V] vote blocks that
    vmap's injected batch dim cannot legally block (TPU blocks must keep
    the last two dims (8,128)-aligned).
    rngs [B,2] PRNG keys; pcs [B,N,3]; returns a PoseResult of stacked leaves.
    """

    def one(args):
        rng, pc, nrm, nv, nbr = args
        return estimate_pose(rng, point_params, ppf_params, pc, nrm, nv,
                             sphere_pts, pcfg, nbr_idx=nbr)

    if nbr_idxs is None:
        def one_no_nbr(args):
            return one((*args, None))

        return jax.lax.map(one_no_nbr, (rngs, pcs, pc_normals, n_valids))
    return jax.lax.map(one, (rngs, pcs, pc_normals, n_valids, nbr_idxs))
