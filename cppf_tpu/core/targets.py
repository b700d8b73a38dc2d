"""On-device voting-target generation.

Behavioural parity target: reference ``utils/dataset.py:20-60``
(``generate_target``): for each sampled point pair (a, b) on a canonical
(NOCS-frame, origin-centred) object the labels are

- ``proj_len``  = a · d̂            (signed projection of a on the pair axis)
- ``dist2o``    = ‖a − proj_len·d̂‖ (orthogonal distance of the origin/center)
- ``up/right angle`` = arccos(d̂ · axis), folded by symmetry via min(θ, π−θ)
- ``aux bits``  = sign of the pair-orientation-canonicalised normal against
  the up/right axes

All math runs in JAX so targets are generated on-TPU inside the jitted train
step (no host round-trip), unlike the reference's NumPy DataLoader workers.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from cppf_tpu.core.binning import real2prob


class VotingTargets(NamedTuple):
    tr: jnp.ndarray        # [P, 2]  (proj_len, dist2o)
    rot: jnp.ndarray       # [P, 2]  (up angle, right angle)
    rot_aux: jnp.ndarray   # [P, 2]  binary orientation bits
    point_idxs: jnp.ndarray  # [P, 2] int32
    aux_weight: jnp.ndarray  # [P, 2]  |n_canon·axis| informativeness of the bits
    up_rot_weight: jnp.ndarray | None = None  # [P] up-angle KL weight (articulated bodies)


def sample_pair_idxs(rng: jax.Array, n_points, n_pairs: int) -> jnp.ndarray:
    """Uniform random pair indices [P, 2] in [0, n_points).

    ``n_points`` may be a traced value (padded clouds): indices are drawn in
    [0, 1) and scaled, keeping the shape static.
    """
    u = jax.random.uniform(rng, (n_pairs, 2))
    return jnp.minimum((u * n_points).astype(jnp.int32), n_points - 1)


def radial_asymmetry(pc: jnp.ndarray, n_valid, n_bins: int = 12) -> jnp.ndarray:
    """Per-point symmetry-breaking score for canonical-frame clouds, [N] in [0,1].

    For a near-revolution body the sign of n·right is azimuth-dependent and
    locally indistinguishable, so |n·right| marks exactly the UNLEARNABLE
    pairs (measured: mug right-bit weighted P(bit=1)≈0.5 at every |n·right|
    level).  The pairs that actually determine the right axis touch the
    symmetry-BREAKING geometry — the mug handle, the camera lens.  This
    scores each point by how far it protrudes beyond the body-of-revolution
    radius of its height slab: per y-bin masked mean/std of the axial radius
    √(x²+z²), score = clip(((r−mean)/σ − 1)/2, 0, 1).  No reference
    counterpart (the reference trains the bit unweighted, to chance, on
    these families).
    """
    mask = (jnp.arange(pc.shape[0]) < n_valid)
    r = jnp.sqrt(pc[:, 0] ** 2 + pc[:, 2] ** 2)
    return _profile_excess(pc[:, 1], r, mask, n_bins, pc.dtype)


def radial_asymmetry_about(
    pc: jnp.ndarray,
    center: jnp.ndarray,
    axis: jnp.ndarray,
    n_valid,
    n_bins: int = 12,
) -> jnp.ndarray:
    """:func:`radial_asymmetry` about an arbitrary (center, axis) line, [N].

    The inference-side form: after the center grid peak and the up-axis
    sphere vote, score each observed point by how far it protrudes beyond
    the revolution radius of its height slab about the estimated up axis —
    picking out the handle/lens geometry that alone determines the right
    axis of a near-revolution body.  Purely geometric (no canonical frame
    needed); sign of ``axis`` is irrelevant (slabs reverse, scores don't).
    """
    mask = (jnp.arange(pc.shape[0]) < n_valid)
    d = pc - center[None, :]
    h = jnp.sum(d * axis[None, :], -1)
    radial = d - h[:, None] * axis[None, :]
    r = jnp.linalg.norm(radial, axis=-1)
    return _profile_excess(h, r, mask, n_bins, pc.dtype)


def _profile_excess(height, r, mask, n_bins: int, dtype) -> jnp.ndarray:
    """Shared core: per-height-slab (mean, σ) of the axial radius; score
    = clip(((r−mean)/σ − 1)/2, 0, 1), masked."""
    mf = mask.astype(dtype)
    big = jnp.asarray(1e9, dtype)
    y_lo = jnp.min(jnp.where(mask, height, big))
    y_hi = jnp.max(jnp.where(mask, height, -big))
    t = (height - y_lo) / jnp.maximum(y_hi - y_lo, 1e-6)
    b = jnp.clip((t * n_bins).astype(jnp.int32), 0, n_bins - 1)
    onehot = (b[:, None] == jnp.arange(n_bins)[None, :]).astype(dtype) * mf[:, None]
    cnt = jnp.sum(onehot, 0)                      # [n_bins]
    mean = jnp.sum(onehot * r[:, None], 0) / jnp.maximum(cnt, 1.0)
    var = jnp.sum(onehot * (r[:, None] - mean[None, :]) ** 2, 0) / jnp.maximum(cnt, 1.0)
    # floor the deviation scale so a perfectly clean slab doesn't flag
    # voxel-level jitter as asymmetry
    sigma = jnp.sqrt(var) + 0.03 * jnp.maximum(jnp.sum(mf * r) / jnp.maximum(jnp.sum(mf), 1.0), 1e-6)
    excess = (r - mean[b]) / sigma[b]
    return jnp.clip((excess - 1.0) * 0.5, 0.0, 1.0) * mf


def base_membership(pc: jnp.ndarray, n_valid, frac: float = 0.15) -> jnp.ndarray:
    """Per-point bottom-slab membership for articulated clamshell bodies, [N].

    A laptop's up axis is carried by its BASE: lid-lid pairs cannot observe
    the hinge opening angle from SE(3)-invariant local features (a flat lid
    looks identical at any inclination), so their up-angle targets vary
    across the family's random hinge angles — label noise that trains the up
    head toward a diffuse marginal (measured: laptop voting-only up 63.7deg
    median).  Base-base pairs are hinge-invariant and base-lid pairs observe
    the hinge angle directly (n_a·n_b IS the opening angle), so weighting
    the up-angle loss by max(base_a, base_b) keeps every informative pair.
    No reference counterpart (the reference trains unweighted and leans on
    its plane-override at inference, nocs/inference.py:314-323).
    """
    mask = (jnp.arange(pc.shape[0]) < n_valid)
    y = pc[:, 1]
    big = jnp.asarray(1e9, pc.dtype)
    y_lo = jnp.min(jnp.where(mask, y, big))
    y_hi = jnp.max(jnp.where(mask, y, -big))
    return ((y < y_lo + frac * jnp.maximum(y_hi - y_lo, 1e-6)) & mask).astype(pc.dtype)


def generate_targets(
    pc: jnp.ndarray,
    pc_normal: jnp.ndarray,
    point_idxs: jnp.ndarray,
    up_sym: bool = False,
    right_sym: bool = False,
    z_right: bool = False,
    asym: jnp.ndarray | None = None,
    base: jnp.ndarray | None = None,
) -> VotingTargets:
    """Pair voting labels for a canonical-frame point cloud.

    pc/pc_normal: [N, 3]; point_idxs: [P, 2] int.  Symmetry flags are static.
    ``asym`` ([N], optional): per-point :func:`radial_asymmetry` scores; when
    given, the right-bit aux weight is additionally scaled by the pair's
    symmetry-breaking score so near-revolution wall pairs (whose bit is
    azimuth-noise) stop dragging the head to chance.
    ``base`` ([N], optional): per-point :func:`base_membership`; when given,
    an up-angle KL weight max(base_a, base_b) (with a small floor) is
    attached so hinge-ambiguous lid-lid pairs stop teaching the up head.
    """
    a = pc[point_idxs[:, 0]]
    b = pc[point_idxs[:, 1]]
    d = a - b
    d_unit = d / (jnp.linalg.norm(d, axis=-1, keepdims=True) + 1e-7)
    proj_len = jnp.sum(a * d_unit, -1)
    oc = a - proj_len[..., None] * d_unit
    dist2o = jnp.linalg.norm(oc, axis=-1)
    target_tr = jnp.stack([proj_len, dist2o], -1)

    up = jnp.array([0.0, 1.0, 0.0], pc.dtype)
    right = jnp.array([0.0, 0.0, 1.0] if z_right else [1.0, 0.0, 0.0], pc.dtype)

    up_dot = jnp.clip(jnp.sum(d_unit * up, -1), -1.0, 1.0)
    up_ang = jnp.arccos(up_dot)
    if up_sym:
        up_ang = jnp.minimum(up_ang, jnp.arccos(-up_dot))
    right_dot = jnp.clip(jnp.sum(d_unit * right, -1), -1.0, 1.0)
    right_ang = jnp.arccos(right_dot)
    if right_sym:
        right_ang = jnp.minimum(right_ang, jnp.arccos(-right_dot))
    target_rot = jnp.stack([up_ang, right_ang], -1)

    n_a = pc_normal[point_idxs[:, 0]]
    flip = jnp.where(jnp.sum(n_a * d_unit, -1, keepdims=True) < 0, -1.0, 1.0)
    n_canon = n_a * flip
    up_dot_n = jnp.sum(n_canon * up, -1)
    right_dot_n = jnp.sum(n_canon * right, -1)
    target_aux = jnp.stack(
        [
            (up_dot_n > 0).astype(pc.dtype),
            (right_dot_n > 0).astype(pc.dtype),
        ],
        -1,
    )
    # Informativeness of each bit: |n_canon·axis|.  When the canonicalised
    # normal is near-perpendicular to the axis the sign is decided by noise
    # (near-revolution surfaces: almost EVERY pair), and training on those
    # labels drags the aux head to chance.  The loss weights the BCE by this
    # so only pairs whose geometry determines the bit teach it (no reference
    # counterpart — the reference's unweighted BCE has the same failure).
    w_up = jnp.abs(up_dot_n)
    w_right = jnp.abs(right_dot_n)
    if asym is not None:
        pair_asym = jnp.maximum(asym[point_idxs[:, 0]], asym[point_idxs[:, 1]])
        # small floor keeps a trickle of gradient from ordinary pairs
        w_right = w_right * (0.05 + 0.95 * pair_asym)
    aux_weight = jnp.stack([w_up, w_right], -1)
    up_rot_w = None
    if base is not None:
        up_rot_w = 0.1 + 0.9 * jnp.maximum(base[point_idxs[:, 0]],
                                           base[point_idxs[:, 1]])
    return VotingTargets(target_tr, target_rot, target_aux,
                         point_idxs.astype(jnp.int32), aux_weight, up_rot_w)


def soft_bin_targets(
    targets: VotingTargets,
    vote_range,
    tr_num_bins: int,
    rot_num_bins: int,
):
    """Soft-bin tr/rot targets (reference utils/dataset.py:232-243).

    tr[:,0] (proj_len) is shifted by +vote_range[0] and clipped to
    [0, 2*vote_range[0]]; tr[:,1] (dist2o) clipped to [0, vote_range[1]];
    angles binned over [0, π].
    Returns (tr_prob [P,2,B], rot_prob [P,2,R]).
    """
    v0, v1 = float(vote_range[0]), float(vote_range[1])
    tr_prob = jnp.stack(
        [
            real2prob(jnp.clip(targets.tr[:, 0] + v0, 0.0, 2 * v0), 2 * v0, tr_num_bins),
            real2prob(jnp.clip(targets.tr[:, 1], 0.0, v1), v1, tr_num_bins),
        ],
        1,
    )
    rot_prob = jnp.stack(
        [
            real2prob(targets.rot[:, 0], jnp.pi, rot_num_bins),
            real2prob(targets.rot[:, 1], jnp.pi, rot_num_bins),
        ],
        1,
    )
    return tr_prob, rot_prob


def scale_target(bound_nocs: jnp.ndarray, scale: jnp.ndarray, scale_mean) -> jnp.ndarray:
    """Log-scale residual label (reference utils/dataset.py:246-248).

    ``bound_nocs`` is the NOCS-frame mesh extent (x/z already swapped by the
    caller), ``scale`` the sampled uniform scale.
    """
    return jnp.log(bound_nocs / 2 * scale) - jnp.log(jnp.asarray(scale_mean, bound_nocs.dtype))
