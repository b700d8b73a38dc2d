"""Pair-axis-sharded inference: the full 9D pose program over a device mesh.

The reference's inference is a serial single-GPU loop (SURVEY §2); the
natural scale-out axis is the 100k–5M point pairs.  Here the pair-heavy
stages — the PPF head, center-vote accumulation, back-vote filter and the
rot-vote→sphere histogram — run under ``shard_map`` with the pair dimension
split across the mesh's ``pair`` axis, merged by ``psum`` (ICI all-reduce)
where the quantity is additive.  Per-point work (KNN, SPRIN features) and
the tiny decode/assembly stages stay replicated.

The RNG split structure mirrors :func:`cppf_tpu.pipeline.pose.estimate_pose`
exactly, so with the same key the sharded program reproduces the
single-device pose up to float summation order
(tests/test_parallel.py::test_sharded_estimate_pose_matches_single).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import PartitionSpec as P

from cppf_tpu.parallel.mesh import (
    PAIR_AXIS,
    sharded_ppf_vote,
    sharded_ppf_vote_peak,
)
from cppf_tpu.pipeline.pose import (
    PoseConfig,
    PoseResult,
    _bce_logits,
    _masked_mean,
    vote_pose,
)


def _pad_pairs(mesh, *arrs):
    s = mesh.shape[PAIR_AXIS]
    p = arrs[0].shape[0]
    pad = (-p) % s
    return p, [jnp.pad(a, ((0, pad),) + ((0, 0),) * (a.ndim - 1)) for a in arrs]


def sharded_ppf_head(mesh, ppf_params, pc, pc_normal, feat, point_idxs):
    """PPF pair head with the pair axis sharded (embarrassingly parallel —
    no collective; the output keeps the pair sharding)."""
    from cppf_tpu.models.encoders import PPFEncoder

    out_dim = int(ppf_params["params"]["final"]["bias"].shape[0])

    @partial(shard_map, mesh=mesh, check_vma=False,
             in_specs=(P(), P(), P(), P(), P(PAIR_AXIS)), out_specs=P(PAIR_AXIS))
    def _head(params_, pc_, nrm_, feat_, idxs_):
        head = PPFEncoder(ppffcs=(84, 32, 32, 16), out_dim=out_dim)
        return head.apply(params_, pc_, nrm_, feat_, idxs_)

    p, (idxs_p,) = _pad_pairs(mesh, point_idxs)
    return _head(ppf_params, pc, pc_normal, feat, idxs_p)[:p]


def sharded_backvote(mesh, pc, preds_tr, point_idxs, corner, res, grid_dims,
                     pred_center, tol, n_rots=72):
    """Back-vote filter with the pair axis sharded (per-pair independent)."""
    from cppf_tpu.ops.voting import backvote

    p, (idxs_p, tr_p) = _pad_pairs(mesh, point_idxs, preds_tr)

    @partial(shard_map, mesh=mesh, check_vma=False,
             in_specs=(P(), P(PAIR_AXIS), P(PAIR_AXIS), P(), P(), P()),
             out_specs=(P(PAIR_AXIS), P(PAIR_AXIS)))
    def _bv(pc_, tr_, idxs_, corner_, dims_, center_):
        return backvote(pc_, tr_, idxs_, corner_, res, dims_, center_, tol,
                        n_rots=n_rots)

    off, mask = _bv(pc, tr_p, idxs_p, corner, grid_dims, pred_center)
    return off[:p], mask[:p]


def sharded_center_refine(mesh, pc, preds_tr, point_idxs, T_init, pair_mask,
                          res, iters: int = 3, min_pairs: float = 64.0):
    """Pair-sharded twin of ops.voting.center_refine: the Gauss-Newton
    normal-equation terms are plain sums over pairs, so each device
    accumulates its shard and one tiny psum ([3,3]+[3]+[]) per iteration
    lets every device solve the identical 3-unknown system.  All numerics
    (trim schedule, damping, trust region) are the shared helpers in
    ops.voting — only the psums differ."""
    from cppf_tpu.ops.voting import (
        center_refine_clamp,
        center_refine_cutoffs,
        center_refine_solve,
        center_refine_terms,
    )

    p, (idxs_p, tr_p, mask_p) = _pad_pairs(mesh, point_idxs, preds_tr,
                                           pair_mask)
    res_f = jnp.asarray(res, pc.dtype)

    @partial(shard_map, mesh=mesh, check_vma=False,
             in_specs=(P(), P(PAIR_AXIS), P(PAIR_AXIS), P(PAIR_AXIS), P()),
             out_specs=P())
    def _refine(pc_, tr_, idxs_, mask_, T0_):
        w0 = mask_.astype(pc_.dtype)
        cutoffs = center_refine_cutoffs(res_f, iters)

        def gn_step(i, c):
            H, g, wsum = center_refine_terms(pc_, tr_, idxs_, c, w0,
                                             cutoffs[i])
            H = jax.lax.psum(H, PAIR_AXIS)
            g = jax.lax.psum(g, PAIR_AXIS)
            wsum = jax.lax.psum(wsum, PAIR_AXIS)
            return center_refine_solve(H, g, wsum, c, min_pairs, pc_.dtype)

        c = jax.lax.fori_loop(0, iters, gn_step, T0_)
        return center_refine_clamp(c, T0_, res_f)

    return _refine(pc, tr_p, idxs_p, mask_p, T_init)


def sharded_sphere_histogram(mesh, pc, angles, sub_idxs, sphere_pts, cos_tol,
                             n_rots=72, weights=None):
    """rot-vote expansion + sphere binning with the candidate-pair axis
    sharded; the per-direction counts are additive → one psum.

    ``weights`` ([n_sub], optional): per-pair vote weights (e.g. the
    sharp_axis_votes confidence), multiplied into the padding mask — same
    semantics as the single-device ``rot_vote_sphere_count(weights=...)``.
    """
    from cppf_tpu.ops.voting import rot_vote, sphere_bin_count

    w_in = jnp.ones(angles.shape[0], jnp.float32) if weights is None else weights
    p, (idxs_p, ang_p, w_p) = _pad_pairs(mesh, sub_idxs, angles, w_in)
    pad_mask = jnp.arange(idxs_p.shape[0]) < p

    @partial(shard_map, mesh=mesh, check_vma=False,
             in_specs=(P(), P(PAIR_AXIS), P(PAIR_AXIS), P(PAIR_AXIS),
                       P(PAIR_AXIS), P()),
             out_specs=P())
    def _hist(pc_, ang_, idxs_, mask_, w_, sph_):
        cands = rot_vote(pc_, ang_, idxs_, n_rots=n_rots)
        w = jnp.repeat(mask_.astype(jnp.float32) * w_, n_rots)
        local = sphere_bin_count(cands.reshape(-1, 3), sph_, cos_tol, weights=w)
        return jax.lax.psum(local, PAIR_AXIS)

    return _hist(pc, ang_p, idxs_p, pad_mask, w_p, sphere_pts)


def _vote_axis_sharded(mesh, rng, pc, pc_normal, point_idxs, pair_mask,
                       angle_logits, aux_logits, sphere_pts, pcfg,
                       pair_weights=None, prior_gate=None):
    """Sharded twin of pipeline.pose._vote_axis (same rng draw order)."""
    rng_bin, rng_sub = jax.random.split(rng)
    p = point_idxs.shape[0]
    any_alive = jnp.any(pair_mask)
    keep = (pair_mask | ~any_alive).astype(jnp.float32)
    if pair_weights is not None:
        keep = keep * pair_weights
    cdf = jnp.cumsum(keep)
    u = jax.random.uniform(rng_sub, (pcfg.rot_subsample,)) * cdf[-1]
    sub = jnp.clip(jnp.searchsorted(cdf, u, side="right"), 0, p - 1)
    # decode only the subsampled pairs' angle bins (same draw order as the
    # single-device _vote_axis)
    bin_idx = jax.random.categorical(rng_bin, angle_logits[sub], axis=-1)
    angles_sub = bin_idx.astype(pc.dtype) / (pcfg.rot_num_bins - 1) * jnp.pi

    cos_tol = jnp.cos(jnp.deg2rad(pcfg.angle_prec))
    vote_w = None
    if pcfg.sharp_axis_votes:
        # same confidence rescaling as pipeline.pose._vote_axis
        probs = jax.nn.softmax(angle_logits[sub], axis=-1)
        uniform = 1.0 / angle_logits.shape[-1]
        vote_w = jnp.clip((jnp.max(probs, -1) - uniform) / (1.0 - uniform),
                          0.0, 1.0)
    counts = sharded_sphere_histogram(mesh, pc, angles_sub, point_idxs[sub],
                                      sphere_pts, cos_tol, n_rots=pcfg.num_rots,
                                      weights=vote_w)
    if prior_gate is not None:
        counts = jnp.where(prior_gate, counts, -1.0)

    # aux disambiguation + optional top-K re-scoring: identical replicated
    # math to pipeline.pose._vote_axis (counts are already psum'd)
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

    cos_sup = jnp.cos(jnp.deg2rad(20.0))
    cands, cand_counts = [], []
    c = counts
    for _ in range(pcfg.axis_topk):
        i = jnp.argmax(c)
        cands.append(sphere_pts[i])
        cand_counts.append(counts[i])
        near = jnp.abs(sphere_pts @ sphere_pts[i]) > cos_sup
        c = jnp.where(near, -1.0, c)
    cands = jnp.stack(cands)
    cand_counts = jnp.stack(cand_counts)
    signed, bce = jax.vmap(_signed_bce)(cands)
    ok = cand_counts >= pcfg.axis_topk_min_frac * cand_counts[0]
    bce = jnp.where(ok, bce, jnp.inf)
    return signed[jnp.argmin(bce)]


def sharded_estimate_pose(mesh, rng, point_params, ppf_params, pc, pc_normal,
                          n_valid, sphere_pts, pcfg: PoseConfig,
                          nbr_idx=None) -> PoseResult:
    """Full 9D pose with the pair axis sharded over ``mesh``.

    Matches single-device ``estimate_pose`` with the same rng up to float
    summation order, for both ``center_mode="grid"`` and the production
    ``"hier"`` branch-and-bound fast path (psum'd bound projections + refine
    windows — see :func:`cppf_tpu.parallel.mesh.sharded_ppf_vote_peak`).
    The matmul-precision context (PoseConfig.pose_f32) wraps the whole body
    — part of the single-device parity contract.
    """
    from cppf_tpu.pipeline.pose import _prec

    with _prec(pcfg):
        return _sharded_estimate_pose_body(
            mesh, rng, point_params, ppf_params, pc, pc_normal, n_valid,
            sphere_pts, pcfg, nbr_idx)


def _sharded_estimate_pose_body(mesh, rng, point_params, ppf_params, pc,
                                pc_normal, n_valid, sphere_pts,
                                pcfg: PoseConfig, nbr_idx=None) -> PoseResult:
    from cppf_tpu.models.encoders import PointEncoder
    from cppf_tpu.ops.knn import knn_indices
    from cppf_tpu.ops.voting import grid_argmax

    rng_pairs, rng_vote = jax.random.split(rng)
    n = pc.shape[0]
    valid_mask = jnp.arange(n) < n_valid

    # per-point work: replicated (cheap relative to the pair stages).
    # network half under its own precision context (pose_f32="decode"
    # resets the enclosing f32 scope to bf16 — single-device parity)
    from cppf_tpu.pipeline.pose import _prec_net, sample_pair_indices

    with _prec_net(pcfg):
        point_encoder = PointEncoder(spfcs=(32, 64, 32, 32), out_dim=32, num_layers=1)
        nbr = nbr_idx if nbr_idx is not None else knn_indices(pc, pcfg.knn, valid_mask)
        feat = point_encoder.apply(point_params, pc, pc_normal, nbr, valid_mask)

        point_idxs = sample_pair_indices(rng_pairs, pc, pc_normal, n_valid, pcfg)
        preds = sharded_ppf_head(mesh, ppf_params, pc, pc_normal, feat, point_idxs)

    # ---- decode (replicated; same draws as vote_pose) ----------------------
    rng_tr, rng_up, rng_right, rng_fallback = jax.random.split(rng_vote, 4)
    B, R = pcfg.tr_num_bins, pcfg.rot_num_bins
    tr_logits = preds[:, : 2 * B].reshape(-1, 2, B)
    up_logits = preds[:, 2 * B: 2 * B + R]
    right_logits = preds[:, 2 * B + R: 2 * B + 2 * R]
    up_aux, right_aux = preds[:, -5], preds[:, -4]
    scale_pred = preds[:, -3:]

    rng_tr0, rng_tr1 = jax.random.split(rng_tr)
    v0, v1 = pcfg.vote_range
    idx0 = jax.random.categorical(rng_tr0, tr_logits[:, 0], axis=-1)
    idx1 = jax.random.categorical(rng_tr1, tr_logits[:, 1], axis=-1)
    proj_len = idx0.astype(pc.dtype) / (B - 1) * 2 * v0 - v0
    odist = idx1.astype(pc.dtype) / (B - 1) * v1
    preds_tr = jnp.stack([proj_len, odist], -1)

    # ---- sharded center vote ----------------------------------------------
    big = jnp.asarray(1e9, pc.dtype)
    corner = jnp.min(jnp.where(valid_mask[:, None], pc, big), 0)
    top = jnp.max(jnp.where(valid_mask[:, None], pc, -big), 0)
    grid_dims = ((top - corner) / pcfg.res).astype(jnp.int32) + 1
    grid_dims = jnp.minimum(grid_dims, jnp.array(pcfg.grid_shape, jnp.int32))
    probs = jnp.ones((n,), pc.dtype)
    # coplanar-pair filter / half-space gate (replicated per-pair math; same
    # formulas and 5% starvation guard as pipeline.pose.vote_pose)
    base_mask = jnp.ones((point_idxs.shape[0],), dtype=bool)
    halfspace = None
    if pcfg.filter_coplanar or pcfg.coplanar_halfspace:
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
            n_out = jnp.where(jnp.sum(n1 * a_pts, -1, keepdims=True) > 0,
                              -n1, n1)
            halfspace = (
                a_pts, n_out, coplanar,
                jnp.asarray(pcfg.halfspace_margin * pcfg.res, pc.dtype))
        else:
            keep = ~coplanar
            base_mask = keep | (jnp.mean(keep.astype(pc.dtype)) < 0.05)
    # center-vote pair weights (mirrors pipeline.pose: separation weighting
    # per PoseConfig.pair_sep_power; per-pair math replicated, so the
    # quantile is identical on every device)
    center_mask = base_mask
    if pcfg.pair_sep_power > 0:
        sep = jnp.linalg.norm(pc[point_idxs[:, 0]] - pc[point_idxs[:, 1]],
                              axis=-1)
        sep_ref = jnp.quantile(sep, 0.75)
        sep_w = jnp.clip(sep / jnp.maximum(sep_ref, 1e-6), 0.0, 1.0)
        center_mask = base_mask * sep_w ** pcfg.pair_sep_power
    if pcfg.center_mode == "hier":
        peak_idx, grid_max = sharded_ppf_vote_peak(
            mesh, pc, preds_tr, probs, point_idxs, corner, pcfg.res,
            grid_dims, pcfg.grid_shape, n_rots=pcfg.num_rots,
            adaptive=pcfg.adaptive_voting, pair_mask=center_mask,
            splat=pcfg.splat, max_rounds=pcfg.peak_rounds,
            halfspace=halfspace)
        T_est = corner + peak_idx.astype(pc.dtype) * pcfg.res
    else:
        grid = sharded_ppf_vote(mesh, pc, preds_tr, probs, point_idxs, corner,
                                pcfg.res, grid_dims, pcfg.grid_shape,
                                n_rots=pcfg.num_rots,
                                adaptive=pcfg.adaptive_voting,
                                pair_mask=center_mask, splat=pcfg.splat,
                                halfspace=halfspace)
        T_est = grid_argmax(grid, corner, pcfg.res)
        grid_max = jnp.max(grid)

    # ---- sharded back-vote -------------------------------------------------
    _, pair_mask = sharded_backvote(mesh, pc, preds_tr, point_idxs, corner,
                                    pcfg.res, grid_dims, T_est, 3.0 * pcfg.res,
                                    n_rots=pcfg.num_rots)
    # base_mask (coplanar filter) gates CENTER votes only — see pipeline.pose
    if pcfg.subvoxel_refine:
        T_est = sharded_center_refine(mesh, pc, preds_tr, point_idxs, T_est,
                                      pair_mask & base_mask, pcfg.res)

    # ---- axes (sharded sphere histograms) ----------------------------------
    up_gate = None
    if pcfg.up_prior_deg > 0:
        prior_dir = jnp.asarray(pcfg.up_prior_dir, pc.dtype)
        up_gate = jnp.abs(sphere_pts @ prior_dir) >= jnp.cos(
            jnp.deg2rad(pcfg.up_prior_deg))
    up = _vote_axis_sharded(mesh, rng_up, pc, pc_normal, point_idxs, pair_mask,
                            up_logits, up_aux, sphere_pts, pcfg,
                            prior_gate=up_gate)
    from cppf_tpu.core.geometry import assemble_rotation, orthonormal_right

    # ---- second-pass asym-weighted center vote (mirrors pipeline.pose) -----
    if pcfg.asym_center_refine:
        from cppf_tpu.core.targets import radial_asymmetry_about

        n = pc.shape[0]
        asym_c = radial_asymmetry_about(pc, T_est, up, n_valid)
        probs_c = (0.05 + 0.95 * asym_c) * probs
        if pcfg.center_mode == "hier":
            peak_idx2, _ = sharded_ppf_vote_peak(
                mesh, pc, preds_tr, probs_c, point_idxs, corner, pcfg.res,
                grid_dims, pcfg.grid_shape, n_rots=pcfg.num_rots,
                adaptive=pcfg.adaptive_voting, pair_mask=center_mask,
                splat=pcfg.splat, max_rounds=pcfg.peak_rounds,
                halfspace=halfspace)
            T_ref = corner + peak_idx2.astype(pc.dtype) * pcfg.res
        else:
            grid2 = sharded_ppf_vote(mesh, pc, preds_tr, probs_c, point_idxs,
                                     corner, pcfg.res, grid_dims,
                                     pcfg.grid_shape, n_rots=pcfg.num_rots,
                                     adaptive=pcfg.adaptive_voting,
                                     pair_mask=center_mask, splat=pcfg.splat,
                                     halfspace=halfspace)
            T_ref = grid_argmax(grid2, corner, pcfg.res)
        from cppf_tpu.pipeline.pose import _protrusion_centroid

        u_h, gate = _protrusion_centroid(pc, T_est, up, n_valid, asym_c)
        T_est = jnp.where(
            gate, T_est + jnp.dot(T_ref - T_est, u_h) * u_h, T_est)
        _, pair_mask = sharded_backvote(mesh, pc, preds_tr, point_idxs,
                                        corner, pcfg.res, grid_dims, T_est,
                                        3.0 * pcfg.res, n_rots=pcfg.num_rots)
        if pcfg.subvoxel_refine:
            T_est = sharded_center_refine(mesh, pc, preds_tr, point_idxs,
                                          T_est, pair_mask & base_mask,
                                          pcfg.res)

    if pcfg.regress_right:
        right_w = None
        asym = None
        if pcfg.asym_right_votes or pcfg.geo_right_sign:
            from cppf_tpu.core.targets import radial_asymmetry_about

            asym = radial_asymmetry_about(pc, T_est, up, n_valid)
        if pcfg.asym_right_votes:
            right_w = 0.05 + 0.95 * jnp.maximum(
                asym[point_idxs[:, 0]], asym[point_idxs[:, 1]]
            )
        right = _vote_axis_sharded(mesh, rng_right, pc, pc_normal, point_idxs,
                                   pair_mask, right_logits, right_aux,
                                   sphere_pts, pcfg, pair_weights=right_w)
        if pcfg.geo_right_sign:
            # replicated per-point math, shared helper with pipeline.pose
            from cppf_tpu.pipeline.pose import _protrusion_centroid

            h_dir, gate = _protrusion_centroid(pc, T_est, up, n_valid, asym)
            ref_dir = (h_dir if pcfg.geo_right_dir == "direct"
                       else jnp.cross(h_dir, up))
            flip = gate & (jnp.dot(right, ref_dir) < 0)
            right = jnp.where(flip, -right, right)
        right = orthonormal_right(up, right)
    else:
        right = jnp.stack([jnp.zeros_like(up[0]), -up[2], up[1]])
        right = right / (jnp.linalg.norm(right) + 1e-9)

    degen = jnp.linalg.norm(right) < 1e-7
    rand_right = jax.random.normal(rng_fallback, (3,), pc.dtype)
    rand_right = orthonormal_right(up, rand_right)
    right = jnp.where(degen, rand_right, right)
    R_est = assemble_rotation(up, right, pcfg.z_right)

    scale_mean = jnp.asarray(pcfg.scale_mean, pc.dtype)
    pred_scale = (jnp.exp(_masked_mean(scale_pred, pair_mask, axis=0))
                  * scale_mean * pcfg.scale_multiplier)
    scale_norm = jnp.linalg.norm(pred_scale)
    RT = jnp.eye(4, dtype=pc.dtype)
    RT = RT.at[:3, :3].set(R_est * scale_norm)
    RT = RT.at[:3, 3].set(T_est)

    return PoseResult(T=T_est, R=R_est, scale=pred_scale, RT=RT,
                      scale_unit=pred_scale / scale_norm, up=up, right=right,
                      n_filtered=jnp.sum(pair_mask), grid_max=grid_max)
