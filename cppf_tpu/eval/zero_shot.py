"""Zero-shot joint instance segmentation + 9D pose on a raw RGB-D frame.

Equivalent of reference ``nocs/zero_shot.ipynb``: a *regression-variant*
checkpoint (out_dim = 2+2+2+3 = 9; cls_bins=False) predicts raw
(proj_len, dist2o, ψ_up, ψ_right, aux₂, log-scale₃) per pair; then

1. whole-frame backprojection, two-level voxel quantisation (features at
   ``res``, voting cloud at ``4·res``) — notebook cell 3;
2. 5M random pairs, with indistinguishable coplanar pairs filtered out
   (|n₁·n₂|>0.9 and both normals ⟂ the pair axis) — cell 6;
3. one global adaptive center-vote heatmap — cell 8;
4. Gaussian-smoothed iterative peak proposals with box-boundary contrast
   threshold and suppression — cell 9;
5. per proposal: back-vote filter → unsupervised instance mask from pair
   membership counts (contrib > 12) → axis voting + aux flip → R/T/S —
   cell 11.  (The notebook also recomputes a fine center grid it never
   reads; we skip that dead work.)

Usage:
    python -m cppf_tpu.eval.zero_shot --ckpt checkpoints/bowl_reg \
        [--color data/demo/0000_color.png --depth data/demo/0000_depth.png]
"""
from __future__ import annotations

import argparse
import logging
from typing import List, NamedTuple

import numpy as np

log = logging.getLogger("cppf_tpu.zero_shot")

DEMO_INTRINSICS = np.array([[591.0125, 0, 322.525], [0, 590.16775, 244.11084], [0, 0, 1]])


class Detection(NamedTuple):
    T: np.ndarray
    R: np.ndarray
    scale: np.ndarray       # absolute 3D scale
    RT: np.ndarray          # [4,4] R*|s| convention
    mask: np.ndarray        # [n_points] bool instance mask on the voting cloud
    score: float


def boundary_contrast(smoothed: np.ndarray, loc: np.ndarray, margin: int = 10):
    """Notebook cell-9 peak score: peak value minus the mean over the 12
    edges of the ``margin``-box boundary around ``loc``."""
    lll = np.maximum(np.zeros(3, int), loc - margin)
    rrr = np.minimum(np.array(smoothed.shape) - 1, loc + margin)
    nbr_val = (
        np.mean(smoothed[lll[0]:rrr[0], lll[1], lll[2]])
        + np.mean(smoothed[lll[0]:rrr[0], lll[1], rrr[2]])
        + np.mean(smoothed[lll[0]:rrr[0], rrr[1], lll[2]])
        + np.mean(smoothed[lll[0]:rrr[0], rrr[1], rrr[2]])
        + np.mean(smoothed[lll[0], lll[1]:rrr[1], lll[2]])
        + np.mean(smoothed[lll[0], lll[1]:rrr[1], rrr[2]])
        + np.mean(smoothed[rrr[0], lll[1]:rrr[1], lll[2]])
        + np.mean(smoothed[rrr[0], lll[1]:rrr[1], rrr[2]])
        + np.mean(smoothed[lll[0], lll[1], lll[2]:rrr[2]])
        + np.mean(smoothed[lll[0], rrr[1], lll[2]:rrr[2]])
        + np.mean(smoothed[rrr[0], lll[1], lll[2]:rrr[2]])
        + np.mean(smoothed[rrr[0], rrr[1], lll[2]:rrr[2]])
    ) / 12
    diff = smoothed[loc[0], loc[1], loc[2]] - nbr_val
    return float(diff), lll, rrr


def extract_proposals_host(grid: np.ndarray, corner: np.ndarray, res: float,
                           thresh: float = 50.0, margin: int = 10):
    """Notebook cell-9 proposal logic, verbatim semantics (host NumPy)."""
    from scipy.ndimage import gaussian_filter

    smoothed = gaussian_filter(grid, sigma=1)
    proposals = []
    max_val = None
    while True:
        loc = np.array(np.unravel_index(np.argmax(smoothed), smoothed.shape))
        diff, lll, rrr = boundary_contrast(smoothed, loc, margin)
        if diff > thresh:
            if max_val is None:
                max_val = diff
            proposals.append((corner + loc * res, float(diff)))
        if diff < thresh or diff < max_val * 0.7:
            break
        smoothed[lll[0]:rrr[0], lll[1]:rrr[1], lll[2]:rrr[2]] = 0
    return proposals


def scene_planes(pc: np.ndarray, fit_tol: float = 0.008,
                 member_tol: float = 0.015, min_frac: float = 0.2,
                 min_extent: float = 0.3, max_planes: int = 2,
                 seed: int = 0) -> np.ndarray:
    """Membership mask of the dominant support surfaces (table, wall).

    Up to ``max_planes`` rounds of :func:`cppf_tpu.ops.ransac.segment_plane`
    at ``fit_tol``.  A round's plane counts as a support surface only if it
    holds ≥ ``min_frac`` of the remaining points AND its inlier patch spans
    ≥ ``min_extent`` along *both* in-plane principal axes — a table or wall
    is wide in every direction, whereas RANSAC's best plane through a curved
    object is a tangent band only a few cm across, so object sheets are never
    classified as support surfaces regardless of scene size.  Membership is
    re-evaluated against the accepted plane equations at the looser
    ``member_tol`` (sensor noise on a table top is wider than the fit band).
    """
    import jax
    import jax.numpy as jnp

    from cppf_tpu.ops.ransac import segment_plane

    on_plane = np.zeros(len(pc), bool)
    remaining = np.arange(len(pc))
    for k in range(max_planes):
        if len(remaining) < 100:
            break
        plane, mask = segment_plane(jax.random.PRNGKey(seed + k),
                                    jnp.asarray(pc[remaining]), fit_tol,
                                    num_iterations=200)
        mask = np.asarray(mask)
        if mask.sum() < min_frac * len(remaining):
            break
        plane = np.asarray(plane)
        inl = pc[remaining[mask]]
        cen = inl - inl.mean(0)
        in_plane = cen - np.outer(cen @ plane[:3], plane[:3])
        cov = in_plane.T @ in_plane / max(len(inl), 1)
        evals, evecs = np.linalg.eigh(cov)
        # two largest eigenvectors span the plane; extent along each
        spans = [np.ptp(in_plane @ evecs[:, j]) for j in (1, 2)]
        remaining = remaining[~mask]
        if min(spans) < min_extent:
            continue
        on_plane |= np.abs(pc @ plane[:3] + plane[3]) < member_tol
    return on_plane


def rank_proposals(hm: "HeatmapState", proposals, res: float,
                   nms_radius: float = 0.15, contrib_thresh: int = 12,
                   plane_veto: float = 0.5):
    """Object-evidence re-ranking of the cell-9 proposals.

    This is an addition over reference ``nocs/zero_shot.ipynb`` cell 9: the
    notebook's margin-box suppression covers only 2·margin·res ≈ 8 cm — less
    than one bowl — so a single object yields several proposals, and diffuse
    table-top vote mass competes on boundary contrast alone.  Three stages:

    1. **score** = boundary contrast × tight support, where tight support
       counts the pairs whose vote circle passes within one voxel (``res``)
       of the proposal center (:func:`cppf_tpu.ops.voting.circle_support`):
       contrast measures peak sharpness, tight support how much pair
       evidence is *exactly* consistent with the center — clutter peaks are
       built from grazing circles.
    2. greedy 3D **NMS** at ``nms_radius`` (default: half the notebook's
       ``object_scale`` = 0.3 pair-sampling radius, cell 1) keeps the
       best-scored proposal per object;
    3. **support-surface veto**: a survivor whose unsupervised instance mask
       (membership pairs at 3·res, contrib > ``contrib_thresh`` — the cell-11
       recipe) lies > ``plane_veto`` on a dominant scene plane
       (:func:`scene_planes`) is a table/wall phantom, not a free-standing
       object, and is dropped.

    Returns the surviving ``(T_est, score)`` list, best first.
    """
    import jax.numpy as jnp

    from cppf_tpu.ops.voting import circle_support

    if not proposals:
        return []
    pc_j = jnp.asarray(hm.pc)
    tr_j = jnp.asarray(hm.preds[:, :2])
    idx_j = jnp.asarray(hm.point_idxs)
    scored = []
    for T_est, diff in proposals:
        tight = circle_support(pc_j, tr_j, idx_j,
                               jnp.asarray(T_est, jnp.float32), res)
        scored.append((T_est, diff * float(jnp.sum(tight))))
    scored.sort(key=lambda p: -p[1])

    kept = []
    for T_est, score in scored:
        if all(np.linalg.norm(T_est - k[0]) > nms_radius for k in kept):
            kept.append((T_est, score))

    on_plane = scene_planes(hm.pc)
    out = []
    for T_est, score in kept:
        loose = np.asarray(circle_support(pc_j, tr_j, idx_j,
                                          jnp.asarray(T_est, jnp.float32),
                                          3 * res))
        contrib = np.bincount(hm.point_idxs[loose].reshape(-1),
                              minlength=len(hm.pc))
        sel = contrib > contrib_thresh
        if sel.sum() and on_plane[sel].mean() > plane_veto:
            continue
        out.append((T_est, score))
    return out


def filter_degenerate_pairs(pc, pc_normal, point_idxs):
    """Drop coplanar-indistinguishable pairs (notebook cell 6)."""
    n1 = pc_normal[point_idxs[:, 0]]
    n2 = pc_normal[point_idxs[:, 1]]
    ab = pc[point_idxs[:, 0]] - pc[point_idxs[:, 1]]
    ab = ab / (np.linalg.norm(ab, axis=-1, keepdims=True) + 1e-7)
    bad = (
        (np.abs(np.sum(n1 * n2, -1)) > 0.9)
        & (np.abs(np.sum(ab * n1, -1)) < 0.1)
        & (np.abs(np.sum(ab * n2, -1)) < 0.1)
    )
    return point_idxs[~bad]


class HeatmapState(NamedTuple):
    """Everything cells 3-8 produce (consumed by the per-proposal loop and by
    the training-time proposal-contrast validation)."""
    pc: np.ndarray
    pc_normal: np.ndarray
    point_idxs: np.ndarray
    preds: np.ndarray
    grid: np.ndarray
    corner: np.ndarray
    dims: np.ndarray


def _sparse_frame_grid(pc, preds_tr, point_idxs, corner, dims, res,
                       num_rots: int, n_cands: int = 24,
                       window: int = 48, coarse_pool: int = 8,
                       pair_budget: int = 1 << 17,
                       keep_mass: float = 50.0,
                       halo: int = 13) -> np.ndarray:
    """Whole-frame heatmap without the XLA scatter (~0.1 G adds/s wall).

    Two fused-Pallas passes (cppf_tpu.ops.pallas.vote_hist.dense_hist):

    1. a ``coarse_pool``³-pooled grid of the whole frame (pooled (y,z) plane
       small enough to live in VMEM) ranks candidate regions — a coarse
       cell's value upper-bounds every fine voxel inside it (SUM over the
       cell ≥ max inside it), so a cell whose coarse mass is below the
       proposal threshold can never host a proposal;
    2. per candidate, an exact fine ``window``³ sub-grid over only the pairs
       whose vote circle can reach the window (host prefilter on the circle
       center/radius).

    Candidate acceptance: the top ``n_cands`` cells PLUS every further cell
    with coarse mass ≥ ``keep_mass`` (default = extract_proposals_host's
    default ``thresh``), hard-capped at ``4 * n_cands`` with a loud log of
    what was dropped (no-silent-caps convention) — a sharp low-total-mass
    peak therefore cannot be crowded out by diffuse high-mass regions unless
    the scene has >4·n_cands above-threshold cells.

    Only the cell-centered core of each window — the coarse cell dilated by
    ``halo`` (= proposal margin 10 + 3σ of the gaussian smoothing) — is
    written to the output: core voxels and their entire contrast
    neighbourhood are exact, so no peak can score against the zeroed
    background (a full-window write let ring peaks from non-candidate
    neighbour cells read zeros just outside the border and inflate their
    boundary contrast).  Proposal-level equality with the scatter path is
    pinned in tests/test_zero_shot.py.
    """
    import jax.numpy as jnp

    from cppf_tpu.ops.voting import ppf_vote_dense

    gshape_c = tuple(int(np.ceil(d / coarse_pool / 8) * 8) * coarse_pool
                     for d in dims)
    n = pc.shape[0]
    coarse = np.asarray(ppf_vote_dense(
        jnp.asarray(pc), jnp.asarray(preds_tr), jnp.ones(n, np.float32),
        jnp.asarray(point_idxs), jnp.asarray(corner), res, jnp.asarray(dims),
        gshape_c, n_rots=num_rots, adaptive=True, splat="trilinear",
        pool=(coarse_pool,) * 3))

    order = np.argsort(coarse.reshape(-1))[::-1]
    masses = coarse.reshape(-1)[order]
    n_above = int(np.sum(masses >= keep_mass))
    hard_cap = 4 * n_cands
    n_keep = min(max(n_cands, n_above), hard_cap)
    if n_above > hard_cap:
        log.warning(
            "sparse grid candidate cap: %d cells above keep_mass=%.0f but "
            "keeping only %d (boundary coarse mass %.1f) — peaks in the "
            "dropped cells are NOT scored", n_above, keep_mass, hard_cap,
            float(masses[hard_cap - 1]))
    flat = order[:n_keep]
    cands = np.stack(np.unravel_index(flat, coarse.shape), -1)
    cands = cands[coarse.reshape(-1)[flat] > 0]

    # host pair prefilter quantities: circle center + radius per pair
    a = pc[point_idxs[:, 0]]
    b = pc[point_idxs[:, 1]]
    d = a - b
    du = d / (np.linalg.norm(d, axis=-1, keepdims=True) + 1e-7)
    cc = a - preds_tr[:, :1] * du
    rad = np.abs(preds_tr[:, 1])

    out = np.zeros(tuple(int(x) for x in dims), np.float32)
    wshape = (window,) * 3
    half = window // 2
    for cell in cands:
        wo = np.clip(cell * coarse_pool + coarse_pool // 2 - half, 0,
                     np.maximum(np.asarray(dims) - window, 0)).astype(int)
        wc_world = corner + (wo + half) * res
        reach = rad + (half * np.sqrt(3) + 2) * res
        keep = np.flatnonzero(np.linalg.norm(cc - wc_world, axis=-1) <= reach)
        if len(keep) == 0:
            continue
        comp = 1.0
        if len(keep) > pair_budget:
            # stride-subsample over budget; compensate the lost vote mass so
            # window peak heights stay comparable across windows (vote weight
            # is max(probs[a], probs[b]) — a uniform probs vector scales it)
            stride = len(keep) // pair_budget + 1
            keep = keep[::stride]
            comp = float(stride)
        sel = np.zeros((pair_budget, 2), np.int32)
        msk = np.zeros((pair_budget,), bool)
        sel[: len(keep)] = point_idxs[keep]
        msk[: len(keep)] = True
        ptr = np.zeros((pair_budget, 2), np.float32)
        ptr[: len(keep)] = preds_tr[keep]
        win = np.asarray(ppf_vote_dense(
            jnp.asarray(pc), jnp.asarray(ptr), jnp.full(n, comp, np.float32),
            jnp.asarray(sel), jnp.asarray(corner + wo * res, np.float32), res,
            jnp.asarray(np.minimum(np.asarray(dims) - wo, window), np.int32),
            wshape, n_rots=num_rots, adaptive=True, splat="trilinear",
            pair_mask=jnp.asarray(msk)))
        # write only the exact-halo core: the coarse cell (+1 voxel of
        # trilinear spill) dilated by `halo`, clipped to window ∩ grid —
        # see the docstring's boundary-contrast argument
        cell_lo = cell * coarse_pool - 1 - halo
        cell_hi = (cell + 1) * coarse_pool + 1 + halo
        lo = np.maximum(np.maximum(cell_lo, wo), 0)
        hi = np.minimum(np.minimum(cell_hi, wo + window), np.asarray(dims))
        if np.any(lo >= hi):
            continue
        sl = tuple(slice(int(l), int(h)) for l, h in zip(lo, hi))
        wl = tuple(slice(int(l - o), int(h - o)) for l, h, o in zip(lo, hi, wo))
        out[sl] = win[wl]
    return out


def zero_shot_heatmap(
    depth: np.ndarray,
    params: dict,
    cfg,
    intrinsics: np.ndarray = DEMO_INTRINSICS,
    n_pairs: int = 5000000,
    num_rots: int = 72,
    seed: int = 0,
    predict_fn=None,
    sparse: bool | None = None,
) -> HeatmapState:
    """Notebook cells 3-8: whole-frame cloud → pairs → predictions → global
    adaptive center-vote heatmap.

    ``sparse`` selects the two-pass Pallas path (:func:`_sparse_frame_grid`)
    instead of the XLA scatter for the heatmap; ``None`` auto-enables it on
    TPU for large workloads (the scatter serialises at ~0.1 G adds/s — whole
    seconds on the notebook's 5M-pair frame)."""
    import jax.numpy as jnp

    from cppf_tpu.core.geometry import backproject
    from cppf_tpu.models.encoders import PointEncoder, PPFEncoder
    from cppf_tpu.ops.knn import knn_indices
    from cppf_tpu.ops.normals import estimate_normals
    from cppf_tpu.ops.voting import ppf_vote
    from cppf_tpu.data.native import voxel_downsample_host

    rng = np.random.default_rng(seed)
    res = cfg.res
    knn = cfg.knn

    # --- cell 3: whole-frame cloud, two-level quantisation ------------------
    pc_full, _ = backproject(depth, intrinsics, np.ones_like(depth, dtype=bool))
    pc_full = pc_full / 1000.0
    pc_full = pc_full + np.clip(res / 4 * rng.standard_normal(pc_full.shape), -res / 2, res / 2)
    pc_full[:, 0] = -pc_full[:, 0]
    pc_full[:, 1] = -pc_full[:, 1]

    hi_idx = voxel_downsample_host(pc_full.astype(np.float32), res)
    high_pc = pc_full[hi_idx].astype(np.float32)
    nbr_idx = knn_indices(jnp.asarray(high_pc), knn)
    high_normal = np.asarray(estimate_normals(jnp.asarray(high_pc), knn, nbr_idx=nbr_idx))

    lo_idx = voxel_downsample_host(high_pc, res * 4)
    pc = high_pc[lo_idx]
    pc_normal = high_normal[lo_idx]
    n = len(pc)
    log.info("clouds: %d full -> %d high -> %d sparse", len(pc_full), len(high_pc), n)

    # --- cells 5-7: pairs, filter, features ---------------------------------
    point_idxs = rng.integers(0, n, (n_pairs, 2))
    point_idxs = filter_degenerate_pairs(pc, pc_normal, point_idxs).astype(np.int32)
    log.info("pairs after degenerate filter: %d", len(point_idxs))

    if predict_fn is not None:
        preds = np.asarray(predict_fn(pc, pc_normal, point_idxs))
    else:
        point_enc = PointEncoder(spfcs=(32, 64, 32, 32), out_dim=32, num_layers=1)
        ppf_enc = PPFEncoder(ppffcs=(84, 32, 32, 16), out_dim=9)
        feat_high = point_enc.apply(params["point"], jnp.asarray(high_pc),
                                    jnp.asarray(high_normal), nbr_idx)
        feat = feat_high[jnp.asarray(lo_idx)]
        preds = np.asarray(
            ppf_enc.apply(params["ppf"], jnp.asarray(pc), jnp.asarray(pc_normal), feat,
                          jnp.asarray(point_idxs))
        )

    # --- cell 8: global heatmap (always adaptive) ----------------------------
    corner = pc.min(0)
    dims = ((pc.max(0) - corner) / res).astype(np.int32) + 1
    if sparse is None:
        import jax

        sparse = (jax.default_backend() == "tpu"
                  and len(point_idxs) * num_rots > 20_000_000)
    if sparse:
        grid = _sparse_frame_grid(pc, preds[:, :2].astype(np.float32),
                                  point_idxs, corner, dims, res, num_rots)
    else:
        gshape = tuple(int(np.ceil(d / 8) * 8) for d in dims)
        grid = np.asarray(ppf_vote(
            jnp.asarray(pc), jnp.asarray(preds[:, :2]), jnp.ones(n, np.float32),
            jnp.asarray(point_idxs), jnp.asarray(corner), res, jnp.asarray(dims),
            gshape, n_rots=num_rots, adaptive=True,
        ))[: dims[0], : dims[1], : dims[2]]
    return HeatmapState(pc, pc_normal, point_idxs, preds, grid, corner, dims)


def zero_shot_detect(
    depth: np.ndarray,
    params: dict,
    cfg,
    intrinsics: np.ndarray = DEMO_INTRINSICS,
    n_pairs: int = 5000000,
    num_rots: int = 72,
    angle_tol: float = 2.0,
    prop_thresh: float = 50.0,
    contrib_thresh: int = 12,
    seed: int = 0,
    predict_fn=None,
    nms_radius: float = 0.15,
    anchor_t: bool = True,
) -> List[Detection]:
    hm = zero_shot_heatmap(depth, params, cfg, intrinsics, n_pairs, num_rots,
                           seed, predict_fn)
    return detect_from_heatmap(hm, cfg, num_rots=num_rots,
                               angle_tol=angle_tol, prop_thresh=prop_thresh,
                               contrib_thresh=contrib_thresh, seed=seed,
                               nms_radius=nms_radius, anchor_t=anchor_t)


def detect_from_heatmap(
    hm: HeatmapState,
    cfg,
    num_rots: int = 72,
    angle_tol: float = 2.0,
    prop_thresh: float = 50.0,
    contrib_thresh: int = 12,
    seed: int = 0,
    nms_radius: float = 0.15,
    anchor_t: bool = True,
) -> List[Detection]:
    """Cells 9-11 given a precomputed :class:`HeatmapState` (cells 3-8).

    ``anchor_t`` (default on, an addition over the reference notebook)
    replaces the raw heatmap-peak center with the observed-extent box
    anchor (:mod:`cppf_tpu.eval.anchor`) — the regression decode's center
    bias toward visible surface mass (~15-40 mm here) otherwise zeroes the
    3D-IoU of detections whose pose is fine.
    """
    import jax.numpy as jnp

    from cppf_tpu.core.geometry import fibonacci_sphere
    from cppf_tpu.ops.voting import backvote, rot_vote, sphere_bin_count

    rng = np.random.default_rng(seed)
    res = cfg.res
    pc, pc_normal, point_idxs = hm.pc, hm.pc_normal, hm.point_idxs
    corner, dims, grid = hm.corner, hm.dims, hm.grid
    n = len(pc)
    preds_tr = hm.preds[:, :2]
    preds_up = hm.preds[:, 2]
    preds_up_aux = hm.preds[:, 4]
    preds_scale = hm.preds[:, 6:9]

    # --- cell 9: proposals + object-evidence re-rank -------------------------
    proposals = extract_proposals_host(grid, corner, res, thresh=prop_thresh)
    log.info("%d raw proposals", len(proposals))
    proposals = rank_proposals(hm, proposals, res, nms_radius=nms_radius,
                               contrib_thresh=contrib_thresh)
    log.info("%d proposals after support re-rank + NMS", len(proposals))

    sphere = fibonacci_sphere(int(4 * np.pi / np.deg2rad(angle_tol))).astype(np.float32)
    cos_tol = np.cos(np.deg2rad(angle_tol))
    detections: List[Detection] = []

    for T_est, diff in proposals:
        # back-vote membership (cell 11)
        _, pmask = backvote(
            jnp.asarray(pc), jnp.asarray(preds_tr), jnp.asarray(point_idxs),
            jnp.asarray(corner), res, jnp.asarray(dims),
            jnp.asarray(T_est, jnp.float32), 3 * res, n_rots=num_rots,
        )
        pmask = np.asarray(pmask)
        masked = point_idxs[pmask]
        if len(masked) == 0:
            continue
        contrib = np.bincount(masked.reshape(-1), minlength=n)
        pc_sel = contrib > contrib_thresh
        keep = pc_sel[masked[:, 0]] | pc_sel[masked[:, 1]]
        masked = masked[keep]
        if len(masked) < 10:
            continue

        # axis voting on up to 10k member pairs
        member_angles = preds_up[pmask][keep]
        perm = rng.permutation(len(masked))[:10000]
        sub = masked[perm]
        cands = np.asarray(rot_vote(
            jnp.asarray(pc), jnp.asarray(member_angles[perm]),
            jnp.asarray(sub), n_rots=num_rots,
        ))
        counts = np.asarray(sphere_bin_count(
            jnp.asarray(cands.reshape(-1, 3)), jnp.asarray(sphere), cos_tol))
        best_up = sphere[np.argmax(counts)]

        # aux disambiguation over member pairs
        ab = pc[masked[:, 0]] - pc[masked[:, 1]]
        abu = ab / (np.linalg.norm(ab, axis=-1, keepdims=True) + 1e-7)
        nrm = pc_normal[masked[:, 0]].copy()
        nrm[np.sum(nrm * abu, -1) < 0] *= -1
        target = (np.sum(nrm * best_up, -1) > 0).astype(np.float32)
        logits = preds_up_aux[pmask][keep]
        def bce(t):
            return np.mean(np.maximum(logits, 0) - logits * t + np.log1p(np.exp(-np.abs(logits))))
        up = -best_up if bce(1.0 - target) < bce(target) else best_up

        right = np.array([0, -up[2], up[1]])
        right = right / np.linalg.norm(right)
        R_est = np.stack([right, up, np.cross(right, up)], -1)

        pred_scale = np.mean(np.exp(preds_scale[pmask][keep]) * np.asarray(cfg.scale_mean) * 2, 0)
        if anchor_t:
            from cppf_tpu.eval.anchor import anchor_box_t

            T_est = anchor_box_t(T_est, R_est, pred_scale, pc[pc_sel])
        s_norm = np.linalg.norm(pred_scale)
        RT = np.eye(4)
        RT[:3, :3] = R_est * s_norm
        RT[:3, 3] = T_est
        detections.append(Detection(T_est, R_est, pred_scale, RT, pc_sel, diff))

    return detections


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--ckpt", required=True, help="regression-variant checkpoint dir")
    parser.add_argument("--color", default="data/demo/0000_color.png")
    parser.add_argument("--depth", default="data/demo/0000_depth.png")
    parser.add_argument("--out", default="zero_shot_vis.png")
    parser.add_argument("--n_pairs", type=int, default=5000000)
    parser.add_argument("--params_name", default=None,
                        help="checkpoint state to load (default: params_zs "
                             "if present — the proposal-contrast-selected "
                             "state — else params_best/best)")
    args = parser.parse_args(argv)

    import cv2

    from cppf_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from cppf_tpu.config import load_config
    from cppf_tpu.core.geometry import (
        calculate_2d_projections, get_3d_bbox, transform_coordinates_3d,
    )
    from cppf_tpu.train.checkpoints import maybe_load_any
    import os

    snap = os.path.join(args.ckpt, "config.yaml")
    cfg = load_config("bowl", snapshot=snap if os.path.exists(snap) else None)
    cfg.cls_bins = False
    if args.params_name:
        params = maybe_load_any(args.ckpt, name=args.params_name)
    else:
        # prefer the proposal-contrast-selected state: best-train-loss
        # selection provably destroys the zero-shot regime (round-2
        # postmortem; eval/contrast_val.py)
        params = (maybe_load_any(args.ckpt, name="params_zs")
                  or maybe_load_any(args.ckpt, name="params_best")
                  or maybe_load_any(args.ckpt, name="best"))
    assert params is not None, f"no checkpoint under {args.ckpt}"

    depth = cv2.imread(args.depth, -1)
    dets = zero_shot_detect(depth, params, cfg, n_pairs=args.n_pairs)
    print(f"{len(dets)} detections")
    img = cv2.imread(args.color)[:, :, ::-1].copy()
    for d in dets:
        bbox3d = get_3d_bbox(d.scale / np.linalg.norm(d.scale), 0)
        proj = calculate_2d_projections(transform_coordinates_3d(bbox3d, d.RT), DEMO_INTRINSICS)
        for i, j in [(0, 1), (0, 2), (1, 3), (2, 3), (4, 5), (4, 6), (5, 7), (6, 7),
                     (0, 4), (1, 5), (2, 6), (3, 7)]:
            cv2.line(img, tuple(proj[i]), tuple(proj[j]), (255, 0, 0), 2)
        print("T:", d.T, "scale:", d.scale)
    cv2.imwrite(args.out, img[:, :, ::-1])
    print(f"wrote {args.out}")


if __name__ == "__main__":
    logging.basicConfig(level=logging.INFO, force=True)
    main()
