"""Proposal-contrast validation for the zero-shot regression model.

Round-2 post-mortem: the zero-shot demo (reference nocs/zero_shot.ipynb cells
8-13) depends on *proposal contrast* — object centers must accumulate sharp
heatmap peaks while background/clutter votes stay diffuse.  Training-loss
checkpoint selection optimises exactly the wrong thing for this: the
proposal count on the real demo frame degraded 612 → 0 across epochs
60 → 200 as the model sharpened on clean renders, and the usable regime
(~ep150) was never snapshotted.

This module provides the missing validation signal: a fixed synthetic
multi-object scene (two in-category objects + out-of-category clutter + a
support plane, rendered with depth noise) is scored every N epochs by the
actual proposal extractor, and the training loop snapshots ``params_zs`` on
the best score — selecting for the capability the checkpoint is *for*.
"""
from __future__ import annotations

import logging
from typing import List, Tuple

import numpy as np

log = logging.getLogger("cppf_tpu.contrast_val")


def make_val_scene(category: str = "bowl", seed: int = 12345,
                   noise: float = 1.0) -> Tuple[np.ndarray, List[np.ndarray]]:
    """A deterministic cluttered depth frame in demo format (mm uint16).

    Two posed instances of ``category`` (drawn from the compositional family)
    plus a box and a cylinder of comparable size as out-of-category clutter,
    standing on a support slab — the structures whose votes must stay
    diffuse.  Returns (depth_mm, gt_centers) with centers in the zero-shot
    cloud frame (backproject negates x/y, the script re-negates x/y, so
    x, y pass through and z = +depth; see tests/test_zero_shot.py).
    """
    from cppf_tpu.data import native
    from cppf_tpu.data.shapenet import TRAIN_INTRINSICS, apply_depth_noise
    from cppf_tpu.data.synthetic import make_box, make_cylinder, random_primitive
    from cppf_tpu.core.geometry import rotx

    rng = np.random.default_rng(seed)
    K = TRAIN_INTRINSICS
    depth = np.zeros((480, 640), np.float32)

    def splat(verts, faces):
        d = native.rasterize_depth(verts.astype(np.float32), faces,
                                   K[0, 0], K[1, 1], K[0, 2], K[1, 2], 640, 480)
        nonlocal depth
        depth = np.where((depth == 0) | ((d > 0) & (d < depth)), d, depth)

    # support slab under everything (the table plane of the demo frame)
    slab = make_box((1.2, 0.02, 0.9))
    R_slab = rotx(np.deg2rad(30))[:3, :3]
    splat(slab.vertices @ R_slab.T + np.float32([0, -0.12, -0.85]), slab.faces)

    gt_centers = []
    # comparable depth/size so both peaks clear the notebook's 0.7·max
    # continuation rule when the model is sharp
    placements = [np.float32([-0.14, -0.02, -0.72]), np.float32([0.13, 0.0, -0.76])]
    for c in placements:
        mesh = random_primitive(category, rng)
        v = mesh.vertices
        diag = np.linalg.norm(v.max(0) - v.min(0))
        v = (v - (v.min(0) + v.max(0)) / 2) / diag * rng.uniform(0.2, 0.24)
        yaw = rng.uniform(0, 2 * np.pi)
        Ry = np.array([[np.cos(yaw), 0, np.sin(yaw)], [0, 1, 0],
                       [-np.sin(yaw), 0, np.cos(yaw)]], np.float32)
        splat(v @ (rotx(np.deg2rad(20))[:3, :3] @ Ry).T + c, mesh.faces)
        gt_centers.append(np.array([c[0], c[1], -c[2]]))

    # out-of-category clutter: a box and a lying cylinder
    box = make_box((0.12, 0.09, 0.07))
    splat(box.vertices @ rotx(np.deg2rad(15))[:3, :3].T + np.float32([-0.02, -0.06, -0.95]),
          box.faces)
    cyl = make_cylinder(0.035, 0.16)
    Rz = np.array([[0, -1, 0], [1, 0, 0], [0, 0, 1]], np.float32)
    splat(cyl.vertices @ Rz.T + np.float32([0.3, -0.08, -0.65]), cyl.faces)

    if noise > 0:
        depth = apply_depth_noise(depth, rng, noise)
    return (depth * 1000).astype(np.uint16), gt_centers


def proposal_contrast_score(
    depth: np.ndarray,
    gt_centers: List[np.ndarray],
    params: dict,
    cfg,
    n_pairs: int = 500000,
    num_rots: int = 36,
    # contrast scales ~linearly with pairs for true peaks but only ~sqrt for
    # vote noise; at 500k pairs the oracle's weakest-object contrast is ~38
    # and diffuse-vote noise ~2 (measured), so 10 sits safely between
    prop_thresh: float = 10.0,
    hit_tol: float = 0.05,
    seed: int = 0,
    predict_fn=None,
) -> dict:
    """Score the proposal quality of a regression checkpoint on a scene.

    Each object is scored independently (the notebook's sequential
    extraction couples proposals through its 0.7·max continuation rule,
    which would let one strong peak mask a weaker-but-clean one):

    - hit_i: the boundary contrast (notebook cell-9 peak score) at the local
      heatmap argmax within ``hit_tol`` of GT center i exceeds ``thresh``;
    - false positives: proposals the notebook extractor finds after the GT
      peak regions are suppressed — clutter/background peaks that would
      produce junk detections on a real frame;
    - score = 100·hits − 5·false + min(mean_hit_contrast/thresh, 10) (the
      bounded sharpness bonus breaks ties without outvoting a miss).
    """
    from scipy.ndimage import gaussian_filter

    from cppf_tpu.data.shapenet import TRAIN_INTRINSICS
    from cppf_tpu.eval.zero_shot import (
        boundary_contrast, extract_proposals_host, zero_shot_heatmap,
    )

    hm = zero_shot_heatmap(depth, params, cfg, intrinsics=TRAIN_INTRINSICS,
                           n_pairs=n_pairs, num_rots=num_rots, seed=seed,
                           predict_fn=predict_fn)
    sm = gaussian_filter(hm.grid, sigma=1)
    grid_fp = hm.grid.copy()
    tol_vox = max(1, int(round(hit_tol / cfg.res)))
    hits, hit_diffs = 0, []
    for c in gt_centers:
        loc_c = np.round((c - hm.corner) / cfg.res).astype(int)
        lo = np.maximum(loc_c - tol_vox, 0)
        hi = np.minimum(loc_c + tol_vox + 1, np.array(sm.shape))
        sub = sm[lo[0]:hi[0], lo[1]:hi[1], lo[2]:hi[2]]
        if sub.size == 0:
            continue
        loc = lo + np.array(np.unravel_index(np.argmax(sub), sub.shape))
        diff, lll, rrr = boundary_contrast(sm, loc)
        if diff > prop_thresh:
            hits += 1
            hit_diffs.append(diff)
        grid_fp[lll[0]:rrr[0], lll[1]:rrr[1], lll[2]:rrr[2]] = 0  # suppress GT
    # spurious peaks anywhere else (run the real extractor on the remainder)
    false = len(extract_proposals_host(grid_fp, hm.corner, cfg.res, thresh=prop_thresh))
    bonus = min(float(np.mean(hit_diffs)) / prop_thresh, 10.0) if hit_diffs else 0.0
    score = 100.0 * hits - 5.0 * false + bonus
    return {
        "zs_score": score,
        "zs_hits": hits,
        "zs_false": false,
        "zs_mean_contrast": float(np.mean(hit_diffs)) if hit_diffs else 0.0,
    }
