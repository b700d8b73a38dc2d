"""End-to-end synthetic quality benchmark: render frames of posed primitives,
run the full inference driver with a trained checkpoint, evaluate with the
NOCS mAP protocol.

This closes the loop train → infer → eval with real numbers in any
environment (the actual NOCS REAL275 / SUN RGB-D datasets are external).

Usage:
    PYTHONPATH=. python scripts/synthetic_benchmark.py --ckpt_path checkpoints \
        --category bowl --n_frames 20 [--out_dir /tmp/synth_bench]
"""
from __future__ import annotations

import argparse
import os
import pickle
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cppf_tpu.config import load_config
from cppf_tpu.data import native
from cppf_tpu.data.shapenet import FLIP2NOCS
from cppf_tpu.data.synthetic import (
    mesh_bounds, observation_pose, random_primitive, sample_surface,
)
from cppf_tpu.eval.nocs_inference import REAL275_INTRINSICS, SYNSET_NAMES


def make_frames(out_root: str, category: str, n_frames: int, seed: int = 0,
                instances: int = 1, clutter: int = 0):
    """NOCS-format frames (depth png + detection pkl) of posed primitives.

    ``category`` may be a comma-separated list (e.g. "bowl,mug,bottle") —
    each frame then contains ``instances`` independently posed instances of
    EACH category (z-buffer composited, per-instance visibility masks), the
    multi-class workload of the real NOCS scenes.  Shapes are drawn from the
    parameter-randomised primitive families, like training.

    ``clutter`` adds that many distractor objects per frame: they occlude
    the depth composite (and thus eat into instance visibility masks) but
    appear in neither the detections nor the GT — the occlusion/partial-mask
    regime of real scenes.
    """
    import cv2

    rng = np.random.default_rng(seed)
    cats = category.split(",")
    ranges = {c: load_config(c).scale_range for c in cats}
    K = REAL275_INTRINSICS

    seg_dir = os.path.join(out_root, "seg")
    nocs_dir = os.path.join(out_root, "nocs")
    os.makedirs(seg_dir, exist_ok=True)

    for f_idx in range(n_frames):
        depths, gts, inst_cls = [], [], []
        n_inst = len(cats) * instances
        for inst in range(n_inst):
            cat = cats[inst % len(cats)]
            inst_cls.append(SYNSET_NAMES.index(cat))
            mesh = random_primitive(cat, rng)
            lo, hi = mesh_bounds(mesh)
            diag = float(np.linalg.norm(hi - lo))
            mesh = mesh._replace(vertices=mesh.vertices / diag)  # unit diagonal like training
            lo, hi = mesh_bounds(mesh)
            # GT pose of the TRAINED canonical frame (flip2nocs'd), viewed
            # from the training elevation band (objects seen from above,
            # like the real NOCS scenes)
            R, T = observation_pose(rng, is_nocs=True)
            if n_inst > 1:
                # spread instances laterally so every one stays visible
                T[0] += 0.55 * (inst - (n_inst - 1) / 2)
                T[2] += 0.25 * inst
            # training canonicalisation: unit diagonal x category scale_range
            scale = float(rng.uniform(*ranges[cat]))
            v_canon = (mesh.vertices - (lo + hi) / 2) * scale @ FLIP2NOCS.T
            v_cam_nocs = v_canon @ R.T + T
            # our rasterizer looks down -z with +y up and projects
            # v = cy - fy*y/d; the NOCS backprojection + the driver's x/y
            # re-negation recover (x, -y_render, depth), so render the
            # y-mirrored scene at -z
            v_render = v_cam_nocs * np.float32([1, -1, -1])
            depth = native.rasterize_depth(v_render, mesh.faces, K[0, 0], K[1, 1],
                                           K[0, 2], K[1, 2], 640, 480)
            bound = (hi - lo).copy()
            bound[[0, 2]] = bound[[2, 0]]
            depths.append(depth)
            gts.append((R, T, bound * scale))

        # distractor clutter: occludes, but is absent from GT + detections
        for _ in range(clutter):
            cat = cats[int(rng.integers(len(cats)))]
            mesh = random_primitive(cat, rng)
            lo, hi = mesh_bounds(mesh)
            mesh = mesh._replace(vertices=mesh.vertices / float(np.linalg.norm(hi - lo)))
            lo, hi = mesh_bounds(mesh)
            Rc, Tc = observation_pose(rng, is_nocs=True)
            Tc[0] += rng.uniform(-0.5, 0.5)
            Tc[2] += rng.uniform(0.0, 0.3)
            scale = float(rng.uniform(*ranges[cat]))
            v = (mesh.vertices - (lo + hi) / 2) * scale @ FLIP2NOCS.T @ Rc.T + Tc
            depths.append(native.rasterize_depth(
                v * np.float32([1, -1, -1]), mesh.faces, K[0, 0], K[1, 1],
                K[0, 2], K[1, 2], 640, 480))

        # z-buffer composite: each pixel belongs to the nearest object
        # (instances first, clutter after — masks below only index instances)
        stack = np.stack(depths)                      # [I+C, H, W]
        stack_inf = np.where(stack > 0, stack, np.inf)
        nearest = np.argmin(stack_inf, axis=0)
        any_hit = np.isfinite(stack_inf.min(axis=0))
        composite = np.where(any_hit, stack_inf.min(axis=0), 0.0)

        masks, bboxes, keep = [], [], []
        for inst in range(n_inst):
            mask = any_hit & (nearest == inst)
            if mask.sum() < 300:
                continue
            rows, cols = np.where(mask)
            masks.append(mask)
            bboxes.append([rows.min(), cols.min(), rows.max(), cols.max()])
            keep.append(inst)
        if not keep:
            continue

        frame_dir = os.path.join(nocs_dir, "real", "scene_1")
        os.makedirs(frame_dir, exist_ok=True)
        cv2.imwrite(os.path.join(frame_dir, f"{f_idx:04d}_depth.png"),
                    (composite * 1000).astype(np.uint16))
        cv2.imwrite(os.path.join(frame_dir, f"{f_idx:04d}_color.png"),
                    np.zeros((480, 640, 3), np.uint8))

        # NOCS GT conventions: RT holds R*|s|, gt_scales the unit scale
        gt_RTs, gt_scales = [], []
        for inst in keep:
            R, T, abs_scale = gts[inst]
            s_norm = np.linalg.norm(abs_scale)
            gt_RT = np.eye(4, dtype=np.float32)
            gt_RT[:3, :3] = R * s_norm
            gt_RT[:3, 3] = T
            gt_RTs.append(gt_RT)
            gt_scales.append(abs_scale / s_norm)
        n = len(keep)
        cls_ids = np.asarray([inst_cls[i] for i in keep], np.int32)
        result = {
            "image_path": f"data/real/scene_1/{f_idx:04d}",
            "pred_bboxes": np.asarray(bboxes, np.int32),
            "pred_masks": np.stack(masks, -1),
            "pred_class_ids": cls_ids,
            "pred_scores": np.ones(n, np.float32),
            "gt_class_ids": cls_ids,
            "gt_RTs": np.stack(gt_RTs),
            "gt_scales": np.asarray(gt_scales, np.float32),
            "gt_handle_visibility": np.ones(n, np.int32),
        }
        with open(os.path.join(seg_dir, f"results_real_scene1_{f_idx:04d}.pkl"), "wb") as f:
            pickle.dump(result, f)
    return seg_dir, nocs_dir


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt_path", default="checkpoints")
    ap.add_argument("--category", default="bowl")
    ap.add_argument("--n_frames", type=int, default=20)
    ap.add_argument("--out_dir", default="/tmp/synth_bench")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--instances", type=int, default=1,
                    help="instances per frame (>1 exercises the batched driver)")
    ap.add_argument("--clutter", type=int, default=0,
                    help="distractor objects per frame (occlude; absent from GT/detections)")
    ap.add_argument("--time_serial", action="store_true",
                    help="also time the reference-style serial driver and report speedup")
    args = ap.parse_args()

    import time

    from cppf_tpu.eval import nocs_eval, nocs_inference

    seg_dir, nocs_dir = make_frames(args.out_dir, args.category, args.n_frames,
                                    args.seed, instances=args.instances,
                                    clutter=args.clutter)
    pred_dir = os.path.join(args.out_dir, "pred")
    common = ["--seg_dir", seg_dir, "--nocs_dir", nocs_dir,
              "--ckpt_path", args.ckpt_path, "--seed", str(args.seed)]
    if args.time_serial:
        # warm the compile caches on one frame each so timings are steady-state
        warm = ["--max_frames", "1", "--out_dir", os.path.join(args.out_dir, "warm")]
        nocs_inference.main(common + warm + ["--serial"])
        nocs_inference.main(common + warm)
        t0 = time.time()
        nocs_inference.main(common + ["--out_dir", pred_dir + "_serial", "--serial"])
        t_serial = time.time() - t0
        t0 = time.time()
        nocs_inference.main(common + ["--out_dir", pred_dir])
        t_batch = time.time() - t0
        print(f"\nserial driver:  {t_serial:.2f}s  ({args.n_frames / t_serial:.2f} frames/s)")
        print(f"batched driver: {t_batch:.2f}s  ({args.n_frames / t_batch:.2f} frames/s)")
        print(f"speedup: {t_serial / t_batch:.2f}x  ({args.instances} instances/frame)")
    else:
        nocs_inference.main(common + ["--out_dir", pred_dir])
    iou_aps, pose_aps, _, _ = nocs_eval.main(["--pred_dir", pred_dir, "--subsample", "1"])
    print("\n=== synthetic benchmark summary ===")
    print(f"categories: {args.category}  frames: {args.n_frames}  instances/frame: {args.instances}")
    for cat in args.category.split(","):
        cls = SYNSET_NAMES.index(cat)
        print(f"[{cat}] 3D IoU@25: {iou_aps[cls, 25] * 100:.1f}   IoU@50: {iou_aps[cls, 50] * 100:.1f}")
        for i, deg in enumerate([5, 10, 15]):
            for j, cm in enumerate([5, 10, 15]):
                print(f"[{cat}] pose AP {deg}deg {cm}cm: {pose_aps[cls, i, j] * 100:.1f}")


if __name__ == "__main__":
    main()
