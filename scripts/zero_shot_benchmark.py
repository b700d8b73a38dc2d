"""Zero-shot detection quantified through the NOCS mAP protocol.

VERDICT r4 item 8: the zero-shot path (whole-frame heatmap -> proposals ->
per-instance pose, reference ``nocs/zero_shot.ipynb`` cells 9-13) previously
had only demo-frame pins (2 bowls detected).  This script renders
multi-instance synthetic frames (the same generator as
``synthetic_benchmark.py``), runs zero-shot detection with NO detection
priors, and scores the detections with the bit-parity mAP protocol
(``eval/metrics.py``) — proposals are ranked by their boundary-contrast
score, so AP reflects both detection recall and pose quality.

The zero-shot head is class-agnostic (a regression checkpoint trained on one
category family); every detection is scored against the rendered category's
GT, which is exactly the notebook's setting (bowls on a table).

Usage (TPU):
    PYTHONPATH=/root/repo:/root/.axon_site python scripts/zero_shot_benchmark.py \
        --n_frames 8 --instances 2 [--clutter 1] [--n_pairs 2000000]
CPU smoke: add --cpu --n_pairs 200000 --n_frames 2
"""
from __future__ import annotations

import argparse
import json
import os
import pickle
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_frames(frame_ids, seg_dir, nocs_dir, out_dir, detect_fn):
    """For each frame: zero-shot detect on the raw depth, merge detections
    with the generator's GT into eval-format pkls.  ``detect_fn(depth)``
    returns a list of ``eval.zero_shot.Detection``; split out for CPU-stub
    testing."""
    import cv2

    os.makedirs(out_dir, exist_ok=True)
    n_det_total = 0
    for f_idx in frame_ids:
        gt_pkl = os.path.join(seg_dir, f"results_real_scene1_{f_idx:04d}.pkl")
        if not os.path.exists(gt_pkl):
            continue
        with open(gt_pkl, "rb") as f:
            gt = pickle.load(f)
        depth_png = os.path.join(nocs_dir, "real", "scene_1", f"{f_idx:04d}_depth.png")
        depth = cv2.imread(depth_png, -1)
        dets = detect_fn(depth)
        n_det_total += len(dets)
        if dets:
            pred_RTs = np.stack([d.RT for d in dets]).astype(np.float32)
            s_norms = np.array([np.linalg.norm(d.scale) for d in dets], np.float32)
            pred_scales = np.stack([d.scale for d in dets]).astype(np.float32) \
                / s_norms[:, None]
            pred_scores = np.array([d.score for d in dets], np.float32)
        else:
            pred_RTs = np.zeros((0, 4, 4), np.float32)
            pred_scales = np.zeros((0, 3), np.float32)
            pred_scores = np.zeros((0,), np.float32)
        # class-agnostic detections scored against the rendered category
        cls = gt["gt_class_ids"][0]
        result = {
            "image_path": gt["image_path"],
            "pred_class_ids": np.full(len(dets), cls, np.int32),
            "pred_scores": pred_scores,
            "pred_RTs": pred_RTs,
            "pred_scales": pred_scales,
            "gt_class_ids": gt["gt_class_ids"],
            "gt_RTs": gt["gt_RTs"],
            "gt_scales": gt["gt_scales"],
            "gt_handle_visibility": gt["gt_handle_visibility"],
        }
        with open(os.path.join(out_dir, f"results_real_scene1_{f_idx:04d}.pkl"),
                  "wb") as f:
            pickle.dump(result, f)
    return n_det_total


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default="checkpoints/bowl_reg")
    ap.add_argument("--category", default="bowl")
    ap.add_argument("--n_frames", type=int, default=8)
    ap.add_argument("--instances", type=int, default=2)
    ap.add_argument("--clutter", type=int, default=0)
    ap.add_argument("--n_pairs", type=int, default=2_000_000)
    ap.add_argument("--prop_thresh", type=float, default=50.0)
    ap.add_argument("--out_dir", default="/tmp/zs_bench")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args(argv)

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from cppf_tpu.config import load_config
    from cppf_tpu.eval import nocs_eval
    from cppf_tpu.eval.nocs_inference import REAL275_INTRINSICS, SYNSET_NAMES
    from cppf_tpu.eval.zero_shot import zero_shot_detect
    from cppf_tpu.train.checkpoints import maybe_load_any
    from cppf_tpu.utils.cache import enable_compilation_cache
    from synthetic_benchmark import make_frames

    enable_compilation_cache()
    seg_dir, nocs_dir = make_frames(args.out_dir, args.category, args.n_frames,
                                    args.seed, instances=args.instances,
                                    clutter=args.clutter)

    snap = os.path.join(args.ckpt, "config.yaml")
    cfg = load_config(args.category,
                      snapshot=snap if os.path.exists(snap) else None)
    cfg.cls_bins = False
    params = (maybe_load_any(args.ckpt, name="params_zs")
              or maybe_load_any(args.ckpt, name="params_best"))
    assert params is not None, f"no regression checkpoint under {args.ckpt}"

    def detect(depth):
        return zero_shot_detect(
            depth, params, cfg, intrinsics=REAL275_INTRINSICS,
            n_pairs=args.n_pairs, prop_thresh=args.prop_thresh,
            seed=args.seed)

    pred_dir = os.path.join(args.out_dir, "pred_zs")
    n_det = run_frames(range(args.n_frames), seg_dir, nocs_dir, pred_dir, detect)
    print(f"{n_det} detections over {args.n_frames} frames "
          f"({args.instances} GT instances each)")

    iou_aps, pose_aps, _, _ = nocs_eval.main(
        ["--pred_dir", pred_dir, "--subsample", "1"])
    cls = SYNSET_NAMES.index(args.category)
    summary = {
        "category": args.category, "n_frames": args.n_frames,
        "instances": args.instances, "clutter": args.clutter,
        "n_detections": n_det,
        "iou_ap_25": round(float(iou_aps[cls, 25]) * 100, 1),
        "iou_ap_50": round(float(iou_aps[cls, 50]) * 100, 1),
        "pose_ap": {
            f"{deg}deg_{cm}cm": round(float(pose_aps[cls, i, j]) * 100, 1)
            for i, deg in enumerate([5, 10, 15])
            for j, cm in enumerate([5, 10, 15])
        },
    }
    print("\n=== zero-shot mAP summary ===")
    print(json.dumps(summary))
    return summary


if __name__ == "__main__":
    main()
