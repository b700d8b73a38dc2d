"""End-to-end synthetic SUN RGB-D benchmark: synthesize val-format scans of
posed furniture primitives, run the scene inference driver with a trained
checkpoint, evaluate with the SUN RGB-D mAP protocol (NMS@0.3, IoU gate 0.1,
{5..60}°×{5..30}cm).

This closes the scan → inference → NMS → mAP loop with real numbers in any
environment (the actual SUN RGB-D dataset is external); the NOCS counterpart
is scripts/synthetic_benchmark.py.

``--oracle`` bypasses the network entirely and writes GT poses as
predictions — an exactness check of the whole data-format + eval-protocol
chain (AP must be 100).

Usage:
    PYTHONPATH=. python scripts/sunrgbd_synthetic_benchmark.py \
        --ckpt_path checkpoints --category table --n_scans 10
"""
from __future__ import annotations

import argparse
import os
import pickle
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cppf_tpu.data.sunrgbd_synth import EX, _roty, make_scans
from cppf_tpu.eval.sunrgbd_inference import TYPE2CLASS


def write_oracle_predictions(extra_dir: str, out_dir: str, category: str,
                             class_id: int, scan_names):
    """Predictions == GT, transformed exactly as the driver would produce
    them (poses in the ``EX·rot·EX``-conjugated frame)."""
    root = os.path.join(extra_dir, "sunrgbd_pc_bbox_votes_50k_v1_val")
    poses_pred = {}
    for scan in scan_names:
        rot = np.load(os.path.join(root, scan) + "_rot.npy")
        conj = EX @ rot @ EX
        rows = []
        for bbox in np.load(os.path.join(root, scan) + "_bbox.npy"):
            if int(bbox[7]) != class_id:
                continue
            t_gt = np.array([bbox[0], bbox[2], bbox[1]])
            extents = np.array([bbox[3], bbox[5], bbox[4]])
            R_gt = _roty(-bbox[6])
            R_p = conj @ R_gt
            T_p = conj @ t_gt
            rows.append([class_id, 1.0, *extents, *R_p.reshape(-1), *T_p])
        poses_pred[scan] = rows
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, f"results_{category}.pkl"), "wb") as f:
        pickle.dump(poses_pred, f)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt_path", default="checkpoints")
    ap.add_argument("--category", default="table")
    ap.add_argument("--n_scans", type=int, default=10)
    ap.add_argument("--instances", type=int, default=2)
    ap.add_argument("--out_dir", default="/tmp/sunrgbd_synth")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--oracle", action="store_true",
                    help="write GT as predictions (protocol exactness check)")
    ap.add_argument("--up_prior_deg", type=float, default=30.0,
                    help="forwarded to the driver (0 disables the gravity "
                         "prior; the synthetic scenes share the real "
                         "pipeline's gravity-aligned working frame)")
    args = ap.parse_args()

    from cppf_tpu.eval import sunrgbd_eval, sunrgbd_inference

    class_id = TYPE2CLASS[args.category]
    sunrgbd_dir = os.path.join(args.out_dir, "OFFICIAL_SUNRGBD")
    extra_dir = os.path.join(args.out_dir, "extra")
    pred_dir = os.path.join(args.out_dir, "pred")
    scan_names = make_scans(sunrgbd_dir, extra_dir, args.category, class_id,
                            args.n_scans, instances=args.instances,
                            seed=args.seed)
    if args.oracle:
        write_oracle_predictions(extra_dir, pred_dir, args.category,
                                 class_id, scan_names)
    else:
        sunrgbd_inference.main([
            "--sunrgbd_dir", sunrgbd_dir, "--sunrgbd_extra_dir", extra_dir,
            "--out_dir", pred_dir, "--ckpt_path", args.ckpt_path,
            "--categories", args.category, "--seed", str(args.seed),
            "--up_prior_deg", str(args.up_prior_deg),
        ])
    all_aps = sunrgbd_eval.main([
        "--pred_dir", pred_dir, "--sunrgbd_dir", sunrgbd_dir,
        "--sunrgbd_extra_dir", extra_dir, "--categories", args.category,
    ])
    iou_aps, pose_aps, _, _ = all_aps[args.category]
    print("\n=== SUN RGB-D synthetic benchmark summary ===")
    print(f"category: {args.category}  scans: {args.n_scans}  "
          f"instances/scan: {args.instances}  oracle: {args.oracle}")
    print(f"3D IoU@25: {iou_aps[1, 25] * 100:.1f}   IoU@50: {iou_aps[1, 50] * 100:.1f}")
    degs = list(range(5, 61, 5))
    cms = list(range(5, 31, 5))
    for d in (15, 30, 60):
        for c in (10, 30):
            print(f"pose AP {d}deg {c}cm: "
                  f"{pose_aps[1, degs.index(d), cms.index(c)] * 100:.1f}")


if __name__ == "__main__":
    main()
