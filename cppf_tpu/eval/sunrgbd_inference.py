"""SUN RGB-D scene-level inference (equivalent of reference
``sunrgbd/inference.py``).

Per category: iterate val scans, decode the bit-rotated 16-bit depth,
take GT segment masks, and run the same jitted voting core per object —
scale assembly without the NOCS x2 (reference sunrgbd/inference.py:281).
Outputs a ``results_<typename>.pkl`` of flat pose rows
[class_id, score, s(3), R(9), T(3)] per scan.
"""
from __future__ import annotations

import argparse
import logging
import os
import pickle

import numpy as np

TYPE2CLASS = {
    "bed": 0, "table": 1, "sofa": 2, "chair": 3, "toilet": 4,
    "desk": 5, "dresser": 6, "night_stand": 7, "bookshelf": 8, "bathtub": 9,
}
EX_MAT = np.array([[1, 0, 0], [0, 0, 1], [0, 1, 0]], dtype=np.float64)

log = logging.getLogger("cppf_tpu.sunrgbd")


def decode_sunrgbd_depth(depth: np.ndarray) -> np.ndarray:
    """16-bit bit-rotation decode, capped at 8m (reference :106-107)."""
    d = (depth >> 3) | (depth << 13)
    d = d.copy()
    d[d > 8000] = 8000
    return d


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--sunrgbd_dir", default="data/OFFICIAL_SUNRGBD")
    parser.add_argument("--sunrgbd_extra_dir", default="data/sunrgbd_extra")
    parser.add_argument("--out_dir", default="data/sunrgbd_prediction")
    parser.add_argument("--ckpt_path", default="checkpoints")
    parser.add_argument("--angle_prec", type=float, default=1.5)
    parser.add_argument("--num_rots", type=int, default=72)
    parser.add_argument("--adaptive_voting", action="store_true")
    parser.add_argument("--up_prior_deg", type=float, default=30.0,
                        help="gravity prior on the up axis (degrees; 0 "
                             "disables).  The driver's working frame is "
                             "world-gravity-aligned (+y): clouds are stored "
                             "Rtilt-corrected and every SUN GT box is "
                             "gravity-aligned by construction, so gating the "
                             "up-axis sphere peak to ±30 deg of world-up only "
                             "removes wrong-face-normal flips.  See "
                             "PoseConfig.up_prior_deg.")
    parser.add_argument("--categories", nargs="*", default=None)
    parser.add_argument("--max_scans", type=int, default=0)
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args(argv)

    from cppf_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    import jax
    import scipy.io as sio

    from cppf_tpu.eval.nocs_inference import CategoryRunner

    os.makedirs(args.out_dir, exist_ok=True)
    split = "val"
    meta_data = sio.loadmat(
        os.path.join(args.sunrgbd_dir, "SUNRGBDtoolbox/Metadata/SUNRGBDMeta.mat")
    )["SUNRGBDMeta"][0]
    root_path = os.path.join(args.sunrgbd_extra_dir, "sunrgbd_pc_bbox_votes_50k_v1_val")

    categories = args.categories or list(TYPE2CLASS)
    rng = jax.random.PRNGKey(args.seed)
    for typename in categories:
        class_id = TYPE2CLASS[typename]
        try:
            runner = CategoryRunner(typename, args.ckpt_path, args)
        except FileNotFoundError as e:
            log.warning("skipping %s: %s", typename, e)
            continue
        runner.pcfg = runner.pcfg.__class__(
            **{**runner.pcfg.__dict__, "scale_multiplier": 1.0,
               "up_prior_deg": args.up_prior_deg}
        )

        names_file = os.path.join(
            args.sunrgbd_extra_dir, f"scan_names_list/{class_id}_{split}.txt")
        scan_names = [s.strip() for s in open(names_file)]
        if args.max_scans:
            scan_names = scan_names[: args.max_scans]

        poses_pred = {}
        for scan_name in scan_names:
            meta = meta_data[int(scan_name) - 1]
            rot = np.load(os.path.join(root_path, scan_name) + "_rot.npy")

            bboxes_gt = np.load(os.path.join(root_path, scan_name) + "_bbox.npy")
            with open(os.path.join(root_path, scan_name) + "_segments.pkl", "rb") as f:
                segments_gt = pickle.load(f)
            points3d = (
                EX_MAT @ rot @ np.load(os.path.join(root_path, scan_name) + "_pc.npz")["pc"][:, :3].T
            ).T

            pose_pred = []
            for i, bbox in enumerate(bboxes_gt):
                if int(bbox[7]) != class_id:
                    continue
                pc = points3d[segments_gt[i]]
                if pc.shape[0] < 200:
                    continue
                if pc.shape[0] > 40000:
                    pc = pc[:40000]

                rng, r_inst = jax.random.split(rng)
                out, _ = runner.estimate(r_inst, pc.astype(np.float32))
                scale_est = np.asarray(out.scale)
                R_est = np.asarray(out.R)
                T_est = np.asarray(out.T)
                pose_pred.append([class_id, 1.0, *scale_est, *R_est.reshape(-1), *T_est])
            poses_pred[scan_name] = pose_pred
            log.info("%s %s: %d poses", typename, scan_name, len(pose_pred))

        with open(os.path.join(args.out_dir, f"results_{typename}.pkl"), "wb") as f:
            pickle.dump(poses_pred, f)


if __name__ == "__main__":
    logging.basicConfig(level=logging.INFO, force=True)
    main()
