"""NOCS REAL275 inference driver.

Equivalent of reference ``nocs/inference.py``: consumes Mask-RCNN detection
prior pkls (``results_*.pkl``), runs per-instance 9D pose with the jitted
TPU pipeline, and writes per-frame result pkls in the exact reference format
(``pred_RTs`` with R·|s| convention, ``pred_scales`` unit-normalised) so the
reference eval protocol applies unchanged.

Usage:
    python -m cppf_tpu.eval.nocs_inference --seg_dir ... --nocs_dir ... \
        --out_dir ... --ckpt_path checkpoints [--bbox_mask] [--adaptive_voting]
"""
from __future__ import annotations

import argparse
import glob
import logging
import os
import pickle

import numpy as np

SYNSET_NAMES = ["BG", "bottle", "bowl", "camera", "can", "laptop", "mug"]

# NOCS REAL275 camera (reference nocs/inference.py:98)
REAL275_INTRINSICS = np.array([[591.0125, 0, 322.525], [0, 590.16775, 244.11084], [0, 0, 1]])

log = logging.getLogger("cppf_tpu.nocs")


def load_detection_priors(seg_dir: str):
    pkls = sorted(glob.glob(os.path.join(seg_dir, "results_*.pkl")))
    assert pkls, f"no detection pkls under {seg_dir}"
    results = []
    for p in pkls:
        with open(p, "rb") as f:
            r = pickle.load(f)
        if "gt_handle_visibility" not in r:
            r["gt_handle_visibility"] = np.ones_like(r["gt_class_ids"])
        results.extend(r if isinstance(r, list) else [r])
    return results


class CategoryRunner:
    """Holds config + params + compiled pipeline for one category."""

    def __init__(self, cls_name: str, ckpt_path: str, args):
        import jax.numpy as jnp

        from cppf_tpu.config import load_config
        from cppf_tpu.pipeline.pose import PoseConfig
        from cppf_tpu.train.checkpoints import maybe_load_any

        path = os.path.join(ckpt_path, cls_name)
        snap = os.path.join(path, "config.yaml")
        # re-read the training-time snapshot like the reference
        # (nocs/inference.py:81); fall back to the repo config
        self.cfg = load_config(cls_name, snapshot=snap if os.path.exists(snap) else None)
        # ckpt_name selects which saved state to load (e.g. "best_decode",
        # the decode-quality-selected state) — used by the promotion
        # head-to-head evals; default is the reference's best-loss state
        name = getattr(args, "ckpt_name", None)
        if name:
            self.params = maybe_load_any(path, name=name)
        else:
            self.params = maybe_load_any(path, name="params_best") or maybe_load_any(path, name="best")
        if self.params is None:
            raise FileNotFoundError(f"no checkpoint for {cls_name} under {path}")
        self.cfg.num_rots = args.num_rots
        self.cfg.angle_prec = args.angle_prec
        self.cfg.adaptive_voting = args.adaptive_voting
        # Inference-only capability flags are NOT training-time parameters:
        # overlay them from the current repo category config so checkpoints
        # trained before a flag existed still benefit (the snapshot governs
        # everything that must match training — bins, symmetry, ranges).
        repo_cfg = load_config(cls_name)
        for k in ("asym_right_votes", "asym_center_refine", "subvoxel_refine",
                  "geo_right_sign", "geo_right_dir", "filter_coplanar",
                  "coplanar_halfspace", "pair_balance", "pair_sep_power",
                  "sharp_axis_votes", "aux_align_weight", "axis_topk",
                  "pose_f32", "anchor_t"):
            setattr(self.cfg, k, getattr(repo_cfg, k))
        self.pcfg = PoseConfig.from_config(self.cfg, scale_multiplier=2.0)
        self.sphere = jnp.array(self.pcfg.sphere_points())

    def estimate(self, rng, pc_raw: np.ndarray, laptop_up=None):
        import jax
        import jax.numpy as jnp

        from cppf_tpu.pipeline.pose import estimate_pose
        from cppf_tpu.pipeline.preprocess import preprocess_cloud

        cfg = self.cfg
        n_raw_pad = cfg.npoint_max
        pad = np.zeros((n_raw_pad, 3), np.float32)
        n_raw = min(len(pc_raw), n_raw_pad)
        if len(pc_raw) > n_raw_pad:
            # stride-subsample: backprojected clouds are in scanline order, so
            # truncation ([:n]) would keep only the TOP IMAGE ROWS of a large
            # object (meter-scale T errors on SUN-sized objects, found by the
            # GT-oracle probe); an even stride keeps full spatial coverage
            pad[:] = pc_raw[np.linspace(0, len(pc_raw) - 1, n_raw_pad).astype(int)]
        else:
            pad[:n_raw] = pc_raw[:n_raw]
        r1, r2 = jax.random.split(rng)
        pre = preprocess_cloud(r1, jnp.asarray(pad), n_raw, cfg.res,
                               npoint_pad=cfg.npoint_pad, knn=cfg.knn)
        kwargs = {}
        if laptop_up is not None:
            kwargs = dict(laptop_up=jnp.asarray(laptop_up, jnp.float32),
                          laptop_up_valid=jnp.asarray(True))
        out = estimate_pose(
            r2, self.params["point"], self.params["ppf"], pre.pc, pre.normals,
            pre.n_valid, self.sphere, self.pcfg, nbr_idx=pre.nbr_idx, **kwargs,
        )
        if cfg.anchor_t:
            out = self._anchor(out, pc_raw)
        return out, pre

    def _anchor(self, out, pc_raw: np.ndarray):
        """Host post-step: observed-extent anchoring of the voted center
        (``cfg.anchor_t`` — see eval/anchor.py for the mechanism and the
        measured vote-decode center bias it corrects)."""
        from cppf_tpu.eval.anchor import anchor_box_t

        scale = np.asarray(out.scale, np.float64)
        s_norm = float(np.linalg.norm(scale))
        T_new = anchor_box_t(np.asarray(out.T), np.asarray(out.R), scale,
                             np.asarray(pc_raw),
                             clip=max(0.05, 0.15 * s_norm))
        RT = np.asarray(out.RT).copy()
        RT[:3, 3] = T_new
        return out._replace(T=T_new.astype(np.float32), RT=RT)

    def estimate_batch(self, rng, pc_list, pad_to: int | None = None):
        """One jitted program for a whole frame's crops of this category.

        The reference loops instances serially on the GPU
        (nocs/inference.py:108-120); here B instances vmap through
        preprocess + pose together.  The batch is padded (duplicating
        instance 0) to ``pad_to`` if given — drivers pass their max_batch so
        exactly ONE batched program shape ever compiles (full-pipeline
        compile time scales with B) — else to the next power of two.
        Returns a stacked PoseResult; rows [len(pc_list):] are padding.
        """
        import jax
        import jax.numpy as jnp

        from cppf_tpu.pipeline.pose import estimate_pose_batch
        from cppf_tpu.pipeline.preprocess import preprocess_cloud_batch

        cfg = self.cfg
        n_raw_pad = cfg.npoint_max
        B = len(pc_list)
        B_pad = pad_to if pad_to is not None else 1 << (B - 1).bit_length()
        assert B <= B_pad
        pads = np.zeros((B_pad, n_raw_pad, 3), np.float32)
        n_raws = np.zeros(B_pad, np.int32)
        for i, pc_raw in enumerate(pc_list):
            n = min(len(pc_raw), n_raw_pad)
            if len(pc_raw) > n_raw_pad:  # stride-subsample (see estimate())
                pads[i] = pc_raw[np.linspace(0, len(pc_raw) - 1, n_raw_pad).astype(int)]
            else:
                pads[i, :n] = pc_raw[:n]
            n_raws[i] = n
        for i in range(B, B_pad):
            pads[i] = pads[0]
            n_raws[i] = n_raws[0]
        keys = jax.random.split(rng, 2 * B_pad)
        pre = preprocess_cloud_batch(keys[:B_pad], jnp.asarray(pads),
                                     jnp.asarray(n_raws), cfg.res,
                                     npoint_pad=cfg.npoint_pad, knn=cfg.knn)
        out = estimate_pose_batch(
            keys[B_pad:], self.params["point"], self.params["ppf"], pre.pc,
            pre.normals, pre.n_valid, self.sphere, self.pcfg,
            nbr_idxs=pre.nbr_idx,
        )
        if cfg.anchor_t:
            from cppf_tpu.eval.anchor import anchor_box_t

            T_all = np.asarray(out.T).astype(np.float32)
            RT_all = np.asarray(out.RT).copy()
            R_all = np.asarray(out.R)
            s_all = np.asarray(out.scale, np.float64)
            for i in range(B):
                s_norm = float(np.linalg.norm(s_all[i]))
                T_all[i] = anchor_box_t(T_all[i], R_all[i], s_all[i],
                                        np.asarray(pc_list[i]),
                                        clip=max(0.05, 0.15 * s_norm))
                RT_all[i, :3, 3] = T_all[i]
            out = out._replace(T=T_all, RT=RT_all)
        return out, pre


def laptop_up_from_aux(img, depth_mask_idxs, pc, pre, segmenter, rng):
    """Laptop lid/base split → up axis (reference nocs/inference.py:144-172).

    Uses the FCN segmenter on the cropped RGB then a RANSAC plane fit on the
    base points.  Returns a 3-vector or None.
    """
    import cv2
    import jax
    import jax.numpy as jnp

    from cppf_tpu.ops.ransac import segment_plane

    rows, cols = depth_mask_idxs
    bbox = np.array([[rows.min(), rows.max()], [cols.min(), cols.max()]])
    rgb_obj = np.zeros_like(img, dtype=np.float32)
    rgb_obj[rows, cols] = img[rows, cols] / 255.0
    crop = cv2.resize(rgb_obj[bbox[0, 0]:bbox[0, 1] + 1, bbox[1, 0]:bbox[1, 1] + 1], (224, 224))
    pred = segmenter.predict(crop)  # [224,224] int, 0=base 1=lid
    resize_scale = 224 / (bbox[:, 1] - bbox[:, 0])
    pc_xy = np.stack([rows, cols], -1)
    idxs_resized = np.clip(((pc_xy - bbox[:, 0]) * resize_scale).astype(np.int64), 0, 223)
    # map pixel labels onto the voxel-downsampled cloud via the kept-point
    # indices (the reference's idxs_resized[high_res_indices],
    # nocs/inference.py:160-164)
    keep = np.asarray(pre.raw_idx)[: len(pc)]
    pc_img = idxs_resized[keep]
    labels = pred[pc_img[:, 0], pc_img[:, 1]]
    base_pts = pc[labels == 0]
    if (labels == 0).sum() < 10:
        return None
    pad = np.zeros((4096, 3), np.float32)
    n = min(len(base_pts), 4096)
    pad[:n] = base_pts[:n]
    plane, _ = segment_plane(rng, jnp.asarray(pad), 0.02, 100,
                             valid_mask=jnp.arange(4096) < n)
    normal = np.asarray(plane)[:3]
    # orient toward the camera (visible-surface rule): the RANSAC normal's
    # sign is solver-arbitrary, but the camera at the origin sees the TOP of
    # the base plane, so the outward (true-up) normal satisfies n·p < 0 on
    # the observed plane points.  vote_pose's override trusts this sign —
    # deriving it from the voted axes instead is exactly what broke at
    # chance-level up-aux (r4 postmortem; reference nocs/inference.py:314-323
    # has the same vulnerability).
    if float(normal @ base_pts[:n].mean(0)) > 0:
        normal = -normal
    return normal


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--seg_dir", default="data/nocs_seg")
    parser.add_argument("--nocs_dir", default="data/nocs")
    parser.add_argument("--out_dir", default="data/nocs_prediction")
    parser.add_argument("--ckpt_path", default="checkpoints")
    parser.add_argument("--angle_prec", type=float, default=1.5)
    parser.add_argument("--num_rots", type=int, default=72)
    parser.add_argument("--bbox_mask", action="store_true")
    parser.add_argument("--adaptive_voting", action="store_true")
    parser.add_argument("--max_frames", type=int, default=0, help="0 = all")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--serial", action="store_true",
                        help="reference-style per-instance loop (no batching)")
    parser.add_argument("--max_batch", type=int, default=4,
                        help="cap instances per batched pose program")
    args = parser.parse_args(argv)

    import cv2
    import jax

    from cppf_tpu.core.geometry import backproject
    from cppf_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    os.makedirs(args.out_dir, exist_ok=True)
    final_results = load_detection_priors(args.seg_dir)
    if args.max_frames:
        final_results = final_results[: args.max_frames]

    runners = {}
    segmenter = None
    for cls_id in range(1, 7):
        cls_name = SYNSET_NAMES[cls_id]
        try:
            runners[cls_name] = CategoryRunner(cls_name, args.ckpt_path, args)
        except FileNotFoundError as e:
            log.warning("skipping %s: %s", cls_name, e)
    laptop_aux_dir = os.path.join(args.ckpt_path, "laptop_aux")
    if "laptop" in runners and os.path.isdir(laptop_aux_dir):
        from cppf_tpu.models.segmenter import SegmenterRunner

        segmenter = SegmenterRunner(laptop_aux_dir)

    rng = jax.random.PRNGKey(args.seed)
    for res in final_results:
        img_path = os.path.join(args.nocs_dir, res["image_path"][5:])
        img = cv2.imread(img_path + "_color.png")[:, :, ::-1]
        depth = cv2.imread(img_path + "_depth.png", -1)

        bboxs = res["pred_bboxes"]
        masks = res["pred_masks"].copy()
        RTs = np.tile(np.eye(4, dtype=np.float32), (len(bboxs), 1, 1))
        scales = np.ones((len(bboxs), 3), dtype=np.float32)
        cls_ids = res["pred_class_ids"]

        # gather per-category instance groups; laptop keeps the serial path
        # (its aux-segmenter override needs a host round-trip between two
        # pose passes)
        groups: dict[str, list] = {}
        for i, bbox in enumerate(bboxs):
            if args.bbox_mask:
                masks[:, :, i][bbox[0]:bbox[2], bbox[1]:bbox[3]] = True
            cls_name = SYNSET_NAMES[cls_ids[i]]
            if runners.get(cls_name) is None:
                continue
            pc, idxs = backproject(depth, REAL275_INTRINSICS, masks[:, :, i])
            pc = pc / 1000.0
            pc[:, 0] = -pc[:, 0]
            pc[:, 1] = -pc[:, 1]
            if len(pc) < 20:
                continue
            groups.setdefault(cls_name, []).append((i, pc.astype(np.float32)))

        for cls_name, items in groups.items():
            runner = runners[cls_name]
            batched = (not args.serial and cls_name != "laptop" and len(items) > 1)
            if batched:
                for k in range(0, len(items), args.max_batch):
                    chunk = items[k:k + args.max_batch]
                    rng, r_chunk = jax.random.split(rng)
                    # bucket to the next power of two instead of always
                    # max_batch: a frame with 2 bottles runs a B=2 program,
                    # not 4 poses (at most log2(max_batch)+1 compiled shapes
                    # per category, persisted by the compilation cache)
                    pad_to = 1 << (len(chunk) - 1).bit_length()
                    out, _ = runner.estimate_batch(r_chunk, [pc for _, pc in chunk],
                                                   pad_to=pad_to)
                    RT_np = np.asarray(out.RT)
                    sc_np = np.asarray(out.scale_unit)
                    for b, (i, _) in enumerate(chunk):
                        RTs[i] = RT_np[b]
                        scales[i] = sc_np[b]
                continue
            for i, pc in items:
                laptop_up = None
                rng, r_inst, r_plane = jax.random.split(rng, 3)
                out, pre = runner.estimate(r_inst, pc)
                if cls_name == "laptop" and segmenter is not None:
                    n = int(pre.n_valid)
                    laptop_up = laptop_up_from_aux(
                        img, np.where(masks[:, :, i]), np.asarray(pre.pc)[:n], pre,
                        segmenter, r_plane,
                    )
                    if laptop_up is not None:
                        out, _ = runner.estimate(r_inst, pc, laptop_up)
                RTs[i] = np.asarray(out.RT)
                scales[i] = np.asarray(out.scale_unit)

        res["pred_RTs"] = RTs
        res["pred_scales"] = scales
        out_path = os.path.join(
            args.out_dir, "results_" + "_".join(res["image_path"].split("/")[1:]) + ".pkl")
        with open(out_path, "wb") as f:
            pickle.dump(res, f)
        log.info("wrote %s", out_path)


if __name__ == "__main__":
    logging.basicConfig(level=logging.INFO, force=True)
    main()
