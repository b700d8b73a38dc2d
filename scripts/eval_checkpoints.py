"""Per-category checkpoint quality eval: render N posed primitives, run the
full pose pipeline, report median translation / up-axis / scale errors.

This is the round-over-round quality gauge (round-1 bowl: 13.5 mm / 12.2° /
6.2% at 8 poses); run it after training to verify every category clears the
bar.  Prints one summary line per category + a JSON blob.

Usage:
    PYTHONPATH=/root/repo:/root/.axon_site python scripts/eval_checkpoints.py \
        [--categories bowl bottle ...] [--n_poses 12] [--ckpt_path checkpoints]
"""
from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

NOCS_CATEGORIES = ["bottle", "bowl", "camera", "can", "laptop", "mug"]
SUN_CATEGORIES = ["table", "chair", "bed", "sofa", "bookshelf", "bathtub"]


def _sign_cue(verts, faces, axis, diag):
    from cppf_tpu.data.synthetic import mesh_sign_cue

    return mesh_sign_cue(verts, faces, axis, diag)


def eval_category(category: str, ckpt_path: str, n_poses: int, seed: int = 0,
                  overrides: dict | None = None, ckpt_name: str | None = None):
    """Depth-rendered single-object views (the training distribution), pose
    errors against the known GT.  Frame conventions match
    scripts/synthetic_benchmark.py::make_frames / the NOCS driver."""
    import jax

    from cppf_tpu.core.geometry import backproject
    from cppf_tpu.data import native
    from cppf_tpu.data.shapenet import FLIP2NOCS, NOCS_CATEGORIES
    from cppf_tpu.data.synthetic import mesh_bounds, observation_pose, random_primitive
    from cppf_tpu.eval.nocs_inference import REAL275_INTRINSICS, CategoryRunner

    class A:
        num_rots = 72
        angle_prec = 1.5
        adaptive_voting = False

    A.ckpt_name = ckpt_name
    runner = CategoryRunner(category, ckpt_path, A)
    if overrides:
        # A/B harness: override inference-side flags (coplanar handling,
        # axis decode, ...) without touching the committed category yamls
        from cppf_tpu.pipeline.pose import PoseConfig

        for k, v in overrides.items():
            setattr(runner.cfg, k, v)
        runner.pcfg = PoseConfig.from_config(runner.cfg, scale_multiplier=2.0)
    rng = np.random.default_rng(seed)
    key = jax.random.PRNGKey(seed)
    K = REAL275_INTRINSICS
    is_nocs = category in NOCS_CATEGORIES

    t_errs, up_errs, right_errs, s_errs = [], [], [], []
    right_line_errs, t_up_errs, t_perp_errs = [], [], []
    sign_cues = []  # per-draw geometric sign-informativeness (see _sign_cue)
    ov_up_errs, ov_t_errs = [], []  # laptop plane-override path (scored alongside)
    attempts = 0
    while len(t_errs) < n_poses and attempts < n_poses * 3:
        attempts += 1
        mesh = random_primitive(category, rng)
        lo, hi = mesh_bounds(mesh)
        diag = float(np.linalg.norm(hi - lo))
        scale = float(rng.uniform(*runner.cfg.scale_range))
        # GT pose of the TRAINED canonical frame (incl. flip2nocs for NOCS
        # categories), view direction from the training distribution — the
        # sim-to-real assumption the reference evaluates under (real scenes
        # view tabletop objects from above)
        R, T = observation_pose(rng, is_nocs=is_nocs)
        v_canon = (mesh.vertices - (lo + hi) / 2) / diag * scale
        if is_nocs:
            v_canon = v_canon @ FLIP2NOCS.T
        v_cam_nocs = v_canon @ R.T + T
        v_render = v_cam_nocs * np.float32([1, -1, -1])
        depth = native.rasterize_depth(v_render, mesh.faces, K[0, 0], K[1, 1],
                                       K[0, 2], K[1, 2], 640, 480)
        mask = depth > 0
        if mask.sum() < 300:
            continue
        pc, _ = backproject(depth, K, mask)
        pc[:, 0] = -pc[:, 0]
        pc[:, 1] = -pc[:, 1]

        key, k1 = jax.random.split(key)
        out, _ = runner.estimate(k1, pc.astype(np.float32))
        if category == "laptop":
            # score the production plane-override path next to voting-only:
            # the driver feeds a RANSAC base-plane normal oriented toward
            # the camera (visible-surface rule, laptop_up_from_aux); GT up
            # with that same orientation is the clean stand-in
            lup = (R[:, 1] * (-1.0 if float(R[:, 1] @ T) > 0 else 1.0)
                   ).astype(np.float32)
            out_ov, _ = runner.estimate(k1, pc.astype(np.float32), laptop_up=lup)
            ov_t_errs.append(float(np.linalg.norm(np.asarray(out_ov.T) - T)))
            c_ov = float(np.clip(np.dot(np.asarray(out_ov.up), R[:, 1]), -1, 1))
            ov_up_errs.append(float(np.degrees(np.arccos(c_ov))))
        T_est = np.asarray(out.T)
        up_est = np.asarray(out.up)
        s_est = np.asarray(out.scale)

        t_errs.append(float(np.linalg.norm(T_est - T)))
        up_true = R[:, 1]
        # decompose the T error along/perpendicular to the GT up axis — big
        # flat categories (table) hide their center under the top plane, so
        # the up component isolates "height inferred wrong" from lateral drift
        dT = T_est - T
        t_up_errs.append(float(abs(np.dot(dT, up_true))))
        t_perp_errs.append(float(np.linalg.norm(dT - np.dot(dT, up_true) * up_true)))
        cos_signed = float(np.dot(up_est, up_true))
        up_errs.append(float(np.degrees(np.arccos(np.clip(cos_signed, -1, 1)))))
        if runner.cfg.regress_right:
            # canonical right axis is +x (or +z under z_right); right_sym
            # categories fold the sign ambiguity like the training targets
            right_true = R[:, 2] if runner.cfg.z_right else R[:, 0]
            right_est = np.asarray(out.right)
            cr = float(np.dot(right_est, right_true))
            if runner.cfg.right_sym:
                cr = abs(cr)
            right_errs.append(float(np.degrees(np.arccos(np.clip(cr, -1, 1)))))
            # axis LINE error (sign folded) — separates "line wrong" from
            # "sign at chance" (2-fold-symmetric bodies cannot learn the sign)
            right_line_errs.append(
                float(np.degrees(np.arccos(np.clip(abs(cr), 0, 1)))))
            # up axis in the trained canonical frame is +y for every category
            sign_cues.append(_sign_cue(v_canon, mesh.faces, 1, scale))
        bound = (hi - lo) / diag * scale
        s_errs.append(float(abs(np.linalg.norm(s_est) - np.linalg.norm(bound))
                            / np.linalg.norm(bound)))
    out = {
        "t_err_mm_median": round(float(np.median(t_errs)) * 1000, 1),
        "up_err_deg_median": round(float(np.median(up_errs)), 1),
        "scale_err_pct_median": round(float(np.median(s_errs)) * 100, 1),
        "n_poses": len(t_errs),
    }
    out["t_err_up_mm_median"] = round(float(np.median(t_up_errs)) * 1000, 1)
    out["t_err_perp_mm_median"] = round(float(np.median(t_perp_errs)) * 1000, 1)
    if right_errs:
        out["right_err_deg_median"] = round(float(np.median(right_errs)), 1)
        out["right_line_deg_median"] = round(float(np.median(right_line_errs)), 1)
        # signed error restricted to draws that geometrically CARRY a sign
        # (cue ≥ 2% of scale); symmetric draws can only be scored on the line
        cued = [e for e, c in zip(right_errs, sign_cues) if c >= 0.02]
        out["n_sign_capable"] = len(cued)
        if cued:
            out["right_err_deg_median_signcue"] = round(
                float(np.median(cued)), 1)
    if ov_up_errs:
        out["override_up_deg_median"] = round(float(np.median(ov_up_errs)), 1)
        out["override_t_err_mm_median"] = round(
            float(np.median(ov_t_errs)) * 1000, 1)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--categories", nargs="*", default=None)
    ap.add_argument("--ckpt_path", default="checkpoints")
    ap.add_argument("--n_poses", type=int, default=12)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--name", default=None,
                    help="checkpoint state to load (e.g. best_decode for the "
                         "decode-selected arm of a promotion head-to-head); "
                         "default params_best/best")
    ap.add_argument("--set", dest="overrides", nargs="*", default=[],
                    metavar="KEY=VAL",
                    help="inference-flag overrides for A/B runs, e.g. "
                         "--set coplanar_halfspace=true filter_coplanar=false")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU platform (the env pins axon; a dead "
                         "relay otherwise parks the run in the connect loop)")
    args = ap.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import yaml

    overrides = {}
    for kv in args.overrides:
        k, _, v = kv.partition("=")
        overrides[k] = yaml.safe_load(v)

    cats = args.categories or [c for c in NOCS_CATEGORIES + SUN_CATEGORIES
                               if os.path.isdir(os.path.join(args.ckpt_path, c))]
    results = {}
    for c in cats:
        try:
            r = eval_category(c, args.ckpt_path, args.n_poses, args.seed, ckpt_name=args.name,
                              overrides=overrides or None)
        except FileNotFoundError as e:
            print(f"{c}: no checkpoint ({e})")
            continue
        results[c] = r
        right = (f"   right err {r['right_err_deg_median']:5.1f} deg"
                 if "right_err_deg_median" in r else "")
        print(f"{c:10s} median T err {r['t_err_mm_median']:7.1f} mm   "
              f"up err {r['up_err_deg_median']:5.1f} deg   "
              f"scale err {r['scale_err_pct_median']:5.1f} %{right}")
    print(json.dumps(results))


if __name__ == "__main__":
    main()
