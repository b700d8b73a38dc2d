"""GT-oracle probe for SUN RGB-D categories on *rendered partial views*.

Separates pipeline failures from model quality: pair predictions come from
the ground-truth pose (data.synthetic.oracle_pair_predictions), so any pose
error is the voting/assembly pipeline's own.  Round-3 diagnosis tool for the
SUN partial-view gap (VERDICT r2 "what's weak" #4): sweeps the three
suspected knobs —

- ``--num_rots`` / ``--adaptive``: at SUN scale (odist ~1.9 m, res 3 cm) 72
  circle samples land ~17 cm apart, so the center never accumulates; the
  adaptive rule (2π·odist/res, capped) fixes the sampling density.
- ``--filter_coplanar``: plane-dominated views (tabletops seen from above)
  split the center vote between the true center and its mirror across the
  plane (PoseConfig.filter_coplanar).

Runs on CPU by default (the TPU tunnel is usually busy training).

Usage:
    python scripts/probe_sun_oracle.py --categories table bed \
        --num_rots 512 --adaptive --filter_coplanar
"""
from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def probe(category: str, n_poses: int, n_pairs: int, num_rots: int,
          adaptive: bool, filter_coplanar: bool, seed: int = 0):
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from cppf_tpu.config import load_config
    from cppf_tpu.core.geometry import backproject
    from cppf_tpu.data import native
    from cppf_tpu.data.synthetic import (
        mesh_bounds,
        observation_pose,
        oracle_pair_predictions,
        random_primitive,
    )
    from cppf_tpu.eval.nocs_inference import REAL275_INTRINSICS
    from cppf_tpu.pipeline.pose import PoseConfig, vote_pose
    from cppf_tpu.pipeline.preprocess import preprocess_cloud

    cfg = load_config(category)
    cfg.num_rots = num_rots
    cfg.adaptive_voting = adaptive
    cfg.filter_coplanar = filter_coplanar
    pcfg = PoseConfig.from_config(cfg, n_pairs=n_pairs)
    sphere = jnp.asarray(pcfg.sphere_points())
    rng = np.random.default_rng(seed)
    key = jax.random.PRNGKey(seed)
    K = REAL275_INTRINSICS

    t_errs, up_errs = [], []
    attempts = 0
    while len(t_errs) < n_poses and attempts < n_poses * 3:
        attempts += 1
        mesh = random_primitive(category, rng)
        lo, hi = mesh_bounds(mesh)
        diag = float(np.linalg.norm(hi - lo))
        scale = float(rng.uniform(*cfg.scale_range))
        R, T = observation_pose(rng, is_nocs=False)
        v_canon = (mesh.vertices - (lo + hi) / 2) / diag * scale
        v_cam = v_canon @ R.T + T
        v_render = v_cam * np.float32([1, -1, -1])
        depth = native.rasterize_depth(v_render, mesh.faces, K[0, 0], K[1, 1],
                                       K[0, 2], K[1, 2], 640, 480)
        mask = depth > 0
        if mask.sum() < 300:
            continue
        pc_raw, _ = backproject(depth, K, mask)
        pc_raw[:, 0] = -pc_raw[:, 0]
        pc_raw[:, 1] = -pc_raw[:, 1]
        n_max = cfg.npoint_max
        if len(pc_raw) > n_max:  # stride subsample (spatially even)
            pc_raw = pc_raw[np.linspace(0, len(pc_raw) - 1, n_max).astype(int)]
        pad = np.zeros((n_max, 3), np.float32)
        pad[: len(pc_raw)] = pc_raw

        key, k1, k2 = jax.random.split(key, 3)
        pre = preprocess_cloud(k1, jnp.asarray(pad), len(pc_raw), cfg.res,
                               npoint_pad=cfg.npoint_pad, knn=cfg.knn)
        n = int(pre.n_valid)
        pc = np.asarray(pre.pc)
        normals = np.asarray(pre.normals)
        bound = (hi - lo) / diag * scale
        idxs = rng.integers(0, n, size=(n_pairs, 2)).astype(np.int32)
        preds = oracle_pair_predictions(pc, normals, idxs, T, R,
                                        bound.astype(np.float32), 1.0, cfg)
        out = vote_pose(k2, pre.pc, pre.normals, jnp.asarray(idxs),
                        jnp.asarray(preds), pre.n_valid, sphere, pcfg)
        t_errs.append(float(np.linalg.norm(np.asarray(out.T) - T)))
        cu = float(np.asarray(out.up) @ R[:, 1])
        up_errs.append(float(np.degrees(np.arccos(np.clip(cu, -1, 1)))))
        print(f"  pose {len(t_errs)}: T err {t_errs[-1]*1000:7.1f} mm   "
              f"up err {up_errs[-1]:5.1f} deg", flush=True)
    return {
        "t_err_mm_median": round(float(np.median(t_errs)) * 1000, 1),
        "up_err_deg_median": round(float(np.median(up_errs)), 1),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--categories", nargs="*", default=["table"])
    ap.add_argument("--n_poses", type=int, default=6)
    ap.add_argument("--n_pairs", type=int, default=20000)
    ap.add_argument("--num_rots", type=int, default=72)
    ap.add_argument("--adaptive", action="store_true")
    ap.add_argument("--filter_coplanar", action="store_true")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()
    for c in args.categories:
        r = probe(c, args.n_poses, args.n_pairs, args.num_rots,
                  args.adaptive, args.filter_coplanar, args.seed)
        print(f"{c}: rots={args.num_rots} adaptive={args.adaptive} "
              f"coplanar_filter={args.filter_coplanar} -> {r}", flush=True)


if __name__ == "__main__":
    main()
