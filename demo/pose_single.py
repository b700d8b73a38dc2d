"""Minimum end-to-end slice (SURVEY §7 step 4): single-instance 9D pose on
one TPU core.

Two modes:
- ``--oracle`` (default): ground-truth pair predictions drive the voting
  stack — validates the full pipeline geometry without a checkpoint.
- ``--ckpt <dir>``: load a trained checkpoint (orbax ours, or converted
  reference ``.pth``) and run the real network.

Usage: PYTHONPATH=. python demo/pose_single.py [--category bottle] [--oracle]
"""
from __future__ import annotations

import argparse
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--category", default="bottle")
    ap.add_argument("--ckpt", default=None, help="checkpoint dir (orbax)")
    ap.add_argument("--n_pairs", type=int, default=100000)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from cppf_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    from cppf_tpu.config import load_config
    from cppf_tpu.data.synthetic import (
        PRIMITIVES, mesh_bounds, oracle_pair_predictions, sample_surface,
    )
    from cppf_tpu.data.shapenet import FLIP2NOCS, NOCS_CATEGORIES
    from cppf_tpu.data.synthetic import observation_pose
    from cppf_tpu.pipeline.pose import PoseConfig, estimate_pose, vote_pose
    from cppf_tpu.pipeline.preprocess import preprocess_cloud

    cfg = load_config(args.category)
    rng = np.random.default_rng(args.seed)

    mesh = PRIMITIVES.get(args.category, PRIMITIVES["bottle"])()
    is_nocs = args.category in NOCS_CATEGORIES
    R_true, T_true = observation_pose(rng, is_nocs=is_nocs)
    lo, hi = mesh_bounds(mesh)
    # canonical object like the training data: bbox-centred, unit-diagonal,
    # scaled into the category scale range, flip2nocs'd like the train frame
    diag = float(np.linalg.norm(hi - lo))
    scale = float(np.mean(cfg.scale_range))
    pc_canon = (sample_surface(mesh, 6000, rng) - (lo + hi) / 2) / diag * scale
    if is_nocs:
        pc_canon = pc_canon @ FLIP2NOCS.T
    pc_cam = (pc_canon @ R_true.T + T_true).astype(np.float32)
    bound = (hi - lo) / diag * scale
    bound[[0, 2]] = bound[[2, 0]]

    pad = np.zeros((8192, 3), np.float32)
    pad[:6000] = pc_cam
    pre = preprocess_cloud(jax.random.PRNGKey(args.seed), jnp.array(pad), 6000,
                           cfg.res, npoint_pad=4096, knn=cfg.knn)
    n = int(pre.n_valid)
    print(f"category={args.category}  points={n}  device={jax.devices()[0]}")

    pcfg = PoseConfig.from_config(cfg, n_pairs=args.n_pairs)
    sphere = jnp.array(pcfg.sphere_points())

    if args.ckpt:
        from cppf_tpu.train.checkpoints import load_params

        params = load_params(args.ckpt)
        t0 = time.time()
        out = estimate_pose(
            jax.random.PRNGKey(args.seed + 1), params["point"], params["ppf"],
            pre.pc, pre.normals, pre.n_valid, sphere, pcfg,
        )
        jax.block_until_ready(out.T)
        dt = time.time() - t0
    else:
        idxs = rng.integers(0, n, size=(args.n_pairs, 2)).astype(np.int32)
        preds = oracle_pair_predictions(
            np.asarray(pre.pc), np.asarray(pre.normals), idxs, T_true, R_true,
            bound, 1.0, cfg,
        )
        t0 = time.time()
        out = vote_pose(
            jax.random.PRNGKey(args.seed + 1), pre.pc, pre.normals,
            jnp.array(idxs), jnp.array(preds), pre.n_valid, sphere, pcfg,
        )
        jax.block_until_ready(out.T)
        dt = time.time() - t0

    T = np.asarray(out.T)
    R = np.asarray(out.R)
    scale = np.asarray(out.scale)
    print(f"T_est   = {T}   (err {np.linalg.norm(T - T_true) * 1000:.1f} mm)")
    up_true = R_true @ np.array([0, 1.0, 0])
    cos_up = float(np.asarray(out.up) @ up_true)
    if cfg.up_sym:
        cos_up = abs(cos_up)
    print(f"R_est   =\n{R}")
    print(f"up-axis error = {np.degrees(np.arccos(np.clip(cos_up, -1, 1))):.2f} deg")
    print(f"scale   = {scale}   (true NOCS extent {bound})")
    print(f"pairs surviving backvote: {int(out.n_filtered)}/{args.n_pairs}")
    print(f"wall time (incl. compile on first run): {dt:.2f}s")


if __name__ == "__main__":
    main()
