"""Per-category statistic generation (equivalent of reference
``gen_stats.py``): over the category's meshes, compute

- ``scale_range``: min/max bounding-box diagonal,
- ``vote_range``:  max |proj_len| and max dist2o over sampled pairs,
- ``scale_mean``:  mean of per-mesh max extents,

from 2048 surface samples per mesh and 100k random pairs.

Usage:
    python -m cppf_tpu.data.stats --category bowl [--shapenet_root ...]
        [--up_sym] [--right_sym] [--z_right]
"""
from __future__ import annotations

import argparse
import os

import numpy as np


def compute_stats(meshes, up_sym=False, right_sym=False, z_right=False, seed=0,
                  n_points=2048, n_pairs=100000):
    import jax.numpy as jnp

    from cppf_tpu.core.targets import generate_targets
    from cppf_tpu.data.synthetic import sample_surface

    rng = np.random.default_rng(seed)
    scale_range = [np.inf, -np.inf]
    vote_range = [0.0, 0.0]
    scale_means = []
    for mesh in meshes:
        pc = sample_surface(mesh, n_points, rng)
        pc = pc - (pc.min(0) + pc.max(0)) / 2
        idxs = rng.integers(0, len(pc), (n_pairs, 2)).astype(np.int32)
        normals = np.zeros_like(pc)  # aux targets unused here
        tgt = generate_targets(jnp.asarray(pc), jnp.asarray(normals), jnp.asarray(idxs),
                               up_sym, right_sym, z_right)
        tr = np.asarray(tgt.tr)
        diag = float(np.linalg.norm(pc.max(0) - pc.min(0)))
        scale_range[0] = min(scale_range[0], diag)
        scale_range[1] = max(scale_range[1], diag)
        vote_range[0] = max(vote_range[0], float(np.abs(tr[:, 0]).max()))
        vote_range[1] = max(vote_range[1], float(tr[:, 1].max()))
        scale_means.append(pc.max(0))
    return {
        "scale_range": scale_range,
        "vote_range": vote_range,
        "scale_mean": np.mean(scale_means, 0).tolist(),
    }


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--category", default="bowl")
    parser.add_argument("--shapenet_root", default="./data/ShapeNetCore.v2")
    parser.add_argument("--up_sym", action="store_true")
    parser.add_argument("--right_sym", action="store_true")
    parser.add_argument("--z_right", action="store_true")
    parser.add_argument("--max_meshes", type=int, default=0)
    args = parser.parse_args(argv)

    from cppf_tpu.config import load_config
    from cppf_tpu.data.mesh import load_obj
    from cppf_tpu.data.shapenet import ShapeNetRenderDataset
    from cppf_tpu.data.synthetic import PRIMITIVES

    cfg = load_config(args.category, overrides={"shapenet_root": args.shapenet_root})
    ds = ShapeNetRenderDataset(cfg)
    names = ds.model_names
    if names:
        if args.max_meshes:
            names = names[: args.max_meshes]
        meshes = []
        for name in names:
            cls_id, mesh_name = name.split("/")
            path = os.path.join(args.shapenet_root, cls_id, mesh_name, "models", "model_normalized.obj")
            try:
                meshes.append(load_obj(path))
            except Exception as e:
                print(f"skip {name}: {e}")
    else:
        meshes = [PRIMITIVES.get(args.category, PRIMITIVES["bottle"])()]

    stats = compute_stats(meshes, args.up_sym, args.right_sym, args.z_right)
    print(f"scale_range: {stats['scale_range']}")
    print(f"vote_range: {stats['vote_range']}")
    print(f"scale_mean: {stats['scale_mean']}")
    return stats


if __name__ == "__main__":
    main()
