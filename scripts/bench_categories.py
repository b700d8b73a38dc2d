"""Per-category steady-state pose-pipeline timing (BENCH.md round-3 table).

Every category compiles its own static grid (56^3-152^3 from vote_range/res)
and bin widths; this sweeps all 12 + the regression model and reports
pipelined ms/pose at the reference inference workload (100k pairs).

Run on an otherwise-idle TPU:
    PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_categories.py
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CATEGORIES = ["bottle", "bowl", "camera", "can", "laptop", "mug",
              "table", "chair", "bed", "sofa", "bookshelf", "bathtub"]


def bench_category(category: str, n_iter: int = 10) -> dict:
    import jax
    import jax.numpy as jnp

    from cppf_tpu.config import load_config
    from cppf_tpu.data.synthetic import random_primitive, sample_surface
    from cppf_tpu.pipeline.pose import PoseConfig, estimate_pose, make_models
    from cppf_tpu.pipeline.preprocess import preprocess_cloud
    from cppf_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    cfg = load_config(category)
    pcfg = PoseConfig.from_config(cfg)
    rng = np.random.default_rng(0)
    mesh = random_primitive(category, rng)
    pc_cam = sample_surface(mesh, 4000, rng).astype(np.float32)
    scale = 0.5 * (cfg.scale_range[0] + cfg.scale_range[1])
    pc_cam = pc_cam / max(np.linalg.norm(pc_cam.max(0) - pc_cam.min(0)), 1e-6) * scale
    pc_cam = pc_cam + np.float32([0, 0, max(1.0, scale)])
    pad = np.zeros((cfg.npoint_max, 3), np.float32)
    pad[:4000] = pc_cam

    pre = preprocess_cloud(jax.random.PRNGKey(0), jnp.asarray(pad), 4000,
                           cfg.res, npoint_pad=cfg.npoint_pad, knn=cfg.knn)
    point_enc, ppf_enc = make_models(cfg)
    p_pt = point_enc.init(jax.random.PRNGKey(1), pre.pc, pre.normals, pre.nbr_idx)
    feat = point_enc.apply(p_pt, pre.pc, pre.normals, pre.nbr_idx)
    p_pf = ppf_enc.init(jax.random.PRNGKey(2), pre.pc, pre.normals, feat,
                        jnp.zeros((8, 2), jnp.int32))
    sphere = jnp.asarray(pcfg.sphere_points())

    def one(key):
        return estimate_pose(key, p_pt, p_pf, pre.pc, pre.normals,
                             pre.n_valid, sphere, pcfg, nbr_idx=pre.nbr_idx)

    keys = jax.random.split(jax.random.PRNGKey(3), n_iter + 2)
    t0 = time.perf_counter()
    out = one(keys[0])
    jax.block_until_ready(out.RT)
    compile_s = time.perf_counter() - t0
    # pipelined steady state: dispatch all, block at the end
    outs = [one(k) for k in keys[1:]]
    jax.block_until_ready(outs[-1].RT)
    t0 = time.perf_counter()
    outs = [one(k) for k in keys[1:]]
    jax.block_until_ready(outs[-1].RT)
    dt = (time.perf_counter() - t0) / (n_iter + 1)
    return {
        "grid": pcfg.grid_shape[0],
        "tr_bins": cfg.tr_num_bins,
        "ms_per_pose": round(dt * 1000, 1),
        "pairs_per_s": round(pcfg.n_pairs / dt / 1e6, 2),
        "compile_s": round(compile_s, 1),
    }


def main():
    cats = sys.argv[1:] or CATEGORIES
    results = {}
    for c in cats:
        r = bench_category(c)
        results[c] = r
        print(f"{c:10s} grid {r['grid']:4d}^3  tr_bins {r['tr_bins']:3d}  "
              f"{r['ms_per_pose']:6.1f} ms/pose  {r['pairs_per_s']:5.2f} M pairs/s "
              f"(compile {r['compile_s']:.0f}s)", flush=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
