#!/usr/bin/env python
"""Recompute SUN RGB-D category statistics from the compositional families.

The SUN category YAMLs carry ``vote_range``/``scale_mean`` generated (via
``gen_stats``, the equivalent of reference gen_stats.py:29-57) from the
round-2 single-template families; the round-3 compositional generators
(cppf_tpu/data/compose.py) change the shape distributions, so the binning
ranges must cover the new family extremes or targets clip.

NOCS categories are NOT touched: their stats are the reference's own config
constants (reference config/category/*.yaml) and the families are
proportion-normalised to fit them.

Usage: python scripts/update_family_stats.py [--dry]
"""
import argparse
import os
import re
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SUN = ["table", "chair", "bed", "sofa", "bookshelf", "bathtub"]


def family_stats(category: str, scale_range, n_draws: int = 60, n_pairs: int = 20000,
                 seed: int = 0):
    from cppf_tpu.data.synthetic import random_primitive, sample_surface

    rng = np.random.default_rng(seed)
    vmax = 0.0
    bounds = []
    for _ in range(n_draws):
        m = random_primitive(category, rng)
        v = m.vertices
        diag = float(np.linalg.norm(v.max(0) - v.min(0)))
        pts = sample_surface(m, 2048, rng) / diag
        pts = pts - (pts.min(0) + pts.max(0)) / 2
        idxs = rng.integers(0, len(pts), (n_pairs, 2))
        a, b = pts[idxs[:, 0]], pts[idxs[:, 1]]
        d = a - b
        u = d / (np.linalg.norm(d, axis=-1, keepdims=True) + 1e-9)
        proj = np.sum(a * u, -1)
        dist2o = np.linalg.norm(a - proj[:, None] * u, axis=-1)
        vmax = max(vmax, float(np.abs(proj).max()), float(dist2o.max()))
        bounds.append((v.max(0) - v.min(0)) / diag)
    bounds = np.stack(bounds)
    bound_mean = bounds.mean(0)
    # the dataset swaps bound x/z unconditionally (shapenet.py::_render_once,
    # reference utils/dataset.py:246-247), so scale_mean lives in that order
    bound_mean[[0, 2]] = bound_mean[[2, 0]]
    smin, smax = float(scale_range[0]), float(scale_range[1])
    vote = vmax * smax * 1.05
    scale_mean = (bound_mean / 2 * (smin + smax) / 2).tolist()
    return [round(vote, 6)] * 2, [round(x, 6) for x in scale_mean]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dry", action="store_true")
    args = ap.parse_args()
    from cppf_tpu.config import CONFIG_ROOT, load_config

    for cat in SUN:
        cfg = load_config(cat)
        vote, smean = family_stats(cat, cfg.scale_range)
        path = os.path.join(CONFIG_ROOT, "category", f"{cat}.yaml")
        text = open(path).read()
        text = re.sub(r"vote_range: \[.*?\]", f"vote_range: [{vote[0]}, {vote[1]}]", text)
        text = re.sub(r"scale_mean: \[.*?\]",
                      "scale_mean: [" + ", ".join(str(x) for x in smean) + "]", text)
        print(f"{cat:10s} vote_range={vote[0]:.3f} scale_mean={[round(x,3) for x in smean]}"
              f" (was {cfg.vote_range[0]:.3f} / {[round(x,3) for x in cfg.scale_mean]})")
        if not args.dry:
            open(path, "w").write(text)


if __name__ == "__main__":
    main()
