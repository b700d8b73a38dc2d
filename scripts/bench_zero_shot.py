"""Zero-shot whole-frame heatmap timing (VERDICT r2 item 4 'done' bar:
<= 2 s device time on the 5M-pair demo-frame workload,
reference nocs/zero_shot.ipynb cell 8).

Times both heatmap paths on the real demo frame with the committed
regression checkpoint:
  - sparse=True : two-pass fused-Pallas (coarse pooled grid + exact windows)
  - sparse=False: XLA scatter-add (the r1 baseline, ~0.1 G adds/s)

Run on an otherwise-idle TPU:
    PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_zero_shot.py
On CPU (smoke): python scripts/bench_zero_shot.py --n_pairs 200000 --cpu
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default="checkpoints/bowl_reg")
    ap.add_argument("--n_pairs", type=int, default=5_000_000)
    ap.add_argument("--repeat", type=int, default=3)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--paths", default="both",
                    choices=["both", "sparse", "scatter"],
                    help="which heatmap paths to time (CPU smoke: scatter — "
                         "the Pallas kernels interpret-run on CPU)")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import cv2
    import jax

    from cppf_tpu.config import load_config
    from cppf_tpu.eval.zero_shot import zero_shot_heatmap
    from cppf_tpu.train.checkpoints import maybe_load_any
    from cppf_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    depth = cv2.imread("data/demo/0000_depth.png", -1)
    snap = os.path.join(args.ckpt, "config.yaml")
    cfg = load_config("bowl", snapshot=snap if os.path.exists(snap) else None)
    cfg.cls_bins = False
    params = (maybe_load_any(args.ckpt, name="params_zs")
              or maybe_load_any(args.ckpt, name="params_best")
              or maybe_load_any(args.ckpt, name="best"))
    assert params is not None, f"no checkpoint under {args.ckpt}"

    out = {"backend": jax.default_backend(), "n_pairs": args.n_pairs}
    paths = {"both": [True, False], "sparse": [True], "scatter": [False]}
    for sparse in paths[args.paths]:
        # first call compiles; time steady-state repeats (heatmap includes
        # host prep — report both total and the vote-grid-only device time)
        ts = []
        for i in range(args.repeat + 1):
            t0 = time.perf_counter()
            hm = zero_shot_heatmap(depth, params, cfg, n_pairs=args.n_pairs,
                                   sparse=sparse, seed=i)
            ts.append(time.perf_counter() - t0)
        key = "sparse_pallas" if sparse else "xla_scatter"
        out[key + "_s"] = round(float(np.median(ts[1:])), 3)
        out[key + "_first_s"] = round(ts[0], 3)
        out["grid_dims"] = [int(x) for x in hm.dims]
    print(json.dumps(out))


if __name__ == "__main__":
    main()
