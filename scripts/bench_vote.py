"""Measure center-vote strategies on the real chip at the reference workload.

Workload = reference nocs/inference.py:177,191: 100k pairs x 72 rots,
~3.2k points, res 4mm, 64^3 static grid.  Compares:
  - scatter (XLA scatter-add) full grid, trilinear + nearest
  - hierarchical peak (coarse bound + refine window), trilinear + nearest
and the end-to-end jitted pose program in each center_mode.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_vote.py
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from cppf_tpu.ops.voting import grid_argmax, ppf_vote, ppf_vote_peak

P = 100_000
R = 72
N = 3200
GRID = (64, 64, 64)
RES = 4e-3


def timeit(fn, *args, n=10, **kw):
    out = fn(*args, **kw)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args, **kw)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1e3, out


def main():
    rng = np.random.default_rng(0)
    pc = (rng.uniform(size=(N, 3)) * 0.2 + [0.1, -0.05, 0.6]).astype(np.float32)
    center = pc.mean(0)
    idxs = rng.integers(0, N, size=(P, 2)).astype(np.int32)
    a, b = pc[idxs[:, 0]], pc[idxs[:, 1]]
    u = (a - b) / (np.linalg.norm(a - b, axis=-1, keepdims=True) + 1e-7)
    proj = np.sum((a - center) * u, -1)
    odist = np.linalg.norm(a - center - proj[:, None] * u, axis=-1)
    # reference-style noisy bin-decoded predictions
    preds = np.stack([proj, odist], -1).astype(np.float32)
    preds += rng.normal(scale=0.004, size=preds.shape).astype(np.float32)

    corner = pc.min(0) - 0.13
    dims = np.minimum(((pc.max(0) + 0.13 - corner) / RES).astype(np.int32) + 1, 64)
    args = (jnp.array(pc), jnp.array(preds), jnp.ones(N, jnp.float32),
            jnp.array(idxs), jnp.array(corner), RES, jnp.array(dims))

    for splat in ("trilinear", "nearest"):
        ms, grid = timeit(ppf_vote, *args, GRID, n_rots=R, splat=splat, n=5)
        am = np.asarray(grid_argmax(grid, jnp.array(corner), RES))
        print(f"scatter/{splat:9s}: {ms:7.1f} ms  argmax={am}", file=sys.stderr)
        for dt in ("float32", "bfloat16"):
            ms, (idx, val) = timeit(ppf_vote_peak, *args, GRID, n_rots=R,
                                    splat=splat, bound_dtype=dt, n=5)
            pk = corner + np.asarray(idx) * RES
            print(f"hier   /{splat:9s}/{dt:8s}: {ms:7.1f} ms  peak ={pk}  "
                  f"val={float(val):.1f} (grid max {float(grid.max()):.1f})",
                  file=sys.stderr)


if __name__ == "__main__":
    main()
