"""Pallas kernel tests (interpret mode on CPU; compiled path runs on TPU)."""
import numpy as np
import jax.numpy as jnp

from cppf_tpu.core.geometry import fibonacci_sphere
from cppf_tpu.ops.voting import sphere_bin_count


def test_vote_peak_pallas_matches_xla(rng):
    """The fused Pallas bound/refine kernels give the same exact peak as the
    XLA formulation, for both splats (interpret mode on CPU)."""
    from cppf_tpu.ops.voting import ppf_vote, ppf_vote_peak

    n, p = 128, 512
    pc = rng.normal(size=(n, 3)).astype(np.float32) * 0.05
    idxs = rng.integers(0, n, (p, 2)).astype(np.int32)
    preds_tr = np.stack([rng.uniform(-0.05, 0.05, p), rng.uniform(0, 0.06, p)],
                        -1).astype(np.float32)
    probs = np.ones(n, np.float32)
    corner = pc.min(0) - 0.01
    res = 4e-3
    dims = jnp.asarray(((pc.max(0) - corner) / res).astype(np.int32) + 1)
    gshape = (64, 64, 64)
    for splat in ("trilinear", "nearest"):
        grid = ppf_vote(jnp.asarray(pc), jnp.asarray(preds_tr), jnp.asarray(probs),
                        jnp.asarray(idxs), jnp.asarray(corner), res, dims, gshape,
                        n_rots=24, splat=splat)
        g = np.asarray(grid)
        for use_pallas in (False, True):
            idx, peak = ppf_vote_peak(
                jnp.asarray(pc), jnp.asarray(preds_tr), jnp.asarray(probs),
                jnp.asarray(idxs), jnp.asarray(corner), res, dims, gshape,
                n_rots=24, splat=splat, vchunk=8192, use_pallas=use_pallas)
            # exact ties may resolve to any maximal voxel (docstring): the
            # returned voxel must BE a grid maximum, and the value must match
            np.testing.assert_allclose(g[tuple(np.asarray(idx))], g.max(), rtol=1e-6)
            np.testing.assert_allclose(float(peak), float(g.max()), rtol=1e-5)


def test_vote_hist_kernels_match_dense_oracle(rng):
    """bound_projections / refine_window vs a dense NumPy splat grid."""
    from cppf_tpu.ops.pallas.vote_hist import bound_projections, refine_window

    V, gx, gy, gz = 1024, 64, 64, 64
    f = rng.integers(0, gx - 2, (3, V)).astype(np.int32)
    r = rng.random((3, V)).astype(np.float32)
    w = (rng.random(V) < 0.8).astype(np.float32) * rng.random(V).astype(np.float32)
    grid = np.zeros((gx, gy, gz), np.float64)
    for dx in (0, 1):
        for dy in (0, 1):
            for dz in (0, 1):
                wk = ((r[0] if dx else 1 - r[0]) * (r[1] if dy else 1 - r[1])
                      * (r[2] if dz else 1 - r[2])) * w
                np.add.at(grid, (f[0] + dx, f[1] + dy, f[2] + dz), wk)
    pfy = pfz = 2
    args = [jnp.asarray(x) for x in (*f, *r, w)]
    mxy, mxz, myz = bound_projections(*args, gx=gx, gy=gy, by_n=gy // pfy,
                                      bz_n=gz // pfz, pfy=pfy, pfz=pfz,
                                      splat="trilinear", chunk=256, interpret=True)
    np.testing.assert_allclose(np.asarray(mxy),
                               grid.sum(2).reshape(gx, gy // 2, 2).sum(2), atol=1e-4)
    np.testing.assert_allclose(np.asarray(mxz),
                               grid.sum(1).reshape(gx, gz // 2, 2).sum(2), atol=1e-4)
    np.testing.assert_allclose(np.asarray(myz),
                               grid.sum(0).reshape(gy, gz // 2, 2).sum(2), atol=1e-4)
    o = np.array([16, 32, 0], np.int32)
    win = refine_window(o, *args, w8=16, splat="trilinear", chunk=256, interpret=True)
    np.testing.assert_allclose(np.asarray(win).reshape(16, 16, 16),
                               grid[16:32, 32:48, 0:16], atol=1e-4)


def test_dense_hist_matches_xla_grid(rng):
    """dense_hist (fused Pallas dense histogram) equals ppf_vote's grid —
    unpooled exactly, pooled equal to pool-summing the fine grid."""
    from cppf_tpu.ops.voting import ppf_vote, ppf_vote_dense

    n, p = 96, 384
    pc = rng.normal(size=(n, 3)).astype(np.float32) * 0.05
    idxs = rng.integers(0, n, (p, 2)).astype(np.int32)
    preds_tr = np.stack([rng.uniform(-0.05, 0.05, p), rng.uniform(0, 0.06, p)],
                        -1).astype(np.float32)
    probs = np.ones(n, np.float32)
    corner = pc.min(0) - 0.01
    res = 4e-3
    dims = jnp.asarray(((pc.max(0) - corner) / res).astype(np.int32) + 1)
    gshape = (32, 32, 32)
    for splat in ("trilinear", "nearest"):
        grid = np.asarray(ppf_vote(
            jnp.asarray(pc), jnp.asarray(preds_tr), jnp.asarray(probs),
            jnp.asarray(idxs), jnp.asarray(corner), res, dims, gshape,
            n_rots=24, splat=splat))
        fine = np.asarray(ppf_vote_dense(
            jnp.asarray(pc), jnp.asarray(preds_tr), jnp.asarray(probs),
            jnp.asarray(idxs), jnp.asarray(corner), res, dims, gshape,
            n_rots=24, splat=splat, vchunk=1024))
        np.testing.assert_allclose(fine, grid, atol=1e-3)
        pooled = np.asarray(ppf_vote_dense(
            jnp.asarray(pc), jnp.asarray(preds_tr), jnp.asarray(probs),
            jnp.asarray(idxs), jnp.asarray(corner), res, dims, gshape,
            n_rots=24, splat=splat, vchunk=1024, pool=(4, 4, 4)))
        expect = grid.reshape(8, 4, 8, 4, 8, 4).sum((1, 3, 5))
        np.testing.assert_allclose(pooled, expect, atol=1e-2)
