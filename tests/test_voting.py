import jax.numpy as jnp
import numpy as np
import pytest

from cppf_tpu.ops.voting import (
    backvote,
    circle_support,
    grid_argmax,
    ppf_vote,
    ppf_vote_peak,
    rot_vote,
    sphere_bin_count,
)
from cppf_tpu.core.geometry import fibonacci_sphere

from oracles import backvote_np, ppf_vote_np, rot_vote_np


def _instance(rng, n=80, p=256):
    pc = (rng.uniform(size=(n, 3)) * 0.2 + np.array([0.1, -0.05, 0.6])).astype(np.float32)
    idxs = rng.integers(0, n, size=(p, 2)).astype(np.int32)
    # some degenerate pairs
    idxs[:5, 1] = idxs[:5, 0]
    corner = pc.min(0)
    res = 0.01
    dims = ((pc.max(0) - corner) / res).astype(np.int32) + 1
    a = pc[idxs[:, 0]]
    b = pc[idxs[:, 1]]
    u = (a - b) / (np.linalg.norm(a - b, axis=-1, keepdims=True) + 1e-7)
    center = pc.mean(0)
    proj = np.sum((a - center) * u, -1)
    odist = np.linalg.norm(a - center - proj[:, None] * u, axis=-1)
    preds_tr = np.stack([proj, odist], -1).astype(np.float32)
    return pc, idxs, corner, res, dims, preds_tr, center


@pytest.mark.parametrize("adaptive", [False, True])
def test_ppf_vote_matches_oracle(rng, adaptive):
    pc, idxs, corner, res, dims, preds_tr, _ = _instance(rng)
    probs = np.ones(pc.shape[0], np.float32)
    n_rots = 24
    gshape = (int(dims[0]) + 3, int(dims[1]) + 2, int(dims[2]) + 5)  # padded
    grid = ppf_vote(
        jnp.array(pc), jnp.array(preds_tr), jnp.array(probs), jnp.array(idxs),
        jnp.array(corner), res, jnp.array(dims), gshape, n_rots=n_rots,
        adaptive=adaptive, chunk=64,
    )
    oracle = ppf_vote_np(pc, preds_tr, probs, idxs, corner, res, dims, n_rots, adaptive)
    got = np.asarray(grid)[: dims[0], : dims[1], : dims[2]]
    np.testing.assert_allclose(got, oracle, atol=2e-3)
    # nothing voted outside the runtime extent
    assert np.asarray(grid)[dims[0]:].sum() == 0
    assert np.asarray(grid)[:, dims[1]:].sum() == 0


def test_ppf_vote_finds_true_center(rng):
    """With ground-truth (proj_len, odist) the argmax voxel must hit the true
    center within one voxel (the SURVEY §4 integration oracle)."""
    n = 200
    theta = rng.uniform(0, 2 * np.pi, n)
    z = rng.uniform(-0.1, 0.1, n)
    pc = np.stack([0.1 * np.cos(theta), z, 0.1 * np.sin(theta)], -1).astype(np.float32)
    center = np.array([0.3, -0.2, 0.9], np.float32)
    pc = pc + center
    idxs = rng.integers(0, n, size=(4000, 2)).astype(np.int32)
    a, b = pc[idxs[:, 0]], pc[idxs[:, 1]]
    u = (a - b) / (np.linalg.norm(a - b, axis=-1, keepdims=True) + 1e-7)
    proj = np.sum((a - center) * u, -1)
    odist = np.linalg.norm(a - center - proj[:, None] * u, axis=-1)
    preds_tr = np.stack([proj, odist], -1).astype(np.float32)

    res = 0.005
    pad = 0.05
    corner = pc.min(0) - pad
    dims = ((pc.max(0) + pad - corner) / res).astype(np.int32) + 1
    gshape = tuple(int(d) for d in dims)
    grid = ppf_vote(
        jnp.array(pc), jnp.array(preds_tr), jnp.ones(n), jnp.array(idxs),
        jnp.array(corner), res, jnp.array(dims), gshape, n_rots=36, chunk=512,
    )
    t_est = np.asarray(grid_argmax(grid, jnp.array(corner), res))
    assert np.linalg.norm(t_est - center) < 1.8 * res


@pytest.mark.parametrize("splat", ["trilinear", "nearest"])
@pytest.mark.parametrize("adaptive", [False, True])
def test_ppf_vote_peak_matches_grid(rng, splat, adaptive):
    """The hierarchical peak finder must return the same argmax/max as the
    materialised grid, for both splats, on peaked (realistic) vote data."""
    pc, idxs, corner, res, dims, preds_tr, _ = _instance(rng, n=120, p=2048)
    probs = rng.uniform(0.5, 1.0, pc.shape[0]).astype(np.float32)
    n_rots = 24
    gshape = (int(dims[0]) + 3, int(dims[1]) + 2, int(dims[2]) + 5)
    args = (jnp.array(pc), jnp.array(preds_tr), jnp.array(probs), jnp.array(idxs),
            jnp.array(corner), res, jnp.array(dims))
    grid = np.asarray(ppf_vote(*args, gshape, n_rots=n_rots, adaptive=adaptive,
                               chunk=256, splat=splat))
    idx, val = ppf_vote_peak(*args, gshape, n_rots=n_rots, adaptive=adaptive,
                             vchunk=8192, splat=splat)
    idx, val = np.asarray(idx), float(val)
    np.testing.assert_allclose(val, grid.max(), rtol=2e-5)
    # the returned voxel must carry (numerically) the max vote mass — the
    # argmax itself may differ on fp-level ties
    np.testing.assert_allclose(grid[tuple(idx)], grid.max(), rtol=2e-5)


def test_ppf_vote_peak_empty_and_masked(rng):
    """All-masked votes → peak value 0 at voxel (0,0,0), like an empty grid."""
    pc, idxs, corner, res, dims, preds_tr, _ = _instance(rng)
    gshape = (int(dims[0]) + 1, int(dims[1]) + 1, int(dims[2]) + 1)
    idx, val = ppf_vote_peak(
        jnp.array(pc), jnp.array(preds_tr), jnp.ones(pc.shape[0]), jnp.array(idxs),
        jnp.array(corner), res, jnp.array(dims), gshape, n_rots=8, vchunk=4096,
        pair_mask=jnp.zeros(idxs.shape[0], bool),
    )
    assert float(val) == 0.0
    np.testing.assert_array_equal(np.asarray(idx), [0, 0, 0])


def test_ppf_vote_peak_multi_round(rng):
    """Two well-separated clusters force the refine loop to prove the bound:
    peak must match the grid argmax even when votes concentrate in several
    coarse cells."""
    n = 64
    pc = rng.uniform(size=(n, 3)).astype(np.float32) * 0.5
    idxs = rng.integers(0, n, size=(1024, 2)).astype(np.int32)
    corner = np.zeros(3, np.float32) - 0.05
    res = 0.01
    dims = np.array([64, 64, 64], np.int32)
    # synthetic preds: half the pairs vote tightly at center A, half at B
    a = pc[idxs[:, 0]]
    b = pc[idxs[:, 1]]
    u = (a - b) / (np.linalg.norm(a - b, axis=-1, keepdims=True) + 1e-7)
    centers = np.where((np.arange(1024) % 2 == 0)[:, None],
                       np.array([0.1, 0.1, 0.1]), np.array([0.45, 0.45, 0.45]))
    proj = np.sum((a - centers) * u, -1)
    odist = np.linalg.norm(a - centers - proj[:, None] * u, axis=-1)
    preds_tr = np.stack([proj, odist], -1).astype(np.float32)
    args = (jnp.array(pc), jnp.array(preds_tr), jnp.ones(n), jnp.array(idxs),
            jnp.array(corner), res, jnp.array(dims), (64, 64, 64))
    grid = np.asarray(ppf_vote(*args, n_rots=36, chunk=256))
    idx, val = ppf_vote_peak(*args, n_rots=36, vchunk=8192)
    np.testing.assert_allclose(float(val), grid.max(), rtol=2e-5)
    np.testing.assert_allclose(grid[tuple(np.asarray(idx))], grid.max(), rtol=2e-5)


@pytest.mark.parametrize("splat", ["trilinear", "nearest"])
def test_ppf_vote_peak_bf16_bounds_exact(rng, splat):
    """With bfloat16 bound-pass operands (the TPU production dtype) the
    returned peak is still the exact f32 grid argmax: bounds are inflated to
    stay admissible, and the refine pass stays f32."""
    pc, idxs, corner, res, dims, preds_tr, _ = _instance(rng, n=120, p=2048)
    gshape = (int(dims[0]) + 3, int(dims[1]) + 2, int(dims[2]) + 5)
    args = (jnp.array(pc), jnp.array(preds_tr), jnp.ones(pc.shape[0]),
            jnp.array(idxs), jnp.array(corner), res, jnp.array(dims))
    grid = np.asarray(ppf_vote(*args, gshape, n_rots=24, chunk=256, splat=splat))
    for use_pallas in (False, True):  # XLA fallback + (interpret-mode) Pallas
        idx, val = ppf_vote_peak(*args, gshape, n_rots=24, vchunk=8192,
                                 splat=splat, use_pallas=use_pallas,
                                 bound_dtype="bfloat16")
        np.testing.assert_allclose(float(val), grid.max(), rtol=2e-5)
        np.testing.assert_allclose(grid[tuple(np.asarray(idx))], grid.max(),
                                   rtol=2e-5)


def test_backvote_matches_oracle(rng):
    pc, idxs, corner, res, dims, preds_tr, center = _instance(rng)
    tol = 3 * res
    off, mask = backvote(
        jnp.array(pc), jnp.array(preds_tr), jnp.array(idxs), jnp.array(corner),
        res, jnp.array(dims), jnp.array(center), tol, n_rots=24, chunk=64,
    )
    oracle = backvote_np(pc, preds_tr, idxs, corner, res, dims, center, tol, 24)
    np.testing.assert_allclose(np.asarray(off), oracle, atol=1e-4)
    np.testing.assert_array_equal(np.asarray(mask), np.any(oracle != 0, -1))


def test_circle_support_brackets_backvote(rng):
    """The analytic point-to-circle test must agree with the sampled sweep:
    every sweep hit is an analytic hit at the same tol (samples lie ON the
    circle), and every analytic hit is a sweep hit once the tol is widened
    by the ~res sample spacing."""
    pc, idxs, corner, res, dims, preds_tr, center = _instance(rng)
    tol = 2 * res
    _, swept = backvote(
        jnp.array(pc), jnp.array(preds_tr), jnp.array(idxs), jnp.array(corner),
        res, jnp.array(dims), jnp.array(center), tol, n_rots=64, chunk=64,
    )
    exact = circle_support(jnp.array(pc), jnp.array(preds_tr), jnp.array(idxs),
                           jnp.array(center), tol, chunk=64)
    swept, exact = np.asarray(swept), np.asarray(exact)
    assert not np.any(swept & ~exact)
    # sweep at widened tol must cover every exact hit at the original tol
    # (the _instance grid covers the cloud, so no out-of-bounds misses)
    _, swept_wide = backvote(
        jnp.array(pc), jnp.array(preds_tr), jnp.array(idxs), jnp.array(corner),
        res, jnp.array(dims), jnp.array(center), tol + res, n_rots=64, chunk=64,
    )
    assert not np.any(exact & ~np.asarray(swept_wide))


def test_circle_support_true_center_dominates(rng):
    """All non-degenerate pairs support the true center at tight tol; a
    far-off point gets (almost) none."""
    pc, idxs, corner, res, dims, preds_tr, center = _instance(rng)
    hit = np.asarray(circle_support(jnp.array(pc), jnp.array(preds_tr),
                                    jnp.array(idxs), jnp.array(center),
                                    res / 4, chunk=64))
    # first 5 are forced-degenerate; a random pair may also self-pair
    assert hit[5:].mean() > 0.95 and not hit[:5].any()
    far = np.asarray(circle_support(jnp.array(pc), jnp.array(preds_tr),
                                    jnp.array(idxs),
                                    jnp.array(center + 0.5), res / 4,
                                    chunk=64))
    assert far.sum() < 0.02 * len(idxs)


def test_rot_vote_matches_oracle(rng):
    pc, idxs, *_ = _instance(rng, n=60, p=128)
    preds_rot = rng.uniform(0, np.pi, 128).astype(np.float32)
    out = rot_vote(jnp.array(pc), jnp.array(preds_rot), jnp.array(idxs), n_rots=16, chunk=32)
    oracle = rot_vote_np(pc, preds_rot, idxs, 16)
    np.testing.assert_allclose(np.asarray(out), oracle, atol=1e-4)


def test_rot_vote_recovers_axis(rng):
    """Candidate-axis voting with GT angles peaks at the true object axis."""
    n = 150
    pc = rng.normal(size=(n, 3)).astype(np.float32) * 0.1
    true_up = np.array([0.0, 1.0, 0.0], np.float32)
    idxs = rng.integers(0, n, size=(3000, 2)).astype(np.int32)
    a, b = pc[idxs[:, 0]], pc[idxs[:, 1]]
    u = (a - b) / (np.linalg.norm(a - b, axis=-1, keepdims=True) + 1e-7)
    angles = np.arccos(np.clip(np.sum(u * true_up, -1), -1, 1)).astype(np.float32)
    cands = np.asarray(rot_vote(jnp.array(pc), jnp.array(angles), jnp.array(idxs), n_rots=72))
    sphere = fibonacci_sphere(2000).astype(np.float32)
    counts = np.asarray(
        sphere_bin_count(jnp.array(cands.reshape(-1, 3)), jnp.array(sphere), np.cos(np.deg2rad(3.0)), chunk=4096)
    )
    best = sphere[np.argmax(counts)]
    assert min(np.linalg.norm(best - true_up), np.linalg.norm(best + true_up)) < 0.12


def test_rot_vote_sphere_count_matches_unfused(rng):
    """The fused componentwise op equals sphere_bin_count(rot_vote(...))
    (up to fp-boundary ties in the cos > tol compare)."""
    from cppf_tpu.ops.voting import rot_vote_sphere_count

    pc, idxs, *_ = _instance(rng, n=80, p=600)
    preds_rot = rng.uniform(0, np.pi, 600).astype(np.float32)
    sphere = fibonacci_sphere(480).astype(np.float32)
    tol = np.cos(np.deg2rad(1.5))
    cands = np.asarray(rot_vote(jnp.array(pc), jnp.array(preds_rot),
                                jnp.array(idxs), n_rots=24, chunk=128))
    dense = np.asarray(sphere_bin_count(jnp.array(cands.reshape(-1, 3)),
                                        jnp.array(sphere), tol, chunk=2048))
    fused = np.asarray(rot_vote_sphere_count(
        jnp.array(pc), jnp.array(preds_rot), jnp.array(idxs),
        jnp.array(sphere), tol, n_rots=24, chunk=256))
    # identical counts except possibly votes landing exactly on the cos_tol
    # boundary (different summation order in the dot product)
    assert np.abs(fused - dense).max() <= 1
    assert np.argmax(fused) == np.argmax(dense)


def test_sphere_bin_count_matches_dense(rng):
    cands = rng.normal(size=(500, 3)).astype(np.float32)
    cands /= np.linalg.norm(cands, axis=-1, keepdims=True)
    sphere = fibonacci_sphere(300).astype(np.float32)
    tol = np.cos(np.deg2rad(10))
    dense = ((cands @ sphere.T) > tol).sum(0)
    ours = np.asarray(sphere_bin_count(jnp.array(cands), jnp.array(sphere), tol, chunk=128))
    np.testing.assert_array_equal(ours.astype(int), dense)


def test_rot_vote_sphere_count_weighted(rng):
    """weights=1 reproduces the unweighted counts; fractional weights scale
    each pair's cone-vote contribution linearly."""
    import jax.numpy as jnp

    from cppf_tpu.core.geometry import fibonacci_sphere
    from cppf_tpu.ops.voting import rot_vote_sphere_count

    pc = jnp.asarray(rng.normal(size=(64, 3)).astype(np.float32) * 0.1)
    idxs = jnp.asarray(rng.integers(0, 64, size=(200, 2)).astype(np.int32))
    angles = jnp.asarray(rng.uniform(0.1, 3.0, 200).astype(np.float32))
    sphere = jnp.asarray(fibonacci_sphere(120).astype(np.float32))
    cos_tol = np.cos(np.deg2rad(5.0))
    base = rot_vote_sphere_count(pc, angles, idxs, sphere, cos_tol, n_rots=24)
    ones = rot_vote_sphere_count(pc, angles, idxs, sphere, cos_tol, n_rots=24,
                                 weights=jnp.ones(200))
    np.testing.assert_allclose(np.asarray(base), np.asarray(ones), atol=1e-4)
    halves = rot_vote_sphere_count(pc, angles, idxs, sphere, cos_tol, n_rots=24,
                                   weights=jnp.full(200, 0.5))
    np.testing.assert_allclose(np.asarray(halves), np.asarray(base) * 0.5, atol=1e-4)


def test_center_refine_oracle_exact(rng):
    """center_refine recovers the exact center from clean circle constraints
    (sub-0.1mm with bin-level prediction noise); gated off below min_pairs."""
    import jax.numpy as jnp

    from cppf_tpu.ops.voting import center_refine

    o = np.array([0.1, -0.05, 0.8], np.float32)
    pc = (rng.standard_normal((1024, 3)) * 0.08 + o).astype(np.float32)
    idxs = rng.integers(0, 1024, size=(8000, 2)).astype(np.int32)
    a, b = pc[idxs[:, 0]], pc[idxs[:, 1]]
    ab = a - b
    abu = ab / (np.linalg.norm(ab, axis=-1, keepdims=True) + 1e-9)
    proj = np.sum((a - o) * abu, -1)
    od = np.linalg.norm((a - o) - proj[:, None] * abu, axis=-1)
    preds_tr = np.stack([proj, od], -1).astype(np.float32)

    res = 0.004
    T0 = (o + np.array([0.6, -0.4, 0.5], np.float32) * res).astype(np.float32)
    mask = np.ones(8000, bool)
    T = center_refine(jnp.array(pc), jnp.array(preds_tr), jnp.array(idxs),
                      jnp.array(T0), jnp.array(mask), res)
    assert np.linalg.norm(np.asarray(T) - o) < 1e-5

    # bin-quantisation-level noise: still well below the voxel floor
    noise = rng.standard_normal(preds_tr.shape).astype(np.float32) * 0.0019
    T2 = center_refine(jnp.array(pc), jnp.array(preds_tr + noise),
                       jnp.array(idxs), jnp.array(T0), jnp.array(mask), res)
    assert np.linalg.norm(np.asarray(T2) - o) < 5e-4

    # min-pairs gate: too few survivors -> identity
    few = np.zeros(8000, bool)
    few[:8] = True
    T3 = center_refine(jnp.array(pc), jnp.array(preds_tr), jnp.array(idxs),
                       jnp.array(T0), jnp.array(few), res)
    np.testing.assert_allclose(np.asarray(T3), T0, atol=1e-7)


def _plane_mirror_scene(rng, n=240, p=3000):
    """Table-top-like scene: all points on the plane z=1 (camera at the
    origin, outward normals -z), true center BEHIND the plane at z=1.15.
    Every pair is coplanar-ambiguous: its vote circle passes through the
    true center AND the mirror at z=0.85."""
    xy = rng.uniform(-0.15, 0.15, size=(n, 2)).astype(np.float32)
    pc = np.concatenate([xy, np.ones((n, 1), np.float32)], -1)
    center = np.array([0.0, 0.0, 1.15], np.float32)
    mirror = np.array([0.0, 0.0, 0.85], np.float32)
    idxs = rng.integers(0, n, size=(p, 2)).astype(np.int32)
    a, b = pc[idxs[:, 0]], pc[idxs[:, 1]]
    u = (a - b) / (np.linalg.norm(a - b, axis=-1, keepdims=True) + 1e-7)
    proj = np.sum((a - center) * u, -1)
    odist = np.linalg.norm(a - center - proj[:, None] * u, axis=-1)
    preds_tr = np.stack([proj, odist], -1).astype(np.float32)
    res = 0.01
    corner = np.array([-0.2, -0.2, 0.7], np.float32)
    dims = np.array([41, 41, 61], np.int32)
    n_out = np.tile(np.float32([0.0, 0.0, -1.0]), (p, 1))
    return pc, idxs, preds_tr, corner, res, dims, center, mirror, n_out


def _ball_mass(grid, corner, res, loc, r=3):
    i = np.round((loc - corner) / res).astype(int)
    sl = tuple(slice(max(0, i[k] - r), i[k] + r + 1) for k in range(3))
    return float(grid[sl].sum())


def test_ppf_vote_halfspace_suppresses_mirror(rng):
    """Coplanar pairs' vote circles hit the true center AND its mirror
    across the shared plane; the half-space gate (object-interior side of
    the camera-oriented normal) must kill the mirror peak while keeping the
    true-center mass (PoseConfig.coplanar_halfspace)."""
    pc, idxs, preds_tr, corner, res, dims, center, mirror, n_out = \
        _plane_mirror_scene(rng)
    gshape = (48, 48, 64)
    args = (jnp.array(pc), jnp.array(preds_tr), jnp.ones(pc.shape[0]),
            jnp.array(idxs), jnp.array(corner), res, jnp.array(dims), gshape)
    base = np.asarray(ppf_vote(*args, n_rots=72, chunk=512))
    m_true = _ball_mass(base, corner, res, center)
    m_mirror = _ball_mass(base, corner, res, mirror)
    # the ambiguity is real: mirror mass is comparable to the true mass
    assert m_mirror > 0.5 * m_true

    hs = (jnp.array(pc[idxs[:, 0]]), jnp.array(n_out),
          jnp.ones(idxs.shape[0], bool), 2.0 * res)
    gated = np.asarray(ppf_vote(*args, n_rots=72, chunk=512, halfspace=hs))
    g_true = _ball_mass(gated, corner, res, center)
    g_mirror = _ball_mass(gated, corner, res, mirror)
    assert g_mirror < 0.02 * m_mirror          # mirror side dead
    assert g_true > 0.95 * m_true              # true side preserved
    # argmax now lands at the true center
    t_est = np.asarray(grid_argmax(jnp.array(gated), jnp.array(corner), res))
    assert np.linalg.norm(t_est - center) < 2 * res


def test_ppf_vote_halfspace_ungated_is_noop(rng):
    """gate=False pairs (and a huge margin) reproduce the baseline grid
    exactly — the half-space path only ever removes gated mirror votes."""
    pc, idxs, corner, res, dims, preds_tr, _ = _instance(rng)
    gshape = (int(dims[0]) + 3, int(dims[1]) + 2, int(dims[2]) + 5)
    args = (jnp.array(pc), jnp.array(preds_tr), jnp.ones(pc.shape[0]),
            jnp.array(idxs), jnp.array(corner), res, jnp.array(dims), gshape)
    base = np.asarray(ppf_vote(*args, n_rots=24, chunk=64))
    a_pts = jnp.array(pc[idxs[:, 0]])
    n_ref = jnp.array(np.tile(np.float32([0, 0, -1]), (idxs.shape[0], 1)))
    off = np.asarray(ppf_vote(*args, n_rots=24, chunk=64,
                              halfspace=(a_pts, n_ref,
                                         jnp.zeros(idxs.shape[0], bool), 0.0)))
    np.testing.assert_array_equal(off, base)
    wide = np.asarray(ppf_vote(*args, n_rots=24, chunk=64,
                               halfspace=(a_pts, n_ref,
                                          jnp.ones(idxs.shape[0], bool), 1e3)))
    np.testing.assert_array_equal(wide, base)


@pytest.mark.parametrize("splat", ["trilinear", "nearest"])
def test_ppf_vote_peak_halfspace_matches_grid(rng, splat):
    """The branch-and-bound peak under a half-space gate equals the gated
    grid's argmax/max (the gate folds into vote weights before the bounds)."""
    pc, idxs, preds_tr, corner, res, dims, center, _, n_out = \
        _plane_mirror_scene(rng, n=120, p=1500)
    gshape = (48, 48, 64)
    hs = (jnp.array(pc[idxs[:, 0]]), jnp.array(n_out),
          jnp.ones(idxs.shape[0], bool), 2.0 * res)
    args = (jnp.array(pc), jnp.array(preds_tr), jnp.ones(pc.shape[0]),
            jnp.array(idxs), jnp.array(corner), res, jnp.array(dims))
    grid = np.asarray(ppf_vote(*args, gshape, n_rots=24, chunk=256,
                               splat=splat, halfspace=hs))
    idx, val = ppf_vote_peak(*args, gshape, n_rots=24, vchunk=8192,
                             splat=splat, halfspace=hs)
    np.testing.assert_allclose(float(val), grid.max(), rtol=2e-5)
    np.testing.assert_allclose(grid[tuple(np.asarray(idx))], grid.max(),
                               rtol=2e-5)


def test_ppf_vote_float_pair_weights(rng):
    """Float pair_mask scales vote mass: {0,1} floats match the bool mask
    exactly, and 0.5 weights exactly halve each pair's contribution."""
    pc, idxs, corner, res, dims, preds_tr, _ = _instance(rng)
    probs = np.ones(pc.shape[0], np.float32)
    gshape = (int(dims[0]) + 3, int(dims[1]) + 2, int(dims[2]) + 5)
    mask_b = rng.uniform(size=len(idxs)) > 0.3
    common = dict(n_rots=24, chunk=64)
    args = (jnp.array(pc), jnp.array(preds_tr), jnp.array(probs),
            jnp.array(idxs), jnp.array(corner), res, jnp.array(dims), gshape)
    g_bool = ppf_vote(*args, pair_mask=jnp.array(mask_b), **common)
    g_float = ppf_vote(*args, pair_mask=jnp.array(mask_b.astype(np.float32)),
                       **common)
    np.testing.assert_allclose(np.asarray(g_bool), np.asarray(g_float),
                               atol=1e-6)
    g_half = ppf_vote(*args, pair_mask=jnp.array(0.5 * mask_b.astype(np.float32)),
                      **common)
    np.testing.assert_allclose(np.asarray(g_half), 0.5 * np.asarray(g_bool),
                               atol=1e-6)
