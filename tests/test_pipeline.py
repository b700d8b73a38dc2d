"""End-to-end pipeline tests with a ground-truth oracle network
(SURVEY §4 integration seam: no checkpoint needed)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cppf_tpu.config import load_config
from cppf_tpu.data.synthetic import (
    PRIMITIVES,
    mesh_bounds,
    oracle_pair_predictions,
    sample_surface,
)
from cppf_tpu.pipeline.pose import PoseConfig, estimate_pose, vote_pose
from cppf_tpu.pipeline.preprocess import preprocess_cloud


def _posed_instance(rng, category="bottle", n=4000, scale=1.0):
    mesh = PRIMITIVES[category]()
    pc_canon = sample_surface(mesh, n, rng) * scale
    ang = np.deg2rad(40.0)
    R = np.array(
        [[np.cos(ang), 0, np.sin(ang)], [0, 1, 0], [-np.sin(ang), 0, np.cos(ang)]],
        np.float32,
    ) @ np.array(
        [[1, 0, 0], [0, np.cos(0.5), -np.sin(0.5)], [0, np.sin(0.5), np.cos(0.5)]],
        np.float32,
    )
    T = np.array([0.15, -0.08, 0.75], np.float32)
    return mesh, pc_canon @ R.T + T, R, T


def test_preprocess_cloud(rng):
    _, pc_cam, _, _ = _posed_instance(rng)
    pad = np.zeros((6000, 3), np.float32)
    pad[:4000] = pc_cam
    out = preprocess_cloud(jax.random.PRNGKey(0), jnp.array(pad), 4000, 0.004,
                           npoint_pad=4096, knn=30)
    n = int(out.n_valid)
    assert 100 < n <= 4096
    pc = np.asarray(out.pc)
    assert np.all(pc[n:] == 0)
    nrm = np.asarray(out.normals)[:n]
    np.testing.assert_allclose(np.linalg.norm(nrm, axis=-1), 1.0, atol=1e-3)


@pytest.mark.parametrize("category", ["bottle", "bowl"])
def test_oracle_pose_recovery(rng, category):
    """Full voting pipeline with GT pair predictions recovers T within the
    voxel tolerance, the up axis within sphere tolerance, and the scale."""
    cfg = load_config(category)
    mesh, pc_cam, R_true, T_true = _posed_instance(rng, category)
    lo, hi = mesh_bounds(mesh)
    bound = (hi - lo).copy()
    bound[[0, 2]] = bound[[2, 0]]  # NOCS x/z swap (reference utils/dataset.py:247)

    pad = np.zeros((4096, 3), np.float32)
    pad[:4000] = pc_cam
    pre = preprocess_cloud(jax.random.PRNGKey(1), jnp.array(pad), 4000, cfg.res,
                           npoint_pad=2048, knn=cfg.knn, jitter=False)
    n = int(pre.n_valid)
    pc = np.asarray(pre.pc)
    normals = np.asarray(pre.normals)

    pcfg = PoseConfig.from_config(cfg, n_pairs=20000)
    idxs = rng.integers(0, n, size=(20000, 2)).astype(np.int32)
    preds = oracle_pair_predictions(pc, normals, idxs, T_true, R_true, bound, 1.0, cfg)

    res = vote_pose(
        jax.random.PRNGKey(2), pre.pc, pre.normals, jnp.array(idxs), jnp.array(preds),
        pre.n_valid, jnp.array(pcfg.sphere_points()), pcfg,
    )
    T_err = np.linalg.norm(np.asarray(res.T) - T_true)
    assert T_err < 2.5 * cfg.res, f"T err {T_err}"

    up_true = R_true @ np.array([0, 1.0, 0])
    up_est = np.asarray(res.up)
    cos_up = float(up_est @ up_true)
    if cfg.up_sym:
        cos_up = abs(cos_up)
    assert cos_up > np.cos(np.deg2rad(5)), f"up axis cos {cos_up}"

    # scale: recovered absolute scale = NOCS extent (multiplier 2 * bound/2)
    np.testing.assert_allclose(np.asarray(res.scale), bound, rtol=0.05)
    assert int(res.n_filtered) > 0.3 * 20000


def test_estimate_pose_runs_with_random_weights(rng):
    """The jitted network+voting program compiles and returns finite results."""
    from cppf_tpu.pipeline.pose import make_models

    cfg = load_config("bowl")
    cfg.knn = 16
    mesh, pc_cam, R_true, T_true = _posed_instance(rng, "bowl", n=800)
    pad = np.zeros((1024, 3), np.float32)
    pad[:800] = pc_cam
    pre = preprocess_cloud(jax.random.PRNGKey(1), jnp.array(pad), 800, cfg.res,
                           npoint_pad=1024, knn=16)
    pcfg = PoseConfig.from_config(cfg, n_pairs=2048)
    pcfg = PoseConfig(**{**pcfg.__dict__, "knn": 16})
    point_enc, ppf_enc = make_models(cfg)
    from cppf_tpu.ops.knn import knn_indices

    nbr = knn_indices(pre.pc, 16)
    p_pt = point_enc.init(jax.random.PRNGKey(0), pre.pc, pre.normals, nbr)
    feat = point_enc.apply(p_pt, pre.pc, pre.normals, nbr)
    p_ppf = ppf_enc.init(
        jax.random.PRNGKey(1), pre.pc, pre.normals, feat, jnp.zeros((4, 2), jnp.int32)
    )
    out = estimate_pose(
        jax.random.PRNGKey(3), p_pt, p_ppf, pre.pc, pre.normals, pre.n_valid,
        jnp.array(pcfg.sphere_points()), pcfg,
    )
    assert np.isfinite(np.asarray(out.T)).all()
    assert np.isfinite(np.asarray(out.R)).all()
    # R orthonormal
    RtR = np.asarray(out.R).T @ np.asarray(out.R)
    np.testing.assert_allclose(RtR, np.eye(3), atol=1e-4)


def test_pose_f32_decode_mode_matches_on_cpu(rng):
    """pose_f32="decode" (decode-half f32, network bf16 on TPU) traces,
    compiles, and on CPU — where every matmul is f32 regardless — is
    bit-identical to pose_f32=True with the same rng."""
    from cppf_tpu.pipeline.pose import make_models

    cfg = load_config("bowl")
    cfg.knn = 16
    mesh, pc_cam, R_true, T_true = _posed_instance(rng, "bowl", n=800)
    pad = np.zeros((1024, 3), np.float32)
    pad[:800] = pc_cam
    pre = preprocess_cloud(jax.random.PRNGKey(1), jnp.array(pad), 800, cfg.res,
                           npoint_pad=1024, knn=16)
    point_enc, ppf_enc = make_models(cfg)
    from cppf_tpu.ops.knn import knn_indices

    nbr = knn_indices(pre.pc, 16)
    p_pt = point_enc.init(jax.random.PRNGKey(0), pre.pc, pre.normals, nbr)
    feat = point_enc.apply(p_pt, pre.pc, pre.normals, nbr)
    p_ppf = ppf_enc.init(
        jax.random.PRNGKey(1), pre.pc, pre.normals, feat, jnp.zeros((4, 2), jnp.int32)
    )
    outs = {}
    for mode in (True, "decode"):
        pcfg = PoseConfig.from_config(cfg, n_pairs=2048)
        pcfg = PoseConfig(**{**pcfg.__dict__, "knn": 16, "pose_f32": mode})
        outs[mode] = estimate_pose(
            jax.random.PRNGKey(3), p_pt, p_ppf, pre.pc, pre.normals,
            pre.n_valid, jnp.array(pcfg.sphere_points()), pcfg,
        )
    for a, b in zip(outs[True], outs["decode"]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=0)


def test_estimate_pose_batch(rng):
    """Batched multi-instance inference agrees with per-instance calls."""
    import jax
    from cppf_tpu.pipeline.pose import estimate_pose_batch, make_models
    from cppf_tpu.ops.knn import knn_indices

    cfg = load_config("bowl")
    cfg.knn = 16
    pcfg = PoseConfig.from_config(cfg, n_pairs=1024)
    pcfg = PoseConfig(**{**pcfg.__dict__, "knn": 16, "rot_subsample": 256})
    pres = []
    for seed in (0, 1):
        _, pc_cam, _, _ = _posed_instance(np.random.default_rng(seed), "bowl", n=600)
        pad = np.zeros((1024, 3), np.float32)
        pad[:600] = pc_cam
        pres.append(preprocess_cloud(jax.random.PRNGKey(seed), jnp.array(pad), 600,
                                     cfg.res, npoint_pad=1024, knn=16))
    point_enc, ppf_enc = make_models(cfg)
    p_pt = point_enc.init(jax.random.PRNGKey(0), pres[0].pc, pres[0].normals, pres[0].nbr_idx)
    feat = point_enc.apply(p_pt, pres[0].pc, pres[0].normals, pres[0].nbr_idx)
    p_pf = ppf_enc.init(jax.random.PRNGKey(1), pres[0].pc, pres[0].normals, feat,
                        jnp.zeros((4, 2), jnp.int32))
    sphere = jnp.array(pcfg.sphere_points())
    rngs = jax.random.split(jax.random.PRNGKey(7), 2)

    batched = estimate_pose_batch(
        rngs, p_pt, p_pf,
        jnp.stack([p.pc for p in pres]), jnp.stack([p.normals for p in pres]),
        jnp.stack([p.n_valid for p in pres]), sphere, pcfg,
        jnp.stack([p.nbr_idx for p in pres]),
    )
    for i in range(2):
        single = estimate_pose(rngs[i], p_pt, p_pf, pres[i].pc, pres[i].normals,
                               pres[i].n_valid, sphere, pcfg, nbr_idx=pres[i].nbr_idx)
        np.testing.assert_allclose(np.asarray(batched.T)[i], np.asarray(single.T), atol=1e-5)
        np.testing.assert_allclose(np.asarray(batched.R)[i], np.asarray(single.R), atol=1e-4)


def test_laptop_up_override(rng):
    """The laptop plane override replaces a wrong up axis
    (reference nocs/inference.py:314-323 semantics)."""
    cfg = load_config("laptop")
    mesh, pc_cam, R_true, T_true = _posed_instance(rng, "laptop", n=3000)
    lo, hi = mesh_bounds(mesh)
    bound = (hi - lo).copy()
    bound[[0, 2]] = bound[[2, 0]]
    pad = np.zeros((3072, 3), np.float32)
    pad[:3000] = pc_cam
    pre = preprocess_cloud(jax.random.PRNGKey(1), jnp.array(pad), 3000, cfg.res,
                           npoint_pad=2048, knn=cfg.knn, jitter=False)
    n = int(pre.n_valid)
    pcfg = PoseConfig.from_config(cfg, n_pairs=8192)
    idxs = rng.integers(0, n, size=(8192, 2)).astype(np.int32)
    preds = oracle_pair_predictions(np.asarray(pre.pc), np.asarray(pre.normals),
                                    idxs, T_true, R_true, bound, 1.0, cfg)
    sphere = jnp.array(pcfg.sphere_points())
    # without override
    res0 = vote_pose(jax.random.PRNGKey(2), pre.pc, pre.normals, jnp.array(idxs),
                     jnp.array(preds), pre.n_valid, sphere, pcfg)
    # with a GT laptop_up: result should stay close to GT up (dot(up, lup) >
    # dot(right, lup) for a correct estimate, so no swap happens)
    lup = (R_true @ np.array([0, 1.0, 0])).astype(np.float32)
    res1 = vote_pose(jax.random.PRNGKey(2), pre.pc, pre.normals, jnp.array(idxs),
                     jnp.array(preds), pre.n_valid, sphere, pcfg,
                     laptop_up=jnp.asarray(lup), laptop_up_valid=jnp.asarray(True))
    up_true = R_true @ np.array([0, 1.0, 0])
    assert float(np.asarray(res1.up) @ up_true) > 0.95
    # with a deliberately swapped axis claim: override kicks in and up follows
    # the plane normal direction (the right axis of the GT pose)
    wrong_lup = (R_true @ np.array([0, 0, 1.0])).astype(np.float32)
    res2 = vote_pose(jax.random.PRNGKey(2), pre.pc, pre.normals, jnp.array(idxs),
                     jnp.array(preds), pre.n_valid, sphere, pcfg,
                     laptop_up=jnp.asarray(wrong_lup), laptop_up_valid=jnp.asarray(True))
    assert np.isfinite(np.asarray(res2.R)).all()
    RtR = np.asarray(res2.R).T @ np.asarray(res2.R)
    np.testing.assert_allclose(RtR, np.eye(3), atol=1e-4)
    assert float(np.asarray(res2.up) @ wrong_lup) > 0.95
    # the caller's sign is TRUSTED (camera-facing contract,
    # laptop_up_from_aux): a negated axis claim is followed as-is rather
    # than re-derived from the voted axes — the re-derivation is what broke
    # at chance-level up-aux in round 4 (override up 151°)
    res3 = vote_pose(jax.random.PRNGKey(2), pre.pc, pre.normals, jnp.array(idxs),
                     jnp.array(preds), pre.n_valid, sphere, pcfg,
                     laptop_up=jnp.asarray(-wrong_lup), laptop_up_valid=jnp.asarray(True))
    assert float(np.asarray(res3.up) @ wrong_lup) < -0.95


def test_oracle_pose_recovery_asym_right(rng):
    """The asym_right_votes path (mug repo config) recovers BOTH axes from
    oracle predictions: the asymmetry-weighted cone-vote subsample must not
    break recovery when the network is exact, and the handle must survive
    the radial-asymmetry weighting (it is the only right-defining geometry)."""
    cfg = load_config("mug")
    assert cfg.asym_right_votes  # repo config enables the capability
    mesh, pc_cam, R_true, T_true = _posed_instance(rng, "mug")
    lo, hi = mesh_bounds(mesh)
    bound = (hi - lo).copy()
    bound[[0, 2]] = bound[[2, 0]]

    pad = np.zeros((4096, 3), np.float32)
    pad[:4000] = pc_cam
    pre = preprocess_cloud(jax.random.PRNGKey(1), jnp.array(pad), 4000, cfg.res,
                           npoint_pad=2048, knn=cfg.knn, jitter=False)
    n = int(pre.n_valid)
    pc = np.asarray(pre.pc)
    normals = np.asarray(pre.normals)

    pcfg = PoseConfig.from_config(cfg, n_pairs=20000)
    assert pcfg.asym_right_votes
    idxs = rng.integers(0, n, size=(20000, 2)).astype(np.int32)
    preds = oracle_pair_predictions(pc, normals, idxs, T_true, R_true, bound, 1.0, cfg)

    res = vote_pose(
        jax.random.PRNGKey(2), pre.pc, pre.normals, jnp.array(idxs), jnp.array(preds),
        pre.n_valid, jnp.array(pcfg.sphere_points()), pcfg,
    )
    T_err = np.linalg.norm(np.asarray(res.T) - T_true)
    assert T_err < 2.5 * cfg.res, f"T err {T_err}"
    up_true = R_true @ np.array([0, 1.0, 0])
    cos_up = abs(float(np.asarray(res.up) @ up_true))
    assert cos_up > np.cos(np.deg2rad(5)), f"up axis cos {cos_up}"
    right_true = R_true @ np.array([1.0, 0, 0])
    # with exact predictions the axis direction must be within sphere
    # tolerance modulo sign (the oracle aux bits fix the sign too)
    cos_right = float(np.asarray(res.right) @ right_true)
    assert abs(cos_right) > np.cos(np.deg2rad(6)), f"right axis cos {cos_right}"


def test_asym_center_refine_gates_off_on_revolution_body(rng):
    """asym_center_refine must self-gate on bodies with no radial protrusion:
    forcing the flag on for a surface of revolution (bowl) may not degrade the
    oracle T recovery (the asymmetry mass vanishes, so the azimuthal
    correction direction is undefined and the gate keeps the first-pass T)."""
    from dataclasses import replace

    cfg = load_config("bowl")
    mesh, pc_cam, R_true, T_true = _posed_instance(rng, "bowl")
    lo, hi = mesh_bounds(mesh)
    bound = (hi - lo).copy()
    bound[[0, 2]] = bound[[2, 0]]

    pad = np.zeros((4096, 3), np.float32)
    pad[:4000] = pc_cam
    pre = preprocess_cloud(jax.random.PRNGKey(1), jnp.array(pad), 4000, cfg.res,
                           npoint_pad=2048, knn=cfg.knn, jitter=False)
    n = int(pre.n_valid)
    pc = np.asarray(pre.pc)
    normals = np.asarray(pre.normals)

    pcfg = PoseConfig.from_config(cfg, n_pairs=20000)
    idxs = rng.integers(0, n, size=(20000, 2)).astype(np.int32)
    preds = oracle_pair_predictions(pc, normals, idxs, T_true, R_true, bound, 1.0, cfg)
    args = (pre.pc, pre.normals, jnp.array(idxs), jnp.array(preds),
            pre.n_valid, jnp.array(pcfg.sphere_points()))

    res_off = vote_pose(jax.random.PRNGKey(2), *args, pcfg)
    res_on = vote_pose(jax.random.PRNGKey(2), *args,
                       replace(pcfg, asym_center_refine=True))
    err_off = np.linalg.norm(np.asarray(res_off.T) - T_true)
    err_on = np.linalg.norm(np.asarray(res_on.T) - T_true)
    assert err_on < 2.5 * cfg.res, f"refined T err {err_on}"
    # the refine may move T only along the (noise-level) azimuth direction;
    # on a revolution body it must stay within a voxel of the first pass
    drift = np.linalg.norm(np.asarray(res_on.T) - np.asarray(res_off.T))
    assert drift <= cfg.res + 1e-6, f"refine drifted {drift} on a revolution body"


def test_geo_right_sign_direct_fixes_flipped_aux(rng):
    """Table desk variant: with the learned right-aux bit adversarially
    INVERTED (the at-chance regime on 2-fold-symmetric bodies),
    geo_right_sign with geo_right_dir="direct" must still recover the
    signed right axis from the +x drawer-pedestal protrusion centroid."""
    from cppf_tpu.data.synthetic import Mesh, _merge, _translate, make_box

    cfg = load_config("table")
    assert cfg.geo_right_sign and cfg.geo_right_dir == "direct"

    # desk: top + drawer pedestal under +x + two -x legs (compose.py family)
    top = _translate(make_box((1.0, 0.06, 0.7)), (0, 0.69, 0))
    bank = _translate(make_box((0.32, 0.66, 0.6)), (0.32, 0.33, 0))
    legs = _merge(*[
        _translate(make_box((0.06, 0.66, 0.06)), (-0.46, 0.33, sz * 0.3))
        for sz in (-1, 1)])
    mesh = _merge(top, bank, legs)
    v = mesh.vertices
    lo, hi = v.min(0), v.max(0)
    mesh = Mesh((v - (lo + hi) / 2).astype(np.float32), mesh.faces)

    pc_canon = sample_surface(mesh, 4000, rng) * 1.2
    ang = np.deg2rad(35.0)
    R_true = np.array(
        [[np.cos(ang), 0, np.sin(ang)], [0, 1, 0],
         [-np.sin(ang), 0, np.cos(ang)]], np.float32,
    ) @ np.array(
        [[1, 0, 0], [0, np.cos(0.6), -np.sin(0.6)],
         [0, np.sin(0.6), np.cos(0.6)]], np.float32)
    T_true = np.array([0.1, -0.05, 2.2], np.float32)
    pc_cam = pc_canon @ R_true.T + T_true

    pad = np.zeros((4096, 3), np.float32)
    pad[:4000] = pc_cam
    pre = preprocess_cloud(jax.random.PRNGKey(1), jnp.array(pad), 4000, cfg.res,
                           npoint_pad=2048, knn=cfg.knn, jitter=False)
    n = int(pre.n_valid)
    pc = np.asarray(pre.pc)
    normals = np.asarray(pre.normals)

    lo, hi = mesh_bounds(mesh)
    bound = (hi - lo) * 1.2
    pcfg = PoseConfig.from_config(cfg, n_pairs=10000)
    idxs = rng.integers(0, n, size=(10000, 2)).astype(np.int32)
    preds = oracle_pair_predictions(pc, normals, idxs, T_true, R_true,
                                    bound, 1.0, cfg)
    preds = np.asarray(preds).copy()
    preds[:, -4] = -preds[:, -4]  # invert the right-aux logit (at-chance bit)

    res = vote_pose(
        jax.random.PRNGKey(2), pre.pc, pre.normals, jnp.array(idxs),
        jnp.array(preds), pre.n_valid, jnp.array(pcfg.sphere_points()), pcfg,
    )
    up_true = R_true @ np.array([0, 1.0, 0])
    assert abs(float(np.asarray(res.up) @ up_true)) > np.cos(np.deg2rad(6))
    right_true = R_true @ np.array([1.0, 0, 0])
    cos_right = float(np.asarray(res.right) @ right_true)
    # SIGNED: the inverted aux bit alone would give cos_right < 0
    assert cos_right > np.cos(np.deg2rad(10)), f"signed right cos {cos_right}"


def test_up_prior_gates_sphere_peak(rng):
    """SUN gravity prior (PoseConfig.up_prior_deg): a window containing the
    true up is a no-op (the global peak survives the gate); a window that
    excludes it forces the peak inside the window — proving the gate acts on
    the argmax rather than re-weighting votes."""
    cfg = load_config("bowl")
    mesh, pc_cam, R_true, T_true = _posed_instance(rng, "bowl")
    up_true = R_true @ np.array([0, 1.0, 0])  # ~29 deg off +y
    lo, hi = mesh_bounds(mesh)
    bound = (hi - lo).copy()
    bound[[0, 2]] = bound[[2, 0]]
    pad = np.zeros((4096, 3), np.float32)
    pad[:4000] = pc_cam
    pre = preprocess_cloud(jax.random.PRNGKey(1), jnp.array(pad), 4000, cfg.res,
                           npoint_pad=2048, knn=cfg.knn, jitter=False)
    n = int(pre.n_valid)
    idxs = rng.integers(0, n, size=(10000, 2)).astype(np.int32)
    preds = oracle_pair_predictions(np.asarray(pre.pc), np.asarray(pre.normals),
                                    idxs, T_true, R_true, bound, 1.0, cfg)
    ups = {}
    for deg in (0.0, 45.0, 10.0):
        pcfg = PoseConfig.from_config(cfg, n_pairs=10000)
        pcfg = PoseConfig(**{**pcfg.__dict__, "up_prior_deg": deg})
        res = vote_pose(jax.random.PRNGKey(2), pre.pc, pre.normals,
                        jnp.array(idxs), jnp.array(preds), pre.n_valid,
                        jnp.array(pcfg.sphere_points()), pcfg)
        ups[deg] = np.asarray(res.up)
    # wide window keeps the oracle answer
    np.testing.assert_allclose(ups[0.0], ups[45.0], atol=1e-6)
    assert abs(float(ups[0.0] @ up_true)) > np.cos(np.deg2rad(5))
    # tight window excludes the true up (~29 deg off +y) → peak forced inside
    assert abs(float(ups[10.0][1])) > np.cos(np.deg2rad(11))


def test_axis_topk_oracle_equivalent(rng):
    """axis_topk re-scoring must not change the answer when the argmax peak
    is the true axis (oracle predictions): the aux BCE of the true axis
    beats every NMS runner-up, so K=4 returns the K=1 result."""
    cfg = load_config("bowl")
    mesh, pc_cam, R_true, T_true = _posed_instance(rng, "bowl")
    lo, hi = mesh_bounds(mesh)
    bound = (hi - lo).copy()
    bound[[0, 2]] = bound[[2, 0]]
    pad = np.zeros((4096, 3), np.float32)
    pad[:4000] = pc_cam
    pre = preprocess_cloud(jax.random.PRNGKey(1), jnp.array(pad), 4000, cfg.res,
                           npoint_pad=2048, knn=cfg.knn, jitter=False)
    n = int(pre.n_valid)
    idxs = rng.integers(0, n, size=(10000, 2)).astype(np.int32)
    preds = oracle_pair_predictions(np.asarray(pre.pc), np.asarray(pre.normals),
                                    idxs, T_true, R_true, bound, 1.0, cfg)
    outs = []
    for k in (1, 4):
        pcfg = PoseConfig.from_config(cfg, n_pairs=10000)
        pcfg = PoseConfig(**{**pcfg.__dict__, "axis_topk": k})
        res = vote_pose(jax.random.PRNGKey(2), pre.pc, pre.normals,
                        jnp.array(idxs), jnp.array(preds), pre.n_valid,
                        jnp.array(pcfg.sphere_points()), pcfg)
        outs.append(np.asarray(res.up))
    np.testing.assert_allclose(outs[0], outs[1], atol=1e-6)
    up_true = R_true @ np.array([0, 1.0, 0])
    assert abs(float(outs[1] @ up_true)) > np.cos(np.deg2rad(5))


def test_sample_pair_indices_uniform_and_stratified(rng):
    """pair_balance=0 reproduces the legacy uniform draw bit-exactly (rng
    parity for every committed checkpoint eval); pair_balance=1 equalises
    pair mass across surface ORIENTATIONS (a dominant plane — one normal
    bin — stops outvoting sparse independent geometry)."""
    import jax
    import jax.numpy as jnp

    from cppf_tpu.pipeline.pose import PoseConfig, sample_pair_indices

    n, n_valid = 1024, 900
    # plane-dominated cloud: 800 points on a 0.4 m table top (+y normal),
    # 100 on a cylindrical leg (radial normals, many orientation bins)
    pc = np.zeros((n, 3), np.float32)
    nrm = np.zeros((n, 3), np.float32)
    pc[:800, [0, 2]] = rng.uniform(-0.2, 0.2, (800, 2))
    nrm[:800, 1] = 1.0
    th = rng.uniform(0, 2 * np.pi, 100)
    pc[800:900, 0] = 0.02 * np.cos(th)
    pc[800:900, 2] = 0.02 * np.sin(th)
    pc[800:900, 1] = rng.uniform(-0.3, -0.1, 100)
    nrm[800:900, 0] = np.cos(th)
    nrm[800:900, 2] = np.sin(th)
    # arbitrary solver signs must not change the strata
    flip = rng.integers(0, 2, n).astype(np.float32) * 2 - 1
    nrm = nrm * flip[:, None]
    pcj, nrmj = jnp.asarray(pc), jnp.asarray(nrm)

    key = jax.random.PRNGKey(3)
    pcfg = PoseConfig(n_pairs=20000, res=5e-3)
    legacy_u = jax.random.uniform(key, (pcfg.n_pairs, 2))
    legacy = jnp.minimum((legacy_u * n_valid).astype(jnp.int32), n_valid - 1)
    got = sample_pair_indices(key, pcj, nrmj, n_valid, pcfg)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(legacy))

    pcfg_b = PoseConfig(n_pairs=20000, res=5e-3, pair_balance=1.0)
    idx = np.asarray(sample_pair_indices(key, pcj, nrmj, n_valid,
                                         pcfg_b)).reshape(-1)
    assert idx.max() < n_valid  # never samples padding
    frac_leg = np.mean(idx >= 800)
    # uniform gives ~11% leg; the top plane is ONE orientation stratum while
    # the leg spans many azimuth bins, so equalisation flips the balance
    assert frac_leg > 0.5, frac_leg

def test_pair_sep_power_smoke(rng):
    """pair_sep_power>0 (center-vote separation weighting) keeps the oracle
    pose recovery intact and demonstrably reaches the vote kernel: short
    pairs' mass is down-weighted, so the peak height strictly drops vs the
    unweighted vote of the same pairs."""
    cfg = load_config("bottle")
    mesh, pc_cam, R_true, T_true = _posed_instance(rng, "bottle")
    lo, hi = mesh_bounds(mesh)
    bound = (hi - lo).copy()
    bound[[0, 2]] = bound[[2, 0]]

    pad = np.zeros((4096, 3), np.float32)
    pad[:4000] = pc_cam
    pre = preprocess_cloud(jax.random.PRNGKey(1), jnp.array(pad), 4000, cfg.res,
                           npoint_pad=2048, knn=cfg.knn, jitter=False)
    n = int(pre.n_valid)
    pc = np.asarray(pre.pc)
    normals = np.asarray(pre.normals)

    idxs = rng.integers(0, n, size=(20000, 2)).astype(np.int32)
    preds = oracle_pair_predictions(pc, normals, idxs, T_true, R_true, bound,
                                    1.0, cfg)
    args = (pre.pc, pre.normals, jnp.array(idxs), jnp.array(preds),
            pre.n_valid)

    base = PoseConfig.from_config(cfg, n_pairs=20000)
    grid_maxes = {}
    for power in (0.0, 2.0):
        pcfg = PoseConfig(**{**base.__dict__, "pair_sep_power": power})
        res = vote_pose(jax.random.PRNGKey(2), *args,
                        jnp.array(pcfg.sphere_points()), pcfg)
        T_err = np.linalg.norm(np.asarray(res.T) - T_true)
        assert T_err < 2.5 * cfg.res, (power, T_err)
        up_true = R_true @ np.array([0, 1.0, 0])
        assert abs(float(np.asarray(res.up) @ up_true)) > np.cos(np.deg2rad(5))
        grid_maxes[power] = float(res.grid_max)
    assert grid_maxes[2.0] < grid_maxes[0.0] * 0.98, grid_maxes
