"""Zero-shot multi-instance pipeline with a GT-oracle regression network on a
synthetic two-object depth frame."""
import numpy as np

from cppf_tpu.config import load_config
from cppf_tpu.data import native
from cppf_tpu.data.shapenet import TRAIN_INTRINSICS
from cppf_tpu.data.synthetic import PRIMITIVES
from cppf_tpu.eval.zero_shot import extract_proposals_host, filter_degenerate_pairs, zero_shot_detect


def _two_object_depth():
    """Two cylinders side by side, rendered to a depth map (mm uint16)."""
    mesh = PRIMITIVES["can"]()
    centers_render = [np.float32([-0.12, 0.0, -0.7]), np.float32([0.12, 0.03, -0.8])]
    K = TRAIN_INTRINSICS
    depth = np.zeros((480, 640), np.float32)
    for c in centers_render:
        v = mesh.vertices * 1.5 + c
        d = native.rasterize_depth(v, mesh.faces, K[0, 0], K[1, 1], K[0, 2], K[1, 2], 640, 480)
        depth = np.where((depth == 0) | ((d > 0) & (d < depth)), d, depth)
    # centers in the zero-shot cloud frame: the raster projects y with the
    # image convention (the synthetic generators render v * [1,-1,-1] for
    # this reason), so the recovered cloud is (x_render, -y_render, +depth)
    # — y IS negated end-to-end, x is negated twice (net unchanged).
    # (A previous revision had +y here; the oracle then voted 2·y off the
    # real surface, which the observed-extent anchor exposed.)
    centers_cloud = [np.array([c[0], -c[1], -c[2]]) for c in centers_render]
    return (depth * 1000).astype(np.uint16), centers_cloud, mesh


def _oracle_predict(centers, cfg):
    """GT regression preds: pairs within one object vote for its center;
    cross-object pairs get uninformative values."""

    def predict(pc, pc_normal, idxs):
        a = pc[idxs[:, 0]]
        b = pc[idxs[:, 1]]
        # assign each point to the nearest object center
        d2 = np.stack([np.linalg.norm(pc - c, axis=-1) for c in centers], -1)
        owner = np.argmin(d2, -1)
        same = owner[idxs[:, 0]] == owner[idxs[:, 1]]
        T = np.stack(centers)[owner[idxs[:, 0]]]

        d = a - b
        du = d / (np.linalg.norm(d, axis=-1, keepdims=True) + 1e-7)
        rel = a - T
        proj = np.sum(rel * du, -1)
        odist = np.linalg.norm(rel - proj[:, None] * du, axis=-1)
        up_ang = np.arccos(np.clip(du[:, 1], -1, 1))
        up_ang = np.minimum(up_ang, np.pi - up_ang)  # can is up_sym
        n_a = pc_normal[idxs[:, 0]].copy()
        n_a[np.sum(n_a * du, -1) < 0] *= -1
        aux_up = (n_a[:, 1] > 0).astype(np.float32)

        scale_logit = np.log(np.array([0.105, 0.15, 0.105]) / 2 / np.asarray(cfg.scale_mean))
        out = np.zeros((len(idxs), 9), np.float32)
        out[:, 0] = np.where(same, proj, 10.0)       # push cross-object votes off-grid
        out[:, 1] = np.where(same, odist, 10.0)
        out[:, 2] = up_ang
        out[:, 4] = (aux_up * 2 - 1) * 50
        out[:, 6:9] = scale_logit
        return out

    return predict


def test_zero_shot_two_instances(rng):
    cfg = load_config("can")
    depth, centers, _ = _two_object_depth()
    dets = zero_shot_detect(
        depth, params=None, cfg=cfg, intrinsics=TRAIN_INTRINSICS,
        n_pairs=200000, num_rots=36, prop_thresh=20.0,
        predict_fn=_oracle_predict(centers, cfg), seed=0,
    )
    assert len(dets) >= 2, f"expected >=2 detections, got {len(dets)}"
    found = []
    for c in centers:
        errs = [np.linalg.norm(d.T - c) for d in dets]
        found.append(min(errs))
    assert max(found) < 0.03, f"center errors {found}"
    # instance masks are disjoint-ish and non-trivial
    m0 = dets[0].mask
    m1 = dets[1].mask
    assert m0.sum() > 20 and m1.sum() > 20
    overlap = (m0 & m1).sum() / min(m0.sum(), m1.sum())
    assert overlap < 0.3, f"instance masks overlap {overlap}"


def test_scene_planes_extent_guard(rng):
    """A wide table plane is flagged as a support surface; RANSAC's best
    plane through a curved object (a narrow tangent band) is not."""
    from cppf_tpu.eval.zero_shot import scene_planes

    table = np.stack([rng.uniform(-0.5, 0.5, 3000),
                      np.full(3000, 0.0) + rng.normal(0, 0.002, 3000),
                      rng.uniform(0.8, 1.8, 3000)], -1).astype(np.float32)
    theta = rng.uniform(0, 2 * np.pi, 800)
    cyl = np.stack([0.08 * np.cos(theta),
                    rng.uniform(0.0, 0.2, 800),
                    1.2 + 0.08 * np.sin(theta)], -1).astype(np.float32)
    mask = scene_planes(np.concatenate([table, cyl]))
    assert mask[:3000].mean() > 0.9, "table not recognised"
    assert mask[3000:].mean() < 0.3, "cylinder wrongly on-plane"

    # cylinder alone: its tangent band must NOT count as a support surface
    mask_cyl = scene_planes(cyl)
    assert mask_cyl.mean() < 0.1


def test_filter_degenerate_pairs(rng):
    # coplanar points with identical normals → pairs dropped
    pc = np.zeros((50, 3), np.float32)
    pc[:, :2] = rng.uniform(-1, 1, (50, 2))
    nrm = np.tile(np.float32([0, 0, 1]), (50, 1))
    idxs = rng.integers(0, 50, (100, 2))
    kept = filter_degenerate_pairs(pc, nrm, idxs)
    assert len(kept) == 0
    # curved surface normals → kept
    nrm2 = rng.normal(size=(50, 3)).astype(np.float32)
    nrm2 /= np.linalg.norm(nrm2, axis=-1, keepdims=True)
    kept2 = filter_degenerate_pairs(pc, nrm2, idxs)
    assert len(kept2) > 50


def test_extract_proposals_host():
    grid = np.zeros((40, 40, 40), np.float32)
    grid[10, 10, 10] = 5000.0
    grid[30, 25, 20] = 3000.0
    corner = np.zeros(3)
    props = extract_proposals_host(grid, corner, 0.01, thresh=10.0, margin=5)
    assert len(props) == 2
    np.testing.assert_allclose(props[0][0], [0.10, 0.10, 0.10], atol=1e-6)
    np.testing.assert_allclose(props[1][0], [0.30, 0.25, 0.20], atol=1e-6)


def test_sparse_heatmap_proposals_match_dense(rng):
    """The two-pass Pallas sparse heatmap yields the same proposals as the
    dense scatter grid (the zero-shot consumer contract)."""
    import jax.numpy as jnp

    from cppf_tpu.config import load_config
    from cppf_tpu.eval.zero_shot import _sparse_frame_grid, extract_proposals_host
    from cppf_tpu.ops.voting import ppf_vote

    cfg = load_config("can")
    res = 16e-3  # coarse: keeps the CPU interpret-mode kernels quick
    depth, centers, _ = _two_object_depth()
    pc_full, _ = __import__("cppf_tpu.core.geometry", fromlist=["backproject"]).backproject(
        depth, TRAIN_INTRINSICS, depth > 0)
    pc_full = pc_full / 1000.0
    pc_full[:, 0] = -pc_full[:, 0]
    pc_full[:, 1] = -pc_full[:, 1]
    pick = rng.choice(len(pc_full), 1500, replace=False)
    pc = pc_full[pick].astype(np.float32)
    n = len(pc)
    idxs = rng.integers(0, n, (4000, 2)).astype(np.int32)
    nrm = rng.normal(size=(n, 3)).astype(np.float32)
    nrm /= np.linalg.norm(nrm, axis=-1, keepdims=True)
    preds = _oracle_predict(centers, cfg)(pc, nrm, idxs)
    preds_tr = preds[:, :2].astype(np.float32)

    corner = pc.min(0)
    dims = ((pc.max(0) - corner) / res).astype(np.int32) + 1
    gshape = tuple(int(np.ceil(d / 8) * 8) for d in dims)
    dense = np.asarray(ppf_vote(
        jnp.asarray(pc), jnp.asarray(preds_tr), jnp.ones(n, np.float32),
        jnp.asarray(idxs), jnp.asarray(corner), res, jnp.asarray(dims),
        gshape, n_rots=12, adaptive=True,
    ))[: dims[0], : dims[1], : dims[2]]
    sparse = _sparse_frame_grid(pc, preds_tr, idxs, corner, dims, res,
                                num_rots=12, n_cands=6, window=16,
                                coarse_pool=4, pair_budget=4096)

    p_dense = extract_proposals_host(dense, corner, res, thresh=10.0)
    p_sparse = extract_proposals_host(sparse, corner, res, thresh=10.0)
    assert len(p_dense) == len(p_sparse) >= 2, (len(p_dense), len(p_sparse))
    for (cd, dd), (cs, ds) in zip(p_dense, p_sparse):
        np.testing.assert_allclose(cd, cs, atol=2 * res)
        np.testing.assert_allclose(dd, ds, rtol=0.05)


def test_zero_shot_benchmark_plumbing(tmp_path):
    """scripts/zero_shot_benchmark.py result-building: GT-oracle detections
    through the mAP protocol must score AP 100 (and an empty detector 0)."""
    import sys

    sys.path.insert(0, "scripts")
    from synthetic_benchmark import make_frames
    from zero_shot_benchmark import run_frames

    from cppf_tpu.eval import nocs_eval
    from cppf_tpu.eval.nocs_inference import SYNSET_NAMES
    from cppf_tpu.eval.zero_shot import Detection

    out = str(tmp_path)
    seg_dir, nocs_dir = make_frames(out, "bowl", 2, seed=0, instances=2)

    import pickle

    def oracle_detect_factory(f_idx_holder):
        def detect(depth):
            with open(f"{seg_dir}/results_real_scene1_{f_idx_holder[0]:04d}.pkl", "rb") as f:
                gt = pickle.load(f)
            dets = []
            for rt, sc in zip(gt["gt_RTs"], gt["gt_scales"]):
                s_norm = np.linalg.norm(rt[:3, :3], axis=0).mean()
                dets.append(Detection(rt[:3, 3], rt[:3, :3] / s_norm,
                                      sc * s_norm, rt, None, 1.0))
            f_idx_holder[0] += 1
            return dets
        return detect

    pred_dir = f"{out}/pred"
    n = run_frames(range(2), seg_dir, nocs_dir, pred_dir,
                   oracle_detect_factory([0]))
    assert n == 4
    iou_aps, pose_aps, _, _ = nocs_eval.main(["--pred_dir", pred_dir, "--subsample", "1"])
    cls = SYNSET_NAMES.index("bowl")
    assert pose_aps[cls, 2, 2] == 1.0          # 15deg 15cm
    assert iou_aps[cls, 50] == 1.0

    # empty detector -> zero AP, no crashes on the zero-length arrays
    n = run_frames(range(2), seg_dir, nocs_dir, f"{out}/pred_empty",
                   lambda depth: [])
    assert n == 0
    iou_aps, pose_aps, _, _ = nocs_eval.main(
        ["--pred_dir", f"{out}/pred_empty", "--subsample", "1"])
    assert pose_aps[cls, 2, 2] == 0.0


def _box_surface(center, R, scale, n=4000, rng=None, faces="all"):
    """Points on the surface of an oriented box (full extents ``scale``)."""
    rng = rng or np.random.default_rng(0)
    pts = []
    per = max(n // 6, 1)
    for axis in range(3):
        for side in (-1.0, 1.0):
            if faces != "all" and (axis, side) not in faces:
                continue
            p = rng.uniform(-0.5, 0.5, (per, 3))
            p[:, axis] = 0.5 * side
            pts.append(p)
    pts = np.concatenate(pts) * np.asarray(scale)
    return pts @ np.asarray(R).T + np.asarray(center)


def test_anchor_box_t_midpoint_recovers_center(rng):
    """Fully observed box: every axis midpoint-anchors, recovering the true
    center from a biased vote regardless of scale error."""
    from cppf_tpu.eval.anchor import anchor_box_t

    center = np.array([0.1, -0.2, 1.2])
    th = 0.4
    R = np.array([[np.cos(th), 0, np.sin(th)], [0, 1, 0], [-np.sin(th), 0, np.cos(th)]])
    scale = np.array([0.16, 0.05, 0.14])
    pts = _box_surface(center, R, scale, rng=rng)
    T_biased = center + np.array([0.02, -0.025, 0.018])
    # midpoint anchoring must not depend on the predicted extent being right
    out = anchor_box_t(T_biased, R, scale * 0.9, pts)
    assert np.linalg.norm(out - center) < 0.004, out - center


def test_anchor_box_t_face_anchor_partial_view(rng):
    """Front half of a box observed (single view along +z): the depth axis
    face-anchors its camera-facing extreme, the fully-spanned lateral axes
    midpoint-anchor, and a truncated lateral axis is left alone."""
    from cppf_tpu.eval.anchor import anchor_box_t

    center = np.array([0.0, 0.0, 1.0])        # camera at origin looks +z
    R = np.eye(3)
    scale = np.array([0.2, 0.06, 0.2])
    pts = _box_surface(center, R, scale, rng=rng)
    front = pts[pts[:, 2] <= center[2]]        # back half self-occluded
    T_biased = center + np.array([0.02, 0.02, -0.02])
    out = anchor_box_t(T_biased, R, scale, front)
    assert np.linalg.norm(out - center) < 0.005, out - center

    # externally occluded lateral side (-x half missing): x must NOT be
    # face-anchored (its visible extreme is an occlusion edge, and x is
    # perpendicular to the view ray) — the voted x survives
    occluded = front[front[:, 0] >= center[0] - 0.02]
    out = anchor_box_t(T_biased, R, scale, occluded)
    assert abs(out[0] - T_biased[0]) < 1e-9
    assert abs(out[2] - center[2]) < 0.005


def test_anchor_box_t_guards(rng):
    """Thin masks leave T unchanged; corrections are clipped."""
    from cppf_tpu.eval.anchor import anchor_box_t

    T = np.array([0.0, 0.0, 1.0])
    R = np.eye(3)
    scale = np.array([0.1, 0.1, 0.1])
    out = anchor_box_t(T, R, scale, np.zeros((3, 3)))
    assert np.allclose(out, T)
    # a mask wildly off to one side cannot drag T further than clip per axis
    pts = _box_surface(T + np.array([0.5, 0.0, 0.0]), R, scale, rng=rng)
    out = anchor_box_t(T, R, scale, pts, clip=0.05)
    assert abs(out[0] - T[0]) <= 0.05 + 1e-9
