"""Golden parity: our host-side eval stack vs the reference implementation
run on identical synthetic prediction sets (SURVEY §4 'golden/parity').

The reference utils/util.py imports open3d (absent here); we stub it —
the eval functions never touch it at runtime.
"""
import sys
import types

import numpy as np
import pytest
from scipy.spatial.transform import Rotation

# stub native deps the reference eval code imports but never calls
for name in ("open3d", "open3d.geometry", "open3d.utility"):
    if name not in sys.modules:
        sys.modules[name] = types.ModuleType(name)
sys.path.insert(0, "/root/reference")

ref_util = pytest.importorskip("utils.util")
ref_box = pytest.importorskip("utils.box")
ref_iou = pytest.importorskip("utils.iou")

from cppf_tpu.eval.box3d import Box3D
from cppf_tpu.eval.iou3d import iou_boxes, iou_sampling
from cppf_tpu.eval.metrics import compute_3d_iou, compute_degree_cm_mAP, compute_pose_error


def _random_rt(rng, scale_mult=1.0):
    R = Rotation.random(random_state=int(rng.integers(1 << 30))).as_matrix()
    rt = np.eye(4)
    rt[:3, :3] = R * scale_mult
    rt[:3, 3] = rng.uniform(-0.5, 0.5, 3)
    return rt


def test_box_fit_matches_reference(rng):
    for _ in range(10):
        R = Rotation.random(random_state=int(rng.integers(1 << 30))).as_matrix()
        t = rng.uniform(-1, 1, 3)
        s = rng.uniform(0.2, 2.0, 3)
        ours = Box3D.from_transformation(R, t, s)
        theirs = ref_box.Box.from_transformation(R, t, s)
        np.testing.assert_allclose(ours.vertices, theirs.vertices, atol=1e-9)
        np.testing.assert_allclose(ours.rotation, theirs.rotation, atol=1e-7)
        np.testing.assert_allclose(ours.translation, theirs.translation, atol=1e-7)
        np.testing.assert_allclose(ours.scale, theirs.scale, atol=1e-7)
        np.testing.assert_allclose(ours.volume, theirs.volume, atol=1e-9)


def test_iou_matches_reference(rng):
    for _ in range(20):
        R1 = Rotation.random(random_state=int(rng.integers(1 << 30))).as_matrix()
        R2 = Rotation.random(random_state=int(rng.integers(1 << 30))).as_matrix()
        t1 = rng.uniform(-0.2, 0.2, 3)
        t2 = rng.uniform(-0.2, 0.2, 3)
        s1 = rng.uniform(0.5, 1.5, 3)
        s2 = rng.uniform(0.5, 1.5, 3)
        ours = iou_boxes(Box3D.from_transformation(R1, t1, s1),
                         Box3D.from_transformation(R2, t2, s2))
        theirs = ref_iou.IoU(
            ref_box.Box.from_transformation(R1, t1, s1),
            ref_box.Box.from_transformation(R2, t2, s2),
        ).iou()
        np.testing.assert_allclose(ours, theirs, atol=1e-9)


def test_iou_identity_and_disjoint():
    R = np.eye(3)
    b1 = Box3D.from_transformation(R, np.zeros(3), np.ones(3))
    assert abs(iou_boxes(b1, b1) - 1.0) < 1e-9
    b2 = Box3D.from_transformation(R, np.array([5.0, 0, 0]), np.ones(3))
    assert iou_boxes(b1, b2) == 0.0
    # axis-aligned half-overlap analytic case
    b3 = Box3D.from_transformation(R, np.array([0.5, 0, 0]), np.ones(3))
    np.testing.assert_allclose(iou_boxes(b1, b3), 0.5 / 1.5, atol=1e-9)
    # MC estimator in the right ballpark
    assert abs(iou_sampling(b1, b3, 20000, np.random.default_rng(0)) - 1 / 3) < 0.03


def test_pose_error_matches_reference(rng):
    for up_sym in (False, True):
        for _ in range(10):
            rt1 = _random_rt(rng, scale_mult=rng.uniform(0.5, 2.0))
            rt2 = _random_rt(rng, scale_mult=rng.uniform(0.5, 2.0))
            ours = compute_pose_error(rt1.copy(), rt2.copy(), up_sym)
            theirs = ref_util.compute_RT_degree_cm_symmetry(rt1.copy(), rt2.copy(), up_sym)
            np.testing.assert_allclose(ours, theirs, atol=1e-7)


def test_compute_3d_iou_matches_reference(rng):
    names = ["BG", "bowl"]
    for up_sym in (False, True):
        for _ in range(5):
            rt1 = _random_rt(rng)
            rt2 = _random_rt(rng)
            s1 = rng.uniform(0.5, 1.5, 3)
            s2 = rng.uniform(0.5, 1.5, 3)
            ours = compute_3d_iou(rt1.copy(), rt2.copy(), s1, s2, up_sym, "bowl", "bowl")
            theirs = ref_util.compute_3d_iou(rt1.copy(), rt2.copy(), s1, s2, up_sym, "bowl", "bowl")
            np.testing.assert_allclose(ours, theirs, atol=1e-9)


def _synthetic_results(rng, n_frames=6, max_inst=4):
    """Random per-frame GT + noisy predictions in the NOCS result format."""
    names = ["BG", "bottle", "bowl", "mug"]
    results = []
    for _ in range(n_frames):
        n_gt = int(rng.integers(1, max_inst + 1))
        gt_ids = rng.integers(1, len(names), n_gt).astype(np.int32)
        gt_RTs, gt_scales, up_syms = [], [], []
        for _ in range(n_gt):
            rt = _random_rt(rng, scale_mult=rng.uniform(0.8, 1.2))
            gt_RTs.append(rt)
            gt_scales.append(rng.uniform(0.3, 1.0, 3))
            up_syms.append(bool(rng.integers(0, 2)))
        # predictions: perturbed GT + one spurious
        pred_ids, pred_RTs, pred_scales, pred_scores = [], [], [], []
        for j in range(n_gt):
            if rng.uniform() < 0.8:
                rt = gt_RTs[j].copy()
                ang = rng.uniform(0, 0.2)
                noise = Rotation.from_rotvec(ang * np.array([0, 0, 1.0])).as_matrix()
                rt[:3, :3] = rt[:3, :3] @ noise
                rt[:3, 3] += rng.uniform(-0.05, 0.05, 3)
                pred_ids.append(gt_ids[j])
                pred_RTs.append(rt)
                pred_scales.append(gt_scales[j] * rng.uniform(0.9, 1.1))
                pred_scores.append(rng.uniform(0.5, 1.0))
        pred_ids.append(int(rng.integers(1, len(names))))
        pred_RTs.append(_random_rt(rng))
        pred_scales.append(rng.uniform(0.3, 1.0, 3))
        pred_scores.append(rng.uniform(0.1, 0.4))

        results.append({
            "gt_class_ids": np.array(gt_ids),
            "gt_RTs": np.stack(gt_RTs),
            "gt_scales": np.stack(gt_scales),
            "gt_up_syms": np.array(up_syms),
            "pred_class_ids": np.array(pred_ids),
            "pred_bboxes": np.ones((len(pred_ids), 4)),
            "pred_RTs": np.stack(pred_RTs),
            "pred_scales": np.stack(pred_scales),
            "pred_scores": np.array(pred_scores),
        })
    return names, results


def _deepcopy_results(results):
    import copy

    return copy.deepcopy(results)


@pytest.mark.parametrize("use_matches", [True, False])
def test_map_protocol_matches_reference(rng, tmp_path, use_matches, capsys):
    names, results = _synthetic_results(rng)
    degree_thres = [5, 10, 15]
    shift_thres = [5, 10, 15]
    iou_thres = np.linspace(0, 1, 21)

    ours_iou, ours_pose, ours_pm, ours_gm = compute_degree_cm_mAP(
        _deepcopy_results(results), names, str(tmp_path / "ours"),
        degree_thresholds=degree_thres, shift_thresholds=shift_thres,
        iou_3d_thresholds=iou_thres, iou_pose_thres=0.1,
        use_matches_for_pose=use_matches, plot=False, verbose=False,
    )
    ref_iou_aps, ref_pose_aps, ref_pm, ref_gm = ref_util.compute_degree_cm_mAP(
        _deepcopy_results(results), names, str(tmp_path / "ref"),
        degree_thresholds=degree_thres, shift_thresholds=shift_thres,
        iou_3d_thresholds=iou_thres, iou_pose_thres=0.1,
        use_matches_for_pose=use_matches,
    )
    capsys.readouterr()
    np.testing.assert_allclose(ours_iou, ref_iou_aps, atol=1e-12)
    np.testing.assert_allclose(ours_pose, ref_pose_aps, atol=1e-12)
    np.testing.assert_array_equal(ours_pm, ref_pm)
    np.testing.assert_array_equal(ours_gm, ref_gm)


def test_map_protocol_empty_frames(rng, tmp_path, capsys):
    """Frames with no predictions / no GT of a class exercise the empty-path
    bookkeeping; must still match the reference exactly."""
    names, results = _synthetic_results(rng, n_frames=4)
    # frame with GT but zero predictions
    results[1]["pred_class_ids"] = np.zeros(0, int)
    results[1]["pred_RTs"] = np.zeros((0, 4, 4))
    results[1]["pred_scales"] = np.zeros((0, 3))
    results[1]["pred_scores"] = np.zeros(0)
    results[1]["pred_bboxes"] = np.zeros((0, 4))
    ours = compute_degree_cm_mAP(
        _deepcopy_results(results), names, str(tmp_path / "o"),
        degree_thresholds=[5, 15], shift_thresholds=[5, 15],
        iou_3d_thresholds=np.linspace(0, 1, 21), iou_pose_thres=0.1,
        use_matches_for_pose=True, plot=False, verbose=False,
    )
    ref = ref_util.compute_degree_cm_mAP(
        _deepcopy_results(results), names, str(tmp_path / "r"),
        degree_thresholds=[5, 15], shift_thresholds=[5, 15],
        iou_3d_thresholds=np.linspace(0, 1, 21), iou_pose_thres=0.1,
        use_matches_for_pose=True,
    )
    capsys.readouterr()
    np.testing.assert_allclose(ours[0], ref[0], atol=1e-12)
    np.testing.assert_allclose(ours[1], ref[1], atol=1e-12)
