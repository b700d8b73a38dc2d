import numpy as np
from scipy.spatial.transform import Rotation

from cppf_tpu.eval.box3d import Box3D
from cppf_tpu.eval.sunrgbd_eval import gt_rt_from_bbox, nms
from cppf_tpu.eval.sunrgbd_inference import EX_MAT, decode_sunrgbd_depth


def test_nms_suppresses_duplicates(rng):
    R = np.eye(3)
    boxes = [
        Box3D.from_transformation(R, np.zeros(3), np.ones(3)),
        Box3D.from_transformation(R, np.array([0.05, 0, 0]), np.ones(3)),  # dup
        Box3D.from_transformation(R, np.array([5.0, 0, 0]), np.ones(3)),   # separate
    ]
    scores = np.array([0.9, 0.5, 0.8])
    pick = nms(boxes, scores, 0.3)
    assert 0 in pick and 2 in pick and 1 not in pick


def test_nms_keeps_all_disjoint():
    R = np.eye(3)
    boxes = [Box3D.from_transformation(R, np.array([3.0 * i, 0, 0]), np.ones(3)) for i in range(4)]
    pick = nms(boxes, np.arange(4, dtype=float), 0.3)
    assert sorted(pick) == [0, 1, 2, 3]


def test_gt_rt_from_bbox_roundtrip():
    """The GT transform built by the eval maps canonical box corners onto the
    same world points the inference pipeline sees."""
    rot = Rotation.from_euler("y", 0.3).as_matrix()
    Rtilt = Rotation.from_euler("x", 0.1).as_matrix()
    extra_mat = EX_MAT @ (rot @ Rtilt) @ EX_MAT
    ry = 0.7
    bbox = np.array([1.0, 2.0, 0.5, 0.4, 0.3, 0.2, -ry, 3.0])
    RT, scales = gt_rt_from_bbox(bbox, rot @ Rtilt, extra_mat)
    np.testing.assert_allclose(scales, [0.4, 0.2, 0.3])
    # rotation part orthonormal
    np.testing.assert_allclose(RT[:3, :3].T @ RT[:3, :3], np.eye(3), atol=1e-9)
    # translation: (tx, tz, ty) reordered through the frame conjugation
    expected_t = np.linalg.inv(extra_mat) @ EX_MAT @ (rot @ Rtilt) @ EX_MAT @ np.array([1.0, 0.5, 2.0])
    np.testing.assert_allclose(RT[:3, 3], expected_t, atol=1e-12)


def test_depth_decode_matches_bit_rotation():
    raw = np.arange(0, 65536, 977, dtype=np.uint16)
    dec = decode_sunrgbd_depth(raw)
    ref = ((raw >> 3) | (raw << 13)).astype(np.uint16)
    ref = np.minimum(ref, 8000)
    np.testing.assert_array_equal(dec, ref)
