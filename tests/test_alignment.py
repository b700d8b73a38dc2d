import numpy as np
from scipy.spatial.transform import Rotation

from cppf_tpu.eval.alignment import estimate_similarity_transform, umeyama


def test_umeyama_recovers_similarity(rng):
    R = Rotation.random(random_state=3).as_matrix()
    s = 1.7
    t = np.array([0.3, -0.2, 0.9])
    src = rng.normal(size=(200, 3))
    tgt = src @ (s * R) + t  # row-vector convention of the reference
    scales, rot, trans, out = umeyama(src, tgt)
    np.testing.assert_allclose(scales, s, atol=1e-6)
    np.testing.assert_allclose(rot, R, atol=1e-6)
    np.testing.assert_allclose(trans, t, atol=1e-6)
    # row-vector convention: target = source @ (s·R) + t
    tgt2 = src @ (scales[0] * rot) + trans
    np.testing.assert_allclose(tgt2, tgt, atol=1e-5)


def test_ransac_rejects_outliers(rng):
    np.random.seed(0)
    R = Rotation.random(random_state=5).as_matrix()
    s = 0.8
    t = np.array([-0.1, 0.4, 0.2])
    src = rng.normal(size=(300, 3))
    tgt = src @ (s * R) + t
    # corrupt 20%
    bad = rng.choice(300, 60, replace=False)
    tgt[bad] += rng.normal(size=(60, 3)) * 5.0
    scales, rot, trans, _ = estimate_similarity_transform(src, tgt)
    assert scales is not None
    np.testing.assert_allclose(scales[0], s, atol=0.05)
    np.testing.assert_allclose(rot, R, atol=0.05)
