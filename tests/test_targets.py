import jax
import jax.numpy as jnp
import numpy as np

from cppf_tpu.core.targets import generate_targets, sample_pair_idxs, soft_bin_targets


def _numpy_generate_target(pc, normals, point_idxs, up_sym, right_sym, z_right):
    """Oracle transcription of reference utils/dataset.py:20-60."""
    a = pc[point_idxs[:, 0]]
    b = pc[point_idxs[:, 1]]
    pdist = a - b
    u = pdist / (np.linalg.norm(pdist, axis=-1, keepdims=True) + 1e-7)
    proj_len = np.sum(a * u, -1)
    oc = a - proj_len[..., None] * u
    dist2o = np.linalg.norm(oc, axis=-1)
    tr = np.stack([proj_len, dist2o], -1)

    up = np.array([0, 1, 0.0])
    right = np.array([0, 0, 1.0]) if z_right else np.array([1.0, 0, 0])
    up_cos = np.arccos(np.clip(np.sum(u * up, -1), -1, 1))
    if up_sym:
        up_cos = np.minimum(up_cos, np.arccos(np.clip(-np.sum(u * up, -1), -1, 1)))
    right_cos = np.arccos(np.clip(np.sum(u * right, -1), -1, 1))
    if right_sym:
        right_cos = np.minimum(right_cos, np.arccos(np.clip(-np.sum(u * right, -1), -1, 1)))
    rot = np.stack([up_cos, right_cos], -1)

    n = normals[point_idxs[:, 0]].copy()
    n[np.sum(n * u, -1) < 0] *= -1
    aux = np.stack([np.sum(n * up, -1) > 0, np.sum(n * right, -1) > 0], -1).astype(np.float32)
    return tr, rot, aux


def test_targets_match_reference_semantics(rng):
    pc = rng.normal(size=(300, 3)).astype(np.float32) * 0.1
    normals = rng.normal(size=(300, 3)).astype(np.float32)
    normals /= np.linalg.norm(normals, axis=-1, keepdims=True)
    idxs = rng.integers(0, 300, size=(2000, 2))
    for up_sym, right_sym, z_right in [(False, False, False), (True, False, True), (True, True, False)]:
        out = generate_targets(jnp.array(pc), jnp.array(normals), jnp.array(idxs), up_sym, right_sym, z_right)
        tr, rot, aux = _numpy_generate_target(pc, normals, idxs, up_sym, right_sym, z_right)
        np.testing.assert_allclose(np.asarray(out.tr), tr, atol=1e-4)
        np.testing.assert_allclose(np.asarray(out.rot), rot, atol=1e-3)
        np.testing.assert_allclose(np.asarray(out.rot_aux), aux, atol=0)


def test_center_reconstruction_property(rng):
    """SURVEY §4: reconstructing the center from (proj_len, dist2o) must
    recover the origin for canonical clouds."""
    pc = rng.normal(size=(100, 3)) * 0.2
    normals = np.tile(np.array([0.0, 1.0, 0]), (100, 1))
    idxs = rng.integers(0, 100, size=(500, 2))
    out = generate_targets(jnp.array(pc), jnp.array(normals), jnp.array(idxs))
    a = pc[idxs[:, 0]]
    b = pc[idxs[:, 1]]
    u = (a - b) / (np.linalg.norm(a - b, axis=-1, keepdims=True) + 1e-7)
    c = a - np.asarray(out.tr)[:, :1] * u
    # distance from the pair axis foot point to origin == dist2o
    np.testing.assert_allclose(np.linalg.norm(c, axis=-1), np.asarray(out.tr)[:, 1], atol=1e-4)


def test_rotation_invariance_of_tr_targets(rng):
    """proj_len/dist2o are SE(3)-invariant w.r.t. shared rotations about the
    origin (the center stays at the origin)."""
    pc = rng.normal(size=(50, 3))
    normals = rng.normal(size=(50, 3))
    normals /= np.linalg.norm(normals, axis=-1, keepdims=True)
    idxs = rng.integers(0, 50, size=(300, 2))
    from scipy.spatial.transform import Rotation

    R = Rotation.random(random_state=1).as_matrix()
    t0 = generate_targets(jnp.array(pc), jnp.array(normals), jnp.array(idxs))
    t1 = generate_targets(jnp.array(pc @ R.T), jnp.array(normals @ R.T), jnp.array(idxs))
    np.testing.assert_allclose(np.asarray(t0.tr), np.asarray(t1.tr), atol=1e-4)


def test_sample_pair_idxs_bounds():
    idx = sample_pair_idxs(jax.random.PRNGKey(0), 123, 10000)
    assert idx.shape == (10000, 2)
    assert int(idx.min()) >= 0 and int(idx.max()) < 123


def test_soft_bin_targets_shapes(rng):
    pc = rng.normal(size=(50, 3)).astype(np.float32) * 0.05
    normals = np.tile(np.array([0, 1.0, 0], np.float32), (50, 1))
    idxs = rng.integers(0, 50, size=(64, 2))
    t = generate_targets(jnp.array(pc), jnp.array(normals), jnp.array(idxs))
    tr_prob, rot_prob = soft_bin_targets(t, (0.12, 0.12), 32, 36)
    assert tr_prob.shape == (64, 2, 32)
    assert rot_prob.shape == (64, 2, 36)
    np.testing.assert_allclose(np.asarray(tr_prob).sum(-1), 1.0, atol=1e-5)


def test_aux_weight_is_informativeness(rng):
    """aux_weight = |n_canon . axis|: 1 for normals along the axis, 0 for
    normals perpendicular to it (whose sign bits are label noise)."""
    pc = rng.normal(size=(200, 3)).astype(np.float32) * 0.1
    normals = rng.normal(size=(200, 3)).astype(np.float32)
    normals /= np.linalg.norm(normals, axis=-1, keepdims=True)
    idxs = rng.integers(0, 200, size=(1000, 2))
    out = generate_targets(jnp.array(pc), jnp.array(normals), jnp.array(idxs))
    a = pc[idxs[:, 0]]
    b = pc[idxs[:, 1]]
    u = (a - b) / (np.linalg.norm(a - b, axis=-1, keepdims=True) + 1e-7)
    n = normals[idxs[:, 0]].copy()
    n[np.sum(n * u, -1) < 0] *= -1
    np.testing.assert_allclose(np.asarray(out.aux_weight)[:, 0], np.abs(n[:, 1]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(out.aux_weight)[:, 1], np.abs(n[:, 0]), atol=1e-5)


def test_weighted_bce_focuses_informative_pairs():
    """The weighted BCE ignores zero-weight pairs and equals the unweighted
    form under uniform weights."""
    from cppf_tpu.train.losses import bce_with_logits

    logits = jnp.array([10.0, -10.0, 0.0, 3.0])
    target = jnp.array([1.0, 1.0, 0.0, 1.0])
    base = bce_with_logits(logits, target)
    uniform = bce_with_logits(logits, target, jnp.ones(4) * 0.37)
    np.testing.assert_allclose(float(base), float(uniform), rtol=1e-6)
    # zeroing the badly-wrong pair's weight removes its contribution
    w = jnp.array([1.0, 0.0, 1.0, 1.0])
    focused = bce_with_logits(logits, target, w)
    assert float(focused) < float(base)
