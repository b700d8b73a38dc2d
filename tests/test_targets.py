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


def test_radial_asymmetry_marks_handle(rng):
    """A cylinder wall scores ~0; a handle protruding on +x scores high."""
    from cppf_tpu.core.targets import radial_asymmetry

    n_wall, n_handle = 900, 60
    theta = rng.uniform(0, 2 * np.pi, n_wall)
    wall = np.stack([0.4 * np.cos(theta),
                     rng.uniform(0, 1, n_wall),
                     0.4 * np.sin(theta)], -1)
    handle = np.stack([rng.uniform(0.75, 0.95, n_handle),
                       rng.uniform(0.3, 0.7, n_handle),
                       rng.normal(0, 0.02, n_handle)], -1)
    pc = np.concatenate([wall, handle]).astype(np.float32)
    pad = np.zeros((1024, 3), np.float32)
    pad[: len(pc)] = pc
    score = np.asarray(radial_asymmetry(jnp.array(pad), len(pc)))
    assert score[len(pc):].max() == 0.0          # padding masked out
    assert np.median(score[:n_wall]) < 0.05      # revolution wall ~ 0
    assert np.median(score[n_wall:len(pc)]) > 0.5  # handle flagged


def test_generate_targets_asym_scales_right_bit(rng):
    """With asym given, the right-bit weight is scaled toward asymmetric
    pairs while the up-bit weight is untouched."""
    pc = rng.normal(size=(100, 3)).astype(np.float32) * 0.1
    normals = rng.normal(size=(100, 3)).astype(np.float32)
    normals /= np.linalg.norm(normals, axis=-1, keepdims=True)
    idxs = rng.integers(0, 100, size=(500, 2))
    asym = rng.uniform(0, 1, 100).astype(np.float32)
    base = generate_targets(jnp.array(pc), jnp.array(normals), jnp.array(idxs))
    out = generate_targets(jnp.array(pc), jnp.array(normals), jnp.array(idxs),
                           asym=jnp.array(asym))
    np.testing.assert_allclose(np.asarray(out.aux_weight)[:, 0],
                               np.asarray(base.aux_weight)[:, 0], atol=1e-6)
    pair_asym = np.maximum(asym[idxs[:, 0]], asym[idxs[:, 1]])
    np.testing.assert_allclose(
        np.asarray(out.aux_weight)[:, 1],
        np.asarray(base.aux_weight)[:, 1] * (0.05 + 0.95 * pair_asym),
        atol=1e-5)


def test_radial_asymmetry_about_posed_axis(rng):
    """radial_asymmetry_about recovers the handle of a posed mug-like cloud
    given only the (center, axis) line — the inference-side form."""
    import jax.numpy as jnp

    from cppf_tpu.core.targets import radial_asymmetry, radial_asymmetry_about

    n_wall, n_handle = 900, 60
    theta = rng.uniform(0, 2 * np.pi, n_wall)
    wall = np.stack([0.4 * np.cos(theta),
                     rng.uniform(0, 1, n_wall),
                     0.4 * np.sin(theta)], -1)
    handle = np.stack([rng.uniform(0.75, 0.95, n_handle),
                       rng.uniform(0.3, 0.7, n_handle),
                       rng.normal(0, 0.02, n_handle)], -1)
    pc = np.concatenate([wall, handle]).astype(np.float32)
    # arbitrary rigid pose
    ang = rng.uniform(0, 2 * np.pi, 3)

    def rot(a, i, j):
        R = np.eye(3)
        R[i, i] = R[j, j] = np.cos(a)
        R[i, j], R[j, i] = -np.sin(a), np.sin(a)
        return R

    R = rot(ang[0], 0, 1) @ rot(ang[1], 1, 2) @ rot(ang[2], 0, 2)
    t = np.array([0.3, -0.2, 1.1])
    posed = pc @ R.T + t  # canonical axis (origin, +y) maps to (t, R[:,1])
    pad = np.zeros((1024, 3), np.float32)
    pad[: len(pc)] = posed
    score = np.asarray(radial_asymmetry_about(
        jnp.array(pad), jnp.array(t, dtype=jnp.float32),
        jnp.array(R[:, 1], dtype=jnp.float32), len(pc)))
    assert score[len(pc):].max() == 0.0
    assert np.median(score[:n_wall]) < 0.05
    assert np.median(score[n_wall:len(pc)]) > 0.5
    # and it matches the canonical-frame scorer on the same geometry
    pad_c = np.zeros((1024, 3), np.float32)
    pad_c[: len(pc)] = pc
    canon = np.asarray(radial_asymmetry(jnp.array(pad_c), len(pc)))
    np.testing.assert_allclose(score[: len(pc)], canon[: len(pc)], atol=1e-3)


def test_base_membership_marks_bottom_slab(rng):
    from cppf_tpu.core.targets import base_membership

    n = 500
    pc = np.zeros((600, 3), np.float32)
    # base slab at y in [0, 0.05], lid rising to y=1
    yb = rng.uniform(0, 0.05, 300)
    yl = rng.uniform(0.2, 1.0, 200)
    pc[:300, 1] = yb
    pc[300:500, 1] = yl
    pc[500:, 1] = 99.0  # padding
    score = np.asarray(base_membership(jnp.array(pc), n))
    assert score[:300].min() == 1.0
    assert score[300:500].max() == 0.0
    assert score[500:].max() == 0.0


def test_generate_targets_base_up_weight(rng):
    """With base given, up_rot_weight = 0.1 + 0.9*max(base_a, base_b)."""
    pc = rng.normal(size=(100, 3)).astype(np.float32) * 0.1
    normals = rng.normal(size=(100, 3)).astype(np.float32)
    normals /= np.linalg.norm(normals, axis=-1, keepdims=True)
    idxs = rng.integers(0, 100, size=(500, 2))
    base = (rng.uniform(0, 1, 100) < 0.3).astype(np.float32)
    out = generate_targets(jnp.array(pc), jnp.array(normals), jnp.array(idxs),
                           base=jnp.array(base))
    expect = 0.1 + 0.9 * np.maximum(base[idxs[:, 0]], base[idxs[:, 1]])
    np.testing.assert_allclose(np.asarray(out.up_rot_weight), expect, atol=1e-6)
    none_out = generate_targets(jnp.array(pc), jnp.array(normals), jnp.array(idxs))
    assert none_out.up_rot_weight is None
