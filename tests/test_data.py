import io
import os

import numpy as np
import pytest

from cppf_tpu.config import load_config
from cppf_tpu.core.geometry import backproject
from cppf_tpu.data import native
from cppf_tpu.data.mesh import load_obj
from cppf_tpu.data.shapenet import TRAIN_INTRINSICS, ShapeNetRenderDataset
from cppf_tpu.data.synthetic import PRIMITIVES, make_box


def test_native_builds():
    assert native.have_native(), "g++ native library should build in this environment"


def test_rasterize_backproject_roundtrip(rng):
    """Rendered depth backprojects onto the source geometry."""
    mesh = make_box((0.2, 0.15, 0.1))
    v_cam = mesh.vertices + np.float32([0, 0, -1.0])
    K = TRAIN_INTRINSICS
    depth = native.rasterize_depth(v_cam, mesh.faces, K[0, 0], K[1, 1], K[0, 2], K[1, 2], 640, 480)
    assert (depth > 0).sum() > 1000
    pts, _ = backproject(depth, K, depth > 0)
    # undo the NOCS backprojection flips to return to camera frame
    pts[:, 0] = -pts[:, 0]
    pts[:, 2] = -pts[:, 2]
    pts[:, 1] = -pts[:, 1] * -1  # backproject negates y; flip sign back
    # visible box front face is at z = -1 + 0.05 → depth 0.95
    assert abs(depth[depth > 0].min() - 0.95) < 2e-3
    # all points lie on the box surface (within raster quantisation)
    local = pts - np.float32([0, 0, -1.0])
    half = np.float32([0.1, 0.075, 0.05])
    assert np.all(np.abs(local) <= half + 5e-3)


def test_rasterize_native_matches_numpy():
    mesh = make_box((0.2, 0.15, 0.1))
    v_cam = mesh.vertices + np.float32([0.03, -0.02, -0.9])
    K = TRAIN_INTRINSICS
    d1 = native.rasterize_depth(v_cam, mesh.faces, K[0, 0], K[1, 1], K[0, 2], K[1, 2], 640, 480)
    d2 = native._rasterize_depth_np(v_cam, mesh.faces, K[0, 0], K[1, 1], K[0, 2], K[1, 2], 640, 480)
    np.testing.assert_allclose(d1, d2, atol=1e-4)


def test_voxel_downsample_host_matches_np(rng):
    pts = (rng.normal(size=(2000, 3)) * 0.1).astype(np.float32)
    from cppf_tpu.ops.quantize import voxel_downsample_np

    a = native.voxel_downsample_host(pts, 0.02)
    b = voxel_downsample_np(pts, 0.02)
    np.testing.assert_array_equal(np.sort(a), np.sort(b))


def test_obj_loader(tmp_path):
    obj = """
# comment
v 0 0 0
v 1 0 0
v 1 1 0
v 0 1 0
f 1/1/1 2/2/2 3/3/3 4/4/4
"""
    p = tmp_path / "m.obj"
    p.write_text(obj)
    mesh = load_obj(str(p))
    assert mesh.vertices.shape == (4, 3)
    assert mesh.faces.shape == (2, 3)  # quad fan-triangulated


@pytest.mark.parametrize("category", sorted(
    __import__("cppf_tpu.data.synthetic", fromlist=["RANDOM_PRIMITIVES"]).RANDOM_PRIMITIVES))
def test_random_primitive_families(category):
    """Every randomised family yields watertight-enough meshes with real
    per-sample shape variation (the role ShapeNet diversity plays,
    reference utils/dataset.py:84-257)."""
    from cppf_tpu.data.synthetic import random_primitive, sample_surface

    rng = np.random.default_rng(3)
    diags = []
    for _ in range(4):
        m = random_primitive(category, rng)
        assert np.isfinite(m.vertices).all()
        assert m.faces.min() >= 0 and m.faces.max() < len(m.vertices)
        pts = sample_surface(m, 512, rng)
        assert np.isfinite(pts).all()
        ext = m.vertices.max(0) - m.vertices.min(0)
        assert (ext > 1e-3).all()
        diags.append(ext / np.linalg.norm(ext))
    # shapes actually vary across draws (normalised aspect ratios differ)
    diags = np.stack(diags)
    assert np.ptp(diags, axis=0).max() > 0.005


def test_depth_noise_model():
    """Structured-light augmentation: perturbs depth at realistic magnitude,
    quantises, drops some edge pixels, keeps the zero (background) mask."""
    from cppf_tpu.data.shapenet import apply_depth_noise

    rng = np.random.default_rng(0)
    depth = np.zeros((64, 64), np.float32)
    depth[16:48, 16:48] = 1.0
    out = apply_depth_noise(depth, rng, strength=1.0)
    assert out.shape == depth.shape
    assert (out[depth == 0] == 0).all()          # background untouched
    changed = out[16:48, 16:48]
    valid = changed > 0
    assert valid.mean() > 0.5                     # most pixels survive
    err = np.abs(changed[valid] - 1.0)
    assert 1e-4 < err.mean() < 0.02               # mm-scale, not cm-scale


def test_shapenet_dataset_depth_noise():
    cfg = load_config("bowl", {"depth_noise": 1.0})
    ds = ShapeNetRenderDataset(cfg, seed=2)
    s = ds.sample()
    assert s.pc.shape[0] >= 100 and np.isfinite(s.pc).all()


def test_compute_stats_box_analytic():
    """Stats semantics pinned to the reference (gen_stats.py:29-57): diagonal
    scale_range, max |proj_len| / dist2o vote_range, mean-of-max scale_mean —
    all analytic for a centred box."""
    from cppf_tpu.data.stats import compute_stats

    ext = np.array([0.2, 0.1, 0.3], np.float32)
    stats = compute_stats([make_box(tuple(ext))], n_points=1024, n_pairs=20000)
    diag = float(np.linalg.norm(ext))
    assert abs(stats["scale_range"][0] - diag) < 1e-5
    assert abs(stats["scale_range"][1] - diag) < 1e-5
    # surface samples of a centred box: max coordinate per axis = half extent
    np.testing.assert_allclose(stats["scale_mean"], ext / 2, atol=0.02)
    # |proj_len| = |a·d̂| ≤ |a| ≤ diag/2; dist2o ≤ diag/2; both > 0
    assert 0 < stats["vote_range"][0] <= diag / 2 + 1e-5
    assert 0 < stats["vote_range"][1] <= diag / 2 + 1e-5


def _write_obj(path, mesh):
    lines = [f"v {x} {y} {z}" for x, y, z in mesh.vertices]
    lines += [f"f {a + 1} {b + 1} {c + 1}" for a, b, c in mesh.faces]
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        f.write("\n".join(lines))


def test_shapenet_dataset_real_obj_root(tmp_path):
    """The real-ShapeNet branch: model discovery under ``shapenet_root``, OBJ
    loading and depth rendering (reference utils/dataset.py:103-213; the
    primitive fallback is bypassed entirely)."""
    from cppf_tpu.data.shapenet import TYPENAME2SHAPENETID

    sid = TYPENAME2SHAPENETID["table"]
    mesh = make_box((0.8, 0.5, 0.6))  # model_normalized-style unit-ish mesh
    for name in ("aaa1", "bbb2"):
        _write_obj(str(tmp_path / sid / name / "models" / "model_normalized.obj"), mesh)

    cfg = load_config("table", {"shapenet_root": str(tmp_path)})
    ds = ShapeNetRenderDataset(cfg, seed=0)
    # discovery found exactly the two fake models (sorted), not primitives
    assert ds.model_names == [f"{sid}/aaa1", f"{sid}/bbb2"]
    s = ds.sample()
    assert s.pc.shape[0] >= 100
    # canonical-frame cloud of a centred box: every point within the scaled
    # half-extent envelope (+ raster quantisation)
    half = np.float32([0.4, 0.25, 0.3]) * s.scale
    assert np.all(np.abs(s.pc) <= half + 0.01)
    assert cfg.scale_range[0] <= s.scale <= cfg.scale_range[1]


def test_shapenet_dataset_primitive_fallback():
    """Without a ShapeNet root the dataset renders built-in primitives and
    produces canonical-frame clouds centred at the origin."""
    cfg = load_config("bowl")
    ds = ShapeNetRenderDataset(cfg, seed=1)
    s = ds.sample()
    assert s.pc.shape[0] >= 100
    # canonical frame: visible surface of an origin-centred object
    assert np.linalg.norm(s.pc.mean(0)) < 0.2 * np.linalg.norm(np.ptp(s.pc, 0))
    extent = s.pc.max(0) - s.pc.min(0)
    assert np.all(extent < cfg.scale_range[1] * 1.2)
    assert cfg.scale_range[0] <= s.scale <= cfg.scale_range[1]


def test_table_desk_variant_sign_cue():
    """The table family's desk draws put drawer-pedestal mass on +x only —
    a consistent right-axis sign cue (contradictory cues train the aux bit
    to chance; see the round-2 camera-family lesson in compose.py)."""
    from cppf_tpu.data.compose import random_table
    from cppf_tpu.data.synthetic import sample_surface

    rng = np.random.default_rng(0)
    offs = []
    for _ in range(40):
        m = random_table(rng)
        pts = sample_surface(m, 4096, rng)
        diag = np.linalg.norm(pts.max(0) - pts.min(0))
        offs.append(float(pts[:, 0].mean() / diag))
    offs = np.array(offs)
    assert (offs > 0.02).sum() >= 5     # desk draws exist and carry the cue
    assert (offs < -0.02).sum() == 0    # and the cue never flips
