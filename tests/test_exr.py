import numpy as np
import pytest

from cppf_tpu.data.exr import read_exr, write_exr


@pytest.mark.parametrize("compression", [0, 2, 3])  # NONE, ZIPS, ZIP
def test_exr_roundtrip_float32(tmp_path, rng, compression):
    depth = rng.uniform(0.5, 3.0, (48, 64)).astype(np.float32)
    p = str(tmp_path / "d.exr")
    write_exr(p, {"R": depth}, compression=compression)
    out = read_exr(p)
    np.testing.assert_array_equal(out["R"], depth)


def test_exr_multichannel_half(tmp_path, rng):
    r = rng.uniform(0, 1, (20, 30)).astype(np.float16)
    g = rng.uniform(0, 1, (20, 30)).astype(np.float32)
    p = str(tmp_path / "m.exr")
    write_exr(p, {"R": r, "G": g}, compression=3)
    out = read_exr(p)
    np.testing.assert_array_equal(out["R"], r)
    np.testing.assert_array_equal(out["G"], g)


def test_blender_laptop_aux_pipeline(tmp_path, rng):
    """Full Blender data path: synthesize a tiny reference-layout dataset
    (EXR depth + png + pose npys) and draw a labelled sample."""
    import cv2

    from cppf_tpu.data.laptop_aux import BLENDER_INTRINSICS, LaptopAuxDataset, make_laptop_mesh
    from cppf_tpu.data import native

    root = tmp_path / "laptop"
    mesh_dir = root / "03642806" / "abc123"
    mesh_dir.mkdir(parents=True)

    mesh, _ = make_laptop_mesh(110.0)
    rot = np.eye(3)
    tr = np.array([0.0, 0.0, 1.2])
    # place object at -z for the renderer; the loader's flips invert this
    v_cam = mesh.vertices @ rot.T
    v_cam = v_cam + np.float32([tr[0], -tr[1], -tr[2]])
    K = BLENDER_INTRINSICS
    # approximate: render pinhole depth, convert to Blender ray depth
    depth = native.rasterize_depth(v_cam, mesh.faces, K[0, 0], K[1, 1], K[0, 2], K[1, 2], 640, 480)
    ds_probe = LaptopAuxDataset(data_root="/nonexistent")
    sensor_h = 480 / 640 * ds_probe.camera_sensor_width
    u, v = np.meshgrid(np.arange(640), np.arange(480))
    x = (0.5 - u / 640) * ds_probe.camera_sensor_width / ds_probe.camera_lens
    y = (0.5 - v / 480) * sensor_h / ds_probe.camera_lens
    norm = np.sqrt(x**2 + y**2 + 1)
    ray_depth = np.where(depth > 0, depth * norm, 0).astype(np.float32)

    for i in range(1, 21):
        cv2.imwrite(str(mesh_dir / f"{i}.png"), np.full((480, 640, 3), 128, np.uint8))
        from cppf_tpu.data.exr import write_exr

        write_exr(str(mesh_dir / f"{i}_depth0001.exr"), {"R": ray_depth})
        np.save(str(mesh_dir / f"{i}.tr.npy"), tr)
        np.save(str(mesh_dir / f"{i}.rot.npy"), rot)
        np.save(str(mesh_dir / f"{i}.scale.npy"), np.array(1.0))

    ds = LaptopAuxDataset(data_root=str(root), seed=0)
    assert ds.use_blender
    rgb, label = ds.sample()
    assert rgb.shape == (224, 224, 3)
    assert (label == 0).sum() > 50 and (label == 1).sum() > 50
