"""Laptop lid/base segmentation training data.

Equivalent of the reference's ``BlenderLaptopAuxDataset``
(reference utils/dataset.py:260-392): RGB crops with lid(1)/base(0) labels
derived on the fly by two-stage RANSAC plane segmentation, −100 for ignore.

Two sources:
- the reference's Blender renders when present (``<root>/<cls>/<mesh>/N.png``
  + EXR depth; requires an EXR-capable cv2);
- a synthetic fallback: an articulated two-plane "laptop" rendered with the
  native rasterizer, so the auxiliary branch trains anywhere.
"""
from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Iterator, Tuple

import numpy as np

from cppf_tpu.core.geometry import rotx, roty
from cppf_tpu.data import native
from cppf_tpu.data.synthetic import Mesh

BLENDER_INTRINSICS = np.array([[591.0125, 0, 322.525], [0, 590.16775, 244.11084], [0, 0, 1]])


def make_laptop_mesh(open_angle_deg: float, width=0.3, depth=0.22, thickness=0.008) -> Tuple[Mesh, np.ndarray]:
    """Base plate on y≈0 + lid plate hinged at the back, opened by
    ``open_angle_deg``.  Returns (mesh, per-face part labels 0=base 1=lid)."""
    def plate(w, d, t):
        v = np.array(
            [[sx * w / 2, sy * t / 2, sz * d / 2] for sx in (-1, 1) for sy in (-1, 1) for sz in (-1, 1)],
            np.float32,
        )
        f = np.array(
            [[0, 1, 3], [0, 3, 2], [4, 6, 7], [4, 7, 5], [0, 4, 5], [0, 5, 1],
             [2, 3, 7], [2, 7, 6], [0, 2, 6], [0, 6, 4], [1, 5, 7], [1, 7, 3]],
            np.int32,
        )
        return v, f

    base_v, base_f = plate(width, depth, thickness)
    lid_v, lid_f = plate(width, depth, thickness)
    # hinge at the back edge (z = -depth/2): rotate the lid up around x
    ang = np.deg2rad(180.0 - open_angle_deg)
    hinge = np.float32([0, 0, -depth / 2])
    R = rotx(ang)[:3, :3].astype(np.float32)
    lid_v = (lid_v - hinge) @ R.T + hinge
    verts = np.concatenate([base_v, lid_v])
    faces = np.concatenate([base_f, lid_f + len(base_v)])
    labels = np.concatenate([np.zeros(len(base_f), np.int32), np.ones(len(lid_f), np.int32)])
    return Mesh(verts, faces), labels


@dataclass
class LaptopAuxDataset:
    """Yields (rgb [224,224,3] float, label [224,224] int64 with -100 ignore)."""

    data_root: str = "./data/laptop"
    seed: int = 0
    epoch_len: int = 200

    # Blender camera model (reference utils/dataset.py:272-275)
    camera_lens: float = 29.55062484741211
    camera_sensor_width: float = 32.0
    resolution_x: int = 640
    resolution_y: int = 480

    def __post_init__(self):
        self.rng = np.random.default_rng(self.seed)
        self.use_blender = os.path.isdir(self.data_root)
        self.model_names = []
        if self.use_blender:
            blacklist = set()
            bl_path = os.path.join(
                os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
                "data", "laptop_nonreal.txt")
            if os.path.exists(bl_path):
                blacklist = set(open(bl_path).read().splitlines())
            for cls in sorted(os.listdir(self.data_root)):
                cls_dir = os.path.join(self.data_root, cls)
                if not os.path.isdir(cls_dir):
                    continue
                for mesh in sorted(os.listdir(cls_dir)):
                    name = f"{cls}/{mesh}"
                    if name not in blacklist:
                        self.model_names.append(name)
            self.use_blender = bool(self.model_names)

    def __len__(self):
        return self.epoch_len

    def sample(self):
        if self.use_blender:
            return self._blender_sample()
        return self._synthetic_sample()

    def _blender_sample(self):
        """Reference Blender data path (utils/dataset.py:319-392): RGB png +
        EXR depth + pose .npy files; lid/base labels from two-stage RANSAC."""
        import cv2
        import jax
        import jax.numpy as jnp
        from scipy.spatial.transform import Rotation as R

        from cppf_tpu.data.exr import read_exr
        from cppf_tpu.ops.ransac import segment_plane

        rng = self.rng
        name = self.model_names[int(rng.integers(len(self.model_names)))]
        img_idx = int(rng.integers(1, 21))
        base = os.path.join(self.data_root, name)
        img_path = os.path.join(base, f"{img_idx}.png")
        depth_path = os.path.join(base, f"{img_idx}_depth0001.exr")
        if not os.path.exists(img_path) or not os.path.exists(depth_path):
            return self._blender_sample()

        tr = np.load(img_path.replace(".png", ".tr.npy"))
        rot = np.load(img_path.replace(".png", ".rot.npy"))
        beta = R.from_matrix(rot).as_euler("yxy", degrees=True)
        if beta[1] > 60 or np.abs(tr[2]) < 0.8:
            return self._blender_sample()

        rgb = cv2.imread(img_path)[:, :, ::-1]
        depth = read_exr(depth_path)["R"].astype(np.float32).copy()
        depth[depth > 100] = 0
        rgb = rgb.copy()
        rgb[depth == 0] = 255
        mask = depth > 0
        if mask.sum() < 100:
            return self._blender_sample()

        pc = self._backproject_blender(depth, mask)
        pc[:, 0] = -pc[:, 0]
        pc[:, 2] = -pc[:, 2]
        pc = (pc + tr) @ rot  # rot.T applied to rows

        rows, cols = np.where(mask)
        bbox = np.array([[rows.min(), rows.max()], [cols.min(), cols.max()]])
        crop = cv2.resize(
            rgb[bbox[0, 0]:bbox[0, 1] + 1, bbox[1, 0]:bbox[1, 1] + 1], (224, 224)
        ).astype(np.float32) / 255.0

        # two-stage RANSAC plane split (reference utils/dataset.py:371-388)
        n = len(pc)
        pad = 65536
        pcj = np.zeros((pad, 3), np.float32)
        take = min(n, pad)
        pcj[:take] = pc[:take]
        valid = jnp.arange(pad) < take
        plane1, in1 = segment_plane(jax.random.PRNGKey(int(rng.integers(1 << 30))),
                                    jnp.asarray(pcj), 0.01, 100, valid_mask=valid)
        in1 = np.asarray(in1)
        if in1.sum() > take - 3:
            return self._blender_sample()
        plane2, in2 = segment_plane(jax.random.PRNGKey(int(rng.integers(1 << 30))),
                                    jnp.asarray(pcj), 0.01, 100,
                                    valid_mask=jnp.asarray(valid & ~jnp.asarray(in1)))
        in2 = np.asarray(in2)
        base_m, screen_m = in1[:take], in2[:take]
        if abs(float(plane1[1])) < abs(float(plane2[1])):
            base_m, screen_m = screen_m, base_m

        label = np.full((224, 224), -100, np.int64)
        resize_scale = 224 / (bbox[:, 1] - bbox[:, 0])
        pc_xy = np.stack([rows, cols], -1)[:take]
        idxs_resized = np.clip(((pc_xy - bbox[:, 0]) * resize_scale).astype(np.int64), 0, 223)
        label[idxs_resized[base_m][:, 0], idxs_resized[base_m][:, 1]] = 0
        label[idxs_resized[screen_m][:, 0], idxs_resized[screen_m][:, 1]] = 1

        fg = np.any(np.abs(crop - 1.0) > 1e-3, -1)
        crop[fg] *= 1 + 0.4 * rng.random(3) - 0.2
        crop[fg] += (0.05 * rng.random(fg.sum())[:, None] - 0.025)
        return np.clip(crop, 0, 1).astype(np.float32), label

    def _backproject_blender(self, depth, mask):
        """Blender thin-lens unprojection (reference utils/dataset.py:280-317)."""
        sensor_h = self.resolution_y / self.resolution_x * self.camera_sensor_width
        u, v = np.meshgrid(np.arange(self.resolution_x), np.arange(self.resolution_y))
        u, v = u[mask], v[mask]
        x = (0.5 - u / self.resolution_x) * self.camera_sensor_width / self.camera_lens
        y = (0.5 - v / self.resolution_y) * sensor_h / self.camera_lens
        norm = np.sqrt(x**2 + y**2 + 1.0)
        uu = (0.5 - x * self.camera_lens / self.camera_sensor_width) * self.resolution_x
        vv = (0.5 - y * self.camera_lens / sensor_h) * self.resolution_y
        K_inv = np.linalg.inv(BLENDER_INTRINSICS)
        uv1 = np.stack([uu, vv, np.ones_like(uu)], 0)
        xyz = (K_inv @ uv1).T
        z = depth[mask] / norm
        pts = xyz * (z[:, None] / xyz[:, 2:3])
        pts[:, 0] = -pts[:, 0]
        pts[:, 1] = -pts[:, 1]
        return pts

    def _synthetic_sample(self):
        rng = self.rng
        mesh, face_labels = make_laptop_mesh(
            open_angle_deg=float(rng.uniform(70, 135)),
            width=float(rng.uniform(0.25, 0.35)),
            depth=float(rng.uniform(0.18, 0.26)),
        )
        pose = np.eye(4)
        y_angle = rng.uniform(0, 2 * np.pi)
        x_angle = rng.uniform(np.deg2rad(15), np.deg2rad(60))
        pose[:3, :3] = rotx(x_angle)[:3, :3] @ roty(y_angle)[:3, :3]
        tr = np.array([rng.uniform(-0.15, 0.15), rng.uniform(-0.15, 0.15), -rng.uniform(0.8, 1.6)])
        v_cam = mesh.vertices @ pose[:3, :3].T + tr

        K = BLENDER_INTRINSICS
        depth = native.rasterize_depth(v_cam, mesh.faces, K[0, 0], K[1, 1], K[0, 2], K[1, 2], 640, 480)
        # per-part depth renders give exact pixel labels
        base_depth = native.rasterize_depth(
            v_cam, mesh.faces[face_labels == 0], K[0, 0], K[1, 1], K[0, 2], K[1, 2], 640, 480)
        lid_depth = native.rasterize_depth(
            v_cam, mesh.faces[face_labels == 1], K[0, 0], K[1, 1], K[0, 2], K[1, 2], 640, 480)
        mask = depth > 0
        if mask.sum() < 100:
            return self._synthetic_sample()

        rows, cols = np.where(mask)
        bbox = np.array([[rows.min(), rows.max()], [cols.min(), cols.max()]])
        import cv2

        # simple shading: inverse depth + noise stands in for Blender RGB
        shade = np.zeros((480, 640, 3), np.float32)
        d = np.where(mask, depth, np.nan)
        dn = (np.nanmax(d) - d) / max(np.nanmax(d) - np.nanmin(d), 1e-6)
        tint = rng.uniform(0.3, 1.0, 3)
        shade[mask] = dn[mask, None] * tint
        bg = rng.uniform(0, 1, 3)
        shade[~mask] = bg

        crop = cv2.resize(
            shade[bbox[0, 0]:bbox[0, 1] + 1, bbox[1, 0]:bbox[1, 1] + 1], (224, 224))
        label_full = np.full((480, 640), -100, np.int64)
        is_base = (base_depth > 0) & (np.abs(base_depth - depth) < 1e-4)
        is_lid = (lid_depth > 0) & (np.abs(lid_depth - depth) < 1e-4)
        label_full[is_base] = 0
        label_full[is_lid] = 1
        label = cv2.resize(
            label_full[bbox[0, 0]:bbox[0, 1] + 1, bbox[1, 0]:bbox[1, 1] + 1].astype(np.float32),
            (224, 224), interpolation=cv2.INTER_NEAREST,
        ).astype(np.int64)

        # brightness augmentation like the reference (utils/dataset.py:63-68)
        fg = np.any(np.abs(crop - bg) > 1e-3, -1)
        crop[fg] *= 1 + 0.4 * rng.random(3) - 0.2
        crop[fg] += (0.05 * rng.random(fg.sum())[:, None] - 0.025)
        crop = np.clip(crop, 0, 1)
        return crop.astype(np.float32), label

    def __iter__(self) -> Iterator:
        for _ in range(self.epoch_len):
            yield self.sample()
