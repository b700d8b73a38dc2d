"""Pure geometry utilities (JAX + NumPy host variants).

Behavioural parity targets in the reference:
- depth back-projection: ``utils/util.py:598-631`` (NOCS pinhole),
  ``sunrgbd/inference.py:19-30`` (SUN RGB-D tilt frame),
  ``utils/dataset.py:280-317`` (Blender lens model)
- rotation helpers: ``utils/util.py:88-98``
- fibonacci sphere: ``utils/util.py:102-118``
- 3D bbox helpers: ``utils/util.py:258-318``
"""
from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np


def rotx(a: float) -> np.ndarray:
    """4x4 rotation about +x (reference utils/util.py:94)."""
    c, s = np.cos(a), np.sin(a)
    m = np.eye(4)
    m[1, 1], m[1, 2], m[2, 1], m[2, 2] = c, -s, s, c
    return m


def roty(a: float) -> np.ndarray:
    """4x4 rotation about +y (reference utils/util.py:88)."""
    c, s = np.cos(a), np.sin(a)
    m = np.eye(4)
    m[0, 0], m[0, 2], m[2, 0], m[2, 2] = c, -s, s, c
    return m


def fibonacci_sphere(samples: int) -> np.ndarray:
    """Near-uniform unit directions on S² (reference utils/util.py:102).

    Returns float64 [samples, 3]; y runs from 1 to -1 with golden-angle
    azimuth increments, matching the reference ordering exactly so that
    sphere-bin argmax indices are comparable.
    """
    i = np.arange(samples, dtype=np.float64)
    y = 1.0 - (i / (samples - 1)) * 2.0
    radius = np.sqrt(np.maximum(0.0, 1.0 - y * y))
    theta = math.pi * (3.0 - math.sqrt(5.0)) * i
    return np.stack([np.cos(theta) * radius, y, np.sin(theta) * radius], -1)


# ---------------------------------------------------------------------------
# Depth back-projection
# ---------------------------------------------------------------------------

def backproject(depth: np.ndarray, intrinsics: np.ndarray, instance_mask: np.ndarray):
    """NOCS-style pinhole unprojection (host, variable-length).

    Matches reference ``utils/util.py:598-631``: masked pixels with depth>0
    are lifted through K⁻¹, then x and y are negated (NOCS camera frame).
    Returns (points [M,3], (rows, cols)).
    """
    K_inv = np.linalg.inv(intrinsics)
    valid = np.logical_and(instance_mask, depth > 0)
    rows, cols = np.where(valid)
    uv1 = np.stack([cols, rows, np.ones_like(cols)], 0).astype(np.float64)
    rays = (K_inv @ uv1).T
    z = depth[rows, cols]
    pts = rays * (z[:, None] / rays[:, 2:3])
    pts[:, 0] = -pts[:, 0]
    pts[:, 1] = -pts[:, 1]
    return pts, (rows, cols)


def backproject_grid(depth: jnp.ndarray, intrinsics: jnp.ndarray, mask: jnp.ndarray):
    """Jit-friendly full-grid variant: returns [H*W, 3] points + bool valid.

    Same math as :func:`backproject` but static-shaped (every pixel gets a
    point; invalid pixels are zeroed and flagged).
    """
    h, w = depth.shape
    K_inv = jnp.linalg.inv(intrinsics)
    vv, uu = jnp.meshgrid(jnp.arange(h), jnp.arange(w), indexing="ij")
    uv1 = jnp.stack([uu.reshape(-1), vv.reshape(-1), jnp.ones(h * w)], 0).astype(depth.dtype)
    rays = (K_inv @ uv1).T
    z = depth.reshape(-1)
    valid = jnp.logical_and(mask.reshape(-1), z > 0)
    pts = rays * (z[:, None] / rays[:, 2:3])
    pts = pts * jnp.array([-1.0, -1.0, 1.0], pts.dtype)
    pts = jnp.where(valid[:, None], pts, 0.0)
    return pts, valid


def backproject_sunrgbd(depth: np.ndarray, K: np.ndarray, Rtilt: np.ndarray, mask=None):
    """SUN RGB-D unprojection with tilt correction (reference sunrgbd/inference.py:19-30)."""
    if mask is None:
        mask = np.ones_like(depth, dtype=bool)
    rows, cols = np.where(mask)
    z = depth[mask] / 1000.0
    x = (cols - K[0, 2]) * z / K[0, 0]
    y = (rows - K[1, 2]) * z / K[1, 1]
    pts = np.stack([x, z, -y], -1)
    pts = (Rtilt @ pts.T).T
    pts = pts[z != 0]
    return pts[:, [0, 2, 1]]


def get_3d_bbox(scale, shift=0) -> np.ndarray:
    """8 corners [3,8] of an axis-aligned box (reference utils/util.py:258)."""
    s = np.asarray(scale, dtype=np.float64)
    if s.ndim == 0:
        s = np.full(3, float(s))
    sx, sy, sz = s / 2.0
    corners = np.array(
        [
            [+sx, +sy, +sz], [+sx, +sy, -sz], [-sx, +sy, +sz], [-sx, +sy, -sz],
            [+sx, -sy, +sz], [+sx, -sy, -sz], [-sx, -sy, +sz], [-sx, -sy, -sz],
        ]
    ) + shift
    return corners.T


def transform_coordinates_3d(coords: np.ndarray, RT: np.ndarray) -> np.ndarray:
    """Apply a homogeneous 4x4 to [3,N] coordinates (reference utils/util.py:290)."""
    assert coords.shape[0] == 3
    hom = np.vstack([coords, np.ones((1, coords.shape[1]))])
    out = RT @ hom
    return out[:3] / out[3]


def calculate_2d_projections(coords3d: np.ndarray, intrinsics: np.ndarray) -> np.ndarray:
    """Project [3,N] camera-frame points to integer pixels (reference utils/util.py:305)."""
    proj = intrinsics @ coords3d
    proj = (proj[:2] / proj[2]).T
    return proj.astype(np.int32)


def orthonormal_right(up: jnp.ndarray, right: jnp.ndarray, eps: float = 1e-9) -> jnp.ndarray:
    """Project ``right`` onto the plane ⟂ ``up`` and renormalise
    (reference nocs/inference.py:308-309)."""
    right = right - jnp.dot(up, right) * up
    return right / (jnp.linalg.norm(right) + eps)


def assemble_rotation(up: jnp.ndarray, right: jnp.ndarray, z_right: bool) -> jnp.ndarray:
    """Column-stack a rotation from up/right axes (reference nocs/inference.py:330-333).

    z_right=True: columns are (up×right, up, right); else (right, up, right×up).
    """
    if z_right:
        return jnp.stack([jnp.cross(up, right), up, right], -1)
    return jnp.stack([right, up, jnp.cross(right, up)], -1)
