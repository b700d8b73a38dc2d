"""Synthetic primitives and ground-truth oracles.

Used three ways:
1. integration tests: drive the full voting pipeline with an oracle
   "network" that emits ground-truth pair predictions (SURVEY §4 — no
   checkpoint needed);
2. the demo (`demo/pose_single.py`);
3. a ShapeNet-free fallback dataset so the training loop runs end-to-end in
   any environment.
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import numpy as np

from cppf_tpu.config import Config


class Mesh(NamedTuple):
    vertices: np.ndarray  # [V, 3]
    faces: np.ndarray     # [F, 3] int


def make_cylinder(radius=0.04, height=0.12, segments=48, rings=16) -> Mesh:
    """Closed cylinder along +y, centred at the origin (can/bottle-like)."""
    ang = np.linspace(0, 2 * np.pi, segments, endpoint=False)
    ys = np.linspace(-height / 2, height / 2, rings)
    side = np.array([[radius * np.cos(a), y, radius * np.sin(a)] for y in ys for a in ang])
    top = np.array([[0, height / 2, 0.0], [0, -height / 2, 0.0]])
    verts = np.concatenate([side, top])
    faces = []
    for r in range(rings - 1):
        for s in range(segments):
            a = r * segments + s
            b = r * segments + (s + 1) % segments
            c = (r + 1) * segments + s
            d = (r + 1) * segments + (s + 1) % segments
            faces += [[a, b, c], [b, d, c]]
    top_i, bot_i = len(side), len(side) + 1
    last = (rings - 1) * segments
    for s in range(segments):
        faces.append([last + s, last + (s + 1) % segments, top_i])
        faces.append([(s + 1) % segments, s, bot_i])
    return Mesh(verts.astype(np.float32), np.array(faces, np.int32))


def make_box(extents=(0.08, 0.05, 0.1)) -> Mesh:
    ex, ey, ez = np.asarray(extents) / 2
    v = np.array(
        [[sx * ex, sy * ey, sz * ez] for sx in (-1, 1) for sy in (-1, 1) for sz in (-1, 1)],
        np.float32,
    )
    f = np.array(
        [
            [0, 1, 3], [0, 3, 2], [4, 6, 7], [4, 7, 5],
            [0, 4, 5], [0, 5, 1], [2, 3, 7], [2, 7, 6],
            [0, 2, 6], [0, 6, 4], [1, 5, 7], [1, 7, 3],
        ],
        np.int32,
    )
    return Mesh(v, f)


def make_bowl(radius=0.09, height=0.045, segments=48, rings=12) -> Mesh:
    """Open hemisphere-ish bowl, opening up (+y)."""
    ang = np.linspace(0, 2 * np.pi, segments, endpoint=False)
    ts = np.linspace(0, 1, rings)
    verts = []
    for t in ts:
        r = radius * np.sin(t * np.pi / 2)
        y = -height * np.cos(t * np.pi / 2)
        verts += [[r * np.cos(a), y, r * np.sin(a)] for a in ang]
    verts = np.array(verts, np.float32)
    faces = []
    for r in range(rings - 1):
        for s in range(segments):
            a = r * segments + s
            b = r * segments + (s + 1) % segments
            c = (r + 1) * segments + s
            d = (r + 1) * segments + (s + 1) % segments
            faces += [[a, c, b], [b, c, d]]
    return Mesh(verts, np.array(faces, np.int32))


def _merge(*meshes: Mesh) -> Mesh:
    verts, faces, off = [], [], 0
    for m in meshes:
        verts.append(m.vertices)
        faces.append(m.faces + off)
        off += len(m.vertices)
    return Mesh(np.concatenate(verts), np.concatenate(faces))


def _translate(mesh: Mesh, t) -> Mesh:
    return Mesh(mesh.vertices + np.asarray(t, np.float32), mesh.faces)


def make_bottle() -> Mesh:
    """Body + narrower neck: breaks the top/bottom symmetry a bare cylinder
    has (otherwise the up-aux orientation bit is unlearnable)."""
    body = make_cylinder(0.035, 0.13)
    neck = _translate(make_cylinder(0.015, 0.05), (0, 0.09, 0))
    return _merge(body, neck)


def make_mug() -> Mesh:
    """Cylinder + a simple 3-segment handle on +x."""
    body = make_cylinder(0.04, 0.09)
    h1 = _translate(make_box((0.03, 0.012, 0.012)), (0.055, 0.03, 0))
    h2 = _translate(make_box((0.03, 0.012, 0.012)), (0.055, -0.03, 0))
    h3 = _translate(make_box((0.012, 0.072, 0.012)), (0.065, 0.0, 0))
    return _merge(body, h1, h2, h3)


PRIMITIVES = {
    "bottle": make_bottle,
    "can": lambda: make_cylinder(0.035, 0.1),
    "bowl": make_bowl,
    "mug": make_mug,
    "box": make_box,
    "camera": lambda: _merge(make_box((0.11, 0.07, 0.05)),
                             _translate(make_cylinder(0.022, 0.04), (0.02, 0, 0.04))),
    "laptop": lambda: make_box((0.3, 0.02, 0.25)),
}


def sample_surface(mesh: Mesh, n: int, rng: np.random.Generator) -> np.ndarray:
    """Area-weighted uniform surface samples [n, 3]."""
    v = mesh.vertices
    f = mesh.faces
    tri = v[f]                                        # [F, 3, 3]
    cross = np.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0])
    area = 0.5 * np.linalg.norm(cross, axis=-1)
    probs = area / area.sum()
    pick = rng.choice(len(f), size=n, p=probs)
    u = rng.uniform(size=(n, 1))
    w = rng.uniform(size=(n, 1))
    flip = (u + w) > 1
    u = np.where(flip, 1 - u, u)
    w = np.where(flip, 1 - w, w)
    t = tri[pick]
    return (t[:, 0] + u * (t[:, 1] - t[:, 0]) + w * (t[:, 2] - t[:, 0])).astype(np.float32)


def mesh_bounds(mesh: Mesh) -> Tuple[np.ndarray, np.ndarray]:
    return mesh.vertices.min(0), mesh.vertices.max(0)


def oracle_pair_predictions(
    pc_cam: np.ndarray,
    normals_cam: np.ndarray,
    point_idxs: np.ndarray,
    T: np.ndarray,
    R: np.ndarray,
    bound_nocs: np.ndarray,
    scale: float,
    cfg: Config,
) -> np.ndarray:
    """Ground-truth PPF-head output [P, out_dim] for a posed instance.

    ``bound_nocs`` is the canonical full extent (x/z already swapped to NOCS
    convention), ``scale`` the uniform scale applied at render time; the
    scale logit is the training label of reference utils/dataset.py:246-248.
    Bin logits are sharp one-hots of the ground-truth bins.
    """
    a = pc_cam[point_idxs[:, 0]]
    b = pc_cam[point_idxs[:, 1]]
    d = a - b
    d_unit = d / (np.linalg.norm(d, axis=-1, keepdims=True) + 1e-7)
    rel = a - T
    proj_len = np.sum(rel * d_unit, -1)
    dist2o = np.linalg.norm(rel - proj_len[:, None] * d_unit, axis=-1)

    up_axis = R @ np.array([0, 1, 0.0])
    right_axis = R @ (np.array([0, 0, 1.0]) if cfg.z_right else np.array([1.0, 0, 0]))
    up_ang = np.arccos(np.clip(np.sum(d_unit * up_axis, -1), -1, 1))
    if cfg.up_sym:
        up_ang = np.minimum(up_ang, np.pi - up_ang)
    right_ang = np.arccos(np.clip(np.sum(d_unit * right_axis, -1), -1, 1))
    if cfg.right_sym:
        right_ang = np.minimum(right_ang, np.pi - right_ang)

    n_a = normals_cam[point_idxs[:, 0]].copy()
    n_a[np.sum(n_a * d_unit, -1) < 0] *= -1
    aux_up = (np.sum(n_a * up_axis, -1) > 0).astype(np.float32)
    aux_right = (np.sum(n_a * right_axis, -1) > 0).astype(np.float32)

    B, Rb = cfg.tr_num_bins, cfg.rot_num_bins
    v0, v1 = cfg.vote_range
    big = 50.0

    def onehot_logits(vals, max_val, bins):
        idx = np.clip(np.round(vals / max_val * (bins - 1)).astype(int), 0, bins - 1)
        out = np.full((len(vals), bins), -big, np.float32)
        out[np.arange(len(vals)), idx] = big
        return out

    tr0 = onehot_logits(np.clip(proj_len + v0, 0, 2 * v0), 2 * v0, B)
    tr1 = onehot_logits(np.clip(dist2o, 0, v1), v1, B)
    upl = onehot_logits(up_ang, np.pi, Rb)
    rightl = onehot_logits(right_ang, np.pi, Rb)

    scale_logit = np.log(bound_nocs / 2 * scale) - np.log(np.asarray(cfg.scale_mean))
    P = len(point_idxs)
    out = np.concatenate(
        [
            np.stack([tr0, tr1], 1).reshape(P, 2 * B),
            upl,
            rightl,
            (aux_up[:, None] * 2 - 1) * big,
            (aux_right[:, None] * 2 - 1) * big,
            np.tile(scale_logit[None, :], (P, 1)).astype(np.float32),
        ],
        -1,
    )
    return out.astype(np.float32)


def random_pose(rng: np.random.Generator, nocs_style: bool = True):
    """Random pose like the renderer applies (reference utils/dataset.py:153-171)."""
    from cppf_tpu.core.geometry import rotx, roty

    y_angle = rng.uniform(0, 2 * np.pi)
    x_angle = rng.uniform(np.deg2rad(25), np.deg2rad(65))
    yy_angle = rng.uniform(np.deg2rad(-15), np.deg2rad(15))
    R = (roty(yy_angle)[:3, :3] @ rotx(x_angle)[:3, :3] @ roty(y_angle)[:3, :3])
    tr = np.array([rng.uniform(-0.3, 0.3), rng.uniform(-0.3, 0.3), -rng.uniform(0.6, 2.0)])
    return R, tr
