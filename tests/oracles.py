"""Plain-NumPy oracle implementations of the reference CUDA voting kernels.

These are direct loop transcriptions of the kernel semantics documented in
reference ``models/voting.py`` (ppf_voting:4-67, backvote:70-113,
rot_voting:115-148), used only as test oracles for the TPU ops.
"""
from __future__ import annotations

import numpy as np

TWO_PI = 2 * np.pi


def _pair_frame(a, b):
    ab = a - b
    l = np.linalg.norm(ab)
    if l < 1e-7:
        return None
    ab = ab / (l + 1e-7)
    co = np.array([0.0, -ab[2], ab[1]])
    if np.linalg.norm(co) < 1e-7:
        co = np.array([-ab[1], ab[0], 0.0])
    co = co / (np.linalg.norm(co) + 1e-7)
    return ab, co


def ppf_vote_np(pc, preds_tr, probs, point_idxs, corner, res, grid_dims, n_rots, adaptive):
    gx, gy, gz = [int(d) for d in grid_dims]
    grid = np.zeros((gx, gy, gz), np.float64)
    for k in range(point_idxs.shape[0]):
        proj_len, odist = preds_tr[k]
        ai, bi = point_idxs[k]
        frame = _pair_frame(pc[ai], pc[bi])
        if frame is None:
            continue
        ab, co = frame
        c = pc[ai] - ab * proj_len
        prob = max(probs[ai], probs[bi])
        x = co * odist
        y = np.cross(x, ab)
        m = min(int(odist / res * TWO_PI), n_rots) if adaptive else n_rots
        for i in range(m):
            ang = i * TWO_PI / m
            center = c + np.cos(ang) * x + np.sin(ang) * y
            g = (center - corner) / res
            if np.any(g < 0.01) or g[0] >= gx - 1.01 or g[1] >= gy - 1.01 or g[2] >= gz - 1.01:
                continue
            f = np.floor(g).astype(int)
            r = g - f
            for dx in (0, 1):
                for dy in (0, 1):
                    for dz in (0, 1):
                        w = (
                            (r[0] if dx else 1 - r[0])
                            * (r[1] if dy else 1 - r[1])
                            * (r[2] if dz else 1 - r[2])
                        )
                        grid[f[0] + dx, f[1] + dy, f[2] + dz] += w * prob
    return grid


def backvote_np(pc, preds_tr, point_idxs, corner, res, grid_dims, pred_center, tol, n_rots):
    gx, gy, gz = [int(d) for d in grid_dims]
    out = np.zeros((point_idxs.shape[0], 3))
    for k in range(point_idxs.shape[0]):
        proj_len, odist = preds_tr[k]
        ai, bi = point_idxs[k]
        frame = _pair_frame(pc[ai], pc[bi])
        if frame is None:
            continue
        ab, co = frame
        c = pc[ai] - ab * proj_len
        x = co * odist
        y = np.cross(x, ab)
        m = min(int(odist / res * TWO_PI), n_rots)
        for i in range(m):
            ang = i * TWO_PI / m
            offset = np.cos(ang) * x + np.sin(ang) * y
            center = c + offset
            if np.linalg.norm(center - pred_center) > tol:
                continue
            g = (center - corner) / res
            if np.any(g < 0) or g[0] >= gx - 1 or g[1] >= gy - 1 or g[2] >= gz - 1:
                continue
            out[k] = -offset
            break
    return out


def rot_vote_np(pc, preds_rot, point_idxs, n_rots):
    out = np.zeros((point_idxs.shape[0], n_rots, 3))
    for k in range(point_idxs.shape[0]):
        ai, bi = point_idxs[k]
        frame = _pair_frame(pc[ai], pc[bi])
        if frame is None:
            continue
        ab, x = frame
        y = np.cross(x, ab)
        t = np.tan(preds_rot[k])
        for i in range(n_rots):
            ang = i * TWO_PI / n_rots
            offset = np.cos(ang) * x + np.sin(ang) * y
            up = t * offset + (ab if t > 0 else -ab)
            out[k, i] = up / (np.linalg.norm(up) + 1e-7)
    return out
