"""ctypes bindings for the native host library (rasterizer + voxel hash).

Builds ``native/libcppf_native.so`` on demand (g++ via make); every entry
point has a pure-NumPy fallback so the framework works without a compiler.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libcppf_native.so")
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    try:
        if not os.path.exists(_LIB_PATH):
            subprocess.run(["make", "-C", _NATIVE_DIR], check=True, capture_output=True)
        lib = ctypes.CDLL(_LIB_PATH)
        lib.rasterize_depth.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int,
            ctypes.POINTER(ctypes.c_int), ctypes.c_int,
            ctypes.c_float, ctypes.c_float, ctypes.c_float, ctypes.c_float,
            ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float),
        ]
        lib.voxel_downsample.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_float,
            ctypes.POINTER(ctypes.c_int),
        ]
        lib.voxel_downsample.restype = ctypes.c_int
        _lib = lib
    except Exception:
        _lib = None
    return _lib


def have_native() -> bool:
    return _load() is not None


def rasterize_depth(verts: np.ndarray, tris: np.ndarray, fx: float, fy: float,
                    cx: float, cy: float, width: int, height: int) -> np.ndarray:
    """Depth map [H, W] (0 = background) for camera-space triangles.

    Projection convention documented in native/rasterizer.cpp — the NOCS
    backprojection (core.geometry.backproject + the dataset's x/z flips)
    inverts it exactly.
    """
    verts = np.ascontiguousarray(verts, np.float32)
    tris = np.ascontiguousarray(tris, np.int32)
    lib = _load()
    if lib is not None:
        depth = np.zeros(height * width, np.float32)
        lib.rasterize_depth(
            verts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(verts),
            tris.ctypes.data_as(ctypes.POINTER(ctypes.c_int)), len(tris),
            fx, fy, cx, cy, width, height,
            depth.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        )
        return depth.reshape(height, width)
    return _rasterize_depth_np(verts, tris, fx, fy, cx, cy, width, height)


def _rasterize_depth_np(verts, tris, fx, fy, cx, cy, width, height) -> np.ndarray:
    """Vectorised NumPy fallback (slower; used when g++ is unavailable)."""
    depth = np.full((height, width), np.inf, np.float32)
    p = verts[tris]                      # [T, 3, 3]
    d = -p[..., 2]
    ok = np.all(d > 1e-6, axis=-1)
    p, d = p[ok], d[ok]
    u = cx + fx * p[..., 0] / d
    v = cy - fy * p[..., 1] / d
    inv_d = 1.0 / d
    for t in range(len(p)):
        xmin = max(0, int(np.floor(u[t].min())))
        xmax = min(width - 1, int(np.ceil(u[t].max())))
        ymin = max(0, int(np.floor(v[t].min())))
        ymax = min(height - 1, int(np.ceil(v[t].max())))
        if xmin > xmax or ymin > ymax:
            continue
        xs, ys = np.meshgrid(np.arange(xmin, xmax + 1) + 0.5, np.arange(ymin, ymax + 1) + 0.5)
        u0, v0 = u[t, 0], v[t, 0]
        u1, v1 = u[t, 1], v[t, 1]
        u2, v2 = u[t, 2], v[t, 2]
        area = (u1 - u0) * (v2 - v0) - (v1 - v0) * (u2 - u0)
        if abs(area) < 1e-12:
            continue
        w0 = ((u2 - u1) * (ys - v1) - (v2 - v1) * (xs - u1)) / area
        w1 = ((u0 - u2) * (ys - v2) - (v0 - v2) * (xs - u2)) / area
        w2 = 1.0 - w0 - w1
        inside = (w0 >= 0) & (w1 >= 0) & (w2 >= 0)
        dd = 1.0 / (w0 * inv_d[t, 0] + w1 * inv_d[t, 1] + w2 * inv_d[t, 2])
        sub = depth[ymin : ymax + 1, xmin : xmax + 1]
        np.minimum(sub, np.where(inside, dd, np.inf), out=sub)
    depth[np.isinf(depth)] = 0.0
    return depth


def voxel_downsample_host(points: np.ndarray, res: float) -> np.ndarray:
    """First-occurrence voxel downsample indices (native or NumPy)."""
    points = np.ascontiguousarray(points, np.float32)
    lib = _load()
    if lib is not None:
        out = np.zeros(len(points), np.int32)
        n = lib.voxel_downsample(
            points.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(points),
            res, out.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        )
        return out[:n].copy()
    from cppf_tpu.ops.quantize import voxel_downsample_np

    return voxel_downsample_np(points, res).astype(np.int32)
