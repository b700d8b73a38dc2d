"""Visualisation helpers (reference utils/util.py:529-595 equivalents)."""
from __future__ import annotations

import numpy as np

# edges of the get_3d_bbox corner ordering (see core.geometry.get_3d_bbox)
BBOX_EDGES = [
    (4, 5), (5, 7), (4, 6), (6, 7),    # ground (-y) layer
    (0, 4), (1, 5), (2, 6), (3, 7),    # pillars
    (0, 1), (1, 3), (0, 2), (2, 3),    # top (+y) layer
]


def draw_box(img: np.ndarray, imgpts: np.ndarray, axes: np.ndarray | None, color) -> np.ndarray:
    """Draw a projected 3D box (+optional axes) with the reference's layered
    shading (darker ground, mid pillars, full-color top)."""
    import cv2

    imgpts = np.int32(imgpts).reshape(-1, 2)
    shades = [0.3] * 4 + [0.6] * 4 + [1.0] * 4
    for (i, j), s in zip(BBOX_EDGES, shades):
        c = tuple(int(ch * s) for ch in color)
        img = cv2.line(img, tuple(imgpts[i]), tuple(imgpts[j]), c, 3)
    if axes is not None:
        axes = np.int32(axes)
        img = cv2.line(img, tuple(axes[0]), tuple(axes[1]), (0, 0, 255), 3)  # z
        img = cv2.line(img, tuple(axes[0]), tuple(axes[3]), (255, 0, 0), 3)  # x
        img = cv2.line(img, tuple(axes[0]), tuple(axes[2]), (0, 255, 0), 3)  # y
    return img


def draw_text(img: np.ndarray, bbox, text: str, draw_bbox: bool = False) -> np.ndarray:
    """Labelled text box anchored near a 2D bbox (reference utils/util.py:559)."""
    import cv2

    font = cv2.FONT_HERSHEY_TRIPLEX
    (tw, th), _ = cv2.getTextSize(text, font, 1, 1)
    margin = 10
    tl = (min(bbox[1] + margin, img.shape[1] - 5 - tw - 2 * margin),
          min(bbox[2] + margin, img.shape[0] - 5 - th - 2 * margin))
    br = (tl[0] + tw + 2 * margin, tl[1] + th + 2 * margin)
    if draw_bbox:
        cv2.rectangle(img, (bbox[1], bbox[0]), (bbox[3], bbox[2]), (255, 0, 0), 2)
    cv2.rectangle(img, tl, br, (255, 0, 0), -1)
    cv2.rectangle(img, tl, br, (0, 0, 0), 1)
    cv2.putText(img, text, (tl[0] + margin, br[1] - margin - 3), font, 1, (255, 255, 255), 1)
    return img


def render_pose_overlay(img: np.ndarray, RT: np.ndarray, scale_unit: np.ndarray,
                        intrinsics: np.ndarray, color=(255, 0, 0), axis_len: float = 0.3):
    """Project a 9D pose into the image and draw its box + axes."""
    from cppf_tpu.core.geometry import (
        calculate_2d_projections, get_3d_bbox, transform_coordinates_3d,
    )

    xyz_axis = axis_len * np.array([[0, 0, 0], [0, 0, 1], [0, 1, 0], [1, 0, 0]]).T
    proj_axes = calculate_2d_projections(transform_coordinates_3d(xyz_axis, RT), intrinsics)
    bbox3d = get_3d_bbox(scale_unit, 0)
    proj_box = calculate_2d_projections(transform_coordinates_3d(bbox3d, RT), intrinsics)
    return draw_box(img, proj_box, proj_axes, color)
