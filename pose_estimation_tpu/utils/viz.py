"""Visualization: pose projections onto images (host-side numpy).

Rebuild of the reference's viz stack — tools/viz/view.py, version/
transparent/lib/viz/visualization.py (DrawPred: projected points / axes)
and lib/proj_bboxs.py (NOCS-style 3D bbox drawing with align_rotation for
symmetric objects).
"""

from __future__ import annotations

import numpy as np


def project(points: np.ndarray, r: np.ndarray, t: np.ndarray,
            k: np.ndarray) -> np.ndarray:
    pc = points @ r.T + t
    uv = pc[:, :2] / np.maximum(pc[:, 2:], 1e-8)
    return uv * [k[0, 0], k[1, 1]] + [k[0, 2], k[1, 2]]


def bbox_corners(extent: np.ndarray, lf_border: np.ndarray) -> np.ndarray:
    """8 corners of the object-frame bbox."""
    mins, maxs = lf_border, lf_border + extent
    return np.array([[x, y, z] for x in (mins[0], maxs[0])
                     for y in (mins[1], maxs[1])
                     for z in (mins[2], maxs[2])], np.float32)


_BOX_EDGES = [(0, 1), (0, 2), (1, 3), (2, 3),
              (4, 5), (4, 6), (5, 7), (6, 7),
              (0, 4), (1, 5), (2, 6), (3, 7)]


def draw_pose_bbox(img: np.ndarray, r, t, k, extent, lf_border,
                   color=(0, 255, 0), thickness=1) -> np.ndarray:
    """Draw the projected 3D bounding box (proj_bboxs.py:66-112 analog)."""
    import cv2
    out = np.ascontiguousarray(img.copy())
    uv = project(bbox_corners(np.asarray(extent), np.asarray(lf_border)),
                 np.asarray(r), np.asarray(t), np.asarray(k))
    uv = uv.astype(int)
    for a, b in _BOX_EDGES:
        cv2.line(out, tuple(uv[a]), tuple(uv[b]), color, thickness)
    return out


def draw_axes(img: np.ndarray, r, t, k, length: float = 0.05,
              thickness=2) -> np.ndarray:
    """Draw object axes (x red, y green, z blue)."""
    import cv2
    out = np.ascontiguousarray(img.copy())
    pts = np.array([[0, 0, 0], [length, 0, 0], [0, length, 0],
                    [0, 0, length]], np.float32)
    uv = project(pts, np.asarray(r), np.asarray(t), np.asarray(k)).astype(int)
    for i, color in zip((1, 2, 3),
                        [(0, 0, 255), (0, 255, 0), (255, 0, 0)]):
        cv2.line(out, tuple(uv[0]), tuple(uv[i]), color, thickness)
    return out


def align_rotation(r: np.ndarray) -> np.ndarray:
    """Zero the rotation about the symmetry (Y) axis for viz of symmetric
    objects (proj_bboxs.py align_rotation analog): keep only the rotation
    taking +y to R@+y."""
    y = r[:, 1]
    z = np.array([0.0, 0.0, 1.0])
    x = np.cross(y, z)
    n = np.linalg.norm(x)
    if n < 1e-6:
        return r
    x /= n
    z = np.cross(x, y)
    return np.stack([x, y, z], axis=1)


def draw_points(img: np.ndarray, points, r, t, k, color=(255, 0, 0)):
    import cv2
    out = np.ascontiguousarray(img.copy())
    uv = project(np.asarray(points), np.asarray(r), np.asarray(t),
                 np.asarray(k)).astype(int)
    h, w = out.shape[:2]
    for u, v in uv:
        if 0 <= u < w and 0 <= v < h:
            cv2.circle(out, (u, v), 1, color, -1)
    return out
