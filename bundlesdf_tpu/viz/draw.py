"""2D pose/box drawing overlays (parity with the reference Utils.py
draw_xyz_axis / draw_posed_3d_box, used by run_custom.py --mode draw_pose)."""
from __future__ import annotations

import cv2
import numpy as np


def project_points(pts: np.ndarray, ob_in_cam: np.ndarray, K: np.ndarray):
    pc = pts @ ob_in_cam[:3, :3].T + ob_in_cam[:3, 3]
    z = np.maximum(pc[:, 2], 1e-6)
    u = K[0, 0] * pc[:, 0] / z + K[0, 2]
    v = K[1, 1] * pc[:, 1] / z + K[1, 2]
    return np.stack([u, v], -1), pc[:, 2]


def draw_xyz_axis(color: np.ndarray, ob_in_cam: np.ndarray, K: np.ndarray,
                  scale: float = 0.1, thickness: int = 3) -> np.ndarray:
    """Draw the object coordinate axes (x red, y green, z blue)."""
    pts = np.array([[0, 0, 0], [scale, 0, 0], [0, scale, 0], [0, 0, scale]], float)
    uv, z = project_points(pts, ob_in_cam, K)
    img = np.ascontiguousarray(color.copy())
    if (z <= 0).any():
        return img
    o = tuple(np.round(uv[0]).astype(int))
    for k, c in [(1, (0, 0, 255)), (2, (0, 255, 0)), (3, (255, 0, 0))]:
        p = tuple(np.round(uv[k]).astype(int))
        cv2.line(img, o, p, c, thickness)
    return img


def draw_posed_3d_box(color: np.ndarray, ob_in_cam: np.ndarray, K: np.ndarray,
                      bbox: np.ndarray, line_color=(0, 255, 0),
                      thickness: int = 2) -> np.ndarray:
    """bbox: (2, 3) [min_xyz, max_xyz] in object frame."""
    mn, mx = bbox
    corners = np.array([[x, y, z] for x in (mn[0], mx[0])
                        for y in (mn[1], mx[1]) for z in (mn[2], mx[2])])
    uv, z = project_points(corners, ob_in_cam, K)
    img = np.ascontiguousarray(color.copy())
    if (z <= 0).any():
        return img
    uv = np.round(uv).astype(int)
    edges = [(0, 1), (0, 2), (1, 3), (2, 3), (4, 5), (4, 6), (5, 7), (6, 7),
             (0, 4), (1, 5), (2, 6), (3, 7)]
    for a, b in edges:
        cv2.line(img, tuple(uv[a]), tuple(uv[b]), line_color, thickness)
    return img
