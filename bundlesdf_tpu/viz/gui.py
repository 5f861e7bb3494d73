"""Headless tracking dashboard — the replacement for the reference's
dearpygui GUI (gui.py:14-187: 3 rows — raw image with axis overlay, masked
rgb, interactive mesh render).  dearpygui is unavailable in this image, so
the dashboard renders the same 3-row canvas to PNG files (and can be
polled by any viewer); the mesh row uses the software splat renderer."""
from __future__ import annotations

import os

import cv2
import numpy as np

from .draw import draw_xyz_axis
from .renderer import render_mesh_splat


class Dashboard:
    def __init__(self, out_dir: str, every: int = 1):
        self.out_dir = out_dir
        self.every = every
        self.cnt = 0
        os.makedirs(f"{out_dir}/dashboard", exist_ok=True)

    def update(self, color, mask, ob_in_cam, K, id_str, mesh=None,
               n_keyframes: int = 0):
        self.cnt += 1
        if self.cnt % self.every:
            return
        color = np.asarray(color)
        if color.dtype != np.uint8:
            color = np.clip(
                color * (255.0 if color.max() <= 1.5 else 1.0), 0, 255
            ).astype(np.uint8)
        H, W = color.shape[:2]
        row1 = draw_xyz_axis(color, ob_in_cam, K, scale=0.05)
        masked = color.copy()
        if mask is not None:
            masked[mask == 0] = 0
        row2 = masked
        if mesh is not None and len(mesh.vertices):
            row3, _ = render_mesh_splat(mesh, ob_in_cam, K, H, W)
        else:
            row3 = np.zeros_like(color)
        canvas = np.concatenate([row1, row2, row3], axis=1)
        cv2.putText(canvas, f"{id_str}  kf={n_keyframes}", (8, 20),
                    cv2.FONT_HERSHEY_SIMPLEX, 0.6, (255, 255, 255), 1)
        cv2.imwrite(f"{self.out_dir}/dashboard/{id_str}.png", canvas[..., ::-1])
