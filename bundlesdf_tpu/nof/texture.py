"""Mesh appearance baking.

The reference bakes a UV texture atlas via xatlas unwrap + pyrender
rasterization + a CUDA barycentric-UV kernel
(nerf_runner.py:1467-1541 mesh_texture_from_train_images,
mycuda rayColorToTextureImageCUDA).  xatlas/pyrender are unavailable here;
we provide the reference's vertex-color variants
(nerf_runner.py:1411-1464 mesh_vertex_color_from_train_images /
_from_nerf): project mesh vertices into each training view, check depth
visibility, and blend observed colors — plus a field-based fallback that
queries the NOF color head directly.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..models import nof as nof_model
from ..utils import mesh as mesh_utils


def bake_vertex_colors(
    mesh: mesh_utils.Mesh,
    nof_runner,
    rgbs: np.ndarray,
    depths: np.ndarray,
    masks: np.ndarray,
    cam_in_obs: np.ndarray,
    K: np.ndarray,
    depth_tol: float = 0.01,
) -> mesh_utils.Mesh:
    """Weighted vertex colors from training images (real-world mesh +
    real-scale CV-convention cam poses)."""
    V = mesh.vertices  # (n, 3) in object frame, real scale
    n = len(V)
    acc = np.zeros((n, 3))
    wacc = np.zeros(n)
    H, W = depths.shape[1:3]
    for i in range(len(rgbs)):
        ob_in_cam = np.linalg.inv(cam_in_obs[i])
        pc = V @ ob_in_cam[:3, :3].T + ob_in_cam[:3, 3]
        z = pc[:, 2]
        u = np.round(K[0, 0] * pc[:, 0] / np.maximum(z, 1e-6) + K[0, 2]).astype(int)
        v = np.round(K[1, 1] * pc[:, 1] / np.maximum(z, 1e-6) + K[1, 2]).astype(int)
        ok = (z > 0.05) & (u >= 0) & (u < W) & (v >= 0) & (v < H)
        uu = np.clip(u, 0, W - 1)
        vv = np.clip(v, 0, H - 1)
        d_img = depths[i][vv, uu]
        visible = ok & (d_img > 0.1) & (np.abs(d_img - z) < depth_tol)
        visible &= masks[i][vv, uu] > 0
        w = visible.astype(np.float64) / np.maximum(z, 1e-6)
        col = rgbs[i][vv, uu]
        if col.max() > 1.5:
            col = col / 255.0
        acc += col * w[:, None]
        wacc += w
    colors = np.where(wacc[:, None] > 0, acc / np.maximum(wacc[:, None], 1e-9), 0.5)
    out = mesh.copy()
    out.vertex_colors = (colors * 255).astype(np.uint8)
    return out


def vertex_colors_from_field(
    mesh_normalized: mesh_utils.Mesh, nof_runner, view_dir=(0.0, 0.0, 1.0)
) -> np.ndarray:
    """Query the NOF color head at the vertices (normalized-space mesh),
    fixed viewing direction (reference mesh_vertex_color_from_nerf)."""
    pts = jnp.asarray(mesh_normalized.vertices, dtype=jnp.float32)
    dirs = jnp.broadcast_to(
        jnp.asarray(view_dir, dtype=jnp.float32), (len(mesh_normalized.vertices), 3)
    )
    fids = jnp.zeros(len(mesh_normalized.vertices), dtype=jnp.int32)
    raw, _ = nof_model.nof_forward(
        nof_runner.params, nof_runner.spec, pts[:, None, :], dirs, fids
    )
    rgb = np.asarray(jax.nn.sigmoid(raw[:, 0, :3]))
    return (rgb * 255).astype(np.uint8)
