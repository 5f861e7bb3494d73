"""Offscreen mesh rendering without GL.

The reference uses pyrender-EGL + pytinyrenderer (offscreen_renderer.py:
ModelRendererOffscreen for texture-bake visibility, TinyRenderer for the
GUI).  Neither is available here; we provide:
  * ``render_mesh_splat`` — fast z-buffered surface-point splatting
    (numpy scatter-min), good for previews and visibility tests;
  * ``rasterize_mesh``   — exact per-triangle barycentric rasterization
    (vectorized over the pixels of each triangle's bbox), used when
    hole-free depth is required.
"""
from __future__ import annotations

import numpy as np

from ..utils.mesh import Mesh


def render_mesh_splat(mesh: Mesh, ob_in_cam: np.ndarray, K: np.ndarray,
                      H: int, W: int, n_points: int = 200000):
    """Point-splat render. Returns (color (H,W,3) uint8, depth (H,W) float)."""
    pts = mesh.sample_surface(n_points)
    if mesh.vertex_colors is not None:
        # nearest-vertex colors for samples: use vertices directly instead
        pts = mesh.vertices
        cols = mesh.vertex_colors
    else:
        cols = np.full((len(pts), 3), 180, np.uint8)
    pc = pts @ ob_in_cam[:3, :3].T + ob_in_cam[:3, 3]
    z = pc[:, 2]
    ok = z > 1e-6
    u = np.round(K[0, 0] * pc[:, 0] / np.maximum(z, 1e-6) + K[0, 2]).astype(int)
    v = np.round(K[1, 1] * pc[:, 1] / np.maximum(z, 1e-6) + K[1, 2]).astype(int)
    ok &= (u >= 0) & (u < W) & (v >= 0) & (v < H)
    u, v, z = u[ok], v[ok], z[ok]
    cols = cols[ok]
    depth = np.full((H, W), np.inf)
    lin = v * W + u
    np.minimum.at(depth.reshape(-1), lin, z)
    vis = depth.reshape(-1)[lin] >= z - 1e-6
    color = np.zeros((H, W, 3), np.uint8)
    color.reshape(-1, 3)[lin[vis]] = cols[vis]
    depth[np.isinf(depth)] = 0.0
    return color, depth


def rasterize_mesh(mesh: Mesh, ob_in_cam: np.ndarray, K: np.ndarray,
                   H: int, W: int):
    """Exact triangle rasterization (z-buffer).  Returns (depth, face_id).

    Uses the native C++ rasterizer (native/src/host_runtime.cpp
    bsl_rasterize) when built; numpy fallback below."""
    from .. import native

    if native.available():
        depth, face_id, _ = native.rasterize(
            mesh.vertices, mesh.faces, K, ob_in_cam, H, W
        )
        return depth.astype(np.float64), face_id.astype(np.int64)
    V = mesh.vertices @ ob_in_cam[:3, :3].T + ob_in_cam[:3, 3]
    z = V[:, 2]
    u = K[0, 0] * V[:, 0] / np.maximum(z, 1e-6) + K[0, 2]
    v = K[1, 1] * V[:, 1] / np.maximum(z, 1e-6) + K[1, 2]
    depth = np.full((H, W), np.inf)
    face_id = np.full((H, W), -1, np.int64)
    F = mesh.faces
    tri_u = u[F]; tri_v = v[F]; tri_z = z[F]
    # cull back/behind
    keep = (tri_z > 1e-6).all(axis=1)
    order = np.nonzero(keep)[0]
    for fi in order:
        us, vs, zs = tri_u[fi], tri_v[fi], tri_z[fi]
        u0, u1 = int(max(0, np.floor(us.min()))), int(min(W - 1, np.ceil(us.max())))
        v0, v1 = int(max(0, np.floor(vs.min()))), int(min(H - 1, np.ceil(vs.max())))
        if u1 < u0 or v1 < v0:
            continue
        gu, gv = np.meshgrid(np.arange(u0, u1 + 1), np.arange(v0, v1 + 1))
        d = (us[1] - us[0]) * (vs[2] - vs[0]) - (vs[1] - vs[0]) * (us[2] - us[0])
        if abs(d) < 1e-12:
            continue
        w0 = ((us[1] - gu) * (vs[2] - gv) - (vs[1] - gv) * (us[2] - gu)) / d
        w1 = ((us[2] - gu) * (vs[0] - gv) - (vs[2] - gv) * (us[0] - gu)) / d
        w2 = 1.0 - w0 - w1
        inside = (w0 >= 0) & (w1 >= 0) & (w2 >= 0)
        if not inside.any():
            continue
        zi = 1.0 / (w0 / zs[0] + w1 / zs[1] + w2 / zs[2] + 1e-12)
        sub = depth[v0:v1 + 1, u0:u1 + 1]
        upd = inside & (zi < sub)
        sub[upd] = zi[upd]
        fsub = face_id[v0:v1 + 1, u0:u1 + 1]
        fsub[upd] = fi
    depth[np.isinf(depth)] = 0.0
    return depth, face_id
