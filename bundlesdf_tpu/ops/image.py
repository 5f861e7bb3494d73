"""Jitted image-space depth preprocessing ops.

TPU-native replacements for the reference's per-pixel CUDA kernels
(BundleTrack/src/cuda/CUDAImageUtil.{h,cu}: erodeDepthMap,
gaussFilterDepthMap (bilateral), edge-grazing depth filter) and the Frame
init pipeline (BundleTrack/src/Frame.cpp:225-334 processDepth /
depthToCloudAndNormals).  Each op is a whole-image XLA program: stencils are
expressed as static unrolled shifts (small radii) so XLA fuses them into a
couple of elementwise kernels — no scalar loops, no dynamic shapes.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..utils import geometry


def _shifted(img: jnp.ndarray, dy: int, dx: int, fill: float = 0.0) -> jnp.ndarray:
    """Shift a 2D image by (dy, dx), filling vacated pixels with ``fill``."""
    out = jnp.roll(img, (dy, dx), axis=(0, 1))
    H, W = img.shape
    v = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
    u = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    ok = jnp.ones((H, W), dtype=bool)
    if dy > 0:
        ok &= v >= dy
    elif dy < 0:
        ok &= v < H + dy
    if dx > 0:
        ok &= u >= dx
    elif dx < 0:
        ok &= u < W + dx
    return jnp.where(ok, out, fill)


@partial(jax.jit, static_argnames=("radius",))
def erode_depth(
    depth: jnp.ndarray,
    radius: int = 1,
    diff: float = 0.001,
    ratio: float = 0.8,
) -> jnp.ndarray:
    """Depth-discontinuity erosion.

    For each valid pixel, count neighbors within the (2r+1)^2 window whose
    depth differs by more than ``diff`` (relative) or is invalid; if the bad
    fraction exceeds ``ratio`` the pixel's depth is zeroed.  (Reference:
    CUDAImageUtil erodeDepthMap; params config_ho3d.yml:17-21.)
    """
    valid = depth > 0.1
    bad = jnp.zeros_like(depth)
    total = 0
    for dy in range(-radius, radius + 1):
        for dx in range(-radius, radius + 1):
            if dy == 0 and dx == 0:
                continue
            nd = _shifted(depth, dy, dx)
            nv = nd > 0.1
            rel = jnp.abs(nd - depth) / jnp.maximum(depth, 1e-6)
            bad = bad + jnp.where(~nv | (rel > diff), 1.0, 0.0)
            total += 1
    out = jnp.where(valid & (bad / total <= ratio), depth, 0.0)
    return out


@partial(jax.jit, static_argnames=("radius",))
def bilateral_filter_depth(
    depth: jnp.ndarray,
    radius: int = 2,
    sigma_d: float = 2.0,
    sigma_r: float = 100000.0,
) -> jnp.ndarray:
    """Edge-preserving bilateral smoothing of a depth map.

    Spatial Gaussian x range Gaussian over the (2r+1)^2 window; invalid
    (<=0.1) pixels excluded.  (Reference: CUDAImageUtil gaussFilterDepthMap;
    params config_ho3d.yml:22-25.)
    """
    valid = depth > 0.1
    acc = jnp.zeros_like(depth)
    wacc = jnp.zeros_like(depth)
    inv_2sd2 = 1.0 / (2.0 * sigma_d * sigma_d)
    inv_2sr2 = 1.0 / (2.0 * sigma_r * sigma_r)
    for dy in range(-radius, radius + 1):
        for dx in range(-radius, radius + 1):
            nd = _shifted(depth, dy, dx)
            nv = nd > 0.1
            w_s = jnp.exp(-(dy * dy + dx * dx) * inv_2sd2)
            w_r = jnp.exp(-((nd - depth) ** 2) * inv_2sr2)
            w = jnp.where(nv, w_s * w_r, 0.0)
            acc = acc + w * nd
            wacc = wacc + w
    out = jnp.where(valid & (wacc > 1e-8), acc / jnp.maximum(wacc, 1e-8), 0.0)
    return out


@jax.jit
def filter_edge_grazing(
    depth: jnp.ndarray,
    xyz: jnp.ndarray,
    normals: jnp.ndarray,
    edge_normal_thres_deg: float = 10.0,
) -> jnp.ndarray:
    """Zero out depth where the surface normal is nearly perpendicular to the
    viewing ray (grazing incidence — unreliable depth).

    A point survives if the angle between its normal and the ray to the eye
    is below ``90 - edge_normal_thres_deg``.  (Reference: CUDAImageUtil
    edge-grazing depth filter + Frame.cpp depthToCloudAndNormals gating,
    config key depth_processing.edge_normal_thres config_ho3d.yml:29.)
    """
    valid = depth > 0.1
    to_eye = -xyz
    to_eye = to_eye / (jnp.linalg.norm(to_eye, axis=-1, keepdims=True) + 1e-10)
    n = normals
    has_n = jnp.linalg.norm(n, axis=-1) > 0.5
    cos_ang = jnp.abs(jnp.sum(to_eye * n, axis=-1))
    # grazing when angle(normal, ray) approaches 90deg => cos approaches 0
    min_cos = jnp.sin(jnp.deg2rad(edge_normal_thres_deg))
    keep = valid & has_n & (cos_ang > min_cos)
    return jnp.where(keep, depth, 0.0)


@partial(jax.jit, static_argnames=("erode_radius", "bilateral_radius"))
def process_depth_frame(
    depth: jnp.ndarray,
    K: jnp.ndarray,
    zfar: float = 1.0,
    erode_radius: int = 1,
    erode_diff: float = 0.001,
    erode_ratio: float = 0.8,
    bilateral_radius: int = 2,
    sigma_d: float = 2.0,
    sigma_r: float = 100000.0,
    edge_normal_thres_deg: float = 10.0,
):
    """Full per-frame depth pipeline: clamp zfar -> erode -> 2x bilateral ->
    xyz -> normals -> edge-grazing filter -> final xyz/normals/valid.

    Mirrors the reference Frame init order (Frame.cpp:80-138: processDepth
    runs erode + two bilateral passes; depthToCloudAndNormals builds cloud,
    normals, then drops edge-grazing points).
    Returns (depth, xyz, normals, valid).
    """
    depth = jnp.where((depth > 0.1) & (depth < zfar), depth, 0.0)
    depth = erode_depth(depth, erode_radius, erode_diff, erode_ratio)
    depth = bilateral_filter_depth(depth, bilateral_radius, sigma_d, sigma_r)
    depth = bilateral_filter_depth(depth, bilateral_radius, sigma_d, sigma_r)
    xyz = geometry.depth_to_xyz(depth, K)
    valid = depth > 0.1
    normals = geometry.xyz_to_normals(xyz, valid)
    depth = filter_edge_grazing(depth, xyz, normals, edge_normal_thres_deg)
    valid = depth > 0.1
    xyz = jnp.where(valid[..., None], xyz, 0.0)
    normals = jnp.where(valid[..., None], normals, 0.0)
    return depth, xyz, normals, valid


@jax.jit
def rgb_to_gray(rgb: jnp.ndarray) -> jnp.ndarray:
    """uint8/float RGB (H, W, 3) -> float gray (H, W) in [0, 255]."""
    rgb = rgb.astype(jnp.float32)
    return 0.299 * rgb[..., 0] + 0.587 * rgb[..., 1] + 0.114 * rgb[..., 2]


def downscale_image(img: jnp.ndarray, factor: int) -> jnp.ndarray:
    """Average-pool downscale by an integer factor (images or depth).

    Used to build the BA dense-term pyramid (reference
    bundle.image_downscale: [4] config_ho3d.yml:51, CUDACache downsampled
    frames).
    """
    if factor == 1:
        return img
    if img.ndim == 2:
        return jax.lax.reduce_window(
            img, 0.0, jax.lax.add, (factor, factor), (factor, factor), "VALID"
        ) / (factor * factor)
    return jax.lax.reduce_window(
        img, 0.0, jax.lax.add, (factor, factor, 1), (factor, factor, 1), "VALID"
    ) / (factor * factor)


def downscale_depth_nearest(depth: jnp.ndarray, factor: int) -> jnp.ndarray:
    """Stride-subsample depth (no averaging across depth discontinuities)."""
    if factor == 1:
        return depth
    return depth[::factor, ::factor]


# ---------------------------------------------------------- numpy twin
def process_depth_frame_np(
    depth,
    K,
    zfar: float = 1.0,
    erode_radius: int = 1,
    erode_diff: float = 0.001,
    erode_ratio: float = 0.8,
    bilateral_radius: int = 2,
    sigma_d: float = 2.0,
    sigma_r: float = 100000.0,
    edge_normal_thres_deg: float = 10.0,
):
    """Host-side numpy mirror of process_depth_frame (same numerics).

    On a tunneled TPU, per-frame d2h readback of the full-res depth/xyz/
    normal maps costs far more than the stencil math itself, and on real
    hardware running preprocessing on host CPU frees the chip for NOF
    training — so the tracking Frame uses this by default.
    """
    import numpy as np

    def shifted(img, dy, dx, fill=0.0):
        out = np.roll(img, (dy, dx), axis=(0, 1))
        H, W = img.shape[:2]
        if dy > 0:
            out[:dy] = fill
        elif dy < 0:
            out[dy:] = fill
        if dx > 0:
            out[:, :dx] = fill
        elif dx < 0:
            out[:, dx:] = fill
        return out

    depth = np.asarray(depth, np.float32)
    depth = np.where((depth > 0.1) & (depth < zfar), depth, 0.0)

    # erode
    valid = depth > 0.1
    bad = np.zeros_like(depth)
    total = 0
    for dy in range(-erode_radius, erode_radius + 1):
        for dx in range(-erode_radius, erode_radius + 1):
            if dy == 0 and dx == 0:
                continue
            nd = shifted(depth, dy, dx)
            nv = nd > 0.1
            rel = np.abs(nd - depth) / np.maximum(depth, 1e-6)
            bad += np.where(~nv | (rel > erode_diff), 1.0, 0.0)
            total += 1
    depth = np.where(valid & (bad / total <= erode_ratio), depth, 0.0)

    # 2x bilateral
    inv_2sd2 = 1.0 / (2.0 * sigma_d * sigma_d)
    inv_2sr2 = 1.0 / (2.0 * sigma_r * sigma_r)
    for _ in range(2):
        valid = depth > 0.1
        acc = np.zeros_like(depth)
        wacc = np.zeros_like(depth)
        for dy in range(-bilateral_radius, bilateral_radius + 1):
            for dx in range(-bilateral_radius, bilateral_radius + 1):
                nd = shifted(depth, dy, dx)
                nv = nd > 0.1
                w = np.where(
                    nv,
                    np.exp(-(dy * dy + dx * dx) * inv_2sd2)
                    * np.exp(-((nd - depth) ** 2) * inv_2sr2),
                    0.0,
                )
                acc += w * nd
                wacc += w
        depth = np.where(valid & (wacc > 1e-8), acc / np.maximum(wacc, 1e-8), 0.0)

    # xyz + normals + edge-grazing
    xyz = geometry.depth_to_xyz_np(depth, np.asarray(K))
    valid = depth > 0.1
    right, left = np.roll(xyz, -1, 1), np.roll(xyz, 1, 1)
    down, up = np.roll(xyz, -1, 0), np.roll(xyz, 1, 0)
    n = np.cross(right - left, down - up)
    norm = np.linalg.norm(n, axis=-1, keepdims=True)
    n = n / (norm + 1e-10)
    flip = (n * xyz).sum(-1, keepdims=True) > 0
    n = np.where(flip, -n, n)
    ok = (
        valid
        & np.roll(valid, -1, 1) & np.roll(valid, 1, 1)
        & np.roll(valid, -1, 0) & np.roll(valid, 1, 0)
        & (norm[..., 0] > 1e-10)
    )
    H, W = valid.shape
    ok[0, :] = ok[-1, :] = False
    ok[:, 0] = ok[:, -1] = False
    normals = np.where(ok[..., None], n, 0.0).astype(np.float32)

    to_eye = -xyz
    to_eye = to_eye / (np.linalg.norm(to_eye, axis=-1, keepdims=True) + 1e-10)
    has_n = np.linalg.norm(normals, axis=-1) > 0.5
    cos_ang = np.abs((to_eye * normals).sum(-1))
    min_cos = np.sin(np.deg2rad(edge_normal_thres_deg))
    keep = valid & has_n & (cos_ang > min_cos)
    depth = np.where(keep, depth, 0.0).astype(np.float32)
    valid = depth > 0.1
    xyz = np.where(valid[..., None], xyz, 0.0).astype(np.float32)
    normals = np.where(valid[..., None], normals, 0.0)
    return depth, xyz, normals, valid
