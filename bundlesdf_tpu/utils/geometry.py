"""Camera / point-cloud geometry: back-projection, normals, covisibility,
ray-box intersection.

TPU-native equivalents of the reference's image-space CUDA kernels and PCL
loops (reference: BundleTrack/src/cuda/CUDAImageUtil.{h,cu} depth->xyz &
normals; BundleTrack/src/Frame.h:122-190 computeCovisibility;
nerf_helpers.py:403-446 ray_box_intersection_batch;
nerf_helpers.py:358-363 get_camera_rays_np).

Everything is jit-friendly and fully vectorized — the reference's stride-2
CPU loops and per-pixel CUDA threads become whole-image XLA ops.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

_EPS = 1e-10


def depth_to_xyz(depth: jnp.ndarray, K: jnp.ndarray) -> jnp.ndarray:
    """Back-project a depth image (H, W) to camera-space xyz map (H, W, 3).

    OpenCV convention: +x right, +y down, +z forward.  Invalid depth
    (<= 0) yields xyz = 0.  (Reference: CUDAImageUtil convertDepthFloatToCameraSpaceFloat4.)
    """
    H, W = depth.shape
    v = jax.lax.broadcasted_iota(jnp.float32, (H, W), 0)
    u = jax.lax.broadcasted_iota(jnp.float32, (H, W), 1)
    x = (u - K[0, 2]) / K[0, 0] * depth
    y = (v - K[1, 2]) / K[1, 1] * depth
    xyz = jnp.stack([x, y, depth], axis=-1)
    valid = depth > 0.0
    return jnp.where(valid[..., None], xyz, 0.0)


def xyz_to_normals(xyz: jnp.ndarray, valid: jnp.ndarray) -> jnp.ndarray:
    """Cross-product normals from an organized xyz map (H, W, 3).

    normal = normalize((p[u+1] - p[u-1]) x (p[v+1] - p[v-1])), oriented to
    face the camera (n . p < 0).  Pixels with any invalid neighbor get 0.
    (Reference: CUDAImageUtil computeNormals cross-product variant.)
    """
    right = jnp.roll(xyz, -1, axis=1)
    left = jnp.roll(xyz, 1, axis=1)
    down = jnp.roll(xyz, -1, axis=0)
    up = jnp.roll(xyz, 1, axis=0)
    vr = jnp.roll(valid, -1, axis=1)
    vl = jnp.roll(valid, 1, axis=1)
    vd = jnp.roll(valid, -1, axis=0)
    vu = jnp.roll(valid, 1, axis=0)
    n = jnp.cross(right - left, down - up)
    norm = jnp.linalg.norm(n, axis=-1, keepdims=True)
    n = n / (norm + _EPS)
    # Orient towards camera: n . p must be negative (normal points at eye).
    flip = jnp.sum(n * xyz, axis=-1, keepdims=True) > 0
    n = jnp.where(flip, -n, n)
    ok = valid & vr & vl & vd & vu & (norm[..., 0] > _EPS)
    # Zero out border pixels (roll wraps around).
    H, W = valid.shape
    vv = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
    uu = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    interior = (vv > 0) & (vv < H - 1) & (uu > 0) & (uu < W - 1)
    ok = ok & interior
    return jnp.where(ok[..., None], n, 0.0)


def compute_covisibility(
    xyz_a: jnp.ndarray,
    normal_a: jnp.ndarray,
    valid_a: jnp.ndarray,
    pose_a: jnp.ndarray,
    pose_b: jnp.ndarray,
    visible_angle_deg: float = 70.0,
) -> jnp.ndarray:
    """Fraction of frame A's valid points whose normals, transformed into
    frame B's camera, face B's eye within ``visible_angle_deg``.

    Mirrors reference Frame.h:122-190 (computeCovisibility): for each valid
    point of A, transform point+normal by ``inv(pose_b) @ pose_a`` and count
    ``dot(normalize(-p), normalize(n)) > cos(angle)``.  Fully vectorized over
    all pixels (the reference strides by 2 on CPU; we use every pixel).

    Args:
      xyz_a: (H, W, 3) or (N, 3) camera-space points of A.
      normal_a: same shape, unit normals (0 where invalid).
      valid_a: (H, W) or (N,) bool.
      pose_a, pose_b: (4, 4) cam-in-model poses.
    Returns: scalar covisibility in [0, 1].
    """
    pts = xyz_a.reshape(-1, 3)
    nrm = normal_a.reshape(-1, 3)
    msk = valid_a.reshape(-1)
    R_b = pose_b[:3, :3]
    rel_R = R_b.T @ pose_a[:3, :3]
    rel_t = R_b.T @ (pose_a[:3, 3] - pose_b[:3, 3])
    p_b = pts @ rel_R.T + rel_t
    n_b = nrm @ rel_R.T
    to_eye = -p_b / (jnp.linalg.norm(p_b, axis=-1, keepdims=True) + _EPS)
    n_b = n_b / (jnp.linalg.norm(n_b, axis=-1, keepdims=True) + _EPS)
    dots = jnp.sum(to_eye * n_b, axis=-1)
    thres = jnp.cos(jnp.deg2rad(visible_angle_deg))
    vis = jnp.sum((dots > thres) & msk)
    total = jnp.sum(msk)
    return vis.astype(jnp.float32) / (total.astype(jnp.float32) + 1e-7)


def camera_rays_gl(H: int, W: int, K: jnp.ndarray) -> jnp.ndarray:
    """Per-pixel ray directions in the OpenGL camera convention.

    +x right, +y up, -z forward (matches reference
    nerf_helpers.py:358-363 get_camera_rays_np).  Returns (H, W, 3); not
    normalized — z component is exactly -1.
    """
    v = jax.lax.broadcasted_iota(jnp.float32, (H, W), 0)
    u = jax.lax.broadcasted_iota(jnp.float32, (H, W), 1)
    dirs = jnp.stack(
        [(u - K[0, 2]) / K[0, 0], -(v - K[1, 2]) / K[1, 1], -jnp.ones((H, W))],
        axis=-1,
    )
    return dirs


# OpenGL camera expressed in the OpenCV camera (reference Utils.py:37).
GLCAM_IN_CVCAM = jnp.array(
    [[1.0, 0.0, 0.0, 0.0],
     [0.0, -1.0, 0.0, 0.0],
     [0.0, 0.0, -1.0, 0.0],
     [0.0, 0.0, 0.0, 1.0]],
    dtype=jnp.float32,
)


def ray_box_intersection(
    origins: jnp.ndarray,
    dirs: jnp.ndarray,
    box_min: jnp.ndarray,
    box_max: jnp.ndarray,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Slab-test ray/AABB intersection.

    Matches reference nerf_helpers.py:403-446 semantics: directions are
    normalized internally, per-axis entry times are clamped at 0 (ray starts
    inside the box), and misses return (-1, -1).

    Args:
      origins, dirs: (N, 3).
      box_min, box_max: (3,).
    Returns: (tmin, tmax) each (N,); -1 where the ray misses the box.
    """
    d = dirs / (jnp.linalg.norm(dirs, axis=-1, keepdims=True) + _EPS)
    inv_d = 1.0 / jnp.where(jnp.abs(d) < _EPS, jnp.where(d < 0, -_EPS, _EPS), d)
    t0 = (box_min[None] - origins) * inv_d
    t1 = (box_max[None] - origins) * inv_d
    t_near = jnp.minimum(t0, t1)
    t_far = jnp.maximum(t0, t1)
    t_near = jnp.maximum(t_near, 0.0)  # clamp per-axis entry like the reference
    tmin = jnp.max(t_near, axis=-1)
    tmax = jnp.min(t_far, axis=-1)
    hit = tmin <= tmax
    tmin = jnp.where(hit, tmin, -1.0)
    tmax = jnp.where(hit, tmax, -1.0)
    return tmin, tmax


def erode_mask(mask: jnp.ndarray, radius: int) -> jnp.ndarray:
    """Binary erosion with a (2r+1)^2 square structuring element (jitted)."""
    if radius <= 0:
        return mask
    m = mask.astype(jnp.float32)
    k = 2 * radius + 1
    window = jax.lax.reduce_window(
        m, 1.0, jax.lax.min, (k, k), (1, 1), "SAME"
    )
    return window > 0.5


def dilate_mask(mask: jnp.ndarray, radius: int) -> jnp.ndarray:
    """Binary dilation with a (2r+1)^2 square structuring element (jitted)."""
    if radius <= 0:
        return mask
    m = mask.astype(jnp.float32)
    k = 2 * radius + 1
    window = jax.lax.reduce_window(
        m, 0.0, jax.lax.max, (k, k), (1, 1), "SAME"
    )
    return window > 0.5


# ------------------------------------------------------------ numpy twins
# Host-side numpy versions of the cheap pixel-math helpers.  On a tunneled
# TPU, device->host readback is orders of magnitude slower than the math
# itself, so per-frame host code (ray building, scene bounds) uses these
# instead of a device round trip.  Numerics match the jitted versions.
def camera_rays_gl_np(H: int, W: int, K: np.ndarray) -> np.ndarray:
    v, u = np.mgrid[0:H, 0:W].astype(np.float32)
    return np.stack(
        [(u - K[0, 2]) / K[0, 0], -(v - K[1, 2]) / K[1, 1],
         -np.ones((H, W), np.float32)], axis=-1,
    )


def depth_to_xyz_np(depth: np.ndarray, K: np.ndarray) -> np.ndarray:
    H, W = depth.shape
    v, u = np.mgrid[0:H, 0:W].astype(np.float32)
    x = (u - K[0, 2]) / K[0, 0] * depth
    y = (v - K[1, 2]) / K[1, 1] * depth
    xyz = np.stack([x, y, depth], axis=-1)
    return np.where(depth[..., None] > 0.0, xyz, 0.0)


def ray_box_intersection_np(origins, dirs, box_min, box_max, eps=1e-10):
    d = dirs / (np.linalg.norm(dirs, axis=-1, keepdims=True) + eps)
    inv_d = 1.0 / np.where(np.abs(d) < eps, np.where(d < 0, -eps, eps), d)
    t0 = (box_min[None] - origins) * inv_d
    t1 = (box_max[None] - origins) * inv_d
    t_near = np.maximum(np.minimum(t0, t1), 0.0)
    t_far = np.maximum(t0, t1)
    tmin = t_near.max(axis=-1)
    tmax = t_far.min(axis=-1)
    hit = tmin <= tmax
    return np.where(hit, tmin, -1.0), np.where(hit, tmax, -1.0)
