"""Synthetic RGBD scene generation for tests: an analytically ray-traced
sphere viewed from a ring of cameras (OpenGL convention, normalized
coordinates).  Serves as the closed-form fixture for the NOF stack and for
end-to-end tracking tests (replaces the reference's milk-jug debug clip)."""
import numpy as np


def look_at_gl(eye: np.ndarray, target: np.ndarray, up=(0, 0, 1)) -> np.ndarray:
    """c2w pose: GL camera (x right, y up, -z forward) at ``eye`` looking at
    ``target``."""
    eye = np.asarray(eye, dtype=np.float64)
    fwd = target - eye
    fwd = fwd / np.linalg.norm(fwd)
    up = np.asarray(up, dtype=np.float64)
    right = np.cross(fwd, up)
    if np.linalg.norm(right) < 1e-6:
        right = np.cross(fwd, np.array([0.0, 1.0, 0.0]))
    right = right / np.linalg.norm(right)
    true_up = np.cross(right, fwd)
    T = np.eye(4)
    T[:3, 0] = right
    T[:3, 1] = true_up
    T[:3, 2] = -fwd
    T[:3, 3] = eye
    return T


def render_sphere_rgbd(c2w: np.ndarray, K: np.ndarray, H: int, W: int,
                       radius: float = 0.3, center=(0.0, 0.0, 0.0)):
    """Analytic RGBD render of a sphere. Returns (rgb uint-scale float [0,1],
    depth z-units, mask). Depth is in the GL z-depth convention (multiples of
    the z=-1-plane camera direction), matching the NOF ray layout."""
    center = np.asarray(center, dtype=np.float64)
    j, i = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    dirs_cam = np.stack(
        [(i - K[0, 2]) / K[0, 0], -(j - K[1, 2]) / K[1, 1], -np.ones_like(i, dtype=np.float64)],
        axis=-1,
    )
    norm = np.linalg.norm(dirs_cam, axis=-1)
    u = (dirs_cam / norm[..., None]) @ c2w[:3, :3].T  # unit world dirs
    o = c2w[:3, 3]
    oc = o - center
    b = 2.0 * (u @ oc)
    c = oc @ oc - radius * radius
    disc = b * b - 4 * c
    hit = disc > 0
    sqrt_d = np.sqrt(np.maximum(disc, 0))
    s = (-b - sqrt_d) / 2.0  # near intersection arc length
    hit &= s > 0
    depth = np.where(hit, s / norm, 0.0)  # z-depth units
    pts = o[None, None] + u * s[..., None]
    normals = (pts - center) / radius
    rgb = np.where(hit[..., None], normals * 0.5 + 0.5, 0.0)
    return rgb.astype(np.float32), depth.astype(np.float32), hit.astype(np.float32)


def make_sphere_dataset(n_views=6, H=64, W=64, radius=0.3, dist=1.0):
    """Ring of views around a sphere. Returns dict with images, depths,
    masks, poses (c2w GL), K, and a fused surface point cloud."""
    K = np.array([[70.0, 0, W / 2], [0, 70.0, H / 2], [0, 0, 1]], dtype=np.float32)
    images, depths, masks, poses = [], [], [], []
    for k in range(n_views):
        ang = 2 * np.pi * k / n_views
        eye = np.array([dist * np.cos(ang), dist * np.sin(ang), 0.35 * ((k % 3) - 1)])
        c2w = look_at_gl(eye, np.zeros(3))
        rgb, d, m = render_sphere_rgbd(c2w, K, H, W, radius)
        images.append(rgb)
        depths.append(d)
        masks.append(m)
        poses.append(c2w.astype(np.float32))
    # fused cloud from the analytic sphere
    rng = np.random.default_rng(0)
    sph = rng.normal(size=(4000, 3))
    sph = sph / np.linalg.norm(sph, axis=-1, keepdims=True) * radius
    return {
        "images": np.stack(images),
        "depths": np.stack(depths),
        "masks": np.stack(masks),
        "poses": np.stack(poses),
        "K": K,
        "cloud": sph.astype(np.float32),
        "radius": radius,
    }
