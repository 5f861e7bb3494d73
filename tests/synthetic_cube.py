"""Analytic textured-cube RGBD sequence for end-to-end tracking tests
(OpenCV camera convention, matching the tracker's input contract)."""
import numpy as np
from scipy.spatial.transform import Rotation


def render_cube_rgbd(ob_in_cam: np.ndarray, K: np.ndarray, H: int, W: int,
                     half: float = 0.15, checker: int = 6,
                     texture: str = "dots"):
    """Ray-trace an axis-aligned textured cube of half-size ``half``
    (object frame) seen from a CV camera with object pose ``ob_in_cam``.

    texture='checker' is periodic and ALIASES for feature matching (RANSAC
    can lock onto lattice-shifted poses); 'dots' (default) overlays unique
    random dots so matches are unambiguous.

    Returns (rgb [0,255] float, depth (z, meters), mask)."""
    T_oc = np.linalg.inv(ob_in_cam)  # cam -> object
    j, i = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    d_cam = np.stack(
        [(i - K[0, 2]) / K[0, 0], (j - K[1, 2]) / K[1, 1], np.ones_like(i, np.float64)],
        axis=-1,
    )
    d_obj = d_cam @ T_oc[:3, :3].T
    o_obj = T_oc[:3, 3]

    inv_d = 1.0 / np.where(np.abs(d_obj) < 1e-12, 1e-12, d_obj)
    t0 = (-half - o_obj) * inv_d
    t1 = (half - o_obj) * inv_d
    tn = np.minimum(t0, t1).max(axis=-1)
    tf = np.maximum(t0, t1).min(axis=-1)
    hit = (tn < tf) & (tn > 0.01)
    t = np.where(hit, tn, 0.0)  # param t == z-depth since d_cam.z == 1
    p = o_obj + d_obj * t[..., None]

    # face + checker texture
    ax = np.argmax(np.abs(p) / half, axis=-1)
    base = np.array([[255, 80, 80], [80, 255, 80], [80, 80, 255]], dtype=np.float64)
    rgb = base[ax]
    # face-local coords for the checker
    loc1 = np.take_along_axis(p, ((ax + 1) % 3)[..., None], axis=-1)[..., 0]
    loc2 = np.take_along_axis(p, ((ax + 2) % 3)[..., None], axis=-1)[..., 0]
    cell = 2 * half / checker
    par = (np.floor(loc1 / cell) + np.floor(loc2 / cell)).astype(np.int64) % 2
    rgb = np.where(par[..., None] == 0, rgb, rgb * 0.35)
    if texture == "dots":
        # Unique aperiodic detail: hash face-local integer lattice coords at
        # a fine pitch into pseudo-random brightness dots (deterministic).
        pitch = cell / 4.0
        i1 = np.floor(loc1 / pitch).astype(np.int64)
        i2 = np.floor(loc2 / pitch).astype(np.int64)
        hsh = (i1 * 73856093) ^ (i2 * 19349663) ^ ((ax + 1) * 83492791)
        rnd = ((hsh % 1000003).astype(np.float64) / 1000003.0)
        rgb = rgb * (0.45 + 0.9 * rnd[..., None])
        rgb = np.clip(rgb, 0, 255)
    sign_mask = np.take_along_axis(p, ax[..., None], axis=-1)[..., 0] > 0
    rgb = np.where(sign_mask[..., None], rgb, rgb * 0.8)
    rgb = np.where(hit[..., None], rgb, 0.0)
    depth = np.where(hit, t, 0.0)
    return rgb.astype(np.float32), depth.astype(np.float32), hit.astype(np.uint8) * 255


def make_cube_sequence(n_frames=10, H=96, W=96, half=0.15, dist=0.55,
                       deg_per_frame=4.0, axis=(0, 1, 0.2)):
    """Object rotating in front of a static camera (the standard hand-held
    object scenario).  Returns dict with colors, depths, masks, gt ob_in_cam,
    K."""
    K = np.array([[120.0, 0, W / 2], [0, 120.0, H / 2], [0, 0, 1]], dtype=np.float32)
    axis = np.asarray(axis, dtype=np.float64)
    axis /= np.linalg.norm(axis)
    colors, depths, masks, gt = [], [], [], []
    for k in range(n_frames):
        R = Rotation.from_rotvec(axis * np.deg2rad(deg_per_frame * k)).as_matrix()
        ob_in_cam = np.eye(4)
        ob_in_cam[:3, :3] = R
        ob_in_cam[:3, 3] = [0.0, 0.0, dist]
        rgb, d, m = render_cube_rgbd(ob_in_cam, K, H, W, half)
        colors.append(rgb)
        depths.append(d)
        masks.append(m)
        gt.append(ob_in_cam.astype(np.float32))
    return {
        "colors": colors, "depths": depths, "masks": masks,
        "gt_ob_in_cam": np.stack(gt), "K": K, "half": half,
    }


def cube_model_points(half=0.15, n=500, seed=0):
    rng = np.random.default_rng(seed)
    pts = rng.uniform(-half, half, (n, 3))
    ax = rng.integers(0, 3, n)
    sign = rng.choice([-1.0, 1.0], n)
    pts[np.arange(n), ax] = half * sign
    return pts
