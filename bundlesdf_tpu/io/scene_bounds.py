"""Scene-bound estimation: fuse masked depth into an object point cloud,
find the dominant cluster, and compute the normalization (translation +
scale) mapping the object into [-1,1]^3.

Behavioral parity with the reference tool.py:18-132 (compute_scene_bounds /
compute_translation_scales / find_biggest_cluster), with open3d replaced by
numpy/scipy equivalents (voxel downsample via unique voxel keys,
statistical outlier removal via cKDTree kNN statistics) and sklearn DBSCAN
for clustering.  Host-side — runs once per NOF keyframe batch.
"""
from __future__ import annotations

import numpy as np
from scipy.spatial import cKDTree
from sklearn.cluster import DBSCAN

from ..utils import geometry

GLCAM_IN_CVCAM = np.asarray(geometry.GLCAM_IN_CVCAM)


def voxel_downsample(pts: np.ndarray, colors: np.ndarray | None, vox: float):
    """Average points (and colors) per voxel."""
    if len(pts) == 0:
        return pts, colors
    keys = np.floor(pts / vox).astype(np.int64)
    _, inv, counts = np.unique(keys, axis=0, return_inverse=True, return_counts=True)
    n = counts.shape[0]
    acc = np.zeros((n, 3))
    np.add.at(acc, inv, pts)
    out_pts = acc / counts[:, None]
    out_colors = None
    if colors is not None:
        accc = np.zeros((n, colors.shape[1]))
        np.add.at(accc, inv, colors)
        out_colors = accc / counts[:, None]
    return out_pts, out_colors


def remove_statistical_outliers(pts: np.ndarray, nb_neighbors: int = 30,
                                std_ratio: float = 2.0) -> np.ndarray:
    """open3d remove_statistical_outlier equivalent: drop points whose mean
    kNN distance exceeds mean + std_ratio * std."""
    if len(pts) <= nb_neighbors:
        return np.ones(len(pts), dtype=bool)
    tree = cKDTree(pts)
    d, _ = tree.query(pts, k=nb_neighbors + 1, workers=-1)
    mean_d = d[:, 1:].mean(axis=1)
    thres = mean_d.mean() + std_ratio * mean_d.std()
    return mean_d <= thres


def find_biggest_cluster(pts: np.ndarray, eps: float = 0.06, min_samples: int = 1):
    """Reference tool.py:18-25."""
    if len(pts) == 0:
        raise ValueError(
            "scene-bounds: fused object cloud is empty — no keyframe had "
            "valid masked depth (check depth units/percentile filter/mask)"
        )
    labels = DBSCAN(eps=eps, min_samples=min_samples, n_jobs=-1).fit(pts).labels_
    ids, cnts = np.unique(labels, return_counts=True)
    best = ids[cnts.argmax()]
    keep = labels == best
    return pts[keep], keep


def compute_translation_scales(pts: np.ndarray, max_dim: float = 2.0,
                               cluster: bool = True, eps: float = 0.06,
                               min_samples: int = 1):
    """Reference tool.py:28-39: center + scale into [-1,1] with 0.9 margin."""
    if cluster:
        pts, keep = find_biggest_cluster(pts, eps, min_samples)
    else:
        keep = np.ones(len(pts), dtype=bool)
    max_xyz = pts.max(axis=0)
    min_xyz = pts.min(axis=0)
    center = (max_xyz + min_xyz) / 2
    sc_factor = max_dim / (max_xyz - min_xyz).max() * 0.9
    return -center, float(sc_factor), keep


def fuse_frame_cloud(depth: np.ndarray, rgb: np.ndarray, mask: np.ndarray,
                     K: np.ndarray, glcam_in_world: np.ndarray):
    """Masked back-projection of one frame into world (reference
    compute_scene_bounds_worker tool.py:42-64)."""
    xyz = geometry.depth_to_xyz_np(np.asarray(depth, np.float32),
                                   np.asarray(K, np.float32))
    valid = (depth >= 0.1) & (mask > 0)
    pts = xyz[valid]
    if len(pts) == 0:
        return None, None
    colors = rgb[valid].reshape(-1, 3)
    pts, colors = voxel_downsample(pts, colors, 0.01)
    keep = remove_statistical_outliers(pts, 30, 2.0)
    pts, colors = pts[keep], colors[keep]
    cam_in_world = glcam_in_world @ GLCAM_IN_CVCAM  # CV cam -> world
    pts = pts @ cam_in_world[:3, :3].T + cam_in_world[:3, 3]
    return pts, colors


def compute_scene_bounds(rgbs, depths, masks, K, glcam_in_worlds,
                         eps: float = 0.06, min_samples: int = 1,
                         translation=None, sc_factor=None):
    """Reference tool.py:67-132.  Returns (sc_factor, translation,
    pcd_real_scale pts, pcd_normalized pts)."""
    all_pts = []
    for i in range(len(rgbs)):
        pts, _ = fuse_frame_cloud(depths[i], rgbs[i], masks[i], K, glcam_in_worlds[i])
        if pts is not None:
            all_pts.append(pts)
    pts = np.concatenate(all_pts) if all_pts else np.zeros((0, 3))
    pts, _ = voxel_downsample(pts, None, eps / 5)

    if translation is None:
        translation, sc_factor, keep = compute_translation_scales(
            pts, cluster=True, eps=eps, min_samples=min_samples
        )
    else:
        tmp = (pts + translation) * sc_factor
        keep = (np.abs(tmp) < 1).all(axis=-1)
    pts_real = pts[keep]
    pts_norm = (pts_real + translation) * sc_factor
    return sc_factor, np.asarray(translation, dtype=np.float64), pts_real, pts_norm
