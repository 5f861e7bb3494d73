"""Output/debug artifact trail — the reference's "output directory is the
checkpoint" contract (SURVEY.md §5): per-frame pose files, segmented
color / filtered depth / mask dumps and per-frame keyframe lists, which
``global_refine`` restarts from (reference Bundler::saveNewframeResult
Bundler.cpp:959-1111 and BundleSdf.run_global_nerf bundlesdf.py:640-700).
"""
from __future__ import annotations

import os

import cv2
import numpy as np
import yaml


def save_newframe_result(tracker, frame, out_dir: str, spdlog_level: int = 1):
    """Write ob_in_cam/<id>.txt always; heavier dumps gated by level
    (mirroring the reference's SPDLOG-gated artifact levels)."""
    os.makedirs(f"{out_dir}/ob_in_cam", exist_ok=True)
    ob_in_cam = np.linalg.inv(frame.pose_in_model)
    np.savetxt(f"{out_dir}/ob_in_cam/{frame.id_str}.txt", ob_in_cam)

    if spdlog_level >= 2:
        for sub in ("color_segmented", "depth_filtered", "mask"):
            os.makedirs(f"{out_dir}/{sub}", exist_ok=True)
        color = frame.color.copy()
        if color.max() <= 1.5:
            color = (color * 255).astype(np.uint8)
        color_seg = color.copy()
        color_seg[~frame.fg_mask] = 0
        cv2.imwrite(f"{out_dir}/color_segmented/{frame.id_str}.png",
                    color_seg[..., ::-1])
        depth_mm = (frame.depth * 1000).astype(np.uint16)
        cv2.imwrite(f"{out_dir}/depth_filtered/{frame.id_str}.png", depth_mm)
        cv2.imwrite(f"{out_dir}/mask/{frame.id_str}.png",
                    frame.fg_mask.astype(np.uint8) * 255)

    # keyframe list + poses for restart (reference keyframes.yml)
    kf_data = {}
    for kf in tracker.bundler.keyframes:
        kf_data[kf.id_str] = {
            "cam_in_ob": np.asarray(kf.pose_in_model).reshape(-1).tolist(),
            "nerfed": bool(kf.nerfed),
        }
    with open(f"{out_dir}/keyframes.yml", "w") as f:
        yaml.safe_dump(kf_data, f)


def load_keyframes_yml(out_dir: str) -> dict:
    with open(f"{out_dir}/keyframes.yml") as f:
        data = yaml.safe_load(f)
    out = {}
    for id_str, rec in data.items():
        out[id_str] = {
            "cam_in_ob": np.asarray(rec["cam_in_ob"], dtype=np.float32).reshape(4, 4),
            "nerfed": bool(rec.get("nerfed", False)),
        }
    return out


def load_tracked_frames(out_dir: str, id_strs=None):
    """Reload the per-frame artifact trail (color_segmented/depth_filtered/
    mask + keyframes.yml) as the frame dicts run_global_nerf consumes."""
    kfs = load_keyframes_yml(out_dir)
    ids = sorted(kfs.keys()) if id_strs is None else id_strs
    frames = []
    for id_str in ids:
        color = cv2.imread(f"{out_dir}/color_segmented/{id_str}.png")
        if color is None:
            continue
        depth = cv2.imread(f"{out_dir}/depth_filtered/{id_str}.png", -1) / 1e3
        mask = cv2.imread(f"{out_dir}/mask/{id_str}.png", -1)
        frames.append({
            "id_str": id_str,
            "color": color[..., ::-1].copy(),
            "depth": depth.astype(np.float32),
            "mask": (mask > 0).astype(np.float32),
            "cam_in_ob": kfs[id_str]["cam_in_ob"],
        })
    return frames
