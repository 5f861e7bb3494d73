"""Bundler keyframe-subset selection strategies (reference
selectKeyFramesForBA Bundler.cpp:430-609: all 7 methods)."""
import numpy as np
import pytest
from scipy.spatial.transform import Rotation

from bundlesdf_tpu.config import default_track_config
from bundlesdf_tpu.tracking.frame import Frame
from bundlesdf_tpu.tracking.pool import Bundler

METHODS = [
    "greedy_rot", "nearest_rotations", "normal_orientation_nearest",
    "normal_orientation_greedy", "greedy_covisible_points", "near_enough_rot",
]


def _frame(fid, rot_deg, cfg):
    H = W = 16
    depth = np.full((H, W), 0.5, np.float32)
    K = np.array([[20.0, 0, 8], [0, 20.0, 8], [0, 0, 1]], np.float32)
    f = Frame(np.zeros((H, W, 3), np.uint8), depth, K, fid, f"{fid:05d}", cfg)
    pose = np.eye(4, dtype=np.float32)
    pose[:3, :3] = Rotation.from_euler("x", rot_deg, degrees=True).as_matrix()
    f.pose_in_model = pose
    return f


@pytest.mark.parametrize("method", METHODS)
def test_selection_respects_budget_and_anchors(method):
    cfg = default_track_config()
    cfg["bundle"]["max_BA_frames"] = 4
    cfg["bundle"]["subset_selection_method"] = method
    b = Bundler(cfg)
    for i in range(8):
        f = _frame(i, 10.0 * i, cfg)
        b.keyframes.append(f)
        if i == 0:
            b.firstframe = f
    nf = _frame(99, 75.0, cfg)
    b.newframe = nf
    b.select_keyframes_for_ba()
    ids = [f.id for f in b.local_frames]
    assert len(ids) <= 4
    assert 99 in ids  # new frame always included
    assert ids == sorted(ids)


def test_nearest_rotations_picks_rotationally_close():
    cfg = default_track_config()
    cfg["bundle"]["max_BA_frames"] = 3
    cfg["bundle"]["subset_selection_method"] = "nearest_rotations"
    b = Bundler(cfg)
    for i in range(8):
        f = _frame(i, 10.0 * i, cfg)
        b.keyframes.append(f)
        if i == 0:
            b.firstframe = f
    nf = _frame(99, 68.0, cfg)  # nearest kfs: 70 deg (id 7) then 60 (id 6)
    b.newframe = nf
    b.select_keyframes_for_ba()
    ids = set(f.id for f in b.local_frames)
    assert ids == {6, 7, 99}
