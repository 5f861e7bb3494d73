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
    "max_edge",
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


def test_max_edge_prefers_strongly_matched_subset():
    """max_edge DFS (Bundler.cpp:581-591): with a budget of 3 (kf0 + new +
    one more), the keyframe holding the most inlier matches to both
    anchors must win over a rotation-nearer but unmatched keyframe."""
    cfg = default_track_config()
    cfg["bundle"]["max_BA_frames"] = 3
    cfg["bundle"]["subset_selection_method"] = "max_edge"
    b = Bundler(cfg)
    for i in range(4):
        f = _frame(i, 10.0 * i, cfg)
        b.keyframes.append(f)
        if i == 0:
            b.firstframe = f
    nf = _frame(99, 35.0, cfg)
    b.newframe = nf

    def fake_match(ida, idb, n):
        key = (max(ida, idb), min(ida, idb))
        inl = np.zeros(16, bool)
        inl[:n] = True
        b.store.matches[key] = {"inlier": inl}

    # kf2 is strongly matched to both anchors; kf3 is rotation-nearest to
    # the new frame but shares no matches
    fake_match(0, 2, 10)
    fake_match(99, 2, 12)
    fake_match(99, 3, 1)
    fake_match(0, 1, 2)
    fake_match(99, 1, 2)
    b.select_keyframes_for_ba()
    ids = {f.id for f in b.local_frames}
    assert ids == {0, 2, 99}, ids


def test_strategy_comparison_on_synthetic_pool():
    """All 7 reference strategies run on one pool and give valid subsets;
    the covisibility/match-driven ones pick different members than the
    rotation-driven ones (sanity that the knob changes behavior)."""
    picks = {}
    for method in METHODS:
        cfg = default_track_config()
        cfg["bundle"]["max_BA_frames"] = 4
        cfg["bundle"]["subset_selection_method"] = method
        b = Bundler(cfg)
        for i in range(10):
            f = _frame(i, 12.0 * i, cfg)
            b.keyframes.append(f)
            if i == 0:
                b.firstframe = f
        nf = _frame(99, 100.0, cfg)
        b.newframe = nf
        inl = np.ones(8, bool)
        b.store.matches[(99, 2)] = {"inlier": inl}
        b.store.matches[(2, 0)] = {"inlier": inl}
        b.select_keyframes_for_ba()
        ids = frozenset(f.id for f in b.local_frames)
        assert 99 in ids and len(ids) <= 4
        picks[method] = ids
    assert 2 in picks["max_edge"]
    assert 2 in picks["greedy_covisible_points"]
    # rotation-nearest ignores the match graph entirely
    assert picks["nearest_rotations"] != picks["max_edge"]
