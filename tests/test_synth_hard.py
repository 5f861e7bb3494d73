"""Self-consistency of the hard synthetic fixture (tests/synthetic_hard.py)."""
import numpy as np

from synthetic_hard import (BLOB_SPHERES, blob_surface_distance,
                            blob_surface_points, make_hard_video,
                            render_blob_rgbd, render_finger)


def test_render_depth_consistent_with_analytic_surface():
    K = np.array([[120.0, 0, 64], [0, 120.0, 64], [0, 0, 1]], np.float32)
    ob_in_cam = np.eye(4)
    ob_in_cam[:3, 3] = [0, 0, 0.55]
    rgb, depth, mask = render_blob_rgbd(ob_in_cam, K, 128, 128)
    assert (mask > 0).sum() > 500
    j, i = np.nonzero(depth > 0)
    z = depth[j, i]
    p_cam = np.stack([(i - K[0, 2]) / K[0, 0] * z,
                      (j - K[1, 2]) / K[1, 1] * z, z], axis=-1)
    T = np.linalg.inv(ob_in_cam)
    p_obj = p_cam @ T[:3, :3].T + T[:3, 3]
    d = blob_surface_distance(p_obj)
    assert float(np.max(d)) < 1e-6


def test_surface_points_on_surface_and_outside_union_interior():
    pts = blob_surface_points(n=2000)
    assert len(pts) > 1000
    d = blob_surface_distance(pts)
    assert float(np.max(d)) < 1e-6
    # none strictly inside another sphere
    for (cx, cy, cz, r) in BLOB_SPHERES:
        inside = np.linalg.norm(pts - np.array([cx, cy, cz]), axis=-1) < r - 1e-6
        assert not inside.any()


def test_finger_occluder_covers_and_moves():
    K = np.array([[120.0, 0, 64], [0, 120.0, 64], [0, 0, 1]], np.float32)
    occ1, _, d1 = render_finger(K, 128, 128, 1, 14)
    occ2, _, _ = render_finger(K, 128, 128, 7, 14)
    assert occ1.sum() > 100 and occ2.sum() > 100
    assert (occ1 != occ2).any()  # it moves
    assert np.all(d1[occ1] < 0.55)  # in front of the object


def test_make_hard_video_layout(tmp_path):
    out = make_hard_video(str(tmp_path), n_frames=3, deg_step=7.0, H=64, W=64)
    import cv2

    for sub in ("rgb", "depth", "masks", "masks_hand"):
        assert len(list((tmp_path / sub).glob("*.png"))) == 3
    gt = np.load(tmp_path / "gt_ob_in_cam.npy")
    assert gt.shape == (3, 4, 4)
    assert (tmp_path / "gt_model_points.npy").exists()
    # frame 1+ has the occluder; where occluded, object mask is 0
    occ = cv2.imread(str(tmp_path / "masks_hand" / "00001.png"), -1)
    m = cv2.imread(str(tmp_path / "masks" / "00001.png"), -1)
    assert occ.sum() > 0
    assert not (m[occ > 0] > 0).any()
    # depth dropout exists inside the mask region
    d = cv2.imread(str(tmp_path / "depth" / "00001.png"), -1)
    assert ((d == 0) & (m > 0)).sum() > 0
