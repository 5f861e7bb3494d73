"""Self-consistency of scripts/eval_synth.py: feeding ground truth back in
must report ~zero pose error and ~zero chamfer."""
import json
import os
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "scripts"))

from eval_synth import cube_surface_points, load_obj_vertices  # noqa: E402


def test_eval_synth_gt_roundtrip(tmp_path):
    from scipy.spatial.transform import Rotation

    rng = np.random.default_rng(0)
    gts = []
    for k in range(5):
        T = np.eye(4)
        T[:3, :3] = Rotation.from_rotvec(rng.normal(size=3) * 0.3).as_matrix()
        T[:3, 3] = rng.normal(size=3) * 0.1 + [0, 0, 0.5]
        gts.append(T)
    gts = np.stack(gts)

    video = tmp_path / "video"
    out = tmp_path / "out"
    (out / "ob_in_cam").mkdir(parents=True)
    video.mkdir()
    np.save(video / "gt_ob_in_cam.npy", gts)
    for k, T in enumerate(gts):
        np.savetxt(out / "ob_in_cam" / f"{k:05d}.txt", T)

    # mesh = exact cube surface in the fixture's object frame
    surf = cube_surface_points(0.15, n_per_axis=25)
    with open(out / "mesh_online.obj", "w") as f:
        for p in surf:
            f.write(f"v {p[0]} {p[1]} {p[2]}\n")

    res = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "eval_synth.py"),
         str(out), str(video)],
        capture_output=True, text=True, check=True,
        env={**os.environ, "JAX_PLATFORMS": "cpu"},
    )
    stats = json.loads(res.stdout.strip().splitlines()[-1])
    assert stats["frames"] == 5
    assert stats["pose_terr_max_cm"] < 1e-4
    assert stats["pose_rot_max_deg"] < 1e-3
    assert stats["chamfer_cm"] < 0.3  # surface-sample spacing bound


def test_eval_synth_detects_offset_mesh(tmp_path):
    """A mesh shifted by 3 cm must show up in the chamfer."""
    gts = np.stack([np.eye(4)] * 3)
    gts[:, 2, 3] = 0.5
    video = tmp_path / "video"
    out = tmp_path / "out"
    (out / "ob_in_cam").mkdir(parents=True)
    video.mkdir()
    np.save(video / "gt_ob_in_cam.npy", gts)
    for k, T in enumerate(gts):
        np.savetxt(out / "ob_in_cam" / f"{k:05d}.txt", T)
    surf = cube_surface_points(0.15, n_per_axis=25) + np.array([0.03, 0, 0])
    with open(out / "mesh_online.obj", "w") as f:
        for p in surf:
            f.write(f"v {p[0]} {p[1]} {p[2]}\n")
    res = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "eval_synth.py"),
         str(out), str(video)],
        capture_output=True, text=True, check=True,
        env={**os.environ, "JAX_PLATFORMS": "cpu"},
    )
    stats = json.loads(res.stdout.strip().splitlines()[-1])
    assert 1.0 < stats["chamfer_cm"] < 4.0
