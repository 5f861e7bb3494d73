"""Evaluate a pipeline run against the synthetic cube fixture's analytic GT.

The fixture (scripts/make_synth_video.py) is a half-size-0.15 axis-aligned
cube with known per-frame poses, so quality is checkable without HO3D data:

  * online pose error: first-frame-aligned translation / rotation error of
    ob_in_cam/*.txt vs gt_ob_in_cam.npy (the reference's alignment scheme,
    benchmark_ho3d.py:62-78)
  * mesh error: symmetric chamfer between the reconstructed mesh (object
    frame) and the analytic cube surface — point-to-cube distance is
    closed-form, no ICP needed.

Usage: python scripts/eval_synth.py <out_folder> <video_dir> [--mesh M.obj]
Prints one JSON line.
"""
import argparse
import glob
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def load_obj_vertices(path):
    vs = []
    with open(path) as f:
        for line in f:
            if line.startswith("v "):
                vs.append([float(x) for x in line.split()[1:4]])
    return np.asarray(vs, np.float64)


def cube_surface_points(half, n_per_axis=40):
    """Uniform sample points on the cube surface (6 faces)."""
    lin = np.linspace(-half, half, n_per_axis)
    u, v = np.meshgrid(lin, lin, indexing="ij")
    u, v = u.ravel(), v.ravel()
    faces = []
    for ax in range(3):
        for s in (-half, half):
            p = np.zeros((len(u), 3))
            p[:, ax] = s
            p[:, (ax + 1) % 3] = u
            p[:, (ax + 2) % 3] = v
            faces.append(p)
    return np.concatenate(faces)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("out_folder")
    ap.add_argument("video_dir")
    ap.add_argument("--mesh", default=None,
                    help="mesh path (default: textured_mesh.obj if present, "
                         "else mesh_online.obj)")
    ap.add_argument("--half", type=float, default=0.15)
    args = ap.parse_args()

    gt = np.load(os.path.join(args.video_dir, "gt_ob_in_cam.npy"))
    files = sorted(glob.glob(os.path.join(args.out_folder, "ob_in_cam", "*.txt")))
    preds = np.stack([np.loadtxt(f) for f in files])
    A = preds @ np.linalg.inv(preds[0]) @ gt[0]
    terr = np.linalg.norm(A[:, :3, 3] - gt[: len(A), :3, 3], axis=-1)
    Rrel = A[:, :3, :3] @ np.transpose(gt[: len(A), :3, :3], (0, 2, 1))
    tr = np.clip((np.trace(Rrel, axis1=1, axis2=2) - 1) / 2, -1, 1)
    rot = np.degrees(np.arccos(tr))

    mesh_path = args.mesh
    if mesh_path is None:
        for cand in ("textured_mesh.obj", "mesh_online.obj"):
            p = os.path.join(args.out_folder, cand)
            if os.path.exists(p):
                mesh_path = p
                break
    chamfer = None
    if mesh_path and os.path.exists(mesh_path):
        verts = load_obj_vertices(mesh_path)
        if len(verts):
            # The reconstruction's object frame is anchored to the frame-0
            # camera (tracker pose0 = I); map verts into the fixture's
            # canonical cube frame: p_gt = inv(gt0) @ pred0 @ p_recon.
            T = np.linalg.inv(gt[0]) @ preds[0]
            verts = verts @ T[:3, :3].T + T[:3, 3]
            # mesh->cube: closed-form surface distance
            q = np.abs(verts) - args.half
            out_d = np.linalg.norm(np.maximum(q, 0.0), axis=-1)
            in_d = np.where((q <= 0).all(-1), np.abs(q.max(-1)), 0.0)
            d_m2c = out_d + in_d
            # cube->mesh: nearest mesh vertex (dense meshes: good proxy)
            from scipy.spatial import cKDTree

            surf = cube_surface_points(args.half)
            d_c2m, _ = cKDTree(verts).query(surf, k=1, workers=-1)
            chamfer = float((d_m2c.mean() + d_c2m.mean()) / 2 * 100)  # cm

    dets = np.linalg.det(preds[:, :3, :3])
    print(json.dumps({
        "frames": len(A),
        "pose_terr_max_cm": round(float(terr.max() * 100), 3),
        "pose_terr_mean_cm": round(float(terr.mean() * 100), 3),
        "pose_rot_max_deg": round(float(rot.max()), 2),
        # SO(3) health of the saved poses: drift below ~0.999 inflates the
        # trace-based rotation metric and biases long compose chains
        "pose_det_min": round(float(dets.min()), 5),
        "mesh": os.path.basename(mesh_path) if mesh_path else None,
        "chamfer_cm": round(chamfer, 3) if chamfer is not None else None,
    }))


if __name__ == "__main__":
    main()
