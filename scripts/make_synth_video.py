"""Generate the synthetic RGBD verify fixture: a rotating dots-textured cube
in the YCBInEOAT layout (rgb/ depth/ masks/ cam_K.txt, mm-uint16 depth) with
ground-truth poses.  Usage: python scripts/make_synth_video.py [out_dir]."""
import os, sys, cv2, numpy as np
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "tests"))
from synthetic_cube import render_cube_rgbd
from scipy.spatial.transform import Rotation

out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/synth_dots"
n_frames = int(sys.argv[2]) if len(sys.argv) > 2 else 12
deg_step = float(sys.argv[3]) if len(sys.argv) > 3 else 6.0
H = W = 480
K = np.array([[600.0, 0, W/2], [0, 600.0, H/2], [0, 0, 1]], np.float32)
axis = np.array([0, 1, 0.2]); axis = axis/np.linalg.norm(axis)
base = Rotation.from_euler("xyz", [20, 30, 10], degrees=True).as_matrix()
for d in ["rgb", "depth", "masks"]:
    os.makedirs(f"{out}/{d}", exist_ok=True)
np.savetxt(f"{out}/cam_K.txt", K)
gts = []
for k in range(n_frames):
    R = Rotation.from_rotvec(axis*np.deg2rad(deg_step*k)).as_matrix() @ base
    ob_in_cam = np.eye(4); ob_in_cam[:3,:3] = R
    # small translation wobble so translation tracking is exercised too
    ob_in_cam[:3,3] = [0.02*np.sin(k*0.4), 0.015*np.cos(k*0.3), 0.55 + 0.01*np.sin(k*0.2)]
    rgb, depth, mask = render_cube_rgbd(ob_in_cam, K, H, W, texture="dots")
    name = f"{k:05d}"
    cv2.imwrite(f"{out}/rgb/{name}.png", cv2.cvtColor(rgb.astype(np.uint8), cv2.COLOR_RGB2BGR))
    cv2.imwrite(f"{out}/depth/{name}.png", (depth*1000).astype(np.uint16))
    cv2.imwrite(f"{out}/masks/{name}.png", mask)
    gts.append(ob_in_cam)
np.save(f"{out}/gt_ob_in_cam.npy", np.asarray(gts))
print("wrote", out)
