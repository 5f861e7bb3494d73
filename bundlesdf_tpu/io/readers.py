"""Dataset readers: YCBInEOAT/custom RGBD layout and HO3D_v3.

Behavioral parity with the reference BundleTrack/scripts/data_reader.py:
  * YcbineoatReader (:21-110): ``rgb/ depth/ masks/ cam_K.txt`` layout,
    mm-uint16 depth, optional masks_hand occluder masks, downscale /
    shorter-side resize;
  * Ho3dReader (:113-185): jpg rgb, packed 2-channel depth x depth_scale,
    XMem mask directory, pkl meta with GT poses (GL-flipped), per-video GT
    mesh lookup.
"""
from __future__ import annotations

import glob
import logging
import os
import pickle

import cv2
import imageio.v2 as imageio
import numpy as np

from ..utils import geometry

GLCAM_IN_CVCAM = np.asarray(geometry.GLCAM_IN_CVCAM)


class YcbineoatReader:
    """Custom / YCBInEOAT video directory reader."""

    videoname_to_object = {
        "bleach0": "021_bleach_cleanser",
        "bleach_hard_00_03_chaitanya": "021_bleach_cleanser",
        "cracker_box_reorient": "003_cracker_box",
        "cracker_box_yalehand0": "003_cracker_box",
        "mustard0": "006_mustard_bottle",
        "mustard_easy_00_02": "006_mustard_bottle",
        "sugar_box1": "004_sugar_box",
        "sugar_box_yalehand0": "004_sugar_box",
        "tomato_soup_can_yalehand0": "005_tomato_soup_can",
    }

    def __init__(self, video_dir: str, downscale: float = 1, shorter_side=None,
                 prefetch: bool = True):
        self.video_dir = video_dir
        self.downscale = downscale
        self.color_files = sorted(glob.glob(f"{video_dir}/rgb/*.png"))
        if not self.color_files:
            raise FileNotFoundError(f"no rgb/*.png under {video_dir}")
        self.K = np.loadtxt(f"{video_dir}/cam_K.txt").reshape(3, 3)
        self.id_strs = [
            os.path.basename(f).replace(".png", "") for f in self.color_files
        ]
        self.H, self.W = cv2.imread(self.color_files[0]).shape[:2]
        if shorter_side is not None:
            self.downscale = shorter_side / min(self.H, self.W)
        self.H = int(self.H * self.downscale)
        self.W = int(self.W * self.downscale)
        self.K = self.K.copy()
        self.K[:2] *= self.downscale
        self.gt_pose_files = sorted(glob.glob(f"{video_dir}/annotated_poses/*"))
        # Native threaded prefetch loader (decode+resize off the tracker's
        # critical path); per-channel getters serve from a one-frame cache.
        self._loader = None
        self._cached = (-1, None)
        if prefetch:
            try:
                from .. import native

                if native.available():
                    self._loader = native.FrameLoader(
                        self.color_files,
                        [f.replace("rgb", "depth") for f in self.color_files],
                        [f.replace("rgb", "masks") for f in self.color_files],
                        H=self.H, W=self.W,
                    )
            except Exception as e:  # pragma: no cover - fallback path
                logging.info("native frame loader unavailable: %s", e)

    def _get_frame(self, i):
        if self._cached[0] != i:
            self._cached = (i, self._loader.get(i))
        return self._cached[1]

    def get_video_name(self):
        return self.video_dir.rstrip("/").split("/")[-1]

    def __len__(self):
        return len(self.color_files)

    def get_color(self, i):
        if self._loader is not None:
            return self._get_frame(i)[0]
        color = imageio.imread(self.color_files[i])[..., :3]
        return cv2.resize(color, (self.W, self.H), interpolation=cv2.INTER_NEAREST)

    def get_mask(self, i):
        if self._loader is not None:
            return (self._get_frame(i)[2] > 0).astype(np.uint8)
        mask = cv2.imread(self.color_files[i].replace("rgb", "masks"), -1)
        if mask is None:
            return np.zeros((self.H, self.W), np.uint8)
        if mask.ndim == 3:
            mask = (mask.sum(axis=-1) > 0).astype(np.uint8)
        return cv2.resize(mask, (self.W, self.H), interpolation=cv2.INTER_NEAREST)

    def get_depth(self, i):
        if self._loader is not None:
            return self._get_frame(i)[1]
        depth = cv2.imread(self.color_files[i].replace("rgb", "depth"), -1) / 1e3
        return cv2.resize(
            depth, (self.W, self.H), interpolation=cv2.INTER_NEAREST
        ).astype(np.float32)

    def get_occ_mask(self, i):
        occ = np.zeros((self.H, self.W), dtype=bool)
        for sub in ("masks_hand", "masks_hand_right"):
            f = self.color_files[i].replace("rgb", sub)
            if os.path.exists(f):
                m = cv2.imread(f, -1)
                if m is not None:
                    if m.ndim == 3:
                        m = m.sum(axis=-1)
                    m = cv2.resize(
                        m.astype(np.uint8), (self.W, self.H),
                        interpolation=cv2.INTER_NEAREST,
                    )
                    occ |= m > 0
        return occ.astype(np.uint8)

    def get_gt_pose(self, i):
        try:
            return np.loadtxt(self.gt_pose_files[i]).reshape(4, 4)
        except Exception:
            logging.info("GT pose not found, return None")
            return None

    def get_gt_mesh(self, models_root: str):
        from ..utils.mesh import load_obj

        ob = self.videoname_to_object[self.get_video_name()]
        return load_obj(f"{models_root}/{ob}/textured_simple.obj")


class Ho3dReader:
    """HO3D_v3 evaluation sequence reader."""

    DEPTH_SCALE = 0.00012498664727900177  # reference data_reader.py:166

    video2name = {
        "AP": "019_pitcher_base",
        "MPM": "010_potted_meat_can",
        "SB": "021_bleach_cleanser",
        "SM": "006_mustard_bottle",
    }

    def __init__(self, video_dir: str, ho3d_root: str | None = None):
        self.video_dir = video_dir
        self.ho3d_root = ho3d_root or os.path.dirname(os.path.dirname(video_dir.rstrip("/")))
        self.color_files = sorted(glob.glob(f"{video_dir}/rgb/*.jpg"))
        if not self.color_files:
            raise FileNotFoundError(f"no rgb/*.jpg under {video_dir}")
        meta_file = self.color_files[0].replace(".jpg", ".pkl").replace("rgb", "meta")
        with open(meta_file, "rb") as f:
            self.K = pickle.load(f)["camMat"]
        self.id_strs = [
            os.path.basename(f).split(".")[0] for f in self.color_files
        ]
        h, w = cv2.imread(self.color_files[0]).shape[:2]
        self.H, self.W = h, w

    def __len__(self):
        return len(self.color_files)

    def get_video_name(self):
        return os.path.dirname(os.path.abspath(self.color_files[0])).split("/")[-2]

    def get_color(self, i):
        return imageio.imread(self.color_files[i])[..., :3]

    def get_mask(self, i):
        video = self.get_video_name()
        index = int(os.path.basename(self.color_files[i]).split(".")[0])
        m = cv2.imread(f"{self.ho3d_root}/masks_XMem/{video}/{index:05d}.png", -1)
        return m

    def get_occ_mask(self, i):
        video = self.get_video_name()
        index = int(os.path.basename(self.color_files[i]).split(".")[0])
        return cv2.imread(f"{self.ho3d_root}/masks_XMem/{video}_hand/{index:04d}.png", -1)

    def get_depth(self, i):
        depth = cv2.imread(
            self.color_files[i].replace(".jpg", ".png").replace("rgb", "depth"), -1
        )
        d = depth.astype(np.int32)
        return ((d[..., 2] + d[..., 1] * 256) * self.DEPTH_SCALE).astype(np.float32)

    def get_gt_pose(self, i):
        meta_file = self.color_files[i].replace(".jpg", ".pkl").replace("rgb", "meta")
        with open(meta_file, "rb") as f:
            meta = pickle.load(f)
        if meta["objTrans"] is None:
            return None
        ob_in_cam = np.eye(4)
        ob_in_cam[:3, 3] = meta["objTrans"]
        ob_in_cam[:3, :3] = cv2.Rodrigues(meta["objRot"].reshape(3))[0]
        return GLCAM_IN_CVCAM @ ob_in_cam

    def get_gt_mesh(self):
        from ..utils.mesh import load_obj

        video = self.get_video_name()
        for k, ob in self.video2name.items():
            if video.startswith(k):
                return load_obj(f"{self.ho3d_root}/models/{ob}/textured_simple.obj")
        raise KeyError(video)
