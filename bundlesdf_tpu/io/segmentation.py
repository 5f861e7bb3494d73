"""First-frame / per-frame object segmentation provider.

The reference ships a thin stub that reads precomputed mask PNGs (XMem is
excluded for license reasons, readme.md:67; segmentation_utils.py:13-18).
Same contract here: ``Segmenter.run(color_file, ...)`` returns the mask for
that frame from a sibling ``masks/`` directory — any external video
segmenter can drop its outputs there.
"""
from __future__ import annotations

import os

import cv2
import numpy as np


class Segmenter:
    """Reads precomputed masks (reference segmentation_utils.Segmenter)."""

    def __init__(self, mask_dir: str | None = None):
        self.mask_dir = mask_dir

    def run(self, color_file: str, out_size=None):
        if self.mask_dir is not None:
            path = os.path.join(self.mask_dir, os.path.basename(color_file))
        else:
            path = color_file.replace("rgb", "masks")
        mask = cv2.imread(path, -1)
        if mask is None:
            raise FileNotFoundError(f"mask not found: {path}")
        if mask.ndim == 3:
            mask = (mask.sum(axis=-1) > 0).astype(np.uint8) * 255
        if out_size is not None:
            mask = cv2.resize(mask, out_size, interpolation=cv2.INTER_NEAREST)
        return mask
