"""YcbineoatReader: native prefetch loader vs pure-Python decode parity."""
import os

import cv2
import numpy as np
import pytest

from bundlesdf_tpu.io.readers import YcbineoatReader


@pytest.fixture
def video(tmp_path):
    rng = np.random.default_rng(1)
    for d in ["rgb", "depth", "masks"]:
        os.makedirs(tmp_path / d, exist_ok=True)
    np.savetxt(tmp_path / "cam_K.txt", np.array([[100.0, 0, 32], [0, 100, 24], [0, 0, 1]]))
    for i in range(3):
        rgb = rng.integers(0, 255, (48, 64, 3), dtype=np.uint8)
        depth = rng.uniform(0.2, 2.0, (48, 64))
        mask = (rng.random((48, 64)) > 0.4).astype(np.uint8) * 255
        cv2.imwrite(str(tmp_path / "rgb" / f"{i:05d}.png"), rgb[..., ::-1])
        cv2.imwrite(str(tmp_path / "depth" / f"{i:05d}.png"), (depth * 1000).astype(np.uint16))
        cv2.imwrite(str(tmp_path / "masks" / f"{i:05d}.png"), mask)
    return str(tmp_path)


def test_reader_native_matches_python(video):
    r_py = YcbineoatReader(video, prefetch=False)
    r_nat = YcbineoatReader(video, prefetch=True)
    for i in range(3):
        np.testing.assert_array_equal(r_nat.get_color(i), r_py.get_color(i))
        np.testing.assert_allclose(r_nat.get_depth(i), r_py.get_depth(i), atol=1e-6)
        np.testing.assert_array_equal(r_nat.get_mask(i) > 0, r_py.get_mask(i) > 0)


def test_reader_native_matches_python_resized(video):
    r_py = YcbineoatReader(video, shorter_side=24, prefetch=False)
    r_nat = YcbineoatReader(video, shorter_side=24, prefetch=True)
    assert (r_nat.H, r_nat.W) == (r_py.H, r_py.W)
    for i in range(3):
        np.testing.assert_array_equal(r_nat.get_color(i), r_py.get_color(i))
        np.testing.assert_allclose(r_nat.get_depth(i), r_py.get_depth(i), atol=1e-6)
