"""Native host runtime (C++ loader / rasterizer / marching tets) vs the
pure-Python equivalents."""
import os

import numpy as np
import pytest

from bundlesdf_tpu import native

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native host runtime not built"
)


def _write_video(tmp_path, n=3, H=60, W=80):
    import cv2

    rng = np.random.default_rng(0)
    os.makedirs(tmp_path / "rgb", exist_ok=True)
    os.makedirs(tmp_path / "depth", exist_ok=True)
    os.makedirs(tmp_path / "masks", exist_ok=True)
    frames = []
    for i in range(n):
        rgb = rng.integers(0, 255, (H, W, 3), dtype=np.uint8)
        depth = rng.uniform(0.2, 2.0, (H, W)).astype(np.float32)
        mask = (rng.random((H, W)) > 0.5).astype(np.uint8) * 255
        cv2.imwrite(str(tmp_path / "rgb" / f"{i:05d}.png"), rgb[..., ::-1])
        cv2.imwrite(str(tmp_path / "depth" / f"{i:05d}.png"),
                    (depth * 1000).astype(np.uint16))
        cv2.imwrite(str(tmp_path / "masks" / f"{i:05d}.png"), mask)
        frames.append((rgb, depth, mask))
    return frames


def test_frame_loader_parity(tmp_path):
    frames = _write_video(tmp_path)
    n = len(frames)
    loader = native.FrameLoader(
        [str(tmp_path / "rgb" / f"{i:05d}.png") for i in range(n)],
        [str(tmp_path / "depth" / f"{i:05d}.png") for i in range(n)],
        [str(tmp_path / "masks" / f"{i:05d}.png") for i in range(n)],
        H=60, W=80,
    )
    for i, (rgb, depth, mask) in enumerate(frames):
        r, d, m = loader.get(i)
        np.testing.assert_array_equal(r, rgb)
        # depth roundtrips through mm-uint16 (writer truncates)
        np.testing.assert_allclose(
            d, (depth * 1000).astype(np.uint16) / 1000, atol=1e-6
        )
        np.testing.assert_array_equal(m > 0, mask > 0)
    # random access out of order + out of range
    loader.get(0)
    with pytest.raises(IndexError):
        loader.get(99)
    loader.close()


def test_frame_loader_resize(tmp_path):
    import cv2

    frames = _write_video(tmp_path, n=1, H=60, W=80)
    loader = native.FrameLoader(
        [str(tmp_path / "rgb" / "00000.png")],
        [str(tmp_path / "depth" / "00000.png")],
        [str(tmp_path / "masks" / "00000.png")],
        H=30, W=40,
    )
    r, d, m = loader.get(0)
    rgb, depth, mask = frames[0]
    np.testing.assert_array_equal(
        r, cv2.resize(rgb, (40, 30), interpolation=cv2.INTER_NEAREST)
    )
    loader.close()


def test_rasterizer_depth_and_coverage():
    # Unit quad (two triangles) at z=1 in front of a 64x64 f=64 camera.
    verts = np.array(
        [[-0.3, -0.3, 1.0], [0.3, -0.3, 1.0], [0.3, 0.3, 1.0], [-0.3, 0.3, 1.0]],
        np.float32,
    )
    faces = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
    K = np.array([[64, 0, 32], [0, 64, 32], [0, 0, 1]], np.float32)
    depth, face, bary = native.rasterize(verts, faces, K, np.eye(4), 64, 64)
    hit = face >= 0
    assert hit.sum() > 1000  # ~38x38 px quad
    np.testing.assert_allclose(depth[hit], 1.0, atol=1e-5)
    # center pixel covered, corner not
    assert face[32, 32] >= 0 and face[0, 0] == -1
    # barycentrics sum to 1 where covered
    np.testing.assert_allclose(bary[hit].sum(-1), 1.0, atol=1e-4)


def test_rasterizer_occlusion():
    # two quads, nearer one wins the z-buffer
    def quad(z, s):
        return np.array(
            [[-s, -s, z], [s, -s, z], [s, s, z], [-s, s, z]], np.float32
        )

    verts = np.concatenate([quad(2.0, 0.5), quad(1.0, 0.2)])
    faces = np.array(
        [[0, 1, 2], [0, 2, 3], [4, 5, 6], [4, 6, 7]], np.int32
    )
    K = np.array([[64, 0, 32], [0, 64, 32], [0, 0, 1]], np.float32)
    depth, face, _ = native.rasterize(verts, faces, K, np.eye(4), 64, 64)
    assert abs(depth[32, 32] - 1.0) < 1e-5  # near quad wins at center
    assert face[32, 32] >= 2


def test_marching_tets_sphere():
    n = 48
    g = np.linspace(-1, 1, n)
    X, Y, Z = np.meshgrid(g, g, g, indexing="ij")
    field = np.sqrt(X**2 + Y**2 + Z**2) - 0.6  # SDF of r=0.6 sphere
    tris = native.marching_tets(field.astype(np.float32), iso=0.0)
    assert len(tris) > 1000
    # vertices lie near the r=0.6 surface (grid-index -> world)
    pts = tris.reshape(-1, 3) * (2.0 / (n - 1)) - 1.0
    r = np.linalg.norm(pts, axis=-1)
    assert np.abs(r - 0.6).max() < 0.06
