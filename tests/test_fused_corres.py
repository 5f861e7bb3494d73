"""Fused one-launch correspondence path (ops/fused_corres.py +
tracking/device_pool.py) vs the legacy host-driven path.

The fused path replaces per-call crop uploads + host cv2 warps + separate
matcher/RANSAC launches (reference find_corres stages, bundlesdf.py:352-387)
with a single program over a device-resident frame pool.  Equivalence is
behavioral (same inliers/pose up to warp-interpolation and pool-quantization
noise), not bitwise — cv2's fixed-point bilinear differs from the device's
float bilinear by design.
"""
import numpy as np
import pytest
import jax

from synthetic_hard import render_blob_rgbd
from scipy.spatial.transform import Rotation

from bundlesdf_tpu.config import ycbineoat_track_config
from bundlesdf_tpu.tracking.frame import Frame
from bundlesdf_tpu.tracking import corres
from bundlesdf_tpu.tracking.device_pool import DeviceFramePool


def _make_frames(n=3, deg=7.0):
    cfg = ycbineoat_track_config()
    cfg["depth_processing"]["zfar"] = 1.0
    H = W = 480
    K = np.array([[600.0, 0, W / 2], [0, 600.0, H / 2], [0, 0, 1]], np.float32)
    frames = []
    axis = np.array([0, 1, 0.2]); axis = axis / np.linalg.norm(axis)
    for k in range(n):
        R = Rotation.from_rotvec(axis * np.deg2rad(deg * k)).as_matrix()
        T = np.eye(4); T[:3, :3] = R; T[:3, 3] = [0, 0, 0.55]
        rgb, depth, mask = render_blob_rgbd(T, K, H, W)
        f = Frame(rgb, depth, K, id=k, id_str=f"{k:05d}", cfg=cfg,
                  fg_mask=mask > 0)
        f.pose_in_model = np.linalg.inv(T).astype(np.float32)
        frames.append(f)
    return cfg, frames


@pytest.fixture(scope="module")
def fixture():
    return _make_frames()


def test_device_pool_roundtrip(fixture):
    cfg, frames = fixture
    f = frames[0]
    pool = DeviceFramePool(f.H, f.W, capacity=4)
    (slot,) = pool.ensure([f])
    gray = np.asarray(pool.gray[slot])
    depth = np.asarray(pool.depth[slot])
    normals = np.asarray(pool.normals[slot])
    assert np.abs(gray - np.round(f.gray)).max() <= 0.5
    assert np.abs(depth - f.depth).max() <= 1e-4 + 1e-6  # 0.1 mm quantization
    assert np.abs(normals - f.normals).max() <= 1.5 / 127.0
    # idempotent ensure: same slot, no re-upload
    assert pool.ensure([f]) == [slot]


def test_device_pool_lru_eviction(fixture):
    cfg, frames = fixture
    pool = DeviceFramePool(frames[0].H, frames[0].W, capacity=2)
    s0 = pool.ensure([frames[0]])[0]
    pool.ensure([frames[1]])
    pool.ensure([frames[2]])  # evicts frame 0 (LRU)
    assert frames[0].id not in pool.slot_of
    assert frames[2].id in pool.slot_of
    # protected batch cannot evict its own members
    with pytest.raises(RuntimeError):
        DeviceFramePool(frames[0].H, frames[0].W, capacity=1).ensure(frames[:2])
    _ = s0


def test_fused_matches_legacy(fixture):
    cfg, frames = fixture
    fa, fb = frames[1], frames[0]
    key = jax.random.PRNGKey(1)

    store_f = corres.CorresStore(cfg)
    assert store_f.use_fused
    corres.find_corres(store_f, [(fa, fb)], cfg, key=key)
    mf = store_f.matches[(fa.id, fb.id)]

    cfg2 = ycbineoat_track_config()
    cfg2["depth_processing"]["zfar"] = 1.0
    cfg2["feature_corres"]["fused"] = False
    store_l = corres.CorresStore(cfg2)
    assert not store_l.use_fused
    corres.find_corres(store_l, [(fa, fb)], cfg2, key=key)
    ml = store_l.matches[(fa.id, fb.id)]

    # behavioral agreement: similar inlier sets, near-identical pose
    nf, nl = int(mf["inlier"].sum()), int(ml["inlier"].sum())
    assert nf >= 0.7 * nl and nl >= 0.7 * nf and nf >= 20
    off_f = corres.procrustes_offset(store_f, fa, fb)
    off_l = corres.procrustes_offset(store_l, fa, fb)
    assert np.abs(off_f[:3, 3] - off_l[:3, 3]).max() < 1e-3
    assert np.abs(off_f[:3, :3] - off_l[:3, :3]).max() < 5e-3


def test_fused_multi_pair_and_padding(fixture):
    cfg, frames = fixture
    key = jax.random.PRNGKey(2)
    pairs = [(frames[1], frames[0]), (frames[2], frames[0]),
             (frames[2], frames[1])]
    store = corres.CorresStore(cfg)
    corres.find_corres(store, pairs, cfg, key=key)  # pads 3 -> pair_batch
    for fa, fb in pairs:
        m = store.matches[(fa.id, fb.id)]
        assert m["inlier"].sum() >= 10, (fa.id, fb.id)
        # raw table landed for the reuse path
        assert (fa.id, fb.id) in store.raw


def test_fused_raw_reuse_does_not_rerun_matcher(fixture, monkeypatch):
    cfg, frames = fixture
    fa, fb = frames[1], frames[0]
    store = corres.CorresStore(cfg)
    corres.find_corres(store, [(fa, fb)], cfg, key=jax.random.PRNGKey(3))
    n0 = int(store.matches[(fa.id, fb.id)]["inlier"].sum())
    store.invalidate_matches(fa.id)
    assert (fa.id, fb.id) not in store.matches
    # raw survives; the fused (matcher) path must NOT run again
    called = []
    monkeypatch.setattr(
        corres, "_find_corres_fused",
        lambda *a, **k: called.append(1))
    corres.find_corres(store, [(fa, fb)], cfg, key=jax.random.PRNGKey(3))
    assert not called
    n1 = int(store.matches[(fa.id, fb.id)]["inlier"].sum())
    assert n1 >= 0.5 * n0 and n1 >= 10


def test_warp_crop_matches_cv2(fixture):
    import cv2
    import jax.numpy as jnp
    from bundlesdf_tpu.ops import fused_corres as fused_ops

    cfg, frames = fixture
    fa, fb = frames[1], frames[0]
    out_size = int(cfg["feature_corres"]["resize"])
    tfA, tfB = corres.pair_homographies(fa, fb, out_size)
    ref = cv2.warpPerspective(fa.gray.astype(np.float32), tfA,
                              (out_size, out_size))
    dev = np.asarray(fused_ops._warp_crop(
        jnp.asarray(fa.gray.astype(np.float32)),
        jnp.asarray(np.linalg.inv(tfA).astype(np.float32)), out_size))
    # cv2 uses 5-bit fixed-point bilinear; allow small differences away from
    # borders, compare on the central region
    c = slice(10, out_size - 10)
    diff = np.abs(ref[c, c] - dev[c, c])
    assert np.median(diff) < 1.0
    assert (diff < 16.0).mean() > 0.98
