"""Raw-match reuse + track propagation through the public find_corres path
(reference _raw_matches reuse FeatureManager.cpp:2720-2769 and MapPoint
propagation)."""
import numpy as np
import pytest

from synthetic_cube import make_cube_sequence

from bundlesdf_tpu.config import default_track_config
from bundlesdf_tpu.tracking import corres as corres_mod
from bundlesdf_tpu.tracking.frame import Frame


def _cfg():
    cfg = default_track_config()
    cfg["feature_corres"]["resize"] = 160
    cfg["feature_corres"]["max_matches_per_pair"] = 256
    cfg["ransac"]["max_iter"] = 256
    cfg["depth_processing"]["percentile"] = 100
    return cfg


def _frames(n=3, deg=4.0):
    cfg = _cfg()
    data = make_cube_sequence(n_frames=n, deg_per_frame=deg)
    frames = []
    for k in range(n):
        f = Frame(data["colors"][k], data["depths"][k], data["K"], k,
                  f"{k:04d}", cfg, fg_mask=data["masks"][k])
        # true relative pose so gating/RANSAC see consistent geometry
        f.pose_in_model = np.linalg.inv(
            data["gt_ob_in_cam"][k] @ np.linalg.inv(data["gt_ob_in_cam"][0])
        ).astype(np.float32)
        frames.append(f)
    return cfg, frames


def test_raw_match_reuse_skips_matcher():
    cfg, frames = _frames(2)
    store = corres_mod.CorresStore(cfg)
    f1, f0 = frames[1], frames[0]

    calls = []

    def spy(imgsA, imgsB):
        calls.append(len(imgsA))
        from bundlesdf_tpu.models import matcher as m
        import jax.numpy as jnp
        res = m.match_pairs_batched(
            jnp.asarray(imgsA), jnp.asarray(imgsB),
            m.CornerMatcherCfg(max_matches=store.max_matches))
        return np.asarray(res["corres"]), np.asarray(res["valid"])

    corres_mod.find_corres(store, [(f1, f0)], cfg, matcher_fn=spy)
    assert len(calls) == 1
    n_inl_first = store.n_inliers((1, 0))
    assert n_inl_first >= 5

    # NeRF-feedback style invalidation: matches gone, raw survives
    store.invalidate_matches(1)
    assert (1, 0) not in store.matches
    assert (1, 0) in store.raw

    corres_mod.find_corres(store, [(f1, f0)], cfg, matcher_fn=spy)
    assert len(calls) == 1, "matcher must NOT re-run on raw-reuse"
    assert store.n_inliers((1, 0)) >= 5


def test_track_propagation_feeds_ransac_candidates():
    cfg, frames = _frames(3)
    store = corres_mod.CorresStore(cfg)
    f0, f1, f2 = frames

    corres_mod.find_corres(store, [(f1, f0)], cfg)
    corres_mod.find_corres(store, [(f2, f1)], cfg)
    assert store.n_inliers((1, 0)) >= 5 and store.n_inliers((2, 1)) >= 5
    pA, pB = store.tracks.propagate(2, 0)
    assert len(pA) > 0  # shared tracks exist through frame 1

    # matcher returns NOTHING for (f2, f0); propagation candidates alone
    # must produce RANSAC inliers
    def empty_matcher(imgsA, imgsB):
        B = len(imgsA)
        K = store.max_matches
        return np.zeros((B, K, 5), np.float32), np.zeros((B, K), bool)

    corres_mod.find_corres(store, [(f2, f0)], cfg, matcher_fn=empty_matcher)
    assert store.n_inliers((2, 0)) >= 3


def test_pair_batch_buckets():
    """Batch padding buckets to {1, pair_batch} for compiled engines and
    is skipped entirely for host engines (compiled=False)."""
    cfg, frames = _frames(3)
    cfg["feature_corres"]["pair_batch"] = 4
    f0, f1, f2 = frames

    sizes = []

    def spy(imgsA, imgsB):
        sizes.append(len(imgsA))
        from bundlesdf_tpu.models import matcher as m
        import jax.numpy as jnp
        res = m.match_pairs_batched(
            jnp.asarray(imgsA), jnp.asarray(imgsB),
            m.CornerMatcherCfg(max_matches=256))
        return np.asarray(res["corres"]), np.asarray(res["valid"])

    store = corres_mod.CorresStore(cfg)
    corres_mod.find_corres(store, [(f1, f0)], cfg, matcher_fn=spy)
    assert sizes[-1] == 1, "single fresh pair must use the batch-of-1 bucket"
    store2 = corres_mod.CorresStore(cfg)
    corres_mod.find_corres(store2, [(f1, f0), (f2, f0), (f2, f1)], cfg,
                           matcher_fn=spy)
    assert sizes[-1] == 4, "multi-pair batches pad to pair_batch"

    # host engine: exact batch, no padding
    class HostSpy:
        compiled = False

        def __init__(self):
            self.sizes = []

        def predict(self, imgsA, imgsB):
            self.sizes.append(len(imgsA))
            B = len(imgsA)
            return (np.zeros((B, 256, 5), np.float32),
                    np.zeros((B, 256), bool))

    store3 = corres_mod.CorresStore(cfg)
    store3.matcher = HostSpy()
    corres_mod.find_corres(store3, [(f1, f0), (f2, f0), (f2, f1)], cfg)
    assert store3.matcher.sizes == [3], "host engines run unpadded"
