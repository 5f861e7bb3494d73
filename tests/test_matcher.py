import numpy as np
import jax.numpy as jnp

from bundlesdf_tpu.models import matcher


def textured_image(H=160, W=160, seed=0):
    rng = np.random.default_rng(seed)
    img = np.zeros((H, W), dtype=np.float32)
    # random blobs for corner-rich texture
    for _ in range(60):
        cy, cx = rng.integers(20, H - 20), rng.integers(20, W - 20)
        h, w = rng.integers(4, 14, 2)
        img[cy : cy + h, cx : cx + w] = rng.random()
    return img


def test_match_identical_images():
    img = textured_image()
    cfg = matcher.CornerMatcherCfg(max_corners=256, max_matches=256)
    res = matcher.match_pair(jnp.asarray(img), jnp.asarray(img), cfg)
    corres = np.asarray(res["corres"])
    valid = np.asarray(res["valid"])
    assert valid.sum() > 30
    c = corres[valid]
    # self-matches map to themselves
    err = np.abs(c[:, 0:2] - c[:, 2:4]).max(axis=-1)
    assert (err < 1.0).mean() > 0.95


def test_match_translated_images():
    img = textured_image()
    dx, dy = 7, 4
    shifted = np.roll(np.roll(img, dy, axis=0), dx, axis=1)
    cfg = matcher.CornerMatcherCfg(max_corners=256, max_matches=256)
    res = matcher.match_pair(jnp.asarray(img), jnp.asarray(shifted), cfg)
    corres = np.asarray(res["corres"])[np.asarray(res["valid"])]
    assert len(corres) > 20
    duv = corres[:, 2:4] - corres[:, 0:2]
    med = np.median(duv, axis=0)
    np.testing.assert_allclose(med, [dx, dy], atol=1.0)
    # majority consistent with the shift
    good = (np.abs(duv - [dx, dy]).max(axis=-1) < 1.5).mean()
    assert good > 0.7


def test_match_batched():
    a = textured_image(seed=1)
    b = np.roll(a, 3, axis=1)
    cfg = matcher.CornerMatcherCfg(max_corners=128, max_matches=128)
    res = matcher.match_pairs_batched(
        jnp.asarray(np.stack([a, a])), jnp.asarray(np.stack([a, b])), cfg
    )
    assert res["corres"].shape == (2, 128, 5)
    assert np.asarray(res["valid"]).sum(axis=-1).min() > 10


def test_no_matches_on_flat_images():
    flat = np.zeros((160, 160), dtype=np.float32)
    cfg = matcher.CornerMatcherCfg()
    res = matcher.match_pair(jnp.asarray(flat), jnp.asarray(flat), cfg)
    assert np.asarray(res["valid"]).sum() == 0


def test_sift_matcher_identity_and_shift():
    """SiftMatcher (reference SiftManager mutual-kNN): identical images
    match at zero displacement; a pure translation is recovered."""
    import numpy as np
    from bundlesdf_tpu.models.matcher import SiftMatcher

    rng = np.random.default_rng(0)
    img = np.zeros((120, 120), np.uint8)
    for _ in range(40):  # random blobs give SIFT something to find
        y, x = rng.integers(10, 110, 2)
        img[max(0,y-3):y+3, max(0,x-3):x+3] = rng.integers(80, 255)
    import cv2
    img = cv2.GaussianBlur(img, (5, 5), 1.0)

    m = SiftMatcher(max_matches=128)
    corres, valid = m.predict(img[None], img[None])
    assert valid[0].sum() >= 10
    c = corres[0][valid[0]]
    np.testing.assert_allclose(c[:, :2], c[:, 2:4], atol=0.5)

    shifted = np.roll(img, (7, 4), axis=(0, 1))
    corres, valid = m.predict(img[None], shifted[None])
    c = corres[0][valid[0]]
    assert len(c) >= 10
    d = c[:, 2:4] - c[:, :2]
    med = np.median(d, axis=0)
    np.testing.assert_allclose(med, [4.0, 7.0], atol=0.7)


def test_make_matcher_factory():
    """feature_corres.matcher selects the engine (reference FeatureManager
    class tree seam, Bundler.cpp:51 picks GluNet)."""
    import pytest

    from bundlesdf_tpu.config import default_track_config
    from bundlesdf_tpu.models.loftr_jax import LoftrMatcher
    from bundlesdf_tpu.tracking.corres import make_matcher

    cfg = default_track_config()
    assert make_matcher(cfg) is None  # corner = built-in jitted path

    cfg["feature_corres"]["matcher"] = "sift"
    assert isinstance(make_matcher(cfg), matcher.SiftMatcher)

    cfg["feature_corres"]["matcher"] = "loftr"
    eng = make_matcher(cfg)
    assert isinstance(eng, LoftrMatcher)
    assert eng.cfg.max_matches == int(
        cfg["feature_corres"]["max_matches_per_pair"]
    )

    cfg["feature_corres"]["matcher"] = "nope"
    with pytest.raises(ValueError):
        make_matcher(cfg)
