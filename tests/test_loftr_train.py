"""LoFTR training harness tests (reference vendored trainer,
BundleTrack/LoFTR/train.py + src/losses/loftr_loss.py, SURVEY.md §2.4)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from bundlesdf_tpu.models.loftr_jax import LoftrCfg, LoftrMatcher, LoftrModule
from bundlesdf_tpu.models import loftr_train as lt


TINY = LoftrCfg(initial_dim=16, block_dims=(16, 24, 32), d_coarse=32,
                d_fine=16, nhead=4, coarse_pairs=1, fine_pairs=1,
                max_matches=64)


def test_homography_batch_gt_consistency():
    """GT cells must agree with the actual warp."""
    key = jax.random.PRNGKey(0)
    b = lt.make_batch(key, 2, 64, 64, max_gt=32)
    assert b.img0.shape == (2, 64, 64, 1)
    Wc = 8
    # warped point must land inside its GT coarse cell (by construction)
    for n in range(2):
        pm = np.asarray(b.pos_mask[n])
        jx = np.asarray(b.j_ids[n]) % Wc
        jy = np.asarray(b.j_ids[n]) // Wc
        px = np.asarray(b.pts1[n, :, 0]) / 8.0
        py = np.asarray(b.pts1[n, :, 1]) / 8.0
        ok = (np.floor(px)[pm] == jx[pm]) & (np.floor(py)[pm] == jy[pm])
        assert ok.mean() > 0.99


def test_coarse_focal_loss_prefers_gt():
    """Loss must be lower when confidence mass sits on the GT cells."""
    B, L, S = 1, 16, 16
    i_ids = jnp.arange(8)[None]
    j_ids = (jnp.arange(8)[::-1])[None]
    pos = jnp.ones((1, 8), bool)
    good = jnp.full((B, L, S), 0.01)
    good = good.at[0, i_ids[0], j_ids[0]].set(0.9)
    bad = jnp.full((B, L, S), 0.01)
    bad = bad.at[0, i_ids[0], (j_ids[0] + 3) % S].set(0.9)
    lg = lt.coarse_focal_loss(good, i_ids, j_ids, pos)
    lb = lt.coarse_focal_loss(bad, i_ids, j_ids, pos)
    assert float(lg) < float(lb)


@pytest.mark.slow
def test_train_loftr_loss_decreases_and_params_load_in_matcher():
    tcfg = lt.TrainCfg(H=64, W=64, batch=2, max_gt=32, lr=3e-4, warmup=5)
    params, hist = lt.train_loftr(TINY, tcfg, n_steps=30, log_every=29)
    assert hist[-1]["loss"] < hist[0]["loss"]
    # trained params drop straight into the inference matcher
    m = LoftrMatcher(TINY, params=params)
    rng = np.random.default_rng(0)
    img = (rng.uniform(0, 255, (1, 64, 64)) * np.ones((1, 1, 1))).astype(np.uint8)
    corres, valid = m.predict(img, img)
    assert corres.shape[0] == 1 and corres.shape[-1] == 5


def test_train_step_dp_sharded_runs():
    """Data-parallel step over the 8-device CPU mesh (DDP equivalent)."""
    import optax
    from jax.sharding import Mesh

    devs = np.array(jax.devices()[:8])
    mesh = Mesh(devs, ("dp",))
    module = LoftrModule(TINY)
    tcfg = lt.TrainCfg(H=64, W=64, batch=8, max_gt=32)
    key = jax.random.PRNGKey(0)
    params = module.init(key, jnp.zeros((1, 64, 64, 1)), jnp.zeros((1, 64, 64, 1)))
    opt = optax.adam(1e-4)
    st = opt.init(params)
    step = lt.make_train_step(module, tcfg, opt, mesh)
    with mesh:
        params, st, metrics = step(params, st, key, 0)
    assert np.isfinite(float(metrics["loss"]))


def test_depth_view_pool_and_gt_warp_consistency():
    """Depth+pose supervision (VERDICT r4 #3): the GT warp must be
    photometrically consistent — a positive cell center's warped position
    must see (nearly) the same texture value in the other view, and the
    z-test must reject self-occluded points."""
    import jax
    from bundlesdf_tpu.models.loftr_train import (
        build_depth_view_pool, make_depth_batch)

    pool = build_depth_view_pool(n_objects=2, views_per=3, H=96, W=96, seed=3)
    assert pool.imgs.shape == (6, 96, 96)
    assert np.isfinite(np.asarray(pool.depths)).all()
    batch = make_depth_batch(jax.random.PRNGKey(0), pool, 4, 96, 96, 64)
    assert batch.img0.shape == (4, 96, 96, 1)
    pos = np.asarray(batch.pos_mask)
    assert pos.sum() > 40, pos.sum()   # real positives found
    # photometric consistency at positives (before jitter the views share
    # object-space texture; jitter is bounded => tolerance 0.35)
    img0 = np.asarray(batch.img0)[..., 0]
    img1 = np.asarray(batch.img1)[..., 0]
    i_ids = np.asarray(batch.i_ids)
    pts1 = np.asarray(batch.pts1)
    Wc = 96 // 8
    errs = []
    for b in range(4):
        for k in range(i_ids.shape[1]):
            if not pos[b, k]:
                continue
            cy = (i_ids[b, k] // Wc) * 8 + 4
            cx = (i_ids[b, k] % Wc) * 8 + 4
            px, py = pts1[b, k]
            v0 = img0[b, cy, cx]
            v1 = img1[b, int(round(py)), int(round(px))]
            if v0 > 0.05 and v1 > 0.05:   # both on-object
                errs.append(abs(float(v0) - float(v1)))
    errs = np.asarray(errs)
    assert len(errs) > 30
    # median photometric error small; jitter gain/bias bounds the tail
    assert np.median(errs) < 0.2, np.median(errs)
