import numpy as np
import jax
import jax.numpy as jnp
import pytest

from bundlesdf_tpu.config import default_nof_config
from bundlesdf_tpu.models import nof as nof_model
from bundlesdf_tpu.nof import losses as nof_losses
from bundlesdf_tpu.nof import render as nof_render
from bundlesdf_tpu.nof.runner import NofRunner
from bundlesdf_tpu.ops import hashgrid

from synthetic import make_sphere_dataset


def tiny_cfg():
    cfg = default_nof_config()
    cfg["N_rand"] = 512
    cfg["N_samples"] = 32
    cfg["N_samples_around_depth"] = 16
    cfg["num_levels"] = 4
    cfg["finest_res"] = 64
    cfg["log2_hashmap_size"] = 16
    cfg["octree_smallest_voxel_size"] = 0.05
    cfg["octree_dilate_size"] = 0.05
    cfg["max_kf_pool"] = 16
    cfg["n_step"] = 400
    cfg["sc_factor"] = 1.0
    cfg["translation"] = [0.0, 0.0, 0.0]
    return cfg


def small_spec(num_frames=8):
    return nof_model.NofSpec(
        grid=hashgrid.HashGridSpec(2, 2, 16, 32, 15),
        sh_degree=3,
        frame_features=2,
        num_frames=num_frames,
    )


def test_nof_forward_shapes():
    spec = small_spec()
    params = nof_model.init_nof_params(jax.random.PRNGKey(0), spec)
    pts = jnp.array(np.random.uniform(-1, 1, (16, 8, 3)).astype(np.float32))
    dirs = jnp.array(np.random.randn(16, 3).astype(np.float32))
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    fids = jnp.zeros(16, dtype=jnp.int32)
    raw, valid = nof_model.nof_forward(params, spec, pts, dirs, fids)
    assert raw.shape == (16, 8, 4)
    assert valid.shape == (16, 8)
    assert bool(valid.all())
    # positive-SDF bias at init: sdf should be near +0.1-ish mostly
    assert float(raw[..., 3].mean()) > 0.0


def test_nof_forward_invalid_outside_cube():
    spec = small_spec()
    params = nof_model.init_nof_params(jax.random.PRNGKey(0), spec)
    pts = jnp.full((2, 3, 3), 2.0)
    dirs = jnp.array([[0.0, 0, 1], [0, 0, 1]])
    raw, valid = nof_model.nof_forward(params, spec, pts, dirs, jnp.zeros(2, jnp.int32))
    assert not bool(valid.any())


def test_pose_array_frame0_identity():
    spec = small_spec()
    data = jnp.ones((8, 6))
    Ts = nof_model.pose_array_matrices(data, spec, jnp.arange(8))
    np.testing.assert_allclose(np.array(Ts[0]), np.eye(4), atol=1e-6)
    # others bounded: trans <= max_trans, rot <= max_rot
    t = np.array(Ts[1:, :3, 3])
    assert np.abs(t).max() <= spec.max_trans * np.sqrt(3) + 1e-5


def test_sdf_losses_closed_form():
    w = nof_losses.LossWeights(sc_factor=1.0, near=0.1, far=2.0)
    # single ray, 4 samples; depth = 1.0, trunc = 0.1
    z = jnp.array([[0.5, 0.95, 1.0, 1.5]])
    d = jnp.full((1, 1), 1.0)
    # perfect sdf: (d - z)/trunc within band
    trunc = 0.1
    sdf_perfect = (d - z) / trunc
    sw = jnp.ones_like(z)
    fs, sdf_l = nof_losses.sdf_losses(z, d, sdf_perfect, trunc, sw, w)
    assert float(sdf_l) < 1e-10
    # wrong sdf inside band incurs loss
    fs2, sdf_l2 = nof_losses.sdf_losses(z, d, sdf_perfect + 1.0, trunc, sw, w)
    assert float(sdf_l2) > float(sdf_l)


def test_optional_losses_closed_form():
    w = nof_losses.LossWeights(sc_factor=1.0, near=0.1, far=2.0)
    z = jnp.array([[0.5, 0.9, 1.1, 1.5]])
    d = jnp.array([1.0])
    ray_w = jnp.ones((1,))
    # sdf crosses zero between samples 1 and 2 -> z_min = z[2] = 1.1
    sdf = jnp.array([[1.0, 0.5, -0.5, -1.0]])
    dl = float(nof_losses.depth_loss(z, sdf, d, ray_w, w))
    np.testing.assert_allclose(dl, (1.1 - 1.0) ** 2, atol=1e-6)
    # no crossing -> zero
    dl0 = float(nof_losses.depth_loss(z, jnp.ones_like(sdf), d, ray_w, w))
    assert dl0 == 0.0

    # fs_rgb: logits -> sigmoid == 1 gives zero loss; big negative logits max it
    front = jnp.ones((1, 4))
    sw = jnp.ones((1, 4))
    hi = jnp.full((1, 4, 3), 20.0)
    lo = jnp.full((1, 4, 3), -20.0)
    assert float(nof_losses.fs_rgb_loss(hi, front, sw)) < 1e-6
    assert float(nof_losses.fs_rgb_loss(lo, front, sw)) > 0.9

    # eikonal: unit normals -> 0; doubled normals -> 1
    n_unit = jnp.tile(jnp.array([0.0, 0.0, 1.0]), (1, 4, 1))
    assert float(nof_losses.eikonal_loss(n_unit, sdf)) < 1e-10
    np.testing.assert_allclose(
        float(nof_losses.eikonal_loss(2 * n_unit, sdf)), 1.0, atol=1e-6
    )


def test_train_step_with_optional_losses_runs():
    """The jitted train step with depth/fs_rgb/eikonal weights on must
    produce finite losses and report their metrics."""
    import optax
    from bundlesdf_tpu.nof import runner as nof_runner

    spec = small_spec()
    rcfg = nof_render.RenderCfg(n_samples=16, n_samples_around_depth=8,
                                n_march=64, sc_factor=1.0)
    weights = nof_losses.LossWeights(
        sc_factor=1.0, depth_weight=1.0, fs_rgb_weight=0.5, eikonal_weight=0.1
    )
    params = nof_model.init_nof_params(jax.random.PRNGKey(0), spec)
    st = nof_runner.TrainStatics(
        spec=spec, rcfg=rcfg, weights=weights, n_rand=64, n_step=10,
        trunc=0.05, trunc_start=0.05, trunc_decay_type="", sc_factor=1.0,
    )
    optimizer = optax.adam(1e-3)
    opt_state = optimizer.init(params)
    step_fn, _ = nof_runner.make_train_step(st, optimizer)

    rng = np.random.default_rng(0)
    rays = np.zeros((64, nof_render.RAY_DIM), dtype=np.float32)
    rays[:, 0:2] = rng.uniform(-0.2, 0.2, (64, 2))
    rays[:, 2] = -1.0
    rays[:, 3:6] = rng.uniform(0, 1, (64, 3))
    rays[:, 6] = rng.uniform(0.8, 1.2, 64)
    rays[:, 7] = 1.0
    rays[:, 10] = 0.3
    rays[:, 11] = 1.8
    c2w = np.broadcast_to(np.eye(4, dtype=np.float32), (8, 4, 4)).copy()
    c2w[:, 2, 3] = 1.0
    grid = jnp.ones((8, 8, 8), dtype=bool)

    params2, opt2, metrics = step_fn(
        params, opt_state, 0, jax.random.PRNGKey(1), jnp.asarray(rays),
        jnp.int32(64), grid, jnp.asarray(c2w)
    )
    for k in ("depth_loss", "fs_rgb_loss", "eikonal_loss", "loss"):
        assert k in metrics, k
        assert np.isfinite(float(metrics[k])), k


def test_sdf2weights_band_and_normalization():
    cfg = nof_render.RenderCfg(sc_factor=1.0, far=2.0)
    z = jnp.linspace(0.5, 1.5, 64)[None]
    depth = jnp.array([1.0])
    w = nof_render.sdf2weights(None, z, depth, 0.05, cfg)
    w = np.array(w[0])
    np.testing.assert_allclose(w.sum(), 1.0, atol=1e-4)
    # mass concentrated near depth
    zc = np.array(z[0])
    assert abs((w * zc).sum() - 1.0) < 0.01
    assert w[np.abs(zc - 1.0) > 0.06].max() == 0.0


def test_sdf2weights_invalid_depth_zero():
    cfg = nof_render.RenderCfg(sc_factor=1.0, far=2.0)
    z = jnp.linspace(0.5, 1.5, 16)[None]
    depth = jnp.array([5.0])  # > far
    w = np.array(nof_render.sdf2weights(None, z, depth, 0.05, cfg))
    assert w.max() == 0.0


@pytest.mark.slow
def test_nof_runner_learns_sphere():
    data = make_sphere_dataset(n_views=6, H=48, W=48)
    cfg = tiny_cfg()
    runner = NofRunner(
        cfg, data["images"], data["depths"], data["masks"], data["poses"],
        data["K"], data["cloud"],
    )
    assert len(runner.rays_np) > 1000
    m0 = runner.train(10)
    loss0 = m0["loss"]
    m1 = runner.train(190)
    assert m1["loss"] < loss0
    # SDF sign structure along +x axis: negative inside, positive outside
    line = np.zeros((64, 3), dtype=np.float32)
    line[:, 0] = np.linspace(0, 0.9, 64)
    sdf = np.asarray(nof_model.nof_sdf(runner.params, runner.spec, jnp.asarray(line)))
    r = line[:, 0]
    inside = sdf[r < 0.2]
    outside_band = sdf[(r > 0.35) & (r < 0.45)]
    assert inside.mean() < outside_band.mean()
    # mesh extraction produces a sphere-ish surface
    mesh = runner.extract_mesh(voxel_size=0.04)
    assert len(mesh.vertices) > 100
    rad = np.linalg.norm(mesh.vertices, axis=-1)
    assert abs(np.median(rad) - data["radius"]) < 0.08
    # optimized poses: near-identity corrections, frame0 anchored
    poses, offset = runner.get_optimized_poses_in_real_world()
    assert poses.shape == (6, 4, 4)
    np.testing.assert_allclose(offset, np.eye(4), atol=1e-2)


def test_nof_runner_add_new_frames():
    data = make_sphere_dataset(n_views=6, H=32, W=32)
    cfg = tiny_cfg()
    cfg["N_rand"] = 128
    runner = NofRunner(
        cfg, data["images"][:4], data["depths"][:4], data["masks"][:4],
        data["poses"][:4], data["K"], data["cloud"],
    )
    runner.train(3)
    n_rays_before = len(runner.rays_np)
    runner.add_new_frames(
        data["images"][4:], data["depths"][4:], data["masks"][4:],
        data["poses"], data["cloud"],
    )
    assert runner.n_frames == 6
    assert len(runner.rays_np) > n_rays_before
    runner.train(3)  # still trains after extension


def test_nof_runner_pool_cap_continual():
    """Crossing the hard ray-pool cap during continual extension keeps the
    pool bounded and training functional."""
    data = make_sphere_dataset(n_views=6, H=32, W=32)
    cfg = tiny_cfg()
    cfg["N_rand"] = 128
    cfg["ray_pool_max_log2"] = 9  # 512-ray cap, crossed immediately
    runner = NofRunner(
        cfg, data["images"][:4], data["depths"][:4], data["masks"][:4],
        data["poses"][:4], data["K"], data["cloud"],
    )
    assert len(runner.rays_np) <= 512
    runner.train(2)
    runner.add_new_frames(
        data["images"][4:], data["depths"][4:], data["masks"][4:],
        data["poses"], data["cloud"],
    )
    assert len(runner.rays_np) <= 512
    assert runner.rays_dev.shape[0] <= 16384  # floor-capped device pool
    m = runner.train(2)
    assert np.isfinite(m["loss"])


def test_microbatched_train_step_matches_fused():
    """Gradient accumulation over ray chunks must reproduce the fused
    update exactly (losses are plain means over fixed shapes)."""
    from bundlesdf_tpu.nof.runner import NofRunner, _pick_microbatch

    data = make_sphere_dataset(n_views=4, H=32, W=32)
    cfg = tiny_cfg()
    cfg["N_rand"] = 256
    cfg["perturb"] = False  # rng-free sampling: chunked == fused exactly
    r_fused = NofRunner(cfg, data["images"], data["depths"], data["masks"],
                        data["poses"], data["K"], data["cloud"])
    cfg2 = dict(cfg)
    cfg2["micro_batch"] = 64
    r_chunk = NofRunner(cfg2, data["images"], data["depths"], data["masks"],
                        data["poses"], data["K"], data["cloud"])
    m_f = r_fused.train(3)
    m_c = r_chunk.train(3)
    np.testing.assert_allclose(m_c["loss"], m_f["loss"], rtol=2e-4)
    leaves_f = jax.tree_util.tree_leaves(r_fused.params)
    leaves_c = jax.tree_util.tree_leaves(r_chunk.params)
    for a, b in zip(leaves_f, leaves_c):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-5)


def test_pick_microbatch():
    from bundlesdf_tpu.nof.runner import _pick_microbatch

    # online budget stays fused
    assert _pick_microbatch(2048, 192, 4) == 0
    # offline budget chunks to an exact divisor
    mb = _pick_microbatch(2048, 320, 16)
    assert mb > 0 and 2048 % mb == 0
    assert mb * 320 * 16 <= 2 * 1024 * 1024
    # explicit override wins
    assert _pick_microbatch(2048, 320, 16, override=128) == 128


def test_sample_pdf_concentrates_on_high_weight_bins():
    key = jax.random.PRNGKey(0)
    bins = jnp.linspace(0.0, 1.0, 11)[None].repeat(4, 0)  # (4, 11)
    w = np.full((4, 10), 1e-4, np.float32)
    w[:, 7] = 1.0  # all mass in bin [0.7, 0.8]
    z = nof_render.sample_pdf(key, bins, jnp.asarray(w), 64)
    z = np.asarray(z)
    assert z.shape == (4, 64)
    frac = ((z > 0.65) & (z < 0.85)).mean()
    assert frac > 0.9
    # deterministic mode is sorted and reproducible
    z1 = np.asarray(nof_render.sample_pdf(key, bins, jnp.asarray(w), 16, det=True))
    z2 = np.asarray(nof_render.sample_pdf(key, bins, jnp.asarray(w), 16, det=True))
    np.testing.assert_allclose(z1, z2)


def test_train_ba_recovers_perturbed_pose():
    """train_ba (reference train_BA nerf_runner.py:932-975): a duplicated
    view whose c2w is perturbed must be pulled back by the PoseArray."""
    data = make_sphere_dataset(n_views=2, H=32, W=32)
    cfg = tiny_cfg()
    images = np.stack([data["images"][0]] * 2)
    depths = np.stack([data["depths"][0]] * 2)
    masks = np.stack([data["masks"][0]] * 2)
    poses = np.stack([data["poses"][0]] * 2)
    runner = NofRunner(cfg, images, depths, masks, poses, data["K"], data["cloud"])

    # perturb frame 1's camera pose: small rotation about z + translation
    th = np.deg2rad(3.0)
    dT = np.eye(4, dtype=np.float32)
    dT[:2, :2] = [[np.cos(th), -np.sin(th)], [np.sin(th), np.cos(th)]]
    dT[:3, 3] = [0.01, -0.008, 0.005]
    runner.c2w_np[1] = dT @ runner.c2w_np[1]

    vs, us = np.where((masks[0] > 0) & (depths[0] > 0.1) & (depths[0] < 2.0))
    sel = np.random.default_rng(0).choice(len(vs), size=min(256, len(vs)), replace=False)
    m = np.stack([us[sel], vs[sel], us[sel], vs[sel]], axis=-1).astype(np.float32)

    hist = runner.train_ba({(0, 1): m}, n_steps=150, lr=5e-3)
    assert len(hist) == 150
    assert hist[-1] < 0.5 * hist[0]
    # frame 0 stays pinned, frame 1 got a non-trivial correction
    T = np.asarray(nof_model.pose_array_matrices(
        runner.params["pose_array"], runner.spec, jnp.arange(2)))
    np.testing.assert_allclose(T[0], np.eye(4), atol=1e-6)
    assert np.abs(T[1] - np.eye(4)).max() > 1e-3


def test_denoise_rays_by_cloud_drops_outliers():
    """Octree-cloud ray denoise (reference nerf_runner.py:177-194): rays
    whose 3D point is far from the fused cloud are dropped."""
    data = make_sphere_dataset(n_views=3, H=32, W=32)
    cfg = tiny_cfg()
    cfg["denoise_depth_use_octree_cloud"] = True
    runner = NofRunner(
        cfg, data["images"], data["depths"], data["masks"], data["poses"],
        data["K"], data["cloud"],
    )
    n_clean = len(runner.rays_np)
    assert n_clean > 0

    # corrupt some depths -> phantom points far from the cloud
    depths_bad = data["depths"].copy()
    H, W = depths_bad.shape[1:3]
    sel = (data["masks"][0] > 0) & (data["depths"][0] > 0.1)
    vs, us = np.where(sel)
    depths_bad[0, vs[::3], us[::3]] += 0.3  # 30 cm outliers
    cfg2 = tiny_cfg()
    cfg2["denoise_depth_use_octree_cloud"] = True
    r_bad = NofRunner(
        cfg2, data["images"], depths_bad, data["masks"], data["poses"],
        data["K"], data["cloud"],
    )
    cfg3 = tiny_cfg()
    cfg3["denoise_depth_use_octree_cloud"] = False
    r_keep = NofRunner(
        cfg3, data["images"], depths_bad, data["masks"], data["poses"],
        data["K"], data["cloud"],
    )
    # with denoise on, corrupted rays are dropped; off keeps them
    assert len(r_bad.rays_np) < len(r_keep.rays_np)


def test_i_weights_checkpoint_cadence(tmp_path):
    """i_weights cadence (reference config.yml:37): model_latest.pth is
    written during training and restores."""
    data = make_sphere_dataset(n_views=2, H=32, W=32)
    cfg = tiny_cfg()
    cfg["N_rand"] = 128
    cfg["i_weights"] = 4
    cfg["loop_chunk"] = 2
    cfg["save_dir"] = str(tmp_path)
    runner = NofRunner(
        cfg, data["images"], data["depths"], data["masks"], data["poses"],
        data["K"], data["cloud"],
    )
    runner.train(6)
    ckpt = tmp_path / "model_latest.pth"
    assert ckpt.exists()
    step_before = runner.global_step
    runner.load_weights(str(ckpt))
    assert runner.global_step in (4, 6) and runner.global_step <= step_before


def test_ray_pool_hard_cap_subsamples():
    """Beyond ray_pool_max_log2 the pool must uniformly subsample instead
    of growing (keeps compiled shapes bounded on long videos)."""
    from bundlesdf_tpu.nof import runner as nof_runner

    class Dummy:
        pass

    self = Dummy()
    self.cfg = {"ray_pool_max_log2": 15, "ray_pool_reserve_log2": 17}
    self.rays_np = np.arange(40000 * 12, dtype=np.float32).reshape(40000, 12)
    self.c2w_np = np.broadcast_to(np.eye(4, dtype=np.float32), (4, 4, 4)).copy()
    nof_runner.NofRunner._upload_rays_impl(self)
    assert len(self.rays_np) == 32768  # capped at 2^15
    assert self.rays_dev.shape[0] == 32768  # reserve clamped to the cap
    assert int(self.n_rays) == 32768
    # subsample preserved row integrity and order
    rows = np.asarray(self.rays_np)
    assert np.all(np.diff(rows[:, 0]) > 0)
    assert np.all(rows[:, 0] % 12 == 0)


def test_kf_pool_saturation_graceful():
    """Overflowing max_kf_pool drops the excess instead of crashing."""
    data = make_sphere_dataset(n_views=6, H=32, W=32)
    cfg = tiny_cfg()
    cfg["N_rand"] = 128
    cfg["max_kf_pool"] = 5
    runner = NofRunner(
        cfg, data["images"][:4], data["depths"][:4], data["masks"][:4],
        data["poses"][:4], data["K"], data["cloud"],
    )
    runner.add_new_frames(
        data["images"][4:], data["depths"][4:], data["masks"][4:],
        data["poses"], data["cloud"],
    )
    assert runner.n_frames == 5  # one admitted, one dropped
    runner.train(2)
    # a second overflowing add is a no-op pose/occupancy refresh
    runner.add_new_frames(
        data["images"][5:], data["depths"][5:], data["masks"][5:],
        data["poses"][:5], data["cloud"],
    )
    assert runner.n_frames == 5
    m = runner.train(2)
    assert np.isfinite(m["loss"])


def test_render_rays_n_importance_branch():
    """N_importance > 0 wires sample_pdf into render_rays (reference
    nerf_runner.py:1088-1112): output sample axis grows by n_importance,
    z stays sorted, weights renormalize, and a weight-free train step over
    the same path stays finite."""
    spec = small_spec()
    for n_imp in (0, 8):
        rcfg = nof_render.RenderCfg(
            n_samples=16, n_samples_around_depth=8, n_importance=n_imp,
            n_march=64, sc_factor=1.0,
        )
        params = nof_model.init_nof_params(jax.random.PRNGKey(0), spec)
        rng = np.random.default_rng(1)
        N = 32
        rays = np.zeros((N, nof_render.RAY_DIM), dtype=np.float32)
        rays[:, 0:2] = rng.uniform(-0.2, 0.2, (N, 2))
        rays[:, 2] = -1.0
        rays[:, 3:6] = rng.uniform(0, 1, (N, 3))
        rays[:, 6] = rng.uniform(0.8, 1.2, N)
        rays[:, 7] = 1.0
        rays[:, 10] = 0.3
        rays[:, 11] = 1.8
        c2w = np.broadcast_to(np.eye(4, dtype=np.float32), (8, 4, 4)).copy()
        c2w[:, 2, 3] = 1.0
        grid = jnp.ones((8, 8, 8), dtype=bool)
        out = nof_render.render_rays(
            jax.random.PRNGKey(2), params, spec, rcfg, grid,
            jnp.asarray(rays), jnp.asarray(c2w), 0.05,
        )
        S = 16 + 8 + n_imp
        assert out["z_vals"].shape == (N, S)
        assert out["raw"].shape == (N, S, 4)
        assert out["weights"].shape == (N, S)
        assert out["pts"].shape == (N, S, 3)
        if n_imp:
            # the importance merge argsorts the union (the base path keeps
            # occ + band sample sets unsorted by design)
            z = np.asarray(out["z_vals"])
            assert (np.diff(z, axis=-1) >= -1e-5).all(), "z must stay sorted"
        w = np.asarray(out["weights"])
        assert np.isfinite(w).all()
        sums = w.sum(-1)
        assert ((sums < 1.0 + 1e-3)).all()
        if n_imp:
            rgb = np.asarray(out["rgb_map"])
            assert np.isfinite(rgb).all()


def test_full_checkpoint_resume_bitwise(tmp_path):
    """save_weights(full=True) -> from_checkpoint resumes a killed session
    exactly: the restored runner's next train chunk produces bitwise-equal
    params to the uninterrupted run (VERDICT r1 #7; reference load_weights
    nerf_runner.py:551-574 restores only weights)."""
    data = make_sphere_dataset(n_views=2, H=32, W=32)
    cfg = tiny_cfg()
    cfg["N_rand"] = 128
    cfg["loop_chunk"] = 2
    runner = NofRunner(
        cfg, data["images"], data["depths"], data["masks"], data["poses"],
        data["K"], data["cloud"],
    )
    runner.train(4)
    ckpt = str(tmp_path / "full.pth")
    runner.save_weights(ckpt, full=True)
    runner.train(4)
    want = jax.tree_util.tree_map(np.asarray, runner.params)

    restored = NofRunner.from_checkpoint(cfg, ckpt)
    assert restored.global_step == 4
    assert len(restored.rays_np) == len(runner.rays_np)
    restored.train(4)
    got = jax.tree_util.tree_map(np.asarray, restored.params)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(a, b), want, got
    )


def test_weights_only_checkpoint_rejects_resume(tmp_path):
    data = make_sphere_dataset(n_views=1, H=16, W=16)
    cfg = tiny_cfg()
    cfg["N_rand"] = 64
    runner = NofRunner(
        cfg, data["images"], data["depths"], data["masks"], data["poses"],
        data["K"], data["cloud"],
    )
    ckpt = str(tmp_path / "w.pth")
    runner.save_weights(ckpt)
    with pytest.raises(ValueError, match="weights-only"):
        NofRunner.from_checkpoint(cfg, ckpt)


def test_upload_rays_incremental_append_matches_full_upload():
    """The in-place donated append (VERDICT r4 weak #6 fix: no full-pool
    re-upload per extension round) must produce a device pool identical to
    a from-scratch full upload — including the shifted-block case where
    the append lands near the pool top."""
    import types
    import jax.numpy as jnp
    from bundlesdf_tpu.nof import render as nof_render
    from bundlesdf_tpu.nof.runner import NofRunner

    D = nof_render.RAY_DIM
    rng = np.random.default_rng(0)

    class Stub:
        _upload_rays_impl = NofRunner._upload_rays_impl
        _upload_rays = NofRunner._upload_rays
        update_c2w = NofRunner.update_c2w

    r = Stub()
    r.cfg = {"ray_pool_max_log2": 14, "ray_pool_reserve_log2": 14}
    r.c2w_np = np.eye(4, dtype=np.float32)[None]
    cap = 1 << 14

    # initial pool: most of capacity already used
    r.rays_np = rng.standard_normal((cap - 3000, D)).astype(np.float32)
    r._upload_rays()
    assert r.rays_dev.shape[0] == cap

    # append 2500 rows -> bucket 4096 > remaining headroom => shifted block
    new = rng.standard_normal((2500, D)).astype(np.float32)
    n_before = len(r.rays_np)
    r.rays_np = np.concatenate([r.rays_np, new])
    r._upload_rays(append_from=n_before)
    got = np.asarray(r.rays_dev)

    full = np.zeros((cap, D), np.float32)
    full[: len(r.rays_np)] = r.rays_np
    np.testing.assert_array_equal(got[: len(r.rays_np)], r.rays_np)
    np.testing.assert_array_equal(got, full)
    assert int(r.n_rays) == len(r.rays_np)
