"""Multi-device sharding layer: sharded BA == single-device BA; dp/table-
sharded NOF train step executes and reduces loss.  Runs on the 8-device
virtual CPU mesh (conftest)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from bundlesdf_tpu.parallel import ba_shard, mesh as mesh_mod, nof_shard
from bundlesdf_tpu.tracking import ba as ba_mod


def _toy_ba_problem(n_frames=4, n_edges=64, seed=0):
    """Synthetic pose graph: frames observe common points; frame poses are
    perturbed from GT; BA should recover them."""
    rng = np.random.default_rng(seed)
    from scipy.spatial.transform import Rotation

    gt = [np.eye(4)]
    for i in range(1, n_frames):
        T = np.eye(4)
        T[:3, :3] = Rotation.from_euler("xyz", rng.uniform(-10, 10, 3), degrees=True).as_matrix()
        T[:3, 3] = rng.uniform(-0.05, 0.05, 3)
        gt.append(T)
    gt = np.asarray(gt, np.float32)

    pts_w = rng.uniform(-0.3, 0.3, (n_edges, 3)).astype(np.float32)
    ii = rng.integers(1, n_frames, n_edges).astype(np.int32)
    jj = (ii + rng.integers(1, n_frames, n_edges)) % n_frames
    jj = jj.astype(np.int32)
    # camera-frame observations under GT
    def to_cam(T, p):
        Ti = np.linalg.inv(T)
        return p @ Ti[:3, :3].T + Ti[:3, 3]

    pi = np.stack([to_cam(gt[a], p) for a, p in zip(ii, pts_w)])
    pj = np.stack([to_cam(gt[b], p) for b, p in zip(jj, pts_w)])

    poses0 = gt.copy()
    for i in range(1, n_frames):
        poses0[i, :3, 3] += rng.uniform(-0.01, 0.01, 3)
    fixed = np.zeros(n_frames, bool)
    fixed[0] = True
    valid = np.ones(n_edges, bool)

    # empty dense term
    h = w = 4
    xyz_ds = np.zeros((n_frames, h, w, 3), np.float32)
    nrm_ds = np.zeros((n_frames, h, w, 3), np.float32)
    ok_ds = np.zeros((n_frames, h, w), bool)
    K_ds = np.array([[10.0, 0, 2], [0, 10.0, 2], [0, 0, 1]], np.float32)
    n_pairs = 8
    pair_i = np.zeros(n_pairs, np.int32)
    pair_j = np.zeros(n_pairs, np.int32)
    pair_valid = np.zeros(n_pairs, bool)
    return dict(
        poses=poses0, fixed=fixed, ii=ii, jj=jj, pi=pi, pj=pj, valid=valid,
        pair_i=pair_i, pair_j=pair_j, pair_valid=pair_valid,
        xyz_ds=xyz_ds, nrm_ds=nrm_ds, ok_ds=ok_ds, K_ds=K_ds, gt=gt,
        n_frames=n_frames,
    )


def _run_ba(fn, p, params, n_frames):
    out, _ = fn(
        jnp.asarray(p["poses"]), jnp.asarray(p["fixed"]),
        jnp.asarray(p["ii"]), jnp.asarray(p["jj"]),
        jnp.asarray(p["pi"]), jnp.asarray(p["pj"]), jnp.asarray(p["valid"]),
        jnp.asarray(p["pair_i"]), jnp.asarray(p["pair_j"]),
        jnp.asarray(p["pair_valid"]), jnp.asarray(p["xyz_ds"]),
        jnp.asarray(p["nrm_ds"]), jnp.asarray(p["ok_ds"]), jnp.asarray(p["K_ds"]),
    )
    return np.asarray(out)


def test_sharded_ba_matches_single_device():
    p = _toy_ba_problem()
    params = ba_mod.BAParams(num_iter_outer=5, w_p2p=0.0)
    mesh = mesh_mod.make_mesh(8)

    single = lambda *a: ba_mod.bundle_adjust(*a, params, p["n_frames"])
    sharded = ba_shard.make_sharded_bundle_adjust(mesh, params, p["n_frames"])

    out_single = _run_ba(single, p, params, p["n_frames"])
    out_sharded = _run_ba(sharded, p, params, p["n_frames"])
    np.testing.assert_allclose(out_sharded, out_single, atol=1e-5)
    # and BA actually improved the poses toward GT
    err0 = np.linalg.norm(p["poses"][1:, :3, 3] - p["gt"][1:, :3, 3])
    err1 = np.linalg.norm(out_single[1 : p["n_frames"], :3, 3] - p["gt"][1:, :3, 3])
    assert err1 < err0 * 0.5


def test_dp_nof_train_step_runs_and_learns():
    import sys, os

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __graft_entry__ as g
    from bundlesdf_tpu.nof import runner as nof_runner
    import optax

    spec, rcfg, weights, params, rays, c2w, grid = g._build_nof(
        n_rand=256, n_samples=16, n_around=8, num_levels=2, finest_res=32,
        log2_hashmap=14, n_march=64, num_frames=4, occ_res=32,
    )
    st = nof_runner.TrainStatics(
        spec=spec, rcfg=rcfg, weights=weights, n_rand=256, n_step=50,
        trunc=0.02, trunc_start=0.02, trunc_decay_type="", sc_factor=1.0,
    )
    optimizer = optax.adam(1e-2, eps=1e-15)
    mesh = mesh_mod.make_mesh(8)
    step, place = nof_shard.make_dp_train_step(st, optimizer, mesh)
    opt_state = optimizer.init(params)
    params, opt_state, rays_d, grid_d, c2w_d = place(
        params, opt_state, jnp.asarray(rays), grid, jnp.asarray(c2w)
    )
    key = jax.random.PRNGKey(0)
    n_rays = jnp.asarray(rays.shape[0], jnp.int32)
    losses = []
    for i in range(30):
        params, opt_state, m = step(
            params, opt_state, i, key, rays_d, n_rays, grid_d, c2w_d
        )
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0]
    assert np.isfinite(losses).all()


def test_nof_runner_dp_devices_trains():
    """NofRunner with dp_devices>1 uses the sharded train loop end-to-end
    (the product multi-chip path, not just the standalone dp step)."""
    import sys, os
    sys.path.insert(0, os.path.join(os.path.dirname(__file__)))
    from synthetic import make_sphere_dataset
    from bundlesdf_tpu.config import default_nof_config
    from bundlesdf_tpu.nof.runner import NofRunner

    data = make_sphere_dataset(n_views=3, H=32, W=32)
    cfg = default_nof_config()
    cfg.update({"N_rand": 128, "N_samples": 16, "N_samples_around_depth": 8,
                "num_levels": 2, "finest_res": 32, "log2_hashmap_size": 14,
                "octree_smallest_voxel_size": 0.05, "octree_dilate_size": 0.05,
                "max_kf_pool": 8, "sc_factor": 1.0, "translation": [0.0]*3,
                "dp_devices": 8, "loop_chunk": 2})
    runner = NofRunner(cfg, data["images"], data["depths"], data["masks"],
                       data["poses"], data["K"], data["cloud"])
    assert runner._mesh is not None
    m0 = runner.train(4)
    m1 = runner.train(8)
    assert np.isfinite(m1["loss"])
    assert runner.global_step == 12


def test_dp_step_matches_single_device_with_optional_losses():
    """The dp step must train the SAME objective as the single-device step,
    including the optional loss terms (depth/fs-rgb/eikonal/pose-reg) — the
    dp path shares nof/runner.make_loss_fn, so a step with all optional
    weights nonzero must match numerically."""
    import sys, os

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __graft_entry__ as g
    from bundlesdf_tpu.nof import runner as nof_runner
    import optax

    spec, rcfg, weights, params, rays, c2w, grid = g._build_nof(
        n_rand=64, n_samples=8, n_around=4, num_levels=2, finest_res=32,
        log2_hashmap=12, n_march=32, num_frames=4, occ_res=16,
    )
    weights = weights._replace(
        depth_weight=0.1, fs_rgb_weight=0.2, eikonal_weight=0.05,
        pose_reg_weight=0.01,
    )
    st = nof_runner.TrainStatics(
        spec=spec, rcfg=rcfg, weights=weights, n_rand=64, n_step=50,
        trunc=0.02, trunc_start=0.02, trunc_decay_type="", sc_factor=1.0,
    )
    optimizer = optax.adam(1e-2, eps=1e-15)
    opt_state = optimizer.init(params)
    key = jax.random.PRNGKey(0)
    n_rays = jnp.asarray(rays.shape[0], jnp.int32)

    single_step, _ = nof_runner.make_train_step(st, optimizer)
    sp, so, sm = single_step(params, opt_state, 0, key, rays, n_rays, grid, c2w)

    mesh = mesh_mod.make_mesh(8)
    dp_step, place = nof_shard.make_dp_train_step(st, optimizer, mesh)
    pp, po, rays_d, grid_d, c2w_d = place(params, opt_state, rays, grid, c2w)
    dp, do, dm = dp_step(pp, po, 0, key, rays_d, n_rays, grid_d, c2w_d)

    # same optional terms present and equal
    for k in ("depth_loss", "fs_rgb_loss", "eikonal_loss", "loss"):
        assert k in dm, k
        np.testing.assert_allclose(float(sm[k]), float(dm[k]), rtol=1e-5)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-6),
        dict(sp), dict(dp),
    )
