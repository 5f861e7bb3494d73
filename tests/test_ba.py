import numpy as np
import jax.numpy as jnp
from scipy.spatial.transform import Rotation

from bundlesdf_tpu.tracking import ba
from bundlesdf_tpu.utils import se3


def make_pose_graph(n_frames=5, n_pts=200, noise=0.0, seed=0):
    """World points observed from several cam poses; returns GT poses
    (cam-in-model) and per-frame camera-space points."""
    rng = np.random.default_rng(seed)
    pts_w = rng.uniform(-0.15, 0.15, (n_pts, 3)).astype(np.float32)
    poses = []
    for k in range(n_frames):
        ang = 0.15 * k
        R = Rotation.from_rotvec([0, ang, 0.05 * k]).as_matrix()
        t = np.array([0.05 * k, 0.01 * k, 0.4])
        T_wc = np.eye(4, dtype=np.float32)  # model -> cam? build cam-in-model
        # cam-in-model: pts_model = T @ pts_cam
        T = np.eye(4, dtype=np.float32)
        T[:3, :3] = R
        T[:3, 3] = t
        poses.append(T)
    poses = np.stack(poses)
    # camera-frame observations: p_cam = T^-1 @ p_world
    cams = []
    for T in poses:
        Ti = np.linalg.inv(T)
        pc = pts_w @ Ti[:3, :3].T + Ti[:3, 3]
        pc += rng.normal(0, noise, pc.shape).astype(np.float32)
        cams.append(pc.astype(np.float32))
    return poses, np.stack(cams), pts_w


def build_sparse_edges(n_frames, cams, n_pts):
    ii, jj, pi, pj = [], [], [], []
    for i in range(n_frames):
        for j in range(i + 1, n_frames):
            ii.extend([j] * n_pts)
            jj.extend([i] * n_pts)
            pi.append(cams[j])
            pj.append(cams[i])
    return (
        np.array(ii, np.int32),
        np.array(jj, np.int32),
        np.concatenate(pi).astype(np.float32),
        np.concatenate(pj).astype(np.float32),
    )


def empty_dense(n_frames, h=8, w=8):
    return dict(
        pair_i=np.zeros(1, np.int32),
        pair_j=np.zeros(1, np.int32),
        pair_valid=np.zeros(1, bool),
        xyz_ds=np.zeros((n_frames, h, w, 3), np.float32),
        normal_ds=np.zeros((n_frames, h, w, 3), np.float32),
        valid_ds=np.zeros((n_frames, h, w), bool),
        K_ds=np.eye(3, dtype=np.float32),
    )


def run_ba(poses_init, fixed, ii, jj, pi, pj, n_frames, params=None, dense=None):
    if dense is None:
        dense = empty_dense(n_frames)
    if params is None:
        params = ba.BAParams(num_iter_outer=7, w_p2p=0.0, robust_delta=0.005)
    out, info = ba.bundle_adjust(
        jnp.asarray(poses_init), jnp.asarray(fixed),
        jnp.asarray(ii), jnp.asarray(jj), jnp.asarray(pi), jnp.asarray(pj),
        jnp.ones(len(ii), bool),
        jnp.asarray(dense["pair_i"]), jnp.asarray(dense["pair_j"]),
        jnp.asarray(dense["pair_valid"]), jnp.asarray(dense["xyz_ds"]),
        jnp.asarray(dense["normal_ds"]), jnp.asarray(dense["valid_ds"]),
        jnp.asarray(dense["K_ds"]), params, n_frames,
    )
    return np.asarray(out), info


def pose_errors(est, gt):
    terr = np.linalg.norm(est[:, :3, 3] - gt[:, :3, 3], axis=-1)
    rerr = []
    for a, b in zip(est, gt):
        rerr.append(
            float(se3.rotation_geodesic_distance(jnp.asarray(a[:3, :3]), jnp.asarray(b[:3, :3])))
        )
    return terr, np.array(rerr)


def test_ba_recovers_perturbed_poses():
    n = 5
    gt_poses, cams, _ = make_pose_graph(n)
    ii, jj, pi, pj = build_sparse_edges(n, cams, cams.shape[1])
    rng = np.random.default_rng(1)
    init = gt_poses.copy()
    for k in range(1, n):
        xi = np.concatenate([rng.normal(0, 0.01, 3), rng.normal(0, 0.02, 3)])
        init[k] = np.asarray(se3.se3_exp(jnp.asarray(xi, dtype=jnp.float32))) @ init[k]
    fixed = np.zeros(n, bool)
    fixed[0] = True
    out, info = run_ba(init, fixed, ii, jj, pi, pj, n)
    terr, rerr = pose_errors(out, gt_poses)
    assert terr.max() < 5e-4
    assert rerr.max() < 1e-3
    # chi2 decreased over outer iterations
    chi = np.asarray(info["chi2_feature"])
    assert chi[-1] < chi[0]


def test_ba_fixed_frames_do_not_move():
    n = 4
    gt_poses, cams, _ = make_pose_graph(n)
    ii, jj, pi, pj = build_sparse_edges(n, cams, cams.shape[1])
    init = gt_poses.copy()
    rng = np.random.default_rng(2)
    init[2] = np.asarray(
        se3.se3_exp(jnp.asarray(np.r_[rng.normal(0, 0.01, 3), rng.normal(0, 0.02, 3)], dtype=jnp.float32))
    ) @ init[2]
    fixed = np.array([True, True, False, True])
    out, _ = run_ba(init, fixed, ii, jj, pi, pj, n)
    for k in (0, 1, 3):
        np.testing.assert_allclose(out[k], init[k], atol=1e-6)
    terr, rerr = pose_errors(out[2:3], gt_poses[2:3])
    assert terr.max() < 5e-4


def test_ba_huber_downweights_outliers():
    n = 3
    gt_poses, cams, _ = make_pose_graph(n, n_pts=150)
    npts = cams.shape[1]
    cams_noisy = cams.copy()
    # corrupt 20% of frame-2 observations badly
    rng = np.random.default_rng(3)
    bad = rng.permutation(npts)[:30]
    cams_noisy[2, bad] += rng.uniform(0.05, 0.2, (30, 3)).astype(np.float32)
    ii, jj, pi, pj = build_sparse_edges(n, cams_noisy, npts)
    init = gt_poses.copy()
    init[2] = np.asarray(
        se3.se3_exp(jnp.asarray([0.01, -0.008, 0.012, 0.02, 0.01, -0.015], dtype=jnp.float32))
    ) @ init[2]
    fixed = np.array([True, False, False])
    out, _ = run_ba(init, fixed, ii, jj, pi, pj, n)
    terr, rerr = pose_errors(out, gt_poses)
    assert terr.max() < 3e-3
    assert rerr.max() < 6e-3


def test_ba_dense_term_aligns_planes():
    # Two frames seeing a textureless sloped plane: no sparse matches,
    # dense point-to-plane must fix a small z offset along the normal.
    n = 2
    h = w = 32
    K = np.array([[40.0, 0, 16], [0, 40.0, 16], [0, 0, 1]], dtype=np.float32)
    # plane z = 0.5 + 0.2x + 0.1y in cam frame of both frames (same pose)
    jjg, iig = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    x = (iig - K[0, 2]) / K[0, 0]
    y = (jjg - K[1, 2]) / K[1, 1]
    z = 0.5 / (1 - 0.2 * x - 0.1 * y)
    xyz = np.stack([x * z, y * z, z], -1).astype(np.float32)
    nrm = np.array([-0.2, -0.1, 1.0])
    nrm = (nrm / np.linalg.norm(nrm)).astype(np.float32)
    nrm = -nrm  # face the camera (n . p < 0)
    normals = np.broadcast_to(nrm, xyz.shape).copy()
    valid = np.ones((h, w), bool)

    gt = np.stack([np.eye(4, dtype=np.float32)] * 2)
    init = gt.copy()
    # offset frame 1 along the plane normal (observable by p2p)
    init[1][:3, 3] += 0.01 * nrm
    dense = dict(
        pair_i=np.array([1], np.int32),
        pair_j=np.array([0], np.int32),
        pair_valid=np.array([True]),
        xyz_ds=np.stack([xyz, xyz]),
        normal_ds=np.stack([normals, normals]),
        valid_ds=np.stack([valid, valid]),
        K_ds=K,
    )
    params = ba.BAParams(num_iter_outer=7, w_fm=0.0, w_p2p=1.0, dense_max_dist=0.05)
    ii = np.zeros(1, np.int32)
    jj = np.zeros(1, np.int32)
    pi = np.zeros((1, 3), np.float32)
    pj = np.zeros((1, 3), np.float32)
    out, info = ba.bundle_adjust(
        jnp.asarray(init), jnp.asarray(np.array([True, False])),
        jnp.asarray(ii), jnp.asarray(jj), jnp.asarray(pi), jnp.asarray(pj),
        jnp.zeros(1, bool),
        jnp.asarray(dense["pair_i"]), jnp.asarray(dense["pair_j"]),
        jnp.asarray(dense["pair_valid"]), jnp.asarray(dense["xyz_ds"]),
        jnp.asarray(dense["normal_ds"]), jnp.asarray(dense["valid_ds"]),
        jnp.asarray(dense["K_ds"]), params, 2,
    )
    out = np.asarray(out)
    # normal-direction offset should shrink substantially
    off0 = abs((init[1][:3, 3] - gt[1][:3, 3]) @ nrm)
    off1 = abs((out[1][:3, 3] - gt[1][:3, 3]) @ nrm)
    assert off1 < off0 * 0.2
