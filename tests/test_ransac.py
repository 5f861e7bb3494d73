import numpy as np
import jax
import jax.numpy as jnp
from scipy.spatial.transform import Rotation

from bundlesdf_tpu.ops import ransac


def make_pair(rng, n_matches=128, n_outliers=40, ang=0.2, trans=0.01):
    R = Rotation.from_rotvec(rng.normal(size=3) * ang / np.sqrt(3)).as_matrix()
    t = rng.normal(size=3) * trans / np.sqrt(3)
    src = rng.uniform(-0.1, 0.1, size=(n_matches, 3)).astype(np.float32)
    dst = (src @ R.T + t).astype(np.float32)
    noise = rng.normal(size=(n_matches, 3)) * 1e-4
    dst += noise.astype(np.float32)
    idx = rng.permutation(n_matches)[:n_outliers]
    dst[idx] += rng.uniform(0.05, 0.2, size=(n_outliers, 3)).astype(np.float32)
    return src, dst, R.astype(np.float32), t.astype(np.float32), idx


def test_ransac_recovers_pose_single_pair():
    rng = np.random.default_rng(1)
    src, dst, R, t, out_idx = make_pair(rng)
    normals = np.zeros_like(src)
    valid = np.ones(len(src), dtype=bool)
    params = ransac.RansacParams(n_trials=512, inlier_dist=0.005,
                                 max_trans=0.05, max_rot_deg=45.0)
    res = ransac.ransac_multi_pair(
        jax.random.PRNGKey(0),
        jnp.array(src)[None], jnp.array(dst)[None],
        jnp.array(normals)[None], jnp.array(normals)[None],
        jnp.array(valid)[None], params,
    )
    assert bool(res["ok"][0])
    T = np.array(res["pose"][0])
    np.testing.assert_allclose(T[:3, :3], R, atol=2e-3)
    np.testing.assert_allclose(T[:3, 3], t, atol=2e-3)
    inl = np.array(res["inliers"][0])
    # outliers must be excluded
    assert not inl[out_idx].any()
    assert inl.sum() >= 60


def test_ransac_multi_pair_batched():
    rng = np.random.default_rng(2)
    P = 4
    srcs, dsts, Rs, ts = [], [], [], []
    for _ in range(P):
        s, d, R, t, _ = make_pair(rng)
        srcs.append(s); dsts.append(d); Rs.append(R); ts.append(t)
    normals = np.zeros((P, 128, 3), dtype=np.float32)
    valid = np.ones((P, 128), dtype=bool)
    params = ransac.RansacParams(n_trials=512, max_trans=0.05, max_rot_deg=45.0)
    res = ransac.ransac_multi_pair(
        jax.random.PRNGKey(3),
        jnp.array(np.stack(srcs)), jnp.array(np.stack(dsts)),
        jnp.array(normals), jnp.array(normals), jnp.array(valid), params,
    )
    assert bool(res["ok"].all())
    for i in range(P):
        T = np.array(res["pose"][i])
        np.testing.assert_allclose(T[:3, :3], Rs[i], atol=2e-3)
        np.testing.assert_allclose(T[:3, 3], ts[i], atol=2e-3)


def test_ransac_fails_on_garbage():
    rng = np.random.default_rng(4)
    src = rng.uniform(-0.1, 0.1, size=(64, 3)).astype(np.float32)
    dst = rng.uniform(-0.1, 0.1, size=(64, 3)).astype(np.float32)
    normals = np.zeros_like(src)
    valid = np.ones(64, dtype=bool)
    params = ransac.RansacParams(n_trials=256, min_match_after_ransac=10)
    res = ransac.ransac_multi_pair(
        jax.random.PRNGKey(5),
        jnp.array(src)[None], jnp.array(dst)[None],
        jnp.array(normals)[None], jnp.array(normals)[None],
        jnp.array(valid)[None], params,
    )
    assert not bool(res["ok"][0])
    # failed pair returns identity
    np.testing.assert_allclose(np.array(res["pose"][0]), np.eye(4), atol=1e-6)


def test_ransac_respects_validity_mask():
    rng = np.random.default_rng(6)
    src, dst, R, t, _ = make_pair(rng, n_outliers=0)
    # corrupt second half but mark invalid
    dst[64:] += 1.0
    valid = np.zeros(128, dtype=bool)
    valid[:64] = True
    normals = np.zeros_like(src)
    params = ransac.RansacParams(n_trials=512, max_trans=0.05, max_rot_deg=45.0)
    res = ransac.ransac_multi_pair(
        jax.random.PRNGKey(7),
        jnp.array(src)[None], jnp.array(dst)[None],
        jnp.array(normals)[None], jnp.array(normals)[None],
        jnp.array(valid)[None], params,
    )
    assert bool(res["ok"][0])
    inl = np.array(res["inliers"][0])
    assert not inl[64:].any()
    T = np.array(res["pose"][0])
    np.testing.assert_allclose(T[:3, :3], R, atol=2e-3)
