import numpy as np
import jax.numpy as jnp
from scipy.spatial.transform import Rotation

from bundlesdf_tpu.utils import se3


def rand_rot(n=None):
    if n is None:
        return Rotation.random(random_state=0).as_matrix().astype(np.float32)
    return Rotation.random(n, random_state=0).as_matrix().astype(np.float32)


def test_so3_exp_log_roundtrip():
    w = np.random.randn(32, 3).astype(np.float32)
    R = se3.so3_exp(jnp.array(w))
    w2 = se3.so3_log(R)
    R2 = se3.so3_exp(w2)
    np.testing.assert_allclose(np.array(R), np.array(R2), atol=1e-4)


def test_so3_exp_matches_scipy():
    w = np.random.randn(16, 3).astype(np.float32)
    R = np.array(se3.so3_exp(jnp.array(w)))
    R_ref = Rotation.from_rotvec(w).as_matrix()
    np.testing.assert_allclose(R, R_ref, atol=1e-5)


def test_so3_small_angle():
    w = np.array([[1e-9, 0, 0], [0.0, 0.0, 0.0]], dtype=np.float32)
    R = np.array(se3.so3_exp(jnp.array(w)))
    np.testing.assert_allclose(R, np.stack([np.eye(3)] * 2), atol=1e-6)


def test_so3_log_near_pi():
    axis = np.array([1.0, 2.0, -0.5])
    axis /= np.linalg.norm(axis)
    w = (axis * (np.pi - 1e-5)).astype(np.float32)[None]
    wl = np.array(se3.so3_log(jnp.array(Rotation.from_rotvec(w).as_matrix())))
    # log may return +/- of the rotvec near pi; both are valid
    err = min(np.abs(wl - w).max(), np.abs(wl + w).max())
    assert err < 1e-2


def test_se3_exp_log_roundtrip():
    xi = np.random.randn(8, 6).astype(np.float32) * 0.5
    T = se3.se3_exp(jnp.array(xi))
    xi2 = se3.se3_log(T)
    np.testing.assert_allclose(np.array(xi), np.array(xi2), atol=1e-4)


def test_inv_pose():
    xi = np.random.randn(4, 6).astype(np.float32)
    T = se3.se3_exp(jnp.array(xi))
    Ti = se3.inv_pose(T)
    eye = np.array(T @ Ti)
    np.testing.assert_allclose(eye, np.stack([np.eye(4)] * 4), atol=1e-5)


def test_kabsch_exact():
    R = rand_rot()
    t = np.array([0.1, -0.2, 0.3], dtype=np.float32)
    src = np.random.randn(50, 3).astype(np.float32)
    dst = src @ R.T + t
    T = np.array(se3.kabsch(jnp.array(src), jnp.array(dst)))
    np.testing.assert_allclose(T[:3, :3], R, atol=1e-5)
    np.testing.assert_allclose(T[:3, 3], t, atol=1e-5)


def test_kabsch_weighted_ignores_outliers():
    R = rand_rot()
    t = np.array([0.05, 0.02, -0.01], dtype=np.float32)
    src = np.random.randn(40, 3).astype(np.float32)
    dst = src @ R.T + t
    dst[:5] += 10.0  # outliers
    w = np.ones(40, dtype=np.float32)
    w[:5] = 0.0
    T = np.array(se3.kabsch(jnp.array(src), jnp.array(dst), jnp.array(w)))
    np.testing.assert_allclose(T[:3, :3], R, atol=1e-5)
    np.testing.assert_allclose(T[:3, 3], t, atol=1e-5)


def test_kabsch_batched():
    Rs = rand_rot(6)
    src = np.random.randn(6, 30, 3).astype(np.float32)
    dst = np.einsum("bij,bnj->bni", Rs, src) + 0.1
    T = np.array(se3.kabsch(jnp.array(src), jnp.array(dst)))
    np.testing.assert_allclose(T[:, :3, :3], Rs, atol=1e-4)


def test_rotation_geodesic_distance():
    R1 = np.eye(3, dtype=np.float32)
    ang = 0.7
    R2 = Rotation.from_rotvec([0, ang, 0]).as_matrix().astype(np.float32)
    d = float(se3.rotation_geodesic_distance(jnp.array(R1), jnp.array(R2)))
    assert abs(d - ang) < 1e-5


def test_rotation_distance_ignore_cam_z():
    # Pure rotation around camera z must read ~0.
    Rz = Rotation.from_rotvec([0, 0, 1.2]).as_matrix().astype(np.float32)
    d = float(
        se3.rotation_geodesic_distance_ignore_cam_z(jnp.eye(3), jnp.array(Rz))
    )
    assert d < 1e-3
    # Rotation around x keeps its angle.
    Rx = Rotation.from_rotvec([0.8, 0, 0]).as_matrix().astype(np.float32)
    d = float(
        se3.rotation_geodesic_distance_ignore_cam_z(jnp.eye(3), jnp.array(Rx))
    )
    assert abs(d - 0.8) < 1e-3


def test_transform_points():
    T = np.array(se3.se3_exp(jnp.array(np.random.randn(6).astype(np.float32))))
    pts = np.random.randn(10, 3).astype(np.float32)
    out = np.array(se3.transform_points(jnp.array(T), jnp.array(pts)))
    ref = pts @ T[:3, :3].T + T[:3, 3]
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_geodesic_numpy_twins_match_jit():
    import numpy as np
    import jax.numpy as jnp
    from scipy.spatial.transform import Rotation
    from bundlesdf_tpu.utils import se3

    rng = np.random.default_rng(7)
    for _ in range(5):
        R1 = Rotation.random(random_state=rng).as_matrix()
        R2 = Rotation.random(random_state=rng).as_matrix()
        a = float(se3.rotation_geodesic_distance(jnp.asarray(R1), jnp.asarray(R2)))
        b = se3.rotation_geodesic_distance_np(R1, R2)
        np.testing.assert_allclose(a, b, atol=1e-5)
        c = float(se3.rotation_geodesic_distance_ignore_cam_z(
            jnp.asarray(R1, dtype=jnp.float32), jnp.asarray(R2, dtype=jnp.float32)))
        d = se3.rotation_geodesic_distance_ignore_cam_z_np(R1, R2)
        np.testing.assert_allclose(c, d, atol=1e-4)
