import numpy as np
import jax.numpy as jnp

from bundlesdf_tpu.utils import geometry, se3


def make_K():
    return np.array([[300.0, 0, 32], [0, 300.0, 24], [0, 0, 1]], dtype=np.float32)


def test_depth_to_xyz_roundtrip():
    K = make_K()
    H, W = 48, 64
    depth = np.full((H, W), 0.8, dtype=np.float32)
    xyz = np.array(geometry.depth_to_xyz(jnp.array(depth), jnp.array(K)))
    # Center pixel should project to (0, 0, z) at the principal point
    np.testing.assert_allclose(xyz[24, 32], [0, 0, 0.8], atol=1e-5)
    # Reproject: u = fx*x/z + cx
    u = K[0, 0] * xyz[..., 0] / xyz[..., 2] + K[0, 2]
    uu = np.broadcast_to(np.arange(W, dtype=np.float32), (H, W))
    np.testing.assert_allclose(u, uu, atol=1e-3)


def test_depth_to_xyz_invalid_zeroed():
    K = make_K()
    depth = np.zeros((8, 8), dtype=np.float32)
    xyz = np.array(geometry.depth_to_xyz(jnp.array(depth), jnp.array(K)))
    assert np.all(xyz == 0)


def test_normals_flat_plane():
    K = make_K()
    H, W = 48, 64
    depth = np.full((H, W), 1.0, dtype=np.float32)
    xyz = geometry.depth_to_xyz(jnp.array(depth), jnp.array(K))
    valid = jnp.array(depth > 0)
    normals = np.array(geometry.xyz_to_normals(xyz, valid))
    # Flat fronto-parallel plane: normal should be (0,0,-1) (facing camera)
    inner = normals[2:-2, 2:-2]
    np.testing.assert_allclose(inner[..., 2], -1.0, atol=1e-3)


def test_covisibility_same_pose_is_high():
    K = make_K()
    depth = np.full((48, 64), 1.0, dtype=np.float32)
    xyz = geometry.depth_to_xyz(jnp.array(depth), jnp.array(K))
    valid = jnp.array(depth > 0)
    normals = geometry.xyz_to_normals(xyz, valid)
    valid_n = jnp.linalg.norm(normals, axis=-1) > 0.5
    eye = jnp.eye(4)
    cov = float(
        geometry.compute_covisibility(xyz, normals, valid_n, eye, eye, 70.0)
    )
    assert cov > 0.95


def test_covisibility_opposite_view_is_low():
    K = make_K()
    depth = np.full((48, 64), 1.0, dtype=np.float32)
    xyz = geometry.depth_to_xyz(jnp.array(depth), jnp.array(K))
    valid = jnp.array(depth > 0)
    normals = geometry.xyz_to_normals(xyz, valid)
    valid_n = jnp.linalg.norm(normals, axis=-1) > 0.5
    eye = jnp.eye(4)
    # Camera B looks at the plane from behind (180 deg around x at the plane)
    flip = np.eye(4, dtype=np.float32)
    flip[:3, :3] = np.diag([1.0, -1.0, -1.0])
    flip[2, 3] = 2.0  # position behind the plane
    cov = float(
        geometry.compute_covisibility(xyz, normals, valid_n, eye, jnp.array(flip), 70.0)
    )
    assert cov < 0.05


def test_ray_box_intersection():
    origins = jnp.array([[0.0, 0.0, -2.0], [5.0, 5.0, 5.0], [0.0, 0.0, 0.0]])
    dirs = jnp.array([[0.0, 0.0, 1.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]])
    tmin, tmax = geometry.ray_box_intersection(
        origins, dirs, jnp.array([-1.0, -1, -1]), jnp.array([1.0, 1, 1])
    )
    np.testing.assert_allclose(np.array(tmin), [1.0, -1.0, 0.0], atol=1e-5)
    np.testing.assert_allclose(np.array(tmax), [3.0, -1.0, 1.0], atol=1e-5)


def test_erode_dilate_mask():
    m = np.zeros((16, 16), dtype=bool)
    m[4:12, 4:12] = True
    er = np.array(geometry.erode_mask(jnp.array(m), 1))
    assert er.sum() == 6 * 6
    di = np.array(geometry.dilate_mask(jnp.array(m), 1))
    assert di.sum() == 10 * 10


def test_camera_rays_gl_convention():
    K = make_K()
    rays = np.array(geometry.camera_rays_gl(48, 64, jnp.array(K)))
    # principal point: straight ahead = (0, 0, -1)
    np.testing.assert_allclose(rays[24, 32], [0, 0, -1], atol=1e-6)
    # pixel right of center has +x; pixel below center has -y (GL y-up)
    assert rays[24, 40][0] > 0
    assert rays[30, 32][1] < 0
