import numpy as np
import jax.numpy as jnp

from bundlesdf_tpu.ops import image as im_ops


def test_erode_depth_keeps_flat_kills_edges():
    depth = np.full((32, 32), 1.0, dtype=np.float32)
    depth[:, 16:] = 2.0  # huge discontinuity along a column
    out = np.array(im_ops.erode_depth(jnp.array(depth), radius=1, diff=0.001, ratio=0.3))
    # interior flat regions survive
    assert out[10, 5] == 1.0
    assert out[10, 25] == 2.0
    # boundary column killed (neighbors differ > diff ratio)
    assert out[10, 16] == 0.0 or out[10, 15] == 0.0


def test_bilateral_preserves_edges():
    depth = np.full((32, 32), 1.0, dtype=np.float32)
    depth[:, 16:] = 2.0
    out = np.array(
        im_ops.bilateral_filter_depth(jnp.array(depth), radius=2, sigma_d=2.0, sigma_r=0.01)
    )
    # with small sigma_r the edge must not blur
    assert abs(out[10, 14] - 1.0) < 1e-3
    assert abs(out[10, 18] - 2.0) < 1e-3


def test_bilateral_smooths_noise():
    rng = np.random.default_rng(0)
    depth = 1.0 + rng.normal(0, 0.002, size=(32, 32)).astype(np.float32)
    out = np.array(
        im_ops.bilateral_filter_depth(jnp.array(depth), radius=2, sigma_d=2.0, sigma_r=1e5)
    )
    assert out[8:-8, 8:-8].std() < depth[8:-8, 8:-8].std() * 0.6


def test_process_depth_frame_pipeline():
    K = np.array([[300.0, 0, 32], [0, 300.0, 24], [0, 0, 1]], dtype=np.float32)
    depth = np.full((48, 64), 0.8, dtype=np.float32)
    depth[0:4] = 0.0  # invalid band
    d, xyz, normals, valid = im_ops.process_depth_frame(jnp.array(depth), jnp.array(K))
    d = np.array(d); valid = np.array(valid)
    assert valid[20:40, 20:50].mean() > 0.9
    assert not valid[0:2].any()
    n = np.array(normals)
    # flat plane normals face camera
    assert abs(n[24, 32][2] + 1.0) < 1e-2


def test_zfar_clamp():
    K = np.array([[300.0, 0, 32], [0, 300.0, 24], [0, 0, 1]], dtype=np.float32)
    depth = np.full((48, 64), 5.0, dtype=np.float32)
    d, xyz, normals, valid = im_ops.process_depth_frame(jnp.array(depth), jnp.array(K), zfar=1.0)
    assert not np.array(valid).any()


def test_downscale():
    img = np.arange(16, dtype=np.float32).reshape(4, 4)
    out = np.array(im_ops.downscale_image(jnp.array(img), 2))
    assert out.shape == (2, 2)
    np.testing.assert_allclose(out[0, 0], img[:2, :2].mean())


def test_rgb_to_gray():
    rgb = np.zeros((4, 4, 3), dtype=np.uint8)
    rgb[..., 1] = 255
    g = np.array(im_ops.rgb_to_gray(jnp.array(rgb)))
    np.testing.assert_allclose(g, 0.587 * 255, rtol=1e-5)


def test_process_depth_frame_np_matches_jit():
    import numpy as np
    import jax.numpy as jnp
    from bundlesdf_tpu.ops import image as image_ops

    rng = np.random.default_rng(3)
    depth = rng.uniform(0.3, 0.9, (32, 40)).astype(np.float32)
    depth[rng.random((32, 40)) < 0.1] = 0.0
    K = np.array([[40.0, 0, 20], [0, 40.0, 16], [0, 0, 1]], np.float32)
    d_j, x_j, n_j, v_j = image_ops.process_depth_frame(
        jnp.asarray(depth), jnp.asarray(K), zfar=1.0,
    )
    d_n, x_n, n_n, v_n = image_ops.process_depth_frame_np(depth, K, zfar=1.0)
    np.testing.assert_allclose(np.asarray(d_j), d_n, atol=1e-5)
    np.testing.assert_allclose(np.asarray(x_j), x_n, atol=1e-5)
    np.testing.assert_allclose(np.asarray(n_j), n_n, atol=1e-4)
    np.testing.assert_array_equal(np.asarray(v_j), v_n)
