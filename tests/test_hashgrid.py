import numpy as np
import jax
import jax.numpy as jnp

from bundlesdf_tpu.ops import hashgrid, sh


def small_spec():
    return hashgrid.HashGridSpec(
        num_levels=4, level_dim=2, base_res=16, finest_res=128, log2_hashmap_size=19
    )


def test_spec_geometry():
    spec = small_spec()
    assert spec.out_dim == 8
    lp = spec.level_params()
    assert len(lp) == 4
    assert lp[0]["res"] == 16
    # finest level resolution ~= finest_res
    assert abs(lp[-1]["res"] - 128) <= 1
    # coarse levels are dense
    assert lp[0]["dense"]


def test_encode_shapes_and_determinism():
    spec = small_spec()
    table = hashgrid.init_table(jax.random.PRNGKey(0), spec)
    x = jnp.array(np.random.uniform(-1, 1, (64, 3)).astype(np.float32))
    out1 = hashgrid.hash_encode(x, table, spec)
    out2 = hashgrid.hash_encode(x, table, spec)
    assert out1.shape == (64, 8)
    np.testing.assert_array_equal(np.array(out1), np.array(out2))


def test_encode_continuity():
    # Trilinear interpolation: nearby points give nearby features.
    spec = small_spec()
    table = hashgrid.init_table(jax.random.PRNGKey(1), spec)
    x = jnp.array([[0.1, 0.2, 0.3]], dtype=jnp.float32)
    eps = 1e-5
    x2 = x + eps
    f1 = np.array(hashgrid.hash_encode(x, table, spec))
    f2 = np.array(hashgrid.hash_encode(x2, table, spec))
    assert np.abs(f1 - f2).max() < 1e-5


def test_encode_gradient_scatter():
    # Gradient w.r.t. the table is a sparse scatter-add: only the touched
    # corners receive gradient, and weights sum to 1 per level.
    spec = small_spec()
    table = hashgrid.init_table(jax.random.PRNGKey(2), spec)
    x = jnp.array([[0.05, -0.33, 0.71]], dtype=jnp.float32)

    def f(tbl):
        return hashgrid.hash_encode(x, tbl, spec).sum()

    g = np.array(jax.grad(f)(table)).reshape(-1, spec.level_dim)  # flat table
    nz_rows = np.unique(np.nonzero(g)[0])
    # at most 8 corners per level touched
    assert 0 < len(nz_rows) <= 8 * spec.num_levels
    # per level, the trilinear weights sum to 1 per channel
    lp = spec.level_params()
    for p in lp:
        seg = g[p["offset"] : p["offset"] + p["size"]]
        np.testing.assert_allclose(seg.sum(axis=0), [1.0, 1.0], atol=1e-5)


def test_dense_level_distinct_cells():
    # On a dense level, different cells hit different rows.
    spec = hashgrid.HashGridSpec(1, 2, 4, 4, 19)
    table = jnp.array(np.random.randn(spec.total_entries * 2).astype(np.float32))
    a = hashgrid.hash_encode(jnp.array([[-0.9, -0.9, -0.9]]), table, spec)
    b = hashgrid.hash_encode(jnp.array([[0.9, 0.9, 0.9]]), table, spec)
    assert np.abs(np.array(a) - np.array(b)).max() > 1e-6


def test_sh_encode_dims_and_values():
    dirs = jnp.array([[0.0, 0.0, 1.0], [1.0, 0.0, 0.0]])
    out = np.array(sh.sh_encode(dirs, 3))
    assert out.shape == (2, 9)
    np.testing.assert_allclose(out[:, 0], 0.28209479, atol=1e-6)
    # z-dir: Y_1^0 term = C1 * z
    np.testing.assert_allclose(out[0, 2], 0.4886025, atol=1e-6)
    np.testing.assert_allclose(out[1, 2], 0.0, atol=1e-6)


def test_sh_degree4():
    dirs = jnp.array(np.random.randn(5, 3).astype(np.float32))
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    out = sh.sh_encode(dirs, 4)
    assert out.shape == (5, 16)


def test_custom_vjp_matches_autodiff():
    """hash_encode's flat-scatter custom VJP (TPU lane-padding fix) must
    match plain autodiff of the forward impl for both cotangents."""
    import jax

    spec = hashgrid.HashGridSpec(4, 2, 16, 128, 15)
    key = jax.random.PRNGKey(0)
    tab = hashgrid.init_table(key, spec) * 1000
    x = jax.random.uniform(jax.random.PRNGKey(1), (257, 3), minval=-1.1, maxval=1.1)

    f_custom = lambda x, t: hashgrid.hash_encode(x, t, spec)
    f_ref = lambda x, t: hashgrid._encode_impl(x, t, spec)
    np.testing.assert_allclose(f_custom(x, tab), f_ref(x, tab), rtol=1e-6)

    gc = jax.grad(lambda x, t: jnp.sum(jnp.sin(f_custom(x, t))), argnums=(0, 1))(x, tab)
    gr = jax.grad(lambda x, t: jnp.sum(jnp.sin(f_ref(x, t))), argnums=(0, 1))(x, tab)
    np.testing.assert_allclose(gc[0], gr[0], rtol=2e-4, atol=2e-6)
    np.testing.assert_allclose(gc[1], gr[1], rtol=2e-4, atol=2e-6)
    # out-of-range coordinates: zero grad on the clipped dims
    out_dims = np.abs(np.asarray(x)) > 1.0
    assert np.all(np.asarray(gc[0])[out_dims] == 0.0)
