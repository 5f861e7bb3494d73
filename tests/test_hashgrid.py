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

    g = np.array(jax.grad(f)(table))
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
    table = jnp.array(np.random.randn(spec.total_entries, 2).astype(np.float32))
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
