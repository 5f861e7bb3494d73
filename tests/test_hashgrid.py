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


def test_cell_encode_matches_exact_bitwise():
    """hash_encode_cell (corner-duplicated cell cache on dense levels, 16-wide
    row gathers) performs the exact same f32 contraction as hash_encode —
    outputs must match bitwise.  log2=15 makes the finest level hashed, so
    the dense+hashed mixed path is exercised."""
    spec = hashgrid.HashGridSpec(4, 2, 16, 128, 15)
    cspec = spec._replace(layout="cell")
    tab = hashgrid.init_table(jax.random.PRNGKey(0), spec) * 1000
    x = jax.random.uniform(jax.random.PRNGKey(1), (257, 3), minval=-1.1, maxval=1.1)

    exact = np.asarray(hashgrid.hash_encode(x, tab, spec))
    cell = np.asarray(hashgrid.hash_encode_cell(x, tab, cspec))
    np.testing.assert_array_equal(cell, exact)


def test_cell_vjp_matches_exact():
    spec = hashgrid.HashGridSpec(4, 2, 16, 128, 15)
    cspec = spec._replace(layout="cell")
    tab = hashgrid.init_table(jax.random.PRNGKey(0), spec) * 1000
    x = jax.random.uniform(jax.random.PRNGKey(1), (257, 3), minval=-1.1, maxval=1.1)

    loss_c = lambda x, t: jnp.sum(jnp.sin(hashgrid.hash_encode_cell(x, t, cspec)))
    loss_e = lambda x, t: jnp.sum(jnp.sin(hashgrid.hash_encode(x, t, spec)))
    gc = jax.grad(loss_c, argnums=(0, 1))(x, tab)
    ge = jax.grad(loss_e, argnums=(0, 1))(x, tab)
    for a, b in zip(gc, ge):
        a, b = np.asarray(a), np.asarray(b)
        scale = max(np.abs(b).max(), 1e-6)
        np.testing.assert_allclose(a, b, rtol=0, atol=scale * 1e-6)
    # clipped dims still get exactly zero coordinate grad
    out_dims = np.abs(np.asarray(x)) > 1.0
    assert np.all(np.asarray(gc[0])[out_dims] == 0.0)


def test_cell_cache_build_reduce_are_transposes():
    """_reduce_cell_cache_grad must be the exact transpose of
    _build_cell_cache: <build(t), d> == <t, reduce(d)> for random t, d."""
    spec = hashgrid.HashGridSpec(1, 2, 8, 8, 19)
    p = spec.level_params()[0]
    assert p["dense"]
    rng = np.random.default_rng(0)
    t = jnp.asarray(rng.standard_normal(p["size"] * 2).astype(np.float32))
    cache = hashgrid._build_cell_cache(t, p, 2)
    d = jnp.asarray(rng.standard_normal(cache.shape).astype(np.float32))
    lhs = float(jnp.vdot(cache, d))
    rhs = float(jnp.vdot(t, hashgrid._reduce_cell_cache_grad(d, p, 2)))
    np.testing.assert_allclose(lhs, rhs, rtol=1e-5)


def test_cell_vjp_all_levels_hashed():
    """Regression: the hashed fallback inside the cell layout must work even
    when the FIRST level is hashed (log2=10 < every level's dense size) —
    an earlier version referenced a dense-branch local there."""
    spec = hashgrid.HashGridSpec(2, 2, 32, 64, 10)
    cspec = spec._replace(layout="cell")
    assert not any(p["dense"] for p in spec.level_params())
    tab = hashgrid.init_table(jax.random.PRNGKey(0), spec) * 1000
    x = jax.random.uniform(jax.random.PRNGKey(1), (65, 3), minval=-1, maxval=1)
    gc = jax.grad(lambda x, t: jnp.sum(jnp.sin(hashgrid.hash_encode_cell(x, t, cspec))),
                  argnums=(0, 1))(x, tab)
    ge = jax.grad(lambda x, t: jnp.sum(jnp.sin(hashgrid.hash_encode(x, t, spec))),
                  argnums=(0, 1))(x, tab)
    for a, b in zip(gc, ge):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_encode_dispatch_uses_layout():
    spec = hashgrid.HashGridSpec(1, 2, 4, 4, 19, layout="cell")
    tab = jnp.array(np.random.randn(spec.total_entries * 2).astype(np.float32))
    x = jnp.array([[0.1, 0.2, 0.3]], dtype=jnp.float32)
    via_dispatch = np.asarray(hashgrid.encode(x, tab, spec))
    via_cell = np.asarray(hashgrid.hash_encode_cell(x, tab, spec))
    np.testing.assert_array_equal(via_dispatch, via_cell)


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


def test_packed_row_scatter_matches_direct():
    """The lane-packed scatter (fast-regime destination row counts,
    microbench_scatter8.py) must equal the plain row scatter, including
    heavy collisions and a non-divisible destination row count."""
    rng = np.random.default_rng(3)
    n_dest = hashgrid._FAST_SCATTER_ROWS * 2 + 3  # non-multiple of 8
    N = 8192
    upd = jnp.asarray(rng.standard_normal((N, 16)).astype(np.float32))

    cell = jnp.asarray(rng.integers(0, n_dest, N).astype(np.int32))
    direct = jnp.zeros((n_dest, 16)).at[cell].add(upd)
    packed = hashgrid._packed_row_scatter(cell, upd, n_dest)
    np.testing.assert_allclose(np.asarray(packed), np.asarray(direct),
                               rtol=1e-6, atol=1e-6)

    # heavy collisions: all updates into 17 cells
    cell_c = jnp.asarray(rng.integers(0, 17, N).astype(np.int32))
    direct_c = jnp.zeros((n_dest, 16)).at[cell_c].add(upd)
    packed_c = hashgrid._packed_row_scatter(cell_c, upd, n_dest)
    np.testing.assert_allclose(np.asarray(packed_c), np.asarray(direct_c),
                               rtol=1e-5, atol=1e-5)

    # mask-split path: packed rows still over the fast-regime limit
    n_big = hashgrid._FAST_SCATTER_ROWS * 8 * 2 + 5
    cell_b = jnp.asarray(rng.integers(0, n_big, N).astype(np.int32))
    direct_b = jnp.zeros((n_big, 16)).at[cell_b].add(upd)
    packed_b = hashgrid._packed_row_scatter(cell_b, upd, n_big)
    np.testing.assert_allclose(np.asarray(packed_b), np.asarray(direct_b),
                               rtol=1e-6, atol=1e-6)


def test_pallas_scatter_matches_xla():
    """spec.scatter="pallas" (fused multi-level VMEM scatter loop,
    ops/hashgrid_pallas.py; interpret mode on CPU) must produce the same
    table/coordinate gradients as the portable XLA row-scatter path."""
    spec = hashgrid.HashGridSpec(4, 2, 16, 128, 15, layout="cell")
    pspec = spec._replace(scatter="pallas")
    tab = hashgrid.init_table(jax.random.PRNGKey(0), spec) * 1000
    x = jax.random.uniform(jax.random.PRNGKey(1), (257, 3), minval=-1.1, maxval=1.1)

    loss_x = lambda x, t: jnp.sum(jnp.sin(hashgrid.hash_encode_cell(x, t, spec)))
    loss_p = lambda x, t: jnp.sum(jnp.sin(hashgrid.hash_encode_cell(x, t, pspec)))
    gx = jax.grad(loss_x, argnums=(0, 1))(x, tab)
    gp = jax.grad(loss_p, argnums=(0, 1))(x, tab)
    for a, b in zip(gp, gx):
        a, b = np.asarray(a), np.asarray(b)
        scale = max(np.abs(b).max(), 1e-6)
        np.testing.assert_allclose(a, b, rtol=0, atol=scale * 1e-6)


def test_resolve_scatter():
    assert hashgrid.resolve_scatter("xla") == "xla"
    assert hashgrid.resolve_scatter("pallas") == "pallas"
    # auto -> seg everywhere (portable XLA path with a cond fallback)
    assert hashgrid.resolve_scatter("auto") == "seg"
    assert hashgrid.resolve_scatter("auto", dp_devices=8) == "seg"
    # pallas cannot be GSPMD-partitioned: forced back with a warning
    import warnings

    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        assert hashgrid.resolve_scatter("pallas", dp_devices=8) == "xla"
        assert any("GSPMD" in str(x.message) for x in w)


class TestSegScatter:
    """Segment-dedup backward (scatter='seg'): same gradient as the 'xla'
    per-sample path up to f32 summation reorder; bitwise on the overflow
    cond fallback."""

    def _grad(self, spec, x, table, g, n_rays):
        import jax
        from bundlesdf_tpu.ops import hashgrid as hg

        def f(xx, t):
            return hg.encode(xx, t, spec, n_rays=n_rays)

        _, pull = jax.vjp(f, x, table)
        return pull(g)

    def test_seg_matches_xla_gradient(self):
        import jax
        import jax.numpy as jnp
        from bundlesdf_tpu.ops import hashgrid as hg

        n_rays, S = 64, 48
        rng = np.random.default_rng(0)
        o = rng.uniform(-0.2, 0.2, (n_rays, 3))
        d = rng.normal(size=(n_rays, 3))
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        t = np.sort(rng.uniform(0.1, 0.9, (n_rays, S)), axis=1)
        x = jnp.asarray((o[:, None] + d[:, None] * t[..., None])
                        .reshape(-1, 3).astype(np.float32))
        spec_x = hg.HashGridSpec(3, 2, 8, 32, 14, layout="cell", scatter="xla")
        spec_s = spec_x._replace(scatter="seg")
        table = hg.init_table(jax.random.PRNGKey(0), spec_x)
        g = jnp.asarray(rng.standard_normal((n_rays * S, spec_x.out_dim))
                        .astype(np.float32))
        dx0, dt0 = self._grad(spec_x, x, table, g, n_rays)
        dx1, dt1 = self._grad(spec_s, x, table, g, n_rays)
        np.testing.assert_array_equal(np.asarray(dx0), np.asarray(dx1))
        # seg run sums are differences of a prefix sum (_seg_compact):
        # same addend sets as the direct scatter, f32 association differs
        np.testing.assert_allclose(np.asarray(dt0), np.asarray(dt1),
                                   rtol=1e-4, atol=1e-6)
        # forward identical regardless of scatter mode
        out_x = hg.encode(x, table, spec_x, n_rays=n_rays)
        out_s = hg.encode(x, table, spec_s, n_rays=n_rays)
        np.testing.assert_array_equal(np.asarray(out_x), np.asarray(out_s))

    def test_seg_overflow_falls_back_to_direct(self):
        """Unordered samples exceed the run cap -> the cond picks the
        direct scatter; gradient must be BITWISE equal to 'xla'."""
        import jax
        import jax.numpy as jnp
        from bundlesdf_tpu.ops import hashgrid as hg

        n_rays, S = 16, 96  # random order => ~96 runs > cap at res 32
        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.uniform(-0.9, 0.9, (n_rays * S, 3))
                        .astype(np.float32))
        spec_x = hg.HashGridSpec(2, 2, 16, 32, 14, layout="cell", scatter="xla")
        spec_s = spec_x._replace(scatter="seg")
        table = hg.init_table(jax.random.PRNGKey(0), spec_x)
        g = jnp.asarray(rng.standard_normal((n_rays * S, spec_x.out_dim))
                        .astype(np.float32))
        dx0, dt0 = self._grad(spec_x, x, table, g, n_rays)
        dx1, dt1 = self._grad(spec_s, x, table, g, n_rays)
        np.testing.assert_array_equal(np.asarray(dx0), np.asarray(dx1))
        np.testing.assert_array_equal(np.asarray(dt0), np.asarray(dt1))

    def test_seg_two_stage_fwd_gather_bitwise(self, monkeypatch):
        """Force the two-stage run gather on small caches: rows must be
        BITWISE equal to the direct gather (same cache rows fetched)."""
        import jax
        import jax.numpy as jnp
        from bundlesdf_tpu.ops import hashgrid as hg

        monkeypatch.setattr(hg, "_SEG_GATHER_BYTES", 0)
        n_rays, S = 32, 48
        rng = np.random.default_rng(2)
        o = rng.uniform(-0.2, 0.2, (n_rays, 3))
        d = rng.normal(size=(n_rays, 3))
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        t = np.sort(rng.uniform(0.1, 0.9, (n_rays, S)), axis=1)
        x = jnp.asarray((o[:, None] + d[:, None] * t[..., None])
                        .reshape(-1, 3).astype(np.float32))
        spec_s = hg.HashGridSpec(3, 2, 8, 32, 14, layout="cell", scatter="seg")
        table = hg.init_table(jax.random.PRNGKey(0), spec_s)
        out_direct = hg.hash_encode_cell(x, table, spec_s._replace(scatter="xla"))
        out_seg = hg.encode(x, table, spec_s, n_rays=n_rays)
        np.testing.assert_array_equal(np.asarray(out_direct), np.asarray(out_seg))

    def test_seg_hashed_levels_match_xla(self):
        """Hashed (non-dense) levels also segment-dedup under 'seg':
        gradient matches the element-stream path up to f32 reorder."""
        import jax
        import jax.numpy as jnp
        from bundlesdf_tpu.ops import hashgrid as hg

        n_rays, S = 48, 64
        rng = np.random.default_rng(3)
        o = rng.uniform(-0.2, 0.2, (n_rays, 3))
        d = rng.normal(size=(n_rays, 3))
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        t = np.sort(rng.uniform(0.1, 0.9, (n_rays, S)), axis=1)
        x = jnp.asarray((o[:, None] + d[:, None] * t[..., None])
                        .reshape(-1, 3).astype(np.float32))
        # log2_hashmap 10 makes the upper levels HASHED (dense 48^3 > 1024)
        spec_x = hg.HashGridSpec(3, 2, 16, 48, 10, layout="cell", scatter="xla")
        spec_s = spec_x._replace(scatter="seg")
        assert not all(p["dense"] for p in spec_x.level_params())
        table = hg.init_table(jax.random.PRNGKey(0), spec_x)
        g = jnp.asarray(rng.standard_normal((n_rays * S, spec_x.out_dim))
                        .astype(np.float32))
        dx0, dt0 = self._grad(spec_x, x, table, g, n_rays)
        dx1, dt1 = self._grad(spec_s, x, table, g, n_rays)
        np.testing.assert_array_equal(np.asarray(dx0), np.asarray(dx1))
        # seg run sums are differences of a prefix sum (_seg_compact):
        # same addend sets as the direct scatter, f32 association differs
        np.testing.assert_allclose(np.asarray(dt0), np.asarray(dt1),
                                   rtol=1e-4, atol=1e-6)


class TestBf16Staging:
    """spec.big_dtype='bfloat16': big dense levels stage their corner cache
    / grad cache in bf16 with an f32 table and a one-pass conv reduce.
    Small shapes here force the threshold down via monkeypatching."""

    def _specs(self):
        spec = hashgrid.HashGridSpec(2, 2, 8, 16, 22, layout="cell")
        return spec, spec._replace(big_dtype="bfloat16")

    def test_conv_reduce_matches_padadd(self, monkeypatch):
        """The conv formulation is the same linear map as the strided
        pad-add reduce (exact in f32; one-hot weights)."""
        spec = hashgrid.HashGridSpec(1, 2, 8, 8, 22)
        p = spec.level_params()[0]
        R = p["res"]
        rng = np.random.default_rng(0)
        d_cache = jnp.asarray(
            rng.standard_normal((R ** 3, 16)).astype(np.float32))
        ref = np.asarray(hashgrid._reduce_cell_cache_grad(d_cache, p, 2))
        conv = np.asarray(hashgrid._reduce_cell_cache_grad_conv(d_cache, p, 2))
        np.testing.assert_allclose(conv, ref, rtol=0, atol=1e-5)

    def test_bf16_encode_close_to_f32(self, monkeypatch):
        monkeypatch.setattr(hashgrid, "_BIG_CACHE_CELLS", 1)
        spec, bspec = self._specs()
        tab = hashgrid.init_table(jax.random.PRNGKey(0), spec) * 1000
        x = jax.random.uniform(jax.random.PRNGKey(1), (64, 3),
                               minval=-1.0, maxval=1.0)
        f = np.asarray(hashgrid.hash_encode_cell(x, tab, spec))
        b = np.asarray(hashgrid.hash_encode_cell(x, tab, bspec))
        scale = max(np.abs(f).max(), 1e-6)
        np.testing.assert_allclose(b, f, rtol=0, atol=scale * 1.5 / 256)

    def test_bf16_grads_close_and_table_f32(self, monkeypatch):
        monkeypatch.setattr(hashgrid, "_BIG_CACHE_CELLS", 1)
        spec, bspec = self._specs()
        tab = hashgrid.init_table(jax.random.PRNGKey(0), spec) * 1000
        x = jax.random.uniform(jax.random.PRNGKey(1), (64, 3),
                               minval=-0.9, maxval=0.9)

        def loss(s):
            return lambda xx, t: jnp.sum(
                jnp.sin(hashgrid.hash_encode_cell(xx, t, s)))

        gf = jax.grad(loss(spec), argnums=(0, 1))(x, tab)
        gb = jax.grad(loss(bspec), argnums=(0, 1))(x, tab)
        assert gb[1].dtype == jnp.float32  # d_table stays f32
        for a, b in zip(gb, gf):
            a, b = np.asarray(a, np.float32), np.asarray(b, np.float32)
            scale = max(np.abs(b).max(), 1e-6)
            np.testing.assert_allclose(a, b, rtol=0, atol=scale * 2.5 / 256)

    def test_bf16_seg_rays_path(self, monkeypatch):
        monkeypatch.setattr(hashgrid, "_BIG_CACHE_CELLS", 1)
        spec, bspec = self._specs()
        bspec = bspec._replace(scatter="seg")
        spec = spec._replace(scatter="seg")
        tab = hashgrid.init_table(jax.random.PRNGKey(0), spec) * 1000
        n_rays, S = 8, 16
        # z-ordered samples along rays
        o = jax.random.uniform(jax.random.PRNGKey(2), (n_rays, 1, 3),
                               minval=-0.5, maxval=0.0)
        d = jax.random.uniform(jax.random.PRNGKey(3), (n_rays, 1, 3),
                               minval=0.0, maxval=0.05)
        x = (o + d * jnp.arange(S)[None, :, None]).reshape(-1, 3)

        def loss(s):
            return lambda t: jnp.sum(
                jnp.sin(hashgrid.hash_encode_cell_rays(x, t, s, n_rays)))

        gf = np.asarray(jax.grad(loss(spec))(tab))
        gb = np.asarray(jax.grad(loss(bspec))(tab), dtype=np.float32)
        scale = max(np.abs(gf).max(), 1e-6)
        np.testing.assert_allclose(gb, gf, rtol=0, atol=scale * 2.5 / 256)


def test_pallas_reduce_matches_conv_reduce():
    """reduce_pallas (matmul-shift plane kernel) == the conv reduce, exactly
    (both accumulate bf16-staged values in f32; CPU interpret mode)."""
    from bundlesdf_tpu.ops.reduce_pallas import reduce_cell_cache_grad_pallas

    spec = hashgrid.HashGridSpec(1, 2, 8, 8, 22)
    p = spec.level_params()[0]
    R = p["res"]
    rng = np.random.default_rng(3)
    dc = jnp.asarray(
        rng.standard_normal((R ** 3, 16)).astype(np.float32)
    ).astype(jnp.bfloat16)
    ref = np.asarray(hashgrid._reduce_cell_cache_grad_conv(dc, p, 2))
    out = np.asarray(reduce_cell_cache_grad_pallas(dc, R, 2, interpret=True))
    out = np.pad(out, (0, len(ref) - len(out)))
    np.testing.assert_allclose(out, ref, rtol=0, atol=1e-5)
