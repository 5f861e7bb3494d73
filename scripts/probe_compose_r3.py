"""Round-3 composition probes: the full encode VJP (gathers + elementwise
+ scatters + reduces) with restructured stages, at the online budget.

The elementwise stages measure ~1 ms in isolation but the full VJP carries
a ~14 ms dx-path delta (C4 - P4, scripts/bisect_step.py) — an XLA
composition pathology.  Candidates:
  V1  pallas elementwise kernel for the bwd math (forces a fusion island:
      rows/g stream exactly once; scatter/reduce stay XLA)
  V2  V1 + conv_transpose lv3 cache-grad reduce (kernel flipped correctly)
  V3  shipped elementwise + conv lv3 reduce only
  V4  pallas fwd trilinear in the fwd (residual-producing) pass
"""
import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def timeit(label, fn, *args, iters=5):
    import jax
    import jax.numpy as jnp

    out = fn(*args)
    float(np.asarray(jnp.sum(jax.tree_util.tree_leaves(out)[0])))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(np.asarray(jnp.sum(jax.tree_util.tree_leaves(out)[0])))
    ms = (time.perf_counter() - t0) / iters * 1e3
    print(f"{label:58s}: {ms:9.2f} ms", flush=True)
    return ms


def build(spec):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from bundlesdf_tpu.ops import hashgrid as hg

    C = spec.level_dim
    L = spec.num_levels
    lps = spec.level_params()
    scales = [p["scale"] for p in lps]
    CORNERS = hg._CORNERS
    TILE = 1024

    # ---------- pallas elementwise bwd (d_rows + dx) ----------
    def bwd_kernel(xs_ref, g_ref, *refs):
        rows_refs = refs[:L]
        drow_refs = refs[L:2 * L]
        dx_ref = refs[2 * L]
        ax = tuple(jnp.clip((xs_ref[k:k + 1, :] + 1.0) * 0.5, 0.0, 1.0)
                   for k in range(3))
        dxa = [jnp.zeros((1, TILE), jnp.float32) for _ in range(3)]
        for li in range(L):
            rows_t = rows_refs[li][:, :]
            g_cols = [g_ref[li * C + ch:li * C + ch + 1, :] for ch in range(C)]
            fr = []
            for k in range(3):
                pos = ax[k] * scales[li] + 0.5
                fr.append(pos - jnp.floor(pos))
            d_cols = []
            for ci, c in enumerate(CORNERS):
                s0 = fr[0] if c[0] else 1.0 - fr[0]
                s1 = fr[1] if c[1] else 1.0 - fr[1]
                s2 = fr[2] if c[2] else 1.0 - fr[2]
                w = (s0 * s1) * s2
                gdotrow = None
                for ch in range(C):
                    d_cols.append(w * g_cols[ch])
                    t = g_cols[ch] * rows_t[ci * C + ch:ci * C + ch + 1, :]
                    gdotrow = t if gdotrow is None else gdotrow + t
                for k, others in enumerate(((s1, s2), (s0, s2), (s0, s1))):
                    term = (gdotrow * (others[0] * others[1])) * scales[li]
                    dxa[k] = dxa[k] + term if c[k] else dxa[k] - term
            drow_refs[li][:, :] = jnp.concatenate(d_cols, axis=0)
        insides = [(jnp.abs(xs_ref[k:k + 1, :]) <= 1.0).astype(jnp.float32)
                   for k in range(3)]
        dx_ref[:, :] = jnp.concatenate(
            [dxa[k] * 0.5 * insides[k] for k in range(3)], axis=0)

    def bwd_elemwise_pallas(xs, g_t, rows_t, n):
        import jax
        n_tiles = n // TILE
        in_specs = (
            [pl.BlockSpec((3, TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
             pl.BlockSpec((L * C, TILE), lambda i: (0, i), memory_space=pltpu.VMEM)]
            + [pl.BlockSpec((8 * C, TILE), lambda i: (0, i), memory_space=pltpu.VMEM)
               for _ in range(L)]
        )
        out_specs = (
            [pl.BlockSpec((8 * C, TILE), lambda i: (0, i), memory_space=pltpu.VMEM)
             for _ in range(L)]
            + [pl.BlockSpec((3, TILE), lambda i: (0, i), memory_space=pltpu.VMEM)]
        )
        out_shape = (
            [jax.ShapeDtypeStruct((8 * C, n), jnp.float32) for _ in range(L)]
            + [jax.ShapeDtypeStruct((3, n), jnp.float32)]
        )
        return pl.pallas_call(
            bwd_kernel, grid=(n_tiles,), in_specs=in_specs,
            out_specs=out_specs, out_shape=out_shape,
            interpret=jax.default_backend() == "cpu",
        )(xs, g_t, *rows_t)

    # ---------- conv lv3 reduce ----------
    def reduce_conv(dc, p):
        R = p["res"]
        S = R + 1
        xin = dc.reshape(1, R, R, R, 8 * C)
        k = np.zeros((2, 2, 2, 8 * C, C), np.float32)
        for ci, c in enumerate(CORNERS):
            for ch in range(C):
                k[1 - c[0], 1 - c[1], 1 - c[2], ci * C + ch, ch] = 1.0
        out = jax.lax.conv_general_dilated(
            xin, jnp.asarray(k), window_strides=(1, 1, 1),
            padding=[(1, 1), (1, 1), (1, 1)],
            dimension_numbers=("NXYZC", "XYZIO", "NXYZC"),
        )
        flat = out.reshape(S * S * S * C)
        if S * S * S < p["size"]:
            flat = jnp.pad(flat, (0, (p["size"] - S * S * S) * C))
        return flat

    # ---------- full custom VJPs ----------
    def make_encode(use_pallas_bwd: bool, conv_reduce_min_res: int):
        @functools.partial(jax.custom_vjp)
        def enc(x, table):
            return hg._encode_cell_impl(x, table, spec)[0]

        def enc_fwd(x, table):
            out, rows_all = hg._encode_cell_impl(x, table, spec)
            return out, (x, rows_all)

        def enc_bwd(res, g):
            x, rows_all = res
            n = x.shape[0]
            axes = hg._axes01(x)
            if use_pallas_bwd:
                xs = jnp.stack([x[:, 0], x[:, 1], x[:, 2]], axis=0)
                outs = bwd_elemwise_pallas(
                    xs, g.T, [r.T for r in rows_all], n)
                d_rows_l = [o.T for o in outs[:L]]
                dx = outs[L].T
            else:
                gT = g.T
                dxa = [jnp.zeros_like(axes[0]) for _ in range(3)]
                d_rows_l = []
                for li, p in enumerate(lps):
                    rows = rows_all[li]
                    g_cols = [gT[li * C + ch] for ch in range(C)]
                    _, fracs = hg._level_fracs(axes, p)
                    d_cols = []
                    for ci, c in enumerate(CORNERS):
                        s0, s1, s2 = hg._corner_sels(fracs, c)
                        w = (s0 * s1) * s2
                        gdotrow = None
                        for ch in range(C):
                            d_cols.append(w * g_cols[ch])
                            t = g_cols[ch] * rows[:, ci * C + ch]
                            gdotrow = t if gdotrow is None else gdotrow + t
                        for k, others in enumerate(((s1, s2), (s0, s2), (s0, s1))):
                            term = (gdotrow * (others[0] * others[1])) * p["scale"]
                            dxa[k] = dxa[k] + term if c[k] else dxa[k] - term
                    d_rows_l.append(jnp.stack(d_cols, axis=-1))
                inside = (jnp.abs(x) <= 1.0).astype(x.dtype)
                dx = jnp.stack(dxa, axis=-1) * 0.5 * inside
            # scatter + reduce per level (dense only at this budget)
            d_levels = {}
            for li, p in enumerate(lps):
                R = p["res"]
                pgs, _ = hg._level_fracs(axes, p)
                cell = hg._cell_of(pgs, R)
                d_cache = hg._cell_cache_scatter(cell, d_rows_l[li], R * R * R)
                if R >= conv_reduce_min_res:
                    d_levels[li] = reduce_conv(d_cache, p)
                else:
                    d_levels[li] = hg._reduce_cell_cache_grad(d_cache, p, C)
            d_table = jnp.concatenate([d_levels[li] for li in range(L)])
            return dx, d_table

        enc.defvjp(enc_fwd, enc_bwd)
        return enc

    return make_encode


def main():
    import jax
    import jax.numpy as jnp

    from bundlesdf_tpu.ops import hashgrid as hg

    spec = hg.HashGridSpec(4, 2, 16, 128, 22, layout="cell")
    make_encode = build(spec)
    N = 2048 * 192
    key = jax.random.PRNGKey(0)
    rng = np.random.default_rng(0)
    x = jax.random.uniform(key, (N, 3), minval=-0.9, maxval=0.9)
    table = hg.init_table(key, spec)
    g_out = jnp.asarray(rng.standard_normal((N, spec.out_dim)).astype(np.float32))

    timeit("Z0 null", jax.jit(lambda v: v + 1.0), jnp.float32(1.0))

    def full_bwd(enc):
        def f(x, tab, g):
            _, pull = jax.vjp(lambda xx, t: enc(xx, t), x, tab)
            return pull(g)
        return jax.jit(f)

    v0 = full_bwd(lambda x, t: hg.hash_encode_cell(x, t, spec))
    base = timeit("V0 shipped full bwd", v0, x, table, g_out)

    encs = {
        "V1 pallas elemwise + xla scatter/reduce": make_encode(True, 10**9),
        "V2 pallas elemwise + conv reduce (res>=96)": make_encode(True, 96),
        "V3 xla elemwise + conv reduce (res>=96)": make_encode(False, 96),
    }
    d0 = v0(x[:4096], table, g_out[:4096])
    for name, enc in encs.items():
        f = full_bwd(enc)
        d1 = f(x[:4096], table, g_out[:4096])
        conv = "conv" in name
        if conv:
            np.testing.assert_allclose(
                np.asarray(d0[1]), np.asarray(d1[1]), rtol=2e-5, atol=1e-12)
        else:
            np.testing.assert_array_equal(np.asarray(d0[1]), np.asarray(d1[1]))
        np.testing.assert_array_equal(np.asarray(d0[0]), np.asarray(d1[0]))
        timeit(name, f, x, table, g_out)


if __name__ == "__main__":
    main()
