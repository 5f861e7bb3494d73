"""Round-3 probes: encode-backward restructuring candidates at the online
budget (N = 2048 x 192 pts, 4-level cell-layout hash 2^22).

Candidates (each vs the shipped _hash_encode_cell_bwd):
  P1  residuals saved as 16 per-level (N,) column tuples (split once in the
      forward, where the trilinear math already extracts them) instead of
      the lane-padded (N, 16) rows array re-streamed 32x in the backward.
  P2  g cotangent read via natural-layout column slices (g[:, k]) instead
      of the up-front g.T relayout.
  P3  level-3 cache-grad reduce via conv_transpose (2x2x2 stencil as a
      transposed convolution) vs 16 strided-slice extracts + pad-adds.
  P4  dx-path cost: table-only VJP (stop_gradient x) as the lower bound.
  P5  lv3 scatter: mask-split into 2 chunks of 2^17 packed rows vs one
      2^18-row packed scatter.
"""
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


def main():
    import jax
    import jax.numpy as jnp

    from bundlesdf_tpu.ops import hashgrid as hg

    spec = hg.HashGridSpec(4, 2, 16, 128, 22, layout="cell")
    C = spec.level_dim
    lps = spec.level_params()
    key = jax.random.PRNGKey(0)
    table = hg.init_table(key, spec)
    N = 2048 * 192
    x = jax.random.uniform(key, (N, 3), minval=-0.8, maxval=0.8)
    rng = np.random.default_rng(0)
    g_out = jnp.asarray(rng.standard_normal((N, spec.out_dim)).astype(np.float32))

    timeit("Z0 null", jax.jit(lambda v: v + 1.0), jnp.float32(1.0))

    # ---- baseline ----
    def full_bwd(x, tab, g):
        _, pull = jax.vjp(lambda xx, t: hg.hash_encode_cell(xx, t, spec), x, tab)
        return pull(g)
    base = timeit("B0 shipped bwd both cotangents", jax.jit(full_bwd), x, table, g_out)

    def table_bwd(x, tab, g):
        _, pull = jax.vjp(
            lambda t: hg.hash_encode_cell(jax.lax.stop_gradient(x), t, spec), tab)
        return pull(g)[0]
    timeit("P4 table-only bwd (dx lower bound)", jax.jit(table_bwd), x, table, g_out)

    timeit("B0f shipped fwd", jax.jit(lambda x, t: hg.hash_encode_cell(x, t, spec)),
           x, table)

    # ---- P1+P2 variant: column-tuple residuals + natural g reads --------
    def encode_cols_impl(x, tab):
        axes = hg._axes01(x)
        views = hg._level_views(tab, spec)
        cols = []
        res_cols = []
        fr_all = []
        for p, view in zip(lps, views):
            if p["dense"]:
                cache = hg._build_cell_cache(view, p, C)
                rows, fracs, _ = hg._cell_rows(axes, cache, p, C)
            else:
                rows, fracs, _ = hg._hashed_rows(axes, view, p, C)
            rcols = tuple(rows[:, k] for k in range(8 * C))
            res_cols.append(rcols)
            fr_all.append(fracs)
            acc = [None] * C
            for ci, c in enumerate(hg._CORNERS):
                s0, s1, s2 = hg._corner_sels(fracs, c)
                w = (s0 * s1) * s2
                for ch in range(C):
                    term = rcols[ci * C + ch] * w
                    acc[ch] = term if acc[ch] is None else acc[ch] + term
            cols.extend(acc)
        return jnp.stack(cols, axis=-1), tuple(res_cols)

    import functools

    @functools.partial(jax.custom_vjp, nondiff_argnums=())
    def encode_v1(x, tab):
        return encode_cols_impl(x, tab)[0]

    def encode_v1_fwd(x, tab):
        out, res_cols = encode_cols_impl(x, tab)
        return out, (x, res_cols)

    def encode_v1_bwd(res, g):
        x, res_cols = res
        axes = hg._axes01(x)
        dxa = [jnp.zeros_like(axes[0]) for _ in range(3)]
        d_levels = {}
        for li, p in enumerate(lps):
            rcols = res_cols[li]
            g_cols = [g[:, li * C + ch] for ch in range(C)]  # natural reads
            pgs, fracs = hg._level_fracs(axes, p)
            d_cols = []
            for ci, c in enumerate(hg._CORNERS):
                s0, s1, s2 = hg._corner_sels(fracs, c)
                w = (s0 * s1) * s2
                gdotrow = None
                for ch in range(C):
                    d_cols.append(w * g_cols[ch])
                    t = g_cols[ch] * rcols[ci * C + ch]
                    gdotrow = t if gdotrow is None else gdotrow + t
                for k, others in enumerate(((s1, s2), (s0, s2), (s0, s1))):
                    term = (gdotrow * (others[0] * others[1])) * p["scale"]
                    dxa[k] = dxa[k] + term if c[k] else dxa[k] - term
            if p["dense"]:
                R = p["res"]
                cell = hg._cell_of(pgs, R)
                d_rows = jnp.stack(d_cols, axis=-1)
                d_cache = hg._cell_cache_scatter(cell, d_rows, R * R * R)
                d_levels[li] = hg._reduce_cell_cache_grad(d_cache, p, C)
            else:
                flat_idx, contrib = [], []
                for ci, c in enumerate(hg._CORNERS):
                    idx = hg._corner_index_axes(
                        pgs[0] + int(c[0]), pgs[1] + int(c[1]),
                        pgs[2] + int(c[2]), p["res"], p["size"], p["dense"])
                    base = idx.astype(jnp.int32) * C
                    for ch in range(C):
                        flat_idx.append(base + ch)
                        contrib.append(d_cols[ci * C + ch])
                d_levels[li] = (
                    jnp.zeros((p["size"] * C,), jnp.float32).at[
                        jnp.concatenate(flat_idx)
                    ].add(jnp.concatenate(contrib), mode="promise_in_bounds"))
        d_table = jnp.concatenate([d_levels[li] for li in range(len(lps))])
        inside = (jnp.abs(x) <= 1.0).astype(x.dtype)
        dx = jnp.stack(dxa, axis=-1) * 0.5 * inside
        return dx, d_table

    encode_v1.defvjp(encode_v1_fwd, encode_v1_bwd)

    # equality check on CPU-sized subset first
    o0 = hg.hash_encode_cell(x[:4096], table, spec)
    o1 = encode_v1(x[:4096], table)
    np.testing.assert_array_equal(np.asarray(o0), np.asarray(o1))

    def full_bwd_v1(x, tab, g):
        _, pull = jax.vjp(lambda xx, t: encode_v1(xx, t), x, tab)
        return pull(g)
    timeit("P1+P2 col-residuals + natural-g bwd", jax.jit(full_bwd_v1),
           x, table, g_out)
    timeit("P1 fwd (col split in fwd)", jax.jit(lambda x, t: encode_v1(x, t)),
           x, table)
    # bitwise bwd equality (subset)
    d0 = jax.jit(full_bwd)(x[:4096], table, g_out[:4096])
    d1 = jax.jit(full_bwd_v1)(x[:4096], table, g_out[:4096])
    np.testing.assert_array_equal(np.asarray(d0[0]), np.asarray(d1[0]))
    np.testing.assert_array_equal(np.asarray(d0[1]), np.asarray(d1[1]))
    print("P1+P2 bitwise-equal: OK", flush=True)

    # ---- P3: lv3 reduce as conv_transpose --------------------------------
    p3 = lps[3]
    R = p3["res"]
    S = R + 1
    d_cache3 = jnp.asarray(
        rng.standard_normal((R * R * R, 8 * C)).astype(np.float32))

    def reduce_conv(dc):
        # (R^3, 16) -> (1, R, R, R, 16); kernel maps corner-channel ci*C+ch
        # to output channel ch at spatial offset c (transposed conv = pad).
        xin = dc.reshape(1, R, R, R, 8 * C)
        k = np.zeros((2, 2, 2, 8 * C, C), np.float32)
        for ci, c in enumerate(hg._CORNERS):
            for ch in range(C):
                k[c[0], c[1], c[2], ci * C + ch, ch] = 1.0
        out = jax.lax.conv_general_dilated(
            xin, jnp.asarray(k), window_strides=(1, 1, 1),
            padding=[(1, 1), (1, 1), (1, 1)],
            dimension_numbers=("NXYZC", "XYZIO", "NXYZC"),
        )  # (1, S, S, S, C) -- corner c contributes at pos+c via full pad
        flat = out.reshape(S * S * S * C)
        return jnp.pad(flat, (0, (p3["size"] - S * S * S) * C))

    r_ref = hg._reduce_cell_cache_grad(d_cache3, p3, C)
    r_conv = reduce_conv(d_cache3)
    err = float(jnp.max(jnp.abs(r_ref - r_conv)))
    print(f"P3 conv reduce max abs err: {err:.2e}", flush=True)
    timeit("P3a lv3 reduce shipped (strided slices)",
           jax.jit(lambda d: hg._reduce_cell_cache_grad(d, p3, C)), d_cache3)
    timeit("P3b lv3 reduce conv_transpose", jax.jit(reduce_conv), d_cache3)

    # ---- P5: lv3 scatter split variants ----------------------------------
    cellmax = R * R * R
    cell3 = jnp.asarray(rng.integers(0, cellmax, N).astype(np.int32))
    d_rows3 = jnp.asarray(rng.standard_normal((N, 8 * C)).astype(np.float32))
    timeit("P5a lv3 scatter shipped (packed 2^18 rows)",
           jax.jit(lambda c, d: hg._cell_cache_scatter(c, d, cellmax)),
           cell3, d_rows3)

    def scatter_split2(cell, d_rows):
        Ncap = cellmax
        P = 8
        rows = -(-Ncap // P)
        row = cell // P
        blk = cell % P
        F = d_rows.shape[1]
        colsx = jnp.arange(P * F, dtype=cell.dtype)[None, :] // F
        upd = jnp.where(colsx == blk[:, None], jnp.tile(d_rows, (1, P)), 0.0)
        half = rows // 2
        parts = []
        for s in range(2):
            lo = s * half
            hi = rows if s == 1 else half
            sel = (row >= lo) & (row < hi)
            r = jnp.where(sel, row - lo, 0)
            u = jnp.where(sel[:, None], upd, 0.0)
            parts.append(jnp.zeros((hi - lo, P * F), jnp.float32).at[r].add(
                u, mode="promise_in_bounds"))
        packed = jnp.concatenate(parts, axis=0)
        return packed.reshape(rows * P, F)[:Ncap]
    s_ref = hg._cell_cache_scatter(cell3, d_rows3, cellmax)
    s_2 = scatter_split2(cell3, d_rows3)
    np.testing.assert_array_equal(np.asarray(s_ref[:1000]), np.asarray(s_2[:1000]))
    timeit("P5b lv3 scatter split-2 (2 x 2^17 rows)",
           jax.jit(scatter_split2), cell3, d_rows3)


if __name__ == "__main__":
    main()
