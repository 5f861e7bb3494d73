"""Probe: pallas elementwise kernels for the cell-layout hash encode.

The XLA formulation of the trilinear forward (post-gather) and the
backward's d_rows/gdotrow/dx math measures ~7 + ~14 ms at the online
budget — far over its ~2 GB streaming floor (~2.5 ms).  One pallas kernel
per direction streams every operand exactly once.

Numerics: identical f32 contraction order to hashgrid._encode_cell_impl /
_hash_encode_cell_bwd — checked bitwise below.
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


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from bundlesdf_tpu.ops import hashgrid as hg

    spec = hg.HashGridSpec(4, 2, 16, 128, 22, layout="cell")
    C = spec.level_dim
    L = spec.num_levels
    lps = spec.level_params()
    scales = [p["scale"] for p in lps]
    N = 2048 * 192
    TILE = 1024

    key = jax.random.PRNGKey(0)
    rng = np.random.default_rng(0)
    x = jax.random.uniform(key, (N, 3), minval=-0.9, maxval=0.9)
    rows_l = [jnp.asarray(rng.standard_normal((N, 8 * C)).astype(np.float32))
              for _ in range(L)]
    g = jnp.asarray(rng.standard_normal((N, L * C)).astype(np.float32))

    CORNERS = hg._CORNERS

    # ---------------- backward elementwise kernel ----------------------
    def bwd_kernel(xs_ref, g_ref, *refs):
        rows_refs = refs[:L]
        drow_refs = refs[L:2 * L]
        dx_ref = refs[2 * L]
        x0 = xs_ref[0:1, :]  # (1, TILE)
        x1 = xs_ref[1:2, :]
        x2 = xs_ref[2:3, :]
        ax = (jnp.clip((x0 + 1.0) * 0.5, 0.0, 1.0),
              jnp.clip((x1 + 1.0) * 0.5, 0.0, 1.0),
              jnp.clip((x2 + 1.0) * 0.5, 0.0, 1.0))
        dxa = [jnp.zeros((1, TILE), jnp.float32) for _ in range(3)]
        for li in range(L):
            rows_t = rows_refs[li][:, :]  # (16, TILE) — transposed layout
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
            drow_refs[li][:, :] = jnp.concatenate(d_cols, axis=0)  # (16, TILE)
        inside0 = (jnp.abs(x0) <= 1.0).astype(jnp.float32)
        inside1 = (jnp.abs(x1) <= 1.0).astype(jnp.float32)
        inside2 = (jnp.abs(x2) <= 1.0).astype(jnp.float32)
        dx_ref[:, :] = jnp.concatenate(
            [dxa[0] * 0.5 * inside0, dxa[1] * 0.5 * inside1,
             dxa[2] * 0.5 * inside2], axis=0)

    @jax.jit
    def bwd_pallas(xs, g_t, rows_t):
        # xs (3, N); g_t (L*C, N); rows_t: L x (16, N) -> d_rows_t L x (16, N), dx (3, N)
        n_tiles = N // TILE
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
            [jax.ShapeDtypeStruct((8 * C, N), jnp.float32) for _ in range(L)]
            + [jax.ShapeDtypeStruct((3, N), jnp.float32)]
        )
        return pl.pallas_call(
            bwd_kernel,
            grid=(n_tiles,),
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shape,
            interpret=jax.default_backend() == "cpu",
        )(xs, g_t, *rows_t)

    # reference XLA formulation of the same math (no scatter/reduce)
    def bwd_xla(x, g, rows_l):
        axes = hg._axes01(x)
        gT = g.T
        dxa = [jnp.zeros_like(axes[0]) for _ in range(3)]
        d_rows_out = []
        for li, p in enumerate(lps):
            rows = rows_l[li]
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
            d_rows_out.append(jnp.stack(d_cols, axis=-1))
        inside = (jnp.abs(x) <= 1.0).astype(x.dtype)
        dx = jnp.stack(dxa, axis=-1) * 0.5 * inside
        return d_rows_out, dx

    timeit("Z0 null", jax.jit(lambda v: v + 1.0), jnp.float32(1.0))

    xs = jnp.stack(hg._axes01_raw(x) if hasattr(hg, "_axes01_raw")
                   else [x[:, 0], x[:, 1], x[:, 2]], axis=0)  # (3, N)
    g_t = g.T
    rows_t = [r.T for r in rows_l]

    out_p = bwd_pallas(xs, g_t, rows_t)
    out_x = jax.jit(bwd_xla)(x, g, rows_l)
    for li in range(L):
        np.testing.assert_array_equal(
            np.asarray(out_p[li]).T, np.asarray(out_x[0][li]),
            err_msg=f"d_rows level {li}")
    np.testing.assert_array_equal(np.asarray(out_p[L]).T, np.asarray(out_x[1]))
    print("bwd pallas bitwise-equal: OK", flush=True)

    timeit("BWD xla elementwise (incl 200MB-padded streams)",
           jax.jit(bwd_xla), x, g, rows_l)
    timeit("BWD pallas elementwise (transposed packed IO)",
           bwd_pallas, xs, g_t, rows_t)

    # What the transposes cost (they'd be needed to feed the kernel):
    timeit("T1 rows (N,16) -> (16,N) transpose x4",
           jax.jit(lambda rs: [r.T for r in rs]), rows_l)
    timeit("T2 g (N,8) -> (8,N) transpose", jax.jit(lambda g: g.T), g)

    # ---------------- forward trilinear kernel --------------------------
    def fwd_kernel(xs_ref, *refs):
        rows_refs = refs[:L]
        out_ref = refs[L]
        ax = tuple(jnp.clip((xs_ref[k:k + 1, :] + 1.0) * 0.5, 0.0, 1.0)
                   for k in range(3))
        outs = []
        for li in range(L):
            rows_t = rows_refs[li]
            fr = []
            for k in range(3):
                pos = ax[k] * scales[li] + 0.5
                fr.append(pos - jnp.floor(pos))
            acc = [None] * C
            for ci, c in enumerate(CORNERS):
                s0 = fr[0] if c[0] else 1.0 - fr[0]
                s1 = fr[1] if c[1] else 1.0 - fr[1]
                s2 = fr[2] if c[2] else 1.0 - fr[2]
                w = (s0 * s1) * s2
                for ch in range(C):
                    term = rows_t[ci * C + ch:ci * C + ch + 1, :] * w
                    acc[ch] = term if acc[ch] is None else acc[ch] + term
            outs.extend(acc)
        out_ref[:, :] = jnp.concatenate(outs, axis=0)

    @jax.jit
    def fwd_pallas(xs, rows_t):
        n_tiles = N // TILE
        in_specs = (
            [pl.BlockSpec((3, TILE), lambda i: (0, i), memory_space=pltpu.VMEM)]
            + [pl.BlockSpec((8 * C, TILE), lambda i: (0, i), memory_space=pltpu.VMEM)
               for _ in range(L)]
        )
        return pl.pallas_call(
            fwd_kernel,
            grid=(n_tiles,),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((L * C, TILE), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((L * C, N), jnp.float32),
            interpret=jax.default_backend() == "cpu",
        )(xs, *rows_t)

    def fwd_xla(x, rows_l):
        axes = hg._axes01(x)
        cols = []
        for li, p in enumerate(lps):
            rows = rows_l[li]
            _, fracs = hg._level_fracs(axes, p)
            acc = [None] * C
            for ci, c in enumerate(CORNERS):
                s0, s1, s2 = hg._corner_sels(fracs, c)
                w = (s0 * s1) * s2
                for ch in range(C):
                    term = rows[:, ci * C + ch] * w
                    acc[ch] = term if acc[ch] is None else acc[ch] + term
            cols.extend(acc)
        return jnp.stack(cols, axis=-1)

    o_p = fwd_pallas(xs, rows_t)
    o_x = jax.jit(fwd_xla)(x, rows_l)
    np.testing.assert_array_equal(np.asarray(o_p).T, np.asarray(o_x))
    print("fwd pallas bitwise-equal: OK", flush=True)
    timeit("FWD xla trilinear", jax.jit(fwd_xla), x, rows_l)
    timeit("FWD pallas trilinear", fwd_pallas, xs, rows_t)


if __name__ == "__main__":
    main()
