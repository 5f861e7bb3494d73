"""Dense-level backward alternative: element-stream scatter of the
segment-deduped compact rows straight into the flat table cotangent,
versus the shipped cache-scatter + strided reduce.

At lv3 (R=128): compact rows ~2048*cap; the cache route pays a packed
row-scatter into (R^3/8, 128) PLUS a 16-strided-pass reduce over the
134 MB cache.  The element route pays 16 x rows scatter-adds into the
(S^3*C,) 1-D destination and NO reduce.
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax
    import jax.numpy as jnp
    from bundlesdf_tpu.ops import hashgrid as hg

    C = 2
    rng = np.random.default_rng(0)

    def timeit(label, fn, *args, iters=10):
        o = fn(*args)
        float(np.asarray(jnp.sum(jax.tree_util.tree_leaves(o)[0])))
        t0 = time.perf_counter()
        for _ in range(iters):
            o = fn(*args)
        float(np.asarray(jnp.sum(jax.tree_util.tree_leaves(o)[0])))
        ms = (time.perf_counter() - t0) / iters * 1e3
        print(f"{label:54s}: {ms:9.2f} ms", flush=True)
        return ms

    for R in (64, 128):
        S = R + 1
        size = -(-S * S * S // 8) * 8
        p = dict(scale=float(R - 1), res=R, size=size, offset=0, dense=True)
        cap = hg._seg_cap(R, 192)
        m = 2048 * cap
        print(f"--- R={R} cap={cap} rows={m}", flush=True)
        cells = jnp.asarray(rng.integers(0, R * R * R, m).astype(np.int32))
        d_rows = jnp.asarray(rng.standard_normal((m, 8 * C)).astype(np.float32))

        @jax.jit
        def route_a(cell, rows):
            cache = hg._cell_cache_scatter(cell, rows, R * R * R)
            return hg._reduce_cell_cache_grad(cache, p, C)

        @jax.jit
        def route_b(cell, rows):
            # element streams: corner flat indices from the cell id
            z = cell % R
            y = (cell // R) % R
            x = cell // (R * R)
            out = jnp.zeros((size * C,), jnp.float32)
            idxs, vals = [], []
            for ci, c in enumerate(hg._CORNERS):
                corner = ((x + int(c[0])) * S + (y + int(c[1]))) * S + (
                    z + int(c[2]))
                base = corner * C
                for ch in range(C):
                    idxs.append(base + ch)
                    vals.append(rows[:, ci * C + ch])
            return out.at[jnp.concatenate(idxs)].add(
                jnp.concatenate(vals), mode="promise_in_bounds")

        a = route_a(cells, d_rows)
        b = route_b(cells, d_rows)
        err = float(jnp.max(jnp.abs(a - b)))
        print(f"maxerr A vs B: {err:.2e}", flush=True)
        timeit("A cache-scatter + strided reduce", route_a, cells, d_rows)
        timeit("B element streams into flat table grad", route_b,
               cells, d_rows)

        # B2: one fused concat scatter per corner (8 scatters of m*C)
        @jax.jit
        def route_b2(cell, rows):
            z = cell % R
            y = (cell // R) % R
            x = cell // (R * R)
            out = jnp.zeros((size * C,), jnp.float32)
            for ci, c in enumerate(hg._CORNERS):
                corner = ((x + int(c[0])) * S + (y + int(c[1]))) * S + (
                    z + int(c[2]))
                base = corner * C
                idx = jnp.concatenate([base + ch for ch in range(C)])
                val = jnp.concatenate([rows[:, ci * C + ch]
                                       for ch in range(C)])
                out = out.at[idx].add(val, mode="promise_in_bounds")
            return out
        b2 = route_b2(cells, d_rows)
        print(f"maxerr A vs B2: {float(jnp.max(jnp.abs(a - b2))):.2e}",
              flush=True)
        timeit("B2 per-corner element scatters", route_b2, cells, d_rows)


if __name__ == "__main__":
    main()
