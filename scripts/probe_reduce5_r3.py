"""Reduce pass-halving: pair-block extracts.

RA  shipped: 16 single-column strided extracts (16 full passes)
RF  8 contiguous (R^3, 2) corner-block extracts, pad-add in 4-D with a
    2-wide channel tail, final reshape to interleaved flat
RG  no extraction: 4-D slice formulation (XLA decides the loop)
RH  8 pair extracts but channel-split AFTER extraction (strided within
    the narrow 2-col buffer is cheap), keeping the shipped 3-D pad-adds
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

    R = int(os.environ.get("R", "128"))
    C = 2
    S = R + 1
    F = 8 * C
    size = -(-S * S * S // 8) * 8
    p = dict(scale=float(R - 1), res=R, size=size, offset=0, dense=True)
    rng = np.random.default_rng(0)
    d_cache = jnp.asarray(
        rng.standard_normal((R * R * R, F)).astype(np.float32))

    def timeit(label, fn, *args, iters=10):
        o = fn(*args)
        float(np.asarray(jnp.sum(jax.tree_util.tree_leaves(o)[0])))
        t0 = time.perf_counter()
        for _ in range(iters):
            o = fn(*args)
        float(np.asarray(jnp.sum(jax.tree_util.tree_leaves(o)[0])))
        ms = (time.perf_counter() - t0) / iters * 1e3
        print(f"{label:50s}: {ms:9.2f} ms", flush=True)
        return ms

    ra_fn = jax.jit(lambda d: hg._reduce_cell_cache_grad(d, p, C))
    ra = ra_fn(d_cache)
    timeit("RA shipped", ra_fn, d_cache)

    @jax.jit
    def rf(d):
        d4 = d.reshape(R, R, R, F)
        out = None
        for ci, c in enumerate(hg._CORNERS):
            blk = d4[:, :, :, ci * C:(ci + 1) * C]       # contiguous pair
            padded = jnp.pad(
                blk, ((int(c[0]), 1 - int(c[0])),
                      (int(c[1]), 1 - int(c[1])),
                      (int(c[2]), 1 - int(c[2])), (0, 0)))
            out = padded if out is None else out + padded
        flat = out.reshape(-1)
        return jnp.pad(flat, (0, size * C - S * S * S * C))
    v = rf(d_cache)
    print("RF == RA:", bool(jnp.array_equal(ra, v)),
          "maxerr", float(jnp.max(jnp.abs(ra - v))), flush=True)
    timeit("RF 8 pair-block 4-D pad-adds", rf, d_cache)

    @jax.jit
    def rh(d):
        flat_in = d.reshape(-1)
        acc = []
        pairs = []
        for ci in range(8):
            blk = jax.lax.slice(
                flat_in, (ci * C,), (flat_in.shape[0],), (F,))
            blk2 = jax.lax.slice(
                flat_in, (ci * C + 1,), (flat_in.shape[0],), (F,))
            pairs.append((blk, blk2))
        for ch in range(C):
            a3 = None
            for ci, c in enumerate(hg._CORNERS):
                col = pairs[ci][ch].reshape(R, R, R)
                padded = jnp.pad(
                    col, ((int(c[0]), 1 - int(c[0])),
                          (int(c[1]), 1 - int(c[1])),
                          (int(c[2]), 1 - int(c[2]))))
                a3 = padded if a3 is None else a3 + padded
            acc.append(a3.reshape(-1))
        flat = jnp.stack(acc, axis=-1).reshape(-1)
        return jnp.pad(flat, (0, size * C - S * S * S * C))
    v = rh(d_cache)
    print("RH == RA:", bool(jnp.array_equal(ra, v)), flush=True)
    timeit("RH (same as RA, sanity)", rh, d_cache)


if __name__ == "__main__":
    main()
