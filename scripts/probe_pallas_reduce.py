"""Pallas kernel probe: cache-grad reduce as an x-slab stencil.

The reduce (d_cache (R^3, 8C) -> d_table (S^3*C,), 8 shifted adds) costs
~11 ms composed at lv3 (probe_reduce_r3 B-variant) against a ~0.4 ms
streaming floor (134 MB read + 17 MB write).  XLA's strided-slice
extraction forces multiple passes; a pallas kernel reads each input slab
once into VMEM and emits one output x-plane per grid step.

Layout: input viewed as (R, R*R*8C/128, 128) x-slabs (1 MB each, packed);
output (S, ceil(S*S*C/128)*128) padded rows, reshaped/sliced by XLA after.
In-kernel the (R^2, 8C) slab is reshaped to (R, R, 8C) and sliced per
corner-channel — correctness first (interpret mode on CPU), Mosaic
feasibility measured on TPU.
"""
import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def make_reduce(R: int, C: int):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from bundlesdf_tpu.ops.hashgrid import _CORNERS

    S = R + 1
    F = 8 * C
    out_row = S * S * C
    out_row_pad = -(-out_row // 128) * 128

    in_sub = R * R * F // 128
    out_sub = out_row_pad // 128

    def kernel(in_prev_ref, in_cur_ref, out_ref):
        x = pl.program_id(0)
        # slabs: (R, R, F) cell grids for x-planes x-1 and x (clamped)
        acc = [jnp.zeros((S, S), jnp.float32) for _ in range(C)]
        for ci, c in enumerate(_CORNERS):
            src_ref = in_cur_ref if c[0] == 0 else in_prev_ref
            valid_x = jnp.where(
                jnp.asarray(c[0] == 1), x >= 1, x <= R - 1)
            for ch in range(C):
                plane = src_ref[0].reshape(R, R, F)[:, :, ci * C + ch]
                # static shift by the corner offset: pad to (S, S)
                shifted = jnp.pad(
                    plane, ((int(c[1]), 1 - int(c[1])),
                            (int(c[2]), 1 - int(c[2]))))
                shifted = jnp.where(valid_x, shifted, 0.0)
                acc[ch] = acc[ch] + shifted
        flat = jnp.stack(acc, axis=-1).reshape(-1)
        flat = jnp.pad(flat, (0, out_row_pad - out_row))
        out_ref[0] = flat.reshape(out_sub, 128)

    @jax.jit
    def reduce_pallas(d_cache):
        # d_cache (R^3, F) -> (R, R^2*F/128, 128) x-slabs (Mosaic block
        # constraint: last two block dims divisible by (8, 128))
        xin = d_cache.reshape(R, in_sub, 128)

        def idx_prev(i):
            return (jnp.maximum(i - 1, 0), 0, 0)

        def idx_cur(i):
            return (jnp.minimum(i, R - 1), 0, 0)

        out = pl.pallas_call(
            kernel,
            grid=(S,),
            in_specs=[
                pl.BlockSpec((1, in_sub, 128), idx_prev,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, in_sub, 128), idx_cur,
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, out_sub, 128), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((S, out_sub, 128), jnp.float32),
            interpret=jax.default_backend() == "cpu",
        )(xin, xin)
        return out.reshape(S, out_row_pad)[:, :out_row].reshape(-1)

    return reduce_pallas


def main():
    import jax
    import jax.numpy as jnp
    from bundlesdf_tpu.ops import hashgrid as hg

    R = int(os.environ.get("R", "32"))
    C = 2
    S = R + 1
    spec = hg.HashGridSpec(1, C, R - 1, R - 1, 30, layout="cell")
    p = dict(scale=float(R - 1), res=R, size=-(-S * S * S // 8) * 8,
             offset=0, dense=True)
    rng = np.random.default_rng(0)
    d_cache = jnp.asarray(
        rng.standard_normal((R * R * R, 8 * C)).astype(np.float32))

    ref = hg._reduce_cell_cache_grad(d_cache, p, C)
    f = make_reduce(R, C)
    out = f(d_cache)
    out = jnp.pad(out, (0, ref.shape[0] - out.shape[0]))
    np.testing.assert_allclose(np.asarray(ref), np.asarray(out),
                               rtol=1e-6, atol=1e-6)
    print(f"R={R}: pallas reduce CORRECT", flush=True)

    if jax.default_backend() == "tpu":
        def timeit(label, fn, *args, iters=10):
            o = fn(*args)
            float(np.asarray(jnp.sum(o)))
            t0 = time.perf_counter()
            for _ in range(iters):
                o = fn(*args)
            float(np.asarray(jnp.sum(o)))
            ms = (time.perf_counter() - t0) / iters * 1e3
            print(f"{label:50s}: {ms:9.2f} ms", flush=True)

        timeit("xla strided reduce",
               jax.jit(lambda d: hg._reduce_cell_cache_grad(d, p, C)), d_cache)
        timeit("pallas slab reduce", f, d_cache)


if __name__ == "__main__":
    main()
