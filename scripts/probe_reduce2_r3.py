"""Decompose the lv3 cache-grad reduce cost (11 ms composed, ~0.4 ms floor).

Variants at R=128, C=2 (lv3 shapes):
  RA  shipped: 16 strided extracts + misaligned pad-adds, fused
  RB  extraction only: sum 16 strided cols, NO shifts (pure strided-read)
  RC  shifts only: 16 contiguous (R^3,) inputs, pad-add (pure shifted-sum)
  RD  z-split two-phase: c2=0/c2=1 groups summed aligned-in-z first, one
      misaligned add at the end
  RE  materialize-then-sum: copy 16 cols out (one pass), then RC
  RP  pallas 4-D x-slab kernel (input (R,R,R,16) blocks, output
      (S,136,136,C) blocks, no in-kernel lane reshape)
"""
import functools
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
    p = dict(scale=float(R - 1), res=R, size=-(-S * S * S // 8) * 8,
             offset=0, dense=True)
    rng = np.random.default_rng(0)
    d_cache = jnp.asarray(
        rng.standard_normal((R * R * R, F)).astype(np.float32))
    cols16 = jnp.asarray(
        rng.standard_normal((F, R * R * R)).astype(np.float32))

    def timeit(label, fn, *args, iters=10):
        o = fn(*args)
        float(np.asarray(jnp.sum(jax.tree_util.tree_leaves(o)[0])))
        t0 = time.perf_counter()
        for _ in range(iters):
            o = fn(*args)
        float(np.asarray(jnp.sum(jax.tree_util.tree_leaves(o)[0])))
        ms = (time.perf_counter() - t0) / iters * 1e3
        print(f"{label:46s}: {ms:9.2f} ms", flush=True)
        return ms

    timeit("RA shipped reduce",
           jax.jit(lambda d: hg._reduce_cell_cache_grad(d, p, C)), d_cache)

    @jax.jit
    def rb(d):
        flat = d.reshape(-1)
        acc = None
        for k in range(F):
            col = jax.lax.slice(flat, (k,), (flat.shape[0],), (F,))
            acc = col if acc is None else acc + col
        return acc
    timeit("RB strided extracts only (no shift)", rb, d_cache)

    @jax.jit
    def rc(cols):
        acc = []
        for ch in range(C):
            a3 = None
            for ci, c in enumerate(hg._CORNERS):
                col = cols[ci * C + ch].reshape(R, R, R)
                padded = jnp.pad(
                    col, ((int(c[0]), 1 - int(c[0])),
                          (int(c[1]), 1 - int(c[1])),
                          (int(c[2]), 1 - int(c[2]))))
                a3 = padded if a3 is None else a3 + padded
            acc.append(a3.reshape(-1))
        return jnp.stack(acc, axis=-1).reshape(-1)
    timeit("RC contiguous pad-adds only", rc, cols16)

    @jax.jit
    def rd(d):
        flat = d.reshape(-1)
        acc = []
        for ch in range(C):
            groups = {}
            for cz in (0, 1):
                a3 = None
                for ci, c in enumerate(hg._CORNERS):
                    if int(c[2]) != cz:
                        continue
                    col = jax.lax.slice(
                        flat, (ci * C + ch,), (flat.shape[0],), (F,)
                    ).reshape(R, R, R)
                    padded = jnp.pad(
                        col, ((int(c[0]), 1 - int(c[0])),
                              (int(c[1]), 1 - int(c[1])), (0, 0)))
                    a3 = padded if a3 is None else a3 + padded
                groups[cz] = a3
            out = (jnp.pad(groups[0], ((0, 0), (0, 0), (0, 1)))
                   + jnp.pad(groups[1], ((0, 0), (0, 0), (1, 0))))
            acc.append(out.reshape(-1))
        return jnp.stack(acc, axis=-1).reshape(-1)
    timeit("RD z-split two-phase", rd, d_cache)

    @jax.jit
    def re_mat(d):
        flat = d.reshape(-1)
        return jnp.stack([
            jax.lax.slice(flat, (k,), (flat.shape[0],), (F,))
            for k in range(F)
        ])
    timeit("RE1 materialize 16 cols", re_mat, d_cache)

    @jax.jit
    def re_full(d):
        return rc(re_mat(d))
    timeit("RE materialize + aligned pad-adds", re_full, d_cache)

    # equality RA vs RD
    ra = jax.jit(lambda d: hg._reduce_cell_cache_grad(d, p, C))(d_cache)
    rdv = rd(d_cache)
    rdv = jnp.pad(rdv, (0, ra.shape[0] - rdv.shape[0]))
    print("RD == RA:", bool(jnp.array_equal(ra, rdv)), flush=True)

    # ---- RP: pallas 4-D x-slab kernel --------------------------------
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    ZP = -(-S // 8) * 8  # 136

    def kernel(prev_ref, cur_ref, out_ref):
        x = pl.program_id(0)
        acc = [jnp.zeros((ZP, ZP), jnp.float32) for _ in range(C)]
        for ci, c in enumerate(hg._CORNERS):
            src = cur_ref if c[0] == 0 else prev_ref
            valid_x = jnp.where(jnp.asarray(c[0] == 1), x >= 1, x <= R - 1)
            for ch in range(C):
                plane = src[0, :, :, ci * C + ch]
                shifted = jnp.pad(
                    plane, ((int(c[1]), ZP - R - int(c[1])),
                            (int(c[2]), ZP - R - int(c[2]))))
                shifted = jnp.where(valid_x, shifted, 0.0)
                acc[ch] = acc[ch] + shifted
        out_ref[0] = jnp.stack(acc, axis=-1)

    @jax.jit
    def rp(d):
        xin = d.reshape(R, R, R, F)
        out = pl.pallas_call(
            kernel,
            grid=(S,),
            in_specs=[
                pl.BlockSpec((1, R, R, F),
                             lambda i: (jnp.maximum(i - 1, 0), 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, R, R, F),
                             lambda i: (jnp.minimum(i, R - 1), 0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, ZP, ZP, C), lambda i: (i, 0, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((S, ZP, ZP, C), jnp.float32),
            interpret=jax.default_backend() == "cpu",
        )(xin, xin)
        flat = out[:, :S, :S, :].reshape(-1)
        return jnp.pad(flat, (0, p["size"] * C - S * S * S * C))
    try:
        rpv = rp(d_cache)
        err = float(jnp.max(jnp.abs(ra - rpv)))
        print(f"RP max abs err vs RA: {err:.2e}", flush=True)
        timeit("RP pallas 4-D x-slab", rp, d_cache)
    except Exception as e:
        print(f"RP FAILED: {str(e)[:300]}", flush=True)


if __name__ == "__main__":
    main()
