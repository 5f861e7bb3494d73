"""Pallas V5: cache-grad reduce with MXU one-hot shift matmuls.

The y/z corner shifts are expressed as one-hot matrix products
(ShY[c1] @ P @ ShZT[c2]) so the kernel needs NO vector pads/concats
(Mosaic rejected sublane-offset concats).  x-shifts come free from the
prev/cur slab refs.  One-hot matmuls at HIGH/HIGHEST precision are exact
for f32 data (the one-hot factor is exactly representable in bf16, so
every decomposition pass reproduces A*1 terms losslessly at HIGHEST; the
probe asserts max-abs error and reports whether HIGH already matches).

Usage: R=128 PREC=highest python scripts/probe_reduce4_r3.py
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def make_v5(R, C, precision):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    S = R + 1
    F = 8 * C
    ZP = -(-S // 8) * 8
    size = -(-S * S * S // 8) * 8

    shy = np.zeros((2, ZP, R), np.float32)
    shzt = np.zeros((2, R, ZP), np.float32)
    for c in (0, 1):
        shy[c, c:c + R, :] = np.eye(R, dtype=np.float32)
        shzt[c, :, c:c + R] = np.eye(R, dtype=np.float32)
    shy = jnp.asarray(shy)
    shzt = jnp.asarray(shzt)

    def kernel(prev_ref, cur_ref, shy_ref, shzt_ref, out_ref):
        x = pl.program_id(0)
        outs = []
        for ch in range(C):
            acc = jnp.zeros((ZP, ZP), jnp.float32)
            for c1 in (0, 1):
                for c2 in (0, 1):
                    ci_c = c1 * 2 + c2          # c0 = 0 -> cur slab
                    ci_p = 4 + c1 * 2 + c2      # c0 = 1 -> prev slab
                    pc = cur_ref[0, :, :, ci_c * C + ch]
                    pp = prev_ref[0, :, :, ci_p * C + ch]
                    pc = jnp.where(x <= R - 1, pc, 0.0)
                    pp = jnp.where(x >= 1, pp, 0.0)
                    P = pc + pp
                    t1 = jax.lax.dot_general(
                        P, shzt_ref[c2], (((1,), (0,)), ((), ())),
                        precision=precision)          # (R, ZP)
                    acc = acc + jax.lax.dot_general(
                        shy_ref[c1], t1, (((1,), (0,)), ((), ())),
                        precision=precision)          # (ZP, ZP)
            outs.append(acc)
        out_ref[0] = jnp.concatenate(outs, axis=0)    # (C*ZP, ZP)

    @jax.jit
    def reduce_fn(d):
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
                pl.BlockSpec((2, ZP, R), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((2, R, ZP), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, C * ZP, ZP), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((S, C * ZP, ZP), jnp.float32),
            interpret=jax.default_backend() == "cpu",
        )(xin, xin, shy, shzt)
        chs = [out[:, k * ZP:k * ZP + S, :S] for k in range(C)]
        flat = jnp.stack(chs, axis=-1).reshape(-1)
        return jnp.pad(flat, (0, size * C - S * S * S * C))

    return reduce_fn


def main():
    import jax
    import jax.numpy as jnp
    from bundlesdf_tpu.ops import hashgrid as hg

    R = int(os.environ.get("R", "128"))
    prec = os.environ.get("PREC", "highest")
    C = 2
    S = R + 1
    p = dict(scale=float(R - 1), res=R, size=-(-S * S * S // 8) * 8,
             offset=0, dense=True)
    rng = np.random.default_rng(0)
    d_cache = jnp.asarray(
        rng.standard_normal((R * R * R, 8 * C)).astype(np.float32))
    ref = jax.jit(lambda d: hg._reduce_cell_cache_grad(d, p, C))(d_cache)

    fn = make_v5(R, C, getattr(jax.lax.Precision, prec.upper()))
    out = fn(d_cache)
    err = float(jnp.max(jnp.abs(ref - out)))
    rel = err / float(jnp.max(jnp.abs(ref)))
    print(f"V5 prec={prec}: maxerr={err:.2e} rel={rel:.2e} "
          f"bitwise={bool(jnp.array_equal(ref, out))}", flush=True)

    float(np.asarray(jnp.sum(fn(d_cache))))
    t0 = time.perf_counter()
    for _ in range(10):
        o = fn(d_cache)
    float(np.asarray(jnp.sum(o)))
    ms = (time.perf_counter() - t0) / 10 * 1e3
    print(f"RESULT V5 prec={prec} R={R}: {ms:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
