"""Pallas kernel variants for the one-pass cache-grad reduce, each tried in
its own subprocess (a Mosaic remote-compile crash kills the process).

Variants:
  V1  4-D blocks (1,R,R,F), lane-16 extracts, stack to (ZP,ZP,C) output
  V2  like V1 but output channel-planar (1, C*ZP, ZP) via row-block writes
  V3  2-D x-slab (R*R, F) blocks (block dims == array dims in lanes),
      in-kernel reshape only splitting SUBLANES (R*R,16)->(R,R,16)
  V4  transpose-only kernel: (rows,16) blocks -> 16 planar outputs; shifts
      done by XLA on contiguous planes afterwards
"""
import os
import subprocess
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

VARIANTS = ["V1", "V2", "V3", "V4"]


def build(variant, R, C):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from bundlesdf_tpu.ops.hashgrid import _CORNERS

    S = R + 1
    F = 8 * C
    ZP = -(-S // 8) * 8  # 136 at R=128
    size = -(-S * S * S // 8) * 8

    if variant in ("V1", "V2"):
        def kernel(prev_ref, cur_ref, out_ref):
            x = pl.program_id(0)
            acc = [jnp.zeros((ZP, ZP), jnp.float32) for _ in range(C)]
            for ci, c in enumerate(_CORNERS):
                src = cur_ref if c[0] == 0 else prev_ref
                valid_x = jnp.where(jnp.asarray(c[0] == 1), x >= 1,
                                    x <= R - 1)
                for ch in range(C):
                    plane = src[0, :, :, ci * C + ch]
                    shifted = jnp.pad(
                        plane, ((int(c[1]), ZP - R - int(c[1])),
                                (int(c[2]), ZP - R - int(c[2]))))
                    shifted = jnp.where(valid_x, shifted, 0.0)
                    acc[ch] = acc[ch] + shifted
            if variant == "V1":
                out_ref[0] = jnp.stack(acc, axis=-1)
            else:
                out_ref[0] = jnp.concatenate(acc, axis=0)

        out_shape = ((S, ZP, ZP, C) if variant == "V1"
                     else (S, C * ZP, ZP))
        out_block = ((1, ZP, ZP, C) if variant == "V1"
                     else (1, C * ZP, ZP))
        out_idx = ((lambda i: (i, 0, 0, 0)) if variant == "V1"
                   else (lambda i: (i, 0, 0)))

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
                ],
                out_specs=pl.BlockSpec(out_block, out_idx,
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct(out_shape, jnp.float32),
                interpret=jax.default_backend() == "cpu",
            )(xin, xin)
            if variant == "V1":
                flat = out[:, :S, :S, :].reshape(-1)
            else:
                chs = [out[:, k * ZP:k * ZP + S, :S] for k in range(C)]
                flat = jnp.stack(chs, axis=-1).reshape(-1)
            return jnp.pad(flat, (0, size * C - S * S * S * C))

    elif variant == "V3":
        def kernel(prev_ref, cur_ref, out_ref):
            x = pl.program_id(0)
            acc = [jnp.zeros((ZP, ZP), jnp.float32) for _ in range(C)]
            for ci, c in enumerate(_CORNERS):
                src = cur_ref if c[0] == 0 else prev_ref
                valid_x = jnp.where(jnp.asarray(c[0] == 1), x >= 1,
                                    x <= R - 1)
                for ch in range(C):
                    plane = src[0].reshape(R, R, F)[:, :, ci * C + ch]
                    shifted = jnp.pad(
                        plane, ((int(c[1]), ZP - R - int(c[1])),
                                (int(c[2]), ZP - R - int(c[2]))))
                    shifted = jnp.where(valid_x, shifted, 0.0)
                    acc[ch] = acc[ch] + shifted
            out_ref[0] = jnp.concatenate(acc, axis=0)

        @jax.jit
        def reduce_fn(d):
            xin = d.reshape(R, R * R, F)
            out = pl.pallas_call(
                kernel,
                grid=(S,),
                in_specs=[
                    pl.BlockSpec((1, R * R, F),
                                 lambda i: (jnp.maximum(i - 1, 0), 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, R * R, F),
                                 lambda i: (jnp.minimum(i, R - 1), 0, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((1, C * ZP, ZP), lambda i: (i, 0, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((S, C * ZP, ZP), jnp.float32),
                interpret=jax.default_backend() == "cpu",
            )(xin, xin)
            chs = [out[:, k * ZP:k * ZP + S, :S] for k in range(C)]
            flat = jnp.stack(chs, axis=-1).reshape(-1)
            return jnp.pad(flat, (0, size * C - S * S * S * C))

    else:  # V4 transpose-only
        ROWS = 8192  # rows per block

        def kernel(in_ref, out_ref):
            blk = in_ref[0]  # (ROWS, F)
            for k in range(F):
                out_ref[0, k] = blk[:, k]

        n_blocks = R * R * R // ROWS

        @jax.jit
        def transpose_fn(d):
            out = pl.pallas_call(
                kernel,
                grid=(n_blocks,),
                in_specs=[pl.BlockSpec((1, ROWS, F),
                                       lambda i: (i, 0, 0),
                                       memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec((1, F, ROWS), lambda i: (i, 0, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((n_blocks, F, ROWS),
                                               jnp.float32),
                interpret=jax.default_backend() == "cpu",
            )(d.reshape(n_blocks, ROWS, F))
            return out.transpose(1, 0, 2).reshape(F, -1)

        from bundlesdf_tpu.ops.hashgrid import _CORNERS

        @jax.jit
        def reduce_fn(d):
            cols = transpose_fn(d)
            acc = []
            for ch in range(C):
                a3 = None
                for ci, c in enumerate(_CORNERS):
                    col = cols[ci * C + ch].reshape(R, R, R)
                    padded = jnp.pad(
                        col, ((int(c[0]), 1 - int(c[0])),
                              (int(c[1]), 1 - int(c[1])),
                              (int(c[2]), 1 - int(c[2]))))
                    a3 = padded if a3 is None else a3 + padded
                acc.append(a3.reshape(-1))
            flat = jnp.stack(acc, axis=-1).reshape(-1)
            return jnp.pad(flat, (0, size * C - S * S * S * C))

    return reduce_fn


def run_variant(variant):
    import jax
    import jax.numpy as jnp
    from bundlesdf_tpu.ops import hashgrid as hg

    R = int(os.environ.get("R", "128"))
    C = 2
    S = R + 1
    p = dict(scale=float(R - 1), res=R, size=-(-S * S * S // 8) * 8,
             offset=0, dense=True)
    rng = np.random.default_rng(0)
    d_cache = jnp.asarray(
        rng.standard_normal((R * R * R, 8 * C)).astype(np.float32))
    ref = jax.jit(lambda d: hg._reduce_cell_cache_grad(d, p, C))(d_cache)

    fn = build(variant, R, C)
    out = fn(d_cache)
    eq = bool(jnp.array_equal(ref, out))
    err = float(jnp.max(jnp.abs(ref - out)))

    float(np.asarray(jnp.sum(fn(d_cache))))
    t0 = time.perf_counter()
    for _ in range(10):
        o = fn(d_cache)
    float(np.asarray(jnp.sum(o)))
    ms = (time.perf_counter() - t0) / 10 * 1e3
    print(f"RESULT {variant}: {ms:8.2f} ms  bitwise={eq} maxerr={err:.1e}",
          flush=True)


def main():
    for v in VARIANTS:
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), v],
            capture_output=True, text=True, timeout=600,
        )
        done = False
        for line in proc.stdout.splitlines():
            if line.startswith("RESULT"):
                print(line, flush=True)
                done = True
        if not done:
            err = (proc.stderr or "").strip().splitlines()
            tail = [l for l in err if "Error" in l or "error" in l][-1:] or \
                err[-1:]
            print(f"RESULT {v}: FAILED {tail[0][:200] if tail else '?'}",
                  flush=True)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] in VARIANTS:
        run_variant(sys.argv[1])
    else:
        main()
