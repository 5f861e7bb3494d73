"""Probes for the remaining bwd pieces after the packed scatter:

A. coarse-level scatter as ONE-HOT MATMUL on the MXU:
     d_cache = onehot(cell)^T @ d_rows   ((R^3, N) @ (N, 16))
   exact if done in f32; fast only if XLA fuses eq(iota, cell) into the
   dot operand instead of materializing (N, R^3).
     a1. L0 (R=16, 4096 cells) scatter baseline
     a2. L0 one-hot f32 matmul
     a3. L0 one-hot bf16xf32 mixed matmul (f32 accum)
     a4. L1 (R=32, 32768 cells) scatter baseline
     a5. L1 one-hot f32 matmul
B. cache-grad reduce with a TRANSPOSE-FIRST layout:
     b1. reduce from (R^3, 16) column extractions (shipped)
     b2. transpose to (16, R^3) once, then contiguous slices
C. dx/elementwise floor: the 32-corner (N,) chain alone.
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
    float(np.asarray(jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32))))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(np.asarray(jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32))))
    ms = (time.perf_counter() - t0) / iters * 1e3
    print(f"{label:46s}: {ms:9.1f} ms", flush=True)
    return ms


def main():
    import jax
    import jax.numpy as jnp

    from bundlesdf_tpu.ops import hashgrid

    N = 393216
    rng = np.random.default_rng(0)
    upd = jnp.asarray(rng.standard_normal((N, 16)).astype(np.float32))

    for R in (16, 32):
        R3 = R ** 3
        cell = jnp.asarray(rng.integers(0, R3, N).astype(np.int32))
        timeit(f"a. L(R={R}) scatter baseline",
               jax.jit(lambda i, u, R3=R3: jnp.zeros((R3, 16)).at[i].add(
                   u, mode="promise_in_bounds")), cell, upd)

        def onehot_mm(i, u, R3=R3):
            oh = (jnp.arange(R3, dtype=jnp.int32)[:, None] == i[None, :]
                  ).astype(jnp.float32)  # (R3, N)
            return oh @ u
        timeit(f"a. L(R={R}) one-hot f32 matmul", jax.jit(onehot_mm), cell, upd)

        def onehot_mm_bf(i, u, R3=R3):
            oh = (jnp.arange(R3, dtype=jnp.int32)[:, None] == i[None, :]
                  ).astype(jnp.bfloat16)
            return jax.lax.dot(oh, u.astype(jnp.bfloat16),
                               preferred_element_type=jnp.float32)
        timeit(f"a. L(R={R}) one-hot bf16 matmul", jax.jit(onehot_mm_bf),
               cell, upd)

    # A'. lane-packed scatter for the mid levels (already fast-regime:
    # does cutting destination rows 8x still help?)
    for R in (32, 64):
        R3 = R ** 3
        cell = jnp.asarray(rng.integers(0, R3, N).astype(np.int32))
        timeit(f"a'. L(R={R}) packed row scatter",
               jax.jit(lambda i, u, R3=R3: hashgrid._packed_row_scatter(
                   i, u, R3)), cell, upd)

    # B. reduce layouts at level 3
    spec = hashgrid.HashGridSpec(4, 2, 16, 128, 22, layout="cell")
    p3 = spec.level_params()[3]
    R = p3["res"]
    d_cache = jnp.asarray(
        rng.standard_normal((R ** 3, 16)).astype(np.float32))

    timeit("b1. reduce (R^3,16) col-extract (shipped)",
           jax.jit(lambda d: hashgrid._reduce_cell_cache_grad(d, p3, 2)),
           d_cache)

    def reduce_T(d):
        dT = d.T  # (16, R^3) one transpose pass
        S = R + 1
        acc = []
        for ch in range(2):
            a3 = jnp.zeros((S, S, S), d.dtype)
            for ci, c in enumerate(hashgrid._CORNERS):
                col = dT[ci * 2 + ch].reshape(R, R, R)
                start = (int(c[0]), int(c[1]), int(c[2]))
                cur = jax.lax.dynamic_slice(a3, start, (R, R, R))
                a3 = jax.lax.dynamic_update_slice(a3, cur + col, start)
            acc.append(a3.reshape(-1))
        flat = jnp.stack(acc, axis=-1).reshape(-1)
        if S * S * S < p3["size"]:
            flat = jnp.pad(flat, (0, (p3["size"] - S * S * S) * 2))
        return flat
    timeit("b2. reduce via transpose-first", jax.jit(reduce_T), d_cache)

    # C. elementwise dx floor: 4 levels x 8 corners of pure (N,) chains
    fr = [jnp.asarray(rng.random(N).astype(np.float32)) for _ in range(3)]
    gs = [jnp.asarray(rng.standard_normal(N).astype(np.float32))
          for _ in range(8)]

    def dx_floor(fr, gs):
        dxa = [jnp.zeros_like(fr[0]) for _ in range(3)]
        for li in range(4):
            for ci, c in enumerate(hashgrid._CORNERS):
                s0 = fr[0] if c[0] else 1.0 - fr[0]
                s1 = fr[1] if c[1] else 1.0 - fr[1]
                s2 = fr[2] if c[2] else 1.0 - fr[2]
                gdot = gs[ci] * gs[(ci + li) % 8]
                for k, (oa, ob) in enumerate(
                        (((s1, s2)), ((s0, s2)), ((s0, s1)))):
                    term = (gdot * (oa * ob)) * 31.0
                    dxa[k] = dxa[k] + term if c[k] else dxa[k] - term
        return dxa
    timeit("c. dx elementwise floor (4 lvl x 8 corners)",
           jax.jit(dx_floor), fr, gs)


if __name__ == "__main__":
    main()
