"""Micro-benchmark round 3: attribute the packed hash-encode forward's
~120 ms of non-gather time (212 ms measured vs 89 ms pure-gather floor).

Hypotheses:
  A. per-gather-op fixed overhead (32 separate gathers of 393K vs ONE 12.6M)
  B. uint32 operand/index gathers slower than f32/int32
  C. index-arithmetic + unpack elementwise cost
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp


def bench(fn, *args, iters=5):
    out = fn(*args)
    float(np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
    return (time.perf_counter() - t0) / iters


def main():
    T = 2_480_000
    N = 393_216
    K = 32  # level-corner combinations at the online budget
    key = jax.random.PRNGKey(0)
    tab_f = jax.random.normal(key, (T,), dtype=jnp.float32)
    tab_u = jax.random.randint(jax.random.PRNGKey(9), (T,), 0, 1 << 30).astype(jnp.uint32)
    idxs = jax.random.randint(jax.random.PRNGKey(1), (K, N), 0, T)  # int32
    idx_flat = idxs.reshape(-1)

    f = jax.jit(lambda t, i: jnp.sum(t[i]))
    dt = bench(f, tab_f, idx_flat)
    print(f"ONE 12.6M f32 gather        : {dt*1e3:7.1f} ms")

    def many(t, idxs):
        return sum(jnp.sum(t[idxs[k]]) for k in range(K))
    f = jax.jit(many)
    dt = bench(f, tab_f, idxs)
    print(f"32 x 393K f32 gathers       : {dt*1e3:7.1f} ms")

    f = jax.jit(lambda t, i: jnp.sum(t[i]))
    dt = bench(f, tab_u, idx_flat)
    print(f"ONE 12.6M u32 gather        : {dt*1e3:7.1f} ms")

    idx_u = idx_flat.astype(jnp.uint32)
    f = jax.jit(lambda t, i: jnp.sum(t[i]))
    dt = bench(f, tab_u, idx_u)
    print(f"ONE 12.6M u32/u32idx gather : {dt*1e3:7.1f} ms")

    # the actual packed encode fwd at the online budget
    sys.path.insert(0, ".")
    from bundlesdf_tpu.ops import hashgrid

    spec = hashgrid.HashGridSpec(4, 2, 16, 128, 22, packed=True)
    table = hashgrid.init_table(jax.random.PRNGKey(2), spec)
    x = jax.random.uniform(jax.random.PRNGKey(3), (N, 3), minval=-1, maxval=1)
    f = jax.jit(lambda x, t: jnp.sum(hashgrid.hash_encode_packed(x, t, spec)))
    dt = bench(f, x, table)
    print(f"hash_encode_packed fwd      : {dt*1e3:7.1f} ms")

    # fwd with indices precomputed (isolates gather+unpack+lerp from index math)
    packed = hashgrid.pack_table(table, spec)
    x01 = jnp.clip((x + 1.0) * 0.5, 0.0, 1.0)
    all_idx = []
    for p in spec.level_params():
        pos = x01 * p["scale"] + 0.5
        pg = jnp.floor(pos).astype(jnp.int32)
        for c in hashgrid._CORNERS:
            idx = hashgrid._corner_index(pg + c[None], p["res"], p["size"], p["dense"])
            all_idx.append(jnp.uint32(p["offset"]) + idx)
    all_idx = jnp.stack(all_idx)  # (32, N) uint32

    def gather_unpack(packed, all_idx):
        tot = 0.0
        for k in range(K):
            g = packed[all_idx[k]]
            c0, c1 = hashgrid._unpack_word(g)
            tot = tot + jnp.sum(c0) + jnp.sum(c1)
        return tot
    f = jax.jit(gather_unpack)
    dt = bench(f, packed, all_idx)
    print(f"32 gathers + unpack (precomp idx): {dt*1e3:7.1f} ms")

    f = jax.jit(lambda p, i: jnp.sum(p[i.reshape(-1)]))
    dt = bench(f, packed, all_idx)
    print(f"ONE flat gather (precomp idx)    : {dt*1e3:7.1f} ms")


if __name__ == "__main__":
    main()
