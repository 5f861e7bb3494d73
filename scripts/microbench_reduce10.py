"""Next-round probes after the rank-count win (step = 110 ms, ~85% hash VJP):

B3. cache-grad reduce as a 3-D convolution: out[s,ch] = sum_ci
    cache[cell(s-ci), ci*2+ch] is a 2x2x2 correlation with a 0/1 kernel
    (16 in-ch -> 2 out-ch) — MXU work instead of 16 strided column
    extractions + shifted adds (shipped: 12.6 ms at level 3).
D.  dx-path isolation at the online budget:
      d1. full bwd both cotangents (reference point)
      d2. table-only bwd           (reference point)
      d3. dx-only bwd              (the unexplained ~30 ms marginal)
      d4. dx-only with rows residuals replaced by zeros_like (isolates
          the gdotrow reads from the rows arrays)
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
    print(f"{label:46s}: {ms:9.1f} ms", flush=True)
    return ms


def main():
    import jax
    import jax.numpy as jnp

    from bundlesdf_tpu.ops import hashgrid

    rng = np.random.default_rng(0)
    spec = hashgrid.HashGridSpec(4, 2, 16, 128, 22, layout="cell")
    p3 = spec.level_params()[3]
    R = p3["res"]
    C = 2
    d_cache = jnp.asarray(rng.standard_normal((R ** 3, 16)).astype(np.float32))

    timeit("b1. reduce col-extract (shipped)",
           jax.jit(lambda d: hashgrid._reduce_cell_cache_grad(d, p3, C)),
           d_cache)

    # conv kernel: out channel ch at spatial tap (i,j,k) reads input
    # channel ci*C+ch where corner ci=(i,j,k).  Correlation with padding
    # so that out[s] = sum over corners of cache[s - corner].
    kern = np.zeros((2, 2, 2, 16, C), np.float32)
    for ci, c in enumerate(hashgrid._CORNERS):
        for ch in range(C):
            kern[c[0], c[1], c[2], ci * C + ch, ch] = 1.0
    kern_j = jnp.asarray(kern)
    S = R + 1

    def conv_reduce(d):
        x = d.reshape(1, R, R, R, 16)
        # out[s] = sum_c in[s - c] -> pad input by 1 on the high side? out
        # spatial S=R+1 with taps at s-c for c in {0,1}: pad 1 both sides,
        # VALID conv with flipped... use explicit padding (1,1) and take
        # correlation: out[s] = sum_{i,j,k} in[s-1+i...]  Hmm — with
        # kernel tap (i,j,k) mapped to corner (1-i, 1-j, 1-k) the flip is
        # absorbed by re-indexing the kernel; here kern already encodes
        # corner ci at tap position c so we need out[s] = sum in[s-c]:
        # correlation with taps at NEGATIVE offsets = pad low side by 1.
        out = jax.lax.conv_general_dilated(
            x, kern_j[::-1, ::-1, ::-1],
            window_strides=(1, 1, 1), padding=[(1, 1), (1, 1), (1, 1)],
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
        flat = out.reshape(S * S * S * C)
        if S * S * S < p3["size"]:
            flat = jnp.pad(flat, (0, (p3["size"] - S * S * S) * C))
        return flat
    r_ship = hashgrid._reduce_cell_cache_grad(d_cache, p3, C)
    r_conv = conv_reduce(d_cache)
    err = float(jnp.max(jnp.abs(r_ship - r_conv)))
    print(f"conv reduce max err vs shipped: {err:.2e}", flush=True)
    timeit("b3. reduce as 2x2x2 conv", jax.jit(conv_reduce), d_cache)

    # D. dx isolation
    d = rng.standard_normal((2048, 3))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    o = -d * 2.0
    t = np.linspace(1.2, 2.8, 192)[None, :, None]
    x = jnp.asarray((o[:, None] + d[:, None] * t).reshape(-1, 3).astype(np.float32))
    N = x.shape[0]
    tab = hashgrid.init_table(jax.random.PRNGKey(0), spec)
    g = jax.random.normal(jax.random.PRNGKey(2), (N, spec.out_dim))
    f = lambda x, t: hashgrid.hash_encode_cell(x, t, spec)

    def both(x, tab, g):
        _, pull = jax.vjp(f, x, tab)
        return pull(g)
    timeit("d1. full bwd (both)", jax.jit(both), x, tab, g)

    def table_only(x, tab, g):
        _, pull = jax.vjp(lambda tt: f(x, tt), tab)
        return pull(g)[0]
    timeit("d2. table-only bwd", jax.jit(table_only), x, tab, g)

    def dx_only(x, tab, g):
        _, pull = jax.vjp(lambda xx: f(xx, tab), x)
        return pull(g)[0]
    timeit("d3. dx-only bwd", jax.jit(dx_only), x, tab, g)

    # d4: call the bwd directly with zeroed rows residuals
    out, rows_all = hashgrid._encode_cell_impl(x, tab, spec)
    zero_rows = tuple(jnp.zeros_like(r) for r in rows_all)

    def bwd_direct(x, rows, g):
        return hashgrid._hash_encode_cell_bwd(spec, (x, rows), g)[0]
    timeit("d4a. bwd direct (real rows)", jax.jit(bwd_direct),
           x, rows_all, g)
    timeit("d4b. bwd direct (zero rows)", jax.jit(bwd_direct),
           x, zero_rows, g)


if __name__ == "__main__":
    main()
