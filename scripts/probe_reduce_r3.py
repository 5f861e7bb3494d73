"""In-situ cost attribution inside the seg train step + conv-reduce probe.

Variants of the full online train step (scatter='seg'):
  A  shipped
  B  reduce replaced by a zero-cost dummy  -> reduce's composed cost
  C  lv3 (and lv2) reduce via conv_transpose at HIGHEST precision
  D  dx path disabled (stop_gradient on the encode input) -> dx's cost
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def bench_step(label, step, params, opt_state, pool, n_rays, grid, c2w, key):
    import jax

    p, o, m = step(params, opt_state, 0, key, pool, n_rays, grid, c2w)
    float(m["loss"])
    t0 = time.perf_counter()
    N_IT = 20
    for i in range(N_IT):
        p, o, m = step(p, o, i + 1, key, pool, n_rays, grid, c2w)
    l = float(m["loss"])
    dt = (time.perf_counter() - t0) / N_IT * 1e3
    print(f"{label:58s}: {dt:7.2f} ms/step ({1000/dt:5.2f}/s) loss {l:.4f}",
          flush=True)
    return dt


def main():
    import jax
    import jax.numpy as jnp
    import optax

    from __graft_entry__ import _build_nof
    from bundlesdf_tpu.nof import runner as nof_runner
    from bundlesdf_tpu.ops import hashgrid as hg

    spec, rcfg, weights, params, rays, c2w, grid = _build_nof(
        n_rand=2048, n_samples=128, n_around=64, num_levels=4,
        finest_res=128, log2_hashmap=22, n_march=200, num_frames=16,
        occ_res=64,
    )
    spec = spec._replace(grid=spec.grid._replace(scatter="seg"))
    optimizer = optax.chain(
        optax.GradientTransformation(*nof_runner.clip_by_global_inf_norm(0.1)),
        optax.scale_by_adam(eps=1e-15),
        optax.scale_by_schedule(lambda s: -0.01 * (0.1 ** (s / 500.0))),
    )
    opt_state = optimizer.init(params)
    pool = jnp.tile(rays, (8, 1))
    n_rays = jnp.asarray(pool.shape[0], jnp.int32)
    key = jax.random.PRNGKey(0)
    st = nof_runner.TrainStatics(
        spec=spec, rcfg=rcfg, weights=weights, n_rand=2048, n_step=500,
        trunc=0.01, trunc_start=0.01, trunc_decay_type="", sc_factor=1.0,
    )

    args = (params, opt_state, pool, n_rays, grid, c2w, key)

    variant = os.environ.get("VARIANT", "A")
    if variant == "A":
        step_a, _ = nof_runner.make_train_step(st, optimizer)
        bench_step("A shipped seg step", step_a, *args)
        return

    # B: dummy reduce
    real_reduce = hg._reduce_cell_cache_grad

    def dummy_reduce(d_cache, p, C):
        S = p["res"] + 1
        v = jnp.sum(d_cache[:1, :2]) * 0.0
        return jnp.full((p["size"] * C,), v, d_cache.dtype)

    if variant == "B":
        hg._reduce_cell_cache_grad = dummy_reduce
        step_b, _ = nof_runner.make_train_step(st, optimizer)
        bench_step("B reduce -> dummy", step_b, *args)
        return

    # C: conv reduce (HIGHEST precision) for large dense levels
    CORNERS = hg._CORNERS

    def conv_reduce(d_cache, p, C):
        R = p["res"]
        if R < 96:
            return real_reduce(d_cache, p, C)
        S = R + 1
        xin = d_cache.reshape(1, R, R, R, 8 * C)
        k = np.zeros((2, 2, 2, 8 * C, C), np.float32)
        for ci, c in enumerate(CORNERS):
            for ch in range(C):
                k[1 - c[0], 1 - c[1], 1 - c[2], ci * C + ch, ch] = 1.0
        out = jax.lax.conv_general_dilated(
            xin, jnp.asarray(k), window_strides=(1, 1, 1),
            padding=[(1, 1), (1, 1), (1, 1)],
            dimension_numbers=("NXYZC", "XYZIO", "NXYZC"),
            precision=jax.lax.Precision.HIGHEST,
        )
        flat = out.reshape(S * S * S * C)
        if S * S * S < p["size"]:
            flat = jnp.pad(flat, (0, (p["size"] - S * S * S) * C))
        return flat

    if variant == "C":
        hg._reduce_cell_cache_grad = conv_reduce
        step_c, _ = nof_runner.make_train_step(st, optimizer)
        bench_step("C conv-HIGHEST reduce lv3", step_c, *args)
        return

    # D: dx path off
    import bundlesdf_tpu.models.nof as nof_model
    real_encode = hg.encode

    def encode_nodx(x, table, spec_, n_rays=0):
        return real_encode(jax.lax.stop_gradient(x), table, spec_, n_rays)

    if variant == "D":
        hg.encode = encode_nodx
        nof_model.hashgrid.encode = encode_nodx
        step_d, _ = nof_runner.make_train_step(st, optimizer)
        bench_step("D dx path off (stop_gradient x)", step_d, *args)
        return


if __name__ == "__main__":
    main()
