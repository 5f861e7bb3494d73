"""Full train step with scatter='seg' vs 'xla' at the online budget."""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax
    import jax.numpy as jnp
    import optax

    from __graft_entry__ import _build_nof
    from bundlesdf_tpu.nof import runner as nof_runner

    spec, rcfg, weights, params, rays, c2w, grid = _build_nof(
        n_rand=2048, n_samples=128, n_around=64, num_levels=4,
        finest_res=128, log2_hashmap=22, n_march=200, num_frames=16,
        occ_res=64,
    )
    optimizer = optax.chain(
        optax.GradientTransformation(*nof_runner.clip_by_global_inf_norm(0.1)),
        optax.scale_by_adam(eps=1e-15),
        optax.scale_by_schedule(lambda s: -0.01 * (0.1 ** (s / 500.0))),
    )
    opt_state = optimizer.init(params)
    pool = jnp.tile(rays, (8, 1))
    n_rays = jnp.asarray(pool.shape[0], jnp.int32)
    key = jax.random.PRNGKey(0)

    for mode in ("xla", "seg"):
        st = nof_runner.TrainStatics(
            spec=spec._replace(grid=spec.grid._replace(scatter=mode)),
            rcfg=rcfg, weights=weights, n_rand=2048, n_step=500,
            trunc=0.01, trunc_start=0.01, trunc_decay_type="", sc_factor=1.0,
        )
        step, _ = nof_runner.make_train_step(st, optimizer)
        p, o, m = step(params, opt_state, 0, key, pool, n_rays, grid, c2w)
        l0 = float(m["loss"])
        t0 = time.perf_counter()
        N_IT = 20
        for i in range(N_IT):
            p, o, m = step(p, o, i + 1, key, pool, n_rays, grid, c2w)
        lN = float(m["loss"])
        dt = (time.perf_counter() - t0) / N_IT * 1e3
        print(f"{mode}: {dt:7.2f} ms/step  ({1000/dt:5.2f} steps/s)"
              f"  loss {l0:.4f} -> {lN:.4f}", flush=True)


if __name__ == "__main__":
    main()
