"""Benchmark: Neural-Object-Field training throughput at the reference's
online budget — the #1 hot loop of the pipeline (SURVEY.md §3.5: 500 steps
x 2048 rays x ~192 samples per keyframe batch; config.yml:2,7,18-19,44-47).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: the reference repo publishes no numbers (BASELINE.md); we anchor
vs_baseline to 100 train steps/s — an estimate of the reference's torch+
tsdf-CUDA online loop on its single desktop GPU (500-step chunks at the
"near-real-time" budget).  vs_baseline = steps_per_s / 100.
"""
import json
import time

import numpy as np


def main():
    import jax

    from __graft_entry__ import _build_nof
    from bundlesdf_tpu.nof import runner as nof_runner
    import optax

    # Reference online budget.
    spec, rcfg, weights, params, rays, c2w, grid = _build_nof(
        n_rand=2048, n_samples=128, n_around=64, num_levels=4,
        finest_res=128, log2_hashmap=22, n_march=200, num_frames=16, occ_res=64,
    )
    st = nof_runner.TrainStatics(
        spec=spec, rcfg=rcfg, weights=weights, n_rand=2048, n_step=500,
        trunc=0.01, trunc_start=0.01, trunc_decay_type="", sc_factor=1.0,
    )
    optimizer = optax.chain(
        optax.GradientTransformation(*nof_runner.clip_by_global_inf_norm(0.1)),
        optax.scale_by_adam(eps=1e-15),
        optax.scale_by_schedule(lambda s: -0.01 * (0.1 ** (s / 500.0))),
    )
    opt_state = optimizer.init(params)
    train_step, _ = nof_runner.make_train_step(st, optimizer)
    train_many = nof_runner.make_train_loop(st, optimizer)

    key = jax.random.PRNGKey(0)
    n_rays = np.int32(rays.shape[0])

    # Expand the ray pool so gathers aren't trivially cached.
    import jax.numpy as jnp

    pool = jnp.tile(rays, (8, 1))
    n_rays = jnp.asarray(pool.shape[0], jnp.int32)

    # Warmup / compile (the scanned loop is what the pipeline runs:
    # one device launch per 25 steps instead of per step).
    CHUNK = 25
    params_c, opt_c, metrics = train_many(
        params, opt_state, 0, key, pool, n_rays, grid, c2w, CHUNK
    )
    float(metrics["loss"])  # d2h readback: block_until_ready is NOT an
    # execution barrier on the tunneled axon backend (it returned after
    # dispatch, inflating a measured 2.2 steps/s to a bogus 10k steps/s)

    n_steps = 100
    t0 = time.perf_counter()
    for i in range(n_steps // CHUNK):
        params_c, opt_c, metrics = train_many(
            params_c, opt_c, CHUNK + i * CHUNK, key, pool, n_rays, grid, c2w,
            CHUNK
        )
    float(metrics["loss"])  # true barrier (see above)
    dt = time.perf_counter() - t0
    steps_per_s = n_steps / dt

    print(json.dumps({
        "metric": "nof_train_steps_per_s",
        "value": round(steps_per_s, 2),
        "unit": "steps/s (2048 rays x 192 samples, 4-level hash 2^22)",
        "vs_baseline": round(steps_per_s / 100.0, 3),
    }))


if __name__ == "__main__":
    main()
