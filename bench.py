"""Benchmark: Neural-Object-Field training throughput at the reference's
online budget — the #1 hot loop of the pipeline (SURVEY.md §3.5: 500 steps
x 2048 rays x ~192 samples per keyframe batch; config.yml:2,7,18-19,44-47).

Prints ONE JSON line:
  {"metric", "value", "unit", "vs_baseline", "backend",
   "roofline_frac", "access_floor_ms", "e2e_fps", "e2e_frames"}

value            — train steps/s, measured through the PRODUCT loop
                   (make_train_loop scan, loop_chunk=50 — config.py) at the
                   reference budget with the shipped scatter mode.
roofline_frac    — access_floor_ms / step_ms: the step's irreducible
                   random-access program (the 4 hash levels' row gathers +
                   segment-compact scatters at identical shapes) timed on
                   the same chip.  1.0 would mean the whole step costs no
                   more than its bare HBM random accesses.
e2e_fps          — frames/s of a small end-to-end tracking+NOF run (6
                   frames, 320^2 dots cube, product config) measured over
                   frames 2..N (first frames carry the XLA compiles).

Baseline: the reference repo publishes no numbers (BASELINE.md); we anchor
vs_baseline to 100 train steps/s — an ESTIMATE of the reference's torch
online loop on its single desktop GPU.  vs_baseline = steps_per_s / 100,
flagged with "baseline_is_estimate": true.

Resilience: the tunneled TPU backend is flaky; the benchmark runs in a
child process with bounded retries; a persistent backend failure produces
a structured error JSON (backend "unavailable") instead of a bare failure.
"""
import json
import os
import subprocess
import sys
import time

RETRIES = 5
RETRY_WAIT_S = 30.0


def _bench_steps():
    import numpy as np
    import jax
    import jax.numpy as jnp
    import optax

    from __graft_entry__ import _build_nof
    from bundlesdf_tpu.nof import runner as nof_runner

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
    train_many = nof_runner.make_train_loop(st, optimizer)

    key = jax.random.PRNGKey(0)
    pool = jnp.tile(rays, (8, 1))
    n_rays = jnp.asarray(pool.shape[0], jnp.int32)

    # One launch per CHUNK scanned steps — the shipped configuration
    # (config.py loop_chunk: 50).
    CHUNK = 50
    params_c, opt_c, metrics = train_many(
        params, opt_state, 0, key, pool, n_rays, grid, c2w, CHUNK
    )
    float(metrics["loss"])  # d2h readback: block_until_ready is NOT an
    # execution barrier on the tunneled axon backend

    n_steps = 200
    t0 = time.perf_counter()
    for i in range(n_steps // CHUNK):
        params_c, opt_c, metrics = train_many(
            params_c, opt_c, CHUNK + i * CHUNK, key, pool, n_rays, grid, c2w,
            CHUNK
        )
    float(metrics["loss"])  # true barrier (see above)
    dt = time.perf_counter() - t0
    steps_per_s = n_steps / dt
    step_ms = dt / n_steps * 1e3

    # ---- random-access floor at the step's shapes -----------------------
    from bundlesdf_tpu.ops import hashgrid as hg

    gspec = spec.grid
    lps = gspec.level_params()
    C = gspec.level_dim
    N = 2048 * (rcfg.n_samples + rcfg.n_samples_around_depth)
    rng = np.random.default_rng(0)
    caches = []
    cells = []
    compact_idx = []
    compact_rows = []
    for p in lps:
        R3 = p["res"] ** 3
        caches.append(jnp.asarray(
            rng.standard_normal((R3, 8 * C)).astype(np.float32)))
        cells.append(jnp.asarray(rng.integers(0, R3, N).astype(np.int32)))
        cap = hg._seg_cap(p["res"], rcfg.n_samples + rcfg.n_samples_around_depth)
        m = 2048 * cap
        compact_idx.append(jnp.asarray(rng.integers(0, R3, m).astype(np.int32)))
        compact_rows.append(jnp.asarray(
            rng.standard_normal((m, 8 * C)).astype(np.float32)))

    @jax.jit
    def access_floor(caches, cells, cidx, crows):
        outs = []
        for li, p in enumerate(lps):
            R3 = p["res"] ** 3
            if R3 * 8 * C * 4 > hg._SEG_GATHER_BYTES:
                comp = caches[li][cidx[li]]          # run-start gather
                outs.append(comp[cells[li] % comp.shape[0]])  # redistribute
            else:
                outs.append(caches[li][cells[li]])    # direct row gather
            outs.append(hg._cell_cache_scatter(cidx[li], crows[li], R3))
        return [jnp.sum(o[:1]) for o in outs]

    r = access_floor(caches, cells, compact_idx, compact_rows)
    float(np.asarray(r[0]))
    t0 = time.perf_counter()
    ITS = 10
    for _ in range(ITS):
        r = access_floor(caches, cells, compact_idx, compact_rows)
    float(np.asarray(r[0]))
    floor_ms = (time.perf_counter() - t0) / ITS * 1e3

    return steps_per_s, step_ms, floor_ms, jax.default_backend()


def _probe_transport():
    """Per-run tunnel transport probe (VERDICT r4 weak #1: committed walls
    from different sessions aren't comparable — the tunnel's fixed dispatch
    cost drifted 31->40 ms and bandwidth 25->37 ms/MB between r4 sessions).
    Returns {rtt_ms, ms_per_mb} measured NOW, so e2e numbers can be
    normalized to the r4 reference transport (REF_RTT_MS)."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    f = jax.jit(lambda v: v + 1.0)
    one = jnp.float32(1.0)
    float(f(one))
    t0 = time.perf_counter()
    for _ in range(10):
        float(f(one))
    rtt_ms = (time.perf_counter() - t0) / 10 * 1e3

    g = jax.jit(lambda v: v.sum())
    buf = np.zeros((1 << 20,), np.float32)  # 4 MB
    float(g(jnp.asarray(buf)))
    t0 = time.perf_counter()
    for i in range(5):
        buf[0] = i  # defeat any host-side transfer caching
        float(g(jnp.asarray(buf)))
    ms4 = (time.perf_counter() - t0) / 5 * 1e3
    return {"rtt_ms": round(rtt_ms, 1),
            "ms_per_mb": round(max(0.0, (ms4 - rtt_ms)) / 4.0, 1)}


# r4's committed transport anchor (BASELINE.md probe_h2d_r4 re-probe):
# fixed dispatch cost used to normalize e2e fps across tunnel drift.
REF_RTT_MS = 37.0


def _bench_e2e():
    """Tiny end-to-end run: 6-frame 320^2 dots cube, product config; fps
    measured over the post-compile frames."""
    import numpy as np
    import cv2
    import tempfile

    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.abspath(__file__)), "tests"))
    from synthetic_cube import render_cube_rgbd
    from scipy.spatial.transform import Rotation

    from bundlesdf_tpu.config import default_nof_config, default_track_config
    from bundlesdf_tpu.pipeline.bundlesdf import BundleSdf

    H = W = 320
    K = np.array([[420.0, 0, W / 2], [0, 420.0, H / 2], [0, 0, 1]], np.float32)
    axis = np.array([0, 1, 0.2]); axis = axis / np.linalg.norm(axis)
    base = Rotation.from_euler("xyz", [20, 30, 10], degrees=True).as_matrix()
    frames = []
    N_FRAMES = 14
    for k in range(N_FRAMES):
        R = Rotation.from_rotvec(axis * np.deg2rad(6.0 * k)).as_matrix() @ base
        ob = np.eye(4); ob[:3, :3] = R
        ob[:3, 3] = [0.02 * np.sin(k * 0.4), 0.015 * np.cos(k * 0.3), 0.55]
        rgb, depth, mask = render_cube_rgbd(ob, K, H, W, texture="dots")
        frames.append((rgb, depth, mask))

    cfg_track = default_track_config()
    cfg_nof = default_nof_config()
    # The production eval configuration (EVAL_synth.json fixture block):
    # loose sync + continual 128-step extension rounds.
    cfg_nof["sync_max_delay"] = 2
    cfg_nof["n_step_extend"] = 128
    # Size the ray-pool reserve from the sequence length (exactly what
    # run_ho3d.py / benchmark_synth.py do) so every extension round reuses
    # ONE train program shape — without it the pool grows each round and
    # every round pays a fresh XLA compile, which is what "warm" excludes.
    import math
    cfg_nof["ray_pool_reserve_log2"] = min(
        23, max(20, math.ceil(math.log2(N_FRAMES * 120_000))))
    out = tempfile.mkdtemp(prefix="bench_e2e_")
    cfg_nof["save_dir"] = out
    cfg_track["debug_dir"] = out
    from bundlesdf_tpu.utils import profiler

    profiler.reset()
    tracker = BundleSdf(cfg_track=cfg_track, cfg_nof=cfg_nof, out_dir=out,
                        use_nof=True, save_artifacts=False)
    t_marks = []
    for i, (rgb, depth, mask) in enumerate(frames):
        m = mask
        if i == 0:
            m = cv2.erode(mask.astype(np.uint8), np.ones((5, 5), np.uint8))
        tracker.run(rgb, depth, K, f"{i:05d}", mask=m)
        t_marks.append(time.perf_counter())
    # fps over the second half of the video — the same definition as
    # EVAL_synth.json's warm_fps: by then the matcher/RANSAC buckets, BA,
    # the NOF round programs AND the initial 500-step round (keyframe 5,
    # start_nerf_keyframes) are behind, so this is the warm tracking regime.
    half = len(t_marks) // 2
    tail = t_marks[-1] - t_marks[half]
    fps = (len(t_marks) - 1 - half) / tail if tail > 0 else 0.0
    st = profiler.stats()
    n = len(t_marks)
    choreo = {
        "launches_per_frame": round(sum(
            v["count"] for k, v in st.items()
            if k.startswith("launch/")) / max(n, 1), 2),
        "readbacks_per_frame": round(sum(
            v["count"] for k, v in st.items()
            if k.startswith("readback/")) / max(n, 1), 2),
    }
    return fps, N_FRAMES, choreo


def _bench_programs():
    """Per-program {time, floor, frac} for the other hot programs
    (VERDICT r3 #7): the fused correspondence program at both pair-batch
    buckets and the BA program at the reference budget.

    Floors: transport floor = measured dispatch RTT + packed call/readback
    bytes at the measured tunnel bandwidth (the irreducible per-call cost
    on this deployment); mfu = analytic model FLOPs / (time x 49.2 TF/s
    f32 MXU peak) — honest context for 'is the compute itself fast'."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.abspath(__file__)), "tests"))
    from synthetic_hard import render_blob_rgbd
    from scipy.spatial.transform import Rotation
    from bundlesdf_tpu.config import ycbineoat_track_config
    from bundlesdf_tpu.tracking.frame import Frame
    from bundlesdf_tpu.tracking import corres as corres_mod
    from bundlesdf_tpu.tracking import ba as ba_mod

    out = {}
    # dispatch RTT (fenced null program)
    one = jnp.float32(1.0)
    f = jax.jit(lambda v: v + 1.0)
    float(f(one))
    t0 = time.perf_counter()
    for _ in range(10):
        float(f(one))
    rtt_ms = (time.perf_counter() - t0) / 10 * 1e3
    out["dispatch_rtt_ms"] = round(rtt_ms, 1)

    # ---- fused correspondence program
    cfg = ycbineoat_track_config()
    cfg["depth_processing"]["zfar"] = 1.0
    H = W = 480
    K = np.array([[600.0, 0, W / 2], [0, 600.0, H / 2], [0, 0, 1]],
                 np.float32)
    frames = []
    axis = np.array([0, 1, 0.2]); axis = axis / np.linalg.norm(axis)
    for k in range(3):
        R = Rotation.from_rotvec(axis * np.deg2rad(5.0 * k)).as_matrix()
        T = np.eye(4); T[:3, :3] = R; T[:3, 3] = [0, 0, 0.55]
        rgb, depth, mask = render_blob_rgbd(T, K, H, W)
        fr = Frame(rgb, depth, K, id=k, id_str=f"{k:05d}", cfg=cfg,
                   fg_mask=mask > 0)
        fr.pose_in_model = np.linalg.inv(T).astype(np.float32)
        frames.append(fr)
    store = corres_mod.CorresStore(cfg)
    key = jax.random.PRNGKey(0)
    M = store.max_matches
    T_trials = int(cfg["ransac"]["max_iter"])
    flops_pair = 512 * 256 * 512 * 2 + T_trials * M * (16 + 9) * 2
    for label, pairs in (
        ("fused_corres_p1", [(frames[1], frames[0])]),
        ("fused_corres_p16", [(frames[i], frames[j])
                              for i in range(3) for j in range(i)]),
    ):
        store.raw.clear()
        corres_mod.find_corres(store, pairs, cfg, key=key)  # compile
        t0 = time.perf_counter()
        reps = 6
        for _ in range(reps):
            store.raw.clear()
            corres_mod.find_corres(store, pairs, cfg, key=key)
        ms = (time.perf_counter() - t0) / reps * 1e3
        P = 1 if len(pairs) == 1 else int(
            cfg["feature_corres"].get("pair_batch", 16))
        bytes_call = P * (56 + 4 * 128) * 4 + P * (M + 3) * 8 * 4
        floor = rtt_ms + bytes_call / 25e3  # ~25 MB/s tunnel => ms
        out[label] = {
            "ms": round(ms, 1), "transport_floor_ms": round(floor, 1),
            "frac": round(floor / ms, 3),
            "mfu_f32": round(P * flops_pair / (ms / 1e3) / 49.2e12, 5),
        }

    # ---- BA program at the reference budget (10 frames, 7 GN iters,
    # dense term at 1/4 res)
    rng = np.random.default_rng(0)
    N = 10
    E = N * 512
    h, w = 120, 160
    poses = jnp.asarray(np.tile(np.eye(4, dtype=np.float32), (N, 1, 1)))
    fixed = jnp.zeros((N,), bool).at[0].set(True)
    ii = jnp.asarray(rng.integers(0, N, E).astype(np.int32))
    jjj = jnp.asarray(rng.integers(0, N, E).astype(np.int32))
    pts = rng.uniform(-0.1, 0.1, (E, 3)).astype(np.float32)
    pi = jnp.asarray(pts)
    pj = jnp.asarray(pts + rng.normal(0, 0.002, (E, 3)).astype(np.float32))
    cval = jnp.ones((E,), bool)
    pair_i = jnp.asarray(np.arange(N - 1, dtype=np.int32))
    pair_j = jnp.asarray(np.arange(1, N, dtype=np.int32))
    pval = jnp.ones((N - 1,), bool)
    xyz = jnp.asarray(rng.uniform(-0.2, 0.2, (N, h, w, 3)).astype(np.float32))
    nrm = jnp.asarray(np.broadcast_to(
        np.array([0, 0, 1], np.float32), (N, h, w, 3)).copy())
    vds = jnp.ones((N, h, w), bool)
    K_ds = jnp.asarray(K / 4.0)
    params = ba_mod.BAParams()
    ba = jax.jit(partial_ba(ba_mod, params, N))
    r = ba(poses, fixed, ii, jjj, pi, pj, cval, pair_i, pair_j, pval,
           xyz, nrm, vds, K_ds)
    float(jnp.sum(r[0]))
    t0 = time.perf_counter()
    reps = 6
    for _ in range(reps):
        r = ba(poses, fixed, ii, jjj, pi, pj, cval, pair_i, pair_j, pval,
               xyz, nrm, vds, K_ds)
    float(jnp.sum(r[0]))
    ms = (time.perf_counter() - t0) / reps * 1e3
    it = params.num_iter_outer
    ba_flops = it * (E * 400 + (N - 1) * h * w * 300 + N * 6 * 6 * (E + (N - 1) * h * w) // N)
    out["ba_10f_7gn"] = {
        "ms": round(ms, 1),
        "transport_floor_ms": round(rtt_ms, 1),
        "frac": round(rtt_ms / ms, 3),
        "mfu_f32": round(ba_flops / (ms / 1e3) / 49.2e12, 5),
    }
    return out


def partial_ba(ba_mod, params, N):
    def f(poses, fixed, ii, jj, pi, pj, cval, pair_i, pair_j, pval,
          xyz, nrm, vds, K_ds):
        return ba_mod.bundle_adjust(
            poses, fixed, ii, jj, pi, pj, cval, pair_i, pair_j, pval,
            xyz, nrm, vds, K_ds, params=params, n_frames=N)
    return f


def run_bench():
    try:
        transport = _probe_transport()
    except Exception as e:
        transport = {"error": str(e)[:200]}
    steps_per_s, step_ms, floor_ms, backend = _bench_steps()
    try:
        programs = _bench_programs()
    except Exception as e:  # auxiliary section must never kill the headline
        programs = {"error": str(e)[:300]}
    try:
        e2e_fps, e2e_frames, choreo = _bench_e2e()
    except Exception as e:  # e2e must never kill the headline metric
        e2e_fps, e2e_frames, choreo = None, f"error: {e}", {}
    # Drift-normalized e2e (VERDICT r4 weak #1): subtract the measured
    # blocking-readback transport excess vs the r4 reference RTT so fps is
    # comparable across tunnel sessions.
    e2e_fps_norm = None
    if isinstance(e2e_fps, float) and e2e_fps > 0 and \
            isinstance(transport.get("rtt_ms"), (int, float)) and choreo:
        excess_s = choreo["readbacks_per_frame"] * (
            transport["rtt_ms"] - REF_RTT_MS) / 1e3
        e2e_fps_norm = round(1.0 / max(1.0 / e2e_fps - excess_s, 1e-6), 4)
    print(json.dumps({
        "metric": "nof_train_steps_per_s",
        "value": round(steps_per_s, 2),
        "unit": "steps/s (2048 rays x 192 samples, 4-level hash 2^22, "
                "bench chunk 50; shipped online loop_chunk is 16 for "
                "tracker overlap)",
        "vs_baseline": round(steps_per_s / 100.0, 3),
        "baseline_is_estimate": True,
        "backend": backend,
        "step_ms": round(step_ms, 2),
        "access_floor_ms": round(floor_ms, 2),
        "roofline_frac": round(floor_ms / step_ms, 3),
        "programs": programs,
        "transport": transport,
        "ref_rtt_ms": REF_RTT_MS,
        "e2e_fps": (round(e2e_fps, 4) if isinstance(e2e_fps, float) else e2e_fps),
        "e2e_fps_transport_normalized": e2e_fps_norm,
        "e2e_choreography": choreo,
        "e2e_frames": e2e_frames,
    }))


def main():
    """Retry wrapper: each attempt is a fresh child process (jax caches a
    failed backend init for the life of the process, so in-process retries
    cannot recover from a transient tunnel outage)."""
    last_err = ""
    for attempt in range(RETRIES):
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--worker"],
            capture_output=True, text=True, timeout=3000,
        )
        for line in reversed(proc.stdout.strip().splitlines()):
            try:
                rec = json.loads(line)
            except (json.JSONDecodeError, ValueError):
                continue
            if "metric" in rec:
                print(line)
                return 0
        last_err = (proc.stderr or proc.stdout or "").strip()[-2000:]
        if attempt < RETRIES - 1:
            time.sleep(RETRY_WAIT_S * (attempt + 1))
    print(json.dumps({
        "metric": "nof_train_steps_per_s",
        "value": None,
        "unit": "steps/s (2048 rays x 192 samples, 4-level hash 2^22)",
        "vs_baseline": None,
        "baseline_is_estimate": True,
        "backend": "unavailable",
        "error": last_err[-500:],
    }))
    return 0


if __name__ == "__main__":
    if "--worker" in sys.argv:
        run_bench()
    else:
        sys.exit(main())
