"""Round-3 probe: per-ray segment deduplication of the hash scatter.

Samples along a ray are z-ordered, so their cells change rarely on coarse
levels (lv0 R=16: ~8 distinct cells per 192 samples).  Pre-summing each
run of equal-cell samples (a segmented scan) and scattering only one row
per run cuts the scatter's update-row count — the quantity XLA charges for
(~13-30 ns/row) — by the dedup ratio.

Machinery per level:
  1. cell ids (N_ray, S) from the sample positions (already computed)
  2. boundary mask b[s] = cell[s] != cell[s-1]  (b[0] = True)
  3. seg-inclusive sums of the (N_ray, S) update columns via a segmented
     prefix scan (associative; reset at boundaries)
  4. rank-count positions of the k-th boundary per ray -> gather run-end
     rows into a (N_ray, CAP, 16) compact operand
  5. ONE scatter of (N_ray*CAP) rows.

Exactness: each run's sum is the plain left-to-right f32 sum of its
samples — the same set of addends the direct scatter feeds XLA's
(unspecified-order) scatter-add; results differ only by f32 reordering.

This probe measures machinery + scatter vs the direct scatter at the
online budget, checks allclose, and reports per-level dedup ratios on
realistic z-ordered cells.
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
    print(f"{label:58s}: {ms:9.2f} ms", flush=True)
    return ms


def main():
    import jax
    import jax.numpy as jnp

    from bundlesdf_tpu.ops import hashgrid as hg

    R_RAYS, S = 2048, 192
    N = R_RAYS * S
    rng = np.random.default_rng(0)

    # Realistic z-ordered sample cells: rays through [-1,1]^3.
    o = rng.uniform(-0.2, 0.2, (R_RAYS, 3))
    d = rng.normal(size=(R_RAYS, 3))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    # Realistic z structure: 128 occupancy-span samples over ~0.5 units +
    # 64 band samples inside the +-trunc (0.01) band around the surface.
    t_occ = np.sort(rng.uniform(0.45, 0.95, (R_RAYS, 128)), axis=1)
    depth = rng.uniform(0.6, 0.8, (R_RAYS, 1))
    t_band = np.sort(depth + rng.uniform(-0.01, 0.01, (R_RAYS, 64)), axis=1)
    t = np.concatenate([t_occ, t_band], axis=1)
    pts = o[:, None, :] + d[:, None, :] * t[..., None]  # (R, S, 3)
    x01 = np.clip((pts + 1) * 0.5, 0, 1)

    spec = hg.HashGridSpec(4, 2, 16, 128, 22, layout="cell")
    lps = spec.level_params()

    for li, p in enumerate(lps):
        Rr = p["res"]
        pos = x01 * p["scale"] + 0.5
        g = np.floor(pos).astype(np.int64)
        cell = g[..., 0] * Rr * Rr + g[..., 1] * Rr + g[..., 2]
        b = np.ones((R_RAYS, S), bool)
        b[:, 1:] = cell[:, 1:] != cell[:, :-1]
        runs = b.sum(1)
        print(f"level {li} (R={Rr}): mean runs/ray {runs.mean():6.1f}  "
              f"p99 {np.percentile(runs, 99):6.1f}  max {runs.max()}",
              flush=True)

    # ---- timed variants for lv3 and lv1 ----
    import functools

    def direct_scatter(cell_flat, d_rows, n_dest):
        return hg._cell_cache_scatter(cell_flat, d_rows, n_dest)

    def seg_scatter(cell2d, d_rows2d, n_dest, cap):
        """cell2d (R,S) int32, d_rows2d (R,S,16) -> (n_dest,16) via run
        pre-summing with CAP runs per ray (overflow runs fall back to
        their own rows via a second masked scatter... here: clamp —
        probe-only; product impl handles overflow by direct scatter of
        the tail)."""
        Rr, Ss = cell2d.shape
        F = d_rows2d.shape[-1]
        b = jnp.ones((Rr, Ss), bool).at[:, 1:].set(
            cell2d[:, 1:] != cell2d[:, :-1])
        seg_id = jnp.cumsum(b, axis=1) - 1  # (R, S) 0-based run index
        # inclusive segmented sum along samples via associative scan:
        # carry resets at boundaries.
        def comb(a, x):
            av, af = a
            xv, xf = x
            return jnp.where(xf[..., None], xv, av + xv), af | xf

        vals, _ = jax.lax.associative_scan(
            lambda a, x: comb(a, x), (d_rows2d, b), axis=1)
        # run-end positions: s is a run end where b[s+1] or s == S-1
        is_end = jnp.ones((Rr, Ss), bool).at[:, :-1].set(b[:, 1:])
        # position of k-th run end: rank-count
        ks = jnp.arange(cap)
        # end_pos[r, k] = index s of the k-th end = sum_s (seg_id[s] < k) ...
        # seg_id at ends is 0..runs-1; the k-th end has seg_id == k.
        # pos = sum_s (seg_id <= k-1 ...) -> count of samples in runs < k+1
        # minus 1 = index of last sample of run k.
        cnt = jnp.sum((seg_id[:, None, :] <= ks[None, :, None]), axis=2)
        end_pos = jnp.clip(cnt - 1, 0, Ss - 1)  # (R, cap)
        n_runs = jnp.sum(b, axis=1)  # (R,)
        slot_valid = ks[None, :] < n_runs[:, None]
        flat_pos = (jnp.arange(Rr)[:, None] * Ss + end_pos).reshape(-1)
        rows = vals.reshape(Rr * Ss, F)[flat_pos]  # (R*cap, F) row gather
        cells = cell2d.reshape(-1)[flat_pos]
        rows = jnp.where(slot_valid.reshape(-1)[:, None], rows, 0.0)
        cells = jnp.where(slot_valid.reshape(-1), cells, 0)
        return hg._cell_cache_scatter(cells.astype(jnp.int32), rows, n_dest)

    timeit("Z0 null", jax.jit(lambda v: v + 1.0), jnp.float32(1.0))

    for li, cap in ((0, 16), (1, 24), (2, 40), (3, 64)):
        p = lps[li]
        Rr = p["res"]
        pos = x01 * p["scale"] + 0.5
        g = np.floor(pos).astype(np.int64)
        cell_np = (g[..., 0] * Rr * Rr + g[..., 1] * Rr + g[..., 2]).astype(np.int32)
        d_rows_np = rng.standard_normal((R_RAYS, S, 16)).astype(np.float32)
        cell2d = jnp.asarray(cell_np)
        d2 = jnp.asarray(d_rows_np)
        cflat = cell2d.reshape(-1)
        dflat = d2.reshape(-1, 16)
        n_dest = Rr ** 3

        f_dir = jax.jit(functools.partial(direct_scatter, n_dest=n_dest))
        f_seg = jax.jit(functools.partial(seg_scatter, n_dest=n_dest, cap=cap))
        a = f_dir(cflat, dflat)
        bb = f_seg(cell2d, d2)
        err = float(jnp.max(jnp.abs(a - bb)))
        rel = err / (float(jnp.max(jnp.abs(a))) + 1e-12)
        print(f"lv{li} seg-vs-direct max abs {err:.3e} (rel {rel:.2e})",
              flush=True)
        timeit(f"lv{li} direct scatter ({N} rows)", f_dir, cflat, dflat)
        timeit(f"lv{li} seg scatter (cap {cap}, {R_RAYS*cap} rows)",
               f_seg, cell2d, d2)


if __name__ == "__main__":
    main()
