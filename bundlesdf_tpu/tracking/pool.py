"""Keyframe memory pool + pose-graph bookkeeping (the reference Bundler).

Re-design of BundleTrack/src/Bundler.{h,cpp}: the sliding non-keyframe
window, the dynamic keyframe memory pool, keyframe admission
(checkAndAddKeyframe Bundler.cpp:263-323), BA subset selection
(selectKeyFramesForBA :430-609 — 'normal_orientation_nearest',
'nearest_rotations', 'greedy_rot' implemented), covisibility-gated match
pair enumeration (getFeatureMatchPairs :781-807), BA assembly + launch
(optimizeGPU :810-956) and post-BA pose sanity gating (:926-946).

Host-side bookkeeping is plain Python over Frame objects; all numerics
(covisibility, BA) are batched device launches.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..config import Cfg
from ..ops import image as image_ops
from ..utils.profiler import span
from ..utils import geometry, se3
from . import ba as ba_mod
from .corres import CorresStore
from .frame import FAIL, Frame, compute_covisibility


class Bundler:
    def __init__(self, cfg: Cfg):
        self.cfg = cfg
        self.frames: dict[int, Frame] = {}     # sliding window (non-keyframes)
        self.keyframes: list[Frame] = []
        self.firstframe: Frame | None = None
        self.newframe: Frame | None = None
        self.local_frames: list[Frame] = []
        self.store = CorresStore(cfg)
        self._cov_cache: dict[tuple, float] = {}
        # Fixed BA edge capacity: pairs x per-pair cap (static for jit).
        self.max_ba_frames = int(cfg["bundle"]["max_BA_frames"])
        self.ba_edge_cap = self.max_ba_frames * (self.max_ba_frames - 1) // 2 * 256

    # ------------------------------------------------------------------
    def covisibility(self, fa: Frame, fb: Frame) -> float:
        key = (fa.id, fb.id)
        if key not in self._cov_cache:
            self._cov_cache[key] = compute_covisibility(
                fa, fb, float(self.cfg["visible_angle"])
            )
        return self._cov_cache[key]

    def forget_frame(self, f: Frame) -> bool:
        """Reference Bundler.cpp:62-73: drop a non-keyframe (or failed
        frame) and erase its matches."""
        if f in self.keyframes and f.status != FAIL:
            return False
        self.frames.pop(f.id, None)
        if f in self.keyframes:
            self.keyframes.remove(f)
        self.store.forget_frame(f.id)
        self._cov_cache = {
            k: v for k, v in self._cov_cache.items() if f.id not in k
        }
        return True

    # ------------------------------------------------------------------
    def check_and_add_keyframe(self, frame: Frame) -> bool:
        """Reference Bundler.cpp:263-323."""
        if frame.id == 0:
            self.keyframes.append(frame)
            return True
        if frame.status != 0:
            return False
        kf_cfg = self.cfg["keyframe"]
        n_valid = frame.count_valid_points()
        n_first = self.firstframe.count_valid_points()
        if n_valid < n_first / 10.0:
            return False
        min_rot = np.deg2rad(float(kf_cfg["min_rot"]))
        for kf in self.keyframes:
            rot_diff = se3.rotation_geodesic_distance_ignore_cam_z_np(
                frame.pose_in_model[:3, :3].T, kf.pose_in_model[:3, :3].T
            )
            if rot_diff < min_rot:
                return False
        min_visible = float(kf_cfg["min_visible"])
        if min_visible < 1.0:
            for kf in self.keyframes:
                if self.covisibility(frame, kf) > min_visible:
                    return False
        self.keyframes.append(frame)
        return True

    # ------------------------------------------------------------------
    def select_keyframes_for_ba(self):
        """Reference Bundler.cpp:430-609."""
        method = str(self.cfg["bundle"]["subset_selection_method"])
        max_frames = self.max_ba_frames
        nf = self.newframe
        if len(self.keyframes) + 1 <= max_frames:
            chosen = {f.id: f for f in self.keyframes}
            chosen[nf.id] = nf
            self.local_frames = sorted(chosen.values(), key=lambda f: f.id)
            return

        chosen = {nf.id: nf}
        if method == "greedy_rot":
            chosen[self.keyframes[0].id] = self.keyframes[0]
            while len(chosen) < max_frames:
                best, best_d = None, np.inf
                for kf in self.keyframes:
                    if kf.id in chosen:
                        continue
                    cum = sum(
                        se3.rotation_geodesic_distance_ignore_cam_z_np(
                            kf.pose_in_model[:3, :3].T, f.pose_in_model[:3, :3].T
                        )
                        for f in chosen.values()
                    )
                    if cum < best_d:
                        best, best_d = kf, cum
                chosen[best.id] = best
        elif method == "nearest_rotations":
            dists = [
                (se3.rotation_geodesic_distance_ignore_cam_z_np(
                    nf.pose_in_model[:3, :3].T, kf.pose_in_model[:3, :3].T
                ), kf)
                for kf in self.keyframes
            ]
            for _, kf in sorted(dists, key=lambda x: x[0]):
                if len(chosen) >= max_frames:
                    break
                chosen[kf.id] = kf
        elif method == "normal_orientation_greedy":
            # Greedily add the keyframe with max cumulative covisibility to
            # the chosen set (Bundler.cpp:529-554).
            chosen[self.keyframes[0].id] = self.keyframes[0]
            while len(chosen) < max_frames:
                best, best_v = None, 0.0
                for kf in self.keyframes:
                    if kf.id in chosen:
                        continue
                    v = sum(self.covisibility(kf, f) for f in chosen.values())
                    if v > best_v:
                        best, best_v = kf, v
                if best is None:
                    break
                chosen[best.id] = best
        elif method == "greedy_covisible_points":
            # Greedily add the keyframe sharing the most inlier feature
            # matches with the anchor frames (Bundler.cpp:555-580; the
            # reference counts covisible map points — our inlier-match
            # counts are the equivalent signal in this design).
            refs = [self.keyframes[0], nf]
            while len(chosen) < max_frames:
                best, best_n = None, 0
                for kf in self.keyframes:
                    if kf.id in chosen:
                        continue
                    n = sum(
                        self.store.tracks.n_covisible(f.id, kf.id)
                        + self.store.n_inliers((max(f.id, kf.id), min(f.id, kf.id)))
                        for f in refs
                    )
                    if n > best_n:
                        best, best_n = kf, n
                if best is None:
                    # no matched candidates left: fall back to covisibility
                    rest = [k for k in self.keyframes if k.id not in chosen]
                    if not rest:
                        break
                    best = max(rest, key=lambda k: self.covisibility(nf, k))
                chosen[best.id] = best
        elif method == "max_edge":
            # DFS over frame subsets rooted at keyframe 0 that reach the
            # new frame, maximizing the subset's total pairwise match count
            # (Bundler.cpp:581-591 + maxNumEdgePathDfs :612-686).  The
            # reference runs the matcher on unseen pairs *inside* the DFS
            # ("Super slow" per its own comment); here the edge indicator
            # is the already-tracked inlier count with covisibility as the
            # optimistic proxy for not-yet-matched pairs, so selection
            # never launches the matcher.
            min_vis = float(self.cfg["bundle"]["non_neighbor_min_visible"])
            kf0 = self.keyframes[0]
            pool_f = list(self.keyframes[1:]) + [nf]

            def n_matches(a, b):
                key = (max(a.id, b.id), min(a.id, b.id))
                m = self.store.matches.get(key)
                return 0 if not m else int(m["inlier"].sum())

            def has_edge(a, b):
                key = (max(a.id, b.id), min(a.id, b.id))
                if key in self.store.matches:
                    m = self.store.matches[key]
                    return m is not None and m["inlier"].any()
                return self.covisibility(a, b) >= min_vis

            best_path: dict | None = None
            best_n = -1
            visited: set = set()
            budget = [20000]  # bound the exponential search (the memoized
            # reference has no bound; with pools of hundreds of keyframes
            # that is not acceptable online)

            def dfs(cur, path: dict):
                nonlocal best_path, best_n
                key = frozenset(path)
                if key in visited or budget[0] <= 0:
                    return
                visited.add(key)
                budget[0] -= 1
                if len(path) == max_frames:
                    if nf.id in path:
                        fr = list(path.values())
                        total = sum(
                            n_matches(fr[i], fr[j])
                            for i in range(len(fr))
                            for j in range(i + 1, len(fr))
                        )
                        if total > best_n:
                            best_n = total
                            best_path = dict(path)
                    return
                for kf in pool_f:
                    if kf.id in path or not has_edge(cur, kf):
                        continue
                    path[kf.id] = kf
                    dfs(kf, path)
                    del path[kf.id]

            dfs(kf0, {kf0.id: kf0})
            if best_path is not None:
                chosen = best_path
            else:  # fall back to covisibility ranking
                vis = [(self.covisibility(nf, kf), kf) for kf in self.keyframes]
                for _, kf in sorted(vis, key=lambda x: -x[0]):
                    if len(chosen) >= max_frames:
                        break
                    chosen[kf.id] = kf
        elif method == "near_enough_rot":
            # Chain from keyframe 0 to the new frame through rotation-near
            # hops (Bundler.cpp:592-601 nearEnoughRotSearch, greedy variant
            # of the reference's DFS).
            max_rot = np.deg2rad(float(self.cfg["bundle"]["non_neighbor_max_rot"]))
            chosen[self.keyframes[0].id] = self.keyframes[0]
            cur = self.keyframes[0]
            while len(chosen) < max_frames:
                cands = [
                    (se3.rotation_geodesic_distance_ignore_cam_z_np(
                        cur.pose_in_model[:3, :3].T, kf.pose_in_model[:3, :3].T
                    ), kf)
                    for kf in self.keyframes if kf.id not in chosen
                ]
                cands = [(d, kf) for d, kf in cands if d <= max_rot]
                if not cands:
                    break
                _, cur = min(cands, key=lambda x: x[0])
                chosen[cur.id] = cur
        else:  # normal_orientation_nearest (default, config_ho3d.yml:39)
            vis = [(self.covisibility(nf, kf), kf) for kf in self.keyframes]
            for _, kf in sorted(vis, key=lambda x: -x[0]):
                if len(chosen) >= max_frames:
                    break
                chosen[kf.id] = kf
        self.local_frames = sorted(chosen.values(), key=lambda f: f.id)

    # ------------------------------------------------------------------
    def get_feature_match_pairs(self, frames: list[Frame]) -> list[tuple]:
        """Reference Bundler.cpp:781-807: enumerate unmatched pairs gated by
        covisibility >= non_neighbor_min_visible."""
        pairs = []
        min_vis = float(self.cfg["bundle"]["non_neighbor_min_visible"])
        for i in range(len(frames)):
            for j in range(i + 1, len(frames)):
                fa, fb = frames[j], frames[i]
                if (fa.id, fb.id) in self.store.matches:
                    continue
                if np.abs(fa.pose_in_model - np.eye(4)).max() <= 1e-6:
                    continue
                if self.covisibility(fa, fb) < min_vis:
                    self.store.matches[(fa.id, fb.id)] = None  # marked skip
                    continue
                pairs.append((fa, fb))
        return pairs

    # ------------------------------------------------------------------
    def _dense_maps(self, frames: list[Frame]):
        """Downsampled xyz/normal maps for the dense BA term (reference
        CUDACache downsampled frames, bundle.image_downscale)."""
        factor = int(self.cfg["bundle"]["image_downscale"])
        xyzs, nrms, oks = [], [], []
        for f in frames:
            if not hasattr(f, "_ds_cache") or f._ds_cache[0] != factor:
                d = f.depth[::factor, ::factor]
                K_ds = f.K.copy()
                K_ds[:2] /= factor
                xyz = geometry.depth_to_xyz_np(d.astype(np.float32), K_ds)
                nrm = f.normals[::factor, ::factor]
                ok = (d > 0.1) & (np.linalg.norm(nrm, axis=-1) > 0.5)
                f._ds_cache = (factor, xyz, nrm, ok, K_ds)
            _, xyz, nrm, ok, K_ds = f._ds_cache
            xyzs.append(xyz)
            nrms.append(nrm)
            oks.append(ok)
        return np.stack(xyzs), np.stack(nrms), np.stack(oks), frames[0]._ds_cache[4]

    def optimize(self, frames: list[Frame]):
        """Assemble + launch the BA (reference optimizeGPU Bundler.cpp:810-956)."""
        bcfg = self.cfg["bundle"]
        frames = sorted(frames, key=lambda f: f.id)
        N = self.max_ba_frames
        n_act = len(frames)
        local_idx = {f.id: i for i, f in enumerate(frames)}

        # Sparse edges from inlier matches.
        cap = self.ba_edge_cap
        ii = np.zeros(cap, np.int32)
        jj = np.zeros(cap, np.int32)
        pi = np.zeros((cap, 3), np.float32)
        pj = np.zeros((cap, 3), np.float32)
        cvalid = np.zeros(cap, bool)
        e = 0
        total_edges = 0
        for i in range(n_act):
            for j in range(i + 1, n_act):
                fa, fb = frames[j], frames[i]
                m = self.store.matches.get((fa.id, fb.id))
                if m is None:
                    continue
                sel = np.nonzero(m["inlier"])[0][:256]
                k = min(len(sel), cap - e)
                if k <= 0:
                    continue
                sel = sel[:k]
                ii[e : e + k] = local_idx[fa.id]
                jj[e : e + k] = local_idx[fb.id]
                pi[e : e + k] = m["pA"][sel]
                pj[e : e + k] = m["pB"][sel]
                cvalid[e : e + k] = True
                e += k
                total_edges += k
        if total_edges == 0:
            self.newframe.status = FAIL
            return

        poses = np.stack(
            [f.pose_in_model for f in frames]
            + [np.eye(4, dtype=np.float32)] * (N - n_act)
        )
        fixed = np.zeros(N, bool)
        fixed[0] = True
        for i, f in enumerate(frames):
            if f.nerfed:
                fixed[i] = True
        fixed[n_act:] = True

        xyz_ds, nrm_ds, ok_ds, K_ds = self._dense_maps(frames)
        h, w = xyz_ds.shape[1:3]
        pad = N - n_act
        if pad:
            xyz_ds = np.concatenate([xyz_ds, np.zeros((pad, h, w, 3), np.float32)])
            nrm_ds = np.concatenate([nrm_ds, np.zeros((pad, h, w, 3), np.float32)])
            ok_ds = np.concatenate([ok_ds, np.zeros((pad, h, w), bool)])
        n_pair_cap = N * (N - 1) // 2
        pair_i = np.zeros(n_pair_cap, np.int32)
        pair_j = np.zeros(n_pair_cap, np.int32)
        pair_valid = np.zeros(n_pair_cap, bool)
        p = 0
        for i in range(n_act):
            for j in range(i + 1, n_act):
                pair_i[p] = j
                pair_j[p] = i
                pair_valid[p] = True
                p += 1

        params = ba_mod.BAParams(
            num_iter_outer=int(bcfg["num_iter_outter"]),
            robust_delta=float(bcfg["robust_delta"]),
            w_fm=float(bcfg["w_fm"]),
            w_p2p=float(bcfg["w_p2p"]),
            image_downscale=int(bcfg["image_downscale"]),
            dense_max_dist=float(self.cfg["p2p"]["max_dist"]),
            dense_max_normal_angle=float(self.cfg["p2p"]["max_normal_angle"]),
            icp_rot_thres_deg=float(bcfg["icp_pose_rot_thres"]),
        )
        from ..utils import profiler

        profiler.count("launch/ba")
        profiler.count("readback/ba")
        out, _info = ba_mod.bundle_adjust(
            jnp.asarray(poses.astype(np.float32)), jnp.asarray(fixed),
            jnp.asarray(ii), jnp.asarray(jj), jnp.asarray(pi), jnp.asarray(pj),
            jnp.asarray(cvalid),
            jnp.asarray(pair_i), jnp.asarray(pair_j), jnp.asarray(pair_valid),
            jnp.asarray(xyz_ds.astype(np.float32)), jnp.asarray(nrm_ds.astype(np.float32)),
            jnp.asarray(ok_ds), jnp.asarray(K_ds.astype(np.float32)),
            params, N,
        )
        out = np.asarray(out)
        self._apply_ba_result(frames, local_idx, out)

    def _apply_ba_result(self, frames, local_idx, out):
        """Post-BA pose application + sanity gate on the new frame vs its
        immediate-previous reference (Bundler.cpp:926-946)."""
        nf = self.newframe
        new_pose = out[local_idx[nf.id]]
        if nf.ref_frame_id == nf.id - 1 and nf.ref_frame_id in self.frames:
            rcfg = self.cfg["ransac"]
            ref = self.frames[nf.ref_frame_id]
            inv_new = np.linalg.inv(new_pose)
            inv_ref = np.linalg.inv(ref.pose_in_model)
            trans_diff = np.linalg.norm(inv_new[:3, 3] - inv_ref[:3, 3])
            rot_diff = se3.rotation_geodesic_distance_np(
                inv_new[:3, :3], inv_ref[:3, :3]
            )
            if trans_diff > float(rcfg["max_trans_neighbor"]) or rot_diff > np.deg2rad(
                float(rcfg["max_rot_deg_neighbor"])
            ):
                nf.status = FAIL
                return

        for i, f in enumerate(frames):
            f.pose_in_model = out[i]
        self._cov_cache = {}

    # ------------------------------------------------------------------
    def match_and_optimize(self, pairs, frames, key) -> bool:
        """ONE-launch fused tail of the per-frame loop: match the fresh BA
        pairs, merge with previously-matched edges, and bundle-adjust — a
        single device program with a single packed readback
        (ops/fused_track.py; VERDICT r4 task #1).  Dense-term maps come
        from the resident device frame pool instead of a per-frame ~4.6 MB
        host upload (reference CUDACache residency, LossGPU.cpp:95-99).

        Returns False when the frame is ineligible (non-fused engine,
        raw-reuse pairs pending re-gating, oversized fresh batch) — the
        caller then runs the split find_corres + optimize path.
        """
        from ..models import matcher as matcher_mod
        from ..ops import fused_corres as fused_ops
        from ..ops import fused_track
        from ..utils import profiler
        from . import corres as corres_mod

        cfg = self.cfg
        store = self.store
        if not store.use_fused:
            return False
        cap = int(cfg["bundle"].get("fused_ba_pairs", 12))
        fresh = [p for p in pairs if (p[0].id, p[1].id) not in store.raw]
        if len(fresh) != len(pairs) or len(fresh) > cap:
            return False
        frames = sorted(frames, key=lambda f: f.id)
        N = self.max_ba_frames
        if len(frames) > N:
            return False
        local_idx = {f.id: i for i, f in enumerate(frames)}
        pool, slot_of = corres_mod.ensure_pool_frames(store, frames)
        mcfg = matcher_mod.CornerMatcherCfg(max_matches=store.max_matches)
        fcfg = corres_mod.make_fused_cfg(store, cfg, mcfg)
        pairs_data = corres_mod.build_pairs_data(store, fresh, cfg, slot_of)

        if pairs_data:
            pad = dict(pairs_data[0])
            pad["valid"] = False
        else:
            pad = {
                "slotA": 0, "slotB": 0, "valid": False,
                "tfA_inv": np.eye(3), "tfB_inv": np.eye(3),
                "poseA": np.eye(4, dtype=np.float32),
                "poseB": np.eye(4, dtype=np.float32),
                "extra_uv": np.zeros((0, 4)),
                "max_trans": 1.0, "max_rot_deg": 180.0,
            }
        pairs_data = pairs_data + [pad] * (cap - len(pairs_data))
        packed = fused_ops.pack_call(pairs_data, fcfg.n_extra)
        lij = np.full((cap, 2), -1, np.int32)
        for i, (fa, fb) in enumerate(fresh):
            lij[i] = (local_idx[fa.id], local_idx[fb.id])

        # previously-matched pairs among the local frames -> host edges
        keys = []
        for i in range(len(frames)):
            for j in range(i + 1, len(frames)):
                kk = (frames[j].id, frames[i].id)
                if store.matches.get(kk) is not None:
                    keys.append(kk)
        Eh = int(cfg["bundle"].get("fused_host_edge_cap", 8192))
        h_ii, h_jj, h_pi, h_pj, h_valid = fused_track.assemble_host_edges(
            store.matches, keys, local_idx, Eh)

        n_act = len(frames)
        poses = np.stack(
            [f.pose_in_model for f in frames]
            + [np.eye(4, dtype=np.float32)] * (N - n_act))
        fixed = np.zeros(N, bool)
        fixed[0] = True
        for i, f in enumerate(frames):
            if f.nerfed:
                fixed[i] = True
        fixed[n_act:] = True
        frame_slot = np.full(N, -1, np.int32)
        for i, f in enumerate(frames):
            frame_slot[i] = slot_of[f.id]

        n_pair_cap = N * (N - 1) // 2
        pair_i = np.zeros(n_pair_cap, np.int32)
        pair_j = np.zeros(n_pair_cap, np.int32)
        pair_valid = np.zeros(n_pair_cap, bool)
        p = 0
        for i in range(n_act):
            for j in range(i + 1, n_act):
                pair_i[p] = j
                pair_j[p] = i
                pair_valid[p] = True
                p += 1

        bcfg = cfg["bundle"]
        params = ba_mod.BAParams(
            num_iter_outer=int(bcfg["num_iter_outter"]),
            robust_delta=float(bcfg["robust_delta"]),
            w_fm=float(bcfg["w_fm"]),
            w_p2p=float(bcfg["w_p2p"]),
            image_downscale=int(bcfg["image_downscale"]),
            dense_max_dist=float(self.cfg["p2p"]["max_dist"]),
            dense_max_normal_angle=float(self.cfg["p2p"]["max_normal_angle"]),
            icp_rot_thres_deg=float(bcfg["icp_pose_rot_thres"]),
        )
        tcfg = fused_track.FusedTrackCfg(corres=fcfg, ba=params, n_frames=N)
        with span("track/fused_match_ba"):
            profiler.count("launch/fused_match_ba")
            profiler.count("readback/fused_match_ba")
            buf, out, _info = fused_track.fused_match_ba(
                pool.gray, pool.depth, pool.normals, pool.K,
                jnp.asarray(packed), jnp.asarray(lij), key,
                jnp.asarray(poses.astype(np.float32)), jnp.asarray(fixed),
                jnp.asarray(frame_slot),
                jnp.asarray(h_ii), jnp.asarray(h_jj),
                jnp.asarray(h_pi), jnp.asarray(h_pj), jnp.asarray(h_valid),
                jnp.asarray(pair_i), jnp.asarray(pair_j),
                jnp.asarray(pair_valid), tcfg,
            )
            res = fused_ops.unpack_result(buf, store.max_matches)
            out = np.asarray(out)
        corres_mod.commit_fused_results(store, fresh, res)

        total_edges = int(h_valid.sum()) + sum(
            store.n_inliers((fa.id, fb.id)) for fa, fb in fresh)
        if total_edges == 0:
            self.newframe.status = FAIL
            return True
        self._apply_ba_result(frames, local_idx, out)
        return True
