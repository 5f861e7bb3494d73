"""BundleSdf orchestrator: the per-frame online tracking + reconstruction
loop with an interleaved Neural-Object-Field trainer.

Re-design of the reference bundlesdf.py:
  * ``run``               — bundlesdf.py:510-632 per-frame driver
  * ``process_new_frame`` — bundlesdf.py:391-506 (FAIL gates, reference-
    frame re-selection by covisibility, Procrustes bootstrap, window
    eviction, BA-subset selection, pair matching, BA, keyframe admission)
  * NOF scheduling        — the reference's tracker/NeRF process pair +
    Manager-dict queue (bundlesdf.py:64-260 run_nerf, :546-617 sync logic)
    becomes an **interleaved scheduler in one runtime**: when the newest
    frame becomes the latest keyframe, pending keyframes are handed to the
    NOF runner and — under strict sync (sync_max_delay 0, config.yml:102) —
    a training chunk runs before tracking continues.  Optimized keyframe
    poses feed back and freeze those keyframes in BA (`nerfed`), matching
    the reference contract exactly, without pickled IPC.
  * ``run_global_nerf``   — bundlesdf.py:636-766 offline refinement.

The two "threads + memory pool" of the paper become two jitted super-steps
(track step, NOF chunk) sharing device-resident state.
"""
from __future__ import annotations

import logging
import os

import numpy as np
import jax
import jax.numpy as jnp

from ..config import Cfg, default_nof_config, default_track_config
from ..io import scene_bounds as sb
from ..nof.runner import NofRunner, mesh_to_real_world
from ..tracking import corres as corres_mod
from ..utils.profiler import span
from ..tracking.frame import FAIL, Frame
from ..tracking.pool import Bundler
from ..utils import geometry, se3

GLCAM_IN_CVCAM = np.asarray(geometry.GLCAM_IN_CVCAM)


class BundleSdf:
    def __init__(
        self,
        cfg_track: Cfg | None = None,
        cfg_nof: Cfg | None = None,
        out_dir: str = "/tmp/bundlesdf_tpu_out",
        start_nerf_keyframes: int = 5,
        use_nof: bool = True,
        save_artifacts: bool = False,
        use_gui: bool = False,
    ):
        self.save_artifacts = save_artifacts
        self.gui = None
        if use_gui:
            from ..viz.gui import Dashboard

            self.gui = Dashboard(out_dir)
        self.cfg_track = cfg_track or default_track_config()
        self.cfg_nof = cfg_nof or default_nof_config()
        self.out_dir = out_dir
        os.makedirs(out_dir, exist_ok=True)
        self.bundler = Bundler(self.cfg_track)
        self.start_nerf_keyframes = start_nerf_keyframes
        self.use_nof = use_nof
        self.cnt = -1
        self.K = None
        self.nof: NofRunner | None = None
        self._kf_sent = 0          # how many keyframes have been handed to NOF
        self._nof_steps_left = 0   # undispatched steps of the open NOF round
        self._nof_open = False     # a round is in flight (not yet completed)
        self._nof_poses_pending = None
        self.mesh = None
        self.translation = None
        self.sc_factor = None
        self._pcd_real = None      # running fused cloud (real scale)
        self.poses_log: dict[str, np.ndarray] = {}

    # ------------------------------------------------------------------
    def run(self, color, depth, K, id_str, mask=None, occ_mask=None,
            pose_in_model=np.eye(4)):
        """Process one RGBD frame; returns the frame (with pose_in_model)."""
        self.cnt += 1
        if self.K is None:
            self.K = np.asarray(K, dtype=np.float32)
        if self.use_nof:
            # keep the device chewing NOF while the host preps this frame
            self._nof_pump()
        depth = np.asarray(depth, dtype=np.float32).copy()

        percentile = float(self.cfg_track["depth_processing"]["percentile"])
        if percentile < 100 and mask is not None:
            valid = (depth >= 0.1) & (mask > 0)
            if valid.any():
                thres = np.percentile(depth[valid], percentile)
                depth[depth >= thres] = 0
        with span("track/make_frame"):
            frame = Frame(
                color, depth, self.K, self.cnt, id_str, self.cfg_track,
                pose_in_model=np.asarray(pose_in_model, dtype=np.float32),
                fg_mask=mask, occ_mask=occ_mask,
            )
        with span("track/process_new_frame"):
            self.process_new_frame(frame)

        if self.use_nof:
            # NOF scheduling under the reference sync contract
            # (bundlesdf.py:571-582 + config.yml sync_max_delay), re-expressed
            # for one runtime with JAX async dispatch: a training ROUND is
            # dispatched to the device in small loop-chunks with a bounded
            # queue depth (_nof_pump), the host keeps tracking while the
            # device trains (the reference's concurrent NeRF worker), and
            # round COMPLETION (drain + pose export + feedback) happens on a
            # non-blocking poll once the queue is observed idle — the
            # tracker only ever blocks at the reference wait-loop gate:
            # a new keyframe with backlog >= max(1, delay).
            n_kf = len(self.bundler.keyframes)
            new_kf = bool(self.bundler.keyframes) and \
                self.bundler.keyframes[-1] is frame
            delay = int(self.cfg_nof.get("sync_max_delay", 0))
            backlog = n_kf - self._kf_sent
            self._nof_poll()
            if self._nof_open and new_kf and backlog >= max(1, delay):
                with span("nof/sync_wait"):
                    self._nof_round_finish()
            if not self._nof_open and backlog >= 1 and (
                    (self.nof is not None)
                    or (n_kf >= self.start_nerf_keyframes)):
                with span("nof/round_start"):
                    self._nof_round_start()
                if delay == 0 and self._nof_open:
                    # Strict lockstep (sync_max_delay 0, config.yml:102): the
                    # reference wait loop (bundlesdf.py:571-582) blocks until
                    # the round containing the just-pushed keyframe finishes,
                    # so the new round drains synchronously too (ADVICE r3 #1).
                    with span("nof/sync_wait"):
                        self._nof_round_finish()
            self._nof_pump()

        self.poses_log[id_str] = np.linalg.inv(frame.pose_in_model)  # ob_in_cam
        if self.gui is not None:
            self.gui.update(
                np.asarray(frame.color), np.asarray(frame.fg_mask),
                np.linalg.inv(frame.pose_in_model), self.K, id_str,
                mesh=self.mesh, n_keyframes=len(self.bundler.keyframes),
            )
        if self.save_artifacts:
            from .artifacts import save_newframe_result

            save_newframe_result(
                self, frame, self.out_dir, int(self.cfg_track["SPDLOG"])
            )
        return frame

    # ------------------------------------------------------------------
    def process_new_frame(self, frame: Frame):
        """Parity with bundlesdf.py:391-506."""
        b = self.bundler
        b.newframe = frame
        cfg = self.cfg_track

        if frame.id > 0:
            if b.frames:
                ref = b.frames[sorted(b.frames.keys())[-1]]
            elif b.keyframes:
                ref = b.keyframes[-1]
            else:
                frame.status = FAIL
                return
            frame.ref_frame_id = ref.id
            frame.pose_in_model = ref.pose_in_model.copy()
        else:
            b.firstframe = frame

        if frame.id == 0 and np.abs(frame.pose_in_model - np.eye(4)).max() <= 1e-4:
            frame.set_new_init_coordinate()

        n_fg = int(frame.fg_mask.sum())
        if n_fg < 100:
            logging.info(f"frame {frame.id_str}: empty mask, FAIL")
            frame.status = FAIL
            b.forget_frame(frame)
            return

        if bool(cfg["depth_processing"]["denoise_cloud"]):
            frame.point_cloud_denoise()

        n_valid = frame.count_valid_points()
        if frame.id > 0:
            n_first = b.firstframe.count_valid_points()
            if n_valid < n_first / 40.0:
                logging.info(f"frame {frame.id_str}: too few valid points, FAIL")
                frame.status = FAIL
                b.forget_frame(frame)
                return

        if frame.id == 0:
            b.check_and_add_keyframe(frame)
            b.frames[frame.id] = frame
            return

        min_match = int(cfg["feature_corres"]["min_match_with_ref"])
        key = jax.random.PRNGKey(frame.id)
        with span("track/find_corres_ref"):
            corres_mod.find_corres(b.store, [(frame, ref)], cfg, key=key)
        if b.store.n_inliers((frame.id, ref.id)) < min_match:
            # Relocalize against the pool: try keyframes by covisibility
            # (bundlesdf.py:443-471).
            ranked = sorted(
                b.keyframes, key=lambda kf: -b.covisibility(frame, kf)
            )
            found = False
            for kf in ranked:
                if kf.id == ref.id:
                    continue
                frame.ref_frame_id = kf.id
                frame.pose_in_model = kf.pose_in_model.copy()
                corres_mod.find_corres(b.store, [(frame, kf)], cfg, key=key)
                if b.store.n_inliers((frame.id, kf.id)) >= min_match:
                    ref = kf
                    found = True
                    break
            if not found:
                logging.info(f"frame {frame.id_str}: no suitable ref frame, FAIL")
                frame.status = FAIL
                b.forget_frame(frame)
                return

        offset = corres_mod.procrustes_offset(b.store, frame, ref)
        frame.pose_in_model = (offset @ frame.pose_in_model).astype(np.float32)

        window_size = int(cfg["bundle"]["window_size"])
        kf_ids = {kf.id for kf in b.keyframes}
        if len(b.frames) - sum(1 for fid in b.frames if fid in kf_ids) > window_size:
            for fid in sorted(b.frames.keys()):
                if b.forget_frame(b.frames[fid]):
                    break
        b.frames[frame.id] = frame

        with span("track/select_keyframes"):
            b.select_keyframes_for_ba()
        pairs = b.get_feature_match_pairs(b.local_frames)
        # Fused tail (VERDICT r4 #1): fresh-pair matching + BA in ONE
        # device launch with ONE readback.  Falls back to the split path
        # when ineligible (non-fused engine, raw-reuse pairs pending,
        # oversized batch).
        fused_done = False
        if bool(cfg["bundle"].get("fused_ba", True)):
            fused_done = b.match_and_optimize(pairs, b.local_frames, key)
        if not fused_done:
            with span("track/find_corres_ba"):
                corres_mod.find_corres(b.store, pairs, cfg, key=key)
            if frame.status == FAIL:
                b.forget_frame(frame)
                return
            with span("track/ba"):
                b.optimize(b.local_frames)
        if frame.status == FAIL:
            b.forget_frame(frame)
            return

        b.check_and_add_keyframe(frame)

    # ------------------------------------------------------------------
    def _run_nof_chunk(self):
        """Hand pending keyframes to the NOF runner and train one full round
        synchronously (the reference run_nerf iteration, bundlesdf.py:64-260).
        Composite of round_start + drain + complete, used by on_finish and
        offline flows; the online path advances rounds incrementally."""
        self._nof_round_start()
        if self._nof_open:
            self._nof_round_finish()

    def _nof_round_start(self):
        """Prepare the next NOF round: snapshot pending keyframes into the
        runner (or create it), set the round's step budget.  Training itself
        is dispatched by _nof_round_advance."""
        kfs = self.bundler.keyframes
        new_kfs = kfs[self._kf_sent:]
        n_step = int(self.cfg_nof["n_step"])
        # Extension rounds keep the continually-trained weights, so they
        # need fewer steps than the reference's from-scratch retrain
        # (nerf_runner.py:350-380 add_new_frames(reuse_weights=False) +
        # create_nerf) — n_step_extend 0 keeps strict n_step parity.
        n_extend = int(self.cfg_nof.get("n_step_extend", 0)) or n_step
        if not new_kfs and self.nof is not None:
            # No new keyframes — keep refining with the updated poses.
            self._sync_poses_into_nof()
            self._set_round_budget(n_extend)
            return
        if not new_kfs:
            return

        rgbs = np.stack([f.color / 255.0 if f.color.max() > 1.5 else f.color for f in new_kfs]).astype(np.float32)
        depths = np.stack([f.depth for f in new_kfs]).astype(np.float32)
        masks = np.stack([f.fg_mask for f in new_kfs]).astype(np.float32)
        cam_in_obs = np.stack([f.pose_in_model for f in kfs])
        glcam_in_obs = cam_in_obs @ GLCAM_IN_CVCAM

        if not any(((d >= 0.1) & (m > 0)).any()
                   for d, m in zip(depths, masks)):
            logging.warning(
                "NOF chunk skipped: no keyframe has valid masked depth"
            )
            self._kf_sent = len(kfs)
            return
        first = self.nof is None
        if self.nof is None:
            with span("nof/scene_bounds"):
                sc, tr, pcd_real, pcd_norm = sb.compute_scene_bounds(
                    rgbs, depths, masks, self.K, glcam_in_obs,
                    eps=float(self.cfg_nof["dbscan_eps"]),
                    min_samples=int(self.cfg_nof["dbscan_eps_min_samples"]),
                )
            sc *= 0.7  # online margin (bundlesdf.py:151)
            self.sc_factor = sc
            self.translation = tr
            self.cfg_nof["sc_factor"] = float(sc)
            self.cfg_nof["translation"] = tr.tolist()
            self._pcd_real = pcd_real
            if self.save_artifacts:
                # config-as-artifact with the computed normalization, so
                # global refine reuses the exact online mapping (reference
                # reloads the last online nerf config, bundlesdf.py:696-700)
                self.cfg_nof.save(f"{self.out_dir}/config_nerf.yml")
            pr, pd, pm, poses_n = self._preprocess(rgbs, depths, masks, glcam_in_obs)
            pcd_norm = (self._pcd_real + self.translation) * self.sc_factor
            with span("nof/create_runner"):
                self.nof = NofRunner(
                    self.cfg_nof, pr, pd, pm, poses_n, self.K, pcd_norm
                )
        else:
            # incrementally fuse new keyframe clouds (bundlesdf.py:162-177)
            with span("nof/fuse_cluster"):
                pts_new = []
                for i, f in enumerate(new_kfs):
                    glc = f.pose_in_model @ GLCAM_IN_CVCAM
                    pts, _ = sb.fuse_frame_cloud(depths[i], rgbs[i], masks[i], self.K, glc)
                    if pts is not None:
                        pts_new.append(pts)
                allpts = np.concatenate([self._pcd_real] + pts_new) if pts_new else self._pcd_real
                allpts, _ = sb.voxel_downsample(allpts, None, 0.01)
                allpts, _ = sb.find_biggest_cluster(
                    allpts, eps=float(self.cfg_nof["dbscan_eps"]),
                    min_samples=int(self.cfg_nof["dbscan_eps_min_samples"]),
                )
                self._pcd_real = allpts
            pr, pd, pm, poses_n = self._preprocess(rgbs, depths, masks, glcam_in_obs)
            pcd_norm = (allpts + self.translation) * self.sc_factor
            with span("nof/add_new_frames"):
                self.nof.add_new_frames(pr, pd, pm, poses_n, pcd_norm)

        self._kf_sent = len(kfs)
        self._set_round_budget(n_step if first else n_extend)

    def _set_round_budget(self, budget: int):
        """Open a round with ``budget`` steps, deducting steps spent by the
        session's one calibration chunk (calibrate_step_ms trains for real
        — total step budget stays exact).  The deduction never shrinks a
        round below one loop-chunk (a zero-step round would hand keyframes
        over untrained); unrepaid debt carries to later rounds."""
        cal = getattr(self.nof, "_calibrate_steps", 0) if self.nof else 0
        if cal:
            self.nof._calibrate_steps = 0
        debt = getattr(self, "_cal_debt", 0) + cal
        chunk = self.nof.loop_chunk if self.nof else 1
        use = min(debt, max(0, int(budget) - chunk))
        self._cal_debt = debt - use
        self._nof_steps_left = int(budget) - use
        self._nof_open = self._nof_steps_left > 0

    def _nof_pump(self, depth: int | None = None):
        """Keep the device queue primed with up to ``depth`` NOF chunks —
        without ever blocking.  Small chunks bound how long a tracker
        launch can queue behind NOF work; the poll completes the round once
        its budget is dispatched AND the queue is observed idle."""
        if depth is None:
            depth = int(self.cfg_nof.get("nof_queue_depth", 2))
        if self.nof is not None and self._nof_steps_left > 0:
            chunk = self.nof.loop_chunk
            with span("nof/advance"):
                while (self._nof_steps_left > 0
                       and self.nof.pending_chunks() < depth):
                    n = min(chunk, self._nof_steps_left)
                    self.nof.train_advance(n)
                    self._nof_steps_left -= n
        self._nof_poll()

    def _nof_poll(self):
        """Complete the open round iff its budget is fully dispatched and
        the device queue has drained — non-blocking (the drain inside
        _nof_round_complete is then free)."""
        if (self._nof_open and self._nof_steps_left == 0
                and self.nof is not None and self.nof.train_queue_ready()):
            self._nof_round_complete()
            self._nof_open = False

    def _nof_round_finish(self):
        """BLOCKING round completion: dispatch any remaining budget, drain,
        complete (the reference wait loop, bundlesdf.py:571-582)."""
        if not self._nof_open:
            return
        if self._nof_steps_left > 0:
            self.nof.train_advance(self._nof_steps_left)
            self._nof_steps_left = 0
        self._nof_round_complete()
        self._nof_open = False

    def _nof_round_complete(self):
        """Drain the round, export optimized poses, apply feedback — the
        reference's end-of-round p_dict writes (bundlesdf.py:244-255) +
        tracker-side pose sync (:584-617)."""
        self.nof.train_drain()
        with span("nof/pose_export"):
            poses_out, offset = self.nof.get_optimized_poses_in_real_world()
        self._nof_poses_pending = poses_out
        # Per-chunk mesh extraction only feeds the GUI (reference writes the
        # mesh into the shared dict each NeRF batch, bundlesdf.py:237-241);
        # headless runs get the mesh once at on_finish (~7.5 s/chunk saved).
        if self.gui is not None:
            mesh = self.nof.extract_mesh()
            self.mesh = mesh_to_real_world(
                mesh, offset, np.asarray(self.cfg_nof["translation"]), self.sc_factor
            )
        else:
            self._mesh_offset = offset
        with span("nof/feedback"):
            self._apply_nof_feedback()
        if not getattr(self.nof, "_step_ms", 0.0) and \
                bool(self.cfg_nof.get("calibrate_step", True)):
            # one-time per-step device-time calibration (feeds the profile's
            # overlap_frac accounting); runs REAL steps while the queue is
            # idle anyway — deducted from the next round's budget.
            with span("nof/calibrate"):
                self.nof.calibrate_step_ms()

    def _preprocess(self, rgbs, depths, masks, glcam_in_obs):
        """preprocess_data parity (nerf_helpers.py:218-240): normalize rgb,
        mark bad depth/color, scale depth & poses."""
        from ..nof.runner import BAD_COLOR, BAD_DEPTH

        sc = self.sc_factor
        tr = np.asarray(self.translation)
        rgbs = rgbs.copy()
        depths = depths.copy()
        depths[depths < 0.1] = BAD_DEPTH
        rgbs[masks == 0] = BAD_COLOR / 255.0
        depths[masks == 0] = BAD_DEPTH
        depths = depths * sc
        # all keyframe poses (not only new frames) — NOF runner gets the
        # full set each extension
        poses = glcam_in_obs.copy()
        poses[:, :3, 3] += tr
        poses[:, :3, 3] *= sc
        return rgbs, depths, masks, poses.astype(np.float32)

    def _sync_poses_into_nof(self):
        kfs = self.bundler.keyframes[: self.nof.n_frames]
        cam_in_obs = np.stack([f.pose_in_model for f in kfs])
        glcam = cam_in_obs @ GLCAM_IN_CVCAM
        glcam[:, :3, 3] += np.asarray(self.translation)
        glcam[:, :3, 3] *= self.sc_factor
        self.nof.c2w_np[: len(kfs)] = glcam.astype(np.float32)
        self.nof.update_c2w()

    def _apply_nof_feedback(self):
        """Write optimized keyframe poses back + freeze them in BA
        (bundlesdf.py:584-617)."""
        if self._nof_poses_pending is None:
            return
        poses = self._nof_poses_pending
        rematch = bool(self.cfg_track["feature_corres"]["rematch_after_nerf"])
        large_update = []
        for i in range(min(len(poses), len(self.bundler.keyframes))):
            kf = self.bundler.keyframes[i]
            if rematch:
                t_upd = np.linalg.norm(poses[i][:3, 3] - kf.pose_in_model[:3, 3])
                r_upd = float(se3.rotation_geodesic_distance(
                    jnp.asarray(poses[i][:3, :3]),
                    jnp.asarray(kf.pose_in_model[:3, :3]),
                ))
                if t_upd >= 0.005 or r_upd >= np.deg2rad(5):
                    large_update.append(kf)
            kf.pose_in_model = poses[i].astype(np.float32)
            kf.nerfed = True
        if rematch:
            # Invalidate only the gated matches; the raw pixel-match table
            # survives so the next find_corres re-gates + re-RANSACs under
            # the updated poses WITHOUT re-running the matcher network
            # (reference bundlesdf.py:607-617 + rawMatchesToCorres).
            for kf in large_update:
                self.bundler.store.invalidate_matches(kf.id)
        self.bundler._cov_cache = {}
        self._nof_poses_pending = None

    # ------------------------------------------------------------------
    def on_finish(self):
        """Final NOF pass over any remaining keyframes (reference
        on_finish bundlesdf.py:324-338 waits for the worker to drain)."""
        if self.use_nof and self.bundler.keyframes:
            if self._nof_open:
                # drain the in-flight round
                with span("nof/sync_wait"):
                    self._nof_round_finish()
            if self.nof is None or self._kf_sent < len(self.bundler.keyframes):
                self._run_nof_chunk()
        if self.mesh is None and self.nof is not None:
            # headless runs skip per-chunk extraction; produce the final mesh
            with span("nof/extract_mesh_final"):
                mesh = self.nof.extract_mesh()
                self.mesh = mesh_to_real_world(
                    mesh, getattr(self, "_mesh_offset", np.eye(4)),
                    np.asarray(self.cfg_nof["translation"]), self.sc_factor,
                )
        from ..utils.profiler import report

        logging.info("timing profile:\n%s", report(min_total=0.01))
        return self.mesh

    # ------------------------------------------------------------------
    def run_global_nerf(self, frames_data: list[dict], cfg_refine: Cfg | None = None,
                        get_texture: bool = False):
        """Offline global refinement (bundlesdf.py:636-766): retrain a NOF
        from saved keyframe data with the offline budget, extract the final
        cleaned mesh.

        frames_data: list of dicts {color, depth, mask, cam_in_ob(4x4 CV)}.
        """
        from ..utils.mesh import largest_component

        cfg = cfg_refine or self.cfg_nof.merged({
            "n_step": 2000, "N_samples": 64, "N_samples_around_depth": 256,
            "num_levels": 16, "finest_res": 256, "frame_features": 2,
            "rgb_weight": 100.0,
            # offline steps are ~10x costlier than online; keep a single
            # scanned launch under ~1 min (the tunneled TPU worker kills
            # launches that run for many minutes)
            "loop_chunk": 10,
        })
        n_limit = int(cfg["n_train_image"])
        if len(frames_data) > n_limit:
            idx = np.linspace(0, len(frames_data) - 1, n_limit).astype(int)
            frames_data = [frames_data[i] for i in idx]

        rgbs = np.stack([f["color"] for f in frames_data]).astype(np.float32)
        if rgbs.max() > 1.5:
            rgbs = rgbs / 255.0
        depths = np.stack([f["depth"] for f in frames_data]).astype(np.float32)
        masks = np.stack([f["mask"] for f in frames_data]).astype(np.float32)
        cam_in_obs = np.stack([f["cam_in_ob"] for f in frames_data])
        glcam_in_obs = cam_in_obs @ GLCAM_IN_CVCAM

        if self.sc_factor is None or self._pcd_real is None:
            sc, tr, pcd_real, pcd_norm = sb.compute_scene_bounds(
                rgbs, depths, masks, self.K, glcam_in_obs,
                eps=float(cfg["dbscan_eps"]),
                min_samples=int(cfg["dbscan_eps_min_samples"]),
            )
            if self.sc_factor is None:  # else keep the online normalization
                self.sc_factor, self.translation = sc, tr
            self._pcd_real = pcd_real
        cfg["sc_factor"] = float(self.sc_factor)
        cfg["translation"] = np.asarray(self.translation).tolist()
        cfg["max_kf_pool"] = max(int(cfg.get("max_kf_pool", 128)), len(frames_data))
        saved = (self.cfg_nof, self.nof)
        self.cfg_nof = cfg
        pr, pd, pm, poses_n = self._preprocess(rgbs, depths, masks, glcam_in_obs)
        pcd_norm = (self._pcd_real + self.translation) * self.sc_factor
        nof = NofRunner(cfg, pr, pd, pm, poses_n, self.K, pcd_norm)
        nof.train(int(cfg["n_step"]))
        mesh = nof.extract_mesh()
        mesh = largest_component(mesh)
        poses_out, offset = nof.get_optimized_poses_in_real_world()
        mesh = mesh_to_real_world(mesh, offset, np.asarray(cfg["translation"]), self.sc_factor)
        if get_texture:
            from ..nof.texture import (bake_texture_from_train_images,
                                       bake_vertex_colors)
            mesh = bake_vertex_colors(mesh, nof, rgbs, depths, masks, cam_in_obs, self.K)
            mesh, tex = bake_texture_from_train_images(
                mesh, rgbs, depths, masks, cam_in_obs, self.K
            )
            self.texture = tex
        self.cfg_nof, _old = saved[0], saved[1]
        self.global_nof = nof
        return mesh, poses_out
