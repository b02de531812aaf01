"""System facade: the public entry point of the framework.

Equivalent of ORB_SLAM2::System (/root/reference/src/System.cc:32-117 ctor,
track entries :119-325, Shutdown :408, SaveTrajectory* :434-601). Owns the
tracker, the mapping stage, the dynamic-object subsystem, and (when enabled)
loop closing. The reference's thread spawning + mutex wiring (:87-116)
becomes explicit pipeline stages over pytrees.
"""
from __future__ import annotations

from typing import Optional

import numpy as np

from .config import SystemConfig
from .utils.camera import Intrinsics
from .frontend.frame import build_frame, Frame
from .frontend.tracking import Tracker, TrackStats
from .frontend.boxtrack import BoxTrackerState, track_boxes
from .io import trajectory as traj_io


def intrinsics_from_config(cfg: SystemConfig) -> Intrinsics:
    c = cfg.camera
    return Intrinsics.create(c.fx, c.fy, c.cx, c.cy, c.k1, c.k2, c.p1, c.p2,
                             c.k3, c.bf, c.width, c.height)


class System:
    def __init__(self, cfg: SystemConfig):
        self.cfg = cfg
        self.cam = intrinsics_from_config(cfg)
        self.tracker = Tracker(cfg, self.cam,
                               stereo_obs=cfg.sensor in ("stereo", "rgbd"))
        self.boxes = BoxTrackerState.empty()
        self.frame_id = 0
        self.dynamics = None      # wired by frontend.dynamics when enabled
        if cfg.detector.mode != "off":
            from .frontend.dynamics import DynamicsModule
            self.dynamics = DynamicsModule(cfg, self.cam)
        # online detector (ref runs YOLO inline in the track entries,
        # src/Tracking.cc:1095-1132): trained weights required — the
        # shipped asset is used when no path is configured
        self.detector = None
        if cfg.detector.mode == "online":
            from .models.detector import Detector, default_detector_weights
            wpath = cfg.detector.weights_path or default_detector_weights()
            if wpath:
                self.detector = Detector.from_npz(
                    cfg.detector, cfg.camera.height, cfg.camera.width,
                    wpath, seed=cfg.seed)
            else:
                self.detector = Detector(cfg.detector, cfg.camera.height,
                                         cfg.camera.width, seed=cfg.seed)
        # place recognition (vocabulary trained lazily on the first KF,
        # unless a pretrained one is configured)
        self.voc = None
        self.loop = None
        if cfg.vocabulary.path:
            from .models import vocabulary as voc_mod
            self.voc = voc_mod.load(cfg.vocabulary.path)
        self.tracker.on_keyframe = self._on_keyframe
        self.tracker.relocalizer = self._relocalize
        self.tracker.on_reloc = self._on_reloc
        # dense point-cloud mapping owned by the System, as the reference's
        # PointCloudMapping is (System.cc:84-85, SavePCD :430)
        self.dense = None
        self._gba = None               # in-flight amortized post-loop GBA
        self._recent_frames = {}       # frame_id -> (gray, depth, mask)
        if cfg.pointcloud.enabled and cfg.sensor == "rgbd":
            from .backend.dense_map import DenseMapper
            self.dense = DenseMapper(cfg, self.cam)

    # ------------------------------------------------------------------
    def _ensure_voc(self):
        if self.voc is None:
            from .models import vocabulary as voc_mod
            # prefer the shipped pretrained asset (tools/train_vocab.py);
            # fall back to lazy training from the first keyframe's
            # descriptors if no asset exists or the config opts out
            # (cfg.vocabulary.prefer_asset=False trains scene-adapted
            # words instead)
            apath = voc_mod.default_vocab_path() \
                if self.cfg.vocabulary.prefer_asset else None
            if apath is not None:
                self.voc = voc_mod.load(apath)
            else:
                m = self.tracker.map
                desc = np.asarray(m.kf_kp_desc[0])[
                    np.asarray(m.kf_kp_valid[0])]
                self.voc = voc_mod.train(
                    desc, k=self.cfg.vocabulary.k,
                    levels=min(self.cfg.vocabulary.levels, 3),
                    seed=self.cfg.seed)
        if self.loop is None:
            from .backend.loop_closing import LoopCloser
            self.loop = LoopCloser(self.cfg, self.cam, self.voc)

    def _on_keyframe(self, k: int):
        self._ensure_voc()
        stereo = self.cfg.sensor in ("stereo", "rgbd")
        m, result = self.loop.on_keyframe(self.tracker.map, k, stereo,
                                          seq=self.tracker.kf_seq)
        self.tracker.map = m
        self.last_loop = result
        if result.closed and self.cfg.loop.run_global_ba:
            from .backend.global_ba import AmortizedGBA
            self._gba = AmortizedGBA(
                m, self.cam, stereo=stereo,
                total_iters=self.cfg.optimizer.global_ba_iters,
                slice_iters=self.cfg.loop.gba_slice_iters,
                scale_factor=self.cfg.orb.scale_factor)

    def _gba_step(self):
        """Advance the amortized post-loop GBA by one slice per frame and
        merge when converged (the reference's background-GBA analog)."""
        if self._gba is None:
            return
        self._gba.step()
        if self._gba.done:
            self.tracker.map = self._gba.merge(self.tracker.map)
            self.tracker._kf_pose_cache.clear()
            self._gba = None

    def _on_reloc(self, k_last: int, cand: int):
        """Reloc-triggered drift correction (tracker.on_reloc hook): a
        successful relocalization verified a loop between the last
        pre-loss keyframe and the matched candidate; close it through the
        standard machinery (LoopCloser.on_relocalization) and, like a
        detector-found closure, trigger the amortized post-loop GBA."""
        if self.loop is None:
            return
        stereo = self.cfg.sensor in ("stereo", "rgbd")
        m, result = self.loop.on_relocalization(
            self.tracker.map, k_last, cand, stereo, seq=self.tracker.kf_seq)
        if result.closed:
            self.tracker.map = m
            self.tracker._kf_pose_cache.clear()
            self.last_loop = result
            # own counter: last_loop can be overwritten by the next
            # keyframe's (non-closed) LoopResult before a caller polls it
            self.n_reloc_corrections = getattr(
                self, "n_reloc_corrections", 0) + 1
            if self.cfg.loop.run_global_ba:
                from .backend.global_ba import AmortizedGBA
                self._gba = AmortizedGBA(
                    m, self.cam, stereo=stereo,
                    total_iters=self.cfg.optimizer.global_ba_iters,
                    slice_iters=self.cfg.loop.gba_slice_iters,
                    scale_factor=self.cfg.orb.scale_factor)

    def _relocalize(self, frame):
        if self.loop is None:
            return False, None, None, None, -1
        from .backend import relocalization
        return relocalization.relocalize(
            self.tracker.map, self.loop.db, self.voc, self.cam, frame.data,
            seed=self.cfg.seed + frame.frame_id,
            min_inliers=self.cfg.tracking.min_inliers_after_reloc,
            use_direct_index=self.cfg.vocabulary.use_direct_index,
            di_level=self.cfg.vocabulary.direct_index_level)

    # ------------------------------------------------------------------
    def _maybe_detect(self, image: np.ndarray,
                      detections: Optional[np.ndarray],
                      stereo: bool = False) -> Optional[np.ndarray]:
        """Online detection when no precomputed boxes were passed (ref
        yolov3Segment call in the track entries, src/Tracking.cc:1095)."""
        if detections is not None or self.detector is None:
            return detections
        det = self.detector.detect(image)
        v = np.asarray(det.valid)
        if not v.any():
            return None
        boxes = np.asarray(det.boxes)[v]
        pad = self.cfg.detector.quarantine_pad
        if pad > 0:
            cx = (boxes[:, 0] + boxes[:, 2]) / 2
            cy = (boxes[:, 1] + boxes[:, 3]) / 2
            hw = (boxes[:, 2] - boxes[:, 0]) / 2 * (1 + pad)
            hh = (boxes[:, 3] - boxes[:, 1]) / 2 * (1 + pad)
            boxes = np.stack([cx - hw, cy - hh, cx + hw, cy + hh], 1)
        if stereo:
            from .models.detector import reshape_boxes_stereo
            boxes = reshape_boxes_stereo(boxes)
        return boxes

    def _advance_boxes(self, detections: Optional[np.ndarray]):
        if detections is None:
            detections = np.zeros((0, 4), np.float32)
        self.boxes = track_boxes(
            self.boxes, detections,
            iou_threshold=self.cfg.dynamic.iou_match_threshold,
            max_missed=self.cfg.dynamic.velocity_ghost_frames,
            max_boxes=self.cfg.dynamic.max_boxes)

    def _active_boxes(self):
        """Boxes currently quarantining features: tentative or confirmed
        dynamic (status 1 = reclassified static boxes stop gating)."""
        if len(self.boxes.boxes) == 0:
            return None, None
        act = self.boxes.status != 1
        return self.boxes.boxes, act

    # ------------------------------------------------------------------
    def track_rgbd(self, gray: np.ndarray, depth: np.ndarray,
                   timestamp: float,
                   detections: Optional[np.ndarray] = None,
                   mask: Optional[np.ndarray] = None,
                   prefetch_next: Optional[tuple] = None) -> TrackStats:
        """RGB-D entry (ref System::TrackRGBD :222-273 + box overload).

        prefetch_next: optional (gray, depth) of the NEXT frame — its
        upload starts on a worker thread and overlaps this frame's
        readback (pass the SAME array objects to the next call)."""
        detections = self._maybe_detect(gray, detections)
        self._advance_boxes(detections)
        if prefetch_next is not None and self.tracker.state == "OK":
            self.tracker.prefetch(*prefetch_next)
        boxes, bvalid = self._active_boxes()
        if mask is None:
            # fused fast path (one device call per frame, dynamics fused in)
            dyn = self._dyn_args(timestamp, stride=True)
            if dyn is not None and len(self.boxes.boxes):
                # classification must keep seeing ALL boxes (a box can move
                # 1 -> 2 when it starts moving); status gating happens
                # inside the fused step via dyn["box_status"]
                boxes = self.boxes.boxes
                bvalid = np.ones(len(boxes), bool)
            if self.dense is not None:
                self._cache_frame(self.frame_id, gray, depth, None)
            st = self.tracker.step_images(
                gray, depth, boxes, bvalid, self.frame_id, timestamp,
                dyn=dyn)
            self._dyn_after(st, timestamp)
            self._dense_after(st)
            self._gba_step()
            self.frame_id += 1
            return st
        frame = build_frame(self.cfg, self.cam, gray, self.frame_id,
                            timestamp, depth_map=depth, boxes=boxes,
                            box_valid=bvalid, mask=mask)
        frame.box_ids = self.boxes.ids.copy() if boxes is not None else None
        if self.dense is not None:
            self._cache_frame(self.frame_id, gray, depth, mask)
        st = self._track_common(frame)
        self._dense_after(st)
        return st

    def track_stereo(self, left: np.ndarray, right: np.ndarray,
                     timestamp: float,
                     detections: Optional[np.ndarray] = None,
                     prefetch_next: Optional[tuple] = None) -> TrackStats:
        """Stereo entry (ref System::TrackStereo :119-220 + box overload)."""
        detections = self._maybe_detect(left, detections, stereo=True)
        self._advance_boxes(detections)
        if prefetch_next is not None and self.tracker.state == "OK":
            self.tracker.prefetch(*prefetch_next)
        boxes, bvalid = self._active_boxes()
        dyn = self._dyn_args(timestamp, stride=True)
        if dyn is not None and len(self.boxes.boxes):
            boxes = self.boxes.boxes
            bvalid = np.ones(len(boxes), bool)
        st = self.tracker.step_images(
            left, right, boxes, bvalid, self.frame_id, timestamp, dyn=dyn)
        self._dyn_after(st, timestamp)
        self._gba_step()
        self.frame_id += 1
        return st

    def track_chunk(self, grays, auxs, timestamps,
                    detections: Optional[list] = None) -> list:
        """Temporal chunking: C consecutive frames in ONE device call +
        ONE packed readback (Tracker.step_images_chunk) — the offline /
        dataset-throughput mode for latency-bound transports. `auxs` are
        depth maps (rgbd), right images (stereo), or None (mono).
        `detections`: optional per-frame box lists — with the dynamic
        pipeline enabled the fused H/F classification runs INSIDE the
        chunk (fused_track_chunk_dyn); box streak bookkeeping lags one
        chunk, the reference's async-thread lag widened to C
        (ref /root/reference/src/Tracking.cc:968-1367).
        Returns finalized TrackStats (decisions lag one chunk)."""
        frames = []
        first_id = self.frame_id
        for j, (g, a, ts) in enumerate(zip(grays, auxs, timestamps)):
            det = detections[j] if detections is not None else None
            det = self._maybe_detect(g, det)
            self._advance_boxes(det)
            boxes, bvalid = self._active_boxes()
            if self.dynamics is not None and len(self.boxes.boxes):
                # classification must keep seeing ALL boxes (a box can
                # move 1 -> 2 when it starts moving); status gating
                # happens inside the fused step via dyn["box_status"]
                boxes = self.boxes.boxes.copy()
                bvalid = np.ones(len(boxes), bool)
            frames.append((g, a, boxes, bvalid, self.frame_id, ts))
            self.frame_id += 1
        dyn = self._dyn_args(timestamps[0])
        sts = self.tracker.step_images_chunk(frames, dyn=dyn)
        if self.dynamics is not None:
            # verdicts of the finalized (previous) chunk update streaks
            # now; the just-dispatched frames' FrameData enters the
            # reference queue for FUTURE chunks' classification
            for st in sts:
                if st.verdicts is not None and len(self.boxes.boxes):
                    self.dynamics.update_streaks(self.boxes, st.verdicts)
                    self.dynamics.update_box3d(self.boxes, st.box3d,
                                               timestamps[0])
            for fr, _, _ in self.tracker._pending:
                if fr.frame_id >= first_id:
                    self.dynamics.push_fd(fr.timestamp, fr.data)
        self._gba_step()
        return sts

    def track_mono(self, gray: np.ndarray, timestamp: float) -> TrackStats:
        if self.dynamics is None:
            st = self.tracker.step_images(gray, None, None, None,
                                          self.frame_id, timestamp)
            self.frame_id += 1
            return st
        frame = build_frame(self.cfg, self.cam, gray, self.frame_id,
                            timestamp)
        return self._track_common(frame)

    def _track_common(self, frame: Frame) -> TrackStats:
        if self.dynamics is not None:
            self.dynamics.pre_track(frame, self.boxes, self.tracker)
        st = self.tracker.process(frame)
        if self.dynamics is not None and st.state == "OK":
            self.dynamics.post_track(frame, self.boxes, self.tracker)
        self._gba_step()
        self.frame_id += 1
        return st

    def _dyn_args(self, timestamp: float, stride: bool = False):
        """Inputs for the fused dynamic-classification step (None when the
        dynamics module is off or the tracker is not yet OK).

        stride=True (per-frame callers): apply cfg.dynamic.classify_every
        — skip frames get classify=False, dispatching the LIGHT dyn
        executable (tracking + per-box 3D state, NO H/F RANSAC section —
        the bulk of the classifying executable and, through a
        per-dispatch-cost transport, the dominant per-frame price).
        Verdicts/streaks lag to the next classified frame; the per-box
        depth/OBB still updates every frame (reference parity,
        Tracking.cc:809-881). Runs with zero tracked boxes return None —
        a dynamic-MODE run of a static scene never pays any dyn
        executable at all."""
        if self.dynamics is None or self.tracker.state != "OK":
            return None
        classify = True
        if stride:
            if len(self.boxes.boxes) == 0:
                return None
            ce = self.cfg.dynamic.classify_every
            classify = not (ce > 1 and self.frame_id % ce != 0)
        import jax.numpy as jnp
        B = self.cfg.dynamic.max_boxes
        status = np.zeros(B, np.int32)
        n = min(len(self.boxes.status), B)
        status[:n] = self.boxes.status[:n]
        ref_fd, have_ref = self.dynamics.pick_ref_fd(
            timestamp, self.cfg.capacity.max_keypoints)
        # per-frame device constants are CACHED (each fresh jnp.asarray is
        # a separate h2d tunnel trip): status changes only on verdict
        # flips; the seed is a fixed base — per-frame RANSAC variation is
        # derived ON DEVICE inside the fused step (fused.py)
        key = status.tobytes()
        cached = getattr(self, "_dyn_consts", None)
        if cached is None or cached[0] != key:
            self._dyn_consts = cached = (
                key, jnp.asarray(status), jnp.int32(self.cfg.seed))
        return dict(ref_fd=ref_fd, have_ref=have_ref,
                    box_status=cached[1], seed=cached[2],
                    classify=classify)

    def _dyn_after(self, st, timestamp: float):
        if self.dynamics is None:
            return
        if st.verdicts is not None and len(self.boxes.boxes):
            self.dynamics.update_streaks(self.boxes, st.verdicts)
            self.dynamics.update_box3d(self.boxes, st.box3d, timestamp)
        lf = self.tracker.last_frame
        if lf is not None and self.tracker.state == "OK":
            self.dynamics.push_fd(timestamp, lf.data)

    # ------------------------------------------------------------------
    @property
    def trajectory(self):
        self.tracker.flush()
        while self._gba is not None:   # drain an in-flight post-loop GBA
            self._gba_step()
        return self.tracker.trajectory_poses()

    def save_trajectory_tum(self, path: str):
        traj_io.save_tum(path, self.trajectory)

    def save_trajectory_kitti(self, path: str):
        traj_io.save_kitti(path, self.trajectory)

    def save_keyframe_trajectory_tum(self, path: str):
        m = self.tracker.map
        n = int(m.n_kf)
        kf_traj = [(float(m.kf_timestamp[k]), np.asarray(m.kf_R[k]),
                    np.asarray(m.kf_t[k])) for k in range(n)
                   if bool(m.kf_valid[k])]
        traj_io.save_tum(path, kf_traj)

    # ------------------------------------------------------------------
    def _cache_frame(self, frame_id: int, gray, depth, mask):
        """Keep recent frames' pixels for deferred dense-KF insertion (the
        finalized stats lag by pipeline_depth in pipelined mode)."""
        self._recent_frames[frame_id] = (gray, depth, mask)
        for k in list(self._recent_frames):
            if k < frame_id - 4:
                del self._recent_frames[k]

    def _dense_after(self, st: TrackStats):
        """Insert the finalized keyframe into the dense map (the
        reference's PointCloudMapping::insertKeyFrame hand-off,
        Tracking.cc:2000-2007: dynamic boxes excluded from the cloud)."""
        if self.dense is None or not st.is_keyframe or st.np_R is None:
            return
        cached = self._recent_frames.get(st.frame_id)
        if cached is None:
            return
        gray, depth, mask = cached
        depth = np.asarray(depth)
        if depth.dtype == np.uint16:
            depth = depth.astype(np.float32) \
                / max(self.cfg.camera.depth_map_factor, 1e-9)
        boxes = box_ids = box_dyn = None
        if len(self.boxes.boxes):
            boxes = self.boxes.boxes
            box_ids = self.boxes.ids
            box_dyn = self.boxes.status == 2
        self.dense.insert_keyframe(
            np.asarray(gray, np.float32), depth, st.np_R, st.np_t,
            dyn_mask=mask, boxes=boxes, box_ids=box_ids,
            box_dynamic=box_dyn)

    @property
    def object_states(self):
        """Per-object smoothed 3D state (box id -> {d, t, R, ext, ts}),
        refreshed EVERY tracked frame — the reference hands the same
        per-frame (tcd, Rcd) to its viewer (Tracking.cc:871-878)."""
        if self.dynamics is None:
            return {}
        return self.dynamics.obj_state

    def export_object_obbs_ply(self, path: str) -> int:
        """Per-frame dynamic-object boxes as a PLY edge cloud
        (MapDrawer::DrawDynamics analog for headless TPU hosts)."""
        from .viz.headless import export_obbs_ply
        from .ops.pointcloud import OBB
        import jax.numpy as jnp
        obbs = {bid: OBB(jnp.asarray(s["t"]), jnp.asarray(s["R"]),
                         jnp.asarray(s["ext"]), True)
                for bid, s in self.object_states.items()}
        return export_obbs_ply(path, obbs)

    def save_pcd(self, path: str) -> int:
        """Dense-cloud export (ref System::SavePCD, System.cc:430).
        Requires cfg.pointcloud.enabled; returns the point count."""
        if self.dense is None:
            raise RuntimeError("pointcloud.enabled is off (or sensor is "
                               "not rgbd); no dense map to save")
        self.tracker.flush()
        return self.dense.save_pcd(path)

    def save_dense_ply(self, path: str) -> int:
        if self.dense is None:
            raise RuntimeError("pointcloud.enabled is off (or sensor is "
                               "not rgbd); no dense map to save")
        self.tracker.flush()
        return self.dense.save_ply(path)

    # ------------------------------------------------------------------
    def save_map(self, path: str):
        """Persist the sparse map to an .npz checkpoint.

        The reference declares SaveMap/LoadMap but never implements them
        (System.h:122-124 TODO); here it is a supported API: the whole map
        is one pytree of arrays, so a checkpoint is a single npz write.
        """
        from .worldmap.checkpoint import save_map as _save
        self.tracker.flush()
        _save(path, self.tracker.map)

    def load_map(self, path: str):
        """Restore a map checkpoint and resume in relocalization mode.

        After loading, the tracker has no last-frame state, so it starts
        LOST and relocalizes against the restored keyframes on the next
        tracked frame. The BoW keyframe database is rebuilt from the
        stored keyframe descriptors (the vocabulary is retrained from
        keyframe 0 if no pretrained one is configured — deterministic
        under cfg.seed).
        """
        from .worldmap.checkpoint import load_map as _load
        from .models import vocabulary as voc_mod
        from .worldmap import kfdb as kfdb_mod
        m = _load(path)
        t = self.tracker
        t.flush()              # drain any in-flight pipelined frames
        t.map = m
        t.n_kf_host = int(m.n_kf)
        t.kf_seq = t.n_kf_host
        t.last_kf_id = t.n_kf_host - 1
        t.last_frame = None
        t.state = "LOST" if t.n_kf_host > 0 else "NOT_INITIALIZED"
        if t.n_kf_host == 0:
            return
        self._ensure_voc()
        db = kfdb_mod.KFDatabase.empty(
            self.cfg.capacity.max_keyframes,
            min(kfdb_mod.TOP_WORDS, self.voc.n_words))
        for k in range(t.n_kf_host):
            if not bool(m.kf_valid[k]):
                continue
            bv = voc_mod.transform(self.voc, m.kf_kp_desc[k],
                                   m.kf_kp_valid[k])
            db = kfdb_mod.add(db, k,
                              voc_mod.sparse_bow(bv, top_w=db.word.shape[1]))
        self.loop.db = db

    def shutdown(self):
        """Drain all in-flight work (ref System::Shutdown, System.cc:408:
        the reference joins its threads; here the analogs are the
        pipelined readback and the amortized post-loop GBA). The System
        stays queryable (trajectory export, SavePCD) after shutdown,
        like the reference."""
        self.tracker.flush()
        while self._gba is not None:
            self._gba_step()

    def activate_localization_mode(self):
        """Track-only mode (ref System.h:87)."""
        self.tracker.localization_only = True

    def deactivate_localization_mode(self):
        self.tracker.localization_only = False

    def reset(self):
        self.tracker = Tracker(self.cfg, self.cam,
                               stereo_obs=self.cfg.sensor in ("stereo",
                                                              "rgbd"))
        self.tracker.on_keyframe = self._on_keyframe
        self.tracker.relocalizer = self._relocalize
        self.tracker.on_reloc = self._on_reloc
        if self.loop is not None:
            from .backend.loop_closing import LoopCloser
            self.loop = LoopCloser(self.cfg, self.cam, self.voc)
        self.boxes = BoxTrackerState.empty()
        self.frame_id = 0
        self._gba = None
        self._recent_frames = {}
        if self.dense is not None:
            from .backend.dense_map import DenseMapper
            self.dense = DenseMapper(self.cfg, self.cam)
