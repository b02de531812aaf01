"""The tracking state machine: per-frame frontend orchestration.

Host-side equivalent of Tracking::Track_new (/root/reference/src/
Tracking.cc:586-966) — the branchy state machine stays in Python (it is
control plane), while every numeric stage is one fused jit call from
tracking_ops/keyframe_ops/local_mapping. Per frame the device sees at most:
  1 extractor call + 1 depth-association call (frame build),
  1 track-vs-last-frame call, 1 local-map-select, 1 track-vs-local-map,
  and on keyframe insertion: make_keyframe + cull + local BA.

States: NOT_INITIALIZED -> OK <-> LOST (Relocalization lives in
backend/relocalization.py and is wired by System).
"""
from __future__ import annotations

import dataclasses
from typing import Callable, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import SystemConfig
from ..utils.camera import Intrinsics, undistorted_bounds
from ..worldmap.state import MapState, empty_map
from ..worldmap.keyframe_ops import make_keyframe
from ..backend.local_mapping import cull_landmarks, local_ba
from . import tracking_ops as tops
from .frame import Frame


@jax.jit
def _gather_lm(m: MapState, ids, mask):
    L = m.lm_pos.shape[0]
    idc = jnp.clip(jnp.where(mask, ids, 0), 0, L - 1)
    ok = mask & m.lm_valid[idc]
    return (m.lm_pos[idc], m.lm_desc[idc], m.lm_normal[idc],
            m.lm_dist_min[idc], m.lm_dist_max[idc], ok)


@dataclasses.dataclass
class TrackStats:
    state: str
    n_inliers_mm: int = 0
    n_inliers_map: int = 0
    is_keyframe: bool = False


class Tracker:
    def __init__(self, cfg: SystemConfig, cam: Intrinsics,
                 stereo_obs: bool = True):
        self.cfg = cfg
        self.cam = cam
        self.stereo_obs = stereo_obs   # use (u,v,ur) residuals when depth known
        self.bounds = undistorted_bounds(cam)
        self.map: MapState = empty_map(cfg.capacity)
        self.state = "NOT_INITIALIZED"
        self.last_frame: Optional[Frame] = None
        self.velocity: Optional[Tuple[np.ndarray, np.ndarray]] = None
        self.last_kf_id = -1
        self.frames_since_kf = 0
        self.last_kf_inliers = 0
        self.trajectory: List[Tuple[float, np.ndarray, np.ndarray]] = []
        self.on_keyframe: Optional[Callable[[int], None]] = None
        # optional relocalizer: frame -> (ok, R, t, obs_lm) (wired by System)
        self.relocalizer: Optional[Callable] = None
        # perf knobs
        self._sf = float(cfg.orb.scale_factor)

    # ------------------------------------------------------------------
    def process(self, frame: Frame) -> TrackStats:
        if self.state == "NOT_INITIALIZED":
            st = self._initialize(frame)
        elif self.state == "OK":
            st = self._track(frame)
        else:  # LOST -> Relocalization (ref Tracking.cc:2212)
            st = self._relocalize_then_track(frame)

        # velocity + trajectory bookkeeping
        if frame.R is not None:
            R = np.asarray(frame.R)
            t = np.asarray(frame.t)
            if self.last_frame is not None and self.last_frame.R is not None:
                Rl = np.asarray(self.last_frame.R)
                tl = np.asarray(self.last_frame.t)
                # velocity = T_cur * T_last^-1
                Rv = R @ Rl.T
                tv = t - Rv @ tl
                self.velocity = (Rv, tv)
            # store the pose RELATIVE to the reference keyframe so later
            # map corrections (local BA, loop closure) propagate into the
            # exported trajectory (ref System::SaveTrajectoryTUM uses
            # mlRelativeFramePoses the same way, System.cc:447-480)
            k = max(self.last_kf_id, 0)
            Rk = np.asarray(self.map.kf_R[k])
            tk = np.asarray(self.map.kf_t[k])
            R_rel = R @ Rk.T
            t_rel = t - R_rel @ tk
            self.trajectory.append((frame.timestamp, k, R_rel, t_rel))
        self.last_frame = frame
        return st

    def trajectory_poses(self) -> List[Tuple[float, np.ndarray, np.ndarray]]:
        """Absolute (Tcw) per-frame trajectory composed against the CURRENT
        keyframe poses (so BA/loop corrections are reflected)."""
        kf_R = np.asarray(self.map.kf_R)
        kf_t = np.asarray(self.map.kf_t)
        out = []
        for ts, k, R_rel, t_rel in self.trajectory:
            R = R_rel @ kf_R[k]
            t = R_rel @ kf_t[k] + t_rel
            out.append((ts, R, t))
        return out

    # ------------------------------------------------------------------
    def _initialize(self, frame: Frame) -> TrackStats:
        """StereoInitialization (ref :1370-1422): need >=500 features; first
        KF at identity; landmarks from all depth-valid keypoints. Mono
        dispatches to the two-view bootstrap."""
        if self.cfg.sensor == "mono":
            return self._initialize_mono(frame)
        n = int(jnp.sum(frame.data.valid & frame.data.static_mask &
                        (frame.data.depth > 0)))
        if n < 300:
            return TrackStats("NOT_INITIALIZED")
        R0 = jnp.eye(3)
        t0 = jnp.zeros(3)
        frame.R, frame.t = R0, t0
        no_obs = jnp.full(frame.data.xy.shape[0], -1, jnp.int32)
        depth_th = float(self.cfg.camera.th_depth * self.cam.baseline)
        self.map = make_keyframe(
            self.map, self.cam, frame.data, R0, t0, frame.frame_id,
            frame.timestamp, no_obs, depth_th, self._sf,
            n_levels=self.cfg.orb.n_levels)
        k = int(self.map.n_kf) - 1
        # frame observations = what the KF just bound
        frame.obs_lm = self.map.kf_obs_lm[k]
        self.state = "OK"
        self.last_kf_id = k
        self.frames_since_kf = 0
        self.last_kf_inliers = n
        if self.on_keyframe:
            self.on_keyframe(k)
        return TrackStats("OK", is_keyframe=True)

    # ------------------------------------------------------------------
    def _initialize_mono(self, frame: Frame) -> TrackStats:
        """MonocularInitialization (ref :1424-1616)."""
        from .initializer import try_initialize
        from ..worldmap.state import insert_keyframe, add_landmarks
        n = int(jnp.sum(frame.data.valid & frame.data.static_mask))
        if n < 100:
            self._init_ref = None
            return TrackStats("NOT_INITIALIZED")
        ref = getattr(self, "_init_ref", None)
        if ref is None:
            self._init_ref = frame
            return TrackStats("NOT_INITIALIZED")
        min_m = min(self.cfg.tracking.mono_init_min_matches,
                    max(self.cfg.orb.n_features // 8, 40))
        init = try_initialize(self.cam, ref.data, frame.data,
                              seed=self.cfg.seed + frame.frame_id,
                              min_matches=min_m)
        if int(init.n_matches) < min_m:
            self._init_ref = frame        # restart from this frame (ref :1460)
            return TrackStats("NOT_INITIALIZED")
        if not bool(init.ok):
            return TrackStats("NOT_INITIALIZED")

        N = frame.data.xy.shape[0]
        no_obs = jnp.full(N, -1, jnp.int32)
        R0 = jnp.eye(3)
        t0 = jnp.zeros(3)
        m = insert_keyframe(self.map, R0, t0, ref.frame_id, ref.timestamp,
                            ref.data.xy, ref.data.level, ref.data.angle,
                            ref.data.desc,
                            ref.data.valid & ref.data.static_mask,
                            ref.data.ur, ref.data.depth, no_obs)
        dist = jnp.linalg.norm(init.points, axis=-1)
        normal = init.points / jnp.maximum(dist, 1e-9)[:, None]
        lvl_scale = self._sf ** ref.data.level.astype(jnp.float32)
        dmax = dist * lvl_scale
        dmin = dmax / (self._sf ** (self.cfg.orb.n_levels - 1))
        slots = jnp.arange(N, dtype=jnp.int32)
        m = add_landmarks(m, init.points, ref.data.desc, normal, dmin, dmax,
                          jnp.zeros(N, jnp.int32), slots, init.good)
        new_ids = m.kf_obs_lm[0]
        # second keyframe observations at matched slots
        obs1 = jnp.full(N, -1, jnp.int32)
        tgt = jnp.where(init.good & (new_ids >= 0), init.idx2, 0)
        obs1 = obs1.at[tgt].set(
            jnp.where(init.good & (new_ids >= 0), new_ids, obs1[tgt]))
        m = insert_keyframe(m, init.R2, init.t2, frame.frame_id,
                            frame.timestamp, frame.data.xy,
                            frame.data.level, frame.data.angle,
                            frame.data.desc,
                            frame.data.valid & frame.data.static_mask,
                            frame.data.ur, frame.data.depth, obs1)
        self.map = m
        # initial BA over the 2-view map (ref GlobalBundleAdjustemnt(20))
        self.map = local_ba(self.map, self.cam, jnp.int32(1),
                            jnp.float32(self._sf), stereo=False,
                            max_kf=4,
                            max_lm=self.cfg.capacity.local_ba_landmarks)
        frame.R = self.map.kf_R[1]
        frame.t = self.map.kf_t[1]
        frame.obs_lm = self.map.kf_obs_lm[1]
        self.state = "OK"
        self.last_kf_id = 1
        self.frames_since_kf = 0
        self.last_kf_inliers = int((frame.obs_lm >= 0).sum())
        self._init_ref = None
        if self.on_keyframe:
            self.on_keyframe(0)
            self.on_keyframe(1)
        return TrackStats("OK", is_keyframe=True)

    # ------------------------------------------------------------------
    def _relocalize_then_track(self, frame: Frame) -> TrackStats:
        if self.relocalizer is not None:
            ok, R, t, obs = self.relocalizer(frame)
            if ok:
                frame.R, frame.t = R, t
                frame.obs_lm = obs
                self.velocity = None
                # resume as if motion-model frame: refine on local map
                self.last_frame = frame
                self.state = "OK"
                return self._track(frame)
        frame.R, frame.t = None, None
        frame.obs_lm = jnp.full(frame.data.xy.shape[0], -1, jnp.int32)
        return TrackStats("LOST")

    # ------------------------------------------------------------------
    def _predict_pose(self):
        Rl = np.asarray(self.last_frame.R)
        tl = np.asarray(self.last_frame.t)
        if self.velocity is None:
            return jnp.asarray(Rl), jnp.asarray(tl)
        Rv, tv = self.velocity
        return jnp.asarray(Rv @ Rl), jnp.asarray(Rv @ tl + tv)

    # ------------------------------------------------------------------
    def _track(self, frame: Frame, lost: bool = False) -> TrackStats:
        cfg = self.cfg
        R_pred, t_pred = self._predict_pose()

        # --- stage 1: motion model vs last-frame landmarks (ref :1728) ---
        last_ids = self.last_frame.obs_lm
        if last_ids is None:
            last_ids = jnp.full(frame.data.xy.shape[0], -1, jnp.int32)
        pos, desc, normal, dmin, dmax, ok = _gather_lm(
            self.map, last_ids, last_ids >= 0)
        out = tops.track_against_landmarks(
            self.cam, self.bounds, R_pred, t_pred, pos, desc, normal, dmin,
            dmax, ok, frame.data,
            jnp.float32(cfg.tracking.motion_model_radius), self._sf,
            ratio=cfg.matcher.nn_ratio_tracking, stereo=self.stereo_obs,
            n_levels=cfg.orb.n_levels, use_view_gate=False)
        n_mm = int(out.n_inliers)
        if n_mm < cfg.tracking.min_inliers_track:
            # widened re-search (ref :1749: 2x radius), from last pose
            out = tops.track_against_landmarks(
                self.cam, self.bounds, jnp.asarray(self.last_frame.R),
                jnp.asarray(self.last_frame.t), pos, desc, normal, dmin,
                dmax, ok, frame.data,
                jnp.float32(2.0 * cfg.tracking.motion_model_radius),
                self._sf, ratio=cfg.matcher.nn_ratio_tracking,
                stereo=self.stereo_obs, n_levels=cfg.orb.n_levels,
                use_view_gate=False)
            n_mm = int(out.n_inliers)
        if n_mm < cfg.tracking.min_inliers_track:
            self.state = "LOST"
            frame.R, frame.t = jnp.asarray(R_pred), jnp.asarray(t_pred)
            frame.obs_lm = jnp.full(frame.data.xy.shape[0], -1, jnp.int32)
            return TrackStats("LOST", n_inliers_mm=n_mm)

        # map matched kp -> global landmark ids
        kp_lm_global = jnp.where(
            out.kp_lm >= 0,
            last_ids[jnp.clip(out.kp_lm, 0, last_ids.shape[0] - 1)], -1)

        # --- stage 2: local map (ref TrackLocalMap :1791) ---
        local = tops.select_local_map(
            self.map.kf_obs_lm, self.map.kf_valid, kp_lm_global,
            self.map.lm_pos.shape[0],
            max_kf=cfg.capacity.local_ba_keyframes,
            max_lm=cfg.capacity.local_ba_landmarks)
        pos, desc, normal, dmin, dmax, okl = _gather_lm(
            self.map, local.lm_ids, local.lm_mask)
        out2 = tops.track_against_landmarks(
            self.cam, self.bounds, out.R, out.t, pos, desc, normal, dmin,
            dmax, okl, frame.data,
            jnp.float32(cfg.tracking.local_map_radius), self._sf,
            ratio=cfg.matcher.nn_ratio_tracking, stereo=self.stereo_obs,
            n_levels=cfg.orb.n_levels, use_view_gate=True)
        n_map = int(out2.n_inliers)

        # landmark stats
        vis, fnd = tops.bump_landmark_stats(
            self.map.lm_visible, self.map.lm_found, local.lm_ids,
            local.lm_mask, out2.visible, out2.found)
        self.map = self.map._replace(lm_visible=vis, lm_found=fnd)

        if n_map < cfg.tracking.min_inliers_localmap:
            self.state = "LOST"
            frame.R, frame.t = out.R, out.t
            frame.obs_lm = kp_lm_global
            return TrackStats("LOST", n_inliers_mm=n_mm, n_inliers_map=n_map)

        frame.R, frame.t = out2.R, out2.t
        frame.obs_lm = jnp.where(
            out2.kp_lm >= 0,
            local.lm_ids[jnp.clip(out2.kp_lm, 0, local.lm_ids.shape[0] - 1)],
            -1)
        self.state = "OK"
        self.frames_since_kf += 1

        st = TrackStats("OK", n_inliers_mm=n_mm, n_inliers_map=n_map)
        if self._need_keyframe(frame, n_map):
            self._create_keyframe(frame, n_map)
            st.is_keyframe = True
        return st

    # ------------------------------------------------------------------
    def _need_keyframe(self, frame: Frame, n_map: int) -> bool:
        """NeedNewKeyFrame (ref :1838-1921), depth-sensor simplification:
        insert when tracking weakens vs the reference KF or many close
        points are unbound."""
        cfg = self.cfg
        if self.frames_since_kf < cfg.tracking.min_frames_between_kf + 1:
            return False
        if self.frames_since_kf >= cfg.tracking.max_frames_between_kf:
            return True
        weak = n_map < 0.75 * max(self.last_kf_inliers, 1)
        close_unbound = int(jnp.sum(
            (frame.data.depth > 0) & frame.data.static_mask
            & (frame.obs_lm < 0)
            & (frame.data.depth < cfg.camera.th_depth * float(self.cam.baseline))))
        close_bound = int(jnp.sum(
            (frame.data.depth > 0) & (frame.obs_lm >= 0)
            & (frame.data.depth < cfg.camera.th_depth * float(self.cam.baseline))))
        need_close = close_bound < 100 and close_unbound > 70
        return bool(weak or need_close)

    # ------------------------------------------------------------------
    def _create_keyframe(self, frame: Frame, n_map: int):
        depth_th = float(self.cfg.camera.th_depth * self.cam.baseline)
        self.map = make_keyframe(
            self.map, self.cam, frame.data, frame.R, frame.t,
            frame.frame_id, frame.timestamp, frame.obs_lm, depth_th,
            self._sf, n_levels=self.cfg.orb.n_levels)
        k = int(self.map.n_kf) - 1
        frame.obs_lm = self.map.kf_obs_lm[k]
        self.last_kf_id = k
        self.frames_since_kf = 0
        self.last_kf_inliers = n_map
        # mapping stage (synchronous pipeline)
        if not self.stereo_obs:
            # mono: new landmarks come from triangulation, not depth
            from ..backend.triangulation import create_new_landmarks
            self.map = create_new_landmarks(self.map, self.cam, k, self._sf,
                                            n_levels=self.cfg.orb.n_levels)
        self.map = cull_landmarks(self.map, jnp.int32(k))
        if k >= 2:
            self.map = local_ba(
                self.map, self.cam, jnp.int32(k), jnp.float32(self._sf),
                stereo=self.stereo_obs,
                max_kf=min(self.cfg.capacity.local_ba_keyframes, 16),
                max_lm=self.cfg.capacity.local_ba_landmarks)
        if self.on_keyframe:
            self.on_keyframe(k)
