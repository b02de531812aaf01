"""The tracking state machine: per-frame frontend orchestration.

Host-side equivalent of Tracking::Track_new (/root/reference/src/
Tracking.cc:586-966) — the branchy state machine stays in Python (it is
control plane), while the numerics are fused jit units. Per frame the
device sees exactly ONE call (frontend/fused.py: frame build + both
tracking stages + stats) plus one packed readback; keyframe frames add ONE
mapping-stage call (backend/mapping_stage.py: insert + cull + fuse + local
BA + KF cull) and the loop-closing BoW call.

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


@jax.jit
def _slot_probe(m: MapState):
    """[slot, ok, R_old flat (9), t_old (3)] of the next keyframe
    insertion (see state.next_kf_slot) — the old tenant's pose lets the
    host materialize trajectory entries that reference the recycled slot.
    Read back by the host only at capacity."""
    from ..worldmap.state import next_kf_slot
    slot, ok = next_kf_slot(m)
    return jnp.concatenate([
        jnp.stack([slot.astype(jnp.float32), ok.astype(jnp.float32)]),
        m.kf_R[slot].reshape(-1), m.kf_t[slot]])


@jax.jit
def _bow_recover(m: MapState, cam, fd, k, R0, t0):
    """TrackReferenceKeyFrame analog (ref /root/reference/src/
    Tracking.cc:1618-1660 + ORBmatcher::SearchByBoW :159): descriptor-
    match the frame against the reference keyframe's landmark keypoints
    with NO projection gate (the stage that survives a wrong motion
    model), then re-optimize the pose. Returns (R, t, obs[N],
    packed [14]: n_inliers, n_matches, R flat, t)."""
    from ..backend.relocalization import _match_frame_kf
    from ..optim.pose_opt import optimize_pose
    lm = _match_frame_kf(fd.desc, fd.valid & fd.static_mask,
                         m.kf_kp_desc[k], m.kf_kp_valid[k],
                         m.kf_obs_lm[k])
    L = m.lm_pos.shape[0]
    ok = (lm >= 0) & m.lm_valid[jnp.clip(lm, 0, L - 1)]
    xw = m.lm_pos[jnp.clip(lm, 0, L - 1)]
    inv_s2 = 1.0 / (fd.scale ** 2)
    res = optimize_pose(cam, R0, t0, xw, fd.xy, inv_s2, ok, stereo=False,
                        rounds=4, iters=10)
    inl = res.inliers & ok
    obs = jnp.where(inl, lm, -1).astype(jnp.int32)
    packed = jnp.concatenate([
        jnp.stack([inl.sum().astype(jnp.float32),
                   ok.sum().astype(jnp.float32)]),
        res.R.reshape(-1), res.t])
    return res.R, res.t, obs, packed


class _ChunkPacket:
    """ONE readback shared by a chunk's frames: the [C, 28] packet is
    materialized on first access and cached for the other rows."""

    def __init__(self, dev):
        self.dev = dev
        self._np = None

    def get(self):
        if self._np is None:
            self._np = np.asarray(self.dev)
        return self._np


class _PacketRow:
    """A frame's view of its chunk's shared packet (np.asarray-able)."""

    def __init__(self, shared: _ChunkPacket, j: int):
        self._shared = shared
        self._j = j

    def __array__(self, dtype=None, copy=None):
        row = self._shared.get()[self._j]
        return row.astype(dtype) if dtype is not None else row

    def is_ready(self) -> bool:
        return self._shared._np is not None or self._shared.dev.is_ready()


@dataclasses.dataclass
class TrackStats:
    state: str
    n_inliers_mm: int = 0
    n_inliers_map: int = 0
    is_keyframe: bool = False
    verdicts: object = None   # [B] box verdicts (dynamic pipeline)
    box3d: object = None      # [B, 16] per-box 3D state (d, obb center,
    #                           axes flat, extents — camera frame, raw;
    #                           gating/smoothing in DynamicsModule)
    frame_id: int = -1        # id of the FINALIZED frame (lags the input
    #                           frame by pipeline_depth in pipelined mode)
    np_R: object = None       # finalized camera pose (host numpy)
    np_t: object = None
    drained_prev: object = None  # MultiSystem pipelined mode: when a lane
    #                           event forced an early drain, the drained
    #                           step's finalized stats for this lane ride
    #                           here so keyframe/LOST flags aren't lost


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
        self.n_kf_host = 0     # host mirror of map.n_kf (avoids readbacks)
        self.kf_seq = 0        # monotonic KF insertion count: keeps loop
        # detection streak/gap logic ordered once slot ids recycle at
        # capacity (slot index != temporal order from then on)
        self.trajectory: List[Tuple[float, np.ndarray, np.ndarray]] = []
        self._traj_by_slot = {}   # kf slot -> trajectory indices (for
        #                           materialization when a slot recycles)
        self._slot_gen = {}       # kf slot -> recycle generation: an
        # in-flight (pipelined/chunked) frame whose reference slot was
        # recycled before its bookkeeping runs must store an ABSOLUTE
        # trajectory entry — the slot now holds an unrelated camera
        self.on_keyframe: Optional[Callable[[int], None]] = None
        # optional relocalizer: frame -> (ok, R, t, obs_lm[, cand_slot])
        # (wired by System; the 4-tuple form is accepted for test doubles)
        self.relocalizer: Optional[Callable] = None
        # optional reloc-drift-correction hook (k_last_slot, cand_slot) ->
        # None, invoked on relocalization success BEFORE tracking resumes
        # so the corrected local map is what the tracker refines against
        # (wired by System to LoopCloser.on_relocalization)
        self.on_reloc: Optional[Callable[[int, int], None]] = None
        # perf knobs
        self._sf = float(cfg.orb.scale_factor)
        self._kf_pose_cache = {}
        self._dev_consts = None
        self._ref_kf_dev = None   # (host int, device int32) of last_kf_id
        self._adaptive = None     # lazily resolved: adaptive pipeline depth
        self._prev2_pose = None
        self._zero_aux_cache = None
        import collections
        # pipelined mode: FIFO of (frame, out) awaiting readback, at most
        # cfg.tracking.pipeline_depth deep
        self._pending = collections.deque()
        # input prefetch: a 1-worker executor device_puts the NEXT frame's
        # arrays while the main thread blocks on the packed readback,
        # taking the upload off the per-frame critical path (measured
        # -30 ms/frame through the axon tunnel)
        self._uploader = None
        self._prefetch = {}        # id(gray) -> (gray_ref, aux_ref, future)
        # localization-only mode: track against the existing map, create no
        # keyframes (ref System::ActivateLocalizationMode, System.h:87-89)
        self.localization_only = False
        # localization-only "VO mode" (ref mbVO, Tracking.cc:728-766):
        # set when the local map yields few inliers; while set, each frame
        # ALSO attempts relocalization and prefers it over the motion-model
        # solution (dual-hypothesis arbitration)
        self.vo_mode = False

    # ------------------------------------------------------------------
    def step_images(self, gray: np.ndarray, aux, boxes, box_active,
                    frame_id: int, timestamp: float,
                    dyn: dict = None) -> TrackStats:
        """Fast path: raw images in, fused device step (frame build
        included), one packed readback. Only valid while tracking is OK;
        other states fall back to `process` with a host-built frame.
        `dyn` (optional): {ref_fd, have_ref, box_status, seed} switches to
        the dynamic-scene variant (classification fused in; verdicts
        returned in TrackStats.verdicts)."""
        if self.state != "OK":
            self._finalize_pending()   # drain pipelined frame, if any
            from .frame import build_frame
            fr = build_frame(self.cfg, self.cam, gray, frame_id, timestamp,
                             right=aux if self.cfg.sensor == "stereo" else None,
                             depth_map=aux if self.cfg.sensor == "rgbd" else None,
                             boxes=boxes, box_valid=box_active)
            return self.process(fr)
        from .fused import fused_track_step
        cfg = self.cfg
        # all per-frame-constant device values are cached ONCE: every fresh
        # jnp.asarray / jnp.float32 would pay a host->device tunnel trip
        dc = self._scalar_consts()
        if boxes is not None and len(boxes):
            B = cfg.dynamic.max_boxes
            pk = np.full((B, 5), -1.0, np.float32)   # x0,y0,x1,y1,active
            pk[:, 4] = 0.0
            nb = min(len(boxes), B)
            pk[:nb, :4] = boxes[:nb]
            pk[:nb, 4] = (box_active[:nb] if box_active is not None
                          else np.ones(nb)).astype(np.float32)
            arr = jnp.asarray(pk)                    # ONE h2d transfer
            bx, ba = arr[:, :4], arr[:, 4] > 0
        else:
            bx, ba = dc["bx_empty"], dc["ba_empty"]
        last_ids = self.last_frame.obs_lm
        if last_ids is None:
            last_ids = dc["no_obs"]
        R_last = self.last_frame.R
        t_last = self.last_frame.t
        prev2 = self._prev2_pose
        if prev2 is None:
            R_prev2, t_prev2, has_vel = R_last, t_last, dc["vel0"]
        else:
            R_prev2, t_prev2 = prev2
            has_vel = dc["vel1"]
        ds = cfg.tracking.depth_stride
        pf = self._prefetch.pop(id(gray), None)
        if pf is not None and pf[0] is gray and pf[1] is aux:
            g_arr, aux_arr, depth_scale = pf[2].result()
        else:
            g_arr, aux_arr, depth_scale = self._stage_inputs(gray, aux)
        common = dict(
            orb_cfg=cfg.orb, height=gray.shape[0], width=gray.shape[1],
            mm_radius=dc["mm_radius"], local_radius=dc["local_radius"],
            depth_th=dc["depth_th"], scale_factor=dc["sf"],
            min_inliers_track=dc["min_tr"],
            sensor=cfg.sensor, max_kf=cfg.capacity.local_ba_keyframes,
            max_lm=cfg.capacity.local_ba_landmarks,
            n_levels=cfg.orb.n_levels,
            n_slots=cfg.capacity.max_keypoints,
            depth_stride=(ds if cfg.sensor == "rgbd" else 1))
        ref_k = max(self.last_kf_id, 0)
        if dyn is None:
            out = fused_track_step(
                self.map, self.cam, self.bounds,
                g_arr, aux_arr, bx, ba, last_ids,
                R_last, t_last, R_prev2, t_prev2, has_vel,
                self._ref_kf_const(), depth_scale=depth_scale, **common)
        else:
            from .fused import fused_track_step_dyn
            out = fused_track_step_dyn(
                self.map, self.cam, self.bounds,
                g_arr, aux_arr, bx, ba,
                dyn["box_status"], dyn["ref_fd"], dyn["have_ref"],
                last_ids, R_last, t_last, R_prev2, t_prev2, has_vel,
                self._ref_kf_const(),
                seed=dyn["seed"], depth_scale=depth_scale,
                classify=dyn.get("classify", True), **common)
        self._prev2_pose = (R_last, t_last)
        frame = Frame(data=out.fd, frame_id=frame_id, timestamp=timestamp,
                      boxes=boxes, ref_kf=ref_k,
                      ref_gen=self._slot_gen.get(ref_k, 0))

        if cfg.tracking.pipeline_depth > 0:
            # N-deep pipeline: finalize the oldest in-flight frame(s) while
            # this one computes on device (overlaps the readback latency
            # with compute; state-machine decisions lag N frames — depth 1
            # is the same lag the reference's async LocalMapping thread has).
            # Dynamic frames pipeline too: box verdicts ride the packed
            # readback and surface one frame late, so the streak bookkeeping
            # lags exactly like the reference's async-thread design.
            frame.R, frame.t = out.R, out.t        # device handles for next
            frame.obs_lm = out.obs_lm
            # note: copy_to_host_async() on the packet was tried here and
            # REGRESSED throughput on the axon tunnel (11.7 -> 8.9 fps);
            # the blocking readback in _finalize_one is faster.
            st_prev = None
            while len(self._pending) >= cfg.tracking.pipeline_depth:
                if (self._adaptive_depth() and len(self._pending) <
                        cfg.tracking.pipeline_depth + 2 and
                        not self._packet_ready(self._pending[0][1])):
                    # device still crunching the oldest frame (typically
                    # the mapping stage of a keyframe) — run one frame
                    # deeper instead of stalling, exactly the slack the
                    # reference's async LocalMapping thread has; drains
                    # back to the configured depth as soon as the packet
                    # lands (bounded at +2 to cap decision lag).
                    # DISABLED through the axon tunnel: >1 unsynced frame
                    # in flight triggers its queue pathology (measured:
                    # warmup hangs past the watchdog; RESULTS.md).
                    break
                st_prev = self._finalize_one()
            self._pending.append((frame, out, dyn is not None))
            self.last_frame = frame                # next dispatch chains here
            return st_prev if st_prev is not None else TrackStats("OK")

        st = self._post_track(frame, out)
        if dyn is not None:
            self._split_dyn_packet(st)
        self._bookkeep(frame)
        return st

    def step_images_chunk(self, frames, dyn: dict = None) -> list:
        """Temporal chunking: C consecutive frames in ONE device call +
        ONE packed [C, 28] readback (fused.fused_track_chunk) — the
        single-sequence analog of MultiSystem's lane batching for
        latency-bound transports. Decisions (keyframes, LOST) lag one
        chunk, the reference's async-LocalMapping lag widened to C.

        `frames`: list of (gray, aux, boxes, box_active, frame_id,
        timestamp). `dyn` (optional): {ref_fd, have_ref, box_status,
        seed} switches to fused_track_chunk_dyn — per-frame H/F box
        classification inside the chunk, verdicts in the [C, 28+B]
        packet (TrackStats.verdicts when finalized; streak bookkeeping
        lags one chunk). Returns finalized TrackStats of frames that
        completed readback this call (usually the PREVIOUS chunk's)."""
        if self.state != "OK" or len(frames) == 1:
            return [self.step_images(g, a, bx, ba, fid, ts, dyn=dyn)
                    for (g, a, bx, ba, fid, ts) in frames]
        from .fused import fused_track_chunk, fused_track_chunk_dyn
        cfg = self.cfg
        sts = []
        eager = cfg.tracking.chunk_eager_finalize
        upload_first = eager and cfg.tracking.chunk_eager_upload_first

        def _finalize_prev():
            # finalize the PREVIOUS chunk before dispatching this one: a
            # keyframe triggered inside it reaches the map now, so this
            # chunk tracks against it (decision lag C-j, not 2C-j). Costs
            # the readback/compute overlap — one extra transport round
            # trip per chunk — and buys back most of the chunked ATE
            # penalty (the reference's async LocalMapping lag is 1 frame,
            # /root/reference/src/LocalMapping.cc:48-113).
            while self._pending:
                sts.append(self._finalize_one())
                if self.state != "OK":
                    self._pending.clear()
                    return False
            return True

        if eager and not upload_first:
            if not _finalize_prev():
                return sts
        dc = self._scalar_consts()
        C = len(frames)
        H, W = frames[0][0].shape
        B = cfg.dynamic.max_boxes
        ds = cfg.tracking.depth_stride if cfg.sensor == "rgbd" else 1

        g_stack = jnp.asarray(np.stack([f[0] for f in frames]))
        if frames[0][1] is None:
            aux_stack = self._zero_aux((C, H, W))
            depth_scale = None
        else:
            auxs = [f[1][::ds, ::ds] if ds > 1 else f[1] for f in frames]
            aux_np = np.ascontiguousarray(np.stack(auxs))
            aux_stack = jnp.asarray(aux_np)
            depth_scale = (dc["depth_scale"]
                           if cfg.sensor == "rgbd"
                           and aux_np.dtype == np.uint16 else None)
        any_boxes = any(f[2] is not None and len(f[2]) for f in frames)
        if any_boxes:
            pk = np.full((C, B, 5), -1.0, np.float32)
            pk[:, :, 4] = 0.0
            for j, (_, _, bx, ba, _, _) in enumerate(frames):
                if bx is None or not len(bx):
                    continue
                nb = min(len(bx), B)
                pk[j, :nb, :4] = bx[:nb]
                pk[j, :nb, 4] = (ba[:nb] if ba is not None
                                 else np.ones(nb)).astype(np.float32)
            arr = jnp.asarray(pk)
            bx_stack, ba_stack = arr[:, :, :4], arr[:, :, 4] > 0
        else:
            key = ("chunk_empty_boxes", C)
            if key not in self._dev_consts:
                self._dev_consts[key] = (
                    jnp.full((C, B, 4), -1.0, jnp.float32),
                    jnp.zeros((C, B), bool))
            bx_stack, ba_stack = self._dev_consts[key]

        if upload_first:
            # eager variant (upload-first): the image/box stacks' h2d was
            # ISSUED above, so a full-duplex transport streams it while
            # the blocking packet readback below drains the previous
            # chunk. Map, poses, ref-KF and last-frame snapshots are read
            # AFTER the finalize — the dispatch sees the updated map
            # exactly as in plain eager mode.
            if not _finalize_prev():
                return sts

        last_ids = self.last_frame.obs_lm
        if last_ids is None:
            last_ids = dc["no_obs"]
        R_last, t_last = self.last_frame.R, self.last_frame.t
        prev2 = self._prev2_pose
        if prev2 is None:
            R_prev2, t_prev2, has_vel = R_last, t_last, dc["vel0"]
        else:
            R_prev2, t_prev2 = prev2
            has_vel = dc["vel1"]
        ref_k = max(self.last_kf_id, 0)
        common = dict(
            orb_cfg=cfg.orb, height=H, width=W,
            mm_radius=dc["mm_radius"], local_radius=dc["local_radius"],
            depth_th=dc["depth_th"], scale_factor=dc["sf"],
            min_inliers_track=dc["min_tr"],
            sensor=cfg.sensor, max_kf=cfg.capacity.local_ba_keyframes,
            max_lm=cfg.capacity.local_ba_landmarks,
            n_levels=cfg.orb.n_levels,
            n_slots=cfg.capacity.max_keypoints,
            depth_stride=ds, depth_scale=depth_scale, chunk=C)
        if dyn is None:
            outs, packed_dev = fused_track_chunk(
                self.map, self.cam, self.bounds, g_stack, aux_stack,
                bx_stack, ba_stack, last_ids,
                R_last, t_last, R_prev2, t_prev2, has_vel,
                self._ref_kf_const(), **common)
        else:
            outs, packed_dev = fused_track_chunk_dyn(
                self.map, self.cam, self.bounds, g_stack, aux_stack,
                bx_stack, ba_stack,
                dyn["box_status"], dyn["ref_fd"], dyn["have_ref"],
                last_ids, R_last, t_last, R_prev2, t_prev2, has_vel,
                self._ref_kf_const(), seed=dyn["seed"],
                classify_every=cfg.dynamic.classify_every_chunked,
                **common)

        # overlapped mode: finalize the previous chunk WHILE this one
        # computes on device
        while self._pending:
            sts.append(self._finalize_one())
            if self.state != "OK":
                # a finalized frame went LOST: frames chained after it on
                # device are garbage — drop them (the caller re-enters the
                # per-frame recovery path on its next step)
                self._pending.clear()
                return sts

        shared = _ChunkPacket(packed_dev)
        for j, (g, a, bx, ba, fid, ts) in enumerate(frames):
            out = outs[j]._replace(packed=_PacketRow(shared, j))
            fr = Frame(data=out.fd, frame_id=fid, timestamp=ts,
                       boxes=bx, ref_kf=ref_k,
                       ref_gen=self._slot_gen.get(ref_k, 0))
            fr.R, fr.t = out.R, out.t
            fr.obs_lm = out.obs_lm
            self._pending.append((fr, out, dyn is not None))
        if C >= 2:
            self._prev2_pose = (outs[-2].R, outs[-2].t)
        else:
            self._prev2_pose = (R_last, t_last)
        self.last_frame = self._pending[-1][0]
        if cfg.tracking.pipeline_depth == 0:
            while self._pending:
                sts.append(self._finalize_one())
                if self.state != "OK":
                    self._pending.clear()
                    break
        return sts

    def _adaptive_depth(self) -> bool:
        if self._adaptive is None:
            from ..utils.transport import tunneled
            # opt-in (cfg.tracking.adaptive_pipeline): the readiness poll
            # below makes tracking decisions timing-dependent — see the
            # config comment; never on through the tunnel (queue pathology)
            self._adaptive = (self.cfg.tracking.adaptive_pipeline
                              and not tunneled())
        return self._adaptive

    @staticmethod
    def _packet_ready(out) -> bool:
        """Non-blocking readiness check of a frame's packed readback;
        True (finalize now) when the runtime can't tell."""
        try:
            return bool(out.packed.is_ready())
        except Exception:
            return True

    # ------------------------------------------------------------------
    def _finalize_one(self):
        """Pipelined mode: read back + bookkeep the OLDEST deferred frame."""
        frame, out, was_dyn = self._pending.popleft()
        saved_last = self.last_frame
        st = self._post_track(frame, out)
        if was_dyn:
            self._split_dyn_packet(st)
        # _post_track may set state/insert KF; bookkeeping must see the
        # frame BEFORE the currently-dispatched one as "last"
        self._bookkeep_pipelined(frame)
        self.last_frame = saved_last
        return st

    def _split_dyn_packet(self, st: TrackStats):
        """Slice the dyn packet tail: [28:28+B] verdicts,
        [28+B : 28+B+16B] per-box 3D state (see dynamics_ops.box_3d_state)."""
        B = self.cfg.dynamic.max_boxes
        pk = self._last_packed
        st.verdicts = pk[28:28 + B].astype(np.int32)
        if pk.shape[0] >= 28 + B + 16 * B:
            st.box3d = pk[28 + B:28 + B + 16 * B].reshape(B, 16)

    def _finalize_pending(self):
        """Drain ALL in-flight frames (mode switch / trajectory read)."""
        st = None
        while self._pending:
            st = self._finalize_one()
        return st

    def _bow_fallback(self, frame: Frame, np_R, np_t):
        """Run the TrackReferenceKeyFrame recovery (see _bow_recover);
        returns (n_inliers, frame) on success, None to go LOST. Accepts
        at the local-map inlier bar (the reference requires its
        TrackReferenceKeyFrame winner to then pass TrackLocalMap >= 30,
        Tracking.cc:1686-1694 — matching vs one KF at the same bar is
        the fused-path equivalent)."""
        cfg = self.cfg
        if not cfg.tracking.bow_fallback or self.last_kf_id < 0 \
                or frame.data is None:
            return None
        R, t, obs, packed = _bow_recover(
            self.map, self.cam, frame.data, jnp.int32(self.last_kf_id),
            jnp.asarray(np_R), jnp.asarray(np_t))
        pk = np.asarray(packed)
        n_good = int(pk[0])
        if n_good < cfg.tracking.min_inliers_localmap:
            return None
        frame.R, frame.t = R, t
        frame.np_R = pk[2:11].reshape(3, 3)
        frame.np_t = pk[11:14]
        frame.obs_lm = obs
        return n_good, frame

    def _bookkeep_pipelined(self, frame: Frame):
        if frame.R is None:
            return
        R = frame.np_R if frame.np_R is not None else np.asarray(frame.R)
        t = frame.np_t if frame.np_t is not None else np.asarray(frame.t)
        if self._ref_slot_recycled(frame):
            # the reference slot was recycled while this frame was in
            # flight: a relative entry would recompose against the slot's
            # NEW tenant on export — store the absolute pose instead
            self.trajectory.append((frame.timestamp, -1, R, t))
        else:
            k, Rk, tk = self._ref_kf_pose(frame)
            R_rel = R @ Rk.T
            t_rel = t - R_rel @ tk
            self._traj_by_slot.setdefault(k, []).append(
                len(self.trajectory))
            self.trajectory.append((frame.timestamp, k, R_rel, t_rel))
        frame.np_R, frame.np_t = R, t

    def _ref_slot_recycled(self, frame: Frame) -> bool:
        return (frame.ref_kf >= 0 and
                self._slot_gen.get(frame.ref_kf, 0) != frame.ref_gen)

    def _ref_kf_pose(self, frame: Frame):
        """(k, R_k, t_k) of the reference keyframe for relative-trajectory
        bookkeeping. Prefers the pose that rode the frame's packed readback
        (the exact map snapshot the frame was tracked against — zero device
        fetches, and the same track-instant semantics as the reference's
        mlRelativeFramePoses under its async mapping thread); falls back to
        a cached map fetch on packet-less paths (init, reloc)."""
        if frame.np_Rk is not None and frame.ref_kf >= 0:
            return frame.ref_kf, frame.np_Rk, frame.np_tk
        k = max(self.last_kf_id, 0)
        Rk, tk = self._kf_pose_np(k)
        return k, Rk, tk

    def flush(self):
        """Drain the pipelined frame (call before reading trajectories or
        switching modes)."""
        st = self._finalize_pending()
        return st

    def _stage_inputs(self, gray, aux):
        """Host->device staging of one frame's images (camera-native
        dtypes go up as-is and are cast on device: 1/4 resp. 1/2 the h2d
        bytes of float32)."""
        cfg = self.cfg
        dc = self._scalar_consts()
        g_arr = jnp.asarray(gray)
        depth_scale = None
        ds = cfg.tracking.depth_stride
        if aux is not None:
            if cfg.sensor == "rgbd" and ds > 1:
                aux = np.ascontiguousarray(aux[::ds, ::ds])
            aux_arr = jnp.asarray(aux)
            if cfg.sensor == "rgbd" and aux_arr.dtype == jnp.uint16:
                depth_scale = dc["depth_scale"]
        else:
            aux_arr = self._zero_aux(gray.shape)
        return g_arr, aux_arr, depth_scale

    def prefetch(self, gray, aux):
        """Begin uploading the NEXT frame's images on a worker thread.

        Pass the SAME array objects to the next step_images call — they
        are matched by identity. Intended to overlap the upload with the
        blocking packed readback on hosts with a concurrent h2d path.
        MEASURED through the axon tunnel: a REGRESSION (21.6 -> 14.8 fps)
        — the worker's transfers contend with the critical readback on
        the serialized transport. Benchmark on your transport before
        enabling; bench.py deliberately does not use it."""
        if self._uploader is None:
            from concurrent.futures import ThreadPoolExecutor
            self._uploader = ThreadPoolExecutor(max_workers=1)
        while len(self._prefetch) >= 2:       # bound staged frames
            self._prefetch.pop(next(iter(self._prefetch)))
        self._prefetch[id(gray)] = (
            gray, aux, self._uploader.submit(self._stage_inputs, gray, aux))

    def _zero_aux(self, shape):
        z = self._zero_aux_cache
        if z is None or z.shape != shape:
            z = self._zero_aux_cache = jnp.zeros(shape, jnp.float32)
        return z

    def process(self, frame: Frame) -> TrackStats:
        if self.state == "NOT_INITIALIZED":
            st = self._initialize(frame)
        elif self.state == "OK":
            st = self._track(frame)
        else:  # LOST -> Relocalization (ref Tracking.cc:2212)
            st = self._relocalize_then_track(frame)

        self._bookkeep(frame)
        return st

    def _bookkeep(self, frame: Frame):
        # velocity + trajectory bookkeeping (all host numpy — the pose
        # arrives in the packed readback, no extra device fetch)
        if frame.R is not None:
            R = frame.np_R if frame.np_R is not None else np.asarray(frame.R)
            t = frame.np_t if frame.np_t is not None else np.asarray(frame.t)
            last = self.last_frame
            if last is not None and last.R is not None:
                Rl = last.np_R if last.np_R is not None else np.asarray(last.R)
                tl = last.np_t if last.np_t is not None else np.asarray(last.t)
                # velocity = T_cur * T_last^-1
                Rv = R @ Rl.T
                tv = t - Rv @ tl
                self.velocity = (Rv, tv)
            # store the pose RELATIVE to the reference keyframe so later
            # map corrections (local BA, loop closure) propagate into the
            # exported trajectory (ref System::SaveTrajectoryTUM uses
            # mlRelativeFramePoses the same way, System.cc:447-480)
            if self._ref_slot_recycled(frame):
                self.trajectory.append((frame.timestamp, -1, R, t))
            else:
                k, Rk, tk = self._ref_kf_pose(frame)
                R_rel = R @ Rk.T
                t_rel = t - R_rel @ tk
                self._traj_by_slot.setdefault(k, []).append(
                    len(self.trajectory))
                self.trajectory.append((frame.timestamp, k, R_rel, t_rel))
            frame.np_R, frame.np_t = R, t
        self.last_frame = frame

    def _ref_kf_const(self):
        """Device int32 of the current reference-KF index; rebuilt only
        when last_kf_id changes (per-frame jnp.int32 would be a per-frame
        h2d tunnel trip)."""
        k = max(self.last_kf_id, 0)
        cached = self._ref_kf_dev
        if cached is None or cached[0] != k:
            self._ref_kf_dev = cached = (k, jnp.int32(k))
        return cached[1]

    def _kf_pose_np(self, k: int):
        """Cached numpy pose of keyframe k (avoids a ~30ms tunnel fetch per
        frame; invalidated whenever the map poses change)."""
        cached = self._kf_pose_cache.get(k)
        if cached is None:
            cached = (np.asarray(self.map.kf_R[k]),
                      np.asarray(self.map.kf_t[k]))
            self._kf_pose_cache[k] = cached
        return cached

    def trajectory_poses(self) -> List[Tuple[float, np.ndarray, np.ndarray]]:
        """Absolute (Tcw) per-frame trajectory composed against the CURRENT
        keyframe poses (so BA/loop corrections are reflected). Entries with
        k = -1 were materialized to ABSOLUTE when their reference slot was
        recycled at capacity (the analog of the reference's bad-reference
        walk in SaveTrajectoryTUM, /root/reference/src/System.cc:470-486)."""
        kf_R = np.asarray(self.map.kf_R)
        kf_t = np.asarray(self.map.kf_t)
        out = []
        for ts, k, R_rel, t_rel in self.trajectory:
            if k < 0:
                out.append((ts, R_rel, t_rel))
                continue
            R = R_rel @ kf_R[k]
            t = R_rel @ kf_t[k] + t_rel
            out.append((ts, R, t))
        return out

    def _materialize_slot_trajectory(self, k: int, old_R, old_t):
        """Before keyframe slot k is recycled, convert every trajectory
        entry referencing it to an absolute pose using the OLD tenant's
        (frozen) pose — afterwards the slot holds an unrelated camera."""
        for idx in self._traj_by_slot.pop(k, []):
            ts, kk, R_rel, t_rel = self.trajectory[idx]
            if kk != k:
                continue
            self.trajectory[idx] = (ts, -1, R_rel @ old_R,
                                    R_rel @ old_t + t_rel)

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
        self.map, _slot = make_keyframe(
            self.map, self.cam, frame.data, R0, t0, frame.frame_id,
            frame.timestamp, no_obs, depth_th, self._sf,
            n_levels=self.cfg.orb.n_levels)
        self.n_kf_host += 1
        self.kf_seq += 1
        k = self.n_kf_host - 1
        # frame observations = what the KF just bound
        frame.obs_lm = self.map.kf_obs_lm[k]
        self.state = "OK"
        self.last_kf_id = k
        self.frames_since_kf = 0
        self.last_kf_inliers = n
        if self.on_keyframe:
            self.on_keyframe(k)
        return TrackStats("OK", is_keyframe=True, frame_id=frame.frame_id,
                          np_R=np.asarray(frame.R), np_t=np.asarray(frame.t))

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
        # masked writes dump to an out-of-range extra slot (sliced off) so
        # a genuine bind to slot 0 can't be clobbered by a no-op write
        wr = init.good & (new_ids >= 0)
        obs1 = jnp.full(N + 1, -1, jnp.int32).at[
            jnp.where(wr, init.idx2, N)].set(new_ids)[:N]
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
        self.n_kf_host = 2
        self.kf_seq = 2
        self.last_kf_id = 1
        self.frames_since_kf = 0
        self.last_kf_inliers = int((frame.obs_lm >= 0).sum())
        self._init_ref = None
        if self.on_keyframe:
            self.on_keyframe(0)
            self.on_keyframe(1)
        return TrackStats("OK", is_keyframe=True, frame_id=frame.frame_id,
                          np_R=np.asarray(frame.R), np_t=np.asarray(frame.t))

    # ------------------------------------------------------------------
    def _relocalize_then_track(self, frame: Frame) -> TrackStats:
        if self.relocalizer is not None:
            res = self.relocalizer(frame)
            ok, R, t, obs = res[:4]
            cand = int(res[4]) if len(res) > 4 else -1
            if ok:
                frame.R, frame.t = R, t
                frame.obs_lm = obs
                self.velocity = None
                self._lost_streak = 0
                # drift correction: a successful reloc is a verified loop
                # observation between the last pre-loss keyframe and the
                # matched candidate — close it BEFORE resuming so the
                # local map the tracker refines against is consistent
                # (the reference leaves the drifted approach keyframes in
                # the map, src/Tracking.cc:2212-2373; see
                # LoopCloser.on_relocalization)
                if self.on_reloc is not None and cand >= 0 \
                        and self.last_kf_id >= 0 \
                        and not self.localization_only:
                    self.on_reloc(self.last_kf_id, cand)
                # resume as if motion-model frame: refine on local map
                self.last_frame = frame
                self.state = "OK"
                return self._track(frame)
        # hard reset when lost right after initialization AND relocalization
        # failed (ref Tracking.cc:918-927 resets at <=5 KFs; we give
        # relocalization a chance first — strictly more capable). Reached
        # both when no relocalizer is wired AND when the attempt above
        # returned ok=False: a young map that cannot relocalize is rebuilt.
        # A near-featureless frame (occlusion / blank wall) can't indict the
        # map, so it never triggers the reset — we stay LOST and keep trying.
        n_feat = int(np.asarray(frame.data.valid).sum())
        if self.n_kf_host <= 5 and n_feat >= 50 and not self.localization_only:
            self.reset()
            return TrackStats("NOT_INITIALIZED")
        # prolonged loss beyond relocalization's reach (the loss region's
        # keyframes evicted at capacity, or genuinely new terrain):
        # reinitialize a FRESH map so the system stays alive — trajectory
        # up to the break is preserved as absolute poses; the new segment
        # starts a new gauge (a practical-SLAM map-reset policy the
        # unbounded-memory reference never needs)
        self._lost_streak = getattr(self, "_lost_streak", 0) + 1
        max_lost = self.cfg.tracking.max_lost_frames
        if max_lost > 0 and self._lost_streak >= max_lost \
                and n_feat >= 50 and not self.localization_only:
            self.reset()          # trajectory preserved as absolute poses
            return TrackStats("NOT_INITIALIZED")
        frame.R, frame.t = None, None
        frame.obs_lm = jnp.full(frame.data.xy.shape[0], -1, jnp.int32)
        return TrackStats("LOST")

    def reset(self, preserve_trajectory: bool = True):
        """Clear map and state (ref Tracking::Reset :2375).

        Pre-reset relative poses reference keyframes that will no longer
        exist, so they are MATERIALIZED to absolute poses and kept (the
        reference clears mlRelativeFramePoses and loses them; keeping the
        already-tracked segment is strictly better for trajectory
        export). The post-reset segment starts a new gauge."""
        kept = []
        if preserve_trajectory and self.trajectory:
            kept = [(ts, -1, R, t) for ts, R, t in self.trajectory_poses()]
        self.map = empty_map(self.cfg.capacity)
        self.state = "NOT_INITIALIZED"
        self.last_frame = None
        self.velocity = None
        self.trajectory = kept
        self._traj_by_slot = {}
        self._slot_gen = {}
        self.last_kf_id = -1
        self.frames_since_kf = 0
        self.last_kf_inliers = 0
        self._kf_pose_cache = {}
        self._ref_kf_dev = None
        self._init_ref = None
        self._prev2_pose = None
        self.n_kf_host = 0
        self.kf_seq = 0
        self._lost_streak = 0
        self._pending.clear()
        self._prefetch.clear()

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
        """Per-frame hot path: ONE fused device call + ONE packed readback
        (see frontend/fused.py for the motivation)."""
        from .fused import fused_track_prebuilt
        cfg = self.cfg
        dc = self._scalar_consts()
        R_pred, t_pred = self._predict_pose()
        last_ids = self.last_frame.obs_lm
        if last_ids is None:
            last_ids = jnp.full(frame.data.xy.shape[0], -1, jnp.int32)
        frame.ref_kf = max(self.last_kf_id, 0)
        frame.ref_gen = self._slot_gen.get(frame.ref_kf, 0)
        out = fused_track_prebuilt(
            self.map, self.cam, self.bounds, frame.data, last_ids,
            jnp.asarray(R_pred), jnp.asarray(t_pred),
            jnp.asarray(self.last_frame.R), jnp.asarray(self.last_frame.t),
            self._ref_kf_const(),
            dc["mm_radius"], dc["local_radius"], dc["depth_th"], dc["sf"],
            dc["min_tr"],
            stereo=self.stereo_obs,
            max_kf=cfg.capacity.local_ba_keyframes,
            max_lm=cfg.capacity.local_ba_landmarks,
            n_levels=cfg.orb.n_levels)
        return self._post_track(frame, out)

    def _scalar_consts(self):
        if self._dev_consts is None:
            cfg = self.cfg
            B = cfg.dynamic.max_boxes
            self._dev_consts = {
                "bx_empty": jnp.full((B, 4), -1.0, jnp.float32),
                "ba_empty": jnp.zeros(B, bool),
                "mm_radius": jnp.float32(cfg.tracking.motion_model_radius),
                "local_radius": jnp.float32(cfg.tracking.local_map_radius),
                "depth_th": jnp.float32(cfg.camera.th_depth *
                                        float(self.cam.baseline)),
                "sf": jnp.float32(self._sf),
                "min_tr": jnp.int32(cfg.tracking.min_inliers_track),
                "vel0": jnp.float32(0.0),
                "vel1": jnp.float32(1.0),
                "no_obs": jnp.full(cfg.capacity.max_keypoints, -1,
                                   jnp.int32),
                "depth_scale": jnp.float32(
                    1.0 / max(cfg.camera.depth_map_factor, 1e-9)),
                "kf_redundancy": jnp.float32(
                    cfg.mapping.kf_redundancy_ratio),
            }
        return self._dev_consts

    def _post_track(self, frame: Frame, out) -> TrackStats:
        cfg = self.cfg
        packed = np.asarray(out.packed)       # the single readback
        self._last_packed = packed
        n_mm = int(packed[0])
        n_map = int(packed[1])
        close_bound = int(packed[2])
        close_unbound = int(packed[3])
        np_R = packed[4:13].reshape(3, 3)
        np_t = packed[13:16]
        if frame.ref_kf >= 0:
            frame.np_Rk = packed[16:25].reshape(3, 3)
            frame.np_tk = packed[25:28]

        if out.lm_visible is not None:
            # batched (MultiSystem) callers apply this update to the
            # stacked map themselves and pass lm_visible=None
            self.map = self.map._replace(lm_visible=out.lm_visible,
                                         lm_found=out.lm_found)
        if n_mm < cfg.tracking.min_inliers_track or \
                n_map < cfg.tracking.min_inliers_localmap:
            # BoW fallback vs the reference keyframe BEFORE going LOST
            # (ref Tracking.cc:1618-1660): projection-gated search dies
            # when the motion model is wrong; ungated descriptor matching
            # vs the ref KF survives. One extra device call, rare frames.
            rec = self._bow_fallback(frame, np_R, np_t)
            if rec is None:
                self.state = "LOST"
                frame.R, frame.t = out.R, out.t
                frame.np_R, frame.np_t = np_R, np_t
                frame.obs_lm = out.obs_lm
                return TrackStats("LOST", n_inliers_mm=n_mm,
                                  n_inliers_map=n_map,
                                  frame_id=frame.frame_id)
            n_good, frame = rec
            self.state = "OK"
            self.frames_since_kf += 1
            self._prev2_pose = None        # velocity invalid after a jump
            return TrackStats("OK", n_inliers_mm=n_mm, n_inliers_map=n_good,
                              frame_id=frame.frame_id, np_R=frame.np_R,
                              np_t=frame.np_t)

        frame.R, frame.t = out.R, out.t
        frame.np_R, frame.np_t = np_R, np_t
        frame.obs_lm = out.obs_lm
        self.state = "OK"
        self.frames_since_kf += 1
        self._lost_streak = 0

        st = TrackStats("OK", n_inliers_mm=n_mm, n_inliers_map=n_map,
                        frame_id=frame.frame_id, np_R=np_R, np_t=np_t)
        if self.localization_only:
            # dual-hypothesis arbitration (ref Tracking.cc:728-766): while
            # in VO mode, also relocalize and PREFER that solution; keep
            # the motion-model pose only when relocalization fails
            relocated = False
            if self.vo_mode and self.relocalizer is not None:
                # (vo/localization mode: map frozen, no drift correction)
                ok, Rr, tr, obs = self.relocalizer(frame)[:4]
                if ok:
                    frame.R = jnp.asarray(np.asarray(Rr, np.float32))
                    frame.t = jnp.asarray(np.asarray(tr, np.float32))
                    frame.np_R = np.asarray(Rr, np.float32)
                    frame.np_t = np.asarray(tr, np.float32)
                    if obs is not None:
                        frame.obs_lm = obs
                    st.np_R, st.np_t = frame.np_R, frame.np_t
                    self._prev2_pose = None     # velocity invalid now
                    relocated = True            # ref: mbVO = false
            self.vo_mode = (not relocated and
                            n_map < self.cfg.tracking.vo_mode_inliers)
        if not self.localization_only and \
                self._need_keyframe_counts(n_map, close_bound,
                                           close_unbound):
            before = self.kf_seq
            self._create_keyframe(frame, n_map)
            st.is_keyframe = self.kf_seq > before
        return st

    # ------------------------------------------------------------------
    def _need_keyframe_counts(self, n_map: int, close_bound: int,
                              close_unbound: int) -> bool:
        """NeedNewKeyFrame (ref :1838-1921), depth-sensor simplification:
        insert when tracking weakens vs the reference KF or many close
        points are unbound (counts arrive in the fused packet)."""
        cfg = self.cfg
        if self.frames_since_kf < cfg.tracking.min_frames_between_kf + 1:
            return False
        if self.frames_since_kf >= cfg.tracking.max_frames_between_kf:
            return True
        weak = n_map < 0.75 * max(self.last_kf_inliers, 1)
        need_close = close_bound < 100 and close_unbound > 70
        return bool(weak or need_close)

    # ------------------------------------------------------------------
    def _create_keyframe(self, frame: Frame, n_map: int):
        from ..backend.mapping_stage import insert_keyframe_stage
        cfg = self.cfg
        if self.n_kf_host >= cfg.capacity.max_keyframes:
            # at capacity: recycle a CULLED slot (KeyFrameCulling analog —
            # the reference deletes redundant KeyFrames; the fixed-shape
            # SoA reuses their rows, so KITTI-length sequences keep
            # inserting). ONE tiny [2]-int readback per KF event, paid
            # only at capacity. No culled slot -> graceful no-insert.
            probe = np.asarray(_slot_probe(self.map))
            if probe[1] == 0:
                # full with NOTHING redundancy-culled: force-evict the
                # keyframe least covisible with the current one so the
                # bounded map keeps sliding with the camera (without
                # this, tracking eventually ages out of the frozen local
                # map and goes permanently LOST — measured at 2000
                # frames). backend/fusion.evict_if_full.
                from ..backend.fusion import evict_if_full
                self.map = evict_if_full(self.map, self._ref_kf_const())
                probe = np.asarray(_slot_probe(self.map))
                if probe[1] == 0:       # only possible at K <= 2
                    return
            k = int(probe[0])
            # trajectory entries relative to the old tenant become
            # absolute NOW — afterwards slot k holds an unrelated camera
            self._materialize_slot_trajectory(
                k, probe[2:11].reshape(3, 3), probe[11:14])
            self._kf_pose_cache.pop(k, None)     # stale pose of old tenant
            # in-flight frames referencing slot k must not add relative
            # entries against the new tenant (see _ref_slot_recycled)
            self._slot_gen[k] = self._slot_gen.get(k, 0) + 1
        else:
            self.n_kf_host += 1
            k = self.n_kf_host - 1
        self.kf_seq += 1         # monotonic insertion counter (loop gates)
        dc = self._scalar_consts()
        # the whole insert->cull->fuse->BA->cull chain is ONE device call
        self.map, _ = insert_keyframe_stage(
            self.map, self.cam, frame.data, frame.R, frame.t,
            jnp.int32(frame.frame_id), jnp.float32(frame.timestamp),
            frame.obs_lm, dc["depth_th"], dc["sf"],
            dc["kf_redundancy"],
            n_levels=cfg.orb.n_levels, stereo=self.stereo_obs,
            max_kf=cfg.capacity.local_ba_keyframes,
            max_lm=cfg.capacity.local_ba_landmarks,
            do_ba=(self.kf_seq >= 3),
            do_refresh=((self.kf_seq - 1) % 4 == 3),
            tri_neighbors=(cfg.mapping.stereo_tri_neighbors
                           if self.stereo_obs else 0))
        if not self.stereo_obs:
            # mono: new landmarks come from triangulation, not depth
            from ..backend.triangulation import create_new_landmarks
            self.map = create_new_landmarks(self.map, self.cam, k, self._sf,
                                            n_levels=self.cfg.orb.n_levels)
        frame.obs_lm = self.map.kf_obs_lm[k]
        self.last_kf_id = k
        self.frames_since_kf = 0
        self.last_kf_inliers = n_map
        if self.on_keyframe:
            self.on_keyframe(k)
        self._kf_pose_cache.clear()   # map poses may have moved (BA/loop)
