"""Dynamic-object geometric-consistency reclassifier.

Equivalent of the reference's TrackHomo/Separate/classifyH/classifyF
(/root/reference/src/Tracking.cc:968-1367) + Frame::UpdateFrame
(/root/reference/src/Frame.cc:607-641): estimate H and F from the static
background between the current frame and a reference frame ~0.2 s older,
then chi2-test the features inside each tracked box; boxes whose features
move consistently with the background are reclassified static and their
features reinstated (mask flip).

Implemented in frontend/dynamics_ops.py as batched-hypothesis RANSAC +
vectorized chi2 tests; this module holds the host-side frame queue and box
status bookkeeping.
"""
from __future__ import annotations

import collections
from typing import Deque, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from ..config import SystemConfig
from ..utils.camera import Intrinsics


class DynamicsModule:
    """Host orchestration of the dynamic-scene pipeline.

    Keeps the reference-frame queue (ref Tracking.cc:952-959: cap
    0.3*fps, consume frames >=0.2 s old :621-631) and per-box dynamic
    streak counters (2 consecutive dynamic frames to confirm, :1213-1226).
    """

    def __init__(self, cfg: SystemConfig, cam: Intrinsics):
        self.cfg = cfg
        self.cam = cam
        maxq = max(2, int(cfg.tracking.frame_queue_factor * cfg.camera.fps))
        self.queue: Deque = collections.deque(maxlen=maxq)
        self.fd_queue: Deque = collections.deque(maxlen=maxq)  # (ts, fd)
        self._dummy_fd = None
        self._have0 = None
        self._have1 = None
        # per-object 3D state, smoothed per frame (box id -> dict with
        # d, t (camera-frame center), R (OBB rotation rows), ext, ts)
        self.obj_state = {}
        self._obj_depth = {}       # box id -> smoothed depth

    # ------------------ fused-path API (one device call per frame) -------
    def pick_ref_fd(self, ts: float, n_slots: int):
        """Device FrameData of the reference frame (>= ref_frame_age_s
        old) or an all-invalid placeholder; returns (fd, have_ref 0/1)."""
        import jax.numpy as jnp
        from .frame import empty_frame_data
        if self._dummy_fd is None:
            self._dummy_fd = empty_frame_data(n_slots)
            self._have0 = jnp.float32(0.0)
            self._have1 = jnp.float32(1.0)
        best = None
        for t0, fd in self.fd_queue:
            if ts - t0 >= self.cfg.tracking.ref_frame_age_s:
                best = fd
        if best is None:
            return self._dummy_fd, self._have0
        return best, self._have1

    def push_fd(self, ts: float, fd):
        self.fd_queue.append((ts, fd))

    def update_streaks(self, boxes, verdicts):
        """Host streak bookkeeping from fresh verdicts (2 consecutive
        dynamic frames confirm — ref Tracking.cc:1213-1226)."""
        import numpy as np
        for i in range(len(boxes.boxes)):
            v = int(verdicts[i]) if i < len(verdicts) else 0
            if v == 2:
                boxes.dyn_streak[i] += 1
                if boxes.dyn_streak[i] >= self.cfg.tracking.dyn_confirm_frames:
                    boxes.status[i] = 2
            elif v == 1:
                boxes.dyn_streak[i] = 0
                if boxes.status[i] != 2:
                    boxes.status[i] = 1

    def update_box3d(self, boxes, box3d, timestamp: float):
        """Per-frame dynamic-object 3D state with the reference's gates
        (ref Tracking.cc:809-881): status==2 boxes only, image-edge 20%
        margin, depth <= 20 m, 5 m jump rejection, weight-3 temporal
        smoothing keyed by box TRACK id (survives slot churn). box3d is
        the raw [B, 16] device block (dynamics_ops.box_3d_state)."""
        import numpy as np
        if box3d is None or len(boxes.boxes) == 0:
            return
        W = self.cfg.camera.width
        # host floats from config, NOT self.cam: the device Intrinsics'
        # fields are jnp scalars, and mixing them into this host math
        # makes np.array() below fetch THREE fresh device values per box
        # — ~220 ms/frame through the tunnel (measured, cProfile round 4)
        cam = self.cfg.camera
        for i in range(min(len(boxes.boxes), box3d.shape[0])):
            if boxes.status[i] != 2:
                continue
            cx = (boxes.boxes[i, 0] + boxes.boxes[i, 2]) * 0.5
            if cx < 0.2 * W or cx > 0.8 * W:    # edge depth unreliable
                continue
            d = float(box3d[i, 0])
            if d <= 0 or d > 20.0:
                continue
            bid = int(boxes.ids[i])
            last = self._obj_depth.get(bid)
            # stale-state aging: the reference compares against the
            # IMMEDIATELY PREVIOUS frame only — a smoothed depth from
            # before an occlusion/re-entry gap must not freeze the track
            # via the jump filter forever
            stale_s = 2.0 * self.cfg.tracking.ref_frame_age_s
            if last is not None and timestamp - last[1] > stale_s:
                last = None
            if last is not None:
                if abs(last[0] - d) > 5.0:       # jump rejection
                    continue
                d = (last[0] + 2.0 * d) / 3.0    # weight-3 smoothing
            self._obj_depth[bid] = (d, timestamp)
            cy = (boxes.boxes[i, 1] + boxes.boxes[i, 3]) * 0.5
            # box-center ray at the smoothed depth (ref tcd)
            t = np.array([(cx - cam.cx) / cam.fx * d,
                          (cy - cam.cy) / cam.fy * d, d], np.float32)
            self.obj_state[bid] = dict(
                d=d, t=t, R=np.asarray(box3d[i, 4:13]).reshape(3, 3),
                ext=np.asarray(box3d[i, 13:16]), ts=timestamp)

    def pre_track(self, frame, boxes, tracker):
        """Run the H/F reclassification against the reference frame before
        pose tracking, so reinstated features participate in tracking."""
        from . import dynamics_ops as dops
        ref = self._pick_reference(frame.timestamp)
        if ref is None or boxes.boxes is None or len(boxes.boxes) == 0:
            return
        result = dops.classify_boxes(
            self.cam, ref.data, frame.data,
            jnp.asarray(boxes.boxes, jnp.float32),
            jnp.asarray(np.ones(len(boxes.boxes), bool)),
            n_hyp=self.cfg.dynamic.ransac_hypotheses,
            thresh_px=self.cfg.dynamic.ransac_threshold_px,
            chi2_h=self.cfg.dynamic.chi2_homography,
            chi2_f=self.cfg.dynamic.chi2_fundamental,
            min_pairs=self.cfg.dynamic.min_pairs_for_model,
            seed=self.cfg.seed + frame.frame_id)
        verdict = np.asarray(result.verdict)  # [B] 0 unknown 1 static 2 dyn
        # streak bookkeeping (2 consecutive dynamic frames confirm)
        for i in range(len(boxes.boxes)):
            if verdict[i] == 2:
                boxes.dyn_streak[i] += 1
                if boxes.dyn_streak[i] >= self.cfg.tracking.dyn_confirm_frames:
                    boxes.status[i] = 2
            elif verdict[i] == 1:
                boxes.dyn_streak[i] = 0
                if boxes.status[i] != 2:
                    boxes.status[i] = 1
        # reinstate features of static-verdict boxes (Frame::UpdateFrame)
        static_boxes = jnp.asarray(boxes.status == 1)
        if bool(static_boxes.any()):
            frame.data = dops.reinstate_features(
                frame.data, jnp.asarray(boxes.boxes, jnp.float32),
                static_boxes)

    def post_track(self, frame, boxes, tracker):
        """Queue maintenance after tracking (the frame now has a pose)."""
        self.queue.append(frame)

    def _pick_reference(self, ts: float):
        """Oldest frame at least ref_frame_age_s older (ref :621-631)."""
        best = None
        for f in self.queue:
            if ts - f.timestamp >= self.cfg.tracking.ref_frame_age_s:
                best = f
        if best is None and len(self.queue) > 0:
            return None
        return best
