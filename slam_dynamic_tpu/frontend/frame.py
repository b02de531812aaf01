"""Per-frame feature container + construction pipeline.

Equivalent of the reference Frame (/root/reference/src/Frame.cc ctors
:66,:129,:240,:297,:406): ORB extraction, undistortion, depth association,
and dynamic-box feature partitioning. Unlike the reference — which physically
splits keypoints into static/dynamic arrays (Frame.cc:173-203 and
firstSeparate :555-604) — all N keypoint slots are kept and a `static_mask`
carries the partition, so shapes stay fixed and reinstatement
(Frame::UpdateFrame :607-641) is a mask flip.
"""
from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional

import jax.numpy as jnp
import numpy as np

from ..config import SystemConfig
from ..utils.camera import Intrinsics, undistort_points
from ..ops.stereo import match_stereo, depth_from_rgbd
from .extractor import extract, Keypoints


class FrameData(NamedTuple):
    """Device-side per-frame arrays (fixed capacity N)."""

    xy: jnp.ndarray          # [N, 2] undistorted pixel coords
    xy_raw: jnp.ndarray      # [N, 2] raw (distorted) coords
    level: jnp.ndarray       # [N] int32
    angle: jnp.ndarray       # [N] float32
    response: jnp.ndarray    # [N] float32
    desc: jnp.ndarray        # [N, 8] uint32
    valid: jnp.ndarray       # [N] bool
    ur: jnp.ndarray          # [N] float32 virtual right u (-1 none)
    depth: jnp.ndarray       # [N] float32 (-1 none)
    static_mask: jnp.ndarray  # [N] bool (False = quarantined by a box)
    scale: jnp.ndarray       # [N] float32 (scale_factor ** level)


@dataclasses.dataclass
class Frame:
    """Host-side frame: device arrays + scalar bookkeeping."""

    data: FrameData
    frame_id: int
    timestamp: float
    # pose (world->camera), set by tracking
    R: Optional[jnp.ndarray] = None
    t: Optional[jnp.ndarray] = None
    # per-keypoint landmark association from tracking ([N] int32, -1 = none)
    obs_lm: Optional[jnp.ndarray] = None
    # dynamic boxes [B, 4] (x0,y0,x1,y1) + ids/status (host numpy)
    boxes: Optional[np.ndarray] = None
    box_ids: Optional[np.ndarray] = None
    box_status: Optional[np.ndarray] = None   # 0 tentative, 1 static, 2 dynamic
    # cached host copies of the pose (avoid device fetches on hot path)
    np_R: Optional[np.ndarray] = None
    np_t: Optional[np.ndarray] = None
    # reference keyframe at dispatch + its pose from the packed readback
    # (the exact map snapshot this frame was tracked against) — lets the
    # relative-trajectory bookkeeping skip any device fetch
    ref_kf: int = -1
    np_Rk: Optional[np.ndarray] = None
    np_tk: Optional[np.ndarray] = None
    # generation of the reference-KF SLOT at dispatch time: if the slot
    # recycles (new tenant) before this frame's trajectory entry is
    # appended, the entry is stored as an absolute pose instead of
    # relative-to-the-wrong-camera (Tracker._slot_gen)
    ref_gen: int = 0


def keypoints_in_boxes(xy: jnp.ndarray, valid: jnp.ndarray,
                       boxes: np.ndarray, box_valid: np.ndarray):
    """[N] bool: keypoint falls inside any active box (vectorized
    equivalent of Frame::firstSeparate membership test, ref :565-586)."""
    if boxes is None or len(boxes) == 0 or not box_valid.any():
        return jnp.zeros(xy.shape[0], bool)
    b = jnp.asarray(boxes, jnp.float32)          # [B, 4]
    bv = jnp.asarray(box_valid)
    inside = ((xy[:, None, 0] >= b[None, :, 0]) &
              (xy[:, None, 0] <= b[None, :, 2]) &
              (xy[:, None, 1] >= b[None, :, 1]) &
              (xy[:, None, 1] <= b[None, :, 3]) & bv[None, :])
    return inside.any(axis=1) & valid


def build_frame(cfg: SystemConfig, cam: Intrinsics, gray: np.ndarray,
                frame_id: int, timestamp: float,
                right: Optional[np.ndarray] = None,
                depth_map: Optional[np.ndarray] = None,
                boxes: Optional[np.ndarray] = None,
                box_valid: Optional[np.ndarray] = None,
                mask: Optional[np.ndarray] = None) -> Frame:
    """Construct a frame from images (+ optional detections).

    mask: optional [H, W] bool dynamic-pixel mask (True = dynamic), the
    RGB-D/Mask-R-CNN path of the reference (Frame.cc:297-403).

    Accepts camera-native dtypes: uint8 gray and uint16 depth (raw TUM
    units, converted via cfg.camera.depth_map_factor); the fused device
    path (frontend/fused.py) makes the same conversion on device.
    """
    if depth_map is not None and \
            np.asarray(depth_map).dtype == np.uint16:
        depth_map = np.asarray(depth_map).astype(np.float32) \
            / max(cfg.camera.depth_map_factor, 1e-9)
    h, w = gray.shape
    img = jnp.asarray(gray, jnp.float32)
    kp: Keypoints = extract(img, cfg.orb, h, w)
    xy_raw = kp.xy
    xy = undistort_points(cam, xy_raw)
    scale = jnp.asarray(cfg.orb.scale_factor, jnp.float32) ** \
        kp.level.astype(jnp.float32)

    if right is not None:
        kp_r: Keypoints = extract(jnp.asarray(right, jnp.float32), cfg.orb,
                                  h, w)
        scale_r = jnp.asarray(cfg.orb.scale_factor, jnp.float32) ** \
            kp_r.level.astype(jnp.float32)
        sm = match_stereo(img, jnp.asarray(right, jnp.float32), kp, kp_r,
                          cam.bf, 0.1, scale, scale_r)
        ur, depth, _ = sm
    elif depth_map is not None:
        sm = depth_from_rgbd(jnp.asarray(depth_map, jnp.float32), xy_raw,
                             kp.valid, cam.bf)
        ur, depth = sm.u_right, sm.depth
    else:
        ur = jnp.full(kp.xy.shape[0], -1.0)
        depth = jnp.full(kp.xy.shape[0], -1.0)

    in_box = keypoints_in_boxes(xy, kp.valid,
                                boxes if boxes is not None else np.zeros((0, 4)),
                                box_valid if box_valid is not None
                                else np.zeros((0,), bool))
    static = kp.valid & ~in_box
    if mask is not None:
        # pixel-mask quarantine (RGB-D path)
        mk = jnp.asarray(mask)
        xi = jnp.clip(jnp.round(xy_raw[:, 0]).astype(jnp.int32), 0, w - 1)
        yi = jnp.clip(jnp.round(xy_raw[:, 1]).astype(jnp.int32), 0, h - 1)
        static = static & ~mk[yi, xi]

    data = FrameData(xy=xy, xy_raw=xy_raw, level=kp.level, angle=kp.angle,
                     response=kp.response, desc=kp.desc, valid=kp.valid,
                     ur=ur, depth=depth, static_mask=static, scale=scale)
    data = pad_frame_data(data, cfg.capacity.max_keypoints)
    return Frame(data=data, frame_id=frame_id, timestamp=timestamp,
                 boxes=boxes, box_ids=None, box_status=None)


def empty_frame_data(n_slots: int) -> FrameData:
    """All-invalid FrameData (placeholder ref frame for fused dynamics)."""
    z2 = jnp.zeros((n_slots, 2), jnp.float32)
    z1 = jnp.zeros(n_slots, jnp.float32)
    return FrameData(
        xy=z2, xy_raw=z2, level=jnp.zeros(n_slots, jnp.int32), angle=z1,
        response=z1, desc=jnp.zeros((n_slots, 8), jnp.uint32),
        valid=jnp.zeros(n_slots, bool), ur=z1 - 1.0, depth=z1 - 1.0,
        static_mask=jnp.zeros(n_slots, bool), scale=z1 + 1.0)


def pad_frame_data(fd: FrameData, n_slots: int) -> FrameData:
    """Pad keypoint arrays to the map's slot capacity (padding invalid)."""
    n = fd.xy.shape[0]
    if n == n_slots:
        return fd
    assert n < n_slots, f"frame has {n} keypoints > capacity {n_slots}"
    p = n_slots - n

    def pad(a, fill=0):
        return jnp.concatenate(
            [a, jnp.full((p,) + a.shape[1:], fill, a.dtype)])

    return FrameData(
        xy=pad(fd.xy), xy_raw=pad(fd.xy_raw), level=pad(fd.level),
        angle=pad(fd.angle), response=pad(fd.response), desc=pad(fd.desc),
        valid=pad(fd.valid, False), ur=pad(fd.ur, -1.0),
        depth=pad(fd.depth, -1.0), static_mask=pad(fd.static_mask, False),
        scale=pad(fd.scale, 1.0))
