"""The fused per-frame tracking step: ONE device call, ONE packed readback.

Motivation (measured on the axon TPU tunnel): kernel time is trivial
(ORB extraction 0.13 ms/frame) but every device->host readback costs
~30 ms. The reference's per-frame hot path therefore maps to a single jit
unit:

  extract (+right-image extract / depth lookup) -> undistort -> box
  quarantine -> track vs last-frame landmarks (motion model) -> wide
  re-search fallback (computed unconditionally, selected by mask) ->
  local-map selection -> track vs local map -> landmark stat bumps ->
  keyframe-decision statistics

and everything the host state machine needs returns as ONE [28]-float
packet (counts + pose + reference-KF pose). Keyframe insertion/BA remain separate conditional
calls (they run on few frames). When the dynamic-object reclassifier is
active, the frame is built and classified first and the prebuilt variant
is used (3 device calls/frame instead of 1).
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import ORBConfig
from ..ops import hamming as hm
from ..ops.stereo import depth_from_rgbd, match_stereo
from ..utils.camera import Intrinsics, undistort_points
from ..worldmap.state import MapState
from .extractor import _extract_impl
from .frame import FrameData, pad_frame_data
from . import tracking_ops as tops


class FusedOut(NamedTuple):
    fd: FrameData            # device-resident frame
    obs_lm: jnp.ndarray      # [N] global landmark ids (-1)
    R: jnp.ndarray
    t: jnp.ndarray
    lm_visible: jnp.ndarray  # updated map counters
    lm_found: jnp.ndarray
    packed: jnp.ndarray      # [28] float32 host packet:
    # 0 n_mm, 1 n_map, 2 close_bound, 3 close_unbound,
    # 4:13 R flat, 13:16 t, 16:25 ref-KF R flat, 25:28 ref-KF t
    # (the reference keyframe's pose FROM THE MAP SNAPSHOT this frame was
    # tracked against rides the packet so relative-trajectory bookkeeping
    # never needs a separate device fetch — on KF frames that fetch would
    # block ~160 ms on the mapping stage's local BA)


def build_frame_data(cam: Intrinsics, image, aux, boxes, box_active,
                     orb_cfg: ORBConfig, height: int, width: int,
                     scale_factor, sensor: str,
                     n_slots: int = 0, depth_scale=None,
                     depth_stride: int = 1) -> FrameData:
    """Device-side frame construction (all sensors).

    `image`/`aux` may arrive in camera-native dtypes (uint8 gray, uint16
    depth) — casting happens here ON DEVICE so the host->device transfer
    carries 1/4 (gray) and 1/2 (depth) of the float32 bytes. `depth_scale`
    converts raw depth units to metres (TUM: 1/5000); None/1.0 = already
    metres."""
    image = image.astype(jnp.float32)
    if sensor == "rgbd":
        aux = aux.astype(jnp.float32)
        if depth_scale is not None:
            aux = aux * depth_scale
    elif sensor == "stereo":
        aux = aux.astype(jnp.float32)
    kp = _extract_impl(image, orb_cfg, height, width)
    xy = undistort_points(cam, kp.xy)
    scale = scale_factor ** kp.level.astype(jnp.float32)
    if sensor == "rgbd":
        if depth_stride > 1:
            # strided depth upload: sample at the keypoint's low-res
            # pixel, but keep u_right in FULL-res pixel units
            hs, ws = aux.shape
            xi = jnp.clip(jnp.round(kp.xy[:, 0] / depth_stride)
                          .astype(jnp.int32), 0, ws - 1)
            yi = jnp.clip(jnp.round(kp.xy[:, 1] / depth_stride)
                          .astype(jnp.int32), 0, hs - 1)
            d = aux[yi, xi]
            ok = kp.valid & (d > 0)
            ur = jnp.where(ok, kp.xy[:, 0]
                           - cam.bf / jnp.where(d <= 0, 1.0, d), -1.0)
            depth = jnp.where(ok, d, -1.0)
        else:
            sm = depth_from_rgbd(aux, kp.xy, kp.valid, cam.bf)
            ur, depth = sm.u_right, sm.depth
    elif sensor == "stereo":
        kp_r = _extract_impl(aux, orb_cfg, height, width)
        scale_r = scale_factor ** kp_r.level.astype(jnp.float32)
        sm = match_stereo(image, aux, kp, kp_r, cam.bf, 0.1, scale, scale_r)
        ur, depth = sm.u_right, sm.depth
    else:
        ur = jnp.full(kp.xy.shape[0], -1.0)
        depth = jnp.full(kp.xy.shape[0], -1.0)
    inside = ((xy[:, None, 0] >= boxes[None, :, 0])
              & (xy[:, None, 0] <= boxes[None, :, 2])
              & (xy[:, None, 1] >= boxes[None, :, 1])
              & (xy[:, None, 1] <= boxes[None, :, 3])
              & box_active[None, :]).any(axis=1)
    static = kp.valid & ~inside
    fd = FrameData(xy=xy, xy_raw=kp.xy, level=kp.level, angle=kp.angle,
                    response=kp.response, desc=kp.desc, valid=kp.valid,
                    ur=ur, depth=depth, static_mask=static, scale=scale)
    if n_slots:
        fd = pad_frame_data(fd, n_slots)
    return fd


def _predict_inside(R_last, t_last, R_prev2, t_prev2, has_vel):
    """Constant-velocity prediction computed ON DEVICE (saves per-frame
    host->device transfers of the predicted pose): velocity =
    T_last o T_prev2^-1; pred = velocity o T_last. has_vel in {0.,1.}."""
    Rv = R_last @ R_prev2.T
    tv = t_last - Rv @ t_prev2
    R_pred = Rv @ R_last
    t_pred = Rv @ t_last + tv
    R_pred = has_vel * R_pred + (1.0 - has_vel) * R_last
    t_pred = has_vel * t_pred + (1.0 - has_vel) * t_last
    return R_pred, t_pred


def _mm_track(cam, bounds, R_pred, t_pred, R_last, t_last, lm_pos, lm_desc,
              lm_dmax, lm_mask, fd, mm_radius, scale_factor, min_inliers,
              stereo, n_levels):
    """Motion-model stage with narrow+wide fallback. Matching runs as the
    fused pallas gated-match kernel (one pass per radius variant, no
    [M, N] intermediates) or, with fused match disabled, as ONE shared
    Hamming matmul + per-variant pair masks. Keeps the octave gates of
    SearchByProjection (predicted-level radius + level-window pair mask)
    — dropping them floods the pose optimizer with cross-level outliers.
    Light LM schedule (2x6); the local-map stage polishes with the full
    4x10."""
    from ..utils.camera import project
    from ..optim.pose_opt import optimize_pose
    from ..ops import pallas_match as pmatch

    use_fused = pmatch.fused_match_enabled()
    kp_ok = fd.valid & fd.static_mask
    if not use_fused:
        dist_raw = hm.hamming_matrix(lm_desc, fd.desc)    # ONE matmul
        base_mask = lm_mask[:, None] & kp_ok[None, :]

    def match_and_opt(Rp, tp, radius_mult):
        xc = lm_pos @ Rp.T + tp
        uv = project(cam, xc)
        vis = (xc[:, 2] > 0.1) & lm_mask
        # predicted octave from scale-invariance range (MapPoint::PredictScale)
        Ow = -Rp.T @ tp
        dist_w = jnp.sqrt(jnp.sum((lm_pos - Ow) ** 2, -1) + 1e-12)
        lvl = jnp.ceil(jnp.log(jnp.maximum(lm_dmax, 1e-6)
                               / jnp.maximum(dist_w, 1e-6))
                       / jnp.log(scale_factor)).astype(jnp.int32)
        lvl = jnp.clip(lvl, 0, n_levels - 1)
        radius = mm_radius * radius_mult * \
            scale_factor ** lvl.astype(jnp.float32)
        if use_fused:
            # fused pallas reduction keeps the SAME octave gates
            # (radius by predicted level + level window) — see
            # ops/pallas_match.py
            kp_lm, best, second = pmatch.gated_match_pallas(
                fd.desc, fd.xy, fd.level, kp_ok,
                lm_desc, uv, radius, lvl, vis,
                interpret=pmatch.match_interpret())
            ok = pmatch.accept_match(best, second, 100, 0.9)
        else:
            pm = hm.radius_pair_mask(uv, fd.xy, radius)
            pm &= hm.level_pair_mask(lvl, fd.level, -1, 1)
            dist = jnp.where(base_mask & pm & vis[:, None], dist_raw,
                             hm.INVALID)
            kp_lm, best, ok = hm.match_nn(dist.T, max_dist=100, ratio=0.9)
        xw = lm_pos[jnp.clip(kp_lm, 0, lm_pos.shape[0] - 1)]
        inv_s2 = 1.0 / (fd.scale ** 2)
        if stereo:
            obs = jnp.concatenate([fd.xy, fd.ur[:, None]], axis=-1)
            ur_w = (fd.ur > 0).astype(jnp.float32)
            res = optimize_pose(cam, Rp, tp, xw, obs, inv_s2, ok,
                                stereo=True, ur_weight=ur_w, rounds=2,
                                iters=6)
        else:
            res = optimize_pose(cam, Rp, tp, xw, fd.xy, inv_s2, ok,
                                stereo=False, rounds=2, iters=6)
        inlier = res.inliers & ok
        return res.R, res.t, inlier.sum().astype(jnp.int32), \
            jnp.where(inlier, kp_lm, -1)

    R1, t1, n1, kp1 = match_and_opt(R_pred, t_pred, 1.0)
    R2, t2, n2, kp2 = match_and_opt(R_last, t_last, 2.0)
    wide = n1 < min_inliers
    return (jnp.where(wide, R2, R1), jnp.where(wide, t2, t1),
            jnp.where(wide, n2, n1), jnp.where(wide, kp2, kp1))


def _track_stages(m: MapState, cam, bounds, fd: FrameData, last_obs_lm,
                  R_pred, t_pred, R_last, t_last, ref_kf, mm_radius,
                  local_radius, depth_th, scale_factor, min_inliers_track,
                  stereo, max_kf, max_lm, n_levels) -> FusedOut:
    N = fd.xy.shape[0]
    L = m.lm_pos.shape[0]
    idc = jnp.clip(jnp.where(last_obs_lm >= 0, last_obs_lm, 0), 0, L - 1)
    ok_lm = (last_obs_lm >= 0) & m.lm_valid[idc]
    lm_pos = m.lm_pos[idc]
    lm_desc = m.lm_desc[idc]

    R1, t1, n_mm, kp_lm1 = _mm_track(
        cam, bounds, R_pred, t_pred, R_last, t_last, lm_pos, lm_desc,
        m.lm_dist_max[idc], ok_lm, fd, mm_radius, scale_factor,
        min_inliers_track, stereo, n_levels)
    kp_lm_global = jnp.where(
        kp_lm1 >= 0, last_obs_lm[jnp.clip(kp_lm1, 0, N - 1)], -1)

    local = tops.select_local_map(m.kf_obs_lm, m.kf_valid, kp_lm_global,
                                  L, max_kf=max_kf, max_lm=max_lm)
    idl = jnp.clip(jnp.where(local.lm_mask, local.lm_ids, 0), 0, L - 1)
    okl = local.lm_mask & m.lm_valid[idl]
    out2 = tops.track_against_landmarks(
        cam, bounds, R1, t1, m.lm_pos[idl], m.lm_desc[idl],
        m.lm_normal[idl], m.lm_dist_min[idl], m.lm_dist_max[idl], okl, fd,
        local_radius, scale_factor, stereo=stereo, n_levels=n_levels,
        use_view_gate=True)
    obs_global = jnp.where(
        out2.kp_lm >= 0,
        local.lm_ids[jnp.clip(out2.kp_lm, 0, local.lm_ids.shape[0] - 1)],
        -1)

    vis, fnd = tops.bump_landmark_stats(
        m.lm_visible, m.lm_found, local.lm_ids, local.lm_mask,
        out2.visible, out2.found)

    close = (fd.depth > 0) & (fd.depth < depth_th)
    close_bound = jnp.sum(close & (obs_global >= 0)).astype(jnp.float32)
    close_unbound = jnp.sum(
        close & fd.static_mask & (obs_global < 0)).astype(jnp.float32)

    rk = jnp.clip(ref_kf, 0, m.kf_R.shape[0] - 1)
    packed = jnp.concatenate([
        jnp.stack([n_mm.astype(jnp.float32),
                   out2.n_inliers.astype(jnp.float32),
                   close_bound, close_unbound]),
        out2.R.reshape(-1), out2.t,
        m.kf_R[rk].reshape(-1), m.kf_t[rk]])
    return FusedOut(fd, obs_global, out2.R, out2.t, vis, fnd, packed)


@functools.partial(
    jax.jit,
    static_argnames=("orb_cfg", "height", "width", "sensor",
                     "max_kf", "max_lm", "n_levels", "n_slots",
                     "depth_stride"))
def fused_track_step(
        m: MapState, cam: Intrinsics, bounds, image, aux,
        boxes, box_active,
        last_obs_lm, R_last, t_last, R_prev2, t_prev2, has_vel, ref_kf,
        orb_cfg: ORBConfig, height: int, width: int,
        mm_radius, local_radius, depth_th, scale_factor,
        min_inliers_track,
        sensor: str = "rgbd", max_kf: int = 16, max_lm: int = 4096,
        n_levels: int = 8, n_slots: int = 0,
        depth_scale=None, depth_stride: int = 1) -> FusedOut:
    """aux = depth map (rgbd), right image (stereo), or ignored (mono).
    Motion-model prediction happens inside (R_prev2/t_prev2 = pose two
    frames back; has_vel 0/1 scalar). ref_kf = the host's reference
    keyframe index (its pose returns in the packet tail)."""
    fd = build_frame_data(cam, image, aux, boxes, box_active, orb_cfg,
                          height, width, scale_factor, sensor,
                          n_slots=n_slots, depth_scale=depth_scale,
                          depth_stride=depth_stride)
    stereo = sensor in ("rgbd", "stereo")
    R_pred, t_pred = _predict_inside(R_last, t_last, R_prev2, t_prev2,
                                     has_vel)
    return _track_stages(m, cam, bounds, fd, last_obs_lm, R_pred, t_pred,
                         R_last, t_last, ref_kf, mm_radius, local_radius,
                         depth_th, scale_factor, min_inliers_track, stereo,
                         max_kf, max_lm, n_levels)


@functools.partial(
    jax.jit,
    static_argnames=("orb_cfg", "height", "width", "sensor",
                     "max_kf", "max_lm", "n_levels", "n_slots",
                     "depth_stride"))
def fused_track_step_batch(
        m: MapState, cam: Intrinsics, bounds, image, aux,
        boxes, box_active,
        last_obs_lm, R_last, t_last, R_prev2, t_prev2, has_vel, ref_kf,
        orb_cfg: ORBConfig, height: int, width: int,
        mm_radius, local_radius, depth_th, scale_factor,
        min_inliers_track,
        sensor: str = "rgbd", max_kf: int = 16, max_lm: int = 4096,
        n_levels: int = 8, n_slots: int = 0,
        depth_scale=None, depth_stride: int = 1) -> FusedOut:
    """DP-batched fused step: B independent sequences tracked in ONE
    device call (SURVEY §5.7's frame-axis parallelism). All array inputs
    and the MapState pytree carry a leading [B] axis; scalar tuning
    constants are shared. Shard the batch axis over a mesh "dp" axis
    (device_put with NamedSharding) and XLA partitions every stage —
    per-sequence work is independent, so no collectives are inserted.

    The reference processes one camera per process (pthreads inside); this
    is the TPU-native multi-camera/multi-sequence serving mode: frontends
    batch on one chip or shard across chips, ONE packed [B, 28] readback
    drives all B host state machines."""
    def one(m1, image1, aux1, bx1, ba1, last1, Rl, tl, Rp2, tp2, hv, rkf):
        fd = build_frame_data(cam, image1, aux1, bx1, ba1, orb_cfg,
                              height, width, scale_factor, sensor,
                              n_slots=n_slots, depth_scale=depth_scale,
                              depth_stride=depth_stride)
        stereo = sensor in ("rgbd", "stereo")
        R_pred, t_pred = _predict_inside(Rl, tl, Rp2, tp2, hv)
        return _track_stages(m1, cam, bounds, fd, last1, R_pred, t_pred,
                             Rl, tl, rkf, mm_radius, local_radius, depth_th,
                             scale_factor, min_inliers_track, stereo,
                             max_kf, max_lm, n_levels)
    return jax.vmap(one)(m, image, aux, boxes, box_active, last_obs_lm,
                         R_last, t_last, R_prev2, t_prev2, has_vel, ref_kf)


@functools.partial(
    jax.jit,
    static_argnames=("orb_cfg", "height", "width", "sensor",
                     "max_kf", "max_lm", "n_levels", "n_slots",
                     "depth_stride", "chunk"))
def fused_track_chunk(
        m: MapState, cam: Intrinsics, bounds, images, auxs,
        boxes, box_active,
        last_obs_lm, R_last, t_last, R_prev2, t_prev2, has_vel, ref_kf,
        orb_cfg: ORBConfig, height: int, width: int,
        mm_radius, local_radius, depth_th, scale_factor,
        min_inliers_track,
        sensor: str = "rgbd", max_kf: int = 16, max_lm: int = 4096,
        n_levels: int = 8, n_slots: int = 0,
        depth_scale=None, depth_stride: int = 1, chunk: int = 2):
    """Temporal chunking: C CONSECUTIVE frames tracked in ONE device call.

    Through a latency-bound transport (the axon tunnel: ~30 ms per
    readback regardless of payload) the per-frame cost of the one-call
    pipeline is dominated by the round trip, not compute. Chunking C
    frames amortizes ONE upload + ONE packed [C, 28] readback across C
    frames — the single-sequence analog of MultiSystem's lane batching.

    Frames chain ON DEVICE exactly as they do across calls: frame j+1
    uses frame j's optimized pose as its motion-model base, frame j's
    matched landmark ids as its last-frame observations, and the
    landmark visible/found counters carry through the chunk. The map
    snapshot (keyframes/landmarks) is fixed for the whole chunk, so
    keyframe decisions lag up to C-1 frames — the same one-sided lag the
    reference's async LocalMapping thread has (SURVEY §2.4), just wider.

    images: [C, H, W]; auxs: [C, ...] (depth / right / ignored);
    boxes: [C, B, 4]; box_active: [C, B]. Returns a list of C FusedOut
    (device handles; .packed of all C frames is also returned stacked as
    the second element for ONE readback).
    """
    return _chunk_body(
        m, cam, bounds, images, auxs, boxes, box_active, last_obs_lm,
        R_last, t_last, R_prev2, t_prev2, has_vel, ref_kf, orb_cfg,
        height, width, mm_radius, local_radius, depth_th, scale_factor,
        min_inliers_track, sensor, max_kf, max_lm, n_levels, n_slots,
        depth_scale, depth_stride, chunk, dyn=None)


@functools.partial(
    jax.jit,
    static_argnames=("orb_cfg", "height", "width", "sensor",
                     "max_kf", "max_lm", "n_levels", "n_slots",
                     "depth_stride", "chunk"))
def fused_track_chunk_batch(
        m: MapState, cam: Intrinsics, bounds, images, auxs,
        boxes, box_active,
        last_obs_lm, R_last, t_last, R_prev2, t_prev2, has_vel, ref_kf,
        orb_cfg: ORBConfig, height: int, width: int,
        mm_radius, local_radius, depth_th, scale_factor,
        min_inliers_track,
        sensor: str = "rgbd", max_kf: int = 16, max_lm: int = 4096,
        n_levels: int = 8, n_slots: int = 0,
        depth_scale=None, depth_stride: int = 1, chunk: int = 2):
    """B lanes x C consecutive frames in ONE device call: the composition
    of MultiSystem's lane batching (fused_track_step_batch) with temporal
    chunking (fused_track_chunk) — one upload + one packed [B, C, 28]
    readback drives B*C tracked frames. Through a latency-bound transport
    the round-trip cost divides by B*C. images: [B, C, H, W]; the
    MapState pytree and all recurrent state carry a leading [B] axis
    (shard it over a mesh "dp" axis for multi-chip serving)."""
    def one(m1, im, ax, bx1, ba1, last1, Rl, tl, Rp2, tp2, hv, rkf):
        return _chunk_body(
            m1, cam, bounds, im, ax, bx1, ba1, last1, Rl, tl, Rp2, tp2,
            hv, rkf, orb_cfg, height, width, mm_radius, local_radius,
            depth_th, scale_factor, min_inliers_track, sensor, max_kf,
            max_lm, n_levels, n_slots, depth_scale, depth_stride, chunk,
            dyn=None)
    return jax.vmap(one)(m, images, auxs, boxes, box_active, last_obs_lm,
                         R_last, t_last, R_prev2, t_prev2, has_vel, ref_kf)


def _chunk_body(m, cam, bounds, images, auxs, boxes, box_active,
                last_obs_lm, R_last, t_last, R_prev2, t_prev2, has_vel,
                ref_kf, orb_cfg, height, width, mm_radius, local_radius,
                depth_th, scale_factor, min_inliers_track, sensor, max_kf,
                max_lm, n_levels, n_slots, depth_scale, depth_stride,
                chunk, dyn):
    """Shared chunk loop. `dyn` (traced values) switches on the fused
    dynamic-scene classification per frame: {box_status [B], ref_fd,
    have_ref, seed, n_hyp (static)} — see fused_track_step_dyn. Each
    frame classifies against the CHUNK-START reference frame (the host's
    ref queue lags one chunk, like the reference's async-thread design)
    and its verdicts ride the packet tail ([C, 28+B])."""
    stereo = sensor in ("rgbd", "stereo")
    outs = []
    obs, Rl, tl, Rp2, tp2, hv = (last_obs_lm, R_last, t_last,
                                 R_prev2, t_prev2, has_vel)
    mm = m
    for j in range(chunk):
        if dyn is None:
            quarantine = box_active[j]
        else:
            # status-1 (reclassified static) boxes stop quarantining but
            # classification keeps seeing ALL boxes (a box can go 1 -> 2)
            quarantine = box_active[j] & (dyn["box_status"] != 1)
        fd = build_frame_data(cam, images[j], auxs[j], boxes[j],
                              quarantine, orb_cfg, height, width,
                              scale_factor, sensor, n_slots=n_slots,
                              depth_scale=depth_scale,
                              depth_stride=depth_stride)
        verdict = None
        if dyn is not None:
            if j % dyn.get("classify_every", 1) == 0:
                from .dynamics_ops import classify_boxes
                # per-frame RANSAC variation derives from the chained pose
                # (changes every frame), like fused_track_step_dyn
                seed = dyn["seed"] + jnp.int32(j) \
                    + (jnp.abs(tl) * 8388608.0).sum().astype(jnp.int32) \
                    + (jnp.abs(Rl) * 65536.0).sum().astype(jnp.int32)
                v = classify_boxes(cam, dyn["ref_fd"], fd, boxes[j],
                                   box_active[j], n_hyp=dyn["n_hyp"],
                                   seed=seed)
                verdict = jnp.where(dyn["have_ref"] > 0, v.verdict,
                                    jnp.zeros_like(v.verdict))
            else:
                # skipped frame: verdict 0 (unknown) — the host streak
                # logic ignores it; reinstatement still follows the
                # host's box status below
                verdict = jnp.zeros_like(dyn["box_status"])
            status = dyn["box_status"]
            static_now = box_active[j] & (status != 2) & \
                ((status == 1) | (verdict == 1))
            inside = ((fd.xy[None, :, 0] >= boxes[j][:, None, 0])
                      & (fd.xy[None, :, 0] <= boxes[j][:, None, 2])
                      & (fd.xy[None, :, 1] >= boxes[j][:, None, 1])
                      & (fd.xy[None, :, 1] <= boxes[j][:, None, 3])
                      & static_now[:, None])
            fd = fd._replace(static_mask=fd.static_mask |
                             (inside.any(0) & fd.valid))
        R_pred, t_pred = _predict_inside(Rl, tl, Rp2, tp2, hv)
        out = _track_stages(mm, cam, bounds, fd, obs, R_pred, t_pred,
                            Rl, tl, ref_kf, mm_radius, local_radius,
                            depth_th, scale_factor, min_inliers_track,
                            stereo, max_kf, max_lm, n_levels)
        if verdict is not None:
            from .dynamics_ops import box_3d_state
            b3d = box_3d_state(cam, fd, boxes[j], box_active[j])
            out = out._replace(packed=jnp.concatenate(
                [out.packed, verdict.astype(jnp.float32),
                 b3d.reshape(-1)]))
        outs.append(out)
        # chain: landmark stat counters + last-frame state ride on device
        mm = mm._replace(lm_visible=out.lm_visible, lm_found=out.lm_found)
        obs, Rp2, tp2, Rl, tl = out.obs_lm, Rl, tl, out.R, out.t
        hv = jnp.float32(1.0)
    packed = jnp.stack([o.packed for o in outs])
    return outs, packed


@functools.partial(
    jax.jit,
    static_argnames=("orb_cfg", "height", "width", "sensor",
                     "max_kf", "max_lm", "n_levels", "n_slots", "n_hyp",
                     "depth_stride", "chunk", "classify_every"))
def fused_track_chunk_dyn(
        m: MapState, cam: Intrinsics, bounds, images, auxs,
        boxes, box_active, box_status, ref_fd: FrameData, have_ref,
        last_obs_lm, R_last, t_last, R_prev2, t_prev2, has_vel, ref_kf,
        orb_cfg: ORBConfig, height: int, width: int,
        mm_radius, local_radius, depth_th, scale_factor,
        min_inliers_track, seed,
        sensor: str = "rgbd", max_kf: int = 16, max_lm: int = 4096,
        n_levels: int = 8, n_slots: int = 0, n_hyp: int = 256,
        depth_scale=None, depth_stride: int = 1, chunk: int = 2,
        classify_every: int = 1):
    """Dynamic-scene temporal chunking: C consecutive frames, each with
    fused H/F box classification + feature reinstatement, in ONE device
    call + ONE packed [C, 28+B] readback — fused_track_chunk composed
    with fused_track_step_dyn (the framework's namesake workload,
    ref /root/reference/src/Tracking.cc:968-1367, amortized over the
    transport like the static chunk). box_status is the host's
    START-OF-CHUNK belief; fresh verdicts return per frame in the packet
    tail and the host's streak bookkeeping lags one chunk (the same
    one-sided lag the reference's async thread has, widened to C).
    classify_every=N classifies every Nth chunk frame (skipped frames
    emit verdict 0; the reference's 2-consecutive-frames confirmation
    survives at half rate, Tracking.cc:1213-1226)."""
    dyn = dict(box_status=box_status, ref_fd=ref_fd, have_ref=have_ref,
               seed=seed, n_hyp=n_hyp, classify_every=classify_every)
    return _chunk_body(
        m, cam, bounds, images, auxs, boxes, box_active, last_obs_lm,
        R_last, t_last, R_prev2, t_prev2, has_vel, ref_kf, orb_cfg,
        height, width, mm_radius, local_radius, depth_th, scale_factor,
        min_inliers_track, sensor, max_kf, max_lm, n_levels, n_slots,
        depth_scale, depth_stride, chunk, dyn=dyn)


@functools.partial(
    jax.jit, static_argnames=("stereo", "max_kf", "max_lm", "n_levels"))
def fused_track_prebuilt(
        m: MapState, cam: Intrinsics, bounds, fd: FrameData,
        last_obs_lm, R_pred, t_pred, R_last, t_last, ref_kf,
        mm_radius, local_radius, depth_th, scale_factor, min_inliers_track,
        stereo: bool = True, max_kf: int = 16, max_lm: int = 4096,
        n_levels: int = 8) -> FusedOut:
    """Variant taking an already-built FrameData (dynamics path)."""
    return _track_stages(m, cam, bounds, fd, last_obs_lm, R_pred, t_pred,
                         R_last, t_last, ref_kf, mm_radius, local_radius,
                         depth_th, scale_factor, min_inliers_track, stereo,
                         max_kf, max_lm, n_levels)


@functools.partial(
    jax.jit,
    static_argnames=("orb_cfg", "height", "width", "sensor",
                     "max_kf", "max_lm", "n_levels", "n_slots", "n_hyp",
                     "depth_stride", "classify"))
def fused_track_step_dyn(
        m: MapState, cam: Intrinsics, bounds, image, aux,
        boxes, box_active, box_status, ref_fd: FrameData, have_ref,
        last_obs_lm, R_last, t_last, R_prev2, t_prev2, has_vel, ref_kf,
        orb_cfg: ORBConfig, height: int, width: int,
        mm_radius, local_radius, depth_th, scale_factor,
        min_inliers_track, seed,
        sensor: str = "rgbd", max_kf: int = 16, max_lm: int = 4096,
        n_levels: int = 8, n_slots: int = 0, n_hyp: int = 256,
        depth_scale=None, depth_stride: int = 1, classify: bool = True):
    """Dynamic-scene variant: frame build + H/F box classification +
    feature reinstatement + tracking, still ONE device call.

    box_status [B] int32 (0 tentative / 1 static / 2 dynamic) is the HOST's
    current belief (streak bookkeeping stays on host); fresh verdicts are
    returned in the packet tail for the host to update streaks.
    Returns (FusedOut, verdicts [B]).

    classify=False (the per-frame classify_every stride's skip frames):
    the H/F RANSAC section — the bulk of this executable, and through a
    per-dispatch-cost transport the dominant per-frame price — is
    omitted; verdicts come back 0 (the host streak logic ignores them)
    while the per-box 3D state (depth + OBB) still updates EVERY frame,
    keeping the reference's per-frame parity (Tracking.cc:809-881). The
    packet layout is identical to the classifying variant.
    """
    from .dynamics_ops import classify_boxes
    fd = build_frame_data(cam, image, aux, boxes,
                          box_active & (box_status != 1), orb_cfg,
                          height, width, scale_factor, sensor,
                          n_slots=n_slots, depth_scale=depth_scale,
                          depth_stride=depth_stride)
    if classify:
        # `seed` is a FIXED device constant (uploading a fresh per-frame
        # seed costs an h2d tunnel trip); per-frame RANSAC sampling
        # variation is derived on device from the pose, which changes
        # every frame
        seed = seed + (jnp.abs(t_last) * 8388608.0).sum().astype(jnp.int32) \
            + (jnp.abs(R_last) * 65536.0).sum().astype(jnp.int32)
        # geometric reclassification vs the reference frame (if available)
        v = classify_boxes(cam, ref_fd, fd, boxes, box_active, n_hyp=n_hyp,
                           seed=seed)
        verdict = jnp.where(have_ref > 0, v.verdict,
                            jnp.zeros_like(v.verdict))
    else:
        verdict = jnp.zeros_like(box_status)
    # reinstate features inside boxes that are (or just became) static,
    # unless already confirmed dynamic by the host streak logic
    static_now = box_active & (box_status != 2) & \
        ((box_status == 1) | (verdict == 1))
    inside = ((fd.xy[None, :, 0] >= boxes[:, None, 0])
              & (fd.xy[None, :, 0] <= boxes[:, None, 2])
              & (fd.xy[None, :, 1] >= boxes[:, None, 1])
              & (fd.xy[None, :, 1] <= boxes[:, None, 3])
              & static_now[:, None])
    fd = fd._replace(static_mask=fd.static_mask |
                     (inside.any(0) & fd.valid))

    stereo = sensor in ("rgbd", "stereo")
    R_pred, t_pred = _predict_inside(R_last, t_last, R_prev2, t_prev2,
                                     has_vel)
    out = _track_stages(m, cam, bounds, fd, last_obs_lm, R_pred, t_pred,
                        R_last, t_last, ref_kf, mm_radius, local_radius,
                        depth_th, scale_factor, min_inliers_track, stereo,
                        max_kf, max_lm, n_levels)
    # per-frame per-box 3D state rides the packet (ref Tracking.cc:809-881
    # recomputes depth+OBB every frame, not only at keyframes)
    from .dynamics_ops import box_3d_state
    b3d = box_3d_state(cam, fd, boxes, box_active)
    packed = jnp.concatenate([out.packed, verdict.astype(jnp.float32),
                              b3d.reshape(-1)])
    return out._replace(packed=packed)
