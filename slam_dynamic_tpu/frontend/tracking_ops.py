"""Device-side tracking kernels: projection-guided matching fused with pose
optimization, local-map selection, and landmark-stat updates.

These are the jit units of the per-frame hot path. Each one replaces a
scalar-loop family of the reference:
  - `track_against_landmarks` = ORBmatcher::SearchByProjection (frame vs
    last frame :1485, frame vs local map :45) + Optimizer::PoseOptimization
    (:239) fused into ONE device call per tracking stage;
  - `select_local_map` = Tracking::UpdateLocalKeyFrames/UpdateLocalPoints
    (:2102-2199) as vote-scatter + top-k;
  - matching uses the dense masked Hamming matrix (MXU) with frustum, scale
    and view-angle gates identical in intent to Frame::isInFrustum (:677).
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops import hamming as hm
from ..optim.pose_opt import optimize_pose
from ..utils.camera import Intrinsics, project
from .frame import FrameData


class TrackOut(NamedTuple):
    R: jnp.ndarray
    t: jnp.ndarray
    n_inliers: jnp.ndarray      # int32
    kp_lm: jnp.ndarray          # [N] int32 index into the landmark set (-1)
    visible: jnp.ndarray        # [M] bool landmark was in frustum
    found: jnp.ndarray          # [M] bool landmark was matched+inlier


@functools.partial(jax.jit,
                   static_argnames=("stereo", "n_levels", "use_view_gate"))
def track_against_landmarks(
        cam: Intrinsics, bounds, R_pred, t_pred,
        lm_pos, lm_desc, lm_normal, lm_dmin, lm_dmax, lm_mask,
        frame: FrameData, base_radius, scale_factor,
        max_hamming: int = 100, ratio: float = 0.9,
        stereo: bool = False, n_levels: int = 8,
        use_view_gate: bool = True):
    """Match a landmark set [M] into the frame and optimize the pose.

    Gates (as Frame::isInFrustum + SearchByProjection):
      frustum, distance in [0.8 dmin, 1.2 dmax], view angle cos > 0.5,
      pixel radius = base_radius * predicted-level scale (2.5/4.0 factor by
      view angle), octave window around predicted level.
    """
    minx, maxx, miny, maxy = bounds
    # camera center
    Ow = -jnp.einsum("ji,j->i", R_pred, t_pred)
    xc = jnp.einsum("ij,...j->...i", R_pred, lm_pos) + t_pred
    z = xc[..., 2]
    uv = project(cam, xc)
    in_img = ((z > 0.1) & (uv[..., 0] >= minx) & (uv[..., 0] < maxx)
              & (uv[..., 1] >= miny) & (uv[..., 1] < maxy))
    po = lm_pos - Ow
    dist = jnp.linalg.norm(po, axis=-1)
    dist_ok = (dist >= 0.8 * lm_dmin) & (dist <= 1.2 * lm_dmax)
    viewcos = jnp.sum(po * lm_normal, axis=-1) / jnp.maximum(dist, 1e-9)
    view_ok = viewcos > 0.5 if use_view_gate else jnp.ones_like(viewcos, bool)
    visible = in_img & dist_ok & view_ok & lm_mask

    # predicted octave (MapPoint::PredictScale)
    ratio_d = jnp.maximum(lm_dmax, 1e-6) / jnp.maximum(dist, 1e-6)
    lvl = jnp.ceil(jnp.log(jnp.maximum(ratio_d, 1e-6)) /
                   jnp.log(scale_factor)).astype(jnp.int32)
    lvl = jnp.clip(lvl, 0, n_levels - 1)
    rad_factor = jnp.where(viewcos > 0.998, 2.5, 4.0) if use_view_gate \
        else jnp.full(dist.shape, 1.0)
    radius = base_radius * rad_factor * scale_factor ** lvl.astype(jnp.float32)

    # match from the FRAME side: each keypoint picks its best landmark
    from ..ops import pallas_match as pmatch
    kp_ok = frame.valid & frame.static_mask
    if pmatch.fused_match_enabled():
        # ONE pallas kernel: distance + gates + top-2, nothing [M, N]-
        # shaped touches HBM (14x device-time win at [4096, 2048] on
        # TPU v5e — tools/kernel_bench.py --match)
        kp_lm, best, second = pmatch.gated_match_pallas(
            frame.desc, frame.xy, frame.level, kp_ok,
            lm_desc, uv, radius, lvl, visible,
            interpret=pmatch.match_interpret())
        ok = pmatch.accept_match(best, second, max_hamming, ratio)
    else:
        # dense masked-matrix path: pair gates [M, N] + top-2
        pm = hm.radius_pair_mask(uv, frame.xy, radius)
        lvl_ok = hm.level_pair_mask(lvl, frame.level, -1, 1)
        pair = pm & lvl_ok & visible[:, None]
        dist_mat = hm.masked_hamming_matrix(
            lm_desc, lm_mask, frame.desc, kp_ok, pair_mask=pair)
        kp_lm, best, ok = hm.match_nn(dist_mat.T, max_dist=max_hamming,
                                      ratio=ratio)

    # pose optimization over matched slots
    xw = lm_pos[jnp.clip(kp_lm, 0, lm_pos.shape[0] - 1)]
    inv_s2 = 1.0 / (frame.scale ** 2)
    if stereo:
        obs = jnp.concatenate([frame.xy, frame.ur[:, None]], axis=-1)
        # keypoints without stereo depth become mono observations (row mask)
        ur_w = (frame.ur > 0).astype(jnp.float32)
        res = optimize_pose(cam, R_pred, t_pred, xw, obs, inv_s2, ok,
                            stereo=True, ur_weight=ur_w)
    else:
        res = optimize_pose(cam, R_pred, t_pred, xw, frame.xy, inv_s2, ok,
                            stereo=False)
    inlier = res.inliers & ok
    kp_lm = jnp.where(inlier, kp_lm, -1)
    M = lm_pos.shape[0]
    found = jnp.zeros(M + 1, bool).at[
        jnp.where(inlier, kp_lm, M)].set(True)[:M]
    return TrackOut(res.R, res.t, inlier.sum().astype(jnp.int32), kp_lm,
                    visible, found)


class LocalMapOut(NamedTuple):
    lm_ids: jnp.ndarray     # [MAXL] int32 global landmark ids (L = pad)
    lm_mask: jnp.ndarray    # [MAXL] bool
    kf_ids: jnp.ndarray     # [MAXK] int32 local keyframe ids
    kf_mask: jnp.ndarray    # [MAXK] bool


@functools.partial(jax.jit,
                   static_argnames=("n_lm_total", "max_kf", "max_lm"))
def select_local_map(kf_obs_lm, kf_valid, frame_lm_ids, n_lm_total,
                     max_kf: int = 16, max_lm: int = 4096) -> LocalMapOut:
    """Local covisibility window from the currently tracked landmarks.

    Equivalent of Tracking::UpdateLocalKeyFrames (:2102, vote per KF by
    shared landmark count, keep top voters) + UpdateLocalPoints (:2066,
    union of their landmarks).
    """
    K, N = kf_obs_lm.shape
    L = n_lm_total
    in_frame = jnp.zeros(L + 1, bool).at[
        jnp.where(frame_lm_ids >= 0, frame_lm_ids, L)].set(True)
    in_frame = in_frame.at[L].set(False)
    obs = jnp.where(kf_obs_lm >= 0, kf_obs_lm, L)
    votes = jnp.sum(in_frame[obs], axis=1).astype(jnp.int32) * kf_valid
    vals, kf_ids = jax.lax.top_k(votes, max_kf)
    kf_mask = vals > 0

    # union of landmarks observed by local KFs
    sel_obs = obs[kf_ids]                                # [max_kf, N]
    sel_obs = jnp.where(kf_mask[:, None], sel_obs, L)
    marked = jnp.zeros(L + 1, bool).at[sel_obs.reshape(-1)].set(True)
    marked = marked.at[L].set(False)
    lm_ids = jnp.nonzero(marked, size=max_lm, fill_value=L)[0]
    lm_mask = lm_ids < L
    lm_ids = jnp.where(lm_mask, lm_ids, 0).astype(jnp.int32)
    return LocalMapOut(lm_ids, lm_mask, kf_ids.astype(jnp.int32), kf_mask)


@jax.jit
def bump_landmark_stats(lm_visible, lm_found, ids, ids_mask, visible, found):
    """Scatter-add visibility/found counters for a landmark id set."""
    L = lm_visible.shape[0]
    tgt = jnp.where(ids_mask, ids, L)
    vis_add = jnp.zeros(L + 1, jnp.int32).at[tgt].add(visible.astype(jnp.int32))
    fnd_add = jnp.zeros(L + 1, jnp.int32).at[tgt].add(found.astype(jnp.int32))
    return lm_visible + vis_add[:L], lm_found + fnd_add[:L]
