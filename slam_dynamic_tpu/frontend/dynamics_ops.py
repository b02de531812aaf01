"""Device kernels of the dynamic-object reclassifier.

One jit call implements the whole chain of the reference's
Tracking::TrackHomo -> Separate -> classifyH/classifyF
(/root/reference/src/Tracking.cc:968-1367):
  1. match static background features between the reference frame and the
     current frame (dense Hamming + mutual NN + rotation consistency —
     replaces the projective SearchByProjection pair collector,
     ORBmatcher.cc:407-560);
  2. fit H and F by batched RANSAC (ops/ransac.py), pick the model with
     more inliers (ref :1065-1077);
  3. per tracked box, match the *quarantined* in-box features between the
     frames (the per-box BFMatcher, ref :1096-1122) and chi2-test them
     under the background model (classifyH chi2<5.991 / classifyF
     chi2<5.841, ref :1267,:1326);
  4. verdict per box: static / dynamic / unknown by pass-fraction.
`reinstate_features` then flips static_mask bits (Frame::UpdateFrame).
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops import hamming as hm
from ..ops import ransac
from ..utils.camera import Intrinsics
from .frame import FrameData


class BoxVerdict(NamedTuple):
    verdict: jnp.ndarray      # [B] int32: 0 unknown, 1 static, 2 dynamic
    n_pass: jnp.ndarray       # [B] int32
    n_fail: jnp.ndarray       # [B] int32
    used_homography: jnp.ndarray  # bool
    n_bg_inliers: jnp.ndarray     # int32


def _match_from(dist_rc, mask_a, mask_b, ang_a, ang_b, max_dist, ratio):
    """NN matching (a -> b) from a PRE-COMPUTED raw [A, B] Hamming matrix
    — the background-pair and in-box matchers share ONE MXU matmul and
    differ only in their masks."""
    dist = jnp.where(mask_a[:, None] & mask_b[None, :], dist_rc, hm.INVALID)
    idx, d, ok = hm.match_nn(dist, max_dist=max_dist, ratio=ratio,
                             mutual=True)
    ok = hm.rotation_consistency(ang_a, ang_b, idx, ok)
    return idx, ok


@functools.partial(jax.jit, static_argnames=("n_hyp", "min_pairs"))
def classify_boxes(cam: Intrinsics, ref: FrameData, cur: FrameData,
                   boxes, box_valid, n_hyp: int = 256,
                   thresh_px: float = 3.0, chi2_h: float = 5.991,
                   chi2_f: float = 5.841, min_pairs: int = 20,
                   seed: int = 0) -> BoxVerdict:
    key = jax.random.PRNGKey(seed)

    # ONE ref<->cur Hamming matrix serves both the background-pair matcher
    # and the in-box matcher (they only differ in masks)
    dist_rc = hm.hamming_matrix(ref.desc, cur.desc)          # [N, N]

    # 1. background pairs (static features of both frames)
    idx, ok = _match_from(dist_rc, ref.valid & ref.static_mask,
                          cur.valid & cur.static_mask,
                          ref.angle, cur.angle, max_dist=64, ratio=0.8)
    p1 = ref.xy
    p2 = cur.xy[jnp.clip(idx, 0, cur.xy.shape[0] - 1)]

    # 2. background model: H vs F by inlier count
    kh, kf = jax.random.split(key)
    fit_h = ransac.fit_homography(p1, p2, ok, kh, n_hyp=n_hyp,
                                  thresh_px=thresh_px)
    fit_f = ransac.fit_fundamental(p1, p2, ok, kf, n_hyp=n_hyp,
                                   thresh_px=thresh_px)
    use_h = fit_h.n_inliers >= fit_f.n_inliers
    enough_bg = jnp.maximum(fit_h.n_inliers, fit_f.n_inliers) >= min_pairs

    # 3. in-box matches: quarantined current features vs ref features that
    # fall inside the (25%-expanded) box — boxes move between frames.
    bx = boxes  # [B, 4]
    cx = (bx[:, 0] + bx[:, 2]) * 0.5
    cy = (bx[:, 1] + bx[:, 3]) * 0.5
    hw = (bx[:, 2] - bx[:, 0]) * 0.625   # half width * 1.25
    hh = (bx[:, 3] - bx[:, 1]) * 0.625
    in_box_cur = ((cur.xy[None, :, 0] >= bx[:, None, 0])
                  & (cur.xy[None, :, 0] <= bx[:, None, 2])
                  & (cur.xy[None, :, 1] >= bx[:, None, 1])
                  & (cur.xy[None, :, 1] <= bx[:, None, 3]))   # [B, N]
    near_box_ref = ((jnp.abs(ref.xy[None, :, 0] - cx[:, None]) <= hw[:, None])
                    & (jnp.abs(ref.xy[None, :, 1] - cy[:, None])
                       <= hh[:, None]))                        # [B, N]
    any_box_cur = (in_box_cur & box_valid[:, None]).any(0)
    any_box_ref = (near_box_ref & box_valid[:, None]).any(0)

    bidx, bok = _match_from(dist_rc.T, cur.valid & any_box_cur,
                            ref.valid & any_box_ref,
                            cur.angle, ref.angle, max_dist=64, ratio=0.9)
    q2 = cur.xy                                    # current position
    q1 = ref.xy[jnp.clip(bidx, 0, ref.xy.shape[0] - 1)]  # ref position

    # 4. chi2 tests under the background model (sigma=1 px as reference)
    eh_f, eh_b = ransac.h_transfer_errors(fit_h.M, q1, q2)
    pass_h = (eh_f < chi2_h) & (eh_b < chi2_h)
    ef_1, ef_2 = ransac.f_epipolar_errors(fit_f.M, q1, q2)
    pass_f = (ef_1 < chi2_f) & (ef_2 < chi2_f)
    passes = jnp.where(use_h, pass_h, pass_f) & bok

    per_box = in_box_cur & bok[None, :] & box_valid[:, None]
    n_pass = jnp.sum(per_box & passes[None, :], axis=1).astype(jnp.int32)
    n_tot = jnp.sum(per_box, axis=1).astype(jnp.int32)
    n_fail = n_tot - n_pass

    enough = (n_tot >= 8) & enough_bg
    frac = n_pass.astype(jnp.float32) / jnp.maximum(n_tot, 1)
    verdict = jnp.where(~enough, 0,
                        jnp.where(frac >= 0.5, 1, 2)).astype(jnp.int32)
    verdict = jnp.where(box_valid, verdict, 0)
    return BoxVerdict(verdict, n_pass, n_fail, use_h,
                      jnp.maximum(fit_h.n_inliers, fit_f.n_inliers))


@jax.jit
def box_3d_state(cam: Intrinsics, fd: FrameData, boxes, box_active):
    """Per-frame per-box 3D state from in-box depth keypoints — the
    reference computes this EVERY frame for confirmed-dynamic boxes and
    hands it to the viewer (/root/reference/src/Tracking.cc:809-881:
    closest-to-center depth + PCL MomentOfInertiaEstimation OBB).

    Runs inside the fused dyn step; the gating (image-edge 20%, 20 m max,
    5 m jump rejection, weight-3 temporal smoothing, status==2 filter)
    is HOST logic on the returned packet block (box ids live on host).

    Returns [B, 16] float32: [d_center, obb_center xyz, obb_axes flat
    (rows = principal dirs), obb_extents xyz] in CAMERA frame; d_center
    = -1 when the box has no depth keypoints.
    """
    from ..ops.pointcloud import obb_from_points
    from ..utils.camera import backproject
    inside = ((fd.xy[None, :, 0] >= boxes[:, None, 0])
              & (fd.xy[None, :, 0] <= boxes[:, None, 2])
              & (fd.xy[None, :, 1] >= boxes[:, None, 1])
              & (fd.xy[None, :, 1] <= boxes[:, None, 3])
              & box_active[:, None])
    mask = inside & (fd.valid & (fd.depth > 0))[None, :]       # [B, N]
    cx = (boxes[:, 0] + boxes[:, 2]) * 0.5
    cy = (boxes[:, 1] + boxes[:, 3]) * 0.5
    # depth of the keypoint closest to the box center (the reference's
    # min_dist loop — implementing the intended 2D distance; the original
    # has a typo using pt.x in both terms)
    d2 = ((fd.xy[None, :, 0] - cx[:, None]) ** 2
          + (fd.xy[None, :, 1] - cy[:, None]) ** 2)
    d2 = jnp.where(mask, d2, jnp.inf)
    j = jnp.argmin(d2, axis=1)                                 # [B]
    B = boxes.shape[0]
    d = jnp.where(jnp.isfinite(d2[jnp.arange(B), j]), fd.depth[j], -1.0)
    xc = backproject(cam, fd.xy, fd.depth)                     # [N, 3]
    obb = jax.vmap(lambda mk: obb_from_points(xc, mk))(mask)
    return jnp.concatenate([
        d[:, None], obb.center, obb.axes.reshape(B, 9), obb.extents],
        axis=1)


def reinstate_features(fd: FrameData, boxes, static_boxes) -> FrameData:
    """Flip quarantined features inside reclassified-static boxes back to
    static (Frame::UpdateFrame, ref Frame.cc:607-641 — there array surgery,
    here a mask OR)."""
    inside = ((fd.xy[None, :, 0] >= boxes[:, None, 0])
              & (fd.xy[None, :, 0] <= boxes[:, None, 2])
              & (fd.xy[None, :, 1] >= boxes[:, None, 1])
              & (fd.xy[None, :, 1] <= boxes[:, None, 3])
              & static_boxes[:, None])
    back = inside.any(0) & fd.valid
    return fd._replace(static_mask=fd.static_mask | back)
