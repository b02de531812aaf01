"""Stereo depth association: row-banded descriptor matching + SAD subpixel
refinement, and RGB-D depth lookup.

TPU-native equivalent of Frame::ComputeStereoMatches (/root/reference/src/
Frame.cc:874-1050) and Frame::ComputeStereoFromRGBD (:1051-1072). The
reference's per-row candidate vectors become a dense masked Hamming matrix
(row-band + disparity-range + scale gates as pair masks); the per-candidate
scalar SAD slide becomes a batched gather of [N, W, W+2R] patches and a
vectorized 2R+1-offset SAD with parabolic subpixel interpolation.

Deviation from the reference (documented): SAD refinement runs on the
level-0 images for all keypoints instead of each keypoint's octave image —
higher resolution, one gather shape, no per-level branching.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from . import hamming as hm

SAD_W = 5       # half window -> 11x11 (ref :964 w=5)
SAD_R = 5       # +-5 px slide (ref :969 L=5)


class StereoMatches(NamedTuple):
    u_right: jnp.ndarray   # [N] float32, -1 where unmatched
    depth: jnp.ndarray     # [N] float32, -1 where unmatched
    valid: jnp.ndarray     # [N] bool


def _gather_patches(img, cx, cy, half_h: int, half_w: int):
    """[N] centers -> [N, 2*half_h+1, 2*half_w+1] patches (clamped)."""
    h, w = img.shape
    dy = jnp.arange(-half_h, half_h + 1)
    dx = jnp.arange(-half_w, half_w + 1)
    yy = jnp.clip(cy[:, None, None] + dy[None, :, None], 0, h - 1)
    xx = jnp.clip(cx[:, None, None] + dx[None, None, :], 0, w - 1)
    return img[yy, xx]


@functools.partial(jax.jit, static_argnames=("max_disp_px",))
def match_stereo(left_img, right_img, kp_left, kp_right, bf, min_z,
                 scale_factors_l, scale_factors_r, max_disp_px: int = 128):
    """Associate left keypoints with right-image columns.

    left_img/right_img: [H, W] float32 level-0 images.
    kp_left/kp_right: Keypoints structs (frontend.extractor).
    scale_factors_l/r: [N] per-keypoint scale factor (1.2^level).
    Returns StereoMatches over left keypoint slots.
    """
    xyL, xyR = kp_left.xy, kp_right.xy
    # Row band: |vL - vR| <= 2 * scale of the coarser keypoint (ref :904)
    band = 2.0 * jnp.maximum(scale_factors_l[:, None], scale_factors_r[None, :])
    row_ok = jnp.abs(xyL[:, 1:2] - xyR[None, :, 1]) <= band
    # Disparity in (0.3, max_disp) px  (ref :915 minD=0, maxD=bf/minZ)
    disp = xyL[:, 0:1] - xyR[None, :, 0]
    max_d = jnp.minimum(jnp.asarray(max_disp_px, jnp.float32), bf / min_z)
    disp_ok = (disp > 0.3) & (disp < max_d)
    # Same-ish octave (ref :927: level within [l-1, l+1])
    lvl_ok = hm.level_pair_mask(kp_left.level, kp_right.level, -1, 1)

    dist = hm.masked_hamming_matrix(
        kp_left.desc, kp_left.valid, kp_right.desc, kp_right.valid,
        pair_mask=row_ok & disp_ok & lvl_ok)
    idx_r, best, ok = hm.match_nn(dist, max_dist=100)  # TH_HIGH (ref :895)

    # --- SAD subpixel refinement on level-0 images ---
    uL = xyL[:, 0]
    vL = xyL[:, 1]
    uR0 = xyR[idx_r, 0]
    cxL = jnp.round(uL).astype(jnp.int32)
    cyL = jnp.round(vL).astype(jnp.int32)
    cxR = jnp.round(uR0).astype(jnp.int32)

    patchL = _gather_patches(left_img, cxL, cyL, SAD_W, SAD_W)  # [N,11,11]
    stripR = _gather_patches(right_img, cxR, cyL, SAD_W, SAD_W + SAD_R)
    # normalize by center intensity difference (ref subtracts center :973-977)
    patchL = patchL - patchL[:, SAD_W:SAD_W + 1, SAD_W:SAD_W + 1]
    offs = jnp.arange(2 * SAD_R + 1)
    # windows at offset o cover strip columns [o, o+11)
    winR = jax.vmap(
        lambda o: jax.lax.dynamic_slice_in_dim(stripR, o, 2 * SAD_W + 1, 2),
        out_axes=1)(offs)                                # [N, 11off, 11, 11]
    winR = winR - winR[:, :, SAD_W:SAD_W + 1, SAD_W:SAD_W + 1]
    sad = jnp.abs(patchL[:, None] - winR).sum((-1, -2))  # [N, 11]
    best_o = jnp.argmin(sad, axis=1)
    s_m1 = sad[jnp.arange(sad.shape[0]), jnp.maximum(best_o - 1, 0)]
    s_0 = sad[jnp.arange(sad.shape[0]), best_o]
    s_p1 = sad[jnp.arange(sad.shape[0]), jnp.minimum(best_o + 1, 2 * SAD_R)]
    denom = s_m1 + s_p1 - 2.0 * s_0
    delta = jnp.where(jnp.abs(denom) > 1e-6,
                      0.5 * (s_m1 - s_p1) / jnp.where(denom == 0, 1., denom),
                      0.0)
    delta = jnp.clip(delta, -1.0, 1.0)   # ref :1000 rejects |delta|>1
    u_right = cxR.astype(jnp.float32) + (best_o - SAD_R).astype(jnp.float32) \
        + delta
    disparity = uL - u_right
    ok = ok & (disparity > 0.3) & (disparity < max_d)
    depth = jnp.where(ok, bf / jnp.where(disparity <= 0.3, 1.0, disparity),
                      -1.0)
    u_right = jnp.where(ok, u_right, -1.0)
    return StereoMatches(u_right, depth, ok)


@jax.jit
def depth_from_rgbd(depth_map, kp_xy, kp_valid, bf, depth_factor=1.0):
    """RGB-D association (ref Frame.cc:1051-1072): sample the depth map at
    the (distorted) keypoint pixel; synthesize virtual right coordinate.

    depth_map: [H, W] float32 raw depths (already scaled to metres if
    depth_factor==1, else divided here).
    """
    h, w = depth_map.shape
    xi = jnp.clip(jnp.round(kp_xy[:, 0]).astype(jnp.int32), 0, w - 1)
    yi = jnp.clip(jnp.round(kp_xy[:, 1]).astype(jnp.int32), 0, h - 1)
    d = depth_map[yi, xi] / depth_factor
    ok = kp_valid & (d > 0)
    u_right = jnp.where(ok, kp_xy[:, 0] - bf / jnp.where(d <= 0, 1.0, d), -1.0)
    return StereoMatches(u_right, jnp.where(ok, d, -1.0), ok)
