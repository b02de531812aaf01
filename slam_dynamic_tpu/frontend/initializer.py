"""Monocular two-view bootstrap.

Equivalent of Initializer (/root/reference/src/Initializer.cc) +
Tracking::MonocularInitialization/CreateInitialMapMonocular
(/root/reference/src/Tracking.cc:1424-1616): match the reference and
current frames (SearchForInitialization: 100px window + ratio 0.9,
ORBmatcher.cc:562), fit H and F in parallel by batched RANSAC, pick the
model by score ratio (R_H > 0.40 -> H, ref Initializer.cc model selection),
recover motion with cheirality (ops/twoview.py), and hand back an initial
structure normalized to median depth 1 (ref :1570-1598).
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..config import SystemConfig
from ..ops import hamming as hm
from ..ops import ransac
from ..ops.twoview import reconstruct
from ..utils.camera import Intrinsics
from .frame import FrameData


class MonoInit(NamedTuple):
    ok: jnp.ndarray
    R2: jnp.ndarray          # second-frame pose (first at identity)
    t2: jnp.ndarray
    points: jnp.ndarray      # [N] world points per ref-frame slot
    good: jnp.ndarray        # [N] bool created landmarks
    idx2: jnp.ndarray        # [N] matched slot in current frame
    n_matches: jnp.ndarray


def try_initialize(cam: Intrinsics, ref: FrameData, cur: FrameData,
                   seed: int = 0, window_px: float = 100.0,
                   min_matches: int = 100) -> MonoInit:
    """One attempt at two-view initialization (ref frame slot-aligned)."""
    pm = hm.radius_pair_mask(ref.xy, cur.xy,
                             jnp.full(ref.xy.shape[0], window_px))
    # ref matches level-0 only (:570); we admit levels 0-1 so smaller
    # feature budgets still reach the match quorum
    lvl0 = (ref.level[:, None] <= 1) & (cur.level[None, :] <= 1)
    dist = hm.masked_hamming_matrix(ref.desc, ref.valid & ref.static_mask,
                                    cur.desc, cur.valid & cur.static_mask,
                                    pair_mask=pm & lvl0)
    idx2, d, ok = hm.match_nn(dist, max_dist=50, ratio=0.9, mutual=True)
    ok = hm.rotation_consistency(ref.angle, cur.angle, idx2, ok)
    n = ok.sum()

    uv1 = ref.xy
    uv2 = cur.xy[jnp.clip(idx2, 0, cur.xy.shape[0] - 1)]
    kh, kf = jax.random.split(jax.random.PRNGKey(seed))
    fit_h = ransac.fit_homography(uv1, uv2, ok, kh, thresh_px=2.4)
    fit_f = ransac.fit_fundamental(uv1, uv2, ok, kf, thresh_px=1.96)
    # model selection by inlier ratio (proxy for the reference's
    # symmetric-transfer score ratio R_H > 0.40)
    rh = fit_h.score / jnp.maximum(fit_h.score + fit_f.score, 1.0)
    use_h = rh > 0.45

    rec_h = reconstruct(cam, fit_h.M, uv1, uv2, fit_h.inliers,
                        use_homography=True)
    rec_f = reconstruct(cam, fit_f.M, uv1, uv2, fit_f.inliers,
                        use_homography=False)
    rec_ok = jnp.where(use_h, rec_h.ok, rec_f.ok)
    R2 = jnp.where(use_h, rec_h.R, rec_f.R)
    t2 = jnp.where(use_h, rec_h.t, rec_f.t)
    pts = jnp.where(use_h, rec_h.points, rec_f.points)
    good = jnp.where(use_h, rec_h.good, rec_f.good)

    # normalize scale: median depth of good points = 1 (ref :1570)
    depth = pts[:, 2]
    # nanmedian: padded/bad slots are NaN and must not poison the median
    # (jnp.median would return NaN whenever any slot is masked)
    med = jnp.nanmedian(jnp.where(good, depth, jnp.nan))
    med = jnp.nan_to_num(med, nan=1.0)
    scale = 1.0 / jnp.maximum(med, 1e-6)
    pts = pts * scale
    t2 = t2 * scale

    ok_total = rec_ok & (n >= min_matches)
    return MonoInit(ok_total, R2, t2, pts, good & ok_total, idx2, n)
