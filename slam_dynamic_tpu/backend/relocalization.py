"""Relocalization: BoW candidates -> PnP RANSAC -> LM pose polish.

Equivalent of Tracking::Relocalization (/root/reference/src/
Tracking.cc:2212-2373): KeyFrameDatabase::DetectRelocalizationCandidates
supplies candidate keyframes; each candidate is matched by descriptors
(SearchByBoW, >=15 matches), solved by PnP RANSAC (PnPsolver), polished by
PoseOptimization, accepted at >=50 inliers.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import hamming as hm
from ..ops.pnp import ransac_pnp
from ..utils.camera import project
from ..optim.pose_opt import optimize_pose
from ..worldmap.state import MapState
from ..worldmap import kfdb as kfdb_mod
from ..models import vocabulary as voc_mod


@jax.jit
def _widen_matches(m: MapState, cam, k, R, t, fd, cur_lm, radius_px):
    """Projection-search the candidate KF's landmarks at a widened window
    (ref Tracking.cc:2320-2366: SearchByProjection retry rounds when the
    polished pose has <50 inliers). Projects KF k's landmarks through the
    current pose estimate, matches descriptors inside radius_px * keypoint
    scale into UNMATCHED frame slots, and returns the merged per-slot
    landmark assignment."""
    L = m.lm_pos.shape[0]
    N = cur_lm.shape[0]
    ids = m.kf_obs_lm[k]
    idc = jnp.clip(ids, 0, L - 1)
    ok = m.kf_kp_valid[k] & (ids >= 0) & m.lm_valid[idc]
    # skip landmarks already found (ref sFound)
    used = jnp.zeros(L + 1, bool).at[jnp.where(cur_lm >= 0, cur_lm, L)] \
        .set(True)[:L]
    ok = ok & ~used[idc]
    xc = m.lm_pos[idc] @ R.T + t
    uv = project(cam, xc)
    ok = ok & (xc[:, 2] > 0.1)
    radius = radius_px * fd.scale
    d2 = (jnp.sum(uv * uv, -1)[:, None]
          + jnp.sum(fd.xy * fd.xy, -1)[None, :] - 2.0 * (uv @ fd.xy.T))
    pair = d2 <= radius[None, :] ** 2
    free = fd.valid & fd.static_mask & (cur_lm < 0)
    dist = hm.masked_hamming_matrix(m.lm_desc[idc], ok, fd.desc, free,
                                    pair_mask=pair)
    lm_kp, _, mok = hm.match_nn(dist, max_dist=50)
    ext = jnp.concatenate([cur_lm, jnp.full((1,), -1, cur_lm.dtype)])
    merged = ext.at[jnp.where(mok, lm_kp, N)].set(
        jnp.where(mok, ids, -1).astype(jnp.int32))[:N]
    return merged


@jax.jit
def _match_frame_kf(frame_desc, frame_valid, kf_desc, kf_valid, kf_obs,
                    frame_node=None, kf_node=None):
    """Descriptor match frame->KF restricted to keypoints WITH landmarks.
    Returns per-frame-slot landmark id (-1 unmatched).

    With frame_node/kf_node given (direct-index node ids from
    vocabulary.transform at cfg.vocabulary.direct_index_level), pairs are
    additionally restricted to a SHARED node — the reference's
    FeatureVector walk in SearchByBoW (/root/reference/src/
    ORBmatcher.cc:159-280). On TPU this is a pair MASK on the one dense
    Hamming matmul, not a candidate-set pruning: it costs nothing and
    buys nothing in time, only changes recall/precision
    (cfg.vocabulary.use_direct_index; measured in
    tools/direct_index_bench.py — dense wins, see RESULTS.md)."""
    has_lm = kf_valid & (kf_obs >= 0)
    pair = None
    if frame_node is not None:
        pair = (frame_node[:, None] == kf_node[None, :]) \
            & (frame_node[:, None] >= 0)
    dist = hm.masked_hamming_matrix(frame_desc, frame_valid, kf_desc,
                                    has_lm, pair_mask=pair)
    idx, d, ok = hm.match_nn(dist, max_dist=50, ratio=0.75, mutual=True)
    lm = jnp.where(ok, kf_obs[jnp.clip(idx, 0, kf_obs.shape[0] - 1)], -1)
    return lm


def relocalize(m: MapState, db: kfdb_mod.KFDatabase, voc, cam, frame_data,
               seed: int = 0, max_candidates: int = 5,
               min_inliers: int = 50, use_direct_index: bool = False,
               di_level: int = 2
               ) -> Tuple[bool, Optional[jnp.ndarray],
                          Optional[jnp.ndarray], Optional[jnp.ndarray], int]:
    """Try to relocalize a lost frame.

    Returns (ok, R, t, obs_lm[N], cand_slot) — cand_slot is the keyframe
    slot the successful candidate matched (-1 on failure); the caller can
    treat it as a verified loop observation (LoopCloser.on_relocalization)."""
    bv = voc_mod.transform(voc, frame_data.desc, frame_data.valid,
                           di_level=di_level)
    hist = voc_mod.sparse_bow(bv, top_w=db.word.shape[1])
    # exclude CULLED keyframes (kf_valid off): their DB rows stay stored
    # but their frozen poses stopped receiving BA updates at cull time
    # (ref KeyFrameDatabase::erase from KeyFrame::SetBadFlag)
    cand = kfdb_mod.query(db, hist, m.covis, ~m.kf_valid)
    scores = np.asarray(cand.score)
    order = np.argsort(-scores)[:max_candidates]
    for rank, k in enumerate(order):
        if scores[k] <= 0:
            break
        fn = kn = None
        if use_direct_index:
            kf_bv = voc_mod.transform(voc, m.kf_kp_desc[k],
                                      m.kf_kp_valid[k], di_level=di_level)
            fn, kn = bv.node, kf_bv.node
        lm = _match_frame_kf(frame_data.desc,
                             frame_data.valid & frame_data.static_mask,
                             m.kf_kp_desc[k], m.kf_kp_valid[k],
                             m.kf_obs_lm[k], fn, kn)
        n_match = int((lm >= 0).sum())
        if n_match < 15:              # ref :2265
            continue
        L = m.lm_pos.shape[0]
        xw = m.lm_pos[jnp.clip(lm, 0, L - 1)]
        ok_lm = (lm >= 0) & m.lm_valid[jnp.clip(lm, 0, L - 1)]
        fit = ransac_pnp(cam, xw, frame_data.xy, ok_lm,
                         jax.random.PRNGKey(seed + rank))
        if int(fit.n_inliers) < 10:   # ref :2310
            continue
        inv_s2 = 1.0 / (frame_data.scale ** 2)
        res = optimize_pose(cam, fit.R, fit.t, xw, frame_data.xy, inv_s2,
                            ok_lm & fit.inliers, stereo=False)
        n_good = int(res.n_inliers)
        # widening rounds (ref Tracking.cc:2320-2366): on <min_inliers,
        # projection-search the candidate KF's landmarks at window 10 then 3
        # around the polished pose and re-optimize before rejecting.
        for radius in (10.0, 3.0):
            if n_good >= min_inliers or n_good < 10:
                break
            obs0 = jnp.where(res.inliers & ok_lm, lm, -1).astype(jnp.int32)
            lm = _widen_matches(m, cam, jnp.int32(k), res.R, res.t,
                                frame_data, obs0, jnp.float32(radius))
            ok_lm = (lm >= 0) & m.lm_valid[jnp.clip(lm, 0, L - 1)]
            xw = m.lm_pos[jnp.clip(lm, 0, L - 1)]
            res = optimize_pose(cam, res.R, res.t, xw, frame_data.xy,
                                inv_s2, ok_lm, stereo=False)
            n_good = int(res.n_inliers)
        if n_good >= min_inliers:
            obs = jnp.where(res.inliers & ok_lm, lm, -1)
            return True, res.R, res.t, obs, int(k)
    return False, None, None, None, -1
