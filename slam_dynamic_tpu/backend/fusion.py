"""Landmark fusion and keyframe culling.

Equivalents of LocalMapping::SearchInNeighbors + ORBmatcher::Fuse
(/root/reference/src/LocalMapping.cc:455-535, ORBmatcher.cc:982-1133) and
LocalMapping::KeyFrameCulling (:633-697, the >=90% redundancy rule).

Fusion here is the duplicate-merge step: local-map landmarks are projected
into the new keyframe; a matched keypoint that already references a
DIFFERENT landmark triggers a merge (the landmark with fewer observations
is replaced by the other — MapPoint::Replace), applied map-wide with one
replacement-table gather. Unbound matched keypoints gain an observation.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..ops import hamming as hm
from ..utils.camera import Intrinsics, project
from ..worldmap.state import MapState, update_covisibility


@functools.partial(jax.jit, static_argnames=("max_lm",))
def fuse_into_keyframe(m: MapState, cam: Intrinsics, k, lm_ids, lm_mask,
                       scale_factor, radius_px: float = 3.0,
                       max_hamming: int = 50, max_lm: int = 4096) -> MapState:
    """Fuse a landmark set (usually the local map) into keyframe k."""
    L = m.lm_pos.shape[0]
    ids = jnp.where(lm_mask, lm_ids, 0)
    pos = m.lm_pos[ids]
    desc = m.lm_desc[ids]
    ok = lm_mask & m.lm_valid[ids]

    # project into k
    R = m.kf_R[k]
    t = m.kf_t[k]
    xc = pos @ R.T + t
    uv = project(cam, xc)
    ok = ok & (xc[:, 2] > 0.1)

    # search radius follows the KEYPOINT's octave (ref Fuse :1040)
    radius = radius_px * scale_factor ** m.kf_kp_level[k].astype(jnp.float32)
    kp_xy = m.kf_kp_xy[k]
    na = jnp.sum(uv * uv, -1)
    nb = jnp.sum(kp_xy * kp_xy, -1)
    d2 = na[:, None] + nb[None, :] - 2.0 * (uv @ kp_xy.T)
    pair = d2 <= (radius[None, :] ** 2)
    dist = hm.masked_hamming_matrix(desc, ok, m.kf_kp_desc[k],
                                    m.kf_kp_valid[k], pair_mask=pair)
    # match from the landmark side: each landmark picks its best keypoint
    lm_kp, dbest, mok = hm.match_nn(dist, max_dist=max_hamming)

    cur_obs = m.kf_obs_lm[k]
    tgt_kp = jnp.where(mok, lm_kp, 0)
    existing = cur_obs[tgt_kp]                    # [max_lm]
    new_id = ids

    # case 1: keypoint unbound -> bind this landmark. Masked writes dump to
    # an out-of-range extra slot (sliced off) — dumping to slot 0 while
    # writing the old value races with a genuine bind targeting keypoint 0
    # (duplicate-index scatter order is unspecified in XLA).
    bind = mok & (existing < 0)
    Nk = cur_obs.shape[0]
    obs_ext = jnp.concatenate([cur_obs, jnp.full((1,), -1, cur_obs.dtype)])
    obs_k = obs_ext.at[jnp.where(bind, lm_kp, Nk)].set(
        new_id.astype(jnp.int32))[:Nk]

    # case 2: keypoint bound to a DIFFERENT landmark -> merge: loser is the
    # one with fewer observations; build replacement table rep[loser]=winner
    conflict = mok & (existing >= 0) & (existing != new_id)
    n_a = m.lm_n_obs[jnp.clip(existing, 0, L - 1)]
    n_b = m.lm_n_obs[jnp.clip(new_id, 0, L - 1)]
    winner = jnp.where(n_a >= n_b, existing, new_id)
    loser = jnp.where(n_a >= n_b, new_id, existing)
    rep_ext = jnp.concatenate([jnp.arange(L, dtype=jnp.int32),
                               jnp.zeros((1,), jnp.int32)])
    rep = rep_ext.at[jnp.where(conflict, loser, L)].set(
        winner.astype(jnp.int32))[:L]
    # one-step table application across ALL keyframe observations
    all_obs = m.kf_obs_lm
    all_obs = jnp.where(all_obs >= 0, rep[jnp.clip(all_obs, 0, L - 1)],
                        all_obs)
    all_obs = all_obs.at[k].set(
        jnp.where(obs_k >= 0, rep[jnp.clip(obs_k, 0, L - 1)], obs_k))
    lm_valid = m.lm_valid & (rep == jnp.arange(L))

    # recompute n_obs
    flat = jnp.where((all_obs >= 0) & m.kf_kp_valid, all_obs, L).reshape(-1)
    n_obs = jnp.zeros(L + 1, jnp.int32).at[flat].add(1)[:L]
    m = m._replace(kf_obs_lm=all_obs, lm_valid=lm_valid, lm_n_obs=n_obs)
    return update_covisibility(m, k)


@jax.jit
def cull_keyframes(m: MapState, center_kf, redundancy: float = 0.9,
                   min_obs_for_redundant: int = 4) -> MapState:
    """KeyFrameCulling (ref :633-697): discard covisible keyframes whose
    observations are >=90% redundant (landmark seen by >=3 other KFs).
    KF 0 and the current KF are immune."""
    K, N = m.kf_obs_lm.shape
    L = m.lm_pos.shape[0]
    obs = m.kf_obs_lm
    has = (obs >= 0) & m.kf_kp_valid
    nobs = m.lm_n_obs[jnp.clip(obs, 0, L - 1)]
    redundant = has & (nobs >= min_obs_for_redundant)
    total = has.sum(axis=1)
    red = redundant.sum(axis=1)
    ratio = red / jnp.maximum(total, 1)
    cand = (m.kf_valid & (m.covis[center_kf] > 0)
            & (jnp.arange(K) != center_kf) & (jnp.arange(K) != 0))
    kill = cand & (ratio > redundancy) & (total > 50)
    return _kill_keyframes(m, kill)


def _kill_keyframes(m: MapState, kill) -> MapState:
    """Flip kf_valid off for `kill` [K] and clear their bookkeeping:
    observations, landmark n_obs, covisibility rows/cols."""
    L = m.lm_pos.shape[0]
    kf_valid = m.kf_valid & ~kill
    all_obs = jnp.where(kill[:, None], -1, m.kf_obs_lm)
    flat = jnp.where((all_obs >= 0) & m.kf_kp_valid, all_obs, L).reshape(-1)
    n_obs = jnp.zeros(L + 1, jnp.int32).at[flat].add(1)[:L]
    covis = jnp.where(kill[:, None] | kill[None, :], 0, m.covis)
    return m._replace(kf_valid=kf_valid, kf_obs_lm=all_obs, lm_n_obs=n_obs,
                      covis=covis)


@jax.jit
def evict_if_full(m: MapState, center_kf) -> MapState:
    """Forced eviction when the keyframe store is FULL with nothing
    redundancy-culled: drop the keyframe LEAST COVISIBLE with the current
    one (ties -> oldest frame id), so the bounded-memory map slides with
    the camera instead of freezing — without this, a sequence longer than
    the capacity stops inserting, the local map ages out from under the
    tracker, and tracking is permanently LOST (measured on the 2000-frame
    endurance run). The reference never faces this (unbounded heap,
    KeyFrameCulling only); this is the fixed-capacity analog of a
    sliding-window keyframe budget. Landmarks orphaned by the eviction
    (no remaining observers) free their slots. Slot 0 (the gauge anchor)
    and the current keyframe are immune."""
    K = m.kf_valid.shape[0]
    full = jnp.all(m.kf_valid | (jnp.arange(K) >= m.n_kf)) \
        & (m.n_kf >= K)
    protect = (jnp.arange(K) == 0) | (jnp.arange(K) == center_kf) \
        | ~m.kf_valid
    # value = covisibility with the current KF, then recency — a
    # lexicographic two-key argmin in INTEGER space (a float32 combined
    # score loses the frame-id tie-break to ulp rounding)
    imax = jnp.int32(2 ** 31 - 1)
    c = jnp.where(protect, imax, m.covis[center_kf])
    cmin = jnp.min(c)
    f = jnp.where(protect | (c != cmin), imax, m.kf_frame_id)
    victim = jnp.argmin(f)
    kill = jnp.zeros(K, bool).at[victim].set(full)
    m = _kill_keyframes(m, kill)
    # reclaim orphaned landmarks (MapPoint::SetBadFlag analog when the
    # last observer dies)
    lm_valid = m.lm_valid & jnp.where(full, m.lm_n_obs > 0, True)
    # stale loop edges touching the victim die with it
    stale = full & ((m.loop_i == victim) | (m.loop_j == victim))
    return m._replace(lm_valid=lm_valid,
                      loop_valid=m.loop_valid & ~stale)
