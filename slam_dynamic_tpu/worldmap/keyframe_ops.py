"""Keyframe insertion with depth-based landmark creation.

Equivalent of Tracking::CreateNewKeyFrame (/root/reference/src/
Tracking.cc:1924-2008) and StereoInitialization (:1370-1422): keypoints with
stereo/RGB-D depth that are not yet bound to a landmark spawn new landmarks
(closest-first, at least `min_create`, all closer than the depth threshold
— ref :1951-1991), with MapPoint-style normal and scale-invariance range
(MapPoint::UpdateNormalAndDepth).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..utils.camera import Intrinsics, backproject
from ..frontend.frame import FrameData
from .state import MapState, insert_keyframe, add_landmarks, next_kf_slot


@functools.partial(jax.jit, static_argnames=("n_levels",))
def make_keyframe(m: MapState, cam: Intrinsics, fd: FrameData, R, t,
                  frame_id, timestamp, obs_lm, depth_th, scale_factor,
                  min_create=100, n_levels: int = 8):
    """Insert keyframe and create landmarks for unbound keypoints with depth.

    obs_lm: [N] int32 global landmark id per keypoint (-1 = unbound).
    depth_th: metres — points closer than this always spawn landmarks; the
    `min_create` nearest candidates spawn regardless (ref :1972-1979).
    Returns (map, slot) — slot is the written keyframe row (a culled row
    is recycled at capacity; -1 = full with nothing culled, no-op).
    """
    k, slot_ok = next_kf_slot(m)
    obs_write = jnp.where(fd.valid & fd.static_mask, obs_lm, -1)
    m = insert_keyframe(m, R, t, frame_id, timestamp, fd.xy, fd.level,
                        fd.angle, fd.desc, fd.valid & fd.static_mask, fd.ur,
                        fd.depth, obs_write)

    cand = fd.valid & fd.static_mask & (fd.depth > 0) & (obs_lm < 0)
    # rank by depth among candidates (closest first)
    key = jnp.where(cand, fd.depth, jnp.inf)
    order = jnp.argsort(key)
    rank = jnp.zeros_like(order).at[order].set(jnp.arange(order.shape[0]))
    want = cand & ((fd.depth < depth_th) | (rank < min_create))

    # world positions
    xc = backproject(cam, fd.xy, fd.depth)
    xw = jnp.einsum("ji,nj->ni", R, xc - t[None, :])
    Ow = -jnp.einsum("ji,j->i", R, t)
    po = xw - Ow
    dist = jnp.linalg.norm(po, axis=-1)
    normal = po / jnp.maximum(dist, 1e-9)[:, None]
    lvl_scale = scale_factor ** fd.level.astype(jnp.float32)
    dmax = dist * lvl_scale
    dmin = dmax / (scale_factor ** (n_levels - 1))

    slots = jnp.arange(fd.xy.shape[0], dtype=jnp.int32)
    m = add_landmarks(m, xw, fd.desc, normal, dmin, dmax,
                      jnp.full_like(slots, k), slots, want & slot_ok)
    return m, jnp.where(slot_ok, k, -1)


@jax.jit
def bind_observations(m: MapState, kf_idx, slot_obs_lm) -> MapState:
    """Overwrite kf_obs_lm row for an existing keyframe (after fusion or
    reclassification) and refresh covisibility + n_obs bookkeeping lazily
    (n_obs recomputed globally)."""
    obs = m.kf_obs_lm.at[kf_idx].set(slot_obs_lm)
    m = m._replace(kf_obs_lm=obs)
    L = m.lm_pos.shape[0]
    flat = jnp.where((obs >= 0) & m.kf_kp_valid, obs, L).reshape(-1)
    n_obs = jnp.zeros(L + 1, jnp.int32).at[flat].add(1)[:L]
    return m._replace(lm_n_obs=n_obs)


@jax.jit
def refresh_landmark_descriptors(m: MapState) -> MapState:
    """MapPoint::ComputeDistinctiveDescriptors equivalent: set each
    landmark's descriptor to the observation descriptor with minimum median
    Hamming distance to the others (ref /root/reference/src/MapPoint.cc).

    Fixed shape: up to MAX_OBS=8 observing keyframes per landmark are
    gathered via a bounded scan over the kf_obs_lm table.
    """
    from ..ops.hamming import hamming_pairs
    K, N = m.kf_obs_lm.shape
    L = m.lm_pos.shape[0]
    MAX_OBS = 8
    # obs_desc[l, j]: j-th observing keyframe's descriptor of landmark l.
    # Build by scatter: iterate keyframes (static K loop is too big — use a
    # scatter with per-landmark slot cursor approximation: hash kf into a
    # slot; collisions overwrite, which is acceptable for a median).
    slot = jnp.zeros((L, MAX_OBS, 8), jnp.uint32)
    have = jnp.zeros((L, MAX_OBS), bool)
    ks = jnp.arange(K) % MAX_OBS
    lm = jnp.where((m.kf_obs_lm >= 0) & m.kf_kp_valid
                   & m.kf_valid[:, None], m.kf_obs_lm, L)
    flat_lm = lm.reshape(-1)
    flat_slot = jnp.repeat(ks, N)
    flat_desc = m.kf_kp_desc.reshape(-1, 8)
    slot = jnp.concatenate([slot, jnp.zeros((1, MAX_OBS, 8), jnp.uint32)]
                           ).at[flat_lm, flat_slot].set(flat_desc)[:L]
    have = jnp.concatenate([have, jnp.zeros((1, MAX_OBS), bool)]
                           ).at[flat_lm, flat_slot].set(True)[:L]
    # pairwise Hamming among the up-to-8 observations
    d = jax.vmap(lambda a: hamming_pairs(a[:, None, :], a[None, :, :]))(slot)
    pair_ok = have[:, :, None] & have[:, None, :]
    # median over VALID pairs only: empty slots are NaN (nanmedian skips
    # them) — a large sentinel would dominate the median for landmarks
    # with fewer than half the slots filled, degenerating the argmin
    df = jnp.where(pair_ok, d.astype(jnp.float32), jnp.nan)
    med = jnp.nanmedian(df, axis=2)                 # [L, MAX_OBS]
    med = jnp.where(have & ~jnp.isnan(med), med, jnp.inf)
    bestj = jnp.argmin(med, axis=1)                 # [L]
    best_desc = slot[jnp.arange(L), bestj]
    any_obs = have.any(axis=1)
    new_desc = jnp.where((m.lm_valid & any_obs)[:, None], best_desc,
                         m.lm_desc)
    return m._replace(lm_desc=new_desc)
