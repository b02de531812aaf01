"""The global map as a fixed-capacity struct-of-arrays pytree.

TPU-native redesign of the reference's pointer graph — Map/KeyFrame/MapPoint
(/root/reference/include/Map.h:38-89, KeyFrame.h, MapPoint.h:40-85) — and of
its covisibility machinery (KeyFrame::UpdateConnections). Keyframes and
landmarks live in padded arrays with validity masks; "deleting" clears a
mask bit; every algorithm is a masked batched kernel. There are no locks:
the tracking/mapping/loop stages exchange whole MapState pytrees
functionally (the mutex table of SURVEY §2.4 disappears by construction).

Capacities come from config.CapacityConfig. Index conventions:
  kf index k in [0, K); landmark index l in [0, L); keypoint slot n in [0, N).
  kf_obs_lm[k, n] = landmark id observed by keypoint n of keyframe k, or -1.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import CapacityConfig


class MapState(NamedTuple):
    # --- keyframes ---
    kf_R: jnp.ndarray          # [K, 3, 3] world->camera
    kf_t: jnp.ndarray          # [K, 3]
    kf_valid: jnp.ndarray      # [K] bool
    kf_frame_id: jnp.ndarray   # [K] int32 source frame id
    kf_timestamp: jnp.ndarray  # [K] float32
    # --- keyframe features (immutable snapshots) ---
    kf_kp_xy: jnp.ndarray      # [K, N, 2] float32 undistorted pixels
    kf_kp_level: jnp.ndarray   # [K, N] int32
    kf_kp_angle: jnp.ndarray   # [K, N] float32
    kf_kp_desc: jnp.ndarray    # [K, N, 8] uint32
    kf_kp_valid: jnp.ndarray   # [K, N] bool
    kf_kp_ur: jnp.ndarray      # [K, N] float32 (-1 if mono/no depth)
    kf_kp_depth: jnp.ndarray   # [K, N] float32 (-1 if none)
    kf_obs_lm: jnp.ndarray     # [K, N] int32 (-1 = no landmark)
    # --- covisibility (derived, kept incrementally) ---
    covis: jnp.ndarray         # [K, K] int32 shared-landmark counts
    # --- landmarks ---
    lm_pos: jnp.ndarray        # [L, 3]
    lm_valid: jnp.ndarray      # [L] bool
    lm_desc: jnp.ndarray       # [L, 8] uint32 distinctive descriptor
    lm_normal: jnp.ndarray     # [L, 3] mean viewing direction
    lm_dist_min: jnp.ndarray   # [L] scale-invariance range
    lm_dist_max: jnp.ndarray   # [L]
    lm_visible: jnp.ndarray    # [L] int32 times predicted visible
    lm_found: jnp.ndarray      # [L] int32 times actually matched
    lm_first_kf: jnp.ndarray   # [L] int32
    lm_n_obs: jnp.ndarray      # [L] int32 number of observing KFs
    # --- persistent loop edges (LoopClosing accumulates them so FUTURE
    # essential-graph runs keep past loop constraints — the reference keeps
    # them in KeyFrame::mspLoopEdges, consumed by OptimizeEssentialGraph,
    # /root/reference/src/Optimizer.cc:781-1045) ---
    loop_i: jnp.ndarray        # [E] int32 current-side kf
    loop_j: jnp.ndarray        # [E] int32 loop-side kf
    loop_s: jnp.ndarray        # [E] float32 measured relative scale
    loop_R: jnp.ndarray        # [E, 3, 3] measured S_ji rotation
    loop_t: jnp.ndarray        # [E, 3] measured S_ji translation
    loop_valid: jnp.ndarray    # [E] bool
    # --- allocation cursors (device scalars) ---
    n_kf: jnp.ndarray          # int32 next free kf slot
    n_lm: jnp.ndarray          # int32 next free landmark slot
    n_loop: jnp.ndarray        # int32 next free loop-edge slot


def empty_map(cap: CapacityConfig) -> MapState:
    K, N, L = cap.max_keyframes, cap.max_keypoints, cap.max_landmarks
    E = cap.max_loop_edges
    f32 = jnp.float32
    return MapState(
        kf_R=jnp.tile(jnp.eye(3, dtype=f32), (K, 1, 1)),
        kf_t=jnp.zeros((K, 3), f32),
        kf_valid=jnp.zeros(K, bool),
        kf_frame_id=jnp.full(K, -1, jnp.int32),
        kf_timestamp=jnp.zeros(K, f32),
        kf_kp_xy=jnp.zeros((K, N, 2), f32),
        kf_kp_level=jnp.zeros((K, N), jnp.int32),
        kf_kp_angle=jnp.zeros((K, N), f32),
        kf_kp_desc=jnp.zeros((K, N, 8), jnp.uint32),
        kf_kp_valid=jnp.zeros((K, N), bool),
        kf_kp_ur=jnp.full((K, N), -1.0, f32),
        kf_kp_depth=jnp.full((K, N), -1.0, f32),
        kf_obs_lm=jnp.full((K, N), -1, jnp.int32),
        covis=jnp.zeros((K, K), jnp.int32),
        lm_pos=jnp.zeros((L, 3), f32),
        lm_valid=jnp.zeros(L, bool),
        lm_desc=jnp.zeros((L, 8), jnp.uint32),
        lm_normal=jnp.zeros((L, 3), f32),
        lm_dist_min=jnp.zeros(L, f32),
        lm_dist_max=jnp.zeros(L, f32),
        lm_visible=jnp.ones(L, jnp.int32),
        lm_found=jnp.ones(L, jnp.int32),
        lm_first_kf=jnp.full(L, -1, jnp.int32),
        lm_n_obs=jnp.zeros(L, jnp.int32),
        loop_i=jnp.full(E, -1, jnp.int32),
        loop_j=jnp.full(E, -1, jnp.int32),
        loop_s=jnp.ones(E, f32),
        loop_R=jnp.tile(jnp.eye(3, dtype=f32), (E, 1, 1)),
        loop_t=jnp.zeros((E, 3), f32),
        loop_valid=jnp.zeros(E, bool),
        n_kf=jnp.int32(0),
        n_lm=jnp.int32(0),
        n_loop=jnp.int32(0),
    )


def add_loop_edge(m: MapState, i: int, j: int, s, R, t) -> MapState:
    """Record a verified loop constraint S_ji (host-side; loops are rare)."""
    E = m.loop_valid.shape[0]
    e = int(m.n_loop)
    if e >= E:
        return m
    return m._replace(
        loop_i=m.loop_i.at[e].set(jnp.int32(i)),
        loop_j=m.loop_j.at[e].set(jnp.int32(j)),
        loop_s=m.loop_s.at[e].set(jnp.float32(s)),
        loop_R=m.loop_R.at[e].set(jnp.asarray(R, jnp.float32)),
        loop_t=m.loop_t.at[e].set(jnp.asarray(t, jnp.float32)),
        loop_valid=m.loop_valid.at[e].set(True),
        n_loop=jnp.int32(e + 1))


@jax.jit
def update_covisibility(m: MapState, k: jnp.ndarray) -> MapState:
    """Recompute covisibility row/col for keyframe k from observations.

    Equivalent of KeyFrame::UpdateConnections (/root/reference/src/
    KeyFrame.cc): counts landmarks shared between k and every other KF.
    One gather + scatter instead of per-landmark map walks.
    """
    L = m.lm_pos.shape[0]
    lm_of_k = m.kf_obs_lm[k]                        # [N]
    in_k = jnp.zeros(L + 1, bool).at[jnp.where(lm_of_k >= 0, lm_of_k, L)].set(
        True)
    in_k = in_k.at[L].set(False)
    # for every kf: count of its obs that are in k's landmark set
    obs = jnp.where(m.kf_obs_lm >= 0, m.kf_obs_lm, L)   # [K, N]
    shared = jnp.sum(in_k[obs], axis=1).astype(jnp.int32)  # [K]
    shared = shared * m.kf_valid
    shared = shared.at[k].set(0)
    covis = m.covis.at[k, :].set(shared).at[:, k].set(shared)
    return m._replace(covis=covis)


@jax.jit
def next_kf_slot(m: MapState):
    """(slot, ok) the next insert_keyframe will use: the append cursor
    while free slots remain, else the first CULLED slot — the reference
    deletes redundant KeyFrame objects (KeyFrameCulling,
    /root/reference/src/LocalMapping.cc:633-697); the fixed-capacity SoA
    recycles their rows instead, so long sequences keep inserting at
    capacity. ok=False only when full with nothing culled."""
    k = m.n_kf
    K = m.kf_valid.shape[0]
    free_ok = k < K
    culled = ~m.kf_valid & (jnp.arange(K) < k)
    slot = jnp.where(free_ok, jnp.minimum(k, K - 1),
                     jnp.argmax(culled).astype(jnp.int32))
    return slot.astype(jnp.int32), free_ok | jnp.any(culled)


def insert_keyframe(m: MapState, R, t, frame_id, timestamp, kp_xy, kp_level,
                    kp_angle, kp_desc, kp_valid, kp_ur, kp_depth,
                    obs_lm) -> MapState:
    """Write a keyframe snapshot at next_kf_slot (no-op when full with
    nothing culled). Reusing a culled slot overwrites every kf_* row and
    recomputes its covisibility row/col; the culled KF's observations and
    n_obs contributions were already cleared at cull time
    (backend/fusion.cull_keyframes)."""
    k = m.n_kf
    K = m.kf_valid.shape[0]
    kk, ok = next_kf_slot(m)

    def setk(arr, val):
        return jnp.where(ok, arr.at[kk].set(val), arr)

    m = m._replace(
        kf_R=setk(m.kf_R, R), kf_t=setk(m.kf_t, t),
        kf_valid=setk(m.kf_valid, True),
        kf_frame_id=setk(m.kf_frame_id, frame_id),
        kf_timestamp=setk(m.kf_timestamp, timestamp),
        kf_kp_xy=setk(m.kf_kp_xy, kp_xy),
        kf_kp_level=setk(m.kf_kp_level, kp_level),
        kf_kp_angle=setk(m.kf_kp_angle, kp_angle),
        kf_kp_desc=setk(m.kf_kp_desc, kp_desc),
        kf_kp_valid=setk(m.kf_kp_valid, kp_valid),
        kf_kp_ur=setk(m.kf_kp_ur, kp_ur),
        kf_kp_depth=setk(m.kf_kp_depth, kp_depth),
        kf_obs_lm=setk(m.kf_obs_lm, obs_lm),
        n_kf=jnp.where(ok & (k < K), k + 1, k).astype(jnp.int32),
    )
    m = update_covisibility(m, kk)
    # a RECYCLED slot (insert while full) invalidates persistent loop
    # edges that referenced its old tenant — replaying them would
    # constrain two unrelated cameras in the next essential-graph run
    reused = ok & (k >= K)
    stale = reused & ((m.loop_i == kk) | (m.loop_j == kk))
    m = m._replace(loop_valid=m.loop_valid & ~stale)
    # bump n_obs for landmarks observed by the new KF
    L = m.lm_pos.shape[0]
    obs = jnp.where((obs_lm >= 0) & kp_valid, obs_lm, L)
    n_obs = jnp.zeros(L + 1, jnp.int32).at[obs].add(1)[:L]
    m = m._replace(lm_n_obs=m.lm_n_obs + jnp.where(ok, n_obs, 0))
    return m


@jax.jit
def add_landmarks(m: MapState, pos, desc, normal, dist_min, dist_max,
                  src_kf, src_slot, want) -> MapState:
    """Batch-allocate landmarks at the tail and bind them to keyframe
    keypoint slots.

    pos [M,3], desc [M,8], normal [M,3], dist_min/max [M]: candidate data.
    src_kf [M], src_slot [M]: the (keyframe, keypoint-slot) each candidate
    comes from. want [M] bool: which candidates to actually create.
    Candidates are packed to the front and written at n_lm + offset.
    Returns updated map (also writes kf_obs_lm back-pointers).
    """
    L = m.lm_pos.shape[0]
    M = pos.shape[0]
    order = jnp.argsort(~want)                 # wanted first, stable
    poso = pos[order]; desco = desc[order]; normo = normal[order]
    dmino = dist_min[order]; dmaxo = dist_max[order]
    kfo = src_kf[order]; sloto = src_slot[order]; wanto = want[order]
    offs = jnp.cumsum(wanto.astype(jnp.int32)) - 1
    dst = jnp.where(wanto & (m.n_lm + offs < L), m.n_lm + offs, L)
    pad = lambda arr, fill: jnp.concatenate(
        [arr, jnp.full((1,) + arr.shape[1:], fill, arr.dtype)])

    new_lm_pos = pad(m.lm_pos, 0).at[dst].set(poso)[:L]
    new_lm_desc = pad(m.lm_desc, 0).at[dst].set(desco)[:L]
    new_lm_norm = pad(m.lm_normal, 0).at[dst].set(normo)[:L]
    new_dmin = pad(m.lm_dist_min, 0).at[dst].set(dmino)[:L]
    new_dmax = pad(m.lm_dist_max, 0).at[dst].set(dmaxo)[:L]
    new_valid = pad(m.lm_valid, False).at[dst].set(True)[:L]
    new_first = pad(m.lm_first_kf, -1).at[dst].set(kfo)[:L]
    new_nobs = pad(m.lm_n_obs, 0).at[dst].set(1)[:L]
    new_vis = pad(m.lm_visible, 1).at[dst].set(1)[:L]
    new_fnd = pad(m.lm_found, 1).at[dst].set(1)[:L]
    created = jnp.sum((dst < L).astype(jnp.int32))

    # back-pointers kf_obs_lm[src_kf, src_slot] = landmark id
    valid_write = dst < L
    kfw = jnp.where(valid_write, kfo, m.kf_valid.shape[0] - 1)
    obs = m.kf_obs_lm
    obs = obs.at[kfw, sloto].set(
        jnp.where(valid_write, dst.astype(jnp.int32), obs[kfw, sloto]))
    return m._replace(
        lm_pos=new_lm_pos, lm_desc=new_lm_desc, lm_normal=new_lm_norm,
        lm_dist_min=new_dmin, lm_dist_max=new_dmax, lm_valid=new_valid,
        lm_first_kf=new_first, lm_n_obs=new_nobs, lm_visible=new_vis,
        lm_found=new_fnd, kf_obs_lm=obs,
        n_lm=(m.n_lm + created).astype(jnp.int32))


def covisible_keyframes(m: MapState, k: int, n_best: int,
                        min_weight: int = 15):
    """Top covisible KFs of k (KeyFrame::GetBestCovisibilityKeyFrames)."""
    w = m.covis[k] * m.kf_valid
    vals, idx = jax.lax.top_k(w, n_best)
    return idx, vals, vals >= min_weight
