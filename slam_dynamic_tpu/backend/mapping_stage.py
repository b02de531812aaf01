"""The complete keyframe-insertion mapping stage as ONE jit unit.

Composes make_keyframe -> cull_landmarks -> fuse_into_keyframe ->
local_ba -> cull_keyframes (the LocalMapping::Run sequence,
/root/reference/src/LocalMapping.cc:48-113) into a single device call —
on the measured tunnel profile each separate dispatch+sync costs tens of
milliseconds, so keyframe frames were paying ~6 round trips.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..utils.camera import Intrinsics
from ..worldmap.state import MapState
from ..worldmap.keyframe_ops import make_keyframe, \
    refresh_landmark_descriptors
from ..frontend.frame import FrameData
from ..frontend import tracking_ops as tops
from .local_mapping import cull_landmarks, local_ba
from .fusion import fuse_into_keyframe, cull_keyframes


@functools.partial(
    jax.jit,
    static_argnames=("n_levels", "stereo", "max_kf", "max_lm", "do_ba",
                     "do_refresh", "tri_neighbors"))
def insert_keyframe_stage(m: MapState, cam: Intrinsics, fd: FrameData,
                          R, t, frame_id, timestamp, obs_lm, depth_th,
                          scale_factor, redundancy,
                          n_levels: int = 8, stereo: bool = True,
                          max_kf: int = 16, max_lm: int = 4096,
                          do_ba: bool = True, do_refresh: bool = False,
                          tri_neighbors: int = 0):
    """Insert KF + full mapping pass. Returns (map, k) with k the new
    keyframe slot (device scalar; the host mirrors the append counter and
    only reads k back at capacity, when a culled slot was recycled;
    k = -1 means full with nothing culled — the whole stage no-ops,
    including the downstream cull/fuse/BA: the final map is selected
    against the entry snapshot so a -1 insert cannot mutate anything)."""
    m_in = m
    m, k_slot = make_keyframe(m, cam, fd, R, t, frame_id, timestamp,
                              obs_lm, depth_th, scale_factor,
                              n_levels=n_levels)
    k = jnp.maximum(k_slot, 0)     # -1 (no-op insert) -> harmless row 0
    m = cull_landmarks(m, k)
    if tri_neighbors > 0:
        # CreateNewMapPoints for stereo/RGB-D too (ref LocalMapping.cc:
        # 208-454 runs for ALL sensors): far points beyond ThDepth enter
        # the map here, not via the depth path in make_keyframe
        from .triangulation import triangulate_with_neighbors
        m = triangulate_with_neighbors(m, cam, k, scale_factor,
                                       n_neighbors=tri_neighbors,
                                       n_levels=n_levels, stereo=stereo)
    if do_ba:
        local = tops.select_local_map(m.kf_obs_lm, m.kf_valid,
                                      m.kf_obs_lm[k], m.lm_pos.shape[0],
                                      max_kf=max_kf, max_lm=max_lm)
        m = fuse_into_keyframe(m, cam, k, local.lm_ids, local.lm_mask,
                               scale_factor, max_lm=max_lm)
        m = local_ba(m, cam, k, scale_factor, stereo=stereo,
                     max_kf=min(max_kf, 16), max_lm=max_lm)
        m = cull_keyframes(m, k, redundancy=redundancy)
    if do_refresh:
        m = refresh_landmark_descriptors(m)
    # contract: k_slot == -1 -> the WHOLE stage is a no-op (the host-side
    # guard makes this unreachable from Tracker, but direct callers —
    # tests, future call sites — get the documented behavior)
    ok = k_slot >= 0
    m = jax.tree_util.tree_map(lambda new, old: jnp.where(ok, new, old),
                               m, m_in)
    return m, k
