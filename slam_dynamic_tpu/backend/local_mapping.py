"""Local mapping stage: landmark culling + windowed bundle adjustment.

Equivalent of the LocalMapping thread (/root/reference/src/
LocalMapping.cc:48-113): MapPointCulling (:171-206) and the
covisibility-window local BA (Optimizer::LocalBundleAdjustment via :83).
In the TPU design this is a synchronous pipeline stage over the MapState
pytree — the KF queue/mutex handshake of the reference becomes a function
call (or an async dispatch of the same jit unit).

Triangulation of new mono landmarks (CreateNewMapPoints :208-454) lives in
backend/triangulation.py; depth sensors create landmarks at keyframe
insertion (worldmap/keyframe_ops.py), which covers the stereo/RGB-D path
exactly as the reference does (Tracking.cc:1941-1993).
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..utils.camera import Intrinsics
from ..optim.local_ba import BAProblem, bundle_adjust
from ..worldmap.state import MapState


@jax.jit
def cull_landmarks(m: MapState, current_kf: jnp.ndarray,
                   min_found_ratio: float = 0.25,
                   min_obs: int = 2) -> MapState:
    """MapPointCulling (ref LocalMapping.cc:171-206): drop landmarks whose
    found/visible ratio is poor, or that failed to gather observations
    within 2 keyframes of creation."""
    ratio = m.lm_found.astype(jnp.float32) / jnp.maximum(
        m.lm_visible.astype(jnp.float32), 1.0)
    age = current_kf - m.lm_first_kf
    bad = (ratio < min_found_ratio) & (m.lm_visible >= 8)
    bad |= (age >= 2) & (m.lm_n_obs <= min_obs) & (m.lm_visible >= 4)
    return m._replace(lm_valid=m.lm_valid & ~bad)


class _Window(NamedTuple):
    kf_ids: jnp.ndarray
    kf_mask: jnp.ndarray
    lm_ids: jnp.ndarray
    lm_mask: jnp.ndarray


@functools.partial(jax.jit, static_argnames=("max_kf", "max_lm"))
def _select_window(m: MapState, center_kf, max_kf: int, max_lm: int):
    K = m.kf_valid.shape[0]
    L = m.lm_pos.shape[0]
    w = m.covis[center_kf] * m.kf_valid
    vals, ids = jax.lax.top_k(w, max_kf - 1)
    kf_ids = jnp.concatenate([center_kf[None].astype(jnp.int32),
                              ids.astype(jnp.int32)])
    kf_mask = jnp.concatenate([jnp.ones(1, bool), vals > 0])
    obs = m.kf_obs_lm[kf_ids]                             # [max_kf, N]
    obs = jnp.where(kf_mask[:, None] & (obs >= 0), obs, L)
    marked = jnp.zeros(L + 1, bool).at[obs.reshape(-1)].set(True)
    marked = marked.at[L].set(False)
    lm_ids = jnp.nonzero(marked[:L] & m.lm_valid, size=max_lm,
                         fill_value=L)[0]
    lm_mask = lm_ids < L
    return _Window(kf_ids, kf_mask, jnp.where(lm_mask, lm_ids, 0).astype(
        jnp.int32), lm_mask)


@functools.partial(jax.jit,
                   static_argnames=("stereo", "max_kf", "max_lm"))
def local_ba(m: MapState, cam: Intrinsics, center_kf, scale_factor,
             stereo: bool = True, max_kf: int = 16,
             max_lm: int = 4096) -> MapState:
    """Windowed BA around `center_kf`; writes poses/points/outlier cuts back
    into the map. The oldest window keyframe (and KF 0 when present) is held
    fixed to anchor the gauge (the reference fixes all boundary KFs,
    ref :520-541 — our window-internal anchor is a documented simplification
    that the sharded global BA lifts)."""
    K, N = m.kf_obs_lm.shape
    L = m.lm_pos.shape[0]
    win = _select_window(m, center_kf, max_kf, max_lm)

    # local landmark remap: global id -> [0, max_lm)
    l2l = jnp.full(L + 1, -1, jnp.int32).at[win.lm_ids].set(
        jnp.arange(max_lm, dtype=jnp.int32))
    l2l = l2l.at[L].set(-1)

    # observations: every (window kf, slot)
    obs_g = m.kf_obs_lm[win.kf_ids]                       # [max_kf, N]
    obs_g = jnp.where(win.kf_mask[:, None], obs_g, -1)
    obs_lm_local = l2l[jnp.where(obs_g >= 0, obs_g, L)]   # [max_kf, N]
    kp_ok = m.kf_kp_valid[win.kf_ids]
    ovalid = (obs_lm_local >= 0) & kp_ok
    okf = jnp.broadcast_to(jnp.arange(max_kf, dtype=jnp.int32)[:, None],
                           (max_kf, N)).reshape(-1)
    olm = jnp.where(ovalid, obs_lm_local, 0).reshape(-1)
    xy = m.kf_kp_xy[win.kf_ids].reshape(-1, 2)
    ur = m.kf_kp_ur[win.kf_ids].reshape(-1)
    lvl = m.kf_kp_level[win.kf_ids].reshape(-1)
    inv_s2 = 1.0 / (scale_factor ** (2.0 * lvl.astype(jnp.float32)))
    if stereo:
        uv = jnp.concatenate([xy, ur[:, None]], axis=-1)
        urw = (ur > 0).astype(jnp.float32)
    else:
        uv = xy
        urw = jnp.ones_like(ur)

    # anchor: oldest valid window KF + global KF 0 if in window
    ids_masked = jnp.where(win.kf_mask, win.kf_ids, K)
    oldest = jnp.argmin(ids_masked)
    fixed = jnp.zeros(max_kf, bool).at[oldest].set(True)
    fixed |= (win.kf_ids == 0) & win.kf_mask

    problem = BAProblem(
        kf_R=m.kf_R[win.kf_ids], kf_t=m.kf_t[win.kf_ids],
        kf_fixed=fixed, kf_valid=win.kf_mask,
        points=m.lm_pos[win.lm_ids], lm_valid=win.lm_mask,
        obs_kf=okf, obs_lm=olm, obs_uv=uv,
        obs_inv_sigma2=inv_s2, obs_valid=ovalid.reshape(-1),
        obs_ur_weight=urw)
    res = bundle_adjust(cam, problem, stereo=stereo)

    # write back poses (only valid, non-fixed slots) and points
    upd = win.kf_mask & ~fixed
    kfw = jnp.where(upd, win.kf_ids, K - 1)
    kf_R = m.kf_R.at[kfw].set(jnp.where(upd[:, None, None], res.kf_R,
                                        m.kf_R[kfw]))
    kf_t = m.kf_t.at[kfw].set(jnp.where(upd[:, None], res.kf_t, m.kf_t[kfw]))
    lmw = jnp.where(win.lm_mask, win.lm_ids, L - 1)
    lm_pos = m.lm_pos.at[lmw].set(jnp.where(win.lm_mask[:, None], res.points,
                                            m.lm_pos[lmw]))

    # cut outlier observations (ref :713-753): clear kf_obs_lm entries
    out = (~res.obs_inlier.reshape(max_kf, N)) & ovalid
    obs_new = jnp.where(out, -1, m.kf_obs_lm[win.kf_ids])
    kfo = jnp.where(win.kf_mask, win.kf_ids, K - 1)
    kf_obs = m.kf_obs_lm.at[kfo].set(
        jnp.where(win.kf_mask[:, None], obs_new, m.kf_obs_lm[kfo]))

    # refresh n_obs
    flat = jnp.where((kf_obs >= 0) & m.kf_kp_valid, kf_obs, L).reshape(-1)
    n_obs = jnp.zeros(L + 1, jnp.int32).at[flat].add(1)[:L]
    return m._replace(kf_R=kf_R, kf_t=kf_t, lm_pos=lm_pos, kf_obs_lm=kf_obs,
                      lm_n_obs=n_obs)
