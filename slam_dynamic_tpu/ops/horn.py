"""Closed-form Sim3 from 3D-3D correspondences (Horn's method) + batched
RANSAC with reprojection gating.

TPU-native equivalent of Sim3Solver (/root/reference/src/Sim3Solver.cc:
ComputeSim3 centroid/rotation-from-M/scale, CheckInliers reprojection
gates). The reference's 5-iteration RANSAC rounds become one batched
hypothesis sweep; inlier checks project candidate landmark pairs through
both cameras as in the reference.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..utils.camera import Intrinsics, project
from .ransac import _sample_indices


def horn_sim3(x1, x2, w, fix_scale: bool = False):
    """Weighted closed-form similarity x2 ~ s R x1 + t.

    x1, x2: [N, 3]; w: [N] weights (0/1 masks fine). Uses the SVD variant
    (numerically equivalent to Horn's quaternion method).
    """
    ws = jnp.maximum(w.sum(), 1e-9)
    mu1 = (x1 * w[:, None]).sum(0) / ws
    mu2 = (x2 * w[:, None]).sum(0) / ws
    c1 = x1 - mu1
    c2 = x2 - mu2
    cov = (c2 * w[:, None]).T @ c1 / ws
    U, D, Vt = jnp.linalg.svd(cov)
    S = jnp.eye(3)
    det = jnp.linalg.det(U) * jnp.linalg.det(Vt)
    S = S.at[2, 2].set(jnp.where(det < 0, -1.0, 1.0))
    R = U @ S @ Vt
    var1 = ((c1 ** 2).sum(-1) * w).sum() / ws
    s = jnp.where(fix_scale, 1.0,
                  jnp.sum(D * jnp.diag(S)) / jnp.maximum(var1, 1e-12))
    t = mu2 - s * R @ mu1
    return s, R, t


class Sim3Fit(NamedTuple):
    s: jnp.ndarray
    R: jnp.ndarray
    t: jnp.ndarray
    inliers: jnp.ndarray
    n_inliers: jnp.ndarray


@functools.partial(jax.jit, static_argnames=("n_hyp", "fix_scale"))
def ransac_sim3(cam1: Intrinsics, cam2: Intrinsics, x1, x2, uv1, uv2, mask,
                key, n_hyp: int = 128, fix_scale: bool = True,
                th_px: float = 10.0) -> Sim3Fit:
    """Sim3 aligning camera-1-frame points x1 to camera-2-frame points x2.

    uv1/uv2: observed pixels of the pairs in each camera (for the
    reprojection inlier gates, ref Sim3Solver::CheckInliers). mask: valid
    pairs. Returns transform T21 (s, R, t): x2 = s R x1 + t.
    """
    idx = _sample_indices(key, n_hyp, 3, x1.shape[0], mask)
    ones3 = jnp.ones(3)

    def solve(i):
        return horn_sim3(x1[i], x2[i], ones3, fix_scale)

    ss, Rs, ts = jax.vmap(solve)(idx)
    th2 = th_px * th_px

    def score(s, R, t):
        x2p = s * (x1 @ R.T) + t                     # pairs mapped into cam2
        e2 = jnp.sum((project(cam2, x2p) - uv2) ** 2, axis=1)
        si, Ri, ti = 1.0 / s, R.T, -(R.T @ t) / s
        x1p = si * (x2 @ Ri.T) + ti
        e1 = jnp.sum((project(cam1, x1p) - uv1) ** 2, axis=1)
        inl = (e1 < th2) & (e2 < th2) & mask & (x2p[:, 2] > 0) \
            & (x1p[:, 2] > 0)
        return inl.sum(), inl

    counts, inls = jax.vmap(score)(ss, Rs, ts)
    best = jnp.argmax(counts)
    # refit on inliers
    w = inls[best].astype(x1.dtype)
    s, R, t = horn_sim3(x1, x2, w, fix_scale)
    n, inl = score(s, R, t)
    return Sim3Fit(s, R, t, inl, n.astype(jnp.int32))
