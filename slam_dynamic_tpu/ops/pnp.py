"""Perspective-n-Point by batched-hypothesis RANSAC.

Fills the role of PnPsolver (EPnP + RANSAC, /root/reference/src/
PnPsolver.cc, used by Tracking::Relocalization /root/reference/src/
Tracking.cc:2282). TPU-native design: instead of EPnP's control-point
Gauss-Newton inside a sequential RANSAC, sample all minimal sets at once,
solve each by 6-point DLT for the projection matrix (one batched
pure-matmul nullspace solve, ops/nullspace.py),
decompose to (R, t) with cheirality fixing, score all hypotheses against
all correspondences in one pass, then polish the winner with the standard
LM pose optimizer (optim/pose_opt.py) — the polish supplies the accuracy
EPnP's refinement would.

Coplanar scenes (wall, floor, facade): the 6-point DLT is degenerate
when a sample is coplanar (the DLT nullspace is not unique), where the
reference's EPnP still works (its 4 control points handle the planar
case explicitly, PnPsolver.cc choose_control_points). Covered here the
batched way: every sample ALSO yields a planar-homography pose (fit the
sample's plane, DLT the plane->image homography, decompose H = [Re1,
Re2, Rc+t] with cheirality disambiguation — the IPPE/planar-PnP
construction) and both hypothesis families are scored together in one
pass; whichever geometry matches the scene wins the vote.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..utils.camera import Intrinsics, project
from ..utils.se3 import orthonormalize
from .nullspace import null_vector, smallest_eigvec
from .ransac import _sample_indices


class PnPResult(NamedTuple):
    R: jnp.ndarray
    t: jnp.ndarray
    inliers: jnp.ndarray
    n_inliers: jnp.ndarray


def _dlt_pose(xw, uv_norm):
    """[6,3] world points + [6,2] normalized image coords -> (R, t).

    Solves P [3x4] via DLT on K^-1-normalized observations, then projects
    the left 3x3 onto SO(3) and rescales t accordingly.
    """
    n = xw.shape[0]
    X = jnp.concatenate([xw, jnp.ones((n, 1), xw.dtype)], axis=1)  # [6,4]
    u = uv_norm[:, 0]
    v = uv_norm[:, 1]
    z = jnp.zeros((n, 4), xw.dtype)
    r1 = jnp.concatenate([X, z, -u[:, None] * X], axis=1)   # [6,12]
    r2 = jnp.concatenate([z, X, -v[:, None] * X], axis=1)
    A = jnp.concatenate([r1, r2])                           # [12,12]
    P = null_vector(A).reshape(3, 4)   # pure-matmul nullspace (no SVD)
    M = P[:, :3]
    # sign: points must be in front (positive depth for majority)
    depths = X @ P[2]
    sgn = jnp.where(jnp.sum(jnp.sign(depths)) >= 0, 1.0, -1.0)
    P = P * sgn
    M = P[:, :3]
    scale = jnp.exp(jnp.mean(jnp.log(jnp.maximum(
        jnp.linalg.norm(M, axis=1), 1e-12))))
    R = orthonormalize(M / scale)
    t = P[:, 3] / scale
    return R, t


def _homography_pose(xw, uv_norm):
    """[6,3] world points (assumed ~coplanar) + [6,2] normalized image
    coords -> (R, t) via plane-induced homography decomposition.

    With plane frame (c, e1, e2): X = c + a e1 + b e2, so the projection
    of [a, b, 1] is H = [R e1 | R e2 | R c + t] up to scale. Recover the
    plane by SVD of the centered sample, DLT the [a,b]->image homography,
    normalize by ||h1|| ||h2||, fix the sign by majority cheirality, and
    rebuild R from the orthonormalized frame images."""
    n = xw.shape[0]
    c = jnp.mean(xw, axis=0)
    Xc = xw - c
    # plane normal = least eigvec of the 3x3 scatter; the in-plane basis
    # (e1, e2) only parametrizes the plane — any orthonormal pair works,
    # so build one from the normal by Gram-Schmidt (no SVD needed)
    e3 = smallest_eigvec(Xc.T @ Xc)
    seed = jnp.where(jnp.abs(e3[0]) < 0.9,
                     jnp.array([1.0, 0.0, 0.0], xw.dtype),
                     jnp.array([0.0, 1.0, 0.0], xw.dtype))
    e1 = seed - e3 * jnp.dot(seed, e3)
    e1 = e1 / jnp.maximum(jnp.linalg.norm(e1), 1e-12)
    e2 = jnp.cross(e3, e1)        # then cross(e1, e2) == e3 (right-handed)
    ab = jnp.stack([Xc @ e1, Xc @ e2], axis=1)              # [n, 2]
    A1 = jnp.concatenate([ab, jnp.ones((n, 1), xw.dtype)], axis=1)
    u = uv_norm[:, 0]
    v = uv_norm[:, 1]
    z = jnp.zeros_like(A1)
    rows = jnp.concatenate([
        jnp.concatenate([A1, z, -u[:, None] * A1], axis=1),
        jnp.concatenate([z, A1, -v[:, None] * A1], axis=1)])   # [2n, 9]
    H = null_vector(rows).reshape(3, 3)
    s = jnp.sqrt(jnp.maximum(
        jnp.linalg.norm(H[:, 0]) * jnp.linalg.norm(H[:, 1]), 1e-12))
    H = H / s
    # cheirality: depths are the 3rd row applied to [a, b, 1]; H and -H
    # flip all depths, keep the majority-positive sign
    depths = A1 @ H[2]
    H = H * jnp.where(jnp.sum(jnp.sign(depths)) >= 0, 1.0, -1.0)
    r1, r2 = H[:, 0], H[:, 1]
    Rp = orthonormalize(jnp.stack([r1, r2, jnp.cross(r1, r2)], axis=1))
    E = jnp.stack([e1, e2, e3], axis=1)                     # columns
    R = Rp @ E.T
    t = H[:, 2] - R @ c
    return R, t


@functools.partial(jax.jit, static_argnames=("n_hyp",))
def ransac_pnp(cam: Intrinsics, xw, uv, mask, key, n_hyp: int = 128,
               thresh_px: float = 5.0) -> PnPResult:
    """xw [N,3] world points, uv [N,2] pixel obs, mask [N] valid."""
    uv_norm = jnp.stack([(uv[:, 0] - cam.cx) / cam.fx,
                         (uv[:, 1] - cam.cy) / cam.fy], axis=1)
    idx = _sample_indices(key, n_hyp, 6, xw.shape[0], mask)
    Rs_d, ts_d = jax.vmap(lambda i: _dlt_pose(xw[i], uv_norm[i]))(idx)
    # planar-homography hypotheses from the SAME samples (coplanar scenes
    # break the DLT; general scenes break the homography — the joint
    # score pass keeps whichever family fits)
    Rs_h, ts_h = jax.vmap(
        lambda i: _homography_pose(xw[i], uv_norm[i]))(idx)
    Rs = jnp.concatenate([Rs_d, Rs_h])
    ts = jnp.concatenate([ts_d, ts_h])
    th2 = thresh_px * thresh_px

    def score(R, t):
        xc = xw @ R.T + t
        pr = project(cam, xc)
        e = jnp.sum((pr - uv) ** 2, axis=1)
        inl = (e < th2) & (xc[:, 2] > 0.05) & mask
        return inl.sum(), inl

    counts, inls = jax.vmap(score)(Rs, ts)
    best = jnp.argmax(counts)
    return PnPResult(Rs[best], ts[best], inls[best],
                     counts[best].astype(jnp.int32))
