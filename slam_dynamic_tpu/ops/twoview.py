"""Two-view relative-pose reconstruction: essential/homography
decomposition with cheirality selection.

Equivalent of the reference Initializer's ReconstructF / ReconstructH /
CheckRT / DecomposeE (/root/reference/src/Initializer.cc): given RANSAC
models from ops/ransac.py, recover (R, t) candidates (4 from E, 8 from H by
Faugeras' method), triangulate all inliers under every candidate at once
(batched DLT), and pick the candidate with the dominant count of
good points (positive depth in both views, parallax, low reprojection
error).
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..utils.camera import Intrinsics, project
from ..backend.triangulation import triangulate_dlt


def decompose_essential(E):
    """E -> 4 candidate (R [4,3,3], t [4,3]) with |t|=1."""
    U, D, Vt = jnp.linalg.svd(E)
    # enforce det +1
    U = U * jnp.sign(jnp.linalg.det(U))
    Vt = Vt * jnp.sign(jnp.linalg.det(Vt))
    W = jnp.array([[0.0, -1, 0], [1, 0, 0], [0, 0, 1]])
    R1 = U @ W @ Vt
    R2 = U @ W.T @ Vt
    t = U[:, 2]
    t = t / jnp.maximum(jnp.linalg.norm(t), 1e-12)
    Rs = jnp.stack([R1, R1, R2, R2])
    ts = jnp.stack([t, -t, t, -t])
    return Rs, ts


def decompose_homography(H, cam: Intrinsics):
    """Faugeras SVD decomposition of a homography into 8 motion hypotheses
    (R [8,3,3], t [8,3], n [8,3]) (ref Initializer::ReconstructH)."""
    A = jnp.linalg.inv(cam.K) @ H @ cam.K
    U, D, Vt = jnp.linalg.svd(A)
    s = jnp.linalg.det(U) * jnp.linalg.det(Vt)
    d1, d2, d3 = D[0], D[1], D[2]
    V = Vt.T

    x1 = jnp.sqrt(jnp.clip((d1 * d1 - d2 * d2) /
                           jnp.maximum(d1 * d1 - d3 * d3, 1e-12), 0, None))
    x3 = jnp.sqrt(jnp.clip((d2 * d2 - d3 * d3) /
                           jnp.maximum(d1 * d1 - d3 * d3, 1e-12), 0, None))
    eps = jnp.array([1.0, -1.0, 1.0, -1.0])
    eps3 = jnp.array([1.0, 1.0, -1.0, -1.0])

    Rs, ts, ns = [], [], []
    # case d' = d2 (positive)
    sin_t = jnp.sqrt(jnp.clip((d1 * d1 - d2 * d2) * (d2 * d2 - d3 * d3),
                              0, None)) / jnp.maximum((d1 + d3) * d2, 1e-12)
    cos_t = (d2 * d2 + d1 * d3) / jnp.maximum((d1 + d3) * d2, 1e-12)
    for i in range(4):
        st = eps[i] * eps3[i] * sin_t
        Rp = jnp.array([[1.0, 0, 0], [0, 1.0, 0], [0, 0, 1.0]])
        Rp = Rp.at[0, 0].set(cos_t).at[0, 2].set(-st)
        Rp = Rp.at[2, 0].set(st).at[2, 2].set(cos_t)
        tp = jnp.array([eps[i] * x1, 0.0, -eps3[i] * x3]) * (d1 - d3)
        np_ = jnp.array([eps[i] * x1, 0.0, eps3[i] * x3])
        Rs.append(s * U @ Rp @ Vt)
        ts.append(U @ tp)
        ns.append(V @ np_)
    # case d' = -d2
    sin_p = jnp.sqrt(jnp.clip((d1 * d1 - d2 * d2) * (d2 * d2 - d3 * d3),
                              0, None)) / jnp.maximum((d1 - d3) * d2, 1e-12)
    cos_p = (d1 * d3 - d2 * d2) / jnp.maximum((d1 - d3) * d2, 1e-12)
    for i in range(4):
        sp = eps[i] * eps3[i] * sin_p
        Rp = jnp.array([[1.0, 0, 0], [0, -1.0, 0], [0, 0, 1.0]])
        Rp = Rp.at[0, 0].set(cos_p).at[0, 2].set(sp)
        Rp = Rp.at[2, 0].set(sp).at[2, 2].set(-cos_p)
        tp = jnp.array([eps[i] * x1, 0.0, eps3[i] * x3]) * (d1 + d3)
        np_ = jnp.array([eps[i] * x1, 0.0, eps3[i] * x3])
        Rs.append(s * U @ Rp @ Vt)
        ts.append(U @ tp)
        ns.append(V @ np_)
    ts_arr = jnp.stack(ts)
    ts_arr = ts_arr / jnp.maximum(
        jnp.linalg.norm(ts_arr, axis=-1, keepdims=True), 1e-12)
    return jnp.stack(Rs), ts_arr, jnp.stack(ns)


class Reconstruction(NamedTuple):
    ok: jnp.ndarray          # bool: a dominant hypothesis exists
    R: jnp.ndarray           # [3, 3] cam2<-cam1 (frame1 at identity)
    t: jnp.ndarray           # [3] unit baseline
    points: jnp.ndarray      # [N, 3] triangulated (frame-1 coords)
    good: jnp.ndarray        # [N] bool good under the winner


def _check_hypothesis(cam, R, t, uv1, uv2, mask, chi2=4.0):
    """Count good points for one (R, t): triangulate + gates
    (ref Initializer::CheckRT)."""
    I = jnp.eye(3)
    z = jnp.zeros(3)
    X = triangulate_dlt(cam, I, z, R, t, uv1, uv2)
    xc1 = X
    xc2 = X @ R.T + t
    finite = jnp.all(jnp.isfinite(X), axis=-1)
    # parallax between the two rays
    O2 = -R.T @ t
    r1 = X
    r2 = X - O2
    cosp = jnp.sum(r1 * r2, -1) / jnp.maximum(
        jnp.linalg.norm(r1, axis=-1) * jnp.linalg.norm(r2, axis=-1), 1e-9)
    e1 = jnp.sum((project(cam, xc1) - uv1) ** 2, -1)
    e2 = jnp.sum((project(cam, xc2) - uv2) ** 2, -1)
    good = (mask & finite & (xc1[:, 2] > 0) & (xc2[:, 2] > 0)
            & (cosp < 0.99998) & (e1 < chi2) & (e2 < chi2))
    return good, X


@functools.partial(jax.jit, static_argnames=("use_homography",))
def reconstruct(cam: Intrinsics, M, uv1, uv2, mask,
                use_homography: bool = False) -> Reconstruction:
    """Select the dominant motion hypothesis from model M (F or H)."""
    if use_homography:
        Rs, ts, _ = decompose_homography(M, cam)
    else:
        E = cam.K.T @ M @ cam.K
        Rs, ts = decompose_essential(E)

    goods, Xs = jax.vmap(
        lambda R, t: _check_hypothesis(cam, R, t, uv1, uv2, mask))(Rs, ts)
    counts = goods.sum(axis=1)
    best = jnp.argmax(counts)
    n_best = counts[best]
    counts_sorted = jnp.sort(counts)[::-1]
    second = counts_sorted[1]
    n_pairs = mask.sum()
    # dominance: best clearly beats second and explains most pairs
    # (ref ReconstructF: nGood > 0.9*N, secondBest < 0.75*nGood)
    ok = (n_best > 0.7 * n_pairs) & (second < 0.8 * n_best) & (n_best >= 50)
    return Reconstruction(ok, Rs[best], ts[best], Xs[best], goods[best])
