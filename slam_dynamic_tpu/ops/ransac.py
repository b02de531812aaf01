"""Batched-hypothesis RANSAC for homography and fundamental matrix.

TPU-native replacement for cv::findHomography / cv::findFundamentalMat
(RANSAC) as used by Tracking::TrackHomo (/root/reference/src/
Tracking.cc:1028-1029) and for the reference Initializer's dual H/F RANSAC
(/root/reference/src/Initializer.cc). The sequential hypothesize-and-verify
loop becomes: sample all `n_hyp` minimal sets at once with a threaded PRNG,
solve them batched (vmapped SVD), score every hypothesis against every
correspondence in one [H, P] pass, argmax inliers. Fixed trip count,
deterministic under a seed — the reference's cv::RANSAC is nondeterministic.
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp


class ModelFit(NamedTuple):
    M: jnp.ndarray          # [3, 3] best model
    inliers: jnp.ndarray    # [P] bool
    n_inliers: jnp.ndarray  # int32
    score: jnp.ndarray      # float32 (inlier count of best)


def _normalize_points(x, mask):
    """Hartley normalization: zero mean, mean dist sqrt(2). Returns
    (xn, T [3,3]) with xh_n = T xh."""
    wsum = jnp.maximum(mask.sum(), 1)
    mu = jnp.sum(x * mask[:, None], axis=0) / wsum
    d = jnp.linalg.norm(x - mu, axis=-1)
    md = jnp.sum(d * mask, axis=0) / wsum
    s = jnp.sqrt(2.0) / jnp.maximum(md, 1e-9)
    T = jnp.array([[1.0, 0, 0], [0, 1.0, 0], [0, 0, 1.0]]) * s
    T = T.at[0, 2].set(-s * mu[0]).at[1, 2].set(-s * mu[1]).at[2, 2].set(1.0)
    return (x - mu) * s, T


def _sample_indices(key, n_hyp, k, p_count, weights):
    """[n_hyp, k] random indices drawn from valid correspondences."""
    # Gumbel top-k per hypothesis ensures distinct indices
    g = jax.random.gumbel(key, (n_hyp, weights.shape[0]))
    g = jnp.where(weights[None, :], g, -jnp.inf)
    _, idx = jax.lax.top_k(g, k)
    return idx


def _solve_h_minimal(p1, p2):
    """DLT homography from 4 point pairs: p1, p2 [4, 2] -> H [3,3]."""
    def rows(a, b):
        x, y = a
        u, v = b
        r1 = jnp.array([-x, -y, -1.0, 0, 0, 0, u * x, u * y, u])
        r2 = jnp.array([0, 0, 0, -x, -y, -1.0, v * x, v * y, v])
        return jnp.stack([r1, r2])

    A = jnp.concatenate([rows(p1[i], p2[i]) for i in range(4)])  # [8, 9]
    # null vector via SVD
    _, _, vt = jnp.linalg.svd(A, full_matrices=True)
    h = vt[-1]
    return h.reshape(3, 3)


def _solve_f_8pt(p1, p2):
    """Normalized 8-point fundamental matrix: p1, p2 [8, 2] -> F [3,3]."""
    m1 = jnp.ones(8, bool)
    p1n, T1 = _normalize_points(p1, m1)
    p2n, T2 = _normalize_points(p2, m1)
    x, y = p1n[:, 0], p1n[:, 1]
    u, v = p2n[:, 0], p2n[:, 1]
    A = jnp.stack([u * x, u * y, u, v * x, v * y, v, x, y,
                   jnp.ones_like(x)], axis=-1)       # [8, 9]
    _, _, vt = jnp.linalg.svd(A, full_matrices=True)
    F = vt[-1].reshape(3, 3)
    # rank-2 enforcement
    U, D, Vt = jnp.linalg.svd(F)
    F = (U * D.at[2].set(0.0)[None, :]) @ Vt
    return T2.T @ F @ T1


def h_transfer_errors(H, p1, p2):
    """Symmetric transfer squared errors [P] for homography."""
    ones = jnp.ones((p1.shape[0], 1), p1.dtype)
    x1 = jnp.concatenate([p1, ones], axis=-1)
    x2 = jnp.concatenate([p2, ones], axis=-1)
    Hx1 = x1 @ H.T
    fw = Hx1[:, :2] / jnp.where(jnp.abs(Hx1[:, 2:]) < 1e-9, 1e-9, Hx1[:, 2:])
    e_fw = jnp.sum((fw - p2) ** 2, axis=-1)
    Hinv = jnp.linalg.inv(H + 1e-12 * jnp.eye(3))
    Hx2 = x2 @ Hinv.T
    bw = Hx2[:, :2] / jnp.where(jnp.abs(Hx2[:, 2:]) < 1e-9, 1e-9, Hx2[:, 2:])
    e_bw = jnp.sum((bw - p1) ** 2, axis=-1)
    return e_fw, e_bw


def f_epipolar_errors(F, p1, p2):
    """Squared point-to-epiline distances, both directions, [P] each."""
    ones = jnp.ones((p1.shape[0], 1), p1.dtype)
    x1 = jnp.concatenate([p1, ones], axis=-1)
    x2 = jnp.concatenate([p2, ones], axis=-1)
    l2 = x1 @ F.T            # epiline in image 2
    l1 = x2 @ F              # epiline in image 1
    d2 = (jnp.sum(x2 * l2, axis=-1) ** 2) / jnp.maximum(
        l2[:, 0] ** 2 + l2[:, 1] ** 2, 1e-12)
    d1 = (jnp.sum(x1 * l1, axis=-1) ** 2) / jnp.maximum(
        l1[:, 0] ** 2 + l1[:, 1] ** 2, 1e-12)
    return d1, d2


def _solve_h_weighted(p1, p2, w):
    """Weighted DLT over all pairs (normalized), for inlier refit."""
    p1n, T1 = _normalize_points(p1, w)
    p2n, T2 = _normalize_points(p2, w)
    x, y = p1n[:, 0], p1n[:, 1]
    u, v = p2n[:, 0], p2n[:, 1]
    z = jnp.zeros_like(x)
    o = jnp.ones_like(x)
    r1 = jnp.stack([-x, -y, -o, z, z, z, u * x, u * y, u], axis=-1)
    r2 = jnp.stack([z, z, z, -x, -y, -o, v * x, v * y, v], axis=-1)
    A = jnp.concatenate([r1 * w[:, None], r2 * w[:, None]])   # [2P, 9]
    _, _, vt = jnp.linalg.svd(A, full_matrices=False)
    Hn = vt[-1].reshape(3, 3)
    H = jnp.linalg.inv(T2) @ Hn @ T1
    return H / jnp.where(jnp.abs(H[2, 2]) < 1e-12, 1e-12, H[2, 2])


def _solve_f_weighted(p1, p2, w):
    """Weighted normalized 8-point over all pairs, for inlier refit."""
    p1n, T1 = _normalize_points(p1, w)
    p2n, T2 = _normalize_points(p2, w)
    x, y = p1n[:, 0], p1n[:, 1]
    u, v = p2n[:, 0], p2n[:, 1]
    A = jnp.stack([u * x, u * y, u, v * x, v * y, v, x, y,
                   jnp.ones_like(x)], axis=-1) * w[:, None]
    _, _, vt = jnp.linalg.svd(A, full_matrices=False)
    F = vt[-1].reshape(3, 3)
    U, D, Vt = jnp.linalg.svd(F)
    F = (U * D.at[2].set(0.0)[None, :]) @ Vt
    return T2.T @ F @ T1


@functools.partial(jax.jit, static_argnames=("n_hyp",))
def fit_homography(p1, p2, mask, key, n_hyp: int = 256,
                   thresh_px: float = 3.0) -> ModelFit:
    """p1 -> p2 homography: batched RANSAC + weighted-DLT inlier refit."""
    idx = _sample_indices(key, n_hyp, 4, p1.shape[0], mask)
    Hs = jax.vmap(lambda i: _solve_h_minimal(p1[i], p2[i]))(idx)  # [Hyp,3,3]
    th2 = thresh_px * thresh_px

    def score(H):
        ef, eb = h_transfer_errors(H, p1, p2)
        inl = (ef < th2) & (eb < th2) & mask
        return inl.sum(), inl

    counts, inls = jax.vmap(score)(Hs)
    best = jnp.argmax(counts)
    H = _solve_h_weighted(p1, p2, inls[best].astype(p1.dtype))
    ef, eb = h_transfer_errors(H, p1, p2)
    inl = (ef < th2) & (eb < th2) & mask
    return ModelFit(H, inl, inl.sum().astype(jnp.int32),
                    inl.sum().astype(jnp.float32))


@functools.partial(jax.jit, static_argnames=("n_hyp",))
def fit_fundamental(p1, p2, mask, key, n_hyp: int = 256,
                    thresh_px: float = 3.0) -> ModelFit:
    """p1 -> p2 fundamental matrix by batched 8-point RANSAC."""
    idx = _sample_indices(key, n_hyp, 8, p1.shape[0], mask)
    Fs = jax.vmap(lambda i: _solve_f_8pt(p1[i], p2[i]))(idx)
    th2 = thresh_px * thresh_px

    def score(F):
        d1, d2 = f_epipolar_errors(F, p1, p2)
        inl = (d1 < th2) & (d2 < th2) & mask
        return inl.sum(), inl

    counts, inls = jax.vmap(score)(Fs)
    best = jnp.argmax(counts)
    F = _solve_f_weighted(p1, p2, inls[best].astype(p1.dtype))
    d1, d2 = f_epipolar_errors(F, p1, p2)
    inl = (d1 < th2) & (d2 < th2) & mask
    return ModelFit(F, inl, inl.sum().astype(jnp.int32),
                    inl.sum().astype(jnp.float32))
