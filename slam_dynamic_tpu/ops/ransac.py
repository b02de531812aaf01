"""Batched-hypothesis RANSAC for homography and fundamental matrix.

TPU-native replacement for cv::findHomography / cv::findFundamentalMat
(RANSAC) as used by Tracking::TrackHomo (/root/reference/src/
Tracking.cc:1028-1029) and for the reference Initializer's dual H/F RANSAC
(/root/reference/src/Initializer.cc). The sequential hypothesize-and-verify
loop becomes: sample all `n_hyp` minimal sets at once with a threaded PRNG,
solve them batched, score every hypothesis against every correspondence in
one [H, P] pass, argmax inliers. Fixed trip count, deterministic under a
seed — the reference's cv::RANSAC is nondeterministic.

Round-4 rewrite: the per-hypothesis [8,9] SVD nullspaces (and the [3,3]
rank-2 SVDs) were the dominant device cost of the fused dynamic-scene step
— batched small SVDs lower to iterative while-loops on TPU. All nullspace
solves now go through ops/nullspace.py (Gram matrix + Newton-Schulz
inverse-power iteration: pure unrolled matmuls), hypothesis systems are
built batched with no vmap-of-Python-loops, and every 3x3 inverse is the
closed-form adjugate. Minimal sets are Hartley-normalized per hypothesis
(the Gram matrix squares conditioning, so raw-pixel DLT entries would
overflow float32 precision).
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from .nullspace import inv3, null_vector, rank2_project


class ModelFit(NamedTuple):
    M: jnp.ndarray          # [3, 3] best model
    inliers: jnp.ndarray    # [P] bool
    n_inliers: jnp.ndarray  # int32
    score: jnp.ndarray      # float32 (inlier count of best)


def _hartley(x, w):
    """Hartley normalization of x [..., k, 2] with weights w [..., k]:
    zero mean, mean distance sqrt(2). Returns (xn, T, Tinv) with
    xh_n = T xh; T/Tinv are closed-form similarity transforms [..., 3, 3].
    """
    wsum = jnp.maximum(jnp.sum(w, axis=-1, keepdims=True), 1e-9)
    mu = jnp.sum(x * w[..., None], axis=-2) / wsum                # [..., 2]
    d = jnp.sqrt(jnp.sum((x - mu[..., None, :]) ** 2, -1) + 1e-12)
    md = jnp.sum(d * w, axis=-1) / wsum[..., 0]
    s = jnp.sqrt(2.0) / jnp.maximum(md, 1e-9)                     # [...]
    xn = (x - mu[..., None, :]) * s[..., None, None]
    z = jnp.zeros_like(s)
    o = jnp.ones_like(s)
    T = jnp.stack([
        jnp.stack([s, z, -s * mu[..., 0]], -1),
        jnp.stack([z, s, -s * mu[..., 1]], -1),
        jnp.stack([z, z, o], -1)], -2)
    si = 1.0 / s
    Tinv = jnp.stack([
        jnp.stack([si, z, mu[..., 0]], -1),
        jnp.stack([z, si, mu[..., 1]], -1),
        jnp.stack([z, z, o], -1)], -2)
    return xn, T, Tinv


def _sample_indices(key, n_hyp, k, p_count, weights):
    """[n_hyp, k] random indices drawn from valid correspondences."""
    # Gumbel top-k per hypothesis ensures distinct indices
    g = jax.random.gumbel(key, (n_hyp, weights.shape[0]))
    g = jnp.where(weights[None, :], g, -jnp.inf)
    _, idx = jax.lax.top_k(g, k)
    return idx


def _h_design(p1, p2, w=None):
    """Homography DLT rows from pairs [..., k, 2] -> A [..., 2k, 9]."""
    x, y = p1[..., 0], p1[..., 1]
    u, v = p2[..., 0], p2[..., 1]
    z = jnp.zeros_like(x)
    o = jnp.ones_like(x)
    r1 = jnp.stack([-x, -y, -o, z, z, z, u * x, u * y, u], -1)
    r2 = jnp.stack([z, z, z, -x, -y, -o, v * x, v * y, v], -1)
    if w is not None:
        r1 = r1 * w[..., None]
        r2 = r2 * w[..., None]
    return jnp.concatenate([r1, r2], -2)


def _f_design(p1, p2, w=None):
    """Fundamental-matrix rows from pairs [..., k, 2] -> A [..., k, 9]."""
    x, y = p1[..., 0], p1[..., 1]
    u, v = p2[..., 0], p2[..., 1]
    A = jnp.stack([u * x, u * y, u, v * x, v * y, v, x, y,
                   jnp.ones_like(x)], -1)
    if w is not None:
        A = A * w[..., None]
    return A


def _solve_h(p1, p2, w):
    """Weighted normalized DLT homography, batched: pairs [..., k, 2] +
    weights [..., k] -> H [..., 3, 3] (denormalized, H[2,2]-scaled)."""
    p1n, T1, _ = _hartley(p1, w)
    p2n, _, T2i = _hartley(p2, w)
    h = null_vector(_h_design(p1n, p2n, w))
    Hn = h.reshape(h.shape[:-1] + (3, 3))
    H = T2i @ Hn @ T1
    den = H[..., 2:3, 2:3]
    return H / jnp.where(jnp.abs(den) < 1e-12, 1e-12, den)


def _solve_f(p1, p2, w):
    """Weighted normalized 8-point fundamental matrix, batched + rank-2."""
    p1n, T1, _ = _hartley(p1, w)
    p2n, T2, _ = _hartley(p2, w)
    f = null_vector(_f_design(p1n, p2n, w))
    F = rank2_project(f.reshape(f.shape[:-1] + (3, 3)))
    return jnp.swapaxes(T2, -1, -2) @ F @ T1


def h_transfer_errors(H, p1, p2):
    """Symmetric transfer squared errors for homography.
    H: [..., 3, 3]; p1/p2: [P, 2] -> errors [..., P]."""
    ones = jnp.ones(p1.shape[:-1] + (1,), p1.dtype)
    x1 = jnp.concatenate([p1, ones], axis=-1)
    x2 = jnp.concatenate([p2, ones], axis=-1)
    Hx1 = jnp.einsum("...ij,pj->...pi", H, x1)
    den = Hx1[..., 2:]
    fw = Hx1[..., :2] / jnp.where(jnp.abs(den) < 1e-9, 1e-9, den)
    e_fw = jnp.sum((fw - p2) ** 2, axis=-1)
    eye = jnp.eye(3, dtype=H.dtype)
    Hinv = inv3(H + 1e-12 * eye)
    Hx2 = jnp.einsum("...ij,pj->...pi", Hinv, x2)
    den = Hx2[..., 2:]
    bw = Hx2[..., :2] / jnp.where(jnp.abs(den) < 1e-9, 1e-9, den)
    e_bw = jnp.sum((bw - p1) ** 2, axis=-1)
    return e_fw, e_bw


def f_epipolar_errors(F, p1, p2):
    """Squared point-to-epiline distances, both directions.
    F: [..., 3, 3]; p1/p2: [P, 2] -> distances [..., P] each."""
    ones = jnp.ones(p1.shape[:-1] + (1,), p1.dtype)
    x1 = jnp.concatenate([p1, ones], axis=-1)
    x2 = jnp.concatenate([p2, ones], axis=-1)
    l2 = jnp.einsum("...ij,pj->...pi", F, x1)           # epiline in image 2
    l1 = jnp.einsum("...ji,pj->...pi", F, x2)           # epiline in image 1
    d2 = (jnp.sum(x2 * l2, axis=-1) ** 2) / jnp.maximum(
        l2[..., 0] ** 2 + l2[..., 1] ** 2, 1e-12)
    d1 = (jnp.sum(x1 * l1, axis=-1) ** 2) / jnp.maximum(
        l1[..., 0] ** 2 + l1[..., 1] ** 2, 1e-12)
    return d1, d2


@functools.partial(jax.jit, static_argnames=("n_hyp",))
def fit_homography(p1, p2, mask, key, n_hyp: int = 256,
                   thresh_px: float = 3.0) -> ModelFit:
    """p1 -> p2 homography: batched RANSAC + weighted-DLT inlier refit."""
    idx = _sample_indices(key, n_hyp, 4, p1.shape[0], mask)
    w4 = jnp.ones(idx.shape, p1.dtype)
    Hs = _solve_h(p1[idx], p2[idx], w4)                   # [Hyp, 3, 3]
    th2 = thresh_px * thresh_px

    ef, eb = h_transfer_errors(Hs, p1, p2)                # [Hyp, P]
    inls = (ef < th2) & (eb < th2) & mask[None, :]
    counts = inls.sum(-1)
    best = jnp.argmax(counts)

    # the least-squares refit over the best hypothesis' inliers is ALWAYS
    # the returned model: its quality is seed-independent (a random
    # minimal set that ties on inlier count can still extrapolate badly
    # outside the inlier support — e.g. into the quarantined box regions
    # the dynamic-scene classifier chi2-tests).
    H = _solve_h(p1, p2, inls[best].astype(p1.dtype))
    ef, eb = h_transfer_errors(H, p1, p2)
    inl = (ef < th2) & (eb < th2) & mask
    return ModelFit(H, inl, inl.sum().astype(jnp.int32),
                    inl.sum().astype(jnp.float32))


@functools.partial(jax.jit, static_argnames=("n_hyp",))
def fit_fundamental(p1, p2, mask, key, n_hyp: int = 256,
                    thresh_px: float = 3.0) -> ModelFit:
    """p1 -> p2 fundamental matrix by batched 8-point RANSAC + refit."""
    idx = _sample_indices(key, n_hyp, 8, p1.shape[0], mask)
    w8 = jnp.ones(idx.shape, p1.dtype)
    Fs = _solve_f(p1[idx], p2[idx], w8)                   # [Hyp, 3, 3]
    th2 = thresh_px * thresh_px

    d1, d2 = f_epipolar_errors(Fs, p1, p2)                # [Hyp, P]
    inls = (d1 < th2) & (d2 < th2) & mask[None, :]
    counts = inls.sum(-1)
    best = jnp.argmax(counts)

    F = _solve_f(p1, p2, inls[best].astype(p1.dtype))
    d1, d2 = f_epipolar_errors(F, p1, p2)
    inl = (d1 < th2) & (d2 < th2) & mask
    return ModelFit(F, inl, inl.sum().astype(jnp.int32),
                    inl.sum().astype(jnp.float32))
