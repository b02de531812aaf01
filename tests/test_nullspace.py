"""Unit tests for the pure-matmul nullspace/eigenvector solver that
replaced batched small SVDs in the RANSAC / PnP / triangulation hot paths
(ops/nullspace.py)."""
import numpy as np
import jax.numpy as jnp

from slam_dynamic_tpu.ops import nullspace as ns


def test_smallest_eigvec_known_spectrum(rng):
    Q, _ = np.linalg.qr(rng.normal(size=(9, 9)))
    for lam2 in [0.5, 1e-2, 1e-3]:
        lam = np.array([0.0, lam2, 1, 2, 3, 4, 5, 6, 7])
        M = ((Q * lam) @ Q.T).astype(np.float32)
        v = np.asarray(ns.smallest_eigvec(jnp.asarray(M)))
        assert abs(v @ Q[:, 0]) > 0.9999, lam2


def test_null_vector_matches_svd_exact_null(rng):
    A = rng.normal(size=(256, 8, 9)).astype(np.float32)
    v = np.asarray(ns.null_vector(jnp.asarray(A)))
    _, _, vt = np.linalg.svd(A)
    cos = np.abs(np.einsum("bi,bi->b", vt[:, -1], v))
    assert cos.min() > 0.9999


def test_null_vector_matches_f64_svd_noisy(rng):
    # overdetermined ill-conditioned systems: the refinement step must
    # recover the precision the float32 Gram matrix loses
    U = rng.normal(size=(16, 500, 8)).astype(np.float32)
    W = rng.normal(size=(16, 8, 9)).astype(np.float32)
    for noise in [1e-2, 1e-4]:
        B = (U @ W + noise * rng.normal(size=(16, 500, 9))).astype(
            np.float32)
        v = np.asarray(ns.null_vector(jnp.asarray(B)))
        _, _, vt = np.linalg.svd(B.astype(np.float64))
        r_ns = np.linalg.norm(np.einsum("bmi,bi->bm", B, v), axis=-1)
        r_sv = np.linalg.norm(
            np.einsum("bmi,bi->bm", B, vt[:, -1].astype(np.float32)),
            axis=-1)
        assert (r_ns / np.maximum(r_sv, 1e-12)).max() < 1.001, noise


def test_rank2_project(rng):
    F = rng.normal(size=(128, 3, 3)).astype(np.float32)
    F2 = np.asarray(ns.rank2_project(jnp.asarray(F)))
    s = np.linalg.svd(F2, compute_uv=False)
    assert (s[:, 2] / s[:, 0]).max() < 5e-3        # rank-2 to f32 accuracy
    # matches the SVD truncation where the sigma2/sigma3 gap is clear
    U, D, Vt = np.linalg.svd(F)
    ref = (U * np.concatenate([D[:, :2], np.zeros((128, 1))], 1)[:, None])\
        @ Vt
    gap = D[:, 1] / np.maximum(D[:, 2], 1e-9)
    clear = gap > 1.5
    err = np.abs(F2 - ref).max(axis=(1, 2)) / np.abs(ref).max(axis=(1, 2))
    assert err[clear].max() < 1e-3


def test_inv3(rng):
    M = rng.normal(size=(64, 3, 3)).astype(np.float32)
    Mi = np.asarray(ns.inv3(jnp.asarray(M)))
    err = np.abs(Mi @ M - np.eye(3, dtype=np.float32)).max()
    assert err < 1e-4
