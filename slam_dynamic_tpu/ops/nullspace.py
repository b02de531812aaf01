"""Pure-matmul smallest-eigenvector / nullspace solves for small systems.

Replaces the batched small SVDs that dominated the fused dynamic-scene
step (256 RANSAC hypotheses x [8,9] DLT nullspaces; see
/root/reference/src/Tracking.cc:1028-1077 TrackHomo's cv::findHomography /
cv::findFundamentalMat). Batched small SVD/eigh lower to iterative
while-loops on TPU, which both run slowly and bloat the executable (a real
dispatch cost through latency-bound transports). Here the smallest
eigenvector of a symmetric PSD Gram matrix AtA is found with nothing but
matmuls:

  1. shift:      Ms = AtA + eps*tr*I        (makes Ms positive definite)
  2. invert:     X ~= Ms^-1 by Newton-Schulz iteration (2 matmuls/step;
                 X is a POLYNOMIAL in Ms so it has exactly Ms's
                 eigenvectors regardless of inversion error)
  3. amplify:    X <- X@X (repeated squaring == inverse power iteration,
                 doubling the eigen-gap exponent per squaring; normalized
                 between squarings to keep float32 in range)
  4. extract:    the column of X with the largest diagonal entry is
                 dominated by the smallest-eigenvalue eigenvector
  5. refine:     v <- normalize(v - X At(A v)): iterative refinement that
                 re-injects the TRUE system through accurate A-products.
                 Forming AtA squares the conditioning (the normal-equations
                 pitfall: ~cond(A)^2 * float32-eps error in the eigvec);
                 the refinement operator I - X AtA has eigenvalues
                 eps/(l+eps) — another inverse-power amplifier, but driven
                 by matvecs with A itself, so each step recovers accuracy
                 the Gram rounding lost. 2 steps reach SVD-level residuals.

Every step is a fixed-trip-count unrolled matmul chain: MXU/VPU work, no
LAPACK-style control flow, fully fusable, deterministic. All matmuls use
Precision.HIGHEST — on TPU the default f32 matmul runs reduced-precision
bf16 passes, which these tiny, numerically sensitive solves cannot afford
(the FLOPs are trivial either way).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_HI = jax.lax.Precision.HIGHEST
_mm = functools.partial(jnp.matmul, precision=_HI)


def inv_newton_schulz(M: jnp.ndarray, iters: int = 20) -> jnp.ndarray:
    """Approximate inverse of symmetric positive-definite M [..., n, n]
    by Newton-Schulz iteration X <- X (2I - M X). The result is a
    polynomial in M (shares M's eigenvectors exactly).

    Init X0 = I / ||M||_inf (valid for SPD M: eigenvalues of M X0 land in
    (0, 1]): convergence in the SMALLEST eigenvalue then goes like
    2^iters * lambda_min / ||M||, i.e. linear in the condition number —
    the more common X0 = M / (||M||_1 ||M||_inf) is QUADRATIC in the
    condition number and never picks up a 1e-5-conditioned direction in
    float32."""
    n = M.shape[-1]
    eye = jnp.eye(n, dtype=M.dtype)
    r = jnp.max(jnp.sum(jnp.abs(M), axis=-1), axis=-1)  # >= lambda_max
    X = eye / jnp.maximum(r, 1e-30)[..., None, None]
    for _ in range(iters):
        X = _mm(X, 2.0 * eye - _mm(M, X))
    return X


def _extract_smallest(X: jnp.ndarray, squarings: int) -> jnp.ndarray:
    """Dominant eigenvector of X [..., n, n] (= smallest of the matrix X
    inverts) by repeated squaring + argmax-diagonal column extraction."""
    n = X.shape[-1]
    for _ in range(squarings):
        nrm = jnp.max(jnp.abs(X), axis=(-2, -1), keepdims=True)
        X = X / jnp.maximum(nrm, 1e-30)
        X = _mm(X, X)
    # diag(X) = sum_i p(l_i)^K u_i[j]^2 is dominated by the target
    # eigenvector; its largest component is >= 1/sqrt(n) so the argmax
    # column always carries a large projection onto it.
    j = jnp.argmax(jnp.diagonal(X, axis1=-2, axis2=-1), axis=-1)
    v = jnp.take_along_axis(X, j[..., None, None].astype(jnp.int32)
                            .repeat(n, axis=-2), axis=-1)[..., 0]
    return v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-30)


def smallest_eigvec(M: jnp.ndarray, shift_rel: float = 1e-5,
                    ns_iters: int = 20, squarings: int = 3) -> jnp.ndarray:
    """Unit eigenvector of the smallest eigenvalue of symmetric PSD
    M [..., n, n] -> [..., n]. Sign is arbitrary (as with SVD)."""
    n = M.shape[-1]
    eye = jnp.eye(n, dtype=M.dtype)
    tr = jnp.trace(M, axis1=-2, axis2=-1)          # >= lambda_max (PSD)
    eps = shift_rel * tr + 1e-30
    X = inv_newton_schulz(M + eps[..., None, None] * eye, ns_iters)
    return _extract_smallest(X, squarings)


def null_vector(A: jnp.ndarray, shift_rel: float = 1e-5,
                ns_iters: int = 20, squarings: int = 3,
                refine: int = 2) -> jnp.ndarray:
    """Least right-singular vector of A [..., m, n] -> [..., n] via the
    Gram matrix AtA (one MXU matmul) — the DLT nullspace solve — with
    `refine` iterative-refinement steps against A itself (see module
    docstring; this is what makes the result SVD-grade in float32)."""
    G = jnp.einsum("...mi,...mj->...ij", A, A, precision=_HI)
    n = G.shape[-1]
    eye = jnp.eye(n, dtype=G.dtype)
    tr = jnp.trace(G, axis1=-2, axis2=-1)
    eps = shift_rel * tr + 1e-30
    X = inv_newton_schulz(G + eps[..., None, None] * eye, ns_iters)
    v = _extract_smallest(X, squarings)
    for _ in range(refine):
        Av = jnp.einsum("...mi,...i->...m", A, v, precision=_HI)
        g = jnp.einsum("...mi,...m->...i", A, Av, precision=_HI)
        w = v - jnp.einsum("...ij,...j->...i", X, g, precision=_HI)
        v = w / jnp.maximum(jnp.linalg.norm(w, axis=-1, keepdims=True),
                            1e-30)
    return v


def inv3(M: jnp.ndarray) -> jnp.ndarray:
    """Closed-form adjugate inverse of M [..., 3, 3] — pure arithmetic,
    no LU loop (for the 3x3 inverses inside batched hypothesis scoring)."""
    a, b, c = M[..., 0, 0], M[..., 0, 1], M[..., 0, 2]
    d, e, f = M[..., 1, 0], M[..., 1, 1], M[..., 1, 2]
    g, h, i = M[..., 2, 0], M[..., 2, 1], M[..., 2, 2]
    A = e * i - f * h
    B = -(d * i - f * g)
    C = d * h - e * g
    det = a * A + b * B + c * C
    inv_det = 1.0 / jnp.where(jnp.abs(det) < 1e-30, 1e-30, det)
    adj = jnp.stack([
        jnp.stack([A, -(b * i - c * h), (b * f - c * e)], axis=-1),
        jnp.stack([B, (a * i - c * g), -(a * f - c * d)], axis=-1),
        jnp.stack([C, -(a * h - b * g), (a * e - b * d)], axis=-1),
    ], axis=-2)
    return adj * inv_det[..., None, None]


def rank2_project(F: jnp.ndarray) -> jnp.ndarray:
    """Project F [..., 3, 3] to the nearest rank-2 matrix (zero the
    smallest singular value) without an SVD: F' = F - (u3^t F v3) u3 v3^t
    with u3/v3 the least singular vectors (refined null vectors of F and
    F^t)."""
    v3 = null_vector(F, ns_iters=16, squarings=3, refine=2)
    u3 = null_vector(jnp.swapaxes(F, -1, -2), ns_iters=16, squarings=3,
                     refine=2)
    s3 = jnp.einsum("...i,...ij,...j->...", u3, F, v3, precision=_HI)
    return F - s3[..., None, None] * u3[..., :, None] * v3[..., None, :]
