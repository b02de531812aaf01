"""Local bundle adjustment with Schur-complement landmark marginalization.

TPU-native equivalent of Optimizer::LocalBundleAdjustment (/root/reference/
src/Optimizer.cc:453-780) and g2o's BlockSolver Schur machinery
(/root/reference/Thirdparty/g2o/g2o/core/block_solver.hpp): instead of
sparse pointer-block matrices, the problem is fixed-capacity dense-blocked:

  - observations are a padded COO list (kf index, landmark index, uv, info);
  - per-landmark 3x3 Hessians are inverted in closed form (batched adjugate);
  - the camera-landmark coupling W is a dense [L, K, 6, 3] block tensor
    (local BA: K<=32, L<=4096 -> ~9 MB, trivially HBM-resident) built by
    scatter-add, and the reduced camera system S = Hcc - W Hpp^-1 W^T is
    two einsums on the MXU;
  - the reference's two-phase schedule (5 iters, outlier cut, 10 iters,
    final cut; ref :615-668) is reproduced with static loops.

Fixed poses (the boundary keyframes, ref :520-541) are handled by masking
their Jacobian columns, which is exactly g2o's vertex->setFixed.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..utils.camera import Intrinsics
from ..utils.se3 import se3_retract, orthonormalize
from .residuals import reprojection_terms, huber_weight, robust_cost


class BAProblem(NamedTuple):
    """Fixed-capacity local BA problem."""

    kf_R: jnp.ndarray        # [K, 3, 3] world->camera
    kf_t: jnp.ndarray        # [K, 3]
    kf_fixed: jnp.ndarray    # [K] bool (True = do not update)
    kf_valid: jnp.ndarray    # [K] bool
    points: jnp.ndarray      # [L, 3]
    lm_valid: jnp.ndarray    # [L] bool
    obs_kf: jnp.ndarray      # [O] int32
    obs_lm: jnp.ndarray      # [O] int32
    obs_uv: jnp.ndarray      # [O, 2|3]
    obs_inv_sigma2: jnp.ndarray  # [O]
    obs_valid: jnp.ndarray   # [O] bool
    obs_ur_weight: jnp.ndarray  # [O] float 0/1: zero the u_right row (mixed
    # mono/stereo observations; ignored in mono problems)


class BAResult(NamedTuple):
    kf_R: jnp.ndarray
    kf_t: jnp.ndarray
    points: jnp.ndarray
    obs_inlier: jnp.ndarray  # [O] bool observations surviving chi2 cuts
    total_chi2: jnp.ndarray


def invert3x3(M):
    """Batched closed-form 3x3 inverse via adjugate (faster than LU on TPU)."""
    a = M[..., 0, 0]; b = M[..., 0, 1]; c = M[..., 0, 2]
    d = M[..., 1, 0]; e = M[..., 1, 1]; f = M[..., 1, 2]
    g = M[..., 2, 0]; h = M[..., 2, 1]; i = M[..., 2, 2]
    A = e * i - f * h; B = c * h - b * i; C = b * f - c * e
    D = f * g - d * i; E = a * i - c * g; F = c * d - a * f
    G = d * h - e * g; H = b * g - a * h; I = a * e - b * d
    det = a * A + b * D + c * G
    det = jnp.where(jnp.abs(det) < 1e-12, 1e-12, det)
    adj = jnp.stack([
        jnp.stack([A, B, C], -1),
        jnp.stack([D, E, F], -1),
        jnp.stack([G, H, I], -1),
    ], -2)
    return adj / det[..., None, None]


def _gather_pose_point(problem: BAProblem):
    R = problem.kf_R[problem.obs_kf]
    t = problem.kf_t[problem.obs_kf]
    x = problem.points[problem.obs_lm]
    return R, t, x


def _ba_terms(cam, problem, stereo):
    R, t, x = _gather_pose_point(problem)
    return reprojection_terms(cam, R, t, x, problem.obs_uv,
                              problem.obs_inv_sigma2, stereo,
                              problem.obs_ur_weight if stereo else None)


def ba_blocks(terms, w, obs_kf, obs_lm, K: int, L: int):
    """Scatter per-observation normal-equation blocks into dense block
    tensors: (Hcc [K,6,6], Hpp [L,3,3], Wlk [L,K,6,3], bc [K,6], bp [L,3]).
    Shared by local BA and the landmark-sharded distributed BA."""
    Jc = terms.J_pose                                  # [O, D, 6]
    Jp = terms.J_point                                 # [O, D, 3]
    JcW = Jc * w[:, None, None]
    JpW = Jp * w[:, None, None]

    Hcc_o = jnp.einsum("odi,odj->oij", JcW, Jc)        # [O, 6, 6]
    Hpp_o = jnp.einsum("odi,odj->oij", JpW, Jp)        # [O, 3, 3]
    Wo = jnp.einsum("odi,odj->oij", JcW, Jp)           # [O, 6, 3]
    bc_o = -jnp.einsum("odi,od->oi", JcW, terms.r)     # [O, 6]
    bp_o = -jnp.einsum("odi,od->oi", JpW, terms.r)     # [O, 3]

    Hcc = jnp.zeros((K, 6, 6)).at[obs_kf].add(Hcc_o)
    Hpp = jnp.zeros((L, 3, 3)).at[obs_lm].add(Hpp_o)
    Wlk = jnp.zeros((L, K, 6, 3)).at[obs_lm, obs_kf].add(Wo)
    bc = jnp.zeros((K, 6)).at[obs_kf].add(bc_o)
    bp = jnp.zeros((L, 3)).at[obs_lm].add(bp_o)
    return Hcc, Hpp, Wlk, bc, bp


def _gn_step(cam, problem: BAProblem, obs_w, lam, stereo, terms=None):
    """One damped GN step; returns (dxc [K,6], dxp [L,3]). Pass `terms`
    (the reprojection terms at the CURRENT problem) to reuse an existing
    evaluation — the Jacobian/residual gather is the per-iteration hot
    spot and callers already have it for the robust weights."""
    K = problem.kf_R.shape[0]
    L = problem.points.shape[0]
    if terms is None:
        terms = _ba_terms(cam, problem, stereo)
    w = obs_w * (terms.depth > 1e-3)
    Hcc, Hpp, Wlk, bc, bp = ba_blocks(terms, w, problem.obs_kf,
                                      problem.obs_lm, K, L)

    # LM damping (multiplicative on diagonals) + floor for empty blocks
    eye3 = jnp.eye(3)
    eye6 = jnp.eye(6)
    Hpp_d = Hpp + lam * Hpp * eye3 + 1e-6 * eye3
    Hcc_d = Hcc + lam * Hcc * eye6 + 1e-6 * eye6
    Hpp_inv = invert3x3(Hpp_d)                         # [L, 3, 3]

    # Schur: S = Hcc - sum_l W_l Hpp_l^-1 W_l^T  (MXU einsums)
    V = jnp.einsum("lkij,ljm->lkim", Wlk, Hpp_inv)     # [L, K, 6, 3]
    S_sub = jnp.einsum("lkim,lqnm->kiqn", V, Wlk)      # [K,6,K,6]
    S = jnp.zeros((K, 6, K, 6)).at[jnp.arange(K), :, jnp.arange(K), :].add(
        Hcc_d) - S_sub
    b_red = bc - jnp.einsum("lkim,lm->ki", V, bp)      # [K, 6]

    # Fixed/invalid poses: identity rows, zero rhs
    free = (problem.kf_valid & ~problem.kf_fixed)
    free_f = free.astype(S.dtype)
    mask2 = free_f[:, None, None, None] * free_f[None, None, :, None]
    S = S * mask2
    S = S.at[jnp.arange(K), :, jnp.arange(K), :].add(
        (1.0 - free_f)[:, None, None] * jnp.eye(6))
    b_red = b_red * free_f[:, None]

    dxc = jnp.linalg.solve(S.reshape(K * 6, K * 6),
                           b_red.reshape(K * 6)).reshape(K, 6)
    dxc = dxc * free_f[:, None]

    # Back-substitute landmarks: dxp = Hpp^-1 (bp - W^T dxc)
    rhs = bp - jnp.einsum("lkim,ki->lm", Wlk, dxc)
    dxp = jnp.einsum("lij,lj->li", Hpp_inv, rhs)
    dxp = dxp * problem.lm_valid[:, None]
    return dxc, dxp


def _apply(problem: BAProblem, dxc, dxp) -> BAProblem:
    R, t = jax.vmap(se3_retract)(problem.kf_R, problem.kf_t, dxc)
    return problem._replace(kf_R=R, kf_t=t, points=problem.points + dxp)


def _total_error(cam, problem, obs_w, chi2_th, stereo):
    terms = _ba_terms(cam, problem, stereo)
    delta = jnp.sqrt(jnp.asarray(chi2_th))
    return jnp.sum(robust_cost(terms.chi2, delta) * obs_w), terms


@functools.partial(jax.jit, static_argnames=("stereo", "iters1", "iters2"))
def bundle_adjust(cam: Intrinsics, problem: BAProblem, stereo: bool = False,
                  iters1: int = 5, iters2: int = 10,
                  chi2_mono: float = 5.991,
                  chi2_stereo: float = 7.815) -> BAResult:
    """Two-phase local BA with mid-run outlier cut (ref Optimizer.cc:615-668)."""
    chi2_th = chi2_stereo if stereo else chi2_mono
    delta = jnp.sqrt(jnp.asarray(chi2_th))  # stays traced under jit

    def phase(problem, obs_mask, iters, use_huber):
        def body(i, carry):
            problem, lam = carry
            # ONE terms evaluation serves the robust weights, the GN
            # normal equations AND the old-error side of the accept test
            # (it was recomputed 3x here — the gather+Jacobian eval is
            # the dominant per-iteration cost at local-BA sizes)
            terms = _ba_terms(cam, problem, stereo)
            w = problem.obs_inv_sigma2 * obs_mask
            if use_huber:
                w = w * huber_weight(terms.chi2, delta)
            dxc, dxp = _gn_step(cam, problem, w, lam, stereo, terms=terms)
            cand = _apply(problem, dxc, dxp)
            e_old = jnp.sum(robust_cost(terms.chi2, delta) * w)
            e_new, _ = _total_error(cam, cand, w, chi2_th, stereo)
            good = e_new < e_old
            problem = jax.tree_util.tree_map(
                lambda a, b: jnp.where(good, b, a) if a.dtype != bool else a,
                problem, cand)
            lam = jnp.where(good, lam * 0.5, lam * 4.0)
            return problem, lam

        problem, _ = jax.lax.fori_loop(0, iters, body,
                                       (problem, jnp.float32(1e-4)))
        return problem

    obs_mask = problem.obs_valid.astype(jnp.float32)
    problem = phase(problem, obs_mask, iters1, True)

    # outlier cut (ref :615-631): chi2 > th or negative depth
    terms = _ba_terms(cam, problem, stereo)
    inlier = problem.obs_valid & (terms.chi2 <= chi2_th) & (terms.depth > 0)
    obs_mask = inlier.astype(jnp.float32)
    problem = phase(problem, obs_mask, iters2, True)

    terms = _ba_terms(cam, problem, stereo)
    inlier = problem.obs_valid & (terms.chi2 <= chi2_th) & (terms.depth > 0)
    R = jax.vmap(orthonormalize)(problem.kf_R)
    total = jnp.sum(terms.chi2 * inlier)
    return BAResult(R, problem.kf_t, problem.points, inlier, total)
