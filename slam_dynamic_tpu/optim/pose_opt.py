"""Motion-only pose optimization (the per-frame "hot" optimizer).

TPU-native equivalent of Optimizer::PoseOptimization (/root/reference/src/
Optimizer.cc:239-452): 4 rounds x 10 Levenberg-Marquardt iterations on a
single SE3 pose with all landmark observations as unary edges; between
rounds, edges are relabeled inlier/outlier by a chi2 gate (5.991 mono /
7.815 stereo, ref :370-443) and the Huber robustifier is dropped after
round 2 (ref :437: setRobustKernel(0)).

Everything is fixed-shape: the observation set is padded with a validity
mask; rounds and iterations are static loops under jit.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..utils.camera import Intrinsics
from ..utils.se3 import se3_retract, orthonormalize
from .residuals import reprojection_terms, huber_weight, robust_cost


class PoseOptResult(NamedTuple):
    R: jnp.ndarray        # [3,3] optimized pose (world->camera)
    t: jnp.ndarray        # [3]
    inliers: jnp.ndarray  # [N] bool final inlier labels
    n_inliers: jnp.ndarray  # int32
    chi2: jnp.ndarray     # [N] final chi2 per observation


def _normal_equations(terms, w):
    """Accumulate H (6x6) and b (6) from weighted terms."""
    JW = terms.J_pose * w[:, None, None]              # [N, D, 6]
    H = jnp.einsum("ndi,ndj->ij", JW, terms.J_pose)
    b = -jnp.einsum("ndi,nd->i", JW, terms.r)
    return H, b


@functools.partial(jax.jit, static_argnames=("stereo", "rounds", "iters"))
def optimize_pose(cam: Intrinsics, R0, t0, xw, obs, inv_sigma2, valid,
                  stereo: bool = False, rounds: int = 4, iters: int = 10,
                  chi2_mono: float = 5.991, chi2_stereo: float = 7.815,
                  ur_weight=None):
    # chi2_mono/chi2_stereo arrive as traced jit args; keep them as arrays.
    """LM pose refinement with chi2 relabeling between rounds.

    xw [N,3], obs [N,2|3], inv_sigma2 [N], valid [N] bool.
    ur_weight: optional [N] mask zeroing the u_right residual row of
    observations without stereo depth (mixed mono/stereo problems).
    Returns PoseOptResult. Slots with valid=False never contribute.
    """
    chi2_th = chi2_stereo if stereo else chi2_mono
    delta = jnp.sqrt(chi2_th)

    def lm_round(R, t, inlier_mask, use_huber):
        def body(i, carry):
            R, t, lam = carry
            terms = reprojection_terms(cam, R, t, xw, obs, inv_sigma2, stereo, ur_weight)
            w = inv_sigma2 * inlier_mask
            # depth gate: points behind the camera cannot constrain
            w = w * (terms.depth > 1e-3)
            if use_huber:
                w = w * huber_weight(terms.chi2, delta)
            H, b = _normal_equations(terms, w)
            Hd = H + lam * jnp.diag(jnp.diag(H)) + 1e-9 * jnp.eye(6)
            dx = jnp.linalg.solve(Hd, b)
            R_new, t_new = se3_retract(R, t, dx)
            # accept step if total robust error decreased
            terms_new = reprojection_terms(cam, R_new, t_new, xw, obs,
                                           inv_sigma2, stereo, ur_weight)
            mask_w = inlier_mask * (inv_sigma2 > 0)
            err_old = jnp.sum(robust_cost(terms.chi2, delta) * mask_w)
            err_new = jnp.sum(robust_cost(terms_new.chi2, delta) * mask_w)
            good = err_new < err_old
            R = jnp.where(good, R_new, R)
            t = jnp.where(good, t_new, t)
            lam = jnp.where(good, lam * 0.5, lam * 4.0)
            return R, t, lam

        R, t, _ = jax.lax.fori_loop(0, iters, body,
                                    (R, t, jnp.asarray(1e-3, R.dtype)))
        return R, t

    R, t = R0, t0
    inlier = valid.astype(jnp.float32)
    for rnd in range(rounds):
        use_huber = rnd < 2
        R, t = lm_round(R, t, inlier, use_huber)
        terms = reprojection_terms(cam, R, t, xw, obs, inv_sigma2, stereo, ur_weight)
        ok = (terms.chi2 <= chi2_th) & (terms.depth > 1e-3) & valid
        inlier = ok.astype(jnp.float32)

    R = orthonormalize(R)
    terms = reprojection_terms(cam, R, t, xw, obs, inv_sigma2, stereo, ur_weight)
    inl = inlier.astype(bool)
    return PoseOptResult(R, t, inl, inl.sum().astype(jnp.int32), terms.chi2)
