"""Reprojection residuals + analytic Jacobians, batched over observations.

TPU-native equivalent of g2o's edge types (/root/reference/Thirdparty/g2o/
g2o/types/types_six_dof_expmap.h: EdgeSE3ProjectXYZ :80,
EdgeStereoSE3ProjectXYZ :112, *OnlyPose :143,:174): instead of per-edge
virtual calls, residuals and Jacobians for all observations are computed in
one vmapped pass. Pose parameterization is the left-multiplicative twist
[rho, phi] (update T <- exp(xi) T), matching se3.se3_retract.

Residual convention: r = project(x_cam) - observation, so the normal
equations are H = J^T W J, b = -J^T W r and the update solves H dx = b.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..utils.camera import Intrinsics
from ..utils.se3 import hat


class ReprojTerms(NamedTuple):
    r: jnp.ndarray       # [N, D] residuals (D=2 mono, 3 stereo)
    J_pose: jnp.ndarray  # [N, D, 6] d r / d twist
    J_point: jnp.ndarray  # [N, D, 3] d r / d world point
    chi2: jnp.ndarray    # [N] weighted squared error (before robustifier)
    depth: jnp.ndarray   # [N] camera-frame depth


def _proj_jacobian_xc(cam: Intrinsics, xc, stereo: bool):
    """d project / d x_cam: [N, D, 3]."""
    x, y, z = xc[..., 0], xc[..., 1], xc[..., 2]
    zi = 1.0 / jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
    zi2 = zi * zi
    fx, fy = cam.fx, cam.fy
    zero = jnp.zeros_like(x)
    row_u = jnp.stack([fx * zi, zero, -fx * x * zi2], axis=-1)
    row_v = jnp.stack([zero, fy * zi, -fy * y * zi2], axis=-1)
    if not stereo:
        return jnp.stack([row_u, row_v], axis=-2)
    row_ur = jnp.stack(
        [fx * zi, zero, -fx * x * zi2 + cam.bf * zi2], axis=-1)
    return jnp.stack([row_u, row_v, row_ur], axis=-2)


def reprojection_terms(cam: Intrinsics, R_cw, t_cw, xw, obs, inv_sigma2,
                       stereo: bool, ur_weight=None) -> ReprojTerms:
    """Batched residual/Jacobian evaluation.

    R_cw: [3,3] or [N,3,3]; t_cw: [3] or [N,3]; xw: [N,3] world points;
    obs: [N,2] (mono) or [N,3] (u, v, u_right) (stereo);
    inv_sigma2: [N] information scale (1/sigma^2 per pyramid level);
    ur_weight: optional [N] in {0,1} — 0 turns a stereo observation into a
    mono one by zeroing the u_right residual row (the reference mixes
    EdgeSE3ProjectXYZ and EdgeStereoSE3ProjectXYZ in one problem; here the
    mix is a row mask).
    """
    xc = jnp.einsum("...ij,...j->...i", R_cw, xw) + t_cw
    z = xc[..., 2]
    zs = jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
    u = cam.fx * xc[..., 0] / zs + cam.cx
    v = cam.fy * xc[..., 1] / zs + cam.cy
    if stereo:
        ur = u - cam.bf / zs
        pred = jnp.stack([u, v, ur], axis=-1)
    else:
        pred = jnp.stack([u, v], axis=-1)
    r = pred - obs
    if stereo and ur_weight is not None:
        r = r.at[..., 2].multiply(ur_weight)

    Jxc = _proj_jacobian_xc(cam, xc, stereo)          # [N, D, 3]
    if stereo and ur_weight is not None:
        Jxc = Jxc.at[..., 2, :].multiply(ur_weight[..., None])
    # d xc / d twist = [I | -hat(xc)]  (left-multiplicative, [rho, phi])
    N = xc.shape[0]
    I = jnp.broadcast_to(jnp.eye(3, dtype=xc.dtype), (N, 3, 3))
    J_xi = jnp.concatenate([I, -hat(xc)], axis=-1)    # [N, 3, 6]
    J_pose = Jxc @ J_xi                               # [N, D, 6]
    Rb = jnp.broadcast_to(R_cw, (N, 3, 3))
    J_point = Jxc @ Rb                                # [N, D, 3]

    chi2 = jnp.sum(r * r, axis=-1) * inv_sigma2
    return ReprojTerms(r, J_pose, J_point, chi2, z)


def robust_cost(chi2, delta):
    """Huber rho(chi2): quadratic below delta^2, linear above — monotone and
    UNBOUNDED, so accept/reject comparisons stay informative even when every
    residual is far outside the inlier gate (a hard clip min(chi2, c)
    saturates and freezes LM)."""
    d2 = delta * delta
    e = jnp.sqrt(jnp.maximum(chi2, 1e-12))
    return jnp.where(chi2 <= d2, chi2, 2.0 * delta * e - d2)


def huber_weight(chi2, delta: float):
    """IRLS weight of the Huber robustifier at squared error chi2.

    g2o's RobustKernelHuber (robust_kernel_impl.cpp): for e2 <= delta^2 the
    weight is 1; above, rho'(e2) = delta / e. Applied multiplicatively to
    the information of each term.
    """
    e = jnp.sqrt(jnp.maximum(chi2, 1e-12))
    return jnp.where(chi2 <= delta * delta, 1.0, delta / e)
