"""Relative Sim3 optimization between a keyframe pair (loop verification).

Equivalent of Optimizer::OptimizeSim3 (/root/reference/src/
Optimizer.cc:1046-1244): bidirectional reprojection edges
(EdgeSim3ProjectXYZ / EdgeInverseSim3ProjectXYZ) on a single Sim3 vertex,
Huber kernel, outlier removal mid-run. Jacobians come from forward-mode
autodiff of the residual wrt a left-multiplicative 7-dof twist — no
hand-derived Sim3 chain rules to get wrong.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..utils.camera import Intrinsics, project
from ..utils import sim3 as s3
from .residuals import huber_weight, robust_cost


class Sim3OptResult(NamedTuple):
    s: jnp.ndarray
    R: jnp.ndarray
    t: jnp.ndarray
    inliers: jnp.ndarray
    n_inliers: jnp.ndarray


def _residuals(cam1, cam2, g, x1, x2, uv1, uv2):
    """[N, 4] stacked bidirectional reprojection residuals."""
    s, R, t = g
    x2p = s * (x1 @ R.T) + t
    r2 = project(cam2, x2p) - uv2
    si, Ri, ti = s3.sim3_inverse(s, R, t)
    x1p = si * (x2 @ Ri.T) + ti
    r1 = project(cam1, x1p) - uv1
    return jnp.concatenate([r2, r1], axis=-1), x2p[:, 2], x1p[:, 2]


@functools.partial(jax.jit, static_argnames=("iters", "fix_scale"))
def optimize_sim3(cam1: Intrinsics, cam2: Intrinsics, s0, R0, t0, x1, x2,
                  uv1, uv2, inv_sigma2_1, inv_sigma2_2, valid,
                  iters: int = 10, chi2_th: float = 9.21,
                  fix_scale: bool = False) -> Sim3OptResult:
    """Refine T21=(s0,R0,t0) on matched pairs. chi2 9.21 (2dof 99%) as the
    reference (Optimizer.cc:1099 th2 = 10*...; we use the standard gate)."""

    delta = jnp.sqrt(jnp.asarray(chi2_th))

    def res_of_xi(xi, g, x1, x2, uv1, uv2):
        ds, dR, dt = s3.sim3_exp(xi)
        if fix_scale:
            ds = jnp.ones_like(ds)
        g2 = s3.sim3_compose(ds, dR, dt, *g)
        r, z2, z1 = _residuals(cam1, cam2, g2, x1, x2, uv1, uv2)
        return r

    def step(carry, _):
        g, lam, inlier = carry
        r, z2, z1 = _residuals(cam1, cam2, g, x1, x2, uv1, uv2)
        chi2 = (r[:, :2] ** 2).sum(-1) * inv_sigma2_2 + \
               (r[:, 2:] ** 2).sum(-1) * inv_sigma2_1
        w = inlier * huber_weight(chi2, delta) * (z1 > 0) * (z2 > 0)
        # per-pair jacobian wrt 7-dof twist at identity
        J = jax.jacfwd(res_of_xi)(jnp.zeros(7), g, x1, x2, uv1, uv2)
        # J: [N, 4, 7]
        iv = jnp.concatenate([
            jnp.stack([inv_sigma2_2, inv_sigma2_2], -1),
            jnp.stack([inv_sigma2_1, inv_sigma2_1], -1)], -1)  # [N,4]
        Jw = J * (w[:, None, None] * iv[:, :, None])
        H = jnp.einsum("ndi,ndj->ij", Jw, J) + 1e-8 * jnp.eye(7)
        b = -jnp.einsum("ndi,nd->i", Jw, r)
        H = H + lam * jnp.diag(jnp.diag(H))
        xi = jnp.linalg.solve(H, b)
        if fix_scale:
            xi = xi.at[6].set(0.0)
        ds, dR, dt = s3.sim3_exp(xi)
        g_new = s3.sim3_compose(ds, dR, dt, *g)
        r_new, _, _ = _residuals(cam1, cam2, g_new, x1, x2, uv1, uv2)
        e_old = jnp.sum(robust_cost(chi2, delta) * inlier)
        chi2_new = (r_new[:, :2] ** 2).sum(-1) * inv_sigma2_2 + \
                   (r_new[:, 2:] ** 2).sum(-1) * inv_sigma2_1
        e_new = jnp.sum(robust_cost(chi2_new, delta) * inlier)
        good = e_new < e_old
        g = jax.tree_util.tree_map(
            lambda a, b2: jnp.where(good, b2, a), g, g_new)
        lam = jnp.where(good, lam * 0.5, lam * 4.0)
        return (g, lam, inlier), None

    g0 = (jnp.asarray(s0, jnp.float32), R0, t0)
    inlier0 = valid.astype(jnp.float32)
    (g, _, _), _ = jax.lax.scan(step, (g0, jnp.float32(1e-3), inlier0),
                                None, length=iters // 2)
    # outlier cut then continue (ref :1180-1210)
    r, z2, z1 = _residuals(cam1, cam2, g, x1, x2, uv1, uv2)
    chi2 = (r[:, :2] ** 2).sum(-1) * inv_sigma2_2 + \
           (r[:, 2:] ** 2).sum(-1) * inv_sigma2_1
    inlier = valid & (chi2 <= chi2_th) & (z1 > 0) & (z2 > 0)
    (g, _, _), _ = jax.lax.scan(step, (g, jnp.float32(1e-3),
                                       inlier.astype(jnp.float32)),
                                None, length=iters - iters // 2)
    r, z2, z1 = _residuals(cam1, cam2, g, x1, x2, uv1, uv2)
    chi2 = (r[:, :2] ** 2).sum(-1) * inv_sigma2_2 + \
           (r[:, 2:] ** 2).sum(-1) * inv_sigma2_1
    inlier = valid & (chi2 <= chi2_th) & (z1 > 0) & (z2 > 0)
    return Sim3OptResult(g[0], g[1], g[2], inlier,
                         inlier.sum().astype(jnp.int32))
