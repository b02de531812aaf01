"""Essential-graph (pose-graph) optimization over Sim3 keyframe poses.

Equivalent of Optimizer::OptimizeEssentialGraph (/root/reference/src/
Optimizer.cc:781-1045) and g2o's EdgeSim3 machinery: vertices are
world->camera Sim3 poses; edges are (spanning tree + strong covisibility +
loop) with relative-Sim3 measurements; residual of edge (i, j) is
log_sim3(S_ji o S_i o S_j^{-1}) exactly as g2o. Per-edge 7x7 Jacobian
blocks come from forward-mode autodiff of the residual wrt left twists on
both endpoints; the dense 7K x 7K system is solved on the MXU (K<=512 ->
3.6k x 3.6k, trivial for one chip).
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..utils import sim3 as s3


class PoseGraphProblem(NamedTuple):
    # vertices
    s: jnp.ndarray          # [K] scale of world->camera Sim3
    R: jnp.ndarray          # [K, 3, 3]
    t: jnp.ndarray          # [K, 3]
    fixed: jnp.ndarray      # [K] bool
    valid: jnp.ndarray      # [K] bool
    # edges (padded)
    e_i: jnp.ndarray        # [E] int32
    e_j: jnp.ndarray        # [E] int32
    e_s: jnp.ndarray        # [E] measured S_ji scale
    e_R: jnp.ndarray        # [E, 3, 3]
    e_t: jnp.ndarray        # [E, 3]
    e_valid: jnp.ndarray    # [E] bool
    e_weight: jnp.ndarray   # [E] float32 information scale


def edge_residual(g_i, g_j, meas):
    """r = log_sim3(S_ji o S_i o S_j^-1), [7]."""
    si, Ri, ti = g_i
    sj, Rj, tj = g_j
    sji, Rji, tji = meas
    inv_j = s3.sim3_inverse(sj, Rj, tj)
    rel = s3.sim3_compose(si, Ri, ti, *inv_j)
    err = s3.sim3_compose(sji, Rji, tji, *rel)
    return s3.sim3_log(*err)


@functools.partial(jax.jit, static_argnames=("iters", "fix_scale"))
def optimize_pose_graph(problem: PoseGraphProblem, iters: int = 20,
                        fix_scale: bool = True):
    """Damped GN on the essential graph. Returns (s, R, t) per keyframe."""
    K = problem.s.shape[0]

    def res_with_perturb(xi_i, xi_j, g_i, g_j, meas):
        di = s3.sim3_exp(xi_i)
        dj = s3.sim3_exp(xi_j)
        gi = s3.sim3_compose(*di, *g_i)
        gj = s3.sim3_compose(*dj, *g_j)
        return edge_residual(gi, gj, meas)

    jac_i = jax.jacfwd(res_with_perturb, argnums=0)
    jac_j = jax.jacfwd(res_with_perturb, argnums=1)
    z7 = jnp.zeros(7)

    def build_and_solve(s, R, t, lam):
        g_i = (s[problem.e_i], R[problem.e_i], t[problem.e_i])
        g_j = (s[problem.e_j], R[problem.e_j], t[problem.e_j])
        meas = (problem.e_s, problem.e_R, problem.e_t)
        r = jax.vmap(edge_residual)(g_i, g_j, meas)
        Ji = jax.vmap(lambda a, b, m: jac_i(z7, z7, a, b, m))(g_i, g_j, meas)
        Jj = jax.vmap(lambda a, b, m: jac_j(z7, z7, a, b, m))(g_i, g_j, meas)
        w = problem.e_valid * problem.e_weight
        # assemble dense H [K,7,K,7], b [K,7]
        JiW = Ji * w[:, None, None]
        JjW = Jj * w[:, None, None]
        Hii = jnp.einsum("edi,edj->eij", JiW, Ji)
        Hjj = jnp.einsum("edi,edj->eij", JjW, Jj)
        Hij = jnp.einsum("edi,edj->eij", JiW, Jj)
        bi = -jnp.einsum("edi,ed->ei", JiW, r)
        bj = -jnp.einsum("edi,ed->ei", JjW, r)
        H = jnp.zeros((K, 7, K, 7))
        H = H.at[problem.e_i, :, problem.e_i, :].add(Hii)
        H = H.at[problem.e_j, :, problem.e_j, :].add(Hjj)
        H = H.at[problem.e_i, :, problem.e_j, :].add(Hij)
        H = H.at[problem.e_j, :, problem.e_i, :].add(
            jnp.swapaxes(Hij, -1, -2))
        b = jnp.zeros((K, 7)).at[problem.e_i].add(bi).at[problem.e_j].add(bj)

        free = (problem.valid & ~problem.fixed).astype(H.dtype)
        H = H * (free[:, None, None, None] * free[None, None, :, None])
        diag = jnp.arange(K)
        damp = lam * H[diag, :, diag, :] * jnp.eye(7)
        H = H.at[diag, :, diag, :].add(
            damp + (1.0 - free)[:, None, None] * jnp.eye(7)
            + 1e-6 * jnp.eye(7))
        b = b * free[:, None]
        dx = jnp.linalg.solve(H.reshape(K * 7, K * 7),
                              b.reshape(K * 7)).reshape(K, 7)
        if fix_scale:
            dx = dx.at[:, 6].set(0.0)
        return dx * free[:, None], jnp.sum((r ** 2).sum(-1) * w)

    def apply(s, R, t, dx):
        ds, dR, dt = jax.vmap(s3.sim3_exp)(dx)
        return jax.vmap(s3.sim3_compose)(ds, dR, dt, s, R, t)

    def body(i, carry):
        s, R, t, lam = carry
        dx, e_old = build_and_solve(s, R, t, lam)
        s2, R2, t2 = apply(s, R, t, dx)
        # error after
        g_i = (s2[problem.e_i], R2[problem.e_i], t2[problem.e_i])
        g_j = (s2[problem.e_j], R2[problem.e_j], t2[problem.e_j])
        r2 = jax.vmap(edge_residual)(g_i, g_j,
                                     (problem.e_s, problem.e_R, problem.e_t))
        e_new = jnp.sum((r2 ** 2).sum(-1) * problem.e_valid
                        * problem.e_weight)
        good = e_new < e_old
        s = jnp.where(good, s2, s)
        R = jnp.where(good, R2, R)
        t = jnp.where(good, t2, t)
        lam = jnp.where(good, lam * 0.5, lam * 4.0)
        return s, R, t, lam

    s, R, t, _ = jax.lax.fori_loop(
        0, iters, body,
        (problem.s, problem.R, problem.t, jnp.float32(1e-4)))
    return s, R, t
