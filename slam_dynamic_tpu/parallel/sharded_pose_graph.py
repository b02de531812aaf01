"""Distributed essential-graph optimization: edge-sharded GN over psum.

Shards the trajectory/pose-graph axis (SURVEY §5.7): the edge set of
OptimizeEssentialGraph (/root/reference/src/Optimizer.cc:781-1045) — a few
edges per keyframe, O(K) total — is partitioned over the mesh. Each device
computes residuals + 7x7 Jacobian blocks for ITS edges and assembles a
partial dense Hessian/rhs; ONE psum forms the global (7K)^2 system on every
device; the replicated dense solve and the damped accept/reject mirror the
single-device optimize_pose_graph (optim/pose_graph.py) exactly, so results
match to solver tolerance.

Communication per iteration: (7K)^2 + 7K floats — independent of edge
count, same shape as the sharded-BA reduction (parallel/sharded_ba.py).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..optim.pose_graph import PoseGraphProblem, edge_residual
from ..utils import sim3 as s3


def make_sharded_pose_graph(mesh: Mesh, K: int, E: int, iters: int = 20,
                            fix_scale: bool = True, axis: str = "lm"):
    """Build the jitted edge-sharded essential-graph solver.

    E must divide the mesh axis size; pad with e_valid=False edges.
    Returns fn(problem: PoseGraphProblem) -> (s, R, t).
    """
    n_shards = mesh.shape[axis]
    assert E % n_shards == 0, (E, n_shards)

    def res_with_perturb(xi_i, xi_j, g_i, g_j, meas):
        di = s3.sim3_exp(xi_i)
        dj = s3.sim3_exp(xi_j)
        gi = s3.sim3_compose(*di, *g_i)
        gj = s3.sim3_compose(*dj, *g_j)
        return edge_residual(gi, gj, meas)

    jac_i = jax.jacfwd(res_with_perturb, argnums=0)
    jac_j = jax.jacfwd(res_with_perturb, argnums=1)
    z7 = jnp.zeros(7)

    def shard_body(s0, R0, t0, fixed, valid, e_i, e_j, e_s, e_R, e_t,
                   e_valid, e_w):
        # e_* are this shard's local edge slice; vertices are replicated

        def build_and_solve(s, R, t, lam):
            g_i = (s[e_i], R[e_i], t[e_i])
            g_j = (s[e_j], R[e_j], t[e_j])
            meas = (e_s, e_R, e_t)
            r = jax.vmap(edge_residual)(g_i, g_j, meas)
            Ji = jax.vmap(lambda a, b, m: jac_i(z7, z7, a, b, m))(
                g_i, g_j, meas)
            Jj = jax.vmap(lambda a, b, m: jac_j(z7, z7, a, b, m))(
                g_i, g_j, meas)
            w = e_valid * e_w
            JiW = Ji * w[:, None, None]
            JjW = Jj * w[:, None, None]
            Hii = jnp.einsum("edi,edj->eij", JiW, Ji)
            Hjj = jnp.einsum("edi,edj->eij", JjW, Jj)
            Hij = jnp.einsum("edi,edj->eij", JiW, Jj)
            bi = -jnp.einsum("edi,ed->ei", JiW, r)
            bj = -jnp.einsum("edi,ed->ei", JjW, r)
            H = jnp.zeros((K, 7, K, 7))
            H = H.at[e_i, :, e_i, :].add(Hii)
            H = H.at[e_j, :, e_j, :].add(Hjj)
            H = H.at[e_i, :, e_j, :].add(Hij)
            H = H.at[e_j, :, e_i, :].add(jnp.swapaxes(Hij, -1, -2))
            b = jnp.zeros((K, 7)).at[e_i].add(bi).at[e_j].add(bj)
            err_local = jnp.sum((r ** 2).sum(-1) * w)
            # the ONLY communication: global H, b, err
            H, b, err = jax.lax.psum((H, b, err_local), axis)

            free = (valid & ~fixed).astype(H.dtype)
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
            return dx * free[:, None], err

        def apply(s, R, t, dx):
            ds, dR, dt = jax.vmap(s3.sim3_exp)(dx)
            return jax.vmap(s3.sim3_compose)(ds, dR, dt, s, R, t)

        def body(i, carry):
            s, R, t, lam = carry
            dx, e_old = build_and_solve(s, R, t, lam)
            s2, R2, t2 = apply(s, R, t, dx)
            g_i = (s2[e_i], R2[e_i], t2[e_i])
            g_j = (s2[e_j], R2[e_j], t2[e_j])
            r2 = jax.vmap(edge_residual)(g_i, g_j, (e_s, e_R, e_t))
            e_new = jax.lax.psum(
                jnp.sum((r2 ** 2).sum(-1) * e_valid * e_w), axis)
            good = e_new < e_old
            s = jnp.where(good, s2, s)
            R = jnp.where(good, R2, R)
            t = jnp.where(good, t2, t)
            lam = jnp.where(good, lam * 0.5, lam * 4.0)
            return s, R, t, lam

        s, R, t, _ = jax.lax.fori_loop(
            0, iters, body, (s0, R0, t0, jnp.float32(1e-4)))
        return s, R, t

    rep = P()
    sh = P(axis)
    fn = shard_map(
        shard_body, mesh=mesh,
        in_specs=(rep, rep, rep, rep, rep, sh, sh, sh, sh, sh, sh, sh),
        out_specs=(rep, rep, rep), check_vma=False)

    @jax.jit
    def run(problem: PoseGraphProblem):
        return fn(problem.s, problem.R, problem.t, problem.fixed,
                  problem.valid, problem.e_i, problem.e_j, problem.e_s,
                  problem.e_R, problem.e_t, problem.e_valid,
                  problem.e_weight)

    return run
