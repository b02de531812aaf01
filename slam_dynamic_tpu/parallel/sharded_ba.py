"""Distributed bundle adjustment: landmark-sharded Schur reduction over
XLA collectives.

This is the multi-chip "training step" of the framework (SURVEY §2.4/§5.7):
the reference has no distributed anything — its global BA is a single g2o
solve (Optimizer::GlobalBundleAdjustemnt /root/reference/src/
Optimizer.cc:41-237). Here the landmark axis (the large axis: 10^4-10^5
landmarks vs ≤10^3 keyframes) is sharded over the device mesh:

  - each device owns a contiguous landmark block and ALL observations of
    those landmarks (observations are partitioned by landmark owner, so
    Hpp, W and the landmark back-substitution are fully local);
  - poses are replicated (6K floats — tiny); each device computes its
    partial reduced camera system S_d = Hcc_d - W_d Hpp_d^-1 W_d^T and
    partial rhs; ONE psum over the "lm" axis forms the global reduced
    system on every device (the only communication per iteration:
    (6K)^2 + 6K floats);
  - the replicated dense solve yields dxc; dxp is computed locally.

This is the SLAM analog of ZeRO/sequence-parallel reductions: compute
scales with L/D, communication is O(K^2) independent of L.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..utils.camera import Intrinsics
from ..utils.se3 import se3_retract
from ..optim.residuals import reprojection_terms, huber_weight, robust_cost
from ..optim.local_ba import ba_blocks, invert3x3


class ShardedBAProblem(NamedTuple):
    """Global BA problem with landmark-sharded layout.

    Shapes (L = total landmark capacity, must divide the mesh size;
    O = total obs capacity, partitioned so that obs of landmark l sit in
    the same shard as l; obs_lm holds GLOBAL landmark indices).
    """

    kf_R: jnp.ndarray        # [K, 3, 3] replicated
    kf_t: jnp.ndarray        # [K, 3]
    kf_fixed: jnp.ndarray    # [K] bool
    kf_valid: jnp.ndarray    # [K] bool
    points: jnp.ndarray      # [L, 3] sharded along axis 0
    lm_valid: jnp.ndarray    # [L]
    obs_kf: jnp.ndarray      # [O] int32
    obs_lm: jnp.ndarray      # [O] int32 (global ids, aligned with shard)
    obs_uv: jnp.ndarray      # [O, 2|3]
    obs_inv_sigma2: jnp.ndarray  # [O]
    obs_valid: jnp.ndarray   # [O] bool
    obs_ur_weight: jnp.ndarray   # [O]


def _gn_step_shard(cam, stereo, chi2_th, axis,
                   kf_R, kf_t, kf_fixed, kf_valid,
                   pts, lmv, obs_kf, obs_lm_local, obs_uv, obs_w2, obs_urw,
                   lam):
    """Body run per shard under shard_map. obs_lm_local indexes the local
    landmark block. Returns (dxc replicated, dxp local, err before)."""
    K = kf_R.shape[0]
    Lloc = pts.shape[0]
    R = kf_R[obs_kf]
    t = kf_t[obs_kf]
    x = pts[obs_lm_local]
    terms = reprojection_terms(cam, R, t, x, obs_uv, obs_w2,
                               stereo, obs_urw if stereo else None)
    w = obs_w2 * (terms.depth > 1e-3)
    w = w * huber_weight(terms.chi2, jnp.sqrt(chi2_th))

    Hcc, Hpp, Wlk, bc, bp = ba_blocks(terms, w, obs_kf, obs_lm_local, K,
                                      Lloc)
    eye3 = jnp.eye(3)
    eye6 = jnp.eye(6)
    Hpp_d = Hpp + lam * Hpp * eye3 + 1e-6 * eye3
    Hpp_inv = invert3x3(Hpp_d)
    V = jnp.einsum("lkij,ljm->lkim", Wlk, Hpp_inv)
    S_part = jnp.einsum("lkim,lqnm->kiqn", V, Wlk)
    b_part = jnp.einsum("lkim,lm->ki", V, bp)

    # global reduction: ONE psum for (S, b, Hcc, bc, err)
    # error metric: robust cost * obs weight * in-front mask — must match
    # err_new in the accept/reject loop EXACTLY (an IRLS-weighted err here
    # vs unweighted there under-counts outliers and rejects every step)
    err_local = jnp.sum(robust_cost(terms.chi2, jnp.sqrt(chi2_th))
                        * obs_w2 * (terms.depth > 1e-3))
    S_sub, b_sub, Hcc_g, bc_g, err = jax.lax.psum(
        (S_part, b_part, Hcc, bc, err_local), axis)

    Hcc_d = Hcc_g + lam * Hcc_g * eye6 + 1e-6 * eye6
    S = jnp.zeros((K, 6, K, 6)).at[jnp.arange(K), :, jnp.arange(K), :].add(
        Hcc_d) - S_sub
    b_red = bc_g - b_sub

    free = (kf_valid & ~kf_fixed)
    free_f = free.astype(S.dtype)
    S = S * (free_f[:, None, None, None] * free_f[None, None, :, None])
    S = S.at[jnp.arange(K), :, jnp.arange(K), :].add(
        (1.0 - free_f)[:, None, None] * jnp.eye(6))
    b_red = b_red * free_f[:, None]
    # Jacobi-preconditioned solve: long keyframe chains make S badly
    # conditioned (kappa >~ 1e6) and a raw float32 solve produces garbage
    # steps that the accept/reject loop then rejects forever
    Sm = S.reshape(K * 6, K * 6)
    d = jax.lax.rsqrt(jnp.clip(jnp.diagonal(Sm), 1e-12, None))
    dxc = (d * jnp.linalg.solve(d[:, None] * Sm * d[None, :],
                                d * b_red.reshape(K * 6))).reshape(K, 6)
    dxc = dxc * free_f[:, None]

    rhs = bp - jnp.einsum("lkim,ki->lm", Wlk, dxc)
    dxp = jnp.einsum("lij,lj->li", Hpp_inv, rhs) * lmv[:, None]
    return dxc, dxp, err


def make_sharded_ba(mesh: Mesh, cam: Intrinsics, K: int, L: int, O: int,
                    stereo: bool = True, iters: int = 10,
                    chi2: float = 7.815, axis: str = "lm"):
    """Build the jitted distributed-BA step for the given mesh/capacities.

    Returns fn(problem: ShardedBAProblem) -> (kf_R, kf_t, points) running
    `iters` damped GN iterations with accept/reject on the psum'd error.
    """
    n_shards = mesh.shape[axis]
    assert L % n_shards == 0 and O % n_shards == 0

    def shard_body(kf_R, kf_t, kf_fixed, kf_valid, pts, lmv, obs_kf,
                   obs_lm, obs_uv, obs_is2, obs_valid, obs_urw):
        # global lm id -> local block index
        shard_id = jax.lax.axis_index(axis)
        base = shard_id * (L // n_shards)
        obs_lm_local = jnp.clip(obs_lm - base, 0, L // n_shards - 1)
        w2 = obs_is2 * obs_valid

        def body(i, carry):
            kR, kt, p, lam, _ = carry
            dxc, dxp, err = _gn_step_shard(
                cam, stereo, jnp.float32(chi2), axis, kR, kt, kf_fixed,
                kf_valid, p, lmv, obs_kf, obs_lm_local, obs_uv, w2, obs_urw,
                lam)
            kR2, kt2 = jax.vmap(se3_retract)(kR, kt, dxc)
            p2 = p + dxp
            # error after (for accept/reject)
            R = kR2[obs_kf]
            t = kt2[obs_kf]
            x = p2[obs_lm_local]
            terms = reprojection_terms(cam, R, t, x, obs_uv, w2, stereo,
                                       obs_urw if stereo else None)
            err_new = jax.lax.psum(
                jnp.sum(robust_cost(terms.chi2, jnp.sqrt(jnp.float32(chi2)))
                        * w2 * (terms.depth > 1e-3)), axis)
            good = err_new < err
            kR = jnp.where(good, kR2, kR)
            kt = jnp.where(good, kt2, kt)
            p = jnp.where(good, p2, p)
            lam = jnp.where(good, lam * 0.5, lam * 4.0)
            return kR, kt, p, lam, err_new

        kR, kt, p, _, _ = jax.lax.fori_loop(
            0, iters, body,
            (kf_R, kf_t, pts, jnp.float32(1e-4), jnp.float32(jnp.inf)))
        return kR, kt, p

    rep = P()
    shard0 = P(axis)
    fn = shard_map(
        shard_body, mesh=mesh,
        in_specs=(rep, rep, rep, rep, shard0, shard0, shard0, shard0,
                  shard0, shard0, shard0, shard0),
        out_specs=(rep, rep, shard0), check_vma=False)

    @jax.jit
    def run(problem: ShardedBAProblem):
        return fn(problem.kf_R, problem.kf_t, problem.kf_fixed,
                  problem.kf_valid, problem.points, problem.lm_valid,
                  problem.obs_kf, problem.obs_lm, problem.obs_uv,
                  problem.obs_inv_sigma2, problem.obs_valid,
                  problem.obs_ur_weight)

    return run


def partition_obs_by_landmark(obs_lm, obs_valid, n_shards: int, L: int,
                              O: int):
    """Host helper: compute a permutation placing each VALID observation in
    the shard that owns its landmark; invalid/padding observations fill the
    remaining holes (their weight is zero, placement is irrelevant).

    Returns (perm [O], valid_out [O], ok): apply perm to every obs array,
    then use valid_out (already permuted) as obs_valid — it clears any
    valid observation that overflowed its shard's slice (ok=False flags
    that; raise O or rebalance landmark ids).
    """
    import numpy as np
    obs_lm = np.asarray(obs_lm)
    obs_valid = np.asarray(obs_valid)
    per = O // n_shards
    block = L // n_shards
    owner = np.clip(obs_lm // block, 0, n_shards - 1)
    perm = np.full(O, -1, np.int64)
    ok = True
    cursor = [s * per for s in range(n_shards)]
    spill = []
    for o in range(O):
        if not obs_valid[o]:
            spill.append(o)
            continue
        s = int(owner[o])
        if cursor[s] < (s + 1) * per:
            perm[cursor[s]] = o
            cursor[s] += 1
        else:
            spill.append(o)           # valid obs lost — flag it
            ok = False
    holes = [i for i in range(O) if perm[i] < 0]
    assert len(holes) == len(spill)
    for h, o in zip(holes, spill):
        perm[h] = o
    valid_out = obs_valid[perm].copy()
    valid_out[holes] = False          # parked slots contribute nothing
    return perm, valid_out, ok
