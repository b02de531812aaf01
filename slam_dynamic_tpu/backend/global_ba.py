"""Full-map (global) bundle adjustment from a MapState.

Equivalent of Optimizer::GlobalBundleAdjustemnt + the post-loop
RunGlobalBundleAdjustment merge (/root/reference/src/Optimizer.cc:41-237,
LoopClosing.cc:646-751). The solve is the landmark-sharded distributed BA
(parallel/sharded_ba.py) — on one device the same code runs with a 1-shard
mesh; on a pod slice the landmark axis spreads over "lm".
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from ..utils.camera import Intrinsics
from ..worldmap.state import MapState
from ..parallel.mesh import make_mesh
from ..parallel import sharded_ba as sba


def _build_problem(m: MapState, cam: Intrinsics, stereo: bool,
                   n_devices: Optional[int], scale_factor: float):
    """Snapshot the map into a landmark-sharded BA problem."""
    K, N = m.kf_obs_lm.shape
    L = m.lm_pos.shape[0]
    mesh = make_mesh(n_devices)
    n_shards = mesh.shape["lm"]
    Lp = ((L + n_shards - 1) // n_shards) * n_shards

    # observation list from the map (padded [K*N])
    obs = np.asarray(m.kf_obs_lm)
    kpv = np.asarray(m.kf_kp_valid)
    valid = (obs >= 0) & kpv & np.asarray(m.kf_valid)[:, None]
    okf = np.repeat(np.arange(K, dtype=np.int32), N)
    olm = np.where(valid, obs, 0).reshape(-1).astype(np.int32)
    xy = np.asarray(m.kf_kp_xy).reshape(-1, 2)
    ur = np.asarray(m.kf_kp_ur).reshape(-1)
    lvl = np.asarray(m.kf_kp_level).reshape(-1).astype(np.float32)
    inv_s2 = 1.0 / (scale_factor ** (2.0 * lvl))
    O = K * N
    Oc = ((O + n_shards - 1) // n_shards) * n_shards
    pad = Oc - O

    def padv(a, fill=0):
        return np.concatenate(
            [a, np.full((pad,) + a.shape[1:], fill, a.dtype)])

    uv = np.concatenate([xy, ur[:, None]], 1) if stereo else xy
    urw = (ur > 0).astype(np.float32)
    perm, valid_out, ok = sba.partition_obs_by_landmark(
        padv(olm), padv(valid.reshape(-1)), n_shards, Lp, Oc)
    if not ok:
        # some shard overflowed; those obs are dropped (logged by caller)
        pass
    fixed = np.zeros(K, bool)
    fixed[0] = True
    pts = np.zeros((Lp, 3), np.float32)
    pts[:L] = np.asarray(m.lm_pos)
    lmv = np.zeros(Lp, bool)
    lmv[:L] = np.asarray(m.lm_valid)

    problem = sba.ShardedBAProblem(
        kf_R=m.kf_R, kf_t=m.kf_t,
        kf_fixed=jnp.asarray(fixed), kf_valid=m.kf_valid,
        points=jnp.asarray(pts), lm_valid=jnp.asarray(lmv),
        obs_kf=jnp.asarray(padv(okf)[perm]),
        obs_lm=jnp.asarray(padv(olm)[perm]),
        obs_uv=jnp.asarray(padv(uv.astype(np.float32))[perm]),
        obs_inv_sigma2=jnp.asarray(padv(inv_s2.astype(np.float32))[perm]),
        obs_valid=jnp.asarray(valid_out),
        obs_ur_weight=jnp.asarray(padv(urw)[perm]))

    def put(x, spec):
        return jax.device_put(x, NamedSharding(mesh, spec))
    problem = problem._replace(
        points=put(problem.points, P("lm")),
        lm_valid=put(problem.lm_valid, P("lm")),
        obs_kf=put(problem.obs_kf, P("lm")),
        obs_lm=put(problem.obs_lm, P("lm")),
        obs_uv=put(problem.obs_uv, P("lm")),
        obs_inv_sigma2=put(problem.obs_inv_sigma2, P("lm")),
        obs_valid=put(problem.obs_valid, P("lm")),
        obs_ur_weight=put(problem.obs_ur_weight, P("lm")))

    return problem, mesh, K, L, Lp, Oc


def global_bundle_adjust(m: MapState, cam: Intrinsics, stereo: bool = True,
                         iters: int = 15, n_devices: Optional[int] = None,
                         scale_factor: float = 1.2) -> MapState:
    """Run global BA over all valid keyframes/landmarks; write back."""
    problem, mesh, K, L, Lp, Oc = _build_problem(m, cam, stereo, n_devices,
                                                 scale_factor)
    run = sba.make_sharded_ba(mesh, cam, K=K, L=Lp, O=Oc, stereo=stereo,
                              iters=iters)
    kf_R, kf_t, pts_out = run(problem)
    return m._replace(
        kf_R=jnp.where(m.kf_valid[:, None, None], kf_R, m.kf_R),
        kf_t=jnp.where(m.kf_valid[:, None], kf_t, m.kf_t),
        lm_pos=jnp.where(m.lm_valid[:, None],
                         jnp.asarray(pts_out)[:L], m.lm_pos))


class AmortizedGBA:
    """Post-loop global BA amortized over subsequent frames.

    The reference runs GBA in a detached thread and merges when it finishes
    (LoopClosing::RunGlobalBundleAdjustment, /root/reference/src/
    LoopClosing.cc:646-751): keyframes inserted DURING the solve are
    corrected through their spanning parent, landmarks through their
    reference keyframe. Here the snapshot problem advances a bounded slice
    of GN iterations per tracked frame (one async device dispatch each —
    no frame-time spike), then `merge` applies the same propagation rules.
    """

    def __init__(self, m: MapState, cam: Intrinsics, stereo: bool,
                 total_iters: int = 15, slice_iters: int = 3,
                 n_devices: Optional[int] = None,
                 scale_factor: float = 1.2):
        self.cam = cam
        self.problem, mesh, K, L, Lp, Oc = _build_problem(
            m, cam, stereo, n_devices, scale_factor)
        self.run = sba.make_sharded_ba(mesh, cam, K=K, L=Lp, O=Oc,
                                       stereo=stereo, iters=slice_iters)
        self.L = L
        self.remaining = total_iters
        self.slice_iters = slice_iters
        # snapshot membership for the merge propagation
        self.snap_kf_valid = m.kf_valid
        self.snap_lm_valid = m.lm_valid

    @property
    def done(self) -> bool:
        return self.remaining <= 0

    def step(self):
        """Advance one bounded slice (async device dispatch)."""
        if self.done:
            return
        kf_R, kf_t, pts = self.run(self.problem)
        self.problem = self.problem._replace(kf_R=kf_R, kf_t=kf_t,
                                             points=pts)
        self.remaining -= self.slice_iters

    def merge(self, m: MapState) -> MapState:
        """Write the converged solve into the CURRENT map, propagating to
        keyframes/landmarks created since the snapshot (ref merge protocol,
        LoopClosing.cc:698-748)."""
        K = m.kf_valid.shape[0]
        L = self.L
        R_opt = self.problem.kf_R
        t_opt = self.problem.kf_t
        in_snap = self.snap_kf_valid
        # new keyframes: correct through the strongest snapshot covisible,
        # keeping the CURRENT relative transform to it (ref uses
        # Tchild_parent * TcorrectedParent)
        covis_snap = jnp.where(in_snap[None, :], m.covis, -1)
        parent = jnp.argmax(covis_snap, axis=1)
        has_par = jnp.take_along_axis(covis_snap, parent[:, None],
                                      1)[:, 0] > 0
        Rp_old = m.kf_R[parent]                   # pre-merge pose
        tp_old = m.kf_t[parent]
        R_rel = jnp.einsum("kij,kpj->kip", m.kf_R, Rp_old)   # R_k R_p^T
        t_rel = m.kf_t - jnp.einsum("kij,kj->ki", R_rel, tp_old)
        R_prop = jnp.einsum("kij,kjl->kil", R_rel, R_opt[parent])
        t_prop = jnp.einsum("kij,kj->ki", R_rel, t_opt[parent]) + t_rel
        new_kf = m.kf_valid & ~in_snap & has_par
        kf_R = jnp.where(in_snap[:, None, None], R_opt,
                         jnp.where(new_kf[:, None, None], R_prop, m.kf_R))
        kf_t = jnp.where(in_snap[:, None], t_opt,
                         jnp.where(new_kf[:, None], t_prop, m.kf_t))
        # landmarks: snapshot ones take the optimized positions; newer ones
        # are corrected through their reference keyframe's pose change
        # (x' = T_ref_new^-1 o T_ref_old applied to x, ref mTcwBefGBA path)
        pts_opt = jnp.asarray(self.problem.points)[:L]
        ref = jnp.clip(m.lm_first_kf, 0, K - 1)
        x_cam = jnp.einsum("lij,lj->li", m.kf_R[ref], m.lm_pos) \
            + m.kf_t[ref]
        Rn = kf_R[ref]
        tn = kf_t[ref]
        x_prop = jnp.einsum("lji,lj->li", Rn, x_cam - tn)
        in_snap_lm = self.snap_lm_valid & (jnp.arange(m.lm_pos.shape[0]) <
                                           L)
        lm_pos = jnp.where(
            (m.lm_valid & in_snap_lm)[:, None], pts_opt,
            jnp.where(m.lm_valid[:, None], x_prop, m.lm_pos))
        return m._replace(kf_R=kf_R, kf_t=kf_t, lm_pos=lm_pos)
