"""Loop closing: detection -> Sim3 verification -> pose-graph correction.

Equivalent of the LoopClosing thread (/root/reference/src/
LoopClosing.cc:58-751): DetectLoop (:104: BoW min-score vs covisibles, DB
candidates, 3x consistency), ComputeSim3 (:232: matches -> Sim3Solver RANSAC
-> OptimizeSim3 >=20 inliers), CorrectLoop (:403: Sim3 propagation,
essential-graph optimization; global BA available via the sharded BA). Runs
as a synchronous pipeline stage on keyframe insertion.
"""
from __future__ import annotations

import dataclasses
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import SystemConfig
from ..ops import hamming as hm
from ..ops.horn import ransac_sim3
from ..optim.sim3_opt import optimize_sim3
from ..optim.pose_graph import PoseGraphProblem, optimize_pose_graph
from ..utils import sim3 as s3
from ..utils.camera import Intrinsics
from ..worldmap.state import MapState
from ..worldmap import kfdb as kfdb_mod
from ..models import vocabulary as voc_mod


@jax.jit
def _detect_device(hists, has, db_valid, hist, covis, k):
    """Whole loop-detection scoring in ONE device call -> small packet:
    [best_cand, best_score, covis_row_of_best (K bools as floats)].
    Folds: covisible-set exclusion, min-score from strong covisibles
    (ref :122), candidate query, best selection."""
    K = covis.shape[0]
    covis_row = covis[k]
    exclude = (covis_row > 0)
    exclude = exclude.at[k].set(True)
    # min score among strong covisibles
    strong = (covis_row >= 15) & db_valid
    sims = 1.0 - 0.5 * jnp.sum(jnp.abs(hists - hists[k][None, :]), axis=1)
    min_score = jnp.min(jnp.where(strong, sims, jnp.inf))
    min_score = jnp.where(jnp.isfinite(min_score), min_score, 0.0)
    db = kfdb_mod.KFDatabase(hists, has, db_valid)
    cand = kfdb_mod.query(db, hist, covis, exclude, min_score=min_score)
    best = jnp.argmax(cand.score)
    return jnp.concatenate([
        jnp.stack([best.astype(jnp.float32), cand.score[best]]),
        (covis[best] > 0).astype(jnp.float32)])


@jax.jit
def _match_kf_pair(desc_a, valid_a, obs_a, desc_b, valid_b, obs_b):
    """Match keypoints-with-landmarks of two KFs; returns (idx_b, ok)."""
    has_a = valid_a & (obs_a >= 0)
    has_b = valid_b & (obs_b >= 0)
    dist = hm.masked_hamming_matrix(desc_a, has_a, desc_b, has_b)
    idx, d, ok = hm.match_nn(dist, max_dist=50, ratio=0.75, mutual=True)
    return idx, ok


@dataclasses.dataclass
class LoopResult:
    closed: bool = False
    matched_kf: int = -1
    n_inliers: int = 0


class LoopCloser:
    """Host orchestration; all numerics in jitted units."""

    def __init__(self, cfg: SystemConfig, cam: Intrinsics, voc):
        self.cfg = cfg
        self.cam = cam
        self.voc = voc
        self.db = kfdb_mod.KFDatabase.empty(cfg.capacity.max_keyframes,
                                            voc.n_words)
        self.consistency: List[set] = []   # candidate groups streak
        self.streaks = {}                  # cand kf -> consecutive count
        self.last_loop_kf = -1000

    # ------------------------------------------------------------------
    def on_keyframe(self, m: MapState, k: int, stereo: bool) -> \
            tuple[MapState, LoopResult]:
        """Process new keyframe k: detect/verify/correct. Returns updated
        map + result. Also adds k to the BoW database."""
        bv = voc_mod.transform(self.voc, m.kf_kp_desc[k], m.kf_kp_valid[k])
        hist = voc_mod.bow_histogram(bv, self.voc.n_words)
        result = LoopResult()

        cfg = self.cfg.loop
        if cfg.enabled and k - self.last_loop_kf > cfg.kf_gap and k >= 10:
            cand_k = self._detect(m, k, hist)
            if cand_k >= 0:
                ok, s_rel, R_rel, t_rel, n_inl = self._compute_sim3(
                    m, k, cand_k, stereo)
                if ok:
                    m = self._correct(m, k, cand_k, s_rel, R_rel, t_rel)
                    self.last_loop_kf = k
                    result = LoopResult(True, cand_k, n_inl)
        self.db = kfdb_mod.add(self.db, k, hist)
        return m, result

    # ------------------------------------------------------------------
    def _detect(self, m: MapState, k: int, hist) -> int:
        """BoW candidates excluding covisibles; consistency streak >= th
        (ref DetectLoop :104-231). ONE device call + ONE readback."""
        packet = np.asarray(_detect_device(
            self.db.hists, self.db.has, self.db.valid, hist, m.covis,
            jnp.int32(k)))
        best = int(packet[0])
        best_score = float(packet[1])
        if best_score <= 0:
            self.streaks = {}
            return -1
        # consistency streak: candidate (or its covis group) seen in
        # consecutive KFs (ref 3x consistency)
        group = set(np.nonzero(packet[2:] > 0)[0].tolist())
        group.add(best)
        new_streaks = {}
        hit = 0
        for g in group:
            hit = max(hit, self.streaks.get(g, 0))
        for g in group:
            new_streaks[g] = hit + 1
        self.streaks = new_streaks
        if hit + 1 >= self.cfg.loop.covisibility_consistency_th:
            return best
        return -1

    # ------------------------------------------------------------------
    def _compute_sim3(self, m: MapState, k: int, cand: int, stereo: bool):
        """Match landmarks of (k, cand); solve relative Sim3 cam_cand<-cam_k
        (ref ComputeSim3 :232-402)."""
        idx, ok = _match_kf_pair(
            m.kf_kp_desc[k], m.kf_kp_valid[k], m.kf_obs_lm[k],
            m.kf_kp_desc[cand], m.kf_kp_valid[cand], m.kf_obs_lm[cand])
        n = int(ok.sum())
        if n < self.cfg.loop.sim3_min_inliers:
            return False, None, None, None, 0
        L = m.lm_pos.shape[0]
        lm_k = m.kf_obs_lm[k]
        lm_c = m.kf_obs_lm[cand][jnp.clip(idx, 0, lm_k.shape[0] - 1)]
        ok = ok & (lm_k >= 0) & (lm_c >= 0)
        ok = ok & m.lm_valid[jnp.clip(lm_k, 0, L - 1)] \
                & m.lm_valid[jnp.clip(lm_c, 0, L - 1)]
        # camera-frame coordinates of the matched landmarks
        xk_w = m.lm_pos[jnp.clip(lm_k, 0, L - 1)]
        xc_w = m.lm_pos[jnp.clip(lm_c, 0, L - 1)]
        x1 = xk_w @ m.kf_R[k].T + m.kf_t[k]          # in cam k
        x2 = xc_w @ m.kf_R[cand].T + m.kf_t[cand]    # in cam cand
        uv1 = m.kf_kp_xy[k]
        uv2 = m.kf_kp_xy[cand][jnp.clip(idx, 0, lm_k.shape[0] - 1)]
        fit = ransac_sim3(self.cam, self.cam, x1, x2, uv1, uv2, ok,
                          jax.random.PRNGKey(1234 + k),
                          fix_scale=self.cfg.loop.fix_scale)
        if int(fit.n_inliers) < self.cfg.loop.sim3_min_inliers:
            return False, None, None, None, 0
        lvl_k = m.kf_kp_level[k].astype(jnp.float32)
        lvl_c = m.kf_kp_level[cand].astype(jnp.float32)[
            jnp.clip(idx, 0, lm_k.shape[0] - 1)]
        inv1 = 1.0 / (1.2 ** (2 * lvl_k))
        inv2 = 1.0 / (1.2 ** (2 * lvl_c))
        res = optimize_sim3(self.cam, self.cam, fit.s, fit.R, fit.t, x1, x2,
                            uv1, uv2, inv1, inv2, ok & fit.inliers,
                            fix_scale=self.cfg.loop.fix_scale)
        n_inl = int(res.n_inliers)
        if n_inl < self.cfg.loop.sim3_min_inliers:
            return False, None, None, None, 0
        return True, res.s, res.R, res.t, n_inl

    # ------------------------------------------------------------------
    def _correct(self, m: MapState, k: int, cand: int, s_rel, R_rel,
                 t_rel) -> MapState:
        """Essential-graph correction (ref CorrectLoop :403-587 +
        OptimizeEssentialGraph)."""
        K = m.kf_valid.shape[0]
        n_kf = int(m.n_kf)
        valid = np.asarray(m.kf_valid)

        s0 = jnp.ones(K)
        R0 = m.kf_R
        t0 = m.kf_t

        covis = np.asarray(m.covis)
        e_i, e_j, e_R, e_t, e_w = [], [], [], [], []

        def add_edge(i, j, w, meas=None):
            """Edge (i, j) with measurement S_ji = S_j o S_i^-1 from current
            estimates unless given."""
            if meas is None:
                Rm = np.asarray(m.kf_R[j] @ m.kf_R[i].T)
                tm = np.asarray(m.kf_t[j]) - Rm @ np.asarray(m.kf_t[i])
                meas = (1.0, Rm, tm)
            e_i.append(i)
            e_j.append(j)
            e_R.append(meas[1])
            e_t.append(meas[2])
            e_w.append(w)

        for i in range(1, n_kf):
            if not valid[i]:
                continue
            # spanning edge to strongest earlier covisible (or previous kf)
            earlier = covis[i, :i] * valid[:i]
            parent = int(np.argmax(earlier)) if earlier.max() > 0 else i - 1
            add_edge(i, parent, 1.0)
            # strong covisibility edges (weight >= 100, ref :881)
            for j in np.nonzero(earlier >= 100)[0]:
                if j != parent:
                    add_edge(i, int(j), 1.0)
        # loop edge: measured relative transform maps cam_k -> cam_cand:
        # S_cand,k. Edge (i=k, j=cand) wants S_ji = S_cand o S_k^-1 == meas.
        add_edge(k, cand, 10.0,
                 (float(s_rel), np.asarray(R_rel), np.asarray(t_rel)))

        E = len(e_i)
        fixed = np.zeros(K, bool)
        fixed[cand] = True
        fixed[0] = True
        problem = PoseGraphProblem(
            s=s0, R=R0, t=t0,
            fixed=jnp.asarray(fixed), valid=m.kf_valid,
            e_i=jnp.asarray(e_i, jnp.int32), e_j=jnp.asarray(e_j, jnp.int32),
            e_s=jnp.ones(E), e_R=jnp.asarray(np.stack(e_R)),
            e_t=jnp.asarray(np.stack(e_t)), e_valid=jnp.ones(E, bool),
            e_weight=jnp.asarray(e_w, jnp.float32))
        s_new, R_new, t_new = optimize_pose_graph(
            problem, iters=self.cfg.optimizer.essential_graph_iters,
            fix_scale=self.cfg.loop.fix_scale)

        # landmark correction: x' = S_ref_new^-1 ( S_ref_old (x) )
        ref = jnp.clip(m.lm_first_kf, 0, K - 1)
        Ro = m.kf_R[ref]
        to = m.kf_t[ref]
        x_cam = jnp.einsum("lij,lj->li", Ro, m.lm_pos) + to
        sn = s_new[ref]
        Rn = R_new[ref]
        tn = t_new[ref]
        # inverse of (s, R, t): x = R^T (x' - t)/s
        x_new = jnp.einsum("lji,lj->li", Rn,
                           (x_cam - tn) / jnp.maximum(sn[:, None], 1e-9))
        lm_pos = jnp.where(m.lm_valid[:, None], x_new, m.lm_pos)

        # write back poses as SE3 (t / s)
        t_se3 = t_new / jnp.maximum(s_new[:, None], 1e-9)
        kf_R = jnp.where(m.kf_valid[:, None, None], R_new, m.kf_R)
        kf_t = jnp.where(m.kf_valid[:, None], t_se3, m.kf_t)
        m = m._replace(kf_R=kf_R, kf_t=kf_t, lm_pos=lm_pos)
        if self.cfg.loop.run_global_ba:
            # full-map BA after the essential-graph correction (the
            # reference's async GBA thread, run synchronously here)
            from .global_ba import global_bundle_adjust
            m = global_bundle_adjust(
                m, self.cam, stereo=self.cfg.sensor in ("stereo", "rgbd"),
                iters=self.cfg.optimizer.global_ba_iters)
        return m
