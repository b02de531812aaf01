"""Sim3 solver/optimizer + pose-graph optimization vs ground truth."""
import numpy as np
import jax
import jax.numpy as jnp

from slam_dynamic_tpu.utils.camera import Intrinsics, project
from slam_dynamic_tpu.utils import sim3 as s3, se3
from slam_dynamic_tpu.ops.horn import horn_sim3, ransac_sim3
from slam_dynamic_tpu.optim.sim3_opt import optimize_sim3
from slam_dynamic_tpu.optim.pose_graph import (PoseGraphProblem,
                                               optimize_pose_graph)

CAM = Intrinsics.create(fx=500.0, fy=500.0, cx=320.0, cy=240.0)


def test_horn_exact(rng):
    x1 = rng.normal(size=(50, 3)).astype(np.float32)
    xi = rng.normal(size=7).astype(np.float32) * 0.5
    s_gt, R_gt, t_gt = s3.sim3_exp(jnp.asarray(xi))
    x2 = np.asarray(s3.sim3_apply(s_gt, R_gt, t_gt, jnp.asarray(x1)))
    s, R, t = horn_sim3(jnp.asarray(x1), jnp.asarray(x2), jnp.ones(50))
    assert abs(float(s) - float(s_gt)) < 1e-4
    np.testing.assert_allclose(np.asarray(R), np.asarray(R_gt), atol=1e-4)
    np.testing.assert_allclose(np.asarray(t), np.asarray(t_gt), atol=1e-4)


def test_ransac_sim3_with_outliers(rng):
    n = 120
    x1 = np.stack([rng.uniform(-2, 2, n), rng.uniform(-1.5, 1.5, n),
                   rng.uniform(3, 8, n)], 1).astype(np.float32)
    xi = np.array([0.3, -0.2, 0.1, 0.05, 0.02, -0.04, 0.0], np.float32)
    s_gt, R_gt, t_gt = s3.sim3_exp(jnp.asarray(xi))
    x2 = np.array(s3.sim3_apply(s_gt, R_gt, t_gt, jnp.asarray(x1)))
    x2[:25] += rng.uniform(1, 3, (25, 3))          # outlier pairs
    uv1 = np.array(project(CAM, jnp.asarray(x1)))
    uv2 = np.array(project(CAM, jnp.asarray(x2)))
    fit = ransac_sim3(CAM, CAM, jnp.asarray(x1), jnp.asarray(x2),
                      jnp.asarray(uv1), jnp.asarray(uv2),
                      jnp.ones(n, bool), jax.random.PRNGKey(0),
                      fix_scale=True)
    assert int(fit.n_inliers) > 80
    assert np.asarray(fit.inliers)[:25].sum() <= 2
    np.testing.assert_allclose(np.asarray(fit.t), np.asarray(t_gt),
                               atol=0.02)


def test_optimize_sim3_refines(rng):
    n = 100
    x1 = np.stack([rng.uniform(-2, 2, n), rng.uniform(-1.5, 1.5, n),
                   rng.uniform(3, 8, n)], 1).astype(np.float32)
    xi = np.array([0.3, -0.2, 0.1, 0.05, 0.02, -0.04, 0.0], np.float32)
    s_gt, R_gt, t_gt = s3.sim3_exp(jnp.asarray(xi))
    x2 = np.array(s3.sim3_apply(s_gt, R_gt, t_gt, jnp.asarray(x1)))
    uv1 = np.array(project(CAM, jnp.asarray(x1))) + rng.normal(0, 0.3, (n, 2))
    uv2 = np.array(project(CAM, jnp.asarray(x2))) + rng.normal(0, 0.3, (n, 2))
    # perturbed init
    dxi = rng.normal(0, 0.03, 7).astype(np.float32)
    dxi[6] = 0.0          # fix_scale=True: scale is trusted, don't perturb
    ds, dR, dt = s3.sim3_exp(jnp.asarray(dxi))
    s0, R0, t0 = s3.sim3_compose(ds, dR, dt, s_gt, R_gt, t_gt)
    res = optimize_sim3(CAM, CAM, s0, R0, t0, jnp.asarray(x1),
                        jnp.asarray(x2), jnp.asarray(uv1, jnp.float32),
                        jnp.asarray(uv2, jnp.float32), jnp.ones(n),
                        jnp.ones(n), jnp.ones(n, bool), fix_scale=True)
    assert int(res.n_inliers) > 90
    np.testing.assert_allclose(np.asarray(res.t), np.asarray(t_gt),
                               atol=5e-3)


def _make_loop_problem(rng, K=20, drift=0.02):
    """Simulated odometry chain with drift + one loop edge back to start."""
    # ground truth: circle-ish trajectory
    s_gt = np.ones(K, np.float32)
    R_gt = np.zeros((K, 3, 3), np.float32)
    t_gt = np.zeros((K, 3), np.float32)
    for k in range(K):
        th = 2 * np.pi * k / K
        R_gt[k] = np.array([[np.cos(th), 0, np.sin(th)], [0, 1, 0],
                            [-np.sin(th), 0, np.cos(th)]], np.float32)
        t_gt[k] = np.array([2 * np.sin(th), 0, 2 - 2 * np.cos(th)],
                           np.float32)
    # odometry measurements: true relative + noise (drift accumulates)
    e_i, e_j, e_s, e_R, e_t, w = [], [], [], [], [], []

    def rel(i, j):
        """S_ji mapping: g_i o g_j^-1 with g = (1, R, t)."""
        Rj_inv, tj_inv = se3.se3_inverse(jnp.asarray(R_gt[j]),
                                         jnp.asarray(t_gt[j]))
        Rr, tr = se3.se3_compose(jnp.asarray(R_gt[i]), jnp.asarray(t_gt[i]),
                                 Rj_inv, tj_inv)
        return np.asarray(Rr), np.asarray(tr)

    for k in range(1, K):
        Rr, tr = rel(k, k - 1)
        # noise on odometry
        dxi = np.concatenate([rng.normal(0, drift, 3),
                              rng.normal(0, drift * 0.3, 3)]).astype(
                                  np.float32)
        dR, dt = se3.se3_exp(jnp.asarray(dxi))
        Rr2, tr2 = se3.se3_compose(np.asarray(dR), np.asarray(dt),
                                   jnp.asarray(Rr), jnp.asarray(tr))
        # measurement S_ji with j=k-1, i=k  => edge residual log(Sji Si Sj^-1)
        e_i.append(k); e_j.append(k - 1)
        e_s.append(1.0); e_R.append(np.asarray(Rr2)); e_t.append(
            np.asarray(tr2)); w.append(1.0)
    # loop edge: exact measurement K-1 -> 0
    Rr, tr = rel(K - 1, 0)
    e_i.append(K - 1); e_j.append(0)
    e_s.append(1.0); e_R.append(Rr); e_t.append(tr); w.append(5.0)

    # inverse measurements: residual uses log(Sji * Si * Sj^-1) so the
    # CONSISTENT measurement for edge (i,j) is S_ij = (g_i g_j^-1)^-1 ...
    # verify orientation in test by checking zero residual at ground truth.
    E = len(e_i)
    # initial estimate: integrate noisy odometry (drifts)
    s0 = np.ones(K, np.float32)
    R0 = np.zeros_like(R_gt); t0 = np.zeros_like(t_gt)
    R0[0] = R_gt[0]; t0[0] = t_gt[0]
    for k in range(1, K):
        Rr, tr = e_R[k - 1], e_t[k - 1]
        R0[k], t0[k] = [np.asarray(x) for x in se3.se3_compose(
            jnp.asarray(Rr), jnp.asarray(tr), jnp.asarray(R0[k - 1]),
            jnp.asarray(t0[k - 1]))]
    fixed = np.zeros(K, bool); fixed[0] = True
    problem = PoseGraphProblem(
        s=jnp.asarray(s0), R=jnp.asarray(R0), t=jnp.asarray(t0),
        fixed=jnp.asarray(fixed), valid=jnp.ones(K, bool),
        e_i=jnp.asarray(e_i, jnp.int32), e_j=jnp.asarray(e_j, jnp.int32),
        e_s=jnp.asarray(e_s, jnp.float32),
        e_R=jnp.asarray(np.stack(e_R)), e_t=jnp.asarray(np.stack(e_t)),
        e_valid=jnp.ones(E, bool), e_weight=jnp.asarray(w, jnp.float32))
    return problem, R_gt, t_gt


def test_edge_residual_zero_at_consistent():
    """Measurement convention: S_ji = g_j o g_i^-1 gives zero residual
    r = log(S_ji o S_i o S_j^-1)... verify the actual convention."""
    from slam_dynamic_tpu.optim.pose_graph import edge_residual
    xi_i = jnp.asarray(np.array([.1, .2, -.1, .05, 0, .1, 0], np.float32))
    xi_j = jnp.asarray(np.array([-.2, .1, .3, 0, .1, 0, 0], np.float32))
    g_i = s3.sim3_exp(xi_i)
    g_j = s3.sim3_exp(xi_j)
    # S_ji such that residual zero: S_ji = (S_i o S_j^-1)^-1 = S_j o S_i^-1
    meas = s3.sim3_compose(*g_j, *s3.sim3_inverse(*g_i))
    r = edge_residual(g_i, g_j, meas)
    assert float(jnp.abs(r).max()) < 1e-5


def test_pose_graph_corrects_scale_drift():
    """Mono-style scale drift: estimates carry a compounding scale error;
    the loop edge's MEASURED Sim3 scale must pull it back when
    fix_scale=False (the e_s path of backend/loop_closing._correct)."""
    K = 12
    t_gt = np.stack([np.arange(K, dtype=np.float32),
                     np.zeros(K, np.float32),
                     np.zeros(K, np.float32)], 1)
    eyeK = jnp.broadcast_to(jnp.eye(3), (K, 3, 3))
    s_est = 1.06 ** np.arange(K, dtype=np.float32)   # compounding drift

    def g(i, est):
        s = float(s_est[i]) if est else 1.0
        return jnp.float32(s), jnp.eye(3), jnp.asarray(t_gt[i] * s)

    e_i, e_j, e_s, e_R, e_t = [], [], [], [], []
    for i in range(1, K):
        meas = s3.sim3_compose(*g(i, False),
                               *s3.sim3_inverse(*g(i - 1, False)))
        # sequential edges measured from the DRIFTED odometry (scale 1
        # relative per step is what drifting mono odometry believes)
        e_i.append(i - 1); e_j.append(i)
        e_s.append(float(s_est[i] / s_est[i - 1]))
        e_R.append(np.eye(3, dtype=np.float32))
        e_t.append(np.asarray(s3.sim3_compose(
            *g(i, True), *s3.sim3_inverse(*g(i - 1, True)))[2]))
        del meas
    # ONE loop edge with the TRUE measured Sim3 (scale 1): K-1 -> 0
    meas = s3.sim3_compose(*g(0, False), *s3.sim3_inverse(*g(K - 1, False)))
    e_i.append(K - 1); e_j.append(0)
    e_s.append(float(meas[0]))
    e_R.append(np.asarray(meas[1]))
    e_t.append(np.asarray(meas[2]))

    E = len(e_i)
    problem = PoseGraphProblem(
        s=jnp.asarray(s_est), R=eyeK,
        t=jnp.asarray(t_gt * s_est[:, None]),
        fixed=jnp.asarray(np.arange(K) == 0), valid=jnp.ones(K, bool),
        e_i=jnp.asarray(e_i, jnp.int32), e_j=jnp.asarray(e_j, jnp.int32),
        e_s=jnp.asarray(e_s, jnp.float32),
        e_R=jnp.asarray(np.stack(e_R)), e_t=jnp.asarray(np.stack(e_t)),
        e_valid=jnp.ones(E, bool), e_weight=jnp.where(
            jnp.arange(E) == E - 1, 10.0, 1.0))
    s_out, R_out, t_out = optimize_pose_graph(problem, iters=30,
                                              fix_scale=False)
    err_before = abs(float(s_est[-1]) - 1.0)
    err_after = abs(float(s_out[-1]) - 1.0)
    assert err_after < 0.4 * err_before, (err_before, err_after)


def test_pose_graph_closes_loop(rng):
    problem, R_gt, t_gt = _make_loop_problem(rng, K=20, drift=0.03)
    # fix measurement convention: edges built as S_ji = g_i o g_j^-1 but the
    # residual wants S_ji = g_j o g_i^-1; invert the measurements.
    inv = [np.asarray(x) for x in zip(*[
        s3.sim3_inverse(problem.e_s[e], problem.e_R[e], problem.e_t[e])
        for e in range(problem.e_s.shape[0])])]
    problem = problem._replace(
        e_s=jnp.asarray(inv[0]), e_R=jnp.asarray(np.stack(inv[1])),
        e_t=jnp.asarray(np.stack(inv[2])))
    drift_before = np.linalg.norm(np.asarray(problem.t) - t_gt, axis=1)
    s, R, t = optimize_pose_graph(problem, iters=25)
    drift_after = np.linalg.norm(np.asarray(t) - t_gt, axis=1)
    assert drift_after.max() < 0.55 * drift_before.max(), \
        (drift_before.max(), drift_after.max())
    assert drift_after.mean() < 0.6 * drift_before.mean()
