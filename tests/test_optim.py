"""Pose optimization and local BA vs synthetic ground truth."""
import numpy as np
import jax.numpy as jnp

from slam_dynamic_tpu.utils.camera import Intrinsics, project, project_stereo
from slam_dynamic_tpu.utils import se3
from slam_dynamic_tpu.optim.pose_opt import optimize_pose
from slam_dynamic_tpu.optim.local_ba import BAProblem, bundle_adjust

CAM = Intrinsics.create(fx=500.0, fy=500.0, cx=320.0, cy=240.0, bf=50.0,
                        width=640, height=480)


def make_scene(rng, n_pts=200):
    pts = np.stack([rng.uniform(-4, 4, n_pts), rng.uniform(-3, 3, n_pts),
                    rng.uniform(4, 12, n_pts)], axis=1).astype(np.float32)
    return pts


def gt_pose(rng, mag_r=0.1, mag_t=0.3):
    xi = np.concatenate([rng.normal(0, mag_t, 3), rng.normal(0, mag_r, 3)])
    return se3.se3_exp(jnp.asarray(xi, jnp.float32))


def test_pose_opt_recovers_gt_mono(rng):
    pts = make_scene(rng)
    R_gt, t_gt = gt_pose(rng)
    uv = project(CAM, se3.se3_apply(R_gt, t_gt, jnp.asarray(pts)))
    uv = uv + rng.normal(0, 0.5, uv.shape).astype(np.float32)
    # perturbed init
    dxi = np.concatenate([rng.normal(0, 0.2, 3), rng.normal(0, 0.05, 3)])
    R0, t0 = se3.se3_retract(R_gt, t_gt, jnp.asarray(dxi, jnp.float32))
    res = optimize_pose(CAM, R0, t0, jnp.asarray(pts), uv,
                        jnp.ones(len(pts)), jnp.ones(len(pts), bool))
    assert int(res.n_inliers) > 180
    err_t = np.linalg.norm(np.asarray(res.t) - np.asarray(t_gt))
    err_r = np.linalg.norm(np.asarray(se3.so3_log(res.R @ R_gt.T)))
    assert err_t < 0.02, err_t
    assert err_r < 0.005, err_r


def test_pose_opt_with_outliers(rng):
    pts = make_scene(rng, 300)
    R_gt, t_gt = gt_pose(rng)
    uv = np.array(project(CAM, se3.se3_apply(R_gt, t_gt, jnp.asarray(pts))))
    uv += rng.normal(0, 0.5, uv.shape).astype(np.float32)
    out_idx = rng.choice(300, 60, replace=False)
    uv[out_idx] += rng.uniform(30, 120, (60, 2)) * rng.choice([-1, 1], (60, 2))
    dxi = np.concatenate([rng.normal(0, 0.15, 3), rng.normal(0, 0.05, 3)])
    R0, t0 = se3.se3_retract(R_gt, t_gt, jnp.asarray(dxi, jnp.float32))
    res = optimize_pose(CAM, R0, t0, jnp.asarray(pts), jnp.asarray(uv),
                        jnp.ones(300), jnp.ones(300, bool))
    err_t = np.linalg.norm(np.asarray(res.t) - np.asarray(t_gt))
    assert err_t < 0.03, err_t
    inl = np.asarray(res.inliers)
    assert inl[out_idx].sum() <= 3          # outliers rejected
    assert inl.sum() > 200


def test_pose_opt_stereo(rng):
    pts = make_scene(rng)
    R_gt, t_gt = gt_pose(rng)
    uvr = project_stereo(CAM, se3.se3_apply(R_gt, t_gt, jnp.asarray(pts)))
    uvr = uvr + rng.normal(0, 0.3, uvr.shape).astype(np.float32)
    dxi = np.concatenate([rng.normal(0, 0.2, 3), rng.normal(0, 0.05, 3)])
    R0, t0 = se3.se3_retract(R_gt, t_gt, jnp.asarray(dxi, jnp.float32))
    res = optimize_pose(CAM, R0, t0, jnp.asarray(pts), uvr,
                        jnp.ones(len(pts)), jnp.ones(len(pts), bool),
                        stereo=True)
    err_t = np.linalg.norm(np.asarray(res.t) - np.asarray(t_gt))
    assert err_t < 0.02, err_t


def _ba_problem(rng, K=6, L=150, stereo=True, noise=0.4,
                perturb_t=0.15, perturb_p=0.15):
    pts_gt = make_scene(rng, L)
    Rs, ts, obs_kf, obs_lm, obs_uv = [], [], [], [], []
    for k in range(K):
        xi = np.concatenate([[0.4 * k, 0.02 * k, 0.01 * k],
                             rng.normal(0, 0.03, 3)]).astype(np.float32)
        R, t = se3.se3_exp(jnp.asarray(xi))
        Rs.append(np.asarray(R)); ts.append(np.asarray(t))
        xc = np.asarray(se3.se3_apply(R, t, jnp.asarray(pts_gt)))
        proj = project_stereo(CAM, jnp.asarray(xc)) if stereo else \
            project(CAM, jnp.asarray(xc))
        proj = np.asarray(proj) + rng.normal(0, noise, proj.shape)
        vis = (xc[:, 2] > 0.5) & (np.abs(proj[:, 0] - 320) < 320) & \
              (np.abs(proj[:, 1] - 240) < 240)
        for l in np.nonzero(vis)[0]:
            obs_kf.append(k); obs_lm.append(l); obs_uv.append(proj[l])
    O = len(obs_kf)
    fixed = np.zeros(K, bool); fixed[0] = True
    if not stereo:
        fixed[1] = True  # anchor scale gauge for mono
    # perturb non-fixed poses and all points
    Rp, tp = [], []
    for k in range(K):
        if fixed[k]:
            Rp.append(Rs[k]); tp.append(ts[k]); continue
        dxi = np.concatenate([rng.normal(0, perturb_t, 3),
                              rng.normal(0, 0.02, 3)]).astype(np.float32)
        R2, t2 = se3.se3_retract(jnp.asarray(Rs[k]), jnp.asarray(ts[k]),
                                 jnp.asarray(dxi))
        Rp.append(np.asarray(R2)); tp.append(np.asarray(t2))
    pts0 = pts_gt + rng.normal(0, perturb_p, pts_gt.shape).astype(np.float32)
    problem = BAProblem(
        kf_R=jnp.asarray(np.stack(Rp)), kf_t=jnp.asarray(np.stack(tp)),
        kf_fixed=jnp.asarray(fixed), kf_valid=jnp.ones(K, bool),
        points=jnp.asarray(pts0), lm_valid=jnp.ones(L, bool),
        obs_kf=jnp.asarray(obs_kf, jnp.int32),
        obs_lm=jnp.asarray(obs_lm, jnp.int32),
        obs_uv=jnp.asarray(np.stack(obs_uv), jnp.float32),
        obs_inv_sigma2=jnp.ones(O), obs_valid=jnp.ones(O, bool),
        obs_ur_weight=jnp.ones(O))
    return problem, np.stack(Rs), np.stack(ts), pts_gt


def test_local_ba_converges_stereo(rng):
    problem, Rs_gt, ts_gt, pts_gt = _ba_problem(rng, stereo=True)
    res = bundle_adjust(CAM, problem, stereo=True)
    t_err = np.linalg.norm(np.asarray(res.kf_t) - ts_gt, axis=1)
    assert t_err.max() < 0.02, t_err
    p_err = np.linalg.norm(np.asarray(res.points) - pts_gt, axis=1)
    assert np.median(p_err) < 0.03, np.median(p_err)
    assert np.asarray(res.obs_inlier).mean() > 0.95


def test_local_ba_mono_two_fixed(rng):
    problem, Rs_gt, ts_gt, pts_gt = _ba_problem(rng, stereo=False)
    res = bundle_adjust(CAM, problem, stereo=False)
    t_err = np.linalg.norm(np.asarray(res.kf_t) - ts_gt, axis=1)
    assert t_err.max() < 0.03, t_err


def test_local_ba_improves_not_destroys_fixed(rng):
    problem, Rs_gt, ts_gt, pts_gt = _ba_problem(rng)
    res = bundle_adjust(CAM, problem, stereo=True)
    # fixed pose untouched
    np.testing.assert_allclose(np.asarray(res.kf_t)[0], ts_gt[0], atol=1e-6)
    np.testing.assert_allclose(np.asarray(res.kf_R)[0], Rs_gt[0], atol=1e-5)


def test_checkify_flags_nan_and_clean_pass():
    """SURVEY 5.2 rebuild: checkify path catches NaNs inside jitted
    optimizer stages (the reference has no sanitizer story)."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import checkify
    import pytest
    from slam_dynamic_tpu.utils import debug

    @jax.jit
    def bad(x):
        return jnp.sqrt(x) * 2.0          # NaN for x < 0

    wrapped = debug.checked(bad)
    assert float(wrapped(jnp.asarray(4.0))) == 4.0
    with pytest.raises(checkify.JaxRuntimeError):
        wrapped(jnp.asarray(-1.0))


def test_checkify_pose_opt_clean_and_finite_tree():
    """optimize_pose under checkify: no NaNs on a well-posed problem;
    check_finite_tree flags an injected NaN."""
    import numpy as np
    import jax.numpy as jnp
    import pytest
    from slam_dynamic_tpu.utils import debug
    from slam_dynamic_tpu.utils.camera import Intrinsics
    from slam_dynamic_tpu.optim.pose_opt import optimize_pose

    cam = Intrinsics.create(fx=260.0, fy=260.0, cx=159.5, cy=119.5,
                            width=320, height=240)
    rs = np.random.default_rng(0)
    xw = rs.uniform([-2, -2, 2], [2, 2, 6], (64, 3)).astype(np.float32)
    uv = np.stack([cam.fx * xw[:, 0] / xw[:, 2] + cam.cx,
                   cam.fy * xw[:, 1] / xw[:, 2] + cam.cy], -1)
    fn = debug.checked(
        lambda: optimize_pose(cam, jnp.eye(3), jnp.zeros(3),
                              jnp.asarray(xw), jnp.asarray(uv),
                              jnp.ones(64), jnp.ones(64, bool),
                              stereo=False, rounds=2, iters=5))
    res = fn()          # raises if any NaN appears inside the solve
    assert int(res.inliers.sum()) == 64
    debug.check_finite_tree(res, "pose result")
    poisoned = res._replace(t=res.t.at[0].set(jnp.nan))
    with pytest.raises(FloatingPointError, match="pose"):
        debug.check_finite_tree(poisoned, "pose result")
