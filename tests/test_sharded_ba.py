"""Distributed (landmark-sharded) BA vs single-device BA on the virtual
8-device CPU mesh."""
import numpy as np
import jax
import jax.numpy as jnp

from slam_dynamic_tpu.optim.local_ba import BAProblem, bundle_adjust
from slam_dynamic_tpu.parallel.mesh import make_mesh
from slam_dynamic_tpu.parallel import sharded_ba as sba
from tests.test_optim import _ba_problem, CAM


def to_sharded(problem: BAProblem, n_shards: int, O_cap: int):
    L = problem.points.shape[0]
    O = problem.obs_kf.shape[0]
    # pad L to multiple of shards
    Lp = ((L + n_shards - 1) // n_shards) * n_shards
    pad_l = Lp - L
    pts = np.pad(np.asarray(problem.points), ((0, pad_l), (0, 0)))
    lmv = np.pad(np.asarray(problem.lm_valid), (0, pad_l))
    # pad O
    pad_o = O_cap - O
    okf = np.pad(np.asarray(problem.obs_kf), (0, pad_o))
    olm = np.pad(np.asarray(problem.obs_lm), (0, pad_o))
    ouv = np.pad(np.asarray(problem.obs_uv), ((0, pad_o), (0, 0)))
    ois = np.pad(np.asarray(problem.obs_inv_sigma2), (0, pad_o))
    oval = np.pad(np.asarray(problem.obs_valid), (0, pad_o))
    ourw = np.pad(np.asarray(problem.obs_ur_weight), (0, pad_o))
    perm, oval_p, ok = sba.partition_obs_by_landmark(olm, oval, n_shards,
                                                     Lp, O_cap)
    assert ok
    sp = ShardedProblem = sba.ShardedBAProblem(
        kf_R=problem.kf_R, kf_t=problem.kf_t, kf_fixed=problem.kf_fixed,
        kf_valid=problem.kf_valid,
        points=jnp.asarray(pts), lm_valid=jnp.asarray(lmv),
        obs_kf=jnp.asarray(okf[perm]), obs_lm=jnp.asarray(olm[perm]),
        obs_uv=jnp.asarray(ouv[perm]),
        obs_inv_sigma2=jnp.asarray(ois[perm]),
        obs_valid=jnp.asarray(oval_p),
        obs_ur_weight=jnp.asarray(ourw[perm]))
    return sp, Lp


def test_sharded_ba_matches_ground_truth(rng):
    assert jax.device_count() >= 8
    problem, Rs_gt, ts_gt, pts_gt = _ba_problem(rng, K=6, L=160, stereo=True)
    n_shards = 8
    O_cap = 1280
    sp, Lp = to_sharded(problem, n_shards, O_cap)
    mesh = make_mesh(8)
    run = sba.make_sharded_ba(mesh, CAM, K=6, L=Lp, O=O_cap, stereo=True,
                              iters=15)
    kf_R, kf_t, pts = run(sp)
    t_err = np.linalg.norm(np.asarray(kf_t) - ts_gt, axis=1)
    assert t_err.max() < 0.02, t_err
    p_err = np.linalg.norm(np.asarray(pts)[:160] - pts_gt, axis=1)
    assert np.median(p_err) < 0.03


def test_sharded_matches_single_device(rng):
    """Sharded result ~= single-device bundle_adjust result."""
    problem, Rs_gt, ts_gt, pts_gt = _ba_problem(rng, K=5, L=120, stereo=True)
    res1 = bundle_adjust(CAM, problem, stereo=True)
    sp, Lp = to_sharded(problem, 8, 1024)
    mesh = make_mesh(8)
    run = sba.make_sharded_ba(mesh, CAM, K=5, L=Lp, O=1024, stereo=True,
                              iters=15)
    kf_R, kf_t, pts = run(sp)
    # both converge to the same optimum
    np.testing.assert_allclose(np.asarray(kf_t), np.asarray(res1.kf_t),
                               atol=5e-3)


def _perturbed_map(rng):
    """A small MapState: 3 KFs observing 48 landmarks, later poses and all
    landmark positions perturbed. Returns (map, true_points, L)."""
    import jax.numpy as jnp
    from slam_dynamic_tpu.config import CapacityConfig
    from slam_dynamic_tpu.worldmap.state import empty_map, insert_keyframe, \
        add_landmarks
    from slam_dynamic_tpu.utils.camera import project_stereo
    from slam_dynamic_tpu.utils import se3 as se3m

    cap = CapacityConfig(max_keyframes=8, max_landmarks=64, max_keypoints=64)
    m = empty_map(cap)
    L = 48
    pts = np.stack([rng.uniform(-2, 2, L), rng.uniform(-1.5, 1.5, L),
                    rng.uniform(4, 9, L)], 1).astype(np.float32)
    # 3 KFs observing all 48 landmarks
    for k in range(3):
        xi = np.array([0.3 * k, 0, 0, 0, 0.01 * k, 0], np.float32)
        R, t = se3m.se3_exp(jnp.asarray(xi))
        xc = pts @ np.asarray(R).T + np.asarray(t)
        uvr = np.array(project_stereo(CAM, jnp.asarray(xc)))
        xy = np.zeros((64, 2), np.float32)
        xy[:L] = uvr[:, :2]
        ur = np.full(64, -1.0, np.float32)
        ur[:L] = uvr[:, 2]
        dep = np.full(64, -1.0, np.float32)
        dep[:L] = xc[:, 2]
        obs = np.full(64, -1, np.int32)
        obs[:L] = np.arange(L)
        if k == 0:
            # create landmarks bound to KF0 (positions perturbed)
            m = insert_keyframe(m, R, t, k, 0.1 * k, jnp.asarray(xy),
                                jnp.zeros(64, jnp.int32), jnp.zeros(64),
                                jnp.zeros((64, 8), jnp.uint32),
                                jnp.asarray(np.arange(64) < L),
                                jnp.asarray(ur), jnp.asarray(dep),
                                jnp.full(64, -1, jnp.int32))
            m = add_landmarks(
                m, jnp.asarray(pts + rng.normal(0, 0.1, pts.shape
                                                ).astype(np.float32)),
                jnp.zeros((64, 8), jnp.uint32)[:L],
                jnp.tile(jnp.asarray([0., 0, 1]), (L, 1)),
                jnp.full(L, 0.5), jnp.full(L, 50.0),
                jnp.zeros(L, jnp.int32), jnp.arange(L, dtype=jnp.int32),
                jnp.ones(L, bool))
        else:
            # perturb later poses
            dxi = np.concatenate([rng.normal(0, 0.05, 3),
                                  rng.normal(0, 0.01, 3)]).astype(np.float32)
            R2, t2 = se3m.se3_retract(R, t, jnp.asarray(dxi))
            m = insert_keyframe(m, R2, t2, k, 0.1 * k, jnp.asarray(xy),
                                jnp.zeros(64, jnp.int32), jnp.zeros(64),
                                jnp.zeros((64, 8), jnp.uint32),
                                jnp.asarray(np.arange(64) < L),
                                jnp.asarray(ur), jnp.asarray(dep),
                                jnp.asarray(obs))
    return m, pts, L


def test_global_ba_from_mapstate(rng):
    """global_bundle_adjust reduces reprojection error of a perturbed map."""
    from slam_dynamic_tpu.backend.global_ba import global_bundle_adjust
    m, pts, L = _perturbed_map(rng)
    m2 = global_bundle_adjust(m, CAM, stereo=True, iters=12, n_devices=4)
    p_err = np.linalg.norm(np.asarray(m2.lm_pos)[:L] - pts, axis=1)
    assert np.median(p_err) < 0.02, np.median(p_err)


def test_amortized_gba_matches_inline(rng):
    """AmortizedGBA (sliced GN + merge) converges like the inline solve, and
    keyframes inserted AFTER the snapshot keep their relative transform to
    the parent through the merge (the reference's background-GBA merge,
    LoopClosing.cc:698-748)."""
    from slam_dynamic_tpu.backend.global_ba import AmortizedGBA
    from slam_dynamic_tpu.worldmap.state import insert_keyframe
    import jax.numpy as jnp

    m, pts, L = _perturbed_map(rng)
    gba = AmortizedGBA(m, CAM, stereo=True, total_iters=12, slice_iters=3,
                       n_devices=4)
    n_steps = 0
    while not gba.done:
        gba.step()
        n_steps += 1
    assert n_steps == 4
    # a keyframe inserted DURING the solve (after the snapshot), covisible
    # with KF 2 through shared observations
    obs = np.asarray(m.kf_obs_lm[2])
    m_live = insert_keyframe(
        m, m.kf_R[2], m.kf_t[2] + jnp.asarray([0.05, 0, 0]),
        3, 0.3, m.kf_kp_xy[2], m.kf_kp_level[2], jnp.zeros(64),
        m.kf_kp_desc[2], m.kf_kp_valid[2], m.kf_kp_ur[2], m.kf_kp_depth[2],
        jnp.asarray(obs))
    # the merge propagates through the STRONGEST snapshot covisible (ties
    # break to the lowest index) — compute the same parent here
    par = int(np.argmax(np.asarray(m_live.covis[3])[:3]))
    R_rel0 = np.asarray(m_live.kf_R[3] @ m_live.kf_R[par].T)
    t_rel0 = np.asarray(m_live.kf_t[3]) - R_rel0 @ np.asarray(m_live.kf_t[par])
    m2 = gba.merge(m_live)
    p_err = np.linalg.norm(np.asarray(m2.lm_pos)[:L] - pts, axis=1)
    assert np.median(p_err) < 0.02, np.median(p_err)
    # propagation invariant: relative pose new-KF -> parent unchanged
    R_rel1 = np.asarray(m2.kf_R[3] @ np.asarray(m2.kf_R[par]).T)
    np.testing.assert_allclose(R_rel1, R_rel0, atol=1e-5)
    t_rel1 = np.asarray(m2.kf_t[3]) - R_rel1 @ np.asarray(m2.kf_t[par])
    np.testing.assert_allclose(t_rel1, t_rel0, atol=1e-5)
