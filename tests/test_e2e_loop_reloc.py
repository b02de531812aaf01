"""End-to-end loop closure + relocalization on synthetic sequences."""
import dataclasses

import numpy as np
import pytest

from slam_dynamic_tpu.io.synthetic import SynthConfig, generate
from slam_dynamic_tpu.io.evo import ate_rmse
from tests.test_e2e_slam import make_system


def orbit_cfg(n=100):
    return SynthConfig(n_frames=n, width=320, height=240, fx=260.0,
                       fy=260.0, cx=159.5, cy=119.5, trajectory="orbit")


def dense_kf(sys_, loop_on=True):
    tr = dataclasses.replace(sys_.cfg.tracking, max_frames_between_kf=5)
    lp = dataclasses.replace(sys_.cfg.loop, enabled=loop_on)
    sys_.cfg = sys_.cfg.replace(tracking=tr, loop=lp)
    sys_.tracker.cfg = sys_.cfg
    return sys_


@pytest.mark.slow
def test_loop_closure_reduces_drift():
    scfg = orbit_cfg()
    seq = generate(scfg)
    results = {}
    for loop_on in (False, True):
        sys_ = dense_kf(make_system(scfg), loop_on)
        loops = 0
        for i in range(seq.gray.shape[0]):
            sys_.track_rgbd(seq.gray[i], seq.depth[i],
                            float(seq.timestamps[i]))
            ll = getattr(sys_, "last_loop", None)
            if ll and ll.closed:
                loops += 1
                sys_.last_loop = None
        est = np.stack([-R.T @ t for _, R, t in sys_.trajectory])
        est_w = (seq.R_wc[0] @ est.T).T + seq.t_wc[0]
        gt = seq.t_wc[:len(est)]
        results[loop_on] = (ate_rmse(est_w, gt, align=False), loops)
    ate_off, loops_off = results[False]
    ate_on, loops_on = results[True]
    assert loops_off == 0 and loops_on >= 1
    assert ate_on < 0.75 * ate_off, (ate_on, ate_off)
    assert ate_on < 0.15


@pytest.mark.slow
def test_relocalization_after_kidnap():
    scfg = SynthConfig(n_frames=24, width=320, height=240, fx=260.0,
                       fy=260.0, cx=159.5, cy=119.5)
    seq = generate(scfg)
    sys_ = dense_kf(make_system(scfg))
    for i in range(20):
        st = sys_.track_rgbd(seq.gray[i], seq.depth[i],
                             float(seq.timestamps[i]))
    assert st.state == "OK"
    # kidnap: flat frames kill tracking
    flat = np.full_like(seq.gray[0], 120.0)
    zdep = np.zeros_like(seq.depth[0])
    for j in range(2):
        st = sys_.track_rgbd(flat, zdep, 1.0 + j * 0.03)
    assert st.state == "LOST"
    # show an earlier view again -> relocalize near that pose
    st = sys_.track_rgbd(seq.gray[5], seq.depth[5], 2.0)
    assert st.state == "OK", st
    ts, R, t = sys_.trajectory[-1]
    center = -np.asarray(R).T @ np.asarray(t)
    gt_center = seq.t_wc[5]
    assert np.linalg.norm(center - gt_center) < 0.05


@pytest.mark.slow
def test_bow_fallback_recovers_jump_without_reloc():
    """Motion-model + wide-radius search fail on a violent view jump, but
    the BoW fallback (ungated descriptor match vs the reference keyframe)
    recovers WITHOUT relocalization — the TrackReferenceKeyFrame analog
    (ref Tracking.cc:1618-1660). Canary: with bow_fallback=False the same
    jump goes LOST."""
    scfg = orbit_cfg(100)          # ~3.7 deg yaw/frame
    seq = generate(scfg)

    def run(fallback: bool):
        sys_ = dense_kf(make_system(scfg))
        sys_.cfg = sys_.cfg.replace(tracking=dataclasses.replace(
            sys_.cfg.tracking, bow_fallback=fallback))
        sys_.tracker.cfg = sys_.cfg
        calls = []
        sys_.tracker.relocalizer = \
            lambda f: (calls.append(1), (False, None, None, None))[1]
        for i in range(14):
            st = sys_.track_rgbd(seq.gray[i], seq.depth[i],
                                 float(seq.timestamps[i]))
        assert st.state == "OK"
        # teleport 4 frames ahead: ~15 deg yaw = ~68 px projection shift,
        # beyond the 2x-radius wide fallback (30 px) but well inside the
        # reference keyframe's view
        st = sys_.track_rgbd(seq.gray[18], seq.depth[18],
                             float(seq.timestamps[18]))
        return sys_, st, calls

    sys_, st, calls = run(fallback=True)
    assert st.state == "OK", st
    assert not calls                       # reloc was never consulted
    ts, R, t = sys_.trajectory[-1]
    center = -np.asarray(R).T @ np.asarray(t)
    center_w = seq.R_wc[0] @ center + seq.t_wc[0]
    # mono pose-opt vs ONE keyframe's landmarks: coarse but in the basin
    assert np.linalg.norm(center_w - seq.t_wc[18]) < 0.15
    # normal tracking resumes from the recovered pose and re-converges
    for i in range(19, 23):
        st = sys_.track_rgbd(seq.gray[i], seq.depth[i],
                             float(seq.timestamps[i]))
        assert st.state == "OK", (i, st)
    ts, R, t = sys_.trajectory[-1]
    center_w = seq.R_wc[0] @ (-np.asarray(R).T @ np.asarray(t)) \
        + seq.t_wc[0]
    assert np.linalg.norm(center_w - seq.t_wc[22]) < 0.12
    # canary validity: without the fallback this jump is LOST
    _, st2, _ = run(fallback=False)
    assert st2.state == "LOST", st2


@pytest.mark.slow
def test_relocalization_after_kidnap_planar_wall():
    """Kidnap facing a PLANAR scene: the camera starts near the back wall
    so every landmark lies on one plane — the 6-point-DLT degeneracy the
    reference's EPnP tolerates (PnPsolver.cc). The homography-hypothesis
    family in ransac_pnp must relocalize here."""
    scfg = SynthConfig(n_frames=24, width=320, height=240, fx=260.0,
                       fy=260.0, cx=159.5, cy=119.5, z_start=5.8,
                       advance=0.01, sway=0.15, yaw_amp=0.04)
    seq = generate(scfg)
    # the scene really is one plane: every valid depth pixel on the back
    # wall z=9 (camera z ~5.8-6.1 -> depth ~2.8-3.3)
    d0 = seq.depth[0]
    assert float((d0 > 0).mean()) > 0.99
    sys_ = dense_kf(make_system(scfg))
    for i in range(20):
        st = sys_.track_rgbd(seq.gray[i], seq.depth[i],
                             float(seq.timestamps[i]))
    assert st.state == "OK"
    flat = np.full_like(seq.gray[0], 120.0)
    zdep = np.zeros_like(seq.depth[0])
    for j in range(2):
        st = sys_.track_rgbd(flat, zdep, 1.0 + j * 0.03)
    assert st.state == "LOST"
    st = sys_.track_rgbd(seq.gray[5], seq.depth[5], 2.0)
    assert st.state == "OK", st
    ts, R, t = sys_.trajectory[-1]
    center = -np.asarray(R).T @ np.asarray(t)      # tracker frame (cam 0)
    center_w = seq.R_wc[0] @ center + seq.t_wc[0]
    assert np.linalg.norm(center_w - seq.t_wc[5]) < 0.05


@pytest.mark.slow
def test_double_orbit_fusion_bounds_map():
    """Two revolutions over the same scene: the first closure's
    SearchAndFuse collapses duplicate landmarks, so the second pass binds
    the EXISTING map (covisible with pass 1 -> correctly no second loop
    trigger, like the reference) and landmark growth flattens."""
    from slam_dynamic_tpu.config import CapacityConfig
    scfg = dataclasses.replace(orbit_cfg(170), orbit_turns=2.1)
    seq = generate(scfg)
    cap = CapacityConfig(max_keyframes=64, max_landmarks=8192,
                         max_keypoints=1024, local_ba_keyframes=8,
                         local_ba_landmarks=2048)
    sys_ = dense_kf(make_system(scfg, capacity=cap), loop_on=True)
    loops = 0
    lm_at_loop = None
    for i in range(seq.gray.shape[0]):
        sys_.track_rgbd(seq.gray[i], seq.depth[i],
                        float(seq.timestamps[i]))
        ll = getattr(sys_, "last_loop", None)
        if ll and ll.closed:
            loops += 1
            sys_.last_loop = None
            if lm_at_loop is None:
                lm_at_loop = int(np.asarray(
                    sys_.tracker.map.lm_valid).sum())
    m = sys_.tracker.map
    assert loops >= 1, loops
    assert int(m.n_loop) >= 1       # constraint recorded for future runs
    # pass 2 re-observes pass-1 structure: the map must not double
    lm_end = int(np.asarray(m.lm_valid).sum())
    assert lm_end < 1.7 * lm_at_loop, (lm_at_loop, lm_end)
    est = np.stack([-R.T @ t for _, R, t in sys_.trajectory])
    est_w = (seq.R_wc[0] @ est.T).T + seq.t_wc[0]
    gt = seq.t_wc[:len(est)]
    assert ate_rmse(est_w, gt, align=False) < 0.20


def test_persistent_loop_edge_in_second_correction():
    """A SECOND essential-graph correction must include the FIRST loop's
    stored constraint: after correcting loop B, the relative pose across
    loop A's pair stays at A's measured constraint instead of drifting
    (ref KeyFrame::mspLoopEdges -> OptimizeEssentialGraph,
    /root/reference/src/Optimizer.cc:826-846)."""
    import dataclasses as dc
    import jax.numpy as jnp
    from slam_dynamic_tpu.config import (SystemConfig, CameraConfig,
                                         CapacityConfig)
    from slam_dynamic_tpu.worldmap.state import empty_map
    from slam_dynamic_tpu.backend.loop_closing import LoopCloser
    from slam_dynamic_tpu.models import vocabulary as voc_mod
    from slam_dynamic_tpu.system import intrinsics_from_config

    rng = np.random.RandomState(0)
    cfg = SystemConfig(camera=CameraConfig(fx=260.0, fy=260.0, cx=160.0,
                                           cy=120.0, width=320, height=240),
                       capacity=CapacityConfig(
                           max_keyframes=16, max_landmarks=256,
                           max_keypoints=64))
    cam = intrinsics_from_config(cfg)
    voc = voc_mod.train(rng.randint(0, 2 ** 32, (64, 8),
                                    dtype=np.uint64).astype(np.uint32),
                        k=4, levels=2)
    lc = LoopCloser(cfg, cam, voc)

    # 12 KFs around a circle with accumulated yaw drift; chain covisibility
    m = empty_map(cfg.capacity)
    K = 12
    kf_R = np.tile(np.eye(3, dtype=np.float32), (16, 1, 1))
    kf_t = np.zeros((16, 3), np.float32)
    drift = 0.02
    for k in range(K):
        th = 2 * np.pi * k / 10 + drift * k
        c, s = np.cos(th), np.sin(th)
        kf_R[k] = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]], np.float32)
        kf_t[k] = np.array([0.1 * k * drift, 0, 0], np.float32)
    covis = np.zeros((16, 16), np.int32)
    for k in range(1, K):
        covis[k, k - 1] = covis[k - 1, k] = 120
    m = m._replace(kf_R=jnp.asarray(kf_R), kf_t=jnp.asarray(kf_t),
                   kf_valid=jnp.asarray(np.arange(16) < K),
                   covis=jnp.asarray(covis),
                   n_kf=jnp.int32(K))

    # loop A: KF 10 == KF 0 (identity relative measure)
    m = lc._correct(m, 10, 0, 1.0, jnp.eye(3), jnp.zeros(3))
    assert int(m.n_loop) == 1
    RA = np.asarray(m.kf_R[10] @ m.kf_R[0].T)
    assert np.arccos(np.clip((np.trace(RA) - 1) / 2, -1, 1)) < 0.02
    # loop B: KF 11 == KF 1. B has MORE edges than A (A's persistent loop
    # edge joins the graph) — the fixed-capacity padding must keep both
    # closures on ONE compiled optimize_pose_graph executable (a fresh
    # compile through the axon tunnel costs minutes).
    from slam_dynamic_tpu.optim.pose_graph import optimize_pose_graph
    n_compiled = optimize_pose_graph._cache_size()
    m = lc._correct(m, 11, 1, 1.0, jnp.eye(3), jnp.zeros(3))
    assert optimize_pose_graph._cache_size() == n_compiled
    assert int(m.n_loop) == 2
    # loop A's constraint survives the second correction
    RA2 = np.asarray(m.kf_R[10] @ np.asarray(m.kf_R[0]).T)
    assert np.arccos(np.clip((np.trace(RA2) - 1) / 2, -1, 1)) < 0.02


@pytest.mark.slow
def test_amortized_gba_after_loop():
    """run_global_ba now amortizes over subsequent frames (no inline
    full-map solve on the loop frame) and still reduces drift."""
    scfg = orbit_cfg()
    seq = generate(scfg)
    sys_ = dense_kf(make_system(scfg), loop_on=True)
    lp = dataclasses.replace(sys_.cfg.loop, run_global_ba=True)
    sys_.cfg = sys_.cfg.replace(loop=lp)
    sys_.tracker.cfg = sys_.cfg
    loops = 0
    for i in range(seq.gray.shape[0]):
        sys_.track_rgbd(seq.gray[i], seq.depth[i],
                        float(seq.timestamps[i]))
        ll = getattr(sys_, "last_loop", None)
        if ll and ll.closed:
            loops += 1
            sys_.last_loop = None
    assert loops >= 1
    est = np.stack([-R.T @ t for _, R, t in sys_.trajectory])
    est_w = (seq.R_wc[0] @ est.T).T + seq.t_wc[0]
    gt = seq.t_wc[:len(est)]
    assert ate_rmse(est_w, gt, align=False) < 0.15
