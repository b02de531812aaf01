"""Relocalization-triggered drift correction (beyond-reference feature).

The reference's Relocalization (ref src/Tracking.cc:2212-2373) re-poses the
tracker but never touches the map: keyframes/landmarks created during a
drifted approach keep their drifted poses. Here a successful reloc feeds the
standard loop machinery (LoopCloser.on_relocalization): Sim3 verification
between the last pre-loss keyframe and the matched candidate, essential-graph
correction, SearchAndFuse. These tests inject a known drift into the most
recent keyframe (+ its landmarks) and assert the correction recovers it.
"""
import dataclasses

import numpy as np
import jax.numpy as jnp
import pytest

from slam_dynamic_tpu.io.synthetic import SynthConfig, generate
from tests.test_e2e_slam import make_system


def orbit_cfg(n=40):
    return SynthConfig(n_frames=n, width=320, height=240, fx=260.0,
                       fy=260.0, cx=159.5, cy=119.5, trajectory="orbit")


def built_system(n_track=30, trajectory="orbit"):
    scfg = orbit_cfg(n_track + 4)
    if trajectory != "orbit":
        scfg = dataclasses.replace(scfg, trajectory=trajectory)
    seq = generate(scfg)
    sys_ = make_system(scfg)
    tr = dataclasses.replace(sys_.cfg.tracking, max_frames_between_kf=4)
    sys_.cfg = sys_.cfg.replace(tracking=tr)
    sys_.tracker.cfg = sys_.cfg
    for i in range(n_track):
        st = sys_.track_rgbd(seq.gray[i], seq.depth[i],
                             float(seq.timestamps[i]))
    assert st.state == "OK"
    sys_._ensure_voc()
    return sys_, seq


def inject_drift(sys_, k_last, dt=np.array([0.04, -0.02, 0.03])):
    """Reproduce a drifted revisit: every landmark k_last observes is
    replaced by a DUPLICATE map entry offset by the rigid world drift `dt`
    (what re-triangulating already-mapped scene through a drifted pose
    chain creates — the endurance-trace failure mode, RESULTS.md r5), and
    k_last's camera is moved consistently (t' = t - R dt keeps its own
    reprojections self-consistent, like real drift does)."""
    m = sys_.tracker.map
    obs_k = np.array(m.kf_obs_lm[k_last])
    src = np.unique(obs_k[obs_k >= 0])
    free = np.nonzero(~np.asarray(m.lm_valid))[0]
    assert len(free) >= len(src), "landmark capacity too small for test"
    dup = free[:len(src)]
    remap = dict(zip(src.tolist(), dup.tolist()))
    lm_pos = np.array(m.lm_pos)
    lm_desc = np.array(m.lm_desc)
    lm_valid = np.array(m.lm_valid)
    lm_first = np.array(m.lm_first_kf)
    lm_pos[dup] = lm_pos[src] + dt[None, :]
    lm_desc[dup] = lm_desc[src]
    lm_valid[dup] = True
    lm_first[dup] = k_last
    obs_new = np.array([remap.get(int(o), int(o)) if o >= 0 else -1
                        for o in obs_k], np.int32)
    R_k = np.asarray(m.kf_R[k_last])
    t_new = np.asarray(m.kf_t[k_last]) - R_k @ dt
    sys_.tracker.map = m._replace(
        kf_t=m.kf_t.at[k_last].set(jnp.asarray(t_new, jnp.float32)),
        kf_obs_lm=m.kf_obs_lm.at[k_last].set(jnp.asarray(obs_new)),
        lm_pos=jnp.asarray(lm_pos, jnp.float32),
        lm_desc=jnp.asarray(lm_desc),
        lm_valid=jnp.asarray(lm_valid),
        lm_first_kf=jnp.asarray(lm_first, jnp.int32))
    sys_.tracker._kf_pose_cache.clear()
    return dt


@pytest.mark.slow
def test_on_relocalization_corrects_injected_drift():
    sys_, _ = built_system()
    m = sys_.tracker.map
    k_last = sys_.tracker.last_kf_id
    # candidate: an early keyframe sharing landmarks with k_last (the
    # duplicates will descriptor-match cand's originals)
    obs = np.asarray(m.kf_obs_lm[k_last])
    obs = set(obs[obs >= 0].tolist())
    cand = -1
    fids = np.asarray(m.kf_frame_id)
    for k in np.argsort(fids):
        k = int(k)
        if not bool(m.kf_valid[k]) or k == k_last:
            continue
        ko = np.asarray(m.kf_obs_lm[k])
        if len(obs & set(ko[ko >= 0].tolist())) >= 30:
            cand = k
            break
    assert cand >= 0
    t_before = np.asarray(m.kf_t[k_last]).copy()
    inject_drift(sys_, k_last)
    drift_mag = float(np.linalg.norm(
        np.asarray(sys_.tracker.map.kf_t[k_last]) - t_before))
    assert drift_mag > 0.04          # injection took
    sys_._on_reloc(k_last, cand)
    assert getattr(sys_, "last_loop", None) is not None \
        and sys_.last_loop.closed, "correction did not fire"
    t_after = np.asarray(sys_.tracker.map.kf_t[k_last])
    resid = float(np.linalg.norm(t_after - t_before))
    assert resid < 0.35 * drift_mag, (resid, drift_mag)


@pytest.mark.slow
def test_on_relocalization_depth_fallback_no_landmarks():
    """When the drifted keyframe has NO surviving landmark observations
    (the endurance first-loss shape: 'bow_matches 0' — the thinning map
    culled them), the depth-based Sim3 fallback must still measure and
    correct the drift from the keyframes' own measured depth."""
    sys_, _ = built_system()
    m = sys_.tracker.map
    k_last = sys_.tracker.last_kf_id
    fids = np.asarray(m.kf_frame_id)
    valid = np.asarray(m.kf_valid)
    cand = -1
    for k in np.argsort(fids):
        if valid[int(k)] and int(k) != k_last:
            cand = int(k)
            break
    assert cand >= 0
    dt = np.array([0.04, -0.02, 0.03])
    R_k = np.asarray(m.kf_R[k_last])
    t_before = np.asarray(m.kf_t[k_last]).copy()
    t_new = t_before - R_k @ dt
    # cull every observation of k_last AND shift its pose: the landmark
    # matcher now has zero pairs, only depth can recover the drift
    sys_.tracker.map = m._replace(
        kf_t=m.kf_t.at[k_last].set(jnp.asarray(t_new, jnp.float32)),
        kf_obs_lm=m.kf_obs_lm.at[k_last].set(-1))
    sys_.tracker._kf_pose_cache.clear()
    drift_mag = float(np.linalg.norm(t_new - t_before))
    sys_.last_loop = None
    sys_._on_reloc(k_last, cand)
    assert getattr(sys_, "last_loop", None) is not None \
        and sys_.last_loop.closed, "depth fallback did not fire"
    t_after = np.asarray(sys_.tracker.map.kf_t[k_last])
    resid = float(np.linalg.norm(t_after - t_before))
    assert resid < 0.35 * drift_mag, (resid, drift_mag)


@pytest.mark.slow
def test_on_relocalization_noop_when_no_drift():
    """A clean map must NOT be churned: the below-noise gate skips the
    pose-graph run when the Sim3 measurement agrees with the estimates."""
    sys_, _ = built_system()
    m = sys_.tracker.map
    k_last = sys_.tracker.last_kf_id
    fids = np.asarray(m.kf_frame_id)
    valid = np.asarray(m.kf_valid)
    cand = int(np.argsort(fids)[0]) if valid[int(np.argsort(fids)[0])] else 0
    R0 = np.asarray(m.kf_R).copy()
    t0 = np.asarray(m.kf_t).copy()
    sys_.last_loop = None
    sys_._on_reloc(k_last, cand)
    assert not (getattr(sys_, "last_loop", None)
                and sys_.last_loop.closed)
    np.testing.assert_allclose(np.asarray(sys_.tracker.map.kf_R), R0)
    np.testing.assert_allclose(np.asarray(sys_.tracker.map.kf_t), t0)


@pytest.mark.slow
def test_tracker_invokes_on_reloc_hook():
    """_relocalize_then_track must call on_reloc(k_last, cand) on success
    (and accept legacy 4-tuple relocalizer doubles without one)."""
    sys_, seq = built_system(n_track=20, trajectory="sweep")
    calls = []
    sys_.tracker.on_reloc = lambda k_last, cand: calls.append((k_last, cand))
    # kidnap -> LOST
    flat = np.full_like(seq.gray[0], 120.0)
    zdep = np.zeros_like(seq.depth[0])
    for j in range(2):
        st = sys_.track_rgbd(flat, zdep, 10.0 + j * 0.03)
    assert st.state == "LOST"
    k_last = sys_.tracker.last_kf_id
    st = sys_.track_rgbd(seq.gray[5], seq.depth[5], 11.0)
    assert st.state == "OK"
    assert calls and calls[0][0] == k_last and calls[0][1] >= 0


def test_tracker_accepts_legacy_4tuple_relocalizer():
    sys_, seq = built_system()
    sys_.tracker.relocalizer = lambda f: (False, None, None, None)
    flat = np.full_like(seq.gray[0], 120.0)
    zdep = np.zeros_like(seq.depth[0])
    for j in range(3):
        st = sys_.track_rgbd(flat, zdep, 10.0 + j * 0.03)
    assert st.state == "LOST"      # no crash unpacking the 4-tuple
