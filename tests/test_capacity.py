"""Capacity-ceiling behavior: keyframe slot recycling at max_keyframes.

The reference deletes redundant KeyFrame objects (KeyFrameCulling,
/root/reference/src/LocalMapping.cc:633-697) so its map never exhausts;
the fixed-capacity SoA recycles culled rows instead (state.next_kf_slot).
KITTI-length sequences (4.5k frames) therefore keep inserting keyframes
at capacity instead of silently freezing the map.
"""
import dataclasses

import numpy as np
import jax.numpy as jnp
import pytest

from slam_dynamic_tpu.config import CapacityConfig
from slam_dynamic_tpu.io.evo import ate_rmse
from slam_dynamic_tpu.io.synthetic import SynthConfig, generate
from slam_dynamic_tpu.worldmap.state import (empty_map, insert_keyframe,
                                             next_kf_slot)
from tests.test_e2e_slam import make_system


def _insert(m, k):
    N = m.kf_obs_lm.shape[1]
    xy = jnp.zeros((N, 2))
    lv = jnp.zeros(N, jnp.int32)
    an = jnp.zeros(N)
    dd = jnp.zeros((N, 8), jnp.uint32)
    vv = jnp.zeros(N, bool)
    ur = jnp.full(N, -1.0)
    dp = jnp.full(N, -1.0)
    obs = jnp.full(N, -1, jnp.int32)
    return insert_keyframe(m, jnp.eye(3), jnp.zeros(3), jnp.int32(k),
                           jnp.float32(0.1 * k), xy, lv, an, dd, vv, ur,
                           dp, obs)


def test_slot_reuse_after_cull():
    cap = CapacityConfig(max_keyframes=4, max_landmarks=64,
                         max_keypoints=16)
    m = empty_map(cap)
    for k in range(4):
        m = _insert(m, k)
    assert int(m.n_kf) == 4
    # full, nothing culled -> no slot
    slot, ok = next_kf_slot(m)
    assert not bool(ok)
    m2 = _insert(m, 4)                       # must no-op
    assert int(m2.n_kf) == 4
    np.testing.assert_array_equal(np.asarray(m2.kf_frame_id),
                                  np.asarray(m.kf_frame_id))
    # cull slot 2 -> next insert recycles it, n_kf stays at capacity
    m = m._replace(kf_valid=m.kf_valid.at[2].set(False))
    slot, ok = next_kf_slot(m)
    assert bool(ok) and int(slot) == 2
    m = _insert(m, 7)
    assert int(m.n_kf) == 4
    assert bool(m.kf_valid[2])
    assert int(m.kf_frame_id[2]) == 7        # new tenant
    # nothing culled again -> full again
    _, ok = next_kf_slot(m)
    assert not bool(ok)


def test_slot_reuse_invalidates_stale_loop_edges():
    """A persistent loop edge referencing a recycled slot must be
    invalidated — replaying it would constrain two unrelated cameras."""
    from slam_dynamic_tpu.worldmap.state import add_loop_edge
    cap = CapacityConfig(max_keyframes=4, max_landmarks=64,
                         max_keypoints=16)
    m = empty_map(cap)
    for k in range(4):
        m = _insert(m, k)
    m = add_loop_edge(m, 3, 1, 1.0, jnp.eye(3), jnp.zeros(3))
    m = add_loop_edge(m, 3, 0, 1.0, jnp.eye(3), jnp.zeros(3))
    assert int(m.n_loop) == 2 and bool(m.loop_valid[0])
    # cull slot 1 -> recycle it: edge (3,1) dies, edge (3,0) survives
    m = m._replace(kf_valid=m.kf_valid.at[1].set(False))
    m = _insert(m, 9)
    assert int(m.kf_frame_id[1]) == 9
    assert not bool(m.loop_valid[0])
    assert bool(m.loop_valid[1])


def test_forced_eviction_when_full():
    """Full store + nothing redundancy-culled -> evict_if_full drops the
    least-covisible-with-current keyframe (slot 0 and the current KF are
    immune); a non-full map is untouched."""
    import jax.numpy as jnp
    from slam_dynamic_tpu.backend.fusion import evict_if_full
    cap = CapacityConfig(max_keyframes=4, max_landmarks=64,
                         max_keypoints=16)
    m = empty_map(cap)
    for k in range(3):
        m = _insert(m, k)
    # non-full: no-op
    m2 = evict_if_full(m, jnp.int32(2))
    np.testing.assert_array_equal(np.asarray(m2.kf_valid),
                                  np.asarray(m.kf_valid))
    m = _insert(m, 3)
    covis = np.zeros((4, 4), np.int32)
    covis[3, 1] = covis[1, 3] = 5     # slot 1 weakly tied to current
    covis[3, 2] = covis[2, 3] = 80
    m = m._replace(covis=jnp.asarray(covis))
    m = evict_if_full(m, jnp.int32(3))
    v = np.asarray(m.kf_valid)
    assert not v[1] and v[0] and v[2] and v[3]
    slot, ok = next_kf_slot(m)
    assert bool(ok) and int(slot) == 1


@pytest.mark.slow
def test_reinit_after_prolonged_loss_preserves_trajectory():
    """A loss that relocalization cannot rescue (kidnap into NEVER-mapped
    terrain) must not deadlock: after max_lost_frames the tracker
    reinitializes a fresh map; the pre-break trajectory survives as
    absolute poses and tracking resumes."""
    scfg = SynthConfig(n_frames=40, width=320, height=240, fx=260.0,
                       fy=260.0, cx=159.5, cy=119.5)
    seq = generate(scfg)
    # a second world the first map never saw (kidnap target)
    scfg2 = dataclasses.replace(scfg, seed=7, z_start=5.8, advance=0.01,
                                sway=0.1, texture_cells=4.0)
    seq2 = generate(scfg2)
    sys_ = make_system(scfg)
    tr = dataclasses.replace(sys_.cfg.tracking, max_lost_frames=6)
    sys_.cfg = sys_.cfg.replace(tracking=tr)
    sys_.tracker.cfg = sys_.cfg
    for i in range(15):
        st = sys_.track_rgbd(seq.gray[i], seq.depth[i],
                             float(seq.timestamps[i]))
    assert st.state == "OK"
    n_before = len(sys_.tracker.trajectory)
    # kidnap into the unseen world: reloc has no target
    states = []
    for j in range(12):
        st = sys_.track_rgbd(seq2.gray[j], seq2.depth[j], 5.0 + j * 0.033)
        states.append(st.state)
    assert "NOT_INITIALIZED" in states          # the reset fired
    assert states[-1] == "OK", states           # and tracking resumed
    traj = sys_.trajectory
    assert len(traj) >= n_before                # pre-break poses survived
    ts = [t for t, _, _ in traj]
    assert ts == sorted(ts)


@pytest.mark.slow
def test_endurance_tracking_at_kf_capacity():
    """Sequence long enough (with a forced dense KF cadence) that the
    keyframe store fills: KF culling + slot recycling must keep
    insertions flowing (kf_seq > capacity) with the map bounded and ATE
    intact — the graceful-degradation hole closed (round-2 verdict:
    exhaustion silently stopped inserting)."""
    scfg = SynthConfig(n_frames=90, width=320, height=240, fx=260.0,
                       fy=260.0, cx=159.5, cy=119.5, advance=0.012)
    seq = generate(scfg)
    cap = CapacityConfig(max_keyframes=12, max_landmarks=8192,
                         max_keypoints=1024, local_ba_keyframes=6,
                         local_ba_landmarks=2048)
    sys_ = make_system(scfg, capacity=cap)
    tr = dataclasses.replace(sys_.cfg.tracking, max_frames_between_kf=3)
    # the synthetic sweep's redundancy tops out ~0.74 (each KF binds ~560
    # of 8k landmarks); lower the cull bar so KeyFrameCulling actually
    # fires and the recycling path is exercised end-to-end
    mp = dataclasses.replace(sys_.cfg.mapping, kf_redundancy_ratio=0.6)
    sys_.cfg = sys_.cfg.replace(tracking=tr, mapping=mp)
    sys_.tracker.cfg = sys_.cfg
    for i in range(seq.gray.shape[0]):
        st = sys_.track_rgbd(seq.gray[i], seq.depth[i],
                             float(seq.timestamps[i]))
    assert sys_.tracker.state == "OK"
    t = sys_.tracker
    assert int(t.map.n_kf) <= cap.max_keyframes
    # ~30 keyframes wanted over 90 frames at cadence 3: recycling happened
    assert t.kf_seq > cap.max_keyframes, t.kf_seq
    assert int(np.asarray(t.map.kf_valid).sum()) <= cap.max_keyframes
    est = np.stack([-R.T @ tt for _, R, tt in sys_.trajectory])
    ate = ate_rmse(est, seq.t_wc[:len(est)])
    assert ate < 0.05, ate
