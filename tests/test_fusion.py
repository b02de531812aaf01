"""Landmark fusion (duplicate merge) + keyframe culling unit tests."""
import numpy as np
import jax.numpy as jnp

from slam_dynamic_tpu.config import CapacityConfig
from slam_dynamic_tpu.utils.camera import Intrinsics, project
from slam_dynamic_tpu.worldmap.state import empty_map, insert_keyframe, \
    add_landmarks
from slam_dynamic_tpu.backend.fusion import fuse_into_keyframe, \
    cull_keyframes

CAM = Intrinsics.create(fx=300.0, fy=300.0, cx=160.0, cy=120.0, bf=30.0,
                        width=320, height=240)


def build_map_with_duplicate(rng):
    """Two landmarks at the SAME 3D point, one bound to KF0 (2 obs), the
    duplicate bound only to KF1. Fusing the local map into KF1 should merge
    them (loser replaced by winner)."""
    cap = CapacityConfig(max_keyframes=4, max_landmarks=32, max_keypoints=8)
    m = empty_map(cap)
    pt = np.array([0.4, -0.2, 5.0], np.float32)
    desc = rng.integers(0, 2**32, (1, 8), dtype=np.uint32)

    def kf_arrays(R, t, bind):
        uv = np.array(project(CAM, jnp.asarray((pt @ np.asarray(R).T
                                                + np.asarray(t))[None])))
        xy = np.zeros((8, 2), np.float32)
        xy[0] = uv[0]
        d = np.full((8, 8), 0, np.uint32)
        d[0] = desc[0]
        valid = np.zeros(8, bool)
        valid[0] = True
        obs = np.full(8, -1, np.int32)
        if bind >= 0:
            obs[0] = bind
        return (jnp.asarray(xy), jnp.zeros(8, jnp.int32), jnp.zeros(8),
                jnp.asarray(d), jnp.asarray(valid),
                jnp.full(8, -1.0), jnp.full(8, 5.0), jnp.asarray(obs))

    I = jnp.eye(3)
    z = jnp.zeros(3)
    xy, lv, an, dd, vv, ur, dp, obs = kf_arrays(I, z, -1)
    m = insert_keyframe(m, I, z, 0, 0.0, xy, lv, an, dd, vv, ur, dp, obs)
    # landmark 0 owned by KF0
    m = add_landmarks(m, jnp.asarray(pt[None]), jnp.asarray(desc),
                      jnp.asarray([[0.0, 0, 1]]), jnp.asarray([0.5]),
                      jnp.asarray([50.0]), jnp.zeros(1, jnp.int32),
                      jnp.zeros(1, jnp.int32), jnp.ones(1, bool))
    # KF1 at slight offset sees the same point but got a DUPLICATE landmark
    t1 = jnp.asarray([0.1, 0.0, 0.0])
    xy, lv, an, dd, vv, ur, dp, obs = kf_arrays(I, t1, -1)
    m = insert_keyframe(m, I, t1, 1, 0.1, xy, lv, an, dd, vv, ur, dp, obs)
    m = add_landmarks(m, jnp.asarray((pt + 0.01)[None]), jnp.asarray(desc),
                      jnp.asarray([[0.0, 0, 1]]), jnp.asarray([0.5]),
                      jnp.asarray([50.0]), jnp.ones(1, jnp.int32),
                      jnp.zeros(1, jnp.int32), jnp.ones(1, bool))
    return m


def test_fuse_merges_duplicates(rng):
    m = build_map_with_duplicate(rng)
    assert int(m.n_lm) == 2
    assert int(m.kf_obs_lm[0, 0]) == 0 and int(m.kf_obs_lm[1, 0]) == 1
    lm_ids = jnp.arange(32, dtype=jnp.int32)
    lm_mask = jnp.arange(32) < 2
    m2 = fuse_into_keyframe(m, CAM, jnp.int32(1), lm_ids, lm_mask,
                            jnp.float32(1.2), max_lm=32)
    # duplicate collapsed: both KFs now reference the same landmark id,
    # and one of the two landmark slots was invalidated
    a = int(m2.kf_obs_lm[0, 0])
    b = int(m2.kf_obs_lm[1, 0])
    assert a == b
    assert int(m2.lm_valid[:2].sum()) == 1
    assert int(m2.lm_n_obs[a]) == 2


def test_cull_keyframes_redundant(rng):
    """A KF whose every observation is covered by >=3 other KFs dies."""
    cap = CapacityConfig(max_keyframes=8, max_landmarks=256,
                         max_keypoints=128)
    m = empty_map(cap)
    L = 100
    pts = np.stack([rng.uniform(-2, 2, L), rng.uniform(-1.5, 1.5, L),
                    rng.uniform(4, 8, L)], 1).astype(np.float32)
    I = jnp.eye(3)
    obs = np.full(128, -1, np.int32)
    obs[:L] = np.arange(L)
    for k in range(5):
        t = jnp.asarray([0.05 * k, 0.0, 0.0])
        xy = np.zeros((128, 2), np.float32)
        xy[:L] = np.array(project(CAM, jnp.asarray(pts) + t))
        valid = np.arange(128) < L
        m = insert_keyframe(
            m, I, t, k, 0.1 * k, jnp.asarray(xy), jnp.zeros(128, jnp.int32),
            jnp.zeros(128), jnp.zeros((128, 8), jnp.uint32),
            jnp.asarray(valid), jnp.full(128, -1.0), jnp.full(128, 6.0),
            jnp.full(128, -1, jnp.int32) if k == 0 else jnp.asarray(obs))
        if k == 0:
            m = add_landmarks(m, jnp.asarray(pts),
                              jnp.zeros((128, 8), jnp.uint32)[:L],
                              jnp.tile(jnp.asarray([0., 0, 1]), (L, 1)),
                              jnp.full(L, 0.5), jnp.full(L, 50.0),
                              jnp.zeros(L, jnp.int32),
                              jnp.arange(L, dtype=jnp.int32),
                              jnp.ones(L, bool))
    from slam_dynamic_tpu.worldmap.state import update_covisibility
    for k in range(5):
        m = update_covisibility(m, jnp.int32(k))
    assert int(m.kf_valid.sum()) == 5
    m2 = cull_keyframes(m, jnp.int32(4))
    # middle KFs (1,2,3) are all redundant; 0 and current (4) are immune
    assert bool(m2.kf_valid[0]) and bool(m2.kf_valid[4])
    assert int(m2.kf_valid.sum()) < 5
