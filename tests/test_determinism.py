"""Same seed -> same trajectory (SURVEY §4's prescribed determinism test).

Everything in the pipeline is seeded (RANSAC keys derive from cfg.seed +
frame id; the dynamic path's per-frame sampling variation derives from
the pose on device), so two fresh Systems over the same frames must
produce BIT-IDENTICAL trajectories on the same backend.
"""
import numpy as np
import pytest

from slam_dynamic_tpu.config import (SystemConfig, CameraConfig, ORBConfig,
                                     DetectorConfig, CapacityConfig)
from slam_dynamic_tpu.io.synthetic import SynthConfig, generate
from slam_dynamic_tpu.system import System

BASE = dict(n_frames=14, width=256, height=192, fx=210.0, fy=210.0,
            cx=127.5, cy=95.5)


def _cfg(dynamic=False):
    return SystemConfig(
        camera=CameraConfig(fx=210.0, fy=210.0, cx=127.5, cy=95.5,
                            bf=210.0 * SynthConfig(**BASE).baseline,
                            width=256, height=192, th_depth=120.0,
                            fps=30.0),
        orb=ORBConfig(n_features=500),
        detector=DetectorConfig(mode="precomputed" if dynamic else "off"),
        capacity=CapacityConfig(max_keyframes=16, max_landmarks=4096,
                                max_keypoints=512, local_ba_keyframes=8,
                                local_ba_landmarks=1024),
        sensor="rgbd")


def _run(seq, dynamic=False):
    s = System(_cfg(dynamic))
    n = seq.gray.shape[0]
    for i in range(n):
        det = None
        if dynamic and seq.box_valid[i, 0]:
            det = seq.boxes[i][seq.box_valid[i]]
        s.track_rgbd(seq.gray[i], seq.depth[i], float(seq.timestamps[i]),
                     detections=det)
    return np.stack([np.concatenate([R.reshape(-1), t])
                     for _, R, t in s.trajectory])


@pytest.mark.slow
def test_static_trajectory_deterministic():
    seq = generate(SynthConfig(**BASE))
    a = _run(seq)
    b = _run(seq)
    assert a.shape == b.shape
    np.testing.assert_array_equal(a, b)


@pytest.mark.slow
def test_dynamic_trajectory_deterministic():
    seq = generate(SynthConfig(**BASE, dynamic_object=True,
                               obj_size=1.2, obj_depth=3.0, obj_speed=0.05))
    a = _run(seq, dynamic=True)
    b = _run(seq, dynamic=True)
    np.testing.assert_array_equal(a, b)
