"""Same inputs -> same trajectory, regardless of unrelated prior activity.

The reference is nondeterministic (cv::RANSAC, DUtils::Random, thread
timing); this framework promises same-seed -> same-trajectory (SURVEY §5.2
rebuild note). Round 5 found a violation: the pipelined tracker's adaptive
deepening polled packet readiness (wall-clock-dependent), so compile-cache
warmth — e.g. a prewarm System tracked earlier in the process — shifted
keyframe decisions (endurance loss count flipped 12<->8 through that branch
alone). The poll is now opt-in (cfg.tracking.adaptive_pipeline, default
False); this test pins the guarantee.
"""
import dataclasses

import numpy as np

from slam_dynamic_tpu.io.synthetic import SynthConfig, generate
from tests.test_e2e_slam import make_system


def _run(seq, scfg, n):
    sys_ = make_system(scfg)
    sys_.cfg = sys_.cfg.replace(tracking=dataclasses.replace(
        sys_.cfg.tracking, pipeline_depth=1))
    sys_.tracker.cfg = sys_.cfg
    for i in range(n):
        sys_.track_rgbd(seq.gray[i], seq.depth[i],
                        float(seq.timestamps[i]))
    sys_.tracker._finalize_pending()
    return [(ts, np.asarray(R), np.asarray(t))
            for ts, R, t in sys_.trajectory]


def test_trajectory_invariant_to_prior_activity():
    scfg = SynthConfig(n_frames=26, width=320, height=240, fx=260.0,
                       fy=260.0, cx=159.5, cy=119.5)
    seq = generate(scfg)
    ref = _run(seq, scfg, 26)
    # unrelated prior activity: a throwaway system tracks a few frames
    # (compiles executables, warms caches — the endurance prewarm shape)
    throwaway = make_system(scfg)
    for i in range(6):
        throwaway.track_rgbd(seq.gray[i], seq.depth[i],
                             float(seq.timestamps[i]))
    del throwaway
    again = _run(seq, scfg, 26)
    assert len(ref) == len(again)
    for (ts0, R0, t0), (ts1, R1, t1) in zip(ref, again):
        assert ts0 == ts1
        np.testing.assert_array_equal(R0, R1)
        np.testing.assert_array_equal(t0, t1)
