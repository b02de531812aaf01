"""Temporal chunking: C consecutive frames per device call.

The chunked path (fused.fused_track_chunk + Tracker.step_images_chunk +
System.track_chunk) must track the synthetic sequence with accuracy
comparable to the per-frame path — decisions lag one chunk (the
reference's async-LocalMapping lag, SURVEY §2.4, widened to C), which
costs a little ATE but no correctness.
"""
import numpy as np
import pytest

from slam_dynamic_tpu.config import (CameraConfig, CapacityConfig,
                                     ORBConfig, SystemConfig)
from slam_dynamic_tpu.io.evo import ate_rmse
from slam_dynamic_tpu.io.synthetic import SynthConfig, generate
from slam_dynamic_tpu.system import System


def _cfg(scfg, sensor="rgbd"):
    return SystemConfig(
        camera=CameraConfig(fx=scfg.fx, fy=scfg.fy, cx=scfg.cx, cy=scfg.cy,
                            bf=scfg.fx * scfg.baseline, width=scfg.width,
                            height=scfg.height, th_depth=120.0,
                            depth_map_factor=1000.0),
        orb=ORBConfig(n_features=600),
        capacity=CapacityConfig(max_keyframes=64, max_landmarks=16384,
                                max_keypoints=1024, local_ba_keyframes=8,
                                local_ba_landmarks=2048),
        sensor=sensor)


def _run_chunked(seq, cfg, C):
    gray8 = np.clip(seq.gray, 0, 255).astype(np.uint8)
    d16 = np.clip(seq.depth * 1000, 0, 65535).astype(np.uint16)
    s = System(cfg)
    i = 0
    while s.tracker.state != "OK" and i < 4:
        s.track_rgbd(gray8[i], d16[i], float(seq.timestamps[i]))
        i += 1
    sts = []
    nf = seq.gray.shape[0]
    while i + C <= nf:
        sts += s.track_chunk([gray8[i + j] for j in range(C)],
                             [d16[i + j] for j in range(C)],
                             [float(seq.timestamps[i + j])
                              for j in range(C)])
        i += C
    traj = s.trajectory
    est = np.stack([-R.T @ t for _, R, t in traj])
    return s, sts, est


@pytest.mark.slow
def test_chunked_tracking_matches_per_frame_accuracy():
    scfg = SynthConfig(n_frames=26, width=320, height=240, fx=260.0,
                       fy=260.0, cx=159.5, cy=119.5)
    seq = generate(scfg)
    cfg = _cfg(scfg)
    s, sts, est = _run_chunked(seq, cfg, C=4)
    assert all(st.state == "OK" for st in sts)
    assert int(s.tracker.map.n_kf) >= 2        # keyframes fire in chunks
    ate = ate_rmse(est, seq.t_wc[:len(est)])
    assert ate < 0.03                          # per-frame path: ~0.01
    # every tracked frame appears exactly once in the trajectory
    # (bootstrap frames + whole chunks; up to C-1 tail frames unprocessed)
    assert scfg.n_frames - 4 <= len(est) <= scfg.n_frames
    ts = [t for t, _, _ in s.trajectory]
    assert len(ts) == len(set(ts))


@pytest.mark.slow
def test_chunked_dynamic_scene():
    """Temporal chunking composed with the dynamic pipeline
    (fused_track_chunk_dyn): a large moving object + per-frame boxes +
    fused H/F classification INSIDE the chunk. The trajectory must
    survive (vs a corrupting object) and the box must be confirmed
    dynamic from verdicts that ride the [C, 28+B] packet — streak
    bookkeeping lags one chunk (ref Tracking.cc:968-1367)."""
    from slam_dynamic_tpu.config import DetectorConfig
    scfg = SynthConfig(n_frames=28, width=320, height=240, fx=260.0,
                       fy=260.0, cx=159.5, cy=119.5, dynamic_object=True,
                       obj_size=1.6, obj_depth=3.0, obj_speed=0.09)
    seq = generate(scfg)
    gray8 = np.clip(seq.gray, 0, 255).astype(np.uint8)
    d16 = np.clip(seq.depth * 1000, 0, 65535).astype(np.uint16)
    cfg = _cfg(scfg).replace(detector=DetectorConfig(mode="precomputed"))
    s = System(cfg)
    C = 4
    det = lambda i: (seq.boxes[i][seq.box_valid[i]]
                     if seq.box_valid[i, 0] else None)
    i = 0
    while s.tracker.state != "OK" and i < 4:
        s.track_rgbd(gray8[i], d16[i], float(seq.timestamps[i]),
                     detections=det(i))
        i += 1
    sts = []
    nf = seq.gray.shape[0]
    while i + C <= nf:
        sts += s.track_chunk([gray8[i + j] for j in range(C)],
                             [d16[i + j] for j in range(C)],
                             [float(seq.timestamps[i + j])
                              for j in range(C)],
                             detections=[det(i + j) for j in range(C)])
        i += C
    assert all(st.state == "OK" for st in sts)
    # verdicts rode the chunked packet
    assert any(st.verdicts is not None for st in sts)
    # the moving object was confirmed dynamic via lagged streaks
    assert len(s.boxes.status) >= 1
    assert (s.boxes.status == 2).any(), s.boxes.status
    traj = s.trajectory
    est = np.stack([-R.T @ t for _, R, t in traj])
    ate = ate_rmse(est, seq.t_wc[:len(est)], align=False)
    assert ate < 0.15, ate


@pytest.mark.slow
def test_chunk_eager_finalize_upload_first_equivalence():
    """Eager finalize (previous chunk reaches the map BEFORE the next
    dispatch) in both orderings: upload-first (h2d issued before the
    blocking packet readback — the transport-overlap variant) must
    produce a BIT-IDENTICAL trajectory to plain eager, because only
    host-side issue order changes, never the data the dispatch sees."""
    import dataclasses
    scfg = SynthConfig(n_frames=22, width=320, height=240, fx=260.0,
                       fy=260.0, cx=159.5, cy=119.5)
    seq = generate(scfg)
    base = _cfg(scfg)
    ests = []
    for upload_first in (False, True):
        cfg = base.replace(tracking=dataclasses.replace(
            base.tracking, chunk_eager_finalize=True,
            chunk_eager_upload_first=upload_first))
        s, sts, est = _run_chunked(seq, cfg, C=4)
        assert all(st.state == "OK" for st in sts)
        ests.append(est)
    assert ests[0].shape == ests[1].shape
    np.testing.assert_array_equal(ests[0], ests[1])
    ate = ate_rmse(ests[1], seq.t_wc[:len(ests[1])])
    assert ate < 0.03


@pytest.mark.slow
def test_chunk_of_two_and_pipeline_lag_bookkeeping():
    scfg = SynthConfig(n_frames=20, width=320, height=240, fx=260.0,
                       fy=260.0, cx=159.5, cy=119.5)
    seq = generate(scfg)
    s, sts, est = _run_chunked(seq, _cfg(scfg), C=2)
    # finalized stats lag one chunk: all but the last chunk's frames
    assert len([st for st in sts if st.state == "OK"]) == len(sts)
    ts = [t for t, _, _ in s.trajectory]
    assert ts == sorted(ts)                    # ordered trajectory
    ate = ate_rmse(est, seq.t_wc[:len(est)])
    assert ate < 0.03
