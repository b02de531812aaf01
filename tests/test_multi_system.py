"""MultiSystem: B sequences tracked by ONE batched fused call per frame.

Validates the DP frame axis integrated with the real System state
machines (SURVEY §5.7): batched lanes must produce the same trajectories
as B independent Systems running the same sequences.
"""
import numpy as np
import pytest

from slam_dynamic_tpu.config import (SystemConfig, CameraConfig, ORBConfig,
                                     DetectorConfig, CapacityConfig)
from slam_dynamic_tpu.io.synthetic import SynthConfig, generate
from slam_dynamic_tpu.io.evo import ate_rmse
from slam_dynamic_tpu.system import System
from slam_dynamic_tpu.parallel.multi_system import MultiSystem

BASE = dict(n_frames=18, width=256, height=192, fx=210.0, fy=210.0,
            cx=127.5, cy=95.5)


def _cfg(scfg):
    return SystemConfig(
        camera=CameraConfig(fx=scfg.fx, fy=scfg.fy, cx=scfg.cx, cy=scfg.cy,
                            bf=scfg.fx * scfg.baseline, width=scfg.width,
                            height=scfg.height, th_depth=120.0,
                            fps=scfg.fps),
        orb=ORBConfig(n_features=500),
        detector=DetectorConfig(mode="off"),
        capacity=CapacityConfig(
            max_keyframes=16, max_landmarks=4096, max_keypoints=512,
            local_ba_keyframes=8, local_ba_landmarks=1024),
        sensor="rgbd")


def _est(traj):
    return np.stack([-R.T @ t for _, R, t in traj])


@pytest.mark.slow
def test_multi_system_matches_independent():
    seqs = [generate(SynthConfig(**BASE, seed=s)) for s in (0, 3)]
    scfg = SynthConfig(**BASE)
    T = seqs[0].gray.shape[0]

    # independent single Systems (the golden path)
    solo_traj = []
    for seq in seqs:
        s = System(_cfg(scfg))
        for i in range(T):
            s.track_rgbd(seq.gray[i], seq.depth[i],
                         float(seq.timestamps[i]))
        solo_traj.append(s.trajectory)

    # MultiSystem: same frames, batched lanes
    ms = MultiSystem(_cfg(scfg), n=len(seqs))
    for i in range(T):
        stats = ms.track_rgbd_batch(
            [seq.gray[i] for seq in seqs],
            [seq.depth[i] for seq in seqs],
            [float(seq.timestamps[i]) for seq in seqs])
        assert all(st is not None for st in stats)

    for b, seq in enumerate(seqs):
        est_solo = _est(ms.systems[b].trajectory)
        gt = seq.t_wc[:len(est_solo)]
        ate_batch = ate_rmse(est_solo, gt, align=False)
        est_ref = _est(solo_traj[b])
        ate_ref = ate_rmse(est_ref, seq.t_wc[:len(est_ref)], align=False)
        # batched numerics may differ slightly (vmapped op layouts), but
        # the trajectory quality must match the independent run
        assert len(est_solo) == T
        assert ate_batch < max(0.06, 2.0 * ate_ref), (ate_batch, ate_ref)
        assert ms.systems[b].tracker.state == "OK"
        assert ms.systems[b].tracker.n_kf_host >= 2


@pytest.mark.slow
def test_multi_system_pipelined():
    """1-step pipelined batch (readback lags one step) must still produce
    full-length, accurate trajectories."""
    seqs = [generate(SynthConfig(**BASE, seed=s)) for s in (0, 3)]
    scfg = SynthConfig(**BASE)
    T = seqs[0].gray.shape[0]
    ms = MultiSystem(_cfg(scfg), n=len(seqs), pipeline=True)
    for i in range(T):
        ms.track_rgbd_batch(
            [seq.gray[i] for seq in seqs],
            [seq.depth[i] for seq in seqs],
            [float(seq.timestamps[i]) for seq in seqs])
    ms.flush()
    for b, seq in enumerate(seqs):
        est = _est(ms.systems[b].trajectory)
        assert len(est) == T
        ate = ate_rmse(est, seq.t_wc[:T], align=False)
        assert ate < 0.08, (b, ate)
        assert ms.systems[b].tracker.state == "OK"


@pytest.mark.slow
def test_multi_system_stereo_batch():
    """Batched stereo serving: KITTI-style L/R pairs per lane."""
    import dataclasses
    seqs = [generate(SynthConfig(**BASE, seed=s, stereo=True))
            for s in (0, 3)]
    scfg = SynthConfig(**BASE, stereo=True)
    cfg = dataclasses.replace(_cfg(scfg), sensor="stereo")
    T = seqs[0].gray.shape[0]
    ms = MultiSystem(cfg, n=len(seqs))
    for i in range(T):
        ms.track_stereo_batch(
            [seq.gray[i] for seq in seqs],
            [seq.right[i] for seq in seqs],
            [float(seq.timestamps[i]) for seq in seqs])
    for b, seq in enumerate(seqs):
        est = _est(ms.systems[b].trajectory)
        assert len(est) == T
        ate = ate_rmse(est, seq.t_wc[:T], align=False)
        # low-res stereo SAD matching is noisier than RGB-D: a solo
        # System on the same sequence measures 0.128 — the batch path
        # reproduces it to 6 decimals; the bound guards gross breakage
        assert ate < 0.2, (b, ate)
        assert ms.systems[b].tracker.state == "OK"


@pytest.mark.slow
def test_multi_system_dp_sharded():
    """Same batch over an explicit 4-device dp mesh."""
    import jax
    from slam_dynamic_tpu.parallel.mesh import make_mesh
    if jax.device_count() < 4:
        pytest.skip("needs 4 virtual devices")
    seqs = [generate(SynthConfig(**BASE, seed=s)) for s in (0, 1, 2, 5)]
    scfg = SynthConfig(**BASE)
    mesh = make_mesh(4, axis_name="dp")
    ms = MultiSystem(_cfg(scfg), n=4, mesh=mesh)
    T = seqs[0].gray.shape[0]
    for i in range(T):
        ms.track_rgbd_batch(
            [seq.gray[i] for seq in seqs],
            [seq.depth[i] for seq in seqs],
            [float(seq.timestamps[i]) for seq in seqs])
    for b, seq in enumerate(seqs):
        est = _est(ms.systems[b].trajectory)
        assert len(est) == T
        ate = ate_rmse(est, seq.t_wc[:T], align=False)
        assert ate < 0.08, (b, ate)


@pytest.mark.slow
def test_multi_system_chunked_cold_start():
    """bench.py --multi N --chunk C drives chunk_batch from frame 0 with
    pipeline=True and NO explicit per-frame bootstrap: non-OK lanes make
    the chunk fall back to per-frame batched steps, queuing a "frame"
    step in the pipeline slot that the first real chunk call must then
    finalize (a flat [B] row, not [C][B] rows — regression: r5 bench
    crashed on 'TrackStats object is not iterable')."""
    seqs = [generate(SynthConfig(**BASE, seed=s)) for s in (0, 3)]
    scfg = SynthConfig(**BASE)
    T = seqs[0].gray.shape[0]
    C = 3
    ms = MultiSystem(_cfg(scfg), n=len(seqs), pipeline=True)
    i, n_stats = 0, 0
    while i + C <= T:
        sts = ms.track_rgbd_chunk_batch(
            [[seq.gray[i + j] for j in range(C)] for seq in seqs],
            [[seq.depth[i + j] for j in range(C)] for seq in seqs],
            [[float(seq.timestamps[i + j]) for j in range(C)]
             for seq in seqs])
        assert all(hasattr(st, "state") for st in sts), sts
        n_stats += len(sts)
        i += C
    ms.flush()
    assert n_stats > 0
    for b, seq in enumerate(seqs):
        assert ms.systems[b].tracker.state == "OK"
        est = _est(ms.systems[b].trajectory)
        ate = ate_rmse(est, seq.t_wc[:len(est)], align=False)
        assert ate < 0.06, (b, ate)


def test_multi_system_chunked():
    """B lanes x C frames per device call (fused_track_chunk_batch): the
    serving composition of lane batching and temporal chunking. Each
    lane's trajectory must match its independent-System quality; stats
    cover every frame exactly once (decisions lag one chunk)."""
    seqs = [generate(SynthConfig(**BASE, seed=s)) for s in (0, 3)]
    scfg = SynthConfig(**BASE)
    T = seqs[0].gray.shape[0]
    C = 3

    ms = MultiSystem(_cfg(scfg), n=len(seqs), pipeline=True)
    # bootstrap per-frame until all lanes are OK
    i = 0
    while any(s.tracker.state != "OK" for s in ms.systems) and i < 4:
        ms.track_rgbd_batch([seq.gray[i] for seq in seqs],
                            [seq.depth[i] for seq in seqs],
                            [float(seq.timestamps[i]) for seq in seqs])
        i += 1
    n_stats = 0
    while i + C <= T:
        sts = ms.track_rgbd_chunk_batch(
            [[seq.gray[i + j] for j in range(C)] for seq in seqs],
            [[seq.depth[i + j] for j in range(C)] for seq in seqs],
            [[float(seq.timestamps[i + j]) for j in range(C)]
             for seq in seqs])
        n_stats += len(sts)
        i += C
    ms.flush()
    for b, seq in enumerate(seqs):
        traj = ms.systems[b].trajectory
        est = _est(traj)
        gt = seq.t_wc[:len(est)]
        ate = ate_rmse(est, gt, align=False)
        assert ate < 0.06, (b, ate)
        assert ms.systems[b].tracker.state == "OK"
        assert ms.systems[b].tracker.n_kf_host >= 2
        # every chunked frame appears exactly once, in timestamp order
        ts = [t for t, _, _ in traj]
        assert ts == sorted(ts) and len(ts) == len(set(ts))
        assert len(ts) >= i - C            # all finalized chunks covered
