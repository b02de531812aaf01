"""Stereo System path, detector plumbing, NMS, CLI driver."""
import json
import subprocess
import sys

import numpy as np
import jax.numpy as jnp
import pytest

from slam_dynamic_tpu.io.synthetic import SynthConfig, generate
from slam_dynamic_tpu.io.evo import ate_rmse
from tests.test_e2e_slam import make_system


@pytest.mark.slow
def test_stereo_system_e2e():
    scfg = SynthConfig(n_frames=18, width=320, height=240, fx=260.0,
                       fy=260.0, cx=159.5, cy=119.5, stereo=True,
                       baseline=0.2)
    seq = generate(scfg)
    sys_ = make_system(scfg)
    sys_.cfg = sys_.cfg.replace(sensor="stereo")
    sys_.tracker.cfg = sys_.cfg
    for i in range(seq.gray.shape[0]):
        st = sys_.track_stereo(seq.gray[i], seq.right[i],
                               float(seq.timestamps[i]))
        assert st.state == "OK" or i == 0
    est = np.stack([-R.T @ t for _, R, t in sys_.trajectory])
    gt = seq.t_wc[:len(est)]
    assert ate_rmse(est, gt) < 0.03


def test_nms(rng):
    from slam_dynamic_tpu.ops.nms import nms
    boxes = jnp.asarray([[0, 0, 10, 10], [1, 1, 11, 11], [50, 50, 60, 60],
                         [100, 0, 120, 20]], jnp.float32)
    scores = jnp.asarray([0.9, 0.8, 0.7, 0.0])
    idx, keep = nms(boxes, scores, jnp.ones(4, bool), 0.4, max_out=4)
    kept = set(np.asarray(idx)[np.asarray(keep)].tolist())
    assert kept == {0, 2}   # box1 suppressed by box0; box3 score 0


def test_detector_plumbing():
    from slam_dynamic_tpu.models.detector import (Detector,
                                                  reshape_boxes_stereo)
    from slam_dynamic_tpu.config import DetectorConfig
    det = Detector(DetectorConfig(mode="online", conf_threshold=0.3),
                   120, 160)
    out = det.detect(np.random.default_rng(0).uniform(
        0, 255, (120, 160)).astype(np.float32))
    assert out.boxes.shape == (32, 4)
    b = reshape_boxes_stereo(np.array([[0.0, 0.0, 10.0, 10.0]]))
    np.testing.assert_allclose(b, [[1, -3, 9, 13]])   # w*0.8, h*1.6


def test_detector_params_roundtrip(tmp_path):
    from slam_dynamic_tpu.models.detector import Detector
    from slam_dynamic_tpu.config import DetectorConfig
    det = Detector(DetectorConfig(), 64, 64, seed=3)
    p = str(tmp_path / "det.npz")
    det.save_params(p)
    params = Detector.load_params(p)
    det2 = Detector(DetectorConfig(), 64, 64, params=params)
    img = np.random.default_rng(1).uniform(0, 255, (64, 64)).astype(
        np.float32)
    o1 = det.detect(img)
    o2 = det2.detect(img)
    np.testing.assert_allclose(np.asarray(o1.scores), np.asarray(o2.scores),
                               atol=1e-6)


@pytest.mark.slow
def test_cli_driver(tmp_path):
    out = subprocess.run(
        [sys.executable, "-m", "slam_dynamic_tpu.io.run", "--dataset",
         "synthetic", "--frames", "10", "--cpu", "--out", str(tmp_path)],
        capture_output=True, text=True, timeout=600, cwd="/root/repo")
    assert out.returncode == 0, out.stderr[-500:]
    summary = json.loads(out.stdout.strip().splitlines()[-1])
    assert summary["frames"] == 10 and summary["lost"] <= 1
    assert (tmp_path / "FrameTrajectory.txt").exists()
    assert (tmp_path / "KeyFrameTrajectory.txt").exists()


@pytest.mark.slow
def test_stereo_far_structure_triangulation():
    """Far-point canary (VERDICT r1 item 2): with ThDepth small enough
    that the WHOLE room is beyond the close-point threshold, the map
    must still grow far landmarks via keyframe triangulation
    (ref LocalMapping::CreateNewMapPoints runs for all sensors) and
    tracking must hold."""
    scfg = SynthConfig(n_frames=22, width=320, height=240, fx=260.0,
                       fy=260.0, cx=159.5, cy=119.5, stereo=True,
                       baseline=0.08)
    seq = generate(scfg)
    sys_ = make_system(scfg)
    # ThDepth 25 x 0.08m baseline = 2.0m: all structure (3-12m) is "far"
    import dataclasses
    sys_.cfg = sys_.cfg.replace(
        sensor="stereo",
        camera=dataclasses.replace(sys_.cfg.camera, th_depth=25.0))
    sys_.tracker.cfg = sys_.cfg
    for i in range(seq.gray.shape[0]):
        st = sys_.track_stereo(seq.gray[i], seq.right[i],
                               float(seq.timestamps[i]))
        assert st.state == "OK" or i == 0
    est = np.stack([-R.T @ t for _, R, t in sys_.trajectory])
    gt = seq.t_wc[:len(est)]
    assert ate_rmse(est, gt) < 0.05
    m = sys_.tracker.map
    n_kf = int(m.n_kf)
    n_lm = int(np.asarray(m.lm_valid).sum())
    # the depth path spawns at most min_create=100 per keyframe; more
    # valid landmarks than that proves triangulation created the rest
    assert n_lm > n_kf * 100 + 50, (n_lm, n_kf)
