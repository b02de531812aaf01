"""Dataset loader format parity: synthesize a TUM-format directory and a
KITTI-format sequence from synthetic frames, reload, track."""
import os

import numpy as np
import pytest
from PIL import Image

from slam_dynamic_tpu.io.synthetic import SynthConfig, generate
from slam_dynamic_tpu.io.datasets import TumRGBD, KittiStereo
from slam_dynamic_tpu.viz.headless import write_png


@pytest.fixture
def tum_dir(tmp_path):
    scfg = SynthConfig(n_frames=5, width=160, height=120, fx=130.0,
                       fy=130.0, cx=79.5, cy=59.5)
    seq = generate(scfg)
    (tmp_path / "rgb").mkdir()
    (tmp_path / "depth").mkdir()
    rgb_lines, dep_lines = [], []
    for i in range(5):
        ts = seq.timestamps[i]
        write_png(str(tmp_path / "rgb" / f"{ts:.6f}.png"),
                  seq.gray[i].astype(np.uint8))
        d16 = (seq.depth[i] * 5000.0).astype(np.uint16)
        Image.fromarray(d16, mode="I;16").save(
            str(tmp_path / "depth" / f"{ts:.6f}.png"))
        rgb_lines.append(f"{ts:.6f} rgb/{ts:.6f}.png")
        dep_lines.append(f"{ts:.6f} depth/{ts:.6f}.png")
    (tmp_path / "rgb.txt").write_text(
        "# ts file\n" + "\n".join(rgb_lines) + "\n")
    (tmp_path / "depth.txt").write_text(
        "# ts file\n" + "\n".join(dep_lines) + "\n")
    gt = []
    for i in range(5):
        gt.append(f"{seq.timestamps[i]:.6f} 0 0 0 0 0 0 1")
    (tmp_path / "groundtruth.txt").write_text("\n".join(gt) + "\n")
    return tmp_path, seq


def test_tum_loader_roundtrip(tum_dir):
    root, seq = tum_dir
    ds = TumRGBD(str(root), depth_factor=5000.0)
    assert len(ds) == 5
    pkts = list(ds)
    assert len(pkts) == 5
    assert pkts[0].gray.dtype == np.uint8       # camera-native passthrough
    np.testing.assert_allclose(pkts[0].gray,
                               seq.gray[0].astype(np.uint8), atol=1.0)
    assert pkts[2].depth.dtype == np.uint16     # raw TUM units
    np.testing.assert_allclose(pkts[2].depth.astype(np.float32) / 5000.0,
                               seq.depth[2], atol=2e-4)
    ts, pos, quat = ds.groundtruth()
    assert len(ts) == 5


def test_kitti_loader_roundtrip(tmp_path):
    scfg = SynthConfig(n_frames=4, width=160, height=120, fx=130.0,
                       fy=130.0, cx=79.5, cy=59.5, stereo=True)
    seq = generate(scfg)
    (tmp_path / "image_0").mkdir()
    (tmp_path / "image_1").mkdir()
    for i in range(4):
        write_png(str(tmp_path / "image_0" / f"{i:06d}.png"),
                  seq.gray[i].astype(np.uint8))
        write_png(str(tmp_path / "image_1" / f"{i:06d}.png"),
                  seq.right[i].astype(np.uint8))
    (tmp_path / "times.txt").write_text(
        "\n".join(f"{t:.6e}" for t in seq.timestamps) + "\n")
    ds = KittiStereo(str(tmp_path))
    pkts = list(ds)
    assert len(pkts) == 4
    assert pkts[1].right is not None
    np.testing.assert_allclose(pkts[3].gray,
                               seq.gray[3].astype(np.uint8), atol=1.0)
