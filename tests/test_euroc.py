"""EuRoC loader: data.csv parsing, rectification maps, full stereo drive.

The sequence is the in-repo synthetic stereo world written to disk in
EuRoC mav0 layout (no public data in this environment)."""
import os

import numpy as np
import pytest

from slam_dynamic_tpu.io.datasets import (EurocDataset, load_rect_blocks,
                                          rectify_maps, remap_bilinear)


def _write_png(path, img):
    from slam_dynamic_tpu.viz.headless import write_png
    write_png(path, np.clip(img, 0, 255).astype(np.uint8))


def _write_euroc_tree(tmp_path, seq, n):
    for cam, frames in (("cam0", seq.gray), ("cam1", seq.right)):
        d = tmp_path / "mav0" / cam / "data"
        os.makedirs(d, exist_ok=True)
        rows = []
        for i in range(n):
            ns = int(seq.timestamps[i] * 1e9)
            name = f"{ns}.png"
            _write_png(str(d / name), frames[i])
            rows.append(f"{ns},{name}")
        with open(tmp_path / "mav0" / cam / "data.csv", "w") as f:
            f.write("#timestamp [ns],filename\n" + "\n".join(rows) + "\n")
    return str(tmp_path / "mav0")


def _identity_yaml(tmp_path, w, h, fx, fy, cx, cy, bf):
    """Rectification blocks that are an exact identity (D=0, R=I, P=K)."""
    def mat(name, rows, cols, data):
        vals = ", ".join(str(v) for v in data)
        return (f"{name}: !!opencv-matrix\n   rows: {rows}\n"
                f"   cols: {cols}\n   dt: d\n   data: [{vals}]\n")
    k = [fx, 0.0, cx, 0.0, fy, cy, 0.0, 0.0, 1.0]
    p = [fx, 0.0, cx, 0.0, 0.0, fy, cy, 0.0, 0.0, 0.0, 1.0, 0.0]
    pr = list(p)
    pr[3] = -bf
    eye = [1.0, 0, 0, 0, 1.0, 0, 0, 0, 1.0]
    y = tmp_path / "euroc_id.yaml"
    with open(y, "w") as f:
        f.write("%YAML:1.0\n")
        for side, pp in (("LEFT", p), ("RIGHT", pr)):
            f.write(f"{side}.height: {h}\n{side}.width: {w}\n")
            f.write(mat(f"{side}.D", 1, 5, [0.0] * 5))
            f.write(mat(f"{side}.K", 3, 3, k))
            f.write(mat(f"{side}.R", 3, 3, eye))
            f.write(mat(f"{side}.P", 3, 4, pp))
    return str(y)


def test_rect_blocks_parse_repo_yaml():
    blk = load_rect_blocks("configs/EuRoC.yaml")
    assert set(blk) == {f"{s}.{n}" for s in ("LEFT", "RIGHT")
                        for n in "DKRP"}
    assert blk["LEFT.K"].shape == (3, 3)
    assert blk["LEFT.P"].shape == (3, 4)
    assert abs(blk["RIGHT.P"][0, 3] + 47.90639384423901) < 1e-6


def test_rectify_identity_maps():
    K = np.array([[300.0, 0, 80], [0, 300.0, 60], [0, 0, 1]])
    P = np.concatenate([K, np.zeros((3, 1))], 1)
    mx, my = rectify_maps(K, np.zeros(5), np.eye(3), P, 160, 120)
    u, v = np.meshgrid(np.arange(160.0), np.arange(120.0))
    np.testing.assert_allclose(mx, u, atol=1e-4)
    np.testing.assert_allclose(my, v, atol=1e-4)
    img = np.random.default_rng(0).uniform(0, 255, (120, 160))
    out = remap_bilinear(img, mx, my)
    np.testing.assert_allclose(out, img, atol=1e-2)


def test_rectify_undoes_distortion():
    """Points distorted with (k1, k2) land back on the rectified grid."""
    K = np.array([[300.0, 0, 80], [0, 300.0, 60], [0, 0, 1]])
    P = np.concatenate([K, np.zeros((3, 1))], 1)
    D = np.array([-0.28, 0.07, 0.0, 0.0, 0.0])
    mx, my = rectify_maps(K, D, np.eye(3), P, 160, 120)
    # the map at the principal point must be the principal point
    assert abs(mx[60, 80] - 80) < 0.5 and abs(my[60, 80] - 60) < 0.5
    # off-center: barrel distortion pulls samples toward the center
    assert mx[60, 140] < 140.0


@pytest.mark.slow
def test_euroc_stereo_drive(tmp_path):
    from slam_dynamic_tpu.io.synthetic import SynthConfig, generate
    from slam_dynamic_tpu.io import run as run_mod
    scfg = SynthConfig(n_frames=12, width=256, height=192, fx=210.0,
                       fy=210.0, cx=127.5, cy=95.5, stereo=True)
    seq = generate(scfg)
    root = _write_euroc_tree(tmp_path, seq, 12)
    yaml = _identity_yaml(tmp_path, 256, 192, scfg.fx, scfg.fy, scfg.cx,
                          scfg.cy, scfg.fx * scfg.baseline)
    ds = EurocDataset(root, stereo=True, yaml_path=yaml)
    assert len(ds) == 12
    pkts = list(ds)
    assert pkts[0].right is not None
    assert abs(pkts[3].timestamp - float(seq.timestamps[3])) < 1e-6
    # identity rectification leaves pixels intact (interior region)
    np.testing.assert_allclose(
        pkts[0].gray[5:-5, 5:-5].astype(np.float32),
        np.clip(seq.gray[0], 0, 255).astype(np.uint8)[5:-5, 5:-5]
        .astype(np.float32), atol=1.0)

    # full SLAM drive over the rectified stereo stream
    import jax
    jax.config.update("jax_platforms", "cpu")
    from slam_dynamic_tpu.config import (SystemConfig, CameraConfig,
                                         ORBConfig, DetectorConfig,
                                         CapacityConfig)
    from slam_dynamic_tpu.system import System
    from slam_dynamic_tpu.io.evo import ate_rmse
    cfg = SystemConfig(
        camera=CameraConfig(fx=scfg.fx, fy=scfg.fy, cx=scfg.cx,
                            cy=scfg.cy, bf=scfg.fx * scfg.baseline,
                            width=256, height=192, th_depth=120.0,
                            fps=scfg.fps),
        orb=ORBConfig(n_features=500),
        detector=DetectorConfig(mode="off"),
        capacity=CapacityConfig(max_keyframes=16, max_landmarks=4096,
                                max_keypoints=512, local_ba_keyframes=8,
                                local_ba_landmarks=1024),
        sensor="stereo")
    s = System(cfg)
    for p in pkts:
        s.track_stereo(p.gray, p.right, p.timestamp)
    est = np.stack([-R.T @ t for _, R, t in s.trajectory])
    ate = ate_rmse(est, seq.t_wc[:len(est)], align=False)
    # uint8 PNG quantization makes 256-px stereo matching noisier than
    # the float in-memory drives; this test guards the FORMAT/RECTIFY
    # path, not peak accuracy
    assert ate < 0.12, ate
