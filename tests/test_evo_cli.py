"""evo-protocol CLI: ape/rpe on TUM and KITTI trajectory files.

Mirrors the reference's prescribed evaluation commands
(/root/reference/README.md:68-77) as `python -m slam_dynamic_tpu.io.evo`.
"""
import json

import numpy as np
import pytest

from slam_dynamic_tpu.io import evo
from slam_dynamic_tpu.io.trajectory import (save_tum, save_kitti,
                                            load_kitti)


def _traj(n=40, seed=0):
    """Smooth camera path as (ts, Rcw, tcw) tuples + (pos_wc, Rwc)."""
    rng = np.random.default_rng(seed)
    ts = np.arange(n) * 0.1
    pos = np.stack([np.sin(ts), np.cos(ts * 0.7), 0.1 * ts], -1)
    out = []
    Rwc = []
    for i in range(n):
        th = 0.1 * i
        R = np.array([[np.cos(th), -np.sin(th), 0],
                      [np.sin(th), np.cos(th), 0],
                      [0, 0, 1.0]])
        Rwc.append(R)
        # stored as world->camera like System.trajectory
        out.append((float(ts[i]), R.T, -R.T @ pos[i]))
    return out, pos, np.stack(Rwc), ts


def _sim3_perturbed(traj, s=2.0):
    """Apply a global Sim3 (scale s, fixed R/t) to the camera centers."""
    th = 0.3
    Rg = np.array([[np.cos(th), 0, np.sin(th)],
                   [0, 1, 0],
                   [-np.sin(th), 0, np.cos(th)]])
    tg = np.array([1.0, -2.0, 0.5])
    out = []
    for ts, Rcw, tcw in traj:
        Rwc, twc = Rcw.T, -Rcw.T @ tcw
        Rwc2 = Rg @ Rwc
        twc2 = s * (Rg @ twc) + tg
        out.append((ts, Rwc2.T, -Rwc2.T @ twc2))
    return out


def test_ape_tum_sim3_alignment(tmp_path):
    traj, pos, _, _ = _traj()
    est = _sim3_perturbed(traj, s=2.0)
    p_est, p_gt = str(tmp_path / "est.txt"), str(tmp_path / "gt.txt")
    save_tum(p_est, est)
    save_tum(p_gt, traj)
    # -as recovers the global Sim3 exactly
    val = _run(["ape", "tum", p_est, p_gt, "-as"], capsys=None)
    assert val["value"] < 1e-5 and val["pairs"] == len(traj)
    # unaligned APE is large
    raw = _run(["ape", "tum", p_est, p_gt])
    assert raw["value"] > 0.5
    # SE3-only alignment cannot fix the 2x scale
    se3_only = _run(["ape", "tum", p_est, p_gt, "-a"])
    assert se3_only["value"] > 0.1


def test_ape_kitti_and_loader(tmp_path):
    traj, pos, Rwc, _ = _traj()
    p = str(tmp_path / "k.txt")
    save_kitti(p, traj)
    lp, lr = load_kitti(p)
    np.testing.assert_allclose(lp, pos, atol=1e-6)
    np.testing.assert_allclose(lr, Rwc, atol=1e-6)
    val = _run(["ape", "kitti", p, p, "-a"])
    assert val["value"] < 1e-9


def test_rpe_tum(tmp_path):
    traj, _, _, _ = _traj()
    est = _sim3_perturbed(traj, s=1.0)  # rigid offset: rpe must be ~0
    p_est, p_gt = str(tmp_path / "e.txt"), str(tmp_path / "g.txt")
    save_tum(p_est, est)
    save_tum(p_gt, traj)
    out = _run(["rpe", "tum", p_est, p_gt, "--delta", "2"])
    # rot tolerance: arccos near 1 amplifies the 7-decimal file
    # quantization to ~1e-2 deg
    assert out["trans"] < 1e-5 and out["rot_deg"] < 0.05


def _run(argv, capsys=None):
    import io as _io
    import contextlib
    buf = _io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = evo.main(argv)
    assert rc == 0
    return json.loads(buf.getvalue())
