"""Trajectory export in TUM and KITTI formats, byte-compatible with the
reference writers (System::SaveTrajectoryTUM /root/reference/src/
System.cc:434-492, SaveTrajectoryKITTI :531-601,
SaveKeyFrameTrajectoryTUM :495-529).

Poses are stored world->camera (Tcw) internally; files contain
camera->world (Twc) as in the reference.
"""
from __future__ import annotations

from typing import List, Tuple

import numpy as np

from ..utils import se3
import jax.numpy as jnp


def _invert(R, t):
    return R.T, -R.T @ t


def save_tum(path: str, traj: List[Tuple[float, np.ndarray, np.ndarray]]):
    """TUM format: `timestamp tx ty tz qx qy qz qw` (ref System.cc:434)."""
    with open(path, "w") as f:
        for ts, R, t in traj:
            Rwc, twc = _invert(np.asarray(R), np.asarray(t))
            q = np.asarray(se3.quat_from_rot(jnp.asarray(Rwc)))  # (w,x,y,z)
            f.write(f"{ts:.6f} {twc[0]:.7f} {twc[1]:.7f} {twc[2]:.7f} "
                    f"{q[1]:.7f} {q[2]:.7f} {q[3]:.7f} {q[0]:.7f}\n")


def save_kitti(path: str, traj: List[Tuple[float, np.ndarray, np.ndarray]]):
    """KITTI format: 12 floats of Twc 3x4 row-major (ref System.cc:531)."""
    with open(path, "w") as f:
        for _, R, t in traj:
            Rwc, twc = _invert(np.asarray(R), np.asarray(t))
            M = np.hstack([Rwc, twc[:, None]])
            f.write(" ".join(f"{v:.9e}" for v in M.reshape(-1)) + "\n")


def load_tum(path: str):
    """Returns (timestamps [T], positions [T,3], quaternions wxyz [T,4])."""
    rows = np.loadtxt(path)
    ts = rows[:, 0]
    pos = rows[:, 1:4]
    q = rows[:, 4:8]  # x y z w
    quat = np.concatenate([q[:, 3:4], q[:, :3]], axis=1)
    return ts, pos, quat


def load_kitti(path: str):
    """Returns (positions [T,3], rotations Rwc [T,3,3]) from a KITTI-format
    pose file (12 floats of Twc 3x4 row-major per line; no timestamps —
    KITTI files are frame-indexed, ref System.cc:531)."""
    rows = np.loadtxt(path).reshape(-1, 3, 4)
    return rows[:, :, 3], rows[:, :, :3]
