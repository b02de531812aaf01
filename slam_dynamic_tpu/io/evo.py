"""Trajectory evaluation: ATE (with SE3/Sim3 Umeyama alignment) and RPE.

Self-contained equivalent of the evo protocol the reference prescribes
(`evo_ape ... -r full -va -as`, /root/reference/README.md:68-77): `-a`
aligns, `-s` additionally solves scale (Umeyama), APE is the RMSE of
aligned translation errors. evo is not installable here (zero egress), so
the metric is implemented directly and unit-tested against closed-form
cases.
"""
from __future__ import annotations

from typing import Tuple

import numpy as np


def umeyama(src: np.ndarray, dst: np.ndarray, with_scale: bool = True):
    """Least-squares similarity transform: dst ~ s R src + t.

    src/dst: [N, 3]. Returns (s, R [3,3], t [3]).
    """
    mu_s = src.mean(0)
    mu_d = dst.mean(0)
    xs = src - mu_s
    xd = dst - mu_d
    cov = xd.T @ xs / len(src)
    U, D, Vt = np.linalg.svd(cov)
    S = np.eye(3)
    if np.linalg.det(U) * np.linalg.det(Vt) < 0:
        S[2, 2] = -1
    R = U @ S @ Vt
    if with_scale:
        var_s = (xs ** 2).sum() / len(src)
        s = float(np.trace(np.diag(D) @ S) / max(var_s, 1e-12))
    else:
        s = 1.0
    t = mu_d - s * R @ mu_s
    return s, R, t


def ate_rmse(est_pos: np.ndarray, gt_pos: np.ndarray,
             align: bool = True, with_scale: bool = True) -> float:
    """Absolute trajectory error RMSE after optional Umeyama alignment
    (evo_ape -r full [-a[-s]]). est/gt: [N, 3] associated positions."""
    est = np.asarray(est_pos, np.float64)
    gt = np.asarray(gt_pos, np.float64)
    assert est.shape == gt.shape and est.ndim == 2
    if align:
        s, R, t = umeyama(est, gt, with_scale)
        est = (s * (R @ est.T)).T + t
    err = np.linalg.norm(est - gt, axis=1)
    return float(np.sqrt((err ** 2).mean()))


def rpe(est_pos: np.ndarray, est_rot: np.ndarray, gt_pos: np.ndarray,
        gt_rot: np.ndarray, delta: int = 1) -> Tuple[float, float]:
    """Relative pose error over frame gaps of `delta` (evo_rpe).

    est_rot/gt_rot: [N, 3, 3] camera->world rotations.
    Returns (trans RMSE per step, rot RMSE degrees per step).
    """
    terrs, rerrs = [], []
    N = len(est_pos)
    for i in range(N - delta):
        j = i + delta
        dE_R = est_rot[i].T @ est_rot[j]
        dE_t = est_rot[i].T @ (est_pos[j] - est_pos[i])
        dG_R = gt_rot[i].T @ gt_rot[j]
        dG_t = gt_rot[i].T @ (gt_pos[j] - gt_pos[i])
        dR = dE_R.T @ dG_R
        terrs.append(np.linalg.norm(dE_t - dG_t))
        ang = np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1))
        rerrs.append(np.degrees(ang))
    return (float(np.sqrt(np.mean(np.square(terrs)))),
            float(np.sqrt(np.mean(np.square(rerrs)))))


def associate(ts_a: np.ndarray, ts_b: np.ndarray, max_dt: float = 0.02):
    """Nearest-timestamp association (evo/TUM associate.py equivalent).
    Returns index pairs (ia, ib)."""
    ia, ib = [], []
    j = 0
    for i, ta in enumerate(ts_a):
        j = int(np.argmin(np.abs(ts_b - ta)))
        if abs(ts_b[j] - ta) <= max_dt:
            ia.append(i)
            ib.append(j)
    return np.asarray(ia), np.asarray(ib)


def _quat_to_rot(q: np.ndarray) -> np.ndarray:
    """[N,4] wxyz unit quaternions -> [N,3,3] rotation matrices."""
    w, x, y, z = q[:, 0], q[:, 1], q[:, 2], q[:, 3]
    return np.stack([
        np.stack([1 - 2 * (y * y + z * z), 2 * (x * y - w * z),
                  2 * (x * z + w * y)], -1),
        np.stack([2 * (x * y + w * z), 1 - 2 * (x * x + z * z),
                  2 * (y * z - w * x)], -1),
        np.stack([2 * (x * z - w * y), 2 * (y * z + w * x),
                  1 - 2 * (x * x + y * y)], -1),
    ], axis=1)


def _load(path: str, fmt: str):
    """Returns (timestamps or None, positions [T,3], rotations [T,3,3])."""
    from .trajectory import load_tum, load_kitti
    if fmt == "tum":
        ts, pos, quat = load_tum(path)
        return ts, pos, _quat_to_rot(quat)
    pos, rot = load_kitti(path)
    return None, pos, rot


def main(argv=None):
    """CLI mirroring the reference's prescribed evaluation commands
    (`evo_ape kitti|tum EST GT -r full -va -as`, `evo_rpe tum ...`,
    /root/reference/README.md:68-77):

        python -m slam_dynamic_tpu.io.evo ape tum  est.txt gt.txt -as
        python -m slam_dynamic_tpu.io.evo ape kitti est.txt gt.txt -a
        python -m slam_dynamic_tpu.io.evo rpe tum  est.txt gt.txt --delta 1
    """
    import argparse
    import json
    ap = argparse.ArgumentParser(prog="slam_dynamic_tpu.io.evo")
    ap.add_argument("mode", choices=["ape", "rpe"])
    ap.add_argument("fmt", choices=["tum", "kitti"])
    ap.add_argument("est")
    ap.add_argument("gt")
    ap.add_argument("-a", "--align", action="store_true",
                    help="Umeyama SE3 alignment (evo -a)")
    ap.add_argument("-s", "--scale", action="store_true",
                    help="also solve scale: Sim3 alignment (evo -s)")
    ap.add_argument("-as", dest="align_scale", action="store_true",
                    help="shorthand for -a -s")
    ap.add_argument("--delta", type=int, default=1,
                    help="rpe: frame gap (default 1)")
    ap.add_argument("--max-dt", type=float, default=0.02,
                    help="tum: timestamp association tolerance (s)")
    args = ap.parse_args(argv)
    align = args.align or args.align_scale
    scale = args.scale or args.align_scale

    ts_e, pos_e, rot_e = _load(args.est, args.fmt)
    ts_g, pos_g, rot_g = _load(args.gt, args.fmt)
    if args.fmt == "tum":
        ia, ib = associate(ts_e, ts_g, args.max_dt)
        if len(ia) == 0:
            raise SystemExit("no associated timestamps within --max-dt")
        pos_e, rot_e = pos_e[ia], rot_e[ia]
        pos_g, rot_g = pos_g[ib], rot_g[ib]
    else:
        n = min(len(pos_e), len(pos_g))
        pos_e, rot_e, pos_g, rot_g = (pos_e[:n], rot_e[:n],
                                      pos_g[:n], rot_g[:n])

    if args.mode == "ape":
        val = ate_rmse(pos_e, pos_g, align=align, with_scale=scale)
        out = {"metric": "ape_rmse", "value": round(val, 6), "unit": "m",
               "pairs": len(pos_e), "align": align, "scale": scale}
    else:
        tv, rv = rpe(pos_e, rot_e, pos_g, rot_g, delta=args.delta)
        out = {"metric": "rpe_rmse", "trans": round(tv, 6),
               "rot_deg": round(rv, 6), "delta": args.delta,
               "pairs": len(pos_e)}
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
