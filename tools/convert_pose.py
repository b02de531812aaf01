#!/usr/bin/env python
"""Ground-truth pose conversion: Euler-angle trajectories -> TUM format.

Equivalent of the reference's tools/convert_pose.py (Webots ground truth ->
TUM trajectory, /root/reference/tools/convert_pose.py:9-44): reads rows of
`timestamp x y z roll pitch yaw` and writes `timestamp tx ty tz qx qy qz qw`.
"""
import argparse
import numpy as np
from scipy.spatial.transform import Rotation


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("input")
    ap.add_argument("output")
    ap.add_argument("--order", default="xyz", help="Euler order")
    ap.add_argument("--degrees", action="store_true")
    args = ap.parse_args()
    rows = np.loadtxt(args.input, ndmin=2)
    with open(args.output, "w") as f:
        for r in rows:
            ts, x, y, z = r[0], r[1], r[2], r[3]
            q = Rotation.from_euler(args.order, r[4:7],
                                    degrees=args.degrees).as_quat()
            f.write(f"{ts:.6f} {x:.7f} {y:.7f} {z:.7f} "
                    f"{q[0]:.7f} {q[1]:.7f} {q[2]:.7f} {q[3]:.7f}\n")


if __name__ == "__main__":
    main()
