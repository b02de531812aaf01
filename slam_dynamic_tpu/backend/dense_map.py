"""Dense mapping stage: per-keyframe cloud accumulation with dynamic-object
exclusion + global voxel merge + per-object OBB tracking.

Equivalent of the PointCloudMapping thread (/root/reference/src/
pointcloudmapping.cc:26-166) and the per-object depth/OBB estimation of
Tracking (:809-881). Headless: output is PLY artifacts, not a PCL viewer
(SURVEY §5.5 — TPU hosts have no display).
"""
from __future__ import annotations

from typing import Dict, List, Optional

import jax.numpy as jnp
import numpy as np

from ..config import SystemConfig
from ..utils.camera import Intrinsics
from ..ops import pointcloud as pc


class DenseMapper:
    def __init__(self, cfg: SystemConfig, cam: Intrinsics):
        self.cfg = cfg
        self.cam = cam
        self.clouds: List[np.ndarray] = []
        self.intens: List[np.ndarray] = []
        self.obbs: Dict[int, pc.OBB] = {}    # box track id -> latest OBB

    def insert_keyframe(self, gray: np.ndarray, depth: np.ndarray,
                        R_cw, t_cw, dyn_mask: Optional[np.ndarray] = None,
                        boxes: Optional[np.ndarray] = None,
                        box_ids: Optional[np.ndarray] = None,
                        box_dynamic: Optional[np.ndarray] = None):
        """Add one keyframe's cloud (dynamic pixels excluded); estimate OBBs
        of confirmed-dynamic boxes (ref Tracking.cc:809-881)."""
        h, w = depth.shape
        mask = np.zeros((h, w), bool) if dyn_mask is None else dyn_mask
        if boxes is not None and box_dynamic is not None:
            for b, dyn in zip(boxes, box_dynamic):
                if dyn:
                    x0, y0, x1, y1 = [int(np.clip(v, 0, lim)) for v, lim in
                                      zip(b, [w - 1, h - 1, w - 1, h - 1])]
                    mask[y0:y1 + 1, x0:x1 + 1] = True
        p = self.cfg.pointcloud
        pts, inten, ok = pc.backproject_dense(
            self.cam, jnp.asarray(gray, jnp.float32),
            jnp.asarray(depth, jnp.float32), jnp.asarray(R_cw),
            jnp.asarray(t_cw), jnp.asarray(mask), stride=p.stride,
            min_depth=p.min_depth, max_depth=p.max_depth)
        okn = np.asarray(ok)
        self.clouds.append(np.asarray(pts)[okn])
        self.intens.append(np.asarray(inten)[okn])

        # per-dynamic-object OBB from in-box depth pixels (camera frame)
        if boxes is not None and box_dynamic is not None:
            for b, bid, dyn in zip(boxes, box_ids, box_dynamic):
                if not dyn:
                    continue
                x0, y0, x1, y1 = [int(np.clip(v, 0, lim)) for v, lim in
                                  zip(b, [w - 1, h - 1, w - 1, h - 1])]
                sub_d = depth[y0:y1 + 1, x0:x1 + 1]
                yy, xx = np.mgrid[y0:y1 + 1, x0:x1 + 1]
                good = (sub_d > p.min_depth) & \
                       (sub_d < self.cfg.dynamic.max_object_depth)
                if good.sum() < 20:
                    continue
                # median-depth band (reject background bleed)
                med = np.median(sub_d[good])
                good &= np.abs(sub_d - med) < 0.5
                xs = (xx - float(self.cam.cx)) / float(self.cam.fx) * sub_d
                ys2 = (yy - float(self.cam.cy)) / float(self.cam.fy) * sub_d
                pts_o = np.stack([xs[good], ys2[good], sub_d[good]], axis=1)
                obb = pc.obb_from_points(
                    jnp.asarray(pts_o, jnp.float32),
                    jnp.ones(len(pts_o), bool))
                if bool(obb.valid):
                    self.obbs[int(bid)] = obb

    def global_cloud(self, max_points: int = 200_000):
        """Voxel-merged global map."""
        if not self.clouds:
            return (np.zeros((0, 3), np.float32), np.zeros(0, np.float32))
        pts = np.concatenate(self.clouds)
        inten = np.concatenate(self.intens)
        if len(pts) == 0:
            return pts, inten
        out_p, out_i, ok = pc.voxel_downsample(
            jnp.asarray(pts), jnp.asarray(inten),
            jnp.ones(len(pts), bool),
            self.cfg.pointcloud.voxel_resolution,
            max_out=min(max_points, len(pts)))
        okn = np.asarray(ok)
        return np.asarray(out_p)[okn], np.asarray(out_i)[okn]

    def save_ply(self, path: str):
        pts, inten = self.global_cloud()
        pc.save_ply(path, pts, inten)
        return len(pts)

    def save_pcd(self, path: str):
        """PCL-compatible export (ref pointcloudmapping.cc:161-166)."""
        pts, inten = self.global_cloud()
        pc.save_pcd(path, pts, inten)
        return len(pts)
