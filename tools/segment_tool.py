#!/usr/bin/env python
"""Offline detection/segmentation precompute tool.

Equivalent of the reference's tools/mask.py (torchvision Mask R-CNN,
/root/reference/tools/mask.py:24-92): runs a detector over a directory of
frames and writes, per frame, the box txt (`cls x0 y0 x1 y1 score` rows)
and a binary mask PNG — the exact artifacts the RGB-D drivers consume
(rgbd_my.cc:185-254; loaded back via models.detector.load_precomputed_boxes
and the masks_dir of io.datasets.TumRGBD).

The detector is the in-repo flax CenterNet-style model (models/detector.py)
with weights from --params (torchvision is not available in this
environment; any detector producing the same txt/png format plugs in).

Usage:
  python tools/segment_tool.py --images <dir-of-pngs> --out <dir> \
      [--params det.npz] [--conf 0.5]
"""
import argparse
import glob
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--images", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--params", default=None)
    ap.add_argument("--conf", type=float, default=0.5)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    from slam_dynamic_tpu.config import DetectorConfig
    from slam_dynamic_tpu.models.detector import Detector
    from slam_dynamic_tpu.io.native_loader import PrefetchingLoader
    from slam_dynamic_tpu.viz.headless import write_png

    paths = sorted(glob.glob(os.path.join(args.images, "*.png")))
    if not paths:
        print("no PNGs found", file=sys.stderr)
        return 1
    os.makedirs(args.out, exist_ok=True)

    det = None
    for i, img in enumerate(PrefetchingLoader(paths)):
        img = np.asarray(img, np.float32)
        if det is None:
            from slam_dynamic_tpu.models.detector import \
                default_detector_weights
            cfg = DetectorConfig(mode="online", conf_threshold=args.conf)
            wpath = args.params or default_detector_weights()
            if wpath:
                det = Detector.from_npz(cfg, img.shape[0], img.shape[1],
                                        wpath)
            else:
                det = Detector(cfg, img.shape[0], img.shape[1])
        d = det.detect(img)
        keep = np.asarray(d.valid)
        boxes = np.asarray(d.boxes)[keep]
        scores = np.asarray(d.scores)[keep]
        classes = np.asarray(d.classes)[keep]
        with open(os.path.join(args.out, f"{i:06d}.txt"), "w") as f:
            for b, s, c in zip(boxes, scores, classes):
                f.write(f"{int(c)} {b[0]:.1f} {b[1]:.1f} {b[2]:.1f} "
                        f"{b[3]:.1f} {s:.3f}\n")
        mask = np.zeros(img.shape, np.uint8)
        h, w = img.shape
        for b in boxes:
            x0, y0, x1, y1 = [int(np.clip(v, 0, lim)) for v, lim in
                              zip(b, [w - 1, h - 1, w - 1, h - 1])]
            mask[y0:y1 + 1, x0:x1 + 1] = 255
        write_png(os.path.join(args.out, f"mask_{i:06d}.png"), mask)
    print(f"wrote detections for {len(paths)} frames to {args.out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
