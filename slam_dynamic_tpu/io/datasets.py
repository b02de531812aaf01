"""Dataset loaders: TUM RGB-D, KITTI odometry, and the synthetic world.

Format parity with the reference drivers:
  - TUM: rgb.txt/depth.txt timestamp association + 16-bit depth PNGs with
    DepthMapFactor scaling (Examples/RGB-D drivers, LoadImages in
    /root/reference/Examples/RGB-D/rgbd_my.cc and mono_tum.cc),
    groundtruth.txt in TUM trajectory format;
  - KITTI: sequences/NN/image_0, image_1, times.txt
    (/root/reference/Examples/Stereo/stereo_kitti.cc LoadImages :180-213);
  - precomputed per-frame detection txts + mask PNGs (the offline detector
    path, rgbd_my.cc:185-254).
Images are decoded with PIL (the C++ prefetching loader in native/ can be
swapped in for production IO).
"""
from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Iterator, Optional, Tuple

import numpy as np


def _read_gray(path: str) -> np.ndarray:
    from PIL import Image
    return np.asarray(Image.open(path).convert("L"), np.float32)


def _read_depth_tum(path: str, factor: float) -> np.ndarray:
    from PIL import Image
    raw = np.asarray(Image.open(path), np.float32)
    return raw / factor


@dataclass
class FramePacket:
    index: int
    timestamp: float
    gray: np.ndarray
    depth: Optional[np.ndarray] = None
    right: Optional[np.ndarray] = None
    detections: Optional[np.ndarray] = None
    mask: Optional[np.ndarray] = None


def _associate(ts_a, ts_b, max_dt=0.02):
    out = []
    for i, ta in enumerate(ts_a):
        j = int(np.argmin(np.abs(ts_b - ta)))
        if abs(ts_b[j] - ta) <= max_dt:
            out.append((i, j))
    return out


class TumRGBD:
    """TUM RGB-D sequence directory (rgb.txt, depth.txt, groundtruth.txt)."""

    def __init__(self, root: str, depth_factor: float = 5000.0,
                 boxes_dir: Optional[str] = None,
                 masks_dir: Optional[str] = None):
        self.root = root
        self.depth_factor = depth_factor
        self.boxes_dir = boxes_dir
        self.masks_dir = masks_dir
        rgb = self._read_list(os.path.join(root, "rgb.txt"))
        dep = self._read_list(os.path.join(root, "depth.txt"))
        pairs = _associate(np.array([t for t, _ in rgb]),
                           np.array([t for t, _ in dep]))
        self.items = [(rgb[i][0], rgb[i][1], dep[j][1]) for i, j in pairs]

    @staticmethod
    def _read_list(path):
        out = []
        with open(path) as f:
            for line in f:
                line = line.strip()
                if not line or line.startswith("#"):
                    continue
                ts, rel = line.split()[:2]
                out.append((float(ts), rel))
        return out

    def __len__(self):
        return len(self.items)

    def __iter__(self) -> Iterator[FramePacket]:
        from .native_loader import PrefetchingLoader, native_available
        rgb_paths = [os.path.join(self.root, r) for _, r, _ in self.items]
        dep_paths = [os.path.join(self.root, d) for _, _, d in self.items]
        if native_available():
            rgb_it = iter(PrefetchingLoader(rgb_paths))
            dep_it = iter(PrefetchingLoader(dep_paths))
        else:
            rgb_it = (_read_gray(p) for p in rgb_paths)
            dep_it = (_read_depth_tum(p, 1.0) * 1.0 for p in dep_paths)
        for i, (ts, rgb_rel, dep_rel) in enumerate(self.items):
            det = None
            if self.boxes_dir:
                from ..models.detector import load_precomputed_boxes
                det = load_precomputed_boxes(self.boxes_dir, i)
            mask = None
            if self.masks_dir:
                mp = os.path.join(self.masks_dir, f"mask_{i:06d}.png")
                if os.path.exists(mp):
                    mask = _read_gray(mp) > 127
            # camera-native dtypes end to end: uint8 gray + raw uint16
            # depth go to the device unconverted (System scales by
            # camera.depth_map_factor on device — frontend/fused.py)
            dep = np.asarray(next(dep_it))
            if dep.dtype != np.uint16:
                dep = np.clip(dep, 0, 65535).astype(np.uint16)
            gray = np.asarray(next(rgb_it))
            if gray.dtype != np.uint8:
                gray = np.clip(gray, 0, 255).astype(np.uint8)
            yield FramePacket(i, ts, gray, depth=dep, detections=det,
                              mask=mask)

    def groundtruth(self):
        from .trajectory import load_tum
        return load_tum(os.path.join(self.root, "groundtruth.txt"))


class KittiStereo:
    """KITTI odometry sequence dir (image_0/, image_1/, times.txt)."""

    def __init__(self, seq_dir: str, boxes_dir: Optional[str] = None):
        self.dir = seq_dir
        self.boxes_dir = boxes_dir
        with open(os.path.join(seq_dir, "times.txt")) as f:
            self.times = [float(line) for line in f if line.strip()]

    def __len__(self):
        return len(self.times)

    def __iter__(self) -> Iterator[FramePacket]:
        for i, ts in enumerate(self.times):
            det = None
            if self.boxes_dir:
                from ..models.detector import load_precomputed_boxes
                det = load_precomputed_boxes(self.boxes_dir, i)
            # uint8 passthrough: cast to float happens on device
            left = _read_gray(os.path.join(self.dir, "image_0",
                                           f"{i:06d}.png"))
            right = _read_gray(os.path.join(self.dir, "image_1",
                                            f"{i:06d}.png"))
            yield FramePacket(
                i, ts, np.clip(left, 0, 255).astype(np.uint8),
                right=np.clip(right, 0, 255).astype(np.uint8),
                detections=det)


class SyntheticDataset:
    """In-memory synthetic sequence as a dataset (tests/benchmarks)."""

    def __init__(self, seq, use_boxes: bool = False, use_masks: bool = False,
                 stereo: bool = False):
        self.seq = seq
        self.use_boxes = use_boxes
        self.use_masks = use_masks
        self.stereo = stereo

    def __len__(self):
        return self.seq.gray.shape[0]

    def __iter__(self) -> Iterator[FramePacket]:
        s = self.seq
        for i in range(len(self)):
            det = None
            if self.use_boxes and s.box_valid[i].any():
                det = s.boxes[i][s.box_valid[i]]
            yield FramePacket(
                i, float(s.timestamps[i]), s.gray[i],
                depth=None if self.stereo else s.depth[i],
                right=s.right[i] if self.stereo else None,
                detections=det,
                mask=s.masks[i] if self.use_masks else None)
