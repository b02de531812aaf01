"""Dynamic-object detector: JAX inference pass + detection post-processing.

Equivalent of yolov3Segment (/root/reference/src/yolo.cc): the reference
runs Darknet YOLOv3 through OpenCV DNN on CPU; here the online path is a
flax single-stage anchor-free detector (CenterNet-style head on a small
conv backbone) compiled by XLA, and the offline path loads precomputed
boxes (the reference's own recommended mode, README.md:41-42 + the
Mask-R-CNN tool outputs consumed by Examples/RGB-D/rgbd_my.cc:185-254).

Post-processing parity: confidence threshold 0.5, NMS 0.4, dynamic-class
filter, and the box reshape of `rectCenterScale` (width*0.8, height*1.6 —
src/yolo.cc:142-149) applied for the stereo path.

Weights load from .npz (`load_params`); random-init weights exercise the
full compute path for plumbing tests. No pretrained YOLO weights ship in
this environment (zero egress).
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..config import DetectorConfig
from ..ops.nms import nms


class Detections(NamedTuple):
    boxes: jnp.ndarray     # [D, 4] x0, y0, x1, y1 (input-image pixels)
    scores: jnp.ndarray    # [D]
    classes: jnp.ndarray   # [D] int32
    valid: jnp.ndarray     # [D] bool


class ConvBlock(nn.Module):
    features: int
    stride: int = 1

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.features, (3, 3), strides=(self.stride,) * 2,
                    use_bias=False)(x)
        x = nn.GroupNorm(num_groups=min(8, self.features))(x)
        return nn.silu(x)


class CenterDetector(nn.Module):
    """Anchor-free detector: stride-8 heatmap + size + offset heads.

    Output maps: class heatmap [H/8, W/8, C], box size [.., 2] (w, h in
    input px), center offset [.., 2].
    """

    n_classes: int = 80
    width: int = 32

    @nn.compact
    def __call__(self, x):
        w = self.width
        x = ConvBlock(w, 2)(x)          # /2
        x = ConvBlock(w)(x)
        x = ConvBlock(w * 2, 2)(x)      # /4
        x = ConvBlock(w * 2)(x)
        x = ConvBlock(w * 4, 2)(x)      # /8
        x = ConvBlock(w * 4)(x)
        x = ConvBlock(w * 4)(x)
        heat = nn.Conv(self.n_classes, (1, 1))(x)
        # log-space size: equal relative gradient for 10px and 200px boxes
        size = jnp.exp(jnp.clip(nn.Conv(2, (1, 1))(x), -3.0, 4.0)) * 8.0
        off = nn.Conv(2, (1, 1))(x)
        return heat, size, off


class Detector:
    """Host wrapper: params + jitted inference + postprocess."""

    def __init__(self, cfg: DetectorConfig, height: int, width: int,
                 params=None, seed: int = 0, n_classes: int = 80):
        self.cfg = cfg
        self.n_classes = n_classes
        self.model = CenterDetector(n_classes=n_classes)
        self.h, self.w = height, width
        if params is None:
            params = self.model.init(
                jax.random.PRNGKey(seed),
                jnp.zeros((height, width, 1)))
        self.params = params
        self._infer = jax.jit(self._infer_impl)

    @staticmethod
    def from_npz(cfg: DetectorConfig, height: int, width: int, path: str,
                 seed: int = 0) -> "Detector":
        """Construct with trained weights; the class count rides in the
        asset (the synthetic-trained head uses a reduced class set)."""
        import pickle
        z = np.load(path)
        params = pickle.loads(z["blob"].tobytes())
        n_classes = int(z["n_classes"]) if "n_classes" in z.files else 80
        return Detector(cfg, height, width, params=params, seed=seed,
                        n_classes=n_classes)

    def _infer_impl(self, params, image):
        """image [H, W] float32 -> Detections (fixed capacity)."""
        x = image[..., None] / 255.0
        heat, size, off = self.model.apply(params, x)
        hh, ww, C = heat.shape
        scores_all = jax.nn.sigmoid(heat)
        # peak (local-max) gating like CenterNet
        pooled = jax.lax.reduce_window(scores_all, -jnp.inf, jax.lax.max,
                                       (3, 3, 1), (1, 1, 1), "SAME")
        peak = (scores_all >= pooled) & (scores_all > self.cfg.conf_threshold)
        flat = jnp.where(peak, scores_all, 0.0).reshape(-1)
        k = self.cfg.max_detections * 2
        top, idx = jax.lax.top_k(flat, k)
        cls = (idx % C).astype(jnp.int32)
        cell = idx // C
        cy = (cell // ww).astype(jnp.float32)
        cx = (cell % ww).astype(jnp.float32)
        offs = off.reshape(-1, 2)[cell]
        sizes = size.reshape(-1, 2)[cell]
        px = (cx + offs[:, 0]) * 8.0
        py = (cy + offs[:, 1]) * 8.0
        boxes = jnp.stack([px - sizes[:, 0] / 2, py - sizes[:, 1] / 2,
                           px + sizes[:, 0] / 2, py + sizes[:, 1] / 2], -1)
        # clip to the image: ground truth (and the box tracker) live in
        # clipped coordinates, so off-image extents only cost IoU
        lim = jnp.array([self.w - 1, self.h - 1, self.w - 1, self.h - 1],
                        jnp.float32)
        boxes = jnp.clip(boxes, 0.0, lim)
        ok = top > self.cfg.conf_threshold
        # dynamic-class filter (ref yolo.cc:127)
        cls_ok = jnp.zeros_like(ok)
        for c in self.cfg.dynamic_classes:
            cls_ok |= cls == c
        ok &= cls_ok
        keep_idx, keep = nms(boxes, jnp.where(ok, top, 0.0), ok,
                             self.cfg.nms_threshold,
                             max_out=self.cfg.max_detections)
        return Detections(boxes[keep_idx], top[keep_idx], cls[keep_idx],
                          keep)

    def detect(self, image: np.ndarray) -> Detections:
        return self._infer(self.params, jnp.asarray(image, jnp.float32))

    def save_params(self, path: str):
        import pickle
        flat = jax.tree_util.tree_map(np.asarray, self.params)
        np.savez_compressed(path, blob=np.frombuffer(
            pickle.dumps(flat), dtype=np.uint8),
            n_classes=self.n_classes)

    @staticmethod
    def load_params(path: str):
        import pickle
        z = np.load(path)
        return pickle.loads(z["blob"].tobytes())


def default_detector_weights():
    """Shipped trained weights (tools/train_detector.py on the synthetic
    corpus — the analog of the reference's bundled Darknet weights,
    src/yolo.cc:15-31), or None if absent."""
    import os
    p = os.path.join(os.path.dirname(__file__), "..", "assets",
                     "detector_synth.npz")
    return p if os.path.exists(p) else None


def reshape_boxes_stereo(boxes: np.ndarray, shrink_w: float = 0.8,
                         grow_h: float = 1.6) -> np.ndarray:
    """`rectCenterScale` parity (src/yolo.cc:142-149): shrink width 20%,
    grow height 60% about the centre (captures full pedestrians/vehicles
    while avoiding background at the sides)."""
    b = np.asarray(boxes, np.float32).reshape(-1, 4)
    cx = (b[:, 0] + b[:, 2]) / 2
    cy = (b[:, 1] + b[:, 3]) / 2
    hw = (b[:, 2] - b[:, 0]) / 2 * shrink_w
    hh = (b[:, 3] - b[:, 1]) / 2 * grow_h
    return np.stack([cx - hw, cy - hh, cx + hw, cy + hh], 1)


def load_precomputed_boxes(path: str, frame_idx: int) -> np.ndarray:
    """Offline detections: per-frame txt `cls x0 y0 x1 y1 [score]` rows
    (format of the reference's yolov5_2Dbbox files consumed by
    Examples/RGB-D/rgbd_my.cc:203-254)."""
    import os
    fp = os.path.join(path, f"{frame_idx:06d}.txt")
    if not os.path.exists(fp):
        return np.zeros((0, 4), np.float32)
    rows = np.loadtxt(fp, ndmin=2)
    if rows.size == 0:
        return np.zeros((0, 4), np.float32)
    return rows[:, 1:5].astype(np.float32)
