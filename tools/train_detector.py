"""Train the online dynamic-object detector on synthetic ground truth.

The reference loads pretrained Darknet YOLOv3 weights (src/yolo.cc:15-31);
with zero egress we train the flax CenterNet (models/detector.py) on the
in-repo synthetic world's ground-truth boxes and ship the weights as an
asset, so the ONLINE path (no precomputed boxes) actually detects and
quarantines the moving object.

Usage:
    python tools/train_detector.py                   # ships the asset
    python tools/train_detector.py --steps 400 --eval
"""
import argparse
import dataclasses
import os
import sys
import time

import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
import optax  # noqa: E402

from slam_dynamic_tpu.config import DetectorConfig  # noqa: E402
from slam_dynamic_tpu.io.synthetic import SynthConfig, generate  # noqa: E402
from slam_dynamic_tpu.models.detector import (CenterDetector,  # noqa: E402
                                              Detector)

STRIDE = 8
CLS = 0          # the synthetic moving object trains as class 0 ("person")
N_CLASSES = 8    # reduced head: 80 COCO classes would drown the heatmap
                 # focal loss in negatives on a 1-class synthetic corpus


def build_dataset(height, width, n_frames=50):
    """Images + ground-truth boxes from varied dynamic synthetic scenes."""
    imgs, boxes, valids = [], [], []
    base = dict(n_frames=n_frames, width=width, height=height, fx=260.0,
                fy=260.0, cx=width / 2 - 0.5, cy=height / 2 - 0.5,
                dynamic_object=True)
    variants = [
        dict(seed=0, obj_speed=0.06, obj_size=1.0, texture_cells=2.8),
        dict(seed=1, obj_speed=0.04, obj_size=1.4, obj_depth=3.4,
             texture_cells=2.2),
        dict(seed=2, obj_speed=0.08, obj_size=0.7, obj_depth=4.6,
             texture_cells=3.2, obj_bob=0.2),
        dict(seed=3, obj_speed=0.05, obj_size=1.2, obj_x0=-1.2,
             texture_cells=2.5),
        # large/close objects: boxes up to ~half the image — without these
        # the size head collapses to the small-box mode and big detections
        # both shrink and drop out (measured on the e2e dynamic scene)
        dict(seed=4, obj_speed=0.09, obj_size=1.6, obj_depth=3.0,
             texture_cells=2.6),
        dict(seed=5, obj_speed=0.07, obj_size=2.0, obj_depth=2.6,
             texture_cells=3.0),
        dict(seed=6, obj_speed=0.10, obj_size=1.8, obj_depth=2.8,
             obj_x0=0.8, texture_cells=2.4, obj_bob=0.1),
        dict(seed=9, obj_speed=0.05, obj_size=1.6, obj_depth=2.4,
             obj_x0=-0.8, texture_cells=3.4),
    ]
    for v in variants:
        seq = generate(SynthConfig(**base, **v))
        for f in range(seq.gray.shape[0]):
            imgs.append(seq.gray[f])
            boxes.append(seq.boxes[f, 0])
            valids.append(bool(seq.box_valid[f, 0]))
    # negatives: static scenes (no object)
    for seed in (7, 8):
        neg = dict(base, dynamic_object=False, seed=seed)
        seq = generate(SynthConfig(**neg))
        for f in range(0, seq.gray.shape[0], 2):
            imgs.append(seq.gray[f])
            boxes.append(np.full(4, -1.0, np.float32))
            valids.append(False)
    return (np.stack(imgs).astype(np.float32), np.stack(boxes),
            np.asarray(valids))


def make_targets(boxes, valids, height, width, n_classes=N_CLASSES):
    """CenterNet targets: Gaussian heatmap + size (neighborhood) +
    offset (center cell)."""
    hh, ww = height // STRIDE, width // STRIDE
    n = len(boxes)
    heat = np.zeros((n, hh, ww, n_classes), np.float32)
    size = np.zeros((n, hh, ww, 2), np.float32)
    off = np.zeros((n, hh, ww, 2), np.float32)
    mask = np.zeros((n, hh, ww, 1), np.float32)
    offm = np.zeros((n, hh, ww, 1), np.float32)
    ys, xs = np.mgrid[0:hh, 0:ww]
    for i, (b, v) in enumerate(zip(boxes, valids)):
        if not v:
            continue
        x0, y0, x1, y1 = b
        w_px, h_px = x1 - x0, y1 - y0
        if w_px <= 2 or h_px <= 2:
            continue
        cx, cy = (x0 + x1) / 2 / STRIDE, (y0 + y1) / 2 / STRIDE
        ix, iy = int(np.clip(cx, 0, ww - 1)), int(np.clip(cy, 0, hh - 1))
        sigma = max(1.0, min(w_px, h_px) / STRIDE / 3.0)
        g = np.exp(-((xs - cx) ** 2 + (ys - cy) ** 2) / (2 * sigma ** 2))
        heat[i, :, :, CLS] = np.maximum(heat[i, :, :, CLS], g)
        heat[i, iy, ix, CLS] = 1.0
        # supervise SIZE over the whole gaussian neighborhood (size is
        # translation-invariant): at inference the peak can land a cell
        # or two off-center, and a center-only target leaves those cells'
        # size heads untrained (they regress to the dataset mean —
        # measured as systematic box shrink on big objects). Offsets stay
        # center-cell-only sub-cell corrections (CenterNet convention).
        nb = g >= 0.3
        size[i, nb] = (w_px, h_px)
        mask[i, nb, 0] = 1.0
        off[i, iy, ix] = (cx - ix, cy - iy)
        offm[i, iy, ix, 0] = 1.0
    return heat, size, off, mask, offm


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(__file__), "..", "slam_dynamic_tpu", "assets",
        "detector_synth.npz"))
    ap.add_argument("--steps", type=int, default=1500)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--lr", type=float, default=3e-3)
    ap.add_argument("--width", type=int, default=320)
    ap.add_argument("--height", type=int, default=240)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--eval", action="store_true")
    args = ap.parse_args()

    t0 = time.time()
    imgs, boxes, valids = build_dataset(args.height, args.width)
    heat_t, size_t, off_t, mask_t, offm_t = make_targets(
        boxes, valids, args.height, args.width)
    print(f"[data] {len(imgs)} frames ({valids.sum()} positive) "
          f"({time.time() - t0:.1f}s)", file=sys.stderr)

    model = CenterDetector(n_classes=N_CLASSES)
    key = jax.random.PRNGKey(args.seed)
    params = model.init(key, jnp.zeros((args.height, args.width, 1)))
    opt = optax.adam(optax.cosine_decay_schedule(args.lr, args.steps))
    opt_state = opt.init(params)

    def loss_fn(p, im, ht, st, ot, mk, om):
        heat, size, off = jax.vmap(
            lambda x: model.apply(p, x[..., None] / 255.0))(im)
        pr = jax.nn.sigmoid(heat)
        pos = ht >= 1.0
        # penalty-reduced focal loss (CenterNet)
        l_pos = -jnp.where(pos, ((1 - pr) ** 2) * jnp.log(pr + 1e-6), 0.0)
        l_neg = -jnp.where(~pos, ((1 - ht) ** 4) * (pr ** 2)
                           * jnp.log(1 - pr + 1e-6), 0.0)
        n_pos = jnp.maximum(pos.sum(), 1)
        l_heat = (l_pos.sum() + l_neg.sum()) / n_pos
        # log-space L1, normalized per supervised CELL (neighborhood mask)
        l_size = jnp.sum(jnp.abs(jnp.log(size + 1e-3)
                                 - jnp.log(st + 1e-3)) * mk) \
            / jnp.maximum(mk.sum(), 1)
        l_off = jnp.sum(jnp.abs(off - ot) * om) / n_pos
        return l_heat + l_size + l_off

    @jax.jit
    def step(p, o, im, ht, st, ot, mk, om):
        l, g = jax.value_and_grad(loss_fn)(p, im, ht, st, ot, mk, om)
        up, o = opt.update(g, o)
        return optax.apply_updates(p, up), o, l

    rs = np.random.RandomState(args.seed)
    n = len(imgs)
    for it in range(args.steps):
        sel = rs.choice(n, args.batch, replace=False)
        params, opt_state, loss = step(
            params, opt_state, jnp.asarray(imgs[sel]),
            jnp.asarray(heat_t[sel]), jnp.asarray(size_t[sel]),
            jnp.asarray(off_t[sel]), jnp.asarray(mask_t[sel]),
            jnp.asarray(offm_t[sel]))
        if it % 50 == 0 or it == args.steps - 1:
            print(f"[train] step {it}: loss {float(loss):.4f}",
                  file=sys.stderr)

    os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
    det = Detector(DetectorConfig(mode="online"), args.height, args.width,
                   params=params, n_classes=N_CLASSES)
    det.save_params(args.out)
    print(f"[save] {args.out}")

    if args.eval:
        from slam_dynamic_tpu.frontend.boxtrack import iou_matrix
        hits = tot = 0
        for i in range(0, n, 7):
            if not valids[i]:
                continue
            d = det.detect(imgs[i])
            v = np.asarray(d.valid)
            tot += 1
            if v.any():
                ious = iou_matrix(np.asarray(d.boxes)[v],
                                  boxes[i][None, :])
                if ious.max() > 0.5:
                    hits += 1
        print(f"[eval] recall@iou0.5: {hits}/{tot}")


if __name__ == "__main__":
    main()
