"""Non-maximum suppression with fixed output capacity.

Equivalent of cv::dnn::NMSBoxes as used by yolov3Segment::postprocess
(/root/reference/src/yolo.cc:80-137). Fixed-k iterative suppression: at
each of max_out steps pick the highest-score surviving box and suppress
overlaps — fully jit-compatible (lax.fori_loop, no dynamic shapes).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def iou_matrix(a, b):
    """[A, B] IoU for (x0, y0, x1, y1) boxes."""
    x0 = jnp.maximum(a[:, None, 0], b[None, :, 0])
    y0 = jnp.maximum(a[:, None, 1], b[None, :, 1])
    x1 = jnp.minimum(a[:, None, 2], b[None, :, 2])
    y1 = jnp.minimum(a[:, None, 3], b[None, :, 3])
    inter = jnp.clip(x1 - x0, 0) * jnp.clip(y1 - y0, 0)
    area_a = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
    area_b = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
    union = area_a[:, None] + area_b[None, :] - inter
    return inter / jnp.maximum(union, 1e-9)


@functools.partial(jax.jit, static_argnames=("max_out",))
def nms(boxes, scores, valid, iou_threshold: float = 0.4,
        max_out: int = 32):
    """Returns (indices [max_out], keep_mask [max_out])."""
    iou = iou_matrix(boxes, boxes)
    alive = valid & (scores > 0)

    def body(i, carry):
        alive, out_idx, out_ok = carry
        s = jnp.where(alive, scores, -jnp.inf)
        best = jnp.argmax(s)
        ok = s[best] > -jnp.inf
        out_idx = out_idx.at[i].set(jnp.where(ok, best, 0).astype(jnp.int32))
        out_ok = out_ok.at[i].set(ok)
        # suppress the winner and its overlaps
        suppress = (iou[best] > iou_threshold) | \
            (jnp.arange(boxes.shape[0]) == best)
        alive = alive & ~(suppress & ok)
        return alive, out_idx, out_ok

    _, idx, keep = jax.lax.fori_loop(
        0, max_out, body,
        (alive, jnp.zeros(max_out, jnp.int32), jnp.zeros(max_out, bool)))
    return idx, keep
