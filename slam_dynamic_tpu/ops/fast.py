"""FAST-9-16 corner detection, fully vectorized over the image plane.

Replaces cv::FAST as used by ORBextractor::ComputeKeyPointsOctTree
(/root/reference/src/ORBextractor.cc:765-853). Instead of scalar ring walks,
the segment test is evaluated for every pixel at once on the VPU: the 16 ring
comparisons become 16 shifted-image compares packed into a uint32 bitmask,
and the "9 contiguous" test is a logarithmic AND-shift reduction on the
doubled mask. Dual-threshold cell fallback (iniThFAST -> minThFAST) is a
masked select rather than a per-cell re-run.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# Bresenham circle of radius 3 (the FAST-16 ring), clockwise from 12 o'clock.
# Public constant from the FAST detector (Rosten & Drummond).
RING_OFFSETS = np.array(
    [(0, -3), (1, -3), (2, -2), (3, -1), (3, 0), (3, 1), (2, 2), (1, 3),
     (0, 3), (-1, 3), (-2, 2), (-3, 1), (-3, 0), (-3, -1), (-2, -2),
     (-1, -3)], dtype=np.int32)  # (dx, dy)


def _ring_stack(img: jnp.ndarray) -> jnp.ndarray:
    """[16, H, W] ring neighbor values via rolls (borders masked later)."""
    return jnp.stack(
        [jnp.roll(img, (-int(dy), -int(dx)), axis=(0, 1))
         for dx, dy in RING_OFFSETS], axis=0)


def _contiguous9(mask16: jnp.ndarray) -> jnp.ndarray:
    """uint32 bitmask of 16 ring bits -> bool: any 9 contiguous set bits
    (circular). Log-step AND reduction on the doubled mask."""
    d = mask16 | (mask16 << 16)
    r2 = d & (d >> 1)
    r4 = r2 & (r2 >> 2)
    r8 = r4 & (r4 >> 4)
    r9 = r8 & (d >> 8)
    return (r9 & jnp.uint32(0xFFFF)) != 0


def fast_response(img: jnp.ndarray, threshold: jnp.ndarray, ring=None):
    """Segment test + response for every pixel.

    Returns (corner_mask [H,W] bool, score [H,W] float32). Score is the
    arc-strength response sum(max(|ring - p| - t, 0)) over the passing
    direction — monotone in the exact FAST score and adequate for NMS
    ranking (the reference only uses response for quadtree selection).
    `ring` may be precomputed (shared across thresholds — it is the
    dominant intermediate, 16 image-sized buffers).
    """
    if ring is None:
        ring = _ring_stack(img)  # [16, H, W]
    p = img[None]
    t = jnp.asarray(threshold, img.dtype)
    brighter = ring > p + t
    darker = ring < p - t

    weights = (jnp.uint32(1) << jnp.arange(16, dtype=jnp.uint32))[:, None, None]
    mb = jnp.sum(jnp.where(brighter, weights, jnp.uint32(0)), axis=0)
    md = jnp.sum(jnp.where(darker, weights, jnp.uint32(0)), axis=0)
    is_b = _contiguous9(mb)
    is_d = _contiguous9(md)
    corner = is_b | is_d

    sb = jnp.sum(jnp.where(brighter, ring - p - t, 0.0), axis=0)
    sd = jnp.sum(jnp.where(darker, p - t - ring, 0.0), axis=0)
    score = jnp.maximum(jnp.where(is_b, sb, 0.0), jnp.where(is_d, sd, 0.0))
    return corner, score


def nms3x3(score: jnp.ndarray) -> jnp.ndarray:
    """Keep pixels that are the maximum of their 3x3 neighborhood."""
    win = jax.lax.reduce_window(
        score, -jnp.inf, jax.lax.max, (3, 3), (1, 1), "SAME")
    return score >= win


def detect(img: jnp.ndarray, ini_threshold: float, min_threshold: float,
           border: int, cell: int = 32):
    """Dual-threshold FAST with 3x3 NMS and per-cell fallback.

    Mirrors the reference's per-cell behavior (ORBextractor.cc:793-812: run
    iniThFAST in each 35px cell, re-run with minThFAST if the cell is empty)
    without re-running: both thresholds are computed once; cells where the
    high threshold fired keep only high-threshold corners.

    Returns score map [H, W] float32 with 0 for non-corners (after NMS and
    border masking).
    """
    h, w = img.shape
    ring = _ring_stack(img)          # built ONCE for both thresholds
    c_hi, s_hi = fast_response(img, ini_threshold, ring)
    c_lo, s_lo = fast_response(img, min_threshold, ring)

    ys = jnp.arange(h)[:, None]
    xs = jnp.arange(w)[None, :]
    valid = ((ys >= border) & (ys < h - border) &
             (xs >= border) & (xs < w - border))
    c_hi &= valid
    c_lo &= valid

    # Per-cell: does any high-threshold corner exist?
    ch = jnp.ceil(h / cell).astype(int) if False else -(-h // cell)
    cw = -(-w // cell)
    pad_h, pad_w = ch * cell - h, cw * cell - w
    hi_pad = jnp.pad(c_hi, ((0, pad_h), (0, pad_w)))
    cell_has_hi = hi_pad.reshape(ch, cell, cw, cell).any(axis=(1, 3))
    cell_has_hi_full = jnp.repeat(jnp.repeat(cell_has_hi, cell, 0), cell, 1)
    cell_has_hi_full = cell_has_hi_full[:h, :w]

    corner = jnp.where(cell_has_hi_full, c_hi, c_lo)
    score = jnp.where(corner, jnp.where(cell_has_hi_full, s_hi, s_lo), 0.0)
    keep = nms3x3(score) & corner
    return jnp.where(keep, score, 0.0)
