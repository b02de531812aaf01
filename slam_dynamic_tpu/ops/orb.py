"""ORB keypoint selection, orientation (IC angle) and rBRIEF descriptors.

TPU-native re-design of ORBextractor (/root/reference/src/ORBextractor.cc):
  - quadtree `DistributeOctTree` (:539-763) -> per-cell top-k + global top-n
    masked selection (same spatial-uniformity intent, fixed shapes);
  - `IC_Angle` (:77-107) -> whole-image moment convolutions sampled at
    keypoints (two 31x31 convs ride the MXU instead of per-keypoint scalar
    ring walks);
  - `computeOrbDescriptor` (:110-147) -> batched rotated-pattern gathers +
    bit packing into [N, 8] uint32 lanes.

All outputs are fixed-capacity arrays with validity masks.
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

PATCH_RADIUS = 15          # IC-angle circular patch (HALF_PATCH_SIZE, ref :62)
_PATTERN_PATH = os.path.join(os.path.dirname(__file__), "orb_pattern.npy")


@functools.lru_cache(maxsize=None)
def brief_pattern() -> np.ndarray:
    """(256, 4) int8 canonical ORB sampling pattern (data asset; see
    tools/extract_orb_pattern.py)."""
    return np.load(_PATTERN_PATH)


@functools.lru_cache(maxsize=None)
def _moment_kernels():
    """31x31 kernels for m10/m01 image moments over the circular patch."""
    r = PATCH_RADIUS
    y, x = np.mgrid[-r:r + 1, -r:r + 1]
    circ = (x * x + y * y <= r * r).astype(np.float32)
    return (x * circ).astype(np.float32), (y * circ).astype(np.float32)


def select_topk_cells(score: jnp.ndarray, n_out: int, cell: int = 32,
                      per_cell: int = 4):
    """Spatially-uniform keypoint selection from an NMS'd score map.

    Per cell take the ``per_cell`` strongest corners, then take the global
    ``n_out`` strongest of those candidates. Guarantees at most ``per_cell``
    winners per cell — reproducing DistributeOctTree's anti-clustering
    intent with fixed shapes.

    Returns (xy [n_out, 2] int32, resp [n_out] float32, valid [n_out] bool).
    """
    h, w = score.shape
    ch, cw = -(-h // cell), -(-w // cell)
    pad = jnp.pad(score, ((0, ch * cell - h), (0, cw * cell - w)),
                  constant_values=0.0)
    cells = pad.reshape(ch, cell, cw, cell).transpose(0, 2, 1, 3)
    cells = cells.reshape(ch * cw, cell * cell)
    v, idx = jax.lax.top_k(cells, per_cell)          # [C, per_cell]
    cy = idx // cell
    cx = idx % cell
    cid = jnp.arange(ch * cw)[:, None]
    ys = (cid // cw) * cell + cy
    xs = (cid % cw) * cell + cx
    flat_v = v.reshape(-1)
    flat_y = ys.reshape(-1)
    flat_x = xs.reshape(-1)
    n_cand = flat_v.shape[0]
    k = min(n_out, n_cand)
    gv, gidx = jax.lax.top_k(flat_v, k)
    out_y = flat_y[gidx]
    out_x = flat_x[gidx]
    valid = gv > 0.0
    if k < n_out:
        pad_n = n_out - k
        gv = jnp.concatenate([gv, jnp.zeros(pad_n, gv.dtype)])
        out_y = jnp.concatenate([out_y, jnp.zeros(pad_n, out_y.dtype)])
        out_x = jnp.concatenate([out_x, jnp.zeros(pad_n, out_x.dtype)])
        valid = jnp.concatenate([valid, jnp.zeros(pad_n, bool)])
    xy = jnp.stack([out_x, out_y], axis=-1).astype(jnp.int32)
    return xy, gv, valid


def ic_angles(img: jnp.ndarray, xy: jnp.ndarray):
    """Intensity-centroid orientation at integer keypoint coords.

    img: [H, W] float32 (raw level image), xy: [N, 2] int32 (x, y).
    Returns angle [N] float32 in radians.

    Gather-based: patches are gathered only at the N selected keypoints
    and reduced against the moment masks. (A whole-image 31x31 conv is
    ~1000x off roofline on TPU for 1-channel NCHW — XLA pads the channel
    dim to the MXU width; profiling showed it dominating the frontend.)
    """
    kx, ky = _moment_kernels()
    r = PATCH_RADIUS
    h, w = img.shape
    padded = jnp.pad(img, ((r, r), (r, r)))
    dy = jnp.arange(2 * r + 1)[None, :, None]
    dx = jnp.arange(2 * r + 1)[None, None, :]
    rows = xy[:, 1][:, None, None] + dy            # [N, 31, 1] (+r offset
    cols = xy[:, 0][:, None, None] + dx            # cancels padding shift)
    patches = padded[rows, cols]                   # [N, 31, 31]
    m10 = jnp.einsum("nij,ij->n", patches, jnp.asarray(kx))
    m01 = jnp.einsum("nij,ij->n", patches, jnp.asarray(ky))
    return jnp.arctan2(m01, m10)


def brief_descriptors(blurred: jnp.ndarray, xy: jnp.ndarray,
                      angle: jnp.ndarray) -> jnp.ndarray:
    """Rotated BRIEF-256 descriptors.

    blurred: [H, W] float32 (Gaussian-blurred level image),
    xy: [N, 2] int32, angle: [N] float32 (radians).
    Returns [N, 8] uint32 (256 bits packed little-endian per lane).
    """
    h, w = blurred.shape
    pat = jnp.asarray(brief_pattern(), jnp.float32)       # [256, 4]
    ax = pat[:, [0, 2]]                                    # [256, 2] x1,x2
    ay = pat[:, [1, 3]]                                    # [256, 2] y1,y2
    ca, sa = jnp.cos(angle), jnp.sin(angle)               # [N]
    # rotated integer offsets, same rounding as ref (:119 cvRound)
    rx = jnp.round(ax[None] * ca[:, None, None] - ay[None] * sa[:, None, None])
    ry = jnp.round(ax[None] * sa[:, None, None] + ay[None] * ca[:, None, None])
    gx = jnp.clip(xy[:, 0, None, None] + rx.astype(jnp.int32), 0, w - 1)
    gy = jnp.clip(xy[:, 1, None, None] + ry.astype(jnp.int32), 0, h - 1)
    flat = blurred.reshape(-1)
    vals = flat[(gy * w + gx).reshape(xy.shape[0], -1)]   # [N, 512]
    vals = vals.reshape(xy.shape[0], 256, 2)
    bits = (vals[..., 0] < vals[..., 1]).astype(jnp.uint32)  # [N, 256]
    bits = bits.reshape(-1, 8, 32)
    shifts = jnp.arange(32, dtype=jnp.uint32)[None, None]
    return jnp.sum(bits << shifts, axis=-1, dtype=jnp.uint32)  # [N, 8]
