"""Batched-over-levels ORB extraction: the whole 8-level pipeline as ONE
stack of [L, H, W] ops.

Motivation (measured): the axon TPU path has high per-op dispatch overhead,
so the per-level unrolled extractor (~8 subgraphs of FAST/convs/top-k)
costs ~88 ms/frame even though its FLOPs are trivial. Here every stage
operates on a level-padded stack [L, H0, W0] — levels are upscaled in
memory (3x redundant pixels) but the op count drops ~8x, which is what
actually matters on this dispatch profile. Numerics match ops/fast.py and
ops/orb.py per level (same ring test, same selection rule, same rBRIEF).

Static per-level metadata (shapes, borders, budgets, scales) is baked into
constant masks at trace time.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .fast import RING_OFFSETS, _contiguous9
from .orb import brief_pattern, _moment_kernels, PATCH_RADIUS
from .pyramid import level_shapes, _gaussian_kernel


@functools.lru_cache(maxsize=None)
def _level_meta(height: int, width: int, n_levels: int, scale_factor: float,
                border: int, cell: int, n_features: int):
    """Static per-level shapes, masks and budgets (host numpy constants)."""
    shapes = level_shapes(height, width, n_levels, scale_factor)
    # per-level feature budgets (geometric split, ORBextractor ctor)
    factor = 1.0 / scale_factor
    n_first = n_features * (1 - factor) / (1 - factor ** n_levels)
    budgets = []
    for l in range(n_levels - 1):
        budgets.append(int(round(n_first * factor ** l)))
    budgets.append(max(n_features - sum(budgets), 0))

    valid = np.zeros((n_levels, height, width), bool)
    for l, (h, w) in enumerate(shapes):
        valid[l, border:h - border, border:w - border] = True
    scales = (scale_factor ** np.arange(n_levels)).astype(np.float32)
    return shapes, np.asarray(budgets, np.int32), valid, scales


def build_level_stack(image, n_levels: int, scale_factor: float):
    """[H, W] -> [L, H, W] with each level resized then zero-padded."""
    h, w = image.shape
    shapes = level_shapes(h, w, n_levels, scale_factor)
    out = [image]
    for l in range(1, n_levels):
        hl, wl = shapes[l]
        lv = jax.image.resize(image, (hl, wl), method="linear")
        out.append(jnp.pad(lv, ((0, h - hl), (0, w - wl))))
    return jnp.stack(out)


def _ring_stack_batched(stack):
    """[L, H, W] -> [16, L, H, W] ring neighbours via batched rolls."""
    return jnp.stack(
        [jnp.roll(stack, (-int(dy), -int(dx)), axis=(1, 2))
         for dx, dy in RING_OFFSETS])


def fast_dual_batched(stack, valid_mask, ini_th: float, min_th: float,
                      cell: int):
    """Dual-threshold FAST + NMS + per-cell fallback on the level stack.

    One ring build serves both thresholds (the unbatched path computed it
    twice). Returns score [L, H, W] (0 for non-corners).
    """
    L, H, W = stack.shape
    ring = _ring_stack_batched(stack)          # [16, L, H, W]
    p = stack[None]
    weights = (jnp.uint32(1) << jnp.arange(16, dtype=jnp.uint32))[
        :, None, None, None]

    def corner_and_score(th):
        brighter = ring > p + th
        darker = ring < p - th
        mb = jnp.sum(jnp.where(brighter, weights, jnp.uint32(0)), axis=0)
        md = jnp.sum(jnp.where(darker, weights, jnp.uint32(0)), axis=0)
        is_b = _contiguous9(mb)
        is_d = _contiguous9(md)
        sb = jnp.sum(jnp.where(brighter, ring - p - th, 0.0), axis=0)
        sd = jnp.sum(jnp.where(darker, p - th - ring, 0.0), axis=0)
        score = jnp.maximum(jnp.where(is_b, sb, 0.0),
                            jnp.where(is_d, sd, 0.0))
        return (is_b | is_d) & valid_mask, score

    c_hi, s_hi = corner_and_score(jnp.float32(ini_th))
    c_lo, s_lo = corner_and_score(jnp.float32(min_th))

    ch = -(-H // cell)
    cw = -(-W // cell)
    pad_h, pad_w = ch * cell - H, cw * cell - W
    hi_pad = jnp.pad(c_hi, ((0, 0), (0, pad_h), (0, pad_w)))
    cell_has_hi = hi_pad.reshape(L, ch, cell, cw, cell).any(axis=(2, 4))
    cell_full = jnp.repeat(jnp.repeat(cell_has_hi, cell, 1), cell, 2)
    cell_full = cell_full[:, :H, :W]

    corner = jnp.where(cell_full, c_hi, c_lo)
    score = jnp.where(corner, jnp.where(cell_full, s_hi, s_lo), 0.0)
    win = jax.lax.reduce_window(score, -jnp.inf, jax.lax.max,
                                (1, 3, 3), (1, 1, 1), "SAME")
    return jnp.where((score >= win) & corner, score, 0.0)


class BatchedKeypoints(NamedTuple):
    lvl: jnp.ndarray    # [N] int32
    x: jnp.ndarray      # [N] int32 level-image coords
    y: jnp.ndarray      # [N] int32
    resp: jnp.ndarray   # [N] float32
    valid: jnp.ndarray  # [N] bool


def select_batched(score, budgets, cell: int, per_cell: int
                   ) -> BatchedKeypoints:
    """Per-cell top-k then per-level top-budget, one top_k each.

    Output slot layout: level-major, exactly budgets[l] slots per level
    (static compaction), total N = sum(budgets).
    """
    L, H, W = score.shape
    ch = -(-H // cell)
    cw = -(-W // cell)
    pad = jnp.pad(score, ((0, 0), (0, ch * cell - H), (0, cw * cell - W)),
                  constant_values=0.0)
    cells = pad.reshape(L, ch, cell, cw, cell).transpose(0, 1, 3, 2, 4)
    cells = cells.reshape(L, ch * cw, cell * cell)
    v, idx = jax.lax.top_k(cells, per_cell)               # [L, C, pc]
    cy = idx // cell
    cx = idx % cell
    cid = jnp.arange(ch * cw)[None, :, None]
    ys = (cid // cw) * cell + cy
    xs = (cid % cw) * cell + cx
    flat_v = v.reshape(L, -1)
    flat_y = ys.reshape(L, -1)
    flat_x = xs.reshape(L, -1)

    k_max = int(np.max(np.asarray(budgets)))
    gv, gidx = jax.lax.top_k(flat_v, k_max)               # [L, k_max]
    gy = jnp.take_along_axis(flat_y, gidx, axis=1)
    gx = jnp.take_along_axis(flat_x, gidx, axis=1)
    rank = jnp.arange(k_max)[None, :]
    ok = (gv > 0.0) & (rank < jnp.asarray(budgets)[:, None])

    # static compaction: slot n belongs to (level_of[n], rank_of[n])
    lvl_of, rank_of = [], []
    for l, b in enumerate(np.asarray(budgets)):
        lvl_of += [l] * int(b)
        rank_of += list(range(int(b)))
    lvl_of = jnp.asarray(lvl_of, jnp.int32)
    rank_of = jnp.asarray(rank_of, jnp.int32)
    return BatchedKeypoints(
        lvl=lvl_of,
        x=gx[lvl_of, rank_of].astype(jnp.int32),
        y=gy[lvl_of, rank_of].astype(jnp.int32),
        resp=gv[lvl_of, rank_of],
        valid=ok[lvl_of, rank_of])


def blur_stack(stack, ksize: int = 7, sigma: float = 2.0):
    """Separable Gaussian on the level stack (slice-sum form — see
    pyramid.gaussian_blur; supports leading batch dims)."""
    from .pyramid import gaussian_blur
    return gaussian_blur(stack, ksize, sigma)


def ic_angles_batched(stack, kp: BatchedKeypoints):
    """IC angles for all keypoints: ONE patch gather over the level stack
    (whole-image 1-channel convs are pathological on TPU)."""
    kx, ky = _moment_kernels()
    r = PATCH_RADIUS
    padded = jnp.pad(stack, ((0, 0), (r, r), (r, r)))
    dy = jnp.arange(2 * r + 1)[None, :, None]
    dx = jnp.arange(2 * r + 1)[None, None, :]
    rows = kp.y[:, None, None] + dy
    cols = kp.x[:, None, None] + dx
    patches = padded[kp.lvl[:, None, None], rows, cols]   # [N, 31, 31]
    m10 = jnp.einsum("nij,ij->n", patches, jnp.asarray(kx))
    m01 = jnp.einsum("nij,ij->n", patches, jnp.asarray(ky))
    return jnp.arctan2(m01, m10)


def brief_batched(blurred, kp: BatchedKeypoints, angle):
    """rBRIEF for all keypoints from the blurred stack: ONE flat gather."""
    L, H, W = blurred.shape
    pat = jnp.asarray(brief_pattern(), jnp.float32)
    ax = pat[:, [0, 2]]
    ay = pat[:, [1, 3]]
    ca, sa = jnp.cos(angle), jnp.sin(angle)
    rx = jnp.round(ax[None] * ca[:, None, None] - ay[None] * sa[:, None, None])
    ry = jnp.round(ax[None] * sa[:, None, None] + ay[None] * ca[:, None, None])
    gx = jnp.clip(kp.x[:, None, None] + rx.astype(jnp.int32), 0, W - 1)
    gy = jnp.clip(kp.y[:, None, None] + ry.astype(jnp.int32), 0, H - 1)
    base = (kp.lvl * (H * W))[:, None, None]
    flat = blurred.reshape(-1)
    vals = flat[(base + gy * W + gx).reshape(kp.x.shape[0], -1)]
    vals = vals.reshape(kp.x.shape[0], 256, 2)
    bits = (vals[..., 0] < vals[..., 1]).astype(jnp.uint32)
    bits = bits.reshape(-1, 8, 32)
    shifts = jnp.arange(32, dtype=jnp.uint32)[None, None]
    return jnp.sum(bits << shifts, axis=-1, dtype=jnp.uint32)
