"""ORB feature extraction pipeline: pyramid -> FAST -> uniform selection ->
orientation -> rBRIEF, one jit-compiled device call per frame.

Equivalent of ORBextractor::operator() (/root/reference/src/
ORBextractor.cc:1043-1105) with the per-level feature budgeting of the ctor
(:436-460). Output is a fixed-capacity Keypoints struct (n_features slots +
validity mask); coordinates are level-0 pixels.
"""
from __future__ import annotations

import functools
from typing import List, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ORBConfig
from ..ops import fast, orb, pyramid


class Keypoints(NamedTuple):
    xy: jnp.ndarray        # [N, 2] float32, level-0 pixel coords (distorted)
    response: jnp.ndarray  # [N] float32
    angle: jnp.ndarray     # [N] float32 radians
    level: jnp.ndarray     # [N] int32 pyramid level
    desc: jnp.ndarray      # [N, 8] uint32 packed 256-bit descriptors
    valid: jnp.ndarray     # [N] bool

    @property
    def n(self):
        return self.valid.sum()


def level_budgets(cfg: ORBConfig) -> List[int]:
    """Geometric per-level feature budget (ref ORBextractor.cc:436-460)."""
    factor = 1.0 / cfg.scale_factor
    n_first = cfg.n_features * (1 - factor) / (1 - factor ** cfg.n_levels)
    budgets, total = [], 0
    for l in range(cfg.n_levels - 1):
        b = int(round(n_first * factor ** l))
        budgets.append(b)
        total += b
    budgets.append(max(cfg.n_features - total, 0))
    return budgets


def _extract_impl(image: jnp.ndarray, cfg: ORBConfig, height: int,
                  width: int) -> Keypoints:
    if cfg.batched_levels:
        return _extract_impl_batched(image, cfg, height, width)
    return _extract_impl_unrolled(image, cfg, height, width)


def _extract_impl_batched(image: jnp.ndarray, cfg: ORBConfig, height: int,
                          width: int) -> Keypoints:
    """Batched-over-levels path (ops/orb_batched.py): ~8x fewer ops than
    the per-level pipeline (best when dispatch dominates); ~3x more pixel
    work (levels padded to full size)."""
    from ..ops import orb_batched as ob
    meta = ob._level_meta(height, width, cfg.n_levels, cfg.scale_factor,
                          cfg.edge_threshold, cfg.cell_size, cfg.n_features)
    shapes, budgets, valid_mask, scales = meta
    stack = ob.build_level_stack(image, cfg.n_levels, cfg.scale_factor)
    score = ob.fast_dual_batched(stack, jnp.asarray(valid_mask),
                                 cfg.ini_th_fast, cfg.min_th_fast,
                                 cfg.cell_size)
    kp = ob.select_batched(score, budgets, cfg.cell_size, per_cell=4)
    ang = ob.ic_angles_batched(stack, kp)
    blurred = ob.blur_stack(stack)
    desc = ob.brief_batched(blurred, kp, ang)
    sc = jnp.asarray(scales)[kp.lvl]
    xy0 = jnp.stack([kp.x.astype(jnp.float32) * sc,
                     kp.y.astype(jnp.float32) * sc], axis=-1)
    return Keypoints(xy0, kp.resp, ang, kp.lvl, desc, kp.valid)


def _extract_impl_unrolled(image: jnp.ndarray, cfg: ORBConfig, height: int,
                           width: int) -> Keypoints:
    """Reference per-level pipeline (kept for A/B numerics tests)."""
    budgets = level_budgets(cfg)
    scales = pyramid.level_scales(cfg.n_levels, cfg.scale_factor)
    levels = pyramid.build_pyramid(image, cfg.n_levels, cfg.scale_factor)

    parts = []
    for l, (img_l, budget) in enumerate(zip(levels, budgets)):
        score = fast.detect(img_l, cfg.ini_th_fast, cfg.min_th_fast,
                            border=cfg.edge_threshold, cell=cfg.cell_size)
        xy_l, resp, valid = orb.select_topk_cells(
            score, budget, cell=cfg.cell_size, per_cell=4)
        ang = orb.ic_angles(img_l, xy_l)
        blurred = pyramid.gaussian_blur(img_l)
        desc = orb.brief_descriptors(blurred, xy_l, ang)
        xy0 = xy_l.astype(jnp.float32) * scales[l]
        parts.append((xy0, resp, ang, jnp.full(resp.shape, l, jnp.int32),
                      desc, valid))

    xy = jnp.concatenate([p[0] for p in parts])
    response = jnp.concatenate([p[1] for p in parts])
    angle = jnp.concatenate([p[2] for p in parts])
    level = jnp.concatenate([p[3] for p in parts])
    desc = jnp.concatenate([p[4] for p in parts])
    valid = jnp.concatenate([p[5] for p in parts])
    return Keypoints(xy, response, angle, level, desc, valid)


@functools.partial(jax.jit, static_argnums=(1, 2, 3))
def extract(image: jnp.ndarray, cfg: ORBConfig, height: int,
            width: int) -> Keypoints:
    """image: [H, W] float32 grayscale in [0, 255]."""
    return _extract_impl(image, cfg, height, width)


def extract_np(image: np.ndarray, cfg: ORBConfig) -> Keypoints:
    """Convenience host entry: uint8/float HxW numpy image."""
    img = jnp.asarray(image, jnp.float32)
    return extract(img, cfg, image.shape[0], image.shape[1])
