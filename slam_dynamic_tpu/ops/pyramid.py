"""Image pyramid + Gaussian blur, XLA-native.

Equivalent of ORBextractor::ComputePyramid (/root/reference/src/
ORBextractor.cc:1107-1132) and the pre-descriptor GaussianBlur(7x7, sigma=2)
(:1085). Levels have static per-level shapes (computed at trace time from the
config), so everything stays jit-compatible.
"""
from __future__ import annotations

import functools
import math
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def level_shapes(height: int, width: int, n_levels: int,
                 scale_factor: float) -> List[Tuple[int, int]]:
    return [
        (int(round(height / scale_factor**l)), int(round(width / scale_factor**l)))
        for l in range(n_levels)
    ]


def level_scales(n_levels: int, scale_factor: float) -> np.ndarray:
    return scale_factor ** np.arange(n_levels, dtype=np.float32)


def build_pyramid(image: jnp.ndarray, n_levels: int,
                  scale_factor: float) -> List[jnp.ndarray]:
    """Grayscale float32 [H, W] -> list of n_levels images, level l scaled by
    1/scale_factor**l. Bilinear resize (matches cv::resize INTER_LINEAR)."""
    h, w = image.shape
    shapes = level_shapes(h, w, n_levels, scale_factor)
    out = [image]
    for l in range(1, n_levels):
        out.append(jax.image.resize(image, shapes[l], method="linear"))
    return out


@functools.lru_cache(maxsize=None)
def _gaussian_kernel(ksize: int, sigma: float) -> np.ndarray:
    r = ksize // 2
    x = np.arange(-r, r + 1, dtype=np.float64)
    k = np.exp(-(x * x) / (2.0 * sigma * sigma))
    return (k / k.sum()).astype(np.float32)


def gaussian_blur(image: jnp.ndarray, ksize: int = 7,
                  sigma: float = 2.0) -> jnp.ndarray:
    """Separable Gaussian blur with reflect padding, [H, W] float32.

    Implemented as shifted-slice weighted sums (pure VPU elementwise, fused
    by XLA) — 1-channel NCHW convs lower catastrophically on TPU.
    """
    kern = _gaussian_kernel(ksize, sigma)
    r = ksize // 2
    h, w = image.shape[-2], image.shape[-1]
    x = jnp.pad(image, [(0, 0)] * (image.ndim - 2) + [(r, r), (0, 0)],
                mode="reflect")
    out = sum(float(kern[i]) * jax.lax.slice_in_dim(x, i, i + h, axis=-2)
              for i in range(ksize))
    x = jnp.pad(out, [(0, 0)] * (image.ndim - 2) + [(0, 0), (r, r)],
                mode="reflect")
    return sum(float(kern[i]) * jax.lax.slice_in_dim(x, i, i + w, axis=-1)
               for i in range(ksize))
