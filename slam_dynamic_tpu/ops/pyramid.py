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
    """Separable Gaussian blur with reflect padding, [H, W] float32."""
    k = jnp.asarray(_gaussian_kernel(ksize, sigma))
    r = ksize // 2
    x = jnp.pad(image, ((r, r), (r, r)), mode="reflect")
    # rows
    x = jax.lax.conv_general_dilated(
        x[None, None, :, :], k[None, None, None, :], (1, 1), "VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"))
    # cols
    x = jax.lax.conv_general_dilated(
        x, k[None, None, :, None], (1, 1), "VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"))
    return x[0, 0]
