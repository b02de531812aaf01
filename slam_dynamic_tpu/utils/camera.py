"""Pinhole camera model: projection, unprojection, radial-tangential
(un)distortion, and frustum checks — all batched fixed-shape jnp.

Equivalent of the reference's per-frame camera math: keypoint undistortion
(/root/reference/src/Frame.cc:812-872), `UnprojectStereo`
(/root/reference/src/Frame.cc:1074-1090) and `isInFrustum`
(/root/reference/src/Frame.cc:677-733).
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class Intrinsics(NamedTuple):
    """Pinhole + radial-tangential distortion + stereo baseline.

    ``bf`` is baseline*fx (metres*px) as in the reference YAMLs; 0 for mono.
    """

    fx: jnp.ndarray
    fy: jnp.ndarray
    cx: jnp.ndarray
    cy: jnp.ndarray
    k1: jnp.ndarray
    k2: jnp.ndarray
    p1: jnp.ndarray
    p2: jnp.ndarray
    k3: jnp.ndarray
    bf: jnp.ndarray
    width: int
    height: int

    @staticmethod
    def create(fx, fy, cx, cy, k1=0.0, k2=0.0, p1=0.0, p2=0.0, k3=0.0,
               bf=0.0, width=640, height=480, dtype=jnp.float32):
        f = lambda v: jnp.asarray(v, dtype)
        return Intrinsics(f(fx), f(fy), f(cx), f(cy), f(k1), f(k2), f(p1),
                          f(p2), f(k3), f(bf), int(width), int(height))

    @property
    def K(self):
        z = jnp.zeros_like(self.fx)
        o = jnp.ones_like(self.fx)
        return jnp.stack([
            jnp.stack([self.fx, z, self.cx], -1),
            jnp.stack([z, self.fy, self.cy], -1),
            jnp.stack([z, z, o], -1),
        ], -2)

    @property
    def baseline(self):
        return self.bf / self.fx


def project(cam: Intrinsics, xc):
    """Camera-frame points (..., 3) -> pixel coords (..., 2). No distortion
    (projection always works on undistorted pixel coordinates, as in the
    reference which undistorts keypoints once at frame build)."""
    z = xc[..., 2]
    zs = jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
    u = cam.fx * xc[..., 0] / zs + cam.cx
    v = cam.fy * xc[..., 1] / zs + cam.cy
    return jnp.stack([u, v], axis=-1)


def project_stereo(cam: Intrinsics, xc):
    """(..., 3) -> (u, v, u_right) as in EdgeStereoSE3ProjectXYZ."""
    z = xc[..., 2]
    zs = jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
    u = cam.fx * xc[..., 0] / zs + cam.cx
    v = cam.fy * xc[..., 1] / zs + cam.cy
    ur = u - cam.bf / zs
    return jnp.stack([u, v, ur], axis=-1)


def backproject(cam: Intrinsics, uv, depth):
    """Pixels (..., 2) + depth (...,) -> camera-frame points (..., 3)."""
    x = (uv[..., 0] - cam.cx) / cam.fx * depth
    y = (uv[..., 1] - cam.cy) / cam.fy * depth
    return jnp.stack([x, y, depth], axis=-1)


def distort_normalized(cam: Intrinsics, xn):
    """Apply radial-tangential distortion to normalized coords (..., 2)."""
    x, y = xn[..., 0], xn[..., 1]
    r2 = x * x + y * y
    radial = 1.0 + r2 * (cam.k1 + r2 * (cam.k2 + r2 * cam.k3))
    xd = x * radial + 2.0 * cam.p1 * x * y + cam.p2 * (r2 + 2.0 * x * x)
    yd = y * radial + cam.p1 * (r2 + 2.0 * y * y) + 2.0 * cam.p2 * x * y
    return jnp.stack([xd, yd], axis=-1)


def undistort_points(cam: Intrinsics, uv, iters: int = 8):
    """Undistort pixel keypoints by fixed-point iteration (batched).

    Replaces cv::undistortPoints in Frame::UndistortKeyPoints
    (/root/reference/src/Frame.cc:812-843). ``iters`` fixed for static
    shapes; 8 Newton-free iterations match OpenCV's default tolerance for
    typical k1,k2 magnitudes.
    """
    xd = jnp.stack([(uv[..., 0] - cam.cx) / cam.fx,
                    (uv[..., 1] - cam.cy) / cam.fy], axis=-1)
    x = xd
    for _ in range(iters):
        d = distort_normalized(cam, x)
        x = x + (xd - d)
    u = cam.fx * x[..., 0] + cam.cx
    v = cam.fy * x[..., 1] + cam.cy
    return jnp.stack([u, v], axis=-1)


def undistorted_bounds(cam: Intrinsics):
    """Undistorted image bounds (minx, maxx, miny, maxy) from the 4 corners,
    as in Frame::ComputeImageBounds (/root/reference/src/Frame.cc:845-872)."""
    corners = jnp.array(
        [[0.0, 0.0], [cam.width, 0.0], [0.0, cam.height],
         [cam.width, cam.height]], dtype=jnp.float32)
    und = undistort_points(cam, corners)
    return (jnp.minimum(und[0, 0], und[2, 0]), jnp.maximum(und[1, 0], und[3, 0]),
            jnp.minimum(und[0, 1], und[1, 1]), jnp.maximum(und[2, 1], und[3, 1]))


def in_frustum(cam: Intrinsics, R_cw, t_cw, xw, bounds, min_z=0.0):
    """Frustum visibility for world points (..., 3) given camera pose.

    Returns (visible_mask, uv, depth). View-angle/scale checks are applied by
    the caller (they need per-landmark normals), mirroring
    Frame::isInFrustum's split responsibilities.
    """
    xc = jnp.einsum("ij,...j->...i", R_cw, xw) + t_cw
    z = xc[..., 2]
    uv = project(cam, xc)
    minx, maxx, miny, maxy = bounds
    ok = (
        (z > min_z)
        & (uv[..., 0] >= minx) & (uv[..., 0] < maxx)
        & (uv[..., 1] >= miny) & (uv[..., 1] < maxy)
    )
    return ok, uv, z
