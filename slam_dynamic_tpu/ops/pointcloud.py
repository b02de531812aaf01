"""Dense point-cloud ops: masked backprojection, voxel downsampling, OBB.

TPU-native equivalent of PointCloudMapping::generatePointCloud
(/root/reference/src/pointcloudmapping.cc:59-103: stride-3 backprojection
excluding dynamic boxes/mask and out-of-range depths, pose transform, PCL
voxel-grid downsample) and of the PCL MomentOfInertiaEstimation OBB used
for dynamic objects (/root/reference/src/Tracking.cc:840-848). Voxel
dedup is fixed-shape: voxel hashing + sort + first-occurrence masking.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..utils.camera import Intrinsics


@functools.partial(jax.jit, static_argnames=("stride",))
def backproject_dense(cam: Intrinsics, gray, depth_map, R_cw, t_cw,
                      dyn_mask, stride: int = 3, min_depth: float = 0.01,
                      max_depth: float = 5.0):
    """Dense world-frame cloud from one RGB-D keyframe.

    gray/depth_map: [H, W]; dyn_mask: [H, W] bool True=dynamic (excluded).
    Returns (points [M, 3], intensity [M], valid [M]) with
    M = (H/stride)*(W/stride).
    """
    h, w = depth_map.shape
    ys = jnp.arange(0, h - (h % stride), stride)
    xs = jnp.arange(0, w - (w % stride), stride)
    yy, xx = jnp.meshgrid(ys, xs, indexing="ij")
    d = depth_map[yy, xx]
    g = gray[yy, xx]
    dyn = dyn_mask[yy, xx]
    ok = (d > min_depth) & (d < max_depth) & ~dyn
    x = (xx.astype(jnp.float32) - cam.cx) / cam.fx * d
    y = (yy.astype(jnp.float32) - cam.cy) / cam.fy * d
    xc = jnp.stack([x, y, d], axis=-1).reshape(-1, 3)
    # world: x_w = R^T (x_c - t)
    xw = (xc - t_cw[None, :]) @ R_cw
    return xw, g.reshape(-1), ok.reshape(-1)


@functools.partial(jax.jit, static_argnames=("max_out",))
def voxel_downsample(points, intensity, valid, resolution: float,
                     max_out: int = 65536):
    """Keep one point per occupied voxel (first hit), fixed output shape.

    Returns (points [max_out, 3], intensity [max_out], valid [max_out]).
    """
    # int32 spatial hash (jax x64 is off); rare collisions merge distinct
    # voxels, which is harmless for downsampling
    v = jnp.floor(points / resolution).astype(jnp.int32)
    key = ((v[:, 0] * 73856093) ^ (v[:, 1] * 19349663)
           ^ (v[:, 2] * 83492791))
    key = jnp.where(key == jnp.int32(2**31 - 1), 0, key)
    key = jnp.where(valid, key, jnp.int32(2**31 - 1))
    order = jnp.argsort(key)
    ks = key[order]
    first = jnp.concatenate([jnp.ones(1, bool), ks[1:] != ks[:-1]])
    first &= ks < 2**31 - 1
    idx = jnp.nonzero(first, size=max_out, fill_value=points.shape[0])[0]
    src = order[jnp.clip(idx, 0, points.shape[0] - 1)]
    out_valid = idx < points.shape[0]
    return (points[src], intensity[src], out_valid)


class OBB(NamedTuple):
    center: jnp.ndarray     # [3]
    axes: jnp.ndarray       # [3, 3] rows = principal directions
    extents: jnp.ndarray    # [3] half-lengths
    valid: jnp.ndarray      # bool


def eigh3x3(A):
    """Closed-form symmetric 3x3 eigendecomposition (Cardano eigenvalues +
    cross-product eigenvectors), ascending eigenvalue order like
    jnp.linalg.eigh. The generic eigh lowers to an iterative eigensolver
    custom call on TPU — measured ~tens of ms per fused frame when it
    rides the hot path; this is pure elementwise math and fuses away.
    Returns (evals [..., 3], evecs [..., 3, 3] columns)."""
    q = jnp.trace(A, axis1=-2, axis2=-1) / 3.0
    I = jnp.eye(3, dtype=A.dtype)
    Aq = A - q[..., None, None] * I
    p = jnp.sqrt(jnp.maximum(
        jnp.sum(Aq * Aq, axis=(-2, -1)) / 6.0, 1e-30))
    B = Aq / p[..., None, None]
    r = jnp.clip(jnp.linalg.det(B) / 2.0, -1.0, 1.0)
    phi = jnp.arccos(r) / 3.0
    e_hi = q + 2.0 * p * jnp.cos(phi)
    e_lo = q + 2.0 * p * jnp.cos(phi + 2.0 * jnp.pi / 3.0)
    e_mid = 3.0 * q - e_hi - e_lo
    evals = jnp.stack([e_lo, e_mid, e_hi], axis=-1)    # ascending

    def eigvec(lam):
        # null vector of (A - lam I): the largest cross product of two
        # rows (robust to one vanishing row)
        M = A - lam[..., None, None] * I
        c01 = jnp.cross(M[..., 0, :], M[..., 1, :])
        c02 = jnp.cross(M[..., 0, :], M[..., 2, :])
        c12 = jnp.cross(M[..., 1, :], M[..., 2, :])
        cs = jnp.stack([c01, c02, c12], axis=-2)       # [..., 3, 3]
        n2 = jnp.sum(cs * cs, axis=-1)
        best = jnp.argmax(n2, axis=-1)
        v = jnp.take_along_axis(
            cs, best[..., None, None].astype(jnp.int32)
            .repeat(3, axis=-1), axis=-2)[..., 0, :]
        # degenerate (repeated eigenvalue / isotropic): fall back to a
        # coordinate axis; callers only need SOME orthonormal basis there
        ok = jnp.sum(v * v, axis=-1, keepdims=True) > 1e-20
        v = jnp.where(ok, v, jnp.broadcast_to(
            jnp.array([1.0, 0.0, 0.0], A.dtype), v.shape))
        return v / jnp.sqrt(jnp.maximum(
            jnp.sum(v * v, axis=-1, keepdims=True), 1e-30))

    v_lo = eigvec(e_lo)
    v_hi = eigvec(e_hi)
    # middle vector from orthogonality (guarantees a right-handed,
    # orthonormal basis even near-degenerate)
    v_mid = jnp.cross(v_hi, v_lo)
    v_mid = v_mid / jnp.sqrt(jnp.maximum(
        jnp.sum(v_mid * v_mid, axis=-1, keepdims=True), 1e-30))
    v_lo = jnp.cross(v_mid, v_hi)
    evecs = jnp.stack([v_lo, v_mid, v_hi], axis=-1)    # columns
    return evals, evecs


@jax.jit
def obb_from_points(points, mask) -> OBB:
    """Oriented bounding box by PCA (covariance eigendecomposition) —
    equivalent of PCL MomentOfInertiaEstimation::getOBB."""
    wsum = jnp.maximum(mask.sum(), 1)
    mu = jnp.sum(points * mask[:, None], axis=0) / wsum
    c = (points - mu) * mask[:, None]
    cov = c.T @ c / wsum
    evals, evecs = eigh3x3(cov)
    axes = evecs.T[::-1]                     # rows, major axis first
    proj = c @ axes.T                        # [N, 3] in box frame
    lo = jnp.min(jnp.where(mask[:, None], proj, jnp.inf), axis=0)
    hi = jnp.max(jnp.where(mask[:, None], proj, -jnp.inf), axis=0)
    center = mu + axes.T @ ((lo + hi) * 0.5)
    ext = (hi - lo) * 0.5
    return OBB(center, axes, ext, mask.sum() >= 10)


def save_ply(path: str, points, intensity=None, valid=None):
    """Write an ASCII PLY cloud (PCD-equivalent export,
    ref pointcloudmapping.cc:161-166 savePCD)."""
    import numpy as np
    pts = np.asarray(points)
    if valid is not None:
        v = np.asarray(valid)
        pts = pts[v]
        inten = np.asarray(intensity)[v] if intensity is not None else None
    else:
        inten = np.asarray(intensity) if intensity is not None else None
    with open(path, "w") as f:
        f.write("ply\nformat ascii 1.0\n")
        f.write(f"element vertex {len(pts)}\n")
        f.write("property float x\nproperty float y\nproperty float z\n")
        if inten is not None:
            f.write("property uchar red\nproperty uchar green\n"
                    "property uchar blue\n")
        f.write("end_header\n")
        for i, p in enumerate(pts):
            if inten is not None:
                g = int(np.clip(inten[i], 0, 255))
                f.write(f"{p[0]:.4f} {p[1]:.4f} {p[2]:.4f} {g} {g} {g}\n")
            else:
                f.write(f"{p[0]:.4f} {p[1]:.4f} {p[2]:.4f}\n")


def save_pcd(path: str, points, intensity=None, valid=None):
    """ASCII PCD export — byte-format parity with the reference's
    pcl::io::savePCDFile output (pointcloudmapping.cc:161-166)."""
    import numpy as np
    pts = np.asarray(points)
    if valid is not None:
        v = np.asarray(valid)
        pts = pts[v]
    with open(path, "w") as f:
        f.write("# .PCD v0.7 - Point Cloud Data file format\n")
        f.write("VERSION 0.7\nFIELDS x y z\nSIZE 4 4 4\nTYPE F F F\n"
                "COUNT 1 1 1\n")
        f.write(f"WIDTH {len(pts)}\nHEIGHT 1\n")
        f.write("VIEWPOINT 0 0 0 1 0 0 0\n")
        f.write(f"POINTS {len(pts)}\nDATA ascii\n")
        for p in pts:
            f.write(f"{p[0]:.6f} {p[1]:.6f} {p[2]:.6f}\n")
