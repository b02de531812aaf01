"""Two-view triangulation kernels vs geometry ground truth."""
import numpy as np
import jax.numpy as jnp

from slam_dynamic_tpu.utils.camera import Intrinsics, project
from slam_dynamic_tpu.utils import se3
from slam_dynamic_tpu.backend.triangulation import (
    triangulate_dlt, fundamental_from_poses, triangulate_between)

CAM = Intrinsics.create(fx=400.0, fy=400.0, cx=160.0, cy=120.0,
                        width=320, height=240)


def two_view(rng, n=100, baseline=0.5):
    pts = np.stack([rng.uniform(-2, 2, n), rng.uniform(-1.5, 1.5, n),
                    rng.uniform(3, 9, n)], 1).astype(np.float32)
    R1 = np.eye(3, dtype=np.float32)
    t1 = np.zeros(3, np.float32)
    xi = np.array([baseline, 0.02, 0.01, 0.0, 0.05, 0.0], np.float32)
    R2, t2 = [np.asarray(x) for x in se3.se3_exp(jnp.asarray(xi))]
    uv1 = np.array(project(CAM, jnp.asarray(pts)))
    uv2 = np.array(project(CAM, jnp.asarray(pts @ R2.T + t2)))
    return pts, (R1, t1), (R2, t2), uv1, uv2


def test_triangulate_dlt_exact(rng):
    pts, (R1, t1), (R2, t2), uv1, uv2 = two_view(rng)
    X = np.asarray(triangulate_dlt(CAM, jnp.asarray(R1), jnp.asarray(t1),
                                   jnp.asarray(R2), jnp.asarray(t2),
                                   jnp.asarray(uv1), jnp.asarray(uv2)))
    np.testing.assert_allclose(X, pts, atol=2e-2)


def test_fundamental_epipolar_constraint(rng):
    pts, (R1, t1), (R2, t2), uv1, uv2 = two_view(rng)
    F12 = np.asarray(fundamental_from_poses(
        CAM, jnp.asarray(R1), jnp.asarray(t1), jnp.asarray(R2),
        jnp.asarray(t2)))
    x1 = np.concatenate([uv1, np.ones((len(uv1), 1))], 1)
    x2 = np.concatenate([uv2, np.ones((len(uv2), 1))], 1)
    resid = np.abs(np.sum(x1 * (x2 @ F12.T), axis=1))
    l = x2 @ F12.T
    d = resid / np.sqrt(l[:, 0] ** 2 + l[:, 1] ** 2)
    assert np.median(d) < 0.1, np.median(d)


def test_triangulate_between_full(rng):
    """Full pipeline: descriptors + epipolar gating + checks."""
    pts, (R1, t1), (R2, t2), uv1, uv2 = two_view(rng, n=150)
    desc = rng.integers(0, 2**32, (150, 8), dtype=np.uint32)
    n = 150
    ones = jnp.ones(n, bool)
    lvl = jnp.zeros(n, jnp.int32)
    ang = jnp.zeros(n)
    out = triangulate_between(
        CAM, jnp.float32(1.2),
        jnp.asarray(uv1, jnp.float32), jnp.asarray(desc), ones, lvl, ang,
        ones, jnp.asarray(R1), jnp.asarray(t1),
        jnp.asarray(uv2, jnp.float32), jnp.asarray(desc), ones, lvl, ang,
        ones, jnp.asarray(R2), jnp.asarray(t2))
    ok = np.asarray(out.ok)
    assert ok.sum() > 100, ok.sum()
    idx2 = np.asarray(out.idx2)
    np.testing.assert_array_equal(idx2[ok], np.arange(150)[ok])
    X = np.asarray(out.points)
    np.testing.assert_allclose(X[ok], pts[ok], atol=5e-2)


def test_triangulate_between_stereo_low_parallax(rng):
    """Far points under near-forward motion: ray parallax is too low for
    DLT, but stereo depth must still spawn them (ref LocalMapping.cc
    :293-341 arbitration) — the far-point path that matters on KITTI."""
    n = 120
    pts = np.stack([rng.uniform(-2, 2, n), rng.uniform(-1.5, 1.5, n),
                    rng.uniform(8, 14, n)], 1).astype(np.float32)
    R1 = np.eye(3, dtype=np.float32)
    t1 = np.zeros(3, np.float32)
    R2 = np.eye(3, dtype=np.float32)
    t2 = np.array([0.0, 0.0, -0.05], np.float32)   # 5cm forward
    uv1 = np.array(project(CAM, jnp.asarray(pts)))
    uv2 = np.array(project(CAM, jnp.asarray(pts @ R2.T + t2)))
    desc = rng.integers(0, 2**32, (n, 8), dtype=np.uint32)
    ones = jnp.ones(n, bool)
    lvl = jnp.zeros(n, jnp.int32)
    ang = jnp.zeros(n)
    bf = 0.5 * 400.0                                # 0.5m baseline
    cam = CAM._replace(bf=jnp.float32(bf))
    z1 = pts[:, 2]
    ur1 = uv1[:, 0] - bf / z1
    z2 = (pts @ R2.T + t2)[:, 2]
    ur2 = uv2[:, 0] - bf / z2
    out = triangulate_between(
        cam, jnp.float32(1.2),
        jnp.asarray(uv1, jnp.float32), jnp.asarray(desc), ones, lvl, ang,
        ones, jnp.asarray(R1), jnp.asarray(t1),
        jnp.asarray(uv2, jnp.float32), jnp.asarray(desc), ones, lvl, ang,
        ones, jnp.asarray(R2), jnp.asarray(t2),
        kp1_depth=jnp.asarray(z1), kp1_ur=jnp.asarray(ur1),
        kp2_depth=jnp.asarray(z2), kp2_ur=jnp.asarray(ur2))
    ok = np.asarray(out.ok)
    assert ok.sum() > 60, ok.sum()
    X = np.asarray(out.points)
    np.testing.assert_allclose(X[ok], pts[ok], atol=5e-2)

    # mono form on the same geometry rejects (low parallax, no depth)
    out_mono = triangulate_between(
        cam, jnp.float32(1.2),
        jnp.asarray(uv1, jnp.float32), jnp.asarray(desc), ones, lvl, ang,
        ones, jnp.asarray(R1), jnp.asarray(t1),
        jnp.asarray(uv2, jnp.float32), jnp.asarray(desc), ones, lvl, ang,
        ones, jnp.asarray(R2), jnp.asarray(t2))
    assert np.asarray(out_mono.ok).sum() < ok.sum() / 4
