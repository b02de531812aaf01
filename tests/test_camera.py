import numpy as np
import jax.numpy as jnp

from slam_dynamic_tpu.utils.camera import (
    Intrinsics, project, project_stereo, backproject, undistort_points,
    distort_normalized, undistorted_bounds, in_frustum)
from slam_dynamic_tpu.utils import se3


def make_cam(**kw):
    return Intrinsics.create(fx=520.9, fy=521.0, cx=325.1, cy=249.7,
                             bf=40.0, width=640, height=480, **kw)


def test_project_backproject_roundtrip(rng):
    cam = make_cam()
    uv = rng.uniform([0, 0], [640, 480], size=(128, 2)).astype(np.float32)
    d = rng.uniform(0.5, 10.0, size=(128,)).astype(np.float32)
    x = backproject(cam, jnp.asarray(uv), jnp.asarray(d))
    uv2 = np.asarray(project(cam, x))
    np.testing.assert_allclose(uv2, uv, atol=1e-3)


def test_project_stereo_disparity():
    cam = make_cam()
    x = jnp.array([[1.0, 0.5, 4.0]])
    uvr = np.asarray(project_stereo(cam, x))
    assert uvr[0, 2] < uvr[0, 0]  # right u shifted left
    np.testing.assert_allclose(uvr[0, 0] - uvr[0, 2], 40.0 / 4.0, atol=1e-4)


def test_undistort_inverts_distort(rng):
    cam = make_cam(k1=-0.3, k2=0.1, p1=1e-3, p2=-1e-3)
    uv = rng.uniform([100, 100], [540, 380], size=(256, 2)).astype(np.float32)
    # distort the normalized undistorted points to get "observed" pixels
    xn = jnp.stack([(uv[:, 0] - 325.1) / 520.9, (uv[:, 1] - 249.7) / 521.0], -1)
    xd = distort_normalized(cam, xn)
    uv_dist = np.stack([np.asarray(xd)[:, 0] * 520.9 + 325.1,
                        np.asarray(xd)[:, 1] * 521.0 + 249.7], -1)
    uv_rec = np.asarray(undistort_points(cam, jnp.asarray(uv_dist)))
    np.testing.assert_allclose(uv_rec, uv, atol=0.05)


def test_bounds_no_distortion():
    cam = make_cam()
    minx, maxx, miny, maxy = [float(v) for v in undistorted_bounds(cam)]
    np.testing.assert_allclose([minx, maxx, miny, maxy], [0, 640, 0, 480],
                               atol=1e-2)


def test_in_frustum(rng):
    cam = make_cam()
    bounds = undistorted_bounds(cam)
    R = jnp.eye(3)
    t = jnp.zeros(3)
    pts = jnp.array([
        [0.0, 0.0, 5.0],     # center, visible
        [0.0, 0.0, -5.0],    # behind
        [100.0, 0.0, 5.0],   # out of view
    ])
    ok, uv, z = in_frustum(cam, R, t, pts, bounds)
    assert np.asarray(ok).tolist() == [True, False, False]
