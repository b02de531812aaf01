"""Two-view reconstruction: E/H decomposition + model selection."""
import numpy as np
import jax
import jax.numpy as jnp

from slam_dynamic_tpu.utils.camera import Intrinsics, project
from slam_dynamic_tpu.utils import se3
from slam_dynamic_tpu.ops import ransac
from slam_dynamic_tpu.ops.twoview import reconstruct

CAM = Intrinsics.create(fx=400.0, fy=400.0, cx=160.0, cy=120.0,
                        width=320, height=240)


def general_scene(rng, n=200):
    pts = np.stack([rng.uniform(-2, 2, n), rng.uniform(-1.5, 1.5, n),
                    rng.uniform(3, 9, n)], 1).astype(np.float32)
    return pts


def planar_scene(rng, n=200):
    x = rng.uniform(-2, 2, n)
    y = rng.uniform(-1.5, 1.5, n)
    z = 5.0 + 0.3 * x - 0.2 * y       # a tilted plane
    return np.stack([x, y, z], 1).astype(np.float32)


def views(pts, xi):
    R2, t2 = [np.asarray(v) for v in se3.se3_exp(jnp.asarray(xi))]
    uv1 = np.array(project(CAM, jnp.asarray(pts)))
    uv2 = np.array(project(CAM, jnp.asarray(pts @ R2.T + t2)))
    return uv1.astype(np.float32), uv2.astype(np.float32), R2, t2


def test_reconstruct_from_fundamental(rng):
    pts = general_scene(rng)
    xi = np.array([0.4, 0.05, 0.02, 0.01, 0.06, 0.0], np.float32)
    uv1, uv2, R_gt, t_gt = views(pts, xi)
    mask = jnp.ones(len(pts), bool)
    fit = ransac.fit_fundamental(jnp.asarray(uv1), jnp.asarray(uv2), mask,
                                 jax.random.PRNGKey(0), thresh_px=2.0)
    rec = reconstruct(CAM, fit.M, jnp.asarray(uv1), jnp.asarray(uv2),
                      fit.inliers)
    assert bool(rec.ok)
    np.testing.assert_allclose(np.asarray(rec.R), R_gt, atol=1e-2)
    t_est = np.asarray(rec.t)
    t_dir = t_gt / np.linalg.norm(t_gt)
    np.testing.assert_allclose(t_est, t_dir, atol=2e-2)
    # triangulated points match up to the baseline scale
    scale = np.linalg.norm(t_gt)
    good = np.asarray(rec.good)
    assert good.sum() > 150
    np.testing.assert_allclose(np.asarray(rec.points)[good] * scale,
                               pts[good], atol=0.1)


def test_reconstruct_from_homography_planar(rng):
    pts = planar_scene(rng)
    xi = np.array([0.4, 0.03, 0.02, 0.01, 0.04, 0.0], np.float32)
    uv1, uv2, R_gt, t_gt = views(pts, xi)
    mask = jnp.ones(len(pts), bool)
    fit = ransac.fit_homography(jnp.asarray(uv1), jnp.asarray(uv2), mask,
                                jax.random.PRNGKey(1), thresh_px=2.0)
    assert int(fit.n_inliers) > 180      # planar: H explains everything
    rec = reconstruct(CAM, fit.M, jnp.asarray(uv1), jnp.asarray(uv2),
                      fit.inliers, use_homography=True)
    assert bool(rec.ok)
    np.testing.assert_allclose(np.asarray(rec.R), R_gt, atol=2e-2)
    t_dir = t_gt / np.linalg.norm(t_gt)
    np.testing.assert_allclose(np.asarray(rec.t), t_dir, atol=5e-2)
