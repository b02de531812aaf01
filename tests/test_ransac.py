import numpy as np
import jax
import jax.numpy as jnp

from slam_dynamic_tpu.ops import ransac


def make_h_pairs(rng, n=200, n_out=40):
    H = np.array([[1.02, 0.01, 5.0], [-0.015, 0.99, -3.0],
                  [1e-5, -2e-5, 1.0]])
    p1 = rng.uniform(50, 590, (n, 2))
    x1 = np.concatenate([p1, np.ones((n, 1))], axis=1)
    x2 = x1 @ H.T
    p2 = x2[:, :2] / x2[:, 2:]
    p2 += rng.normal(0, 0.3, p2.shape)
    p2[:n_out] += rng.uniform(20, 80, (n_out, 2))
    return p1.astype(np.float32), p2.astype(np.float32), H


def test_fit_homography(rng):
    p1, p2, H_gt = make_h_pairs(rng)
    fit = ransac.fit_homography(jnp.asarray(p1), jnp.asarray(p2),
                                jnp.ones(len(p1), bool),
                                jax.random.PRNGKey(0))
    assert int(fit.n_inliers) > 140
    inl = np.asarray(fit.inliers)
    assert inl[:40].sum() <= 2            # outliers excluded
    H = np.asarray(fit.M)
    H = H / H[2, 2]
    np.testing.assert_allclose(H, H_gt / H_gt[2, 2], atol=0.25)


def test_fit_fundamental(rng):
    # stereo-like geometry: 3D points, two cameras
    pts = np.stack([rng.uniform(-3, 3, 300), rng.uniform(-2, 2, 300),
                    rng.uniform(4, 10, 300)], 1)
    K = np.array([[500.0, 0, 320], [0, 500, 240], [0, 0, 1]])
    t = np.array([0.4, 0.05, 0.02])
    th = 0.05
    R = np.array([[np.cos(th), 0, np.sin(th)], [0, 1, 0],
                  [-np.sin(th), 0, np.cos(th)]])
    x1 = pts @ K.T
    p1 = x1[:, :2] / x1[:, 2:]
    pc2 = pts @ R.T + t
    x2 = pc2 @ K.T
    p2 = x2[:, :2] / x2[:, 2:]
    p1 += rng.normal(0, 0.3, p1.shape)
    p2 += rng.normal(0, 0.3, p2.shape)
    p2[:50] += rng.uniform(15, 60, (50, 2))
    fit = ransac.fit_fundamental(jnp.asarray(p1, jnp.float32),
                                 jnp.asarray(p2, jnp.float32),
                                 jnp.ones(300, bool), jax.random.PRNGKey(1))
    assert int(fit.n_inliers) > 200
    inl = np.asarray(fit.inliers)
    assert inl[:50].sum() <= 4
    # epipolar constraint satisfied by ground truth geometry
    F = np.asarray(fit.M)
    x1h = np.concatenate([p1[60:80], np.ones((20, 1))], 1)
    x2h = np.concatenate([p2[60:80], np.ones((20, 1))], 1)
    resid = np.abs(np.sum(x2h * (x1h @ F.T), axis=1))
    l = x1h @ F.T
    d = resid / np.sqrt(l[:, 0] ** 2 + l[:, 1] ** 2)
    assert np.median(d) < 1.0


def test_ransac_deterministic(rng):
    p1, p2, _ = make_h_pairs(rng)
    f1 = ransac.fit_homography(jnp.asarray(p1), jnp.asarray(p2),
                               jnp.ones(len(p1), bool), jax.random.PRNGKey(7))
    f2 = ransac.fit_homography(jnp.asarray(p1), jnp.asarray(p2),
                               jnp.ones(len(p1), bool), jax.random.PRNGKey(7))
    np.testing.assert_array_equal(np.asarray(f1.M), np.asarray(f2.M))


def test_umeyama_and_ate(rng):
    from slam_dynamic_tpu.io.evo import umeyama, ate_rmse
    src = rng.normal(size=(50, 3))
    R, _ = np.linalg.qr(rng.normal(size=(3, 3)))
    if np.linalg.det(R) < 0:
        R[:, 0] *= -1
    s, t = 1.7, np.array([1.0, -2.0, 0.5])
    dst = s * src @ R.T + t
    s2, R2, t2 = umeyama(src, dst)
    assert abs(s2 - s) < 1e-6
    np.testing.assert_allclose(R2, R, atol=1e-6)
    assert ate_rmse(src, dst, align=True, with_scale=True) < 1e-6
    assert ate_rmse(src, dst, align=False) > 1.0
