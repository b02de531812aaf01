"""SE3/Sim3/quaternion numerics vs scipy/numpy oracles."""
import numpy as np
import pytest
from scipy.spatial.transform import Rotation as Rsc

import jax.numpy as jnp

from slam_dynamic_tpu.utils import se3, sim3


def random_rotvecs(rng, n):
    v = rng.normal(size=(n, 3))
    mags = rng.uniform(0.0, 3.0, size=(n, 1))
    out = v / np.linalg.norm(v, axis=1, keepdims=True) * mags
    out[0] = 0.0                      # identity
    out[1] = [1e-9, 0, 0]             # tiny angle
    out[2] = [np.pi - 1e-5, 0, 0]     # near pi
    return out


def test_so3_exp_matches_scipy(rng):
    v = random_rotvecs(rng, 64)
    R = np.asarray(se3.so3_exp(jnp.asarray(v, jnp.float64)))
    R_ref = Rsc.from_rotvec(v).as_matrix()
    np.testing.assert_allclose(R, R_ref, atol=1e-5)


def test_so3_log_roundtrip(rng):
    v = random_rotvecs(rng, 64)
    R = Rsc.from_rotvec(v).as_matrix()
    log = np.asarray(se3.so3_log(jnp.asarray(R, jnp.float32)))
    R2 = Rsc.from_rotvec(log).as_matrix()
    # compare rotations (log itself may flip sign at pi)
    np.testing.assert_allclose(R2, R, atol=2e-4)


def test_se3_exp_log_roundtrip(rng):
    xi = rng.normal(size=(32, 6)).astype(np.float32) * 0.8
    R, t = se3.se3_exp(jnp.asarray(xi))
    xi2 = np.asarray(se3.se3_log(R, t))
    np.testing.assert_allclose(xi2, xi, atol=1e-4)


def test_se3_compose_inverse(rng):
    xi = rng.normal(size=(8, 6)).astype(np.float32)
    R, t = se3.se3_exp(jnp.asarray(xi))
    Ri, ti = se3.se3_inverse(R, t)
    Rc, tc = se3.se3_compose(R, t, Ri, ti)
    np.testing.assert_allclose(np.asarray(Rc), np.tile(np.eye(3), (8, 1, 1)),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(tc), 0, atol=1e-5)


def test_se3_apply_matches_matrix(rng):
    xi = rng.normal(size=(6,)).astype(np.float32)
    R, t = se3.se3_exp(jnp.asarray(xi))
    x = rng.normal(size=(16, 3)).astype(np.float32)
    y = np.asarray(se3.se3_apply(R, t, jnp.asarray(x)))
    y_ref = x @ np.asarray(R).T + np.asarray(t)
    np.testing.assert_allclose(y, y_ref, atol=1e-5)


def test_quat_roundtrip(rng):
    v = random_rotvecs(rng, 64)
    R = Rsc.from_rotvec(v).as_matrix().astype(np.float32)
    q = np.asarray(se3.quat_from_rot(jnp.asarray(R)))
    q_ref = Rsc.from_matrix(R).as_quat()  # (x,y,z,w)
    q_ref = np.concatenate([q_ref[:, 3:4], q_ref[:, :3]], axis=1)
    q_ref *= np.where(q_ref[:, :1] < 0, -1.0, 1.0)
    np.testing.assert_allclose(np.abs(q), np.abs(q_ref), atol=1e-4)
    R2 = np.asarray(se3.rot_from_quat(jnp.asarray(q)))
    np.testing.assert_allclose(R2, R, atol=1e-4)


def test_orthonormalize(rng):
    v = random_rotvecs(rng, 16)
    R = Rsc.from_rotvec(v).as_matrix().astype(np.float32)
    noisy = R + rng.normal(size=R.shape).astype(np.float32) * 1e-3
    Ro = np.asarray(se3.orthonormalize(jnp.asarray(noisy)))
    err = Ro @ np.swapaxes(Ro, 1, 2) - np.eye(3)
    assert np.abs(err).max() < 1e-5


def test_sim3_exp_log_roundtrip(rng):
    xi = rng.normal(size=(32, 7)).astype(np.float32) * 0.5
    s, R, t = sim3.sim3_exp(jnp.asarray(xi))
    xi2 = np.asarray(sim3.sim3_log(s, R, t))
    np.testing.assert_allclose(xi2, xi, atol=2e-4)


def test_sim3_compose_inverse(rng):
    xi = rng.normal(size=(8, 7)).astype(np.float32) * 0.5
    s, R, t = sim3.sim3_exp(jnp.asarray(xi))
    si, Ri, ti = sim3.sim3_inverse(s, R, t)
    sc, Rc, tc = sim3.sim3_compose(s, R, t, si, Ri, ti)
    np.testing.assert_allclose(np.asarray(sc), 1.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(Rc), np.tile(np.eye(3), (8, 1, 1)),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(tc), 0, atol=1e-4)


def test_sim3_apply(rng):
    xi = rng.normal(size=(7,)).astype(np.float32) * 0.5
    s, R, t = sim3.sim3_exp(jnp.asarray(xi))
    x = rng.normal(size=(16, 3)).astype(np.float32)
    y = np.asarray(sim3.sim3_apply(s, R, t, jnp.asarray(x)))
    y_ref = float(s) * (x @ np.asarray(R).T) + np.asarray(t)
    np.testing.assert_allclose(y, y_ref, atol=1e-5)


def test_sim3_log_zero_sigma_regression(rng):
    """sigma=0 with large theta hit a wrong-branch bug in _sim3_W (generic
    B/C evaluated with sigma replaced by 1.0); exp/log must round-trip."""
    xi = rng.normal(size=(64, 7)).astype(np.float32)
    xi[:, 6] = 0.0                      # exact zero log-scale
    s, R, t = sim3.sim3_exp(jnp.asarray(xi))
    np.testing.assert_allclose(np.asarray(s), 1.0, atol=1e-6)
    xi2 = np.asarray(sim3.sim3_log(s, R, t))
    np.testing.assert_allclose(xi2, xi, atol=3e-4)
