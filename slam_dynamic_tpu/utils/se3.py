"""SE(3) / SO(3) Lie-group operations, batched and fixed-shape.

TPU-native equivalent of the reference's g2o `se3quat.h` exp/log maps and
`Converter.cc` quaternion round-trips (reference: /root/reference/Thirdparty/
g2o/g2o/types/se3quat.h, /root/reference/src/Converter.cc:36-151). All
functions are pure jnp, broadcast over leading batch dimensions, and are safe
under jit/vmap/grad (small-angle branches via jnp.where on Taylor expansions,
never data-dependent Python control flow).

Conventions:
  - Rotations are 3x3 matrices ``R`` (world->camera when used as Tcw).
  - A rigid transform is the pair ``(R, t)`` acting as ``x_c = R @ x_w + t``.
  - Twists are 6-vectors ``[rho, phi]`` (translation part first, rotation
    part second), matching g2o's SE3Quat ordering.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-8


def hat(v):
    """Skew-symmetric matrix of a (..., 3) vector."""
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    zero = jnp.zeros_like(x)
    return jnp.stack(
        [
            jnp.stack([zero, -z, y], axis=-1),
            jnp.stack([z, zero, -x], axis=-1),
            jnp.stack([-y, x, zero], axis=-1),
        ],
        axis=-2,
    )


def vee(m):
    """Inverse of hat: (..., 3, 3) skew matrix -> (..., 3) vector."""
    return jnp.stack([m[..., 2, 1], m[..., 0, 2], m[..., 1, 0]], axis=-1)


def _sinc(x):
    """sin(x)/x with Taylor fallback near 0."""
    small = jnp.abs(x) < 1e-4
    xs = jnp.where(small, 1.0, x)  # avoid 0/0 in the non-taken branch
    return jnp.where(small, 1.0 - x * x / 6.0, jnp.sin(xs) / xs)


def _cosc(x):
    """(1-cos(x))/x^2 with Taylor fallback near 0."""
    small = jnp.abs(x) < 1e-4
    xs = jnp.where(small, 1.0, x)
    return jnp.where(small, 0.5 - x * x / 24.0, (1.0 - jnp.cos(xs)) / (xs * xs))


def safe_norm(v, axis=-1, keepdims=False):
    """||v|| with a finite gradient at v=0 (jnp.linalg.norm's derivative is
    NaN there, which poisons jacfwd/jacrev of exp maps at the identity)."""
    sq = jnp.sum(v * v, axis=axis, keepdims=keepdims)
    return jnp.sqrt(sq + 1e-24)


def so3_exp(phi):
    """Rodrigues: (..., 3) axis-angle -> (..., 3, 3) rotation."""
    theta = safe_norm(phi, axis=-1, keepdims=True)
    th = theta[..., None]  # (...,1,1)
    K = hat(phi)
    I = jnp.broadcast_to(jnp.eye(3, dtype=phi.dtype), K.shape)
    return I + _sinc(th) * K + _cosc(th) * (K @ K)


def so3_log(R):
    """(..., 3, 3) rotation -> (..., 3) axis-angle. Safe up to theta < pi-eps."""
    trace = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    cos_t = jnp.clip((trace - 1.0) * 0.5, -1.0, 1.0)
    w = vee(R - jnp.swapaxes(R, -1, -2)) * 0.5  # = sin(theta) * axis
    # atan2 formulation: finite gradients at the identity (arccos' blows up
    # at cos=1, poisoning pose-graph Jacobians evaluated at near-zero error)
    sin_t = safe_norm(w, axis=-1)
    theta = jnp.arctan2(sin_t, cos_t)
    small = sin_t < 1e-4
    sin_safe = jnp.where(small, 1.0, sin_t)
    # theta/sin(theta) -> 1 + theta^2/6 as theta -> 0
    scale_generic = jnp.where(small, 1.0 + theta * theta / 6.0,
                              theta / sin_safe)
    log_generic = w * scale_generic[..., None]
    # theta ~ pi branch: axis from diagonal of (R + I)/2 = axis axis^T scaled.
    B = (R + jnp.swapaxes(R, -1, -2)) * 0.5 + (1.0 - cos_t)[..., None, None] * 0.0
    diag = jnp.stack([B[..., 0, 0], B[..., 1, 1], B[..., 2, 2]], axis=-1)
    axis_sq = jnp.clip((diag - cos_t[..., None]) / jnp.where(
        (1.0 - cos_t)[..., None] < _EPS, 1.0, (1.0 - cos_t)[..., None]), 0.0, 1.0)
    axis_abs = jnp.sqrt(axis_sq)
    # Fix signs from off-diagonal terms relative to the largest component.
    s01 = B[..., 0, 1]
    s02 = B[..., 0, 2]
    s12 = B[..., 1, 2]
    amax = jnp.argmax(axis_abs, axis=-1)
    sx = jnp.where(amax == 0, 1.0, jnp.where(amax == 1, jnp.sign(s01), jnp.sign(s02)))
    sy = jnp.where(amax == 0, jnp.sign(s01), jnp.where(amax == 1, 1.0, jnp.sign(s12)))
    sz = jnp.where(amax == 0, jnp.sign(s02), jnp.where(amax == 1, jnp.sign(s12), 1.0))
    sx = jnp.where(sx == 0, 1.0, sx)
    sy = jnp.where(sy == 0, 1.0, sy)
    sz = jnp.where(sz == 0, 1.0, sz)
    axis_pi = axis_abs * jnp.stack([sx, sy, sz], axis=-1)
    log_pi = axis_pi * theta[..., None]
    near_pi = (sin_t < 1e-4) & (cos_t < 0.0)
    return jnp.where(near_pi[..., None], log_pi, log_generic)


def _left_jacobian(phi):
    """SO(3) left Jacobian J_l(phi), (..., 3, 3)."""
    theta = safe_norm(phi, axis=-1, keepdims=True)[..., None]
    K = hat(phi)
    I = jnp.broadcast_to(jnp.eye(3, dtype=phi.dtype), K.shape)
    th2 = theta * theta
    small = theta < 1e-4
    ths = jnp.where(small, 1.0, theta)
    A = jnp.where(small, 0.5 - th2 / 24.0, (1.0 - jnp.cos(ths)) / (ths * ths))
    B = jnp.where(small, 1.0 / 6.0 - th2 / 120.0,
                  (ths - jnp.sin(ths)) / (ths * ths * ths))
    return I + A * K + B * (K @ K)


def _left_jacobian_inv(phi):
    theta = safe_norm(phi, axis=-1, keepdims=True)[..., None]
    K = hat(phi)
    I = jnp.broadcast_to(jnp.eye(3, dtype=phi.dtype), K.shape)
    th2 = theta * theta
    small = theta < 1e-4
    ths = jnp.where(small, 1.0, theta)
    half = ths * 0.5
    cot_coeff = jnp.where(
        small,
        1.0 / 12.0 + th2 / 720.0,
        (1.0 / (ths * ths)) - (jnp.cos(half) / (2.0 * ths * jnp.sin(half))),
    )
    return I - 0.5 * K + cot_coeff * (K @ K)


def se3_exp(xi):
    """(..., 6) twist [rho, phi] -> (R, t)."""
    rho, phi = xi[..., :3], xi[..., 3:]
    R = so3_exp(phi)
    t = jnp.einsum("...ij,...j->...i", _left_jacobian(phi), rho)
    return R, t


def se3_log(R, t):
    """(R, t) -> (..., 6) twist [rho, phi]."""
    phi = so3_log(R)
    rho = jnp.einsum("...ij,...j->...i", _left_jacobian_inv(phi), t)
    return jnp.concatenate([rho, phi], axis=-1)


def se3_inverse(R, t):
    Rt = jnp.swapaxes(R, -1, -2)
    return Rt, -jnp.einsum("...ij,...j->...i", Rt, t)


def se3_compose(Ra, ta, Rb, tb):
    """(Ra,ta) o (Rb,tb): first apply b, then a."""
    return Ra @ Rb, jnp.einsum("...ij,...j->...i", Ra, tb) + ta


def se3_apply(R, t, x):
    """Apply transform to (..., 3) points."""
    return jnp.einsum("...ij,...j->...i", R, x) + t


def se3_retract(R, t, xi):
    """Left-multiplicative update: exp(xi) o (R, t) — g2o's oplus."""
    dR, dt = se3_exp(xi)
    return se3_compose(dR, dt, R, t)


# ----------------------------------------------------------------------------
# Quaternions (w, x, y, z) — used for trajectory export (TUM format) and
# orthonormal re-projection of drifting rotation matrices.
# ----------------------------------------------------------------------------

def quat_from_rot(R):
    """(..., 3, 3) -> (..., 4) unit quaternion (w, x, y, z), w >= 0."""
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22
    # Four Shepperd candidates; pick the numerically largest pivot.
    qw0 = jnp.sqrt(jnp.clip(1.0 + tr, _EPS, None)) * 0.5
    q0 = jnp.stack([qw0, (m21 - m12) / (4 * qw0), (m02 - m20) / (4 * qw0),
                    (m10 - m01) / (4 * qw0)], axis=-1)
    qx1 = jnp.sqrt(jnp.clip(1.0 + m00 - m11 - m22, _EPS, None)) * 0.5
    q1 = jnp.stack([(m21 - m12) / (4 * qx1), qx1, (m01 + m10) / (4 * qx1),
                    (m02 + m20) / (4 * qx1)], axis=-1)
    qy2 = jnp.sqrt(jnp.clip(1.0 - m00 + m11 - m22, _EPS, None)) * 0.5
    q2 = jnp.stack([(m02 - m20) / (4 * qy2), (m01 + m10) / (4 * qy2), qy2,
                    (m12 + m21) / (4 * qy2)], axis=-1)
    qz3 = jnp.sqrt(jnp.clip(1.0 - m00 - m11 + m22, _EPS, None)) * 0.5
    q3 = jnp.stack([(m10 - m01) / (4 * qz3), (m02 + m20) / (4 * qz3),
                    (m12 + m21) / (4 * qz3), qz3], axis=-1)
    cand = jnp.stack([q0, q1, q2, q3], axis=-2)  # (..., 4, 4)
    pivots = jnp.stack([tr, m00 - m11 - m22, -m00 + m11 - m22,
                        -m00 - m11 + m22], axis=-1)
    idx = jnp.argmax(pivots, axis=-1)
    q = jnp.take_along_axis(cand, idx[..., None, None].repeat(4, -1), axis=-2)
    q = q[..., 0, :]
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    return q * jnp.where(q[..., :1] < 0, -1.0, 1.0)


def rot_from_quat(q):
    """(..., 4) (w, x, y, z) -> (..., 3, 3)."""
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    r = jnp.stack(
        [
            jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - w * z),
                       2 * (x * z + w * y)], axis=-1),
            jnp.stack([2 * (x * y + w * z), 1 - 2 * (x * x + z * z),
                       2 * (y * z - w * x)], axis=-1),
            jnp.stack([2 * (x * z - w * y), 2 * (y * z + w * x),
                       1 - 2 * (x * x + y * y)], axis=-1),
        ],
        axis=-2,
    )
    return r


def orthonormalize(R):
    """Project a near-rotation onto SO(3) via quaternion round-trip."""
    return rot_from_quat(quat_from_rot(R))
