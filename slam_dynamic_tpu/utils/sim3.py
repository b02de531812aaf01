"""Sim(3) similarity transforms: (s, R, t) with x' = s R x + t.

TPU-native equivalent of g2o's `sim3.h` (reference: /root/reference/
Thirdparty/g2o/g2o/types/sim3.h) used by loop closing (Sim3 solver, Sim3
pose-graph edges, essential-graph optimization). Twist layout is
``[rho(3), phi(3), sigma(1)]`` with s = exp(sigma), matching g2o.
"""
from __future__ import annotations

import jax.numpy as jnp

from .se3 import hat, so3_exp, so3_log, safe_norm, _sinc, _cosc  # noqa: F401


def sim3_identity(dtype=jnp.float32):
    return jnp.ones((), dtype), jnp.eye(3, dtype=dtype), jnp.zeros((3,), dtype)


def sim3_apply(s, R, t, x):
    return s[..., None] * jnp.einsum("...ij,...j->...i", R, x) + t


def sim3_compose(sa, Ra, ta, sb, Rb, tb):
    """(sa,Ra,ta) o (sb,Rb,tb)."""
    return (
        sa * sb,
        Ra @ Rb,
        sa[..., None] * jnp.einsum("...ij,...j->...i", Ra, tb) + ta,
    )


def sim3_inverse(s, R, t):
    Rt = jnp.swapaxes(R, -1, -2)
    si = 1.0 / s
    return si, Rt, -si[..., None] * jnp.einsum("...ij,...j->...i", Rt, t)


def _sim3_W(phi, sigma):
    """The W matrix of the Sim(3) exponential (t = W @ rho).

    Closed form from Ethan Eade's Lie-group notes; Taylor fallbacks keep it
    differentiable at theta->0 and sigma->0.
    """
    theta = safe_norm(phi, axis=-1)
    s = jnp.exp(sigma)
    K = hat(phi)
    I = jnp.broadcast_to(jnp.eye(3, dtype=phi.dtype), K.shape)

    sig_small = jnp.abs(sigma) < 1e-5
    sig_safe = jnp.where(sig_small, 1.0, sigma)
    A_c = jnp.where(sig_small, 1.0 + sigma / 2.0, (s - 1.0) / sig_safe)

    th_small = theta < 1e-5
    th_safe = jnp.where(th_small, 1.0, theta)
    th2 = th_safe * th_safe
    # B and C never divide by sigma — use the TRUE sigma here (substituting
    # sig_safe=1 when sigma~0 silently corrupted every fixed-scale
    # sim3_log: denominators and numerators both shifted).
    denom = sigma * sigma + th2

    # B = (s*sin(th)*sigma + (1-s*cos(th))*th) / (th*(sig^2+th^2))
    # C = (A - ((s*cos(th)-1)*sigma + s*sin(th)*th)/denom) / th^2
    a = s * jnp.sin(th_safe)
    b = s * jnp.cos(th_safe)
    B_gen = (a * sigma + (1.0 - b) * th_safe) / (th_safe * denom)
    C_gen = (A_c - ((b - 1.0) * sigma + a * th_safe) / denom) / th2

    # theta->0 limits (any sigma): B -> (s*sigma + 1 - s)/sig^2 ~ 1/2 series
    B_th0 = jnp.where(
        sig_small, 0.5 + sigma / 3.0, (s * sig_safe - s + 1.0) / (sig_safe * sig_safe)
    )
    C_th0 = jnp.where(
        sig_small,
        1.0 / 6.0 + sigma / 8.0,
        (s * sig_safe * sig_safe / 2.0 - s * sig_safe + s - 1.0)
        / (sig_safe * sig_safe * sig_safe),
    )
    B = jnp.where(th_small, B_th0, B_gen)
    C = jnp.where(th_small, C_th0, C_gen)
    return (
        A_c[..., None, None] * I
        + B[..., None, None] * K
        + C[..., None, None] * (K @ K)
    )


def sim3_exp(xi):
    """(..., 7) twist [rho, phi, sigma] -> (s, R, t)."""
    rho, phi, sigma = xi[..., :3], xi[..., 3:6], xi[..., 6]
    s = jnp.exp(sigma)
    R = so3_exp(phi)
    W = _sim3_W(phi, sigma)
    t = jnp.einsum("...ij,...j->...i", W, rho)
    return s, R, t


def sim3_log(s, R, t):
    """(s, R, t) -> (..., 7) twist."""
    sigma = jnp.log(s)
    phi = so3_log(R)
    W = _sim3_W(phi, sigma)
    rho = jnp.linalg.solve(W, t[..., None])[..., 0]
    return jnp.concatenate([rho, phi, sigma[..., None]], axis=-1)
