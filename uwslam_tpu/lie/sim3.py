"""Sim(3) similarity transforms (rotation + translation + scale) in pure JAX.

Capability parity with the reference's `uw::Sim3` typedef
(/root/reference/include/Options.h:130 -> Sophus sim3.hpp): used by
scale-drift-aware pose-graph optimization for monocular SLAM.

Representation: (..., 4, 4) matrix whose upper-left 3x3 block is s * R.
Twist: (..., 7) ordered [v(3), w(3), sigma] with scale s = exp(sigma).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from . import so3
from ..utils.precision import einsum as _einsum, mm as _mm

_EPS = 1e-6


def identity(dtype=jnp.float32) -> jax.Array:
    return jnp.eye(4, dtype=dtype)


def from_rst(R: jax.Array, s: jax.Array, t: jax.Array) -> jax.Array:
    batch = jnp.broadcast_shapes(R.shape[:-2], t.shape[:-1], jnp.shape(s))
    sR = jnp.asarray(s)[..., None, None] * R
    sR = jnp.broadcast_to(sR, batch + (3, 3))
    t = jnp.broadcast_to(t, batch + (3,))
    top = jnp.concatenate([sR, t[..., None]], axis=-1)
    bottom = jnp.zeros(batch + (1, 4), dtype=R.dtype).at[..., 0, 3].set(1.0)
    return jnp.concatenate([top, bottom], axis=-2)


def scale(T: jax.Array) -> jax.Array:
    """Recover s from the sR block (det(sR) = s^3)."""
    sR = T[..., :3, :3]
    return jnp.cbrt(jnp.linalg.det(sR))


def rotation(T: jax.Array) -> jax.Array:
    return T[..., :3, :3] / scale(T)[..., None, None]


def translation(T: jax.Array) -> jax.Array:
    return T[..., :3, 3]


def _calc_W(w: jax.Array, sigma: jax.Array) -> jax.Array:
    """The Sim(3) 'W' matrix such that t = W v (sophus rxso3/sim3 style).

    W = A I + B Omega + C Omega^2 with Taylor-guarded A, B, C coefficients
    depending on (theta, sigma).

    Differentiation-safe (double-where discipline): theta comes from the
    POLYNOMIAL theta2 = w.w (never linalg.norm, whose tangent at 0 is NaN),
    every guarded branch divides only by `safe_*` quantities, and unselected
    branches stay finite in both value and tangent so jacfwd/jacrev through
    exp/log (pose-graph LM) never poisons with NaN.
    """
    theta2 = jnp.sum(w * w, axis=-1)
    small_theta = theta2 < _EPS * _EPS
    safe_theta2 = jnp.where(small_theta, 1.0, theta2)
    safe_theta = jnp.sqrt(safe_theta2)
    Omega = so3.hat(w)
    Omega2 = _mm(Omega, Omega)
    s = jnp.exp(sigma)

    small_sigma = jnp.abs(sigma) < _EPS
    safe_sigma = jnp.where(small_sigma, 1.0, sigma)
    sigma2 = sigma * sigma
    safe_sigma2 = jnp.where(small_sigma, 1.0, sigma2)

    # C = (s - 1) / sigma, Taylor: 1 + sigma/2.
    C = jnp.where(small_sigma, 1.0 + sigma / 2.0, (s - 1.0) / safe_sigma)

    cos_t = jnp.cos(safe_theta)
    sin_t = jnp.sin(safe_theta)

    # Branches (following the Sophus case analysis):
    # sigma small, theta small:    Taylor in both
    # sigma small, theta generic:  A = (theta - sin)/theta^3, B = (1-cos)/theta^2
    # sigma generic, theta small:  Taylor in theta with sigma exact
    # sigma generic, theta generic: full closed form.
    B_s0 = jnp.where(
        small_theta,
        0.5 - theta2 / 24.0,
        (1.0 - cos_t) / safe_theta2,
    )
    A_s0 = jnp.where(
        small_theta,
        1.0 / 6.0 - theta2 / 120.0,
        (safe_theta - sin_t) / (safe_theta2 * safe_theta),
    )

    denom_g = jnp.where(small_sigma, 1.0, sigma2 + theta2)
    B_g_t0 = ((sigma - 1.0) * s + 1.0) / safe_sigma2
    A_g_t0 = (
        (0.5 * sigma2 - sigma + 1.0) * s - 1.0 - 0.5 * sigma2
    ) / (safe_sigma2 * safe_sigma)
    a_gg = s * sin_t
    b_gg = s * cos_t
    B_gg = (a_gg * sigma + (1.0 - b_gg) * safe_theta) / (safe_theta * denom_g)
    A_gg = (
        C - ((b_gg - 1.0) * sigma + a_gg * safe_theta) / denom_g
    ) / safe_theta2

    B = jnp.where(small_sigma, B_s0, jnp.where(small_theta, B_g_t0, B_gg))
    A = jnp.where(small_sigma, A_s0, jnp.where(small_theta, A_g_t0, A_gg))

    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), Omega.shape)
    return (
        C[..., None, None] * eye
        + B[..., None, None] * Omega
        + A[..., None, None] * Omega2
    )


def exp(xi: jax.Array) -> jax.Array:
    """Twist (..., 7) [v, w, sigma] -> Sim(3) matrix (..., 4, 4)."""
    v, w, sigma = xi[..., :3], xi[..., 3:6], xi[..., 6]
    R = so3.exp(w)
    s = jnp.exp(sigma)
    W = _calc_W(w, sigma)
    t = _einsum("...ij,...j->...i", W, v)
    return from_rst(R, s, t)


def log(T: jax.Array) -> jax.Array:
    """Sim(3) matrix -> twist (..., 7) [v, w, sigma]."""
    s = scale(T)
    sigma = jnp.log(s)
    R = T[..., :3, :3] / s[..., None, None]
    w = so3.log(R)
    W = _calc_W(w, sigma)
    v = jnp.linalg.solve(W, translation(T)[..., None])[..., 0]
    return jnp.concatenate([v, w, sigma[..., None]], axis=-1)


def inverse(T: jax.Array) -> jax.Array:
    s = scale(T)
    R = T[..., :3, :3] / s[..., None, None]
    Rt = jnp.swapaxes(R, -1, -2)
    t = translation(T)
    s_inv = 1.0 / s
    t_inv = -s_inv[..., None] * _einsum("...ij,...j->...i", Rt, t)
    return from_rst(Rt, s_inv, t_inv)


def compose(Ta: jax.Array, Tb: jax.Array) -> jax.Array:
    return _mm(Ta, Tb)


def apply(T: jax.Array, p: jax.Array) -> jax.Array:
    return _einsum("...ij,...j->...i", T[..., :3, :3], p) + translation(T)
