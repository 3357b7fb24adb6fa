"""Lie algebra unit tests: round-trips, group axioms, finite-difference checks.

Mirrors the validation style of Sophus's own num_diff.hpp (SURVEY.md §4) — the
reference itself ships no tests.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from uwslam_tpu.lie import se3, sim3, so3

KEY = jax.random.PRNGKey(0)


def rand_w(key, n=32, scale=1.0):
    """Random rotation vectors with |w| < pi (log returns principal values)."""
    k1, k2 = jax.random.split(key)
    axis = jax.random.normal(k1, (n, 3))
    axis = axis / jnp.linalg.norm(axis, axis=-1, keepdims=True)
    max_angle = min(3.1, 3.1 * scale)
    angle = jax.random.uniform(k2, (n, 1), minval=1e-6 * scale, maxval=max_angle)
    return axis * angle


class TestSO3:
    def test_exp_log_roundtrip(self):
        w = rand_w(KEY, scale=1.5)
        w2 = so3.log(so3.exp(w))
        np.testing.assert_allclose(w, w2, atol=5e-5)

    def test_small_angle(self):
        w = rand_w(KEY, scale=1e-8)
        R = so3.exp(w)
        np.testing.assert_allclose(R, np.tile(np.eye(3), (32, 1, 1)), atol=1e-6)
        assert not np.any(np.isnan(so3.log(R)))

    def test_near_pi(self):
        axes = jax.random.normal(KEY, (16, 3))
        axes = axes / jnp.linalg.norm(axes, axis=-1, keepdims=True)
        for angle in [np.pi - 1e-4, np.pi - 1e-6, np.pi]:
            w = axes * angle
            R = so3.exp(w)
            w2 = so3.log(R)
            # Angle preserved; axis preserved up to sign at exactly pi.
            np.testing.assert_allclose(
                jnp.linalg.norm(w2, axis=-1), angle, atol=1e-3
            )
            R2 = so3.exp(w2)
            np.testing.assert_allclose(R, R2, atol=1e-3)

    def test_orthogonality(self):
        R = so3.exp(rand_w(KEY))
        eye = jnp.swapaxes(R, -1, -2) @ R
        np.testing.assert_allclose(eye, np.tile(np.eye(3), (32, 1, 1)), atol=1e-5)
        np.testing.assert_allclose(jnp.linalg.det(R), 1.0, atol=1e-5)

    def test_compose_inverse(self):
        k1, k2 = jax.random.split(KEY)
        Ra, Rb = so3.exp(rand_w(k1)), so3.exp(rand_w(k2))
        np.testing.assert_allclose(
            so3.compose(Ra, so3.inverse(Ra)),
            np.tile(np.eye(3), (32, 1, 1)),
            atol=1e-5,
        )
        # exp(a)exp(b) != exp(a+b) in general but apply must be consistent.
        p = jax.random.normal(k2, (32, 3))
        np.testing.assert_allclose(
            so3.apply(so3.compose(Ra, Rb), p),
            so3.apply(Ra, so3.apply(Rb, p)),
            atol=1e-5,
        )

    def test_quaternion_roundtrip(self):
        R = so3.exp(rand_w(KEY, scale=2.0))
        q = so3.to_quaternion(R)
        R2 = so3.from_quaternion(q)
        np.testing.assert_allclose(R, R2, atol=1e-5)
        np.testing.assert_allclose(jnp.linalg.norm(q, axis=-1), 1.0, atol=1e-5)
        assert np.all(q[:, 0] >= 0)

    def test_left_jacobian_finite_diff(self):
        # d/dt exp((w + t*dw)) at t=0 = (J_l(w) dw)^ exp(w) (left convention).
        w = np.array([0.3, -0.2, 0.5], np.float32)
        dw = np.array([0.1, 0.05, -0.07], np.float32)
        eps = 1e-3
        Rp = so3.exp(jnp.asarray(w + eps * dw))
        Rm = so3.exp(jnp.asarray(w - eps * dw))
        dR = (Rp - Rm) / (2 * eps)
        J = so3.left_jacobian(jnp.asarray(w))
        expected = so3.hat(J @ jnp.asarray(dw)) @ so3.exp(jnp.asarray(w))
        np.testing.assert_allclose(dR, expected, atol=1e-3)

    def test_left_jacobian_inverse(self):
        w = rand_w(KEY, scale=1.0)
        J = so3.left_jacobian(w)
        Jinv = so3.left_jacobian_inverse(w)
        np.testing.assert_allclose(
            J @ Jinv, np.tile(np.eye(3), (32, 1, 1)), atol=1e-4
        )

    def test_interpolate_endpoints(self):
        k1, k2 = jax.random.split(KEY)
        Ra, Rb = so3.exp(rand_w(k1)), so3.exp(rand_w(k2))
        np.testing.assert_allclose(so3.interpolate(Ra, Rb, 0.0), Ra, atol=1e-5)
        np.testing.assert_allclose(so3.interpolate(Ra, Rb, 1.0), Rb, atol=1e-4)

    def test_jit_and_grad_safe(self):
        # Gradients through exp at zero must be finite (Taylor guards).
        g = jax.grad(lambda w: jnp.sum(so3.exp(w)))(jnp.zeros(3))
        assert np.all(np.isfinite(g))
        g2 = jax.jit(jax.grad(lambda w: jnp.sum(so3.exp(w) ** 2)))(
            jnp.array([1e-9, 0.0, 0.0])
        )
        assert np.all(np.isfinite(g2))


class TestSE3:
    def test_exp_log_roundtrip(self):
        xi = jax.random.normal(KEY, (32, 6)) * 0.6
        np.testing.assert_allclose(se3.log(se3.exp(xi)), xi, atol=1e-4)

    def test_identity(self):
        np.testing.assert_allclose(se3.exp(jnp.zeros(6)), np.eye(4), atol=1e-7)
        np.testing.assert_allclose(se3.log(jnp.eye(4)), np.zeros(6), atol=1e-7)

    def test_inverse(self):
        xi = jax.random.normal(KEY, (32, 6))
        T = se3.exp(xi)
        np.testing.assert_allclose(
            se3.compose(T, se3.inverse(T)), np.tile(np.eye(4), (32, 1, 1)),
            atol=1e-5,
        )

    def test_apply_matches_matrix(self):
        xi = jax.random.normal(KEY, (8, 6))
        T = se3.exp(xi)
        p = jax.random.normal(KEY, (8, 3))
        ph = jnp.concatenate([p, jnp.ones((8, 1))], axis=-1)
        expected = jnp.einsum("...ij,...j->...i", T, ph)[..., :3]
        np.testing.assert_allclose(se3.apply(T, p), expected, atol=1e-5)

    def test_adjoint(self):
        # Ad_T xi must satisfy: T exp(xi) T^-1 = exp(Ad_T xi).
        k1, k2 = jax.random.split(KEY)
        T = se3.exp(jax.random.normal(k1, (6,)) * 0.5)
        xi = jax.random.normal(k2, (6,)) * 0.1
        lhs = se3.compose(se3.compose(T, se3.exp(xi)), se3.inverse(T))
        rhs = se3.exp(se3.adjoint(T) @ xi)
        np.testing.assert_allclose(lhs, rhs, atol=1e-4)

    def test_right_update(self):
        T = se3.exp(jax.random.normal(KEY, (6,)))
        delta = jnp.full((6,), 1e-3)
        T2 = se3.right_update(T, delta)
        np.testing.assert_allclose(
            T2, se3.compose(T, se3.exp(delta)), atol=1e-5
        )

    def test_quaternion_translation_roundtrip(self):
        T = se3.exp(jax.random.normal(KEY, (16, 6)))
        q, t = se3.to_quaternion_translation(T)
        T2 = se3.from_quaternion_translation(q, t)
        np.testing.assert_allclose(T, T2, atol=1e-5)


class TestSim3:
    def test_exp_log_roundtrip(self):
        xi = jax.random.normal(KEY, (32, 7)) * 0.5
        np.testing.assert_allclose(sim3.log(sim3.exp(xi)), xi, atol=2e-4)

    def test_identity(self):
        np.testing.assert_allclose(sim3.exp(jnp.zeros(7)), np.eye(4), atol=1e-7)

    def test_scale_recovery(self):
        xi = jnp.array([0.1, -0.2, 0.3, 0.2, 0.1, -0.1, 0.7])
        T = sim3.exp(xi)
        np.testing.assert_allclose(sim3.scale(T), np.exp(0.7), rtol=1e-5)

    def test_inverse(self):
        xi = jax.random.normal(KEY, (16, 7)) * 0.5
        T = sim3.exp(xi)
        np.testing.assert_allclose(
            sim3.compose(T, sim3.inverse(T)),
            np.tile(np.eye(4), (16, 1, 1)),
            atol=1e-4,
        )

    def test_se3_embedding(self):
        # sigma = 0 reduces Sim(3) exp to SE(3) exp.
        xi6 = jax.random.normal(KEY, (8, 6))
        xi7 = jnp.concatenate([xi6, jnp.zeros((8, 1))], axis=-1)
        np.testing.assert_allclose(sim3.exp(xi7), se3.exp(xi6), atol=1e-5)


if __name__ == "__main__":
    pytest.main([__file__, "-x", "-q"])


class TestAutodiffSafety:
    """jacfwd through exp/log must be NaN-free at the singular points
    (identity, pure translation, pure scale) — pose-graph LM differentiates
    residuals that sit EXACTLY at identity when edges are consistent."""

    def test_so3_se3_sim3_log_exp_jacobians_finite(self):
        import jax
        import jax.numpy as jnp
        from uwslam_tpu.lie import se3, sim3, so3

        assert bool(jnp.isfinite(
            jax.jacfwd(lambda d: so3.log(so3.exp(d)))(jnp.zeros(3))).all())
        assert bool(jnp.isfinite(
            jax.jacfwd(lambda d: se3.log(se3.exp(d)))(jnp.zeros(6))).all())
        assert bool(jnp.isfinite(
            jax.jacfwd(lambda d: sim3.log(sim3.exp(d)))(jnp.zeros(7))).all())
        # Singular-direction anchors: pure translation / pure scale / generic.
        for x0 in (
            jnp.asarray([0.5, 0, 0, 0, 0, 0, 0.08]),   # theta=0, sigma!=0
            jnp.asarray([0.5, 0, 0, 0.2, 0, 0, 0.0]),  # theta!=0, sigma=0
            jnp.asarray([0.1, 0.05, -0.02, 0.01, 0.02, -0.03, 0.04]),
        ):
            J = jax.jacfwd(
                lambda d: sim3.log(sim3.compose(sim3.exp(x0), sim3.exp(d)))
            )(jnp.zeros(7))
            assert bool(jnp.isfinite(J).all()), x0
