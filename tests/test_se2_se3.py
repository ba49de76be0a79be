"""Unit tests for SE(2)/SE(3) group ops against group axioms and each other."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from se2lam_tpu.ops import se2, se3


def rand_se2(rng, n=16):
    p = rng.uniform(-5, 5, (n, 3)).astype(np.float32)
    p[:, 2] = rng.uniform(-np.pi, np.pi, n)
    return jnp.asarray(p)


class TestSE2:
    def test_compose_inverse_identity(self, rng):
        a = rand_se2(rng)
        ident = se2.compose(a, se2.inv(a))
        np.testing.assert_allclose(np.asarray(ident), 0.0, atol=1e-4)

    def test_minus_is_inv_compose(self, rng):
        # a - b == b.inv() + a  (reference comment, src/Config.cpp:214)
        a, b = rand_se2(rng), rand_se2(rng)
        lhs = se2.minus(a, b)
        rhs = se2.compose(se2.inv(b), a)
        np.testing.assert_allclose(np.asarray(lhs), np.asarray(rhs), atol=1e-4)

    def test_associativity(self, rng):
        a, b, c = rand_se2(rng), rand_se2(rng), rand_se2(rng)
        lhs = se2.compose(se2.compose(a, b), c)
        rhs = se2.compose(a, se2.compose(b, c))
        np.testing.assert_allclose(np.asarray(lhs[:, :2]), np.asarray(rhs[:, :2]), atol=1e-3)
        dth = np.asarray(se2.normalize_angle(lhs[:, 2] - rhs[:, 2]))
        np.testing.assert_allclose(dth, 0.0, atol=1e-4)

    def test_se3_roundtrip(self, rng):
        a = rand_se2(rng)
        back = se2.from_se3(se2.to_se3(a))
        np.testing.assert_allclose(np.asarray(back), np.asarray(a), atol=1e-5)

    def test_matrix_consistency(self, rng):
        # composing in SE(2) == composing the 4x4 matrices
        a, b = rand_se2(rng), rand_se2(rng)
        mat = se2.to_se3(a) @ se2.to_se3(b)
        np.testing.assert_allclose(
            np.asarray(se2.to_se3(se2.compose(a, b))), np.asarray(mat), atol=1e-4
        )

    def test_normalize_angle(self):
        t = jnp.asarray([0.0, np.pi, -np.pi, 3 * np.pi, -7.5])
        n = np.asarray(se2.normalize_angle(t))
        assert np.all(n <= np.pi + 1e-6) and np.all(n >= -np.pi - 1e-6)
        np.testing.assert_allclose(np.cos(n), np.cos(np.asarray(t)), atol=1e-5)
        np.testing.assert_allclose(np.sin(n), np.sin(np.asarray(t)), atol=1e-5)


class TestSE3:
    def test_inv(self, rng):
        xi = jnp.asarray(rng.uniform(-1, 1, (8, 6)).astype(np.float32))
        T = se3.se3_exp(xi)
        ident = T @ se3.inv(T)
        np.testing.assert_allclose(
            np.asarray(ident), np.broadcast_to(np.eye(4), (8, 4, 4)), atol=1e-5
        )

    def test_exp_log_roundtrip(self, rng):
        xi = jnp.asarray(rng.uniform(-1.5, 1.5, (32, 6)).astype(np.float32))
        back = se3.se3_log(se3.se3_exp(xi))
        np.testing.assert_allclose(np.asarray(back), np.asarray(xi), atol=2e-4)

    def test_exp_small_angle(self):
        xi = jnp.asarray([[1e-9, -1e-9, 0, 1e-10, 0, -1e-10]], jnp.float32)
        T = se3.se3_exp(xi)
        assert np.isfinite(np.asarray(T)).all()

    def test_so3_orthonormal(self, rng):
        phi = jnp.asarray(rng.uniform(-2, 2, (16, 3)).astype(np.float32))
        R = se3.so3_exp(phi)
        RtR = np.asarray(jnp.swapaxes(R, -1, -2) @ R)
        np.testing.assert_allclose(RtR, np.broadcast_to(np.eye(3), (16, 3, 3)), atol=1e-5)

    def test_adjoint(self, rng):
        # Ad(T) xi == log(T exp(xi) T^-1) for small xi
        xi_T = jnp.asarray(rng.uniform(-0.5, 0.5, (6,)).astype(np.float32))
        T = se3.se3_exp(xi_T)
        xi = jnp.asarray(rng.uniform(-1e-3, 1e-3, (6,)).astype(np.float32))
        lhs = se3.adjoint(T) @ xi
        rhs = se3.se3_log(T @ se3.se3_exp(xi) @ se3.inv(T))
        np.testing.assert_allclose(np.asarray(lhs), np.asarray(rhs), atol=1e-5)

    def test_skew(self):
        v = jnp.asarray([1.0, 2.0, 3.0])
        w = jnp.asarray([0.5, -1.0, 2.0])
        np.testing.assert_allclose(
            np.asarray(se3.skew(v) @ w), np.cross(np.asarray(v), np.asarray(w)), atol=1e-6
        )
