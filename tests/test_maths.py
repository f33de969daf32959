"""Unit tests for dxk_tpu.core.maths against analytic results and numpy.

These mirror the semantics of the reference engine's math library
(/root/reference/src/core/math.h, math.cpp).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dxk_tpu.core import maths as m

jax.config.update("jax_enable_x64", False)


def rand_quat(rng, shape=()):
    q = rng.normal(size=(*shape, 4)).astype(np.float32)
    return q / np.linalg.norm(q, axis=-1, keepdims=True)


class TestQuat:
    def test_identity_rotation(self):
        v = jnp.array([1.0, 2.0, 3.0])
        assert np.allclose(m.quat_rotate(m.QUAT_IDENTITY, v), v)

    def test_axis_angle_90deg(self):
        q = m.quat_from_axis_angle(jnp.array([0.0, 0.0, 1.0]), jnp.pi / 2)
        v = m.quat_rotate(q, jnp.array([1.0, 0.0, 0.0]))
        assert np.allclose(v, [0.0, 1.0, 0.0], atol=1e-6)

    def test_mul_composition(self):
        rng = np.random.default_rng(0)
        a, b = rand_quat(rng), rand_quat(rng)
        v = rng.normal(size=3).astype(np.float32)
        lhs = m.quat_rotate(m.quat_mul(a, b), v)
        rhs = m.quat_rotate(a, m.quat_rotate(b, v))
        assert np.allclose(lhs, rhs, atol=1e-5)

    def test_rotate_matches_mat3(self):
        rng = np.random.default_rng(1)
        q = rand_quat(rng, (32,))
        v = rng.normal(size=(32, 3)).astype(np.float32)
        r1 = m.quat_rotate(q, v)
        r2 = m.mat3_vec(m.quat_to_mat3(q), v)
        assert np.allclose(r1, r2, atol=1e-5)

    def test_conjugate_inverse(self):
        rng = np.random.default_rng(2)
        q = rand_quat(rng, (8,))
        v = rng.normal(size=(8, 3)).astype(np.float32)
        assert np.allclose(m.quat_rotate(m.quat_conj(q), m.quat_rotate(q, v)), v, atol=1e-5)

    def test_rotate_from_to(self):
        rng = np.random.default_rng(3)
        a = rng.normal(size=(64, 3)).astype(np.float32)
        b = rng.normal(size=(64, 3)).astype(np.float32)
        q = m.rotate_from_to(a, b)
        got = m.quat_rotate(q, m.normalize(jnp.asarray(a)))
        want = m.normalize(jnp.asarray(b))
        assert np.allclose(got, want, atol=1e-4)

    def test_rotate_from_to_antiparallel(self):
        a = jnp.array([0.0, 1.0, 0.0])
        q = m.rotate_from_to(a, -a)
        assert np.allclose(m.quat_rotate(q, a), -a, atol=1e-5)

    def test_rotate_from_to_parallel(self):
        a = jnp.array([0.3, -0.4, 0.7])
        q = m.rotate_from_to(a, a * 2.0)
        assert np.allclose(q, m.QUAT_IDENTITY, atol=1e-5)

    def test_axis_rotation_roundtrip(self):
        axis = m.normalize(jnp.array([1.0, 2.0, -0.5]))
        angle = jnp.float32(0.8)
        q = m.quat_from_axis_angle(axis, angle)
        got_axis, got_angle = m.get_axis_rotation(q)
        assert np.allclose(got_axis, axis, atol=1e-5)
        assert np.allclose(got_angle, angle, atol=1e-5)

    def test_twist_swing(self):
        # Compose a known twist (about x) and swing (about z); decompose back.
        twist_axis = jnp.array([1.0, 0.0, 0.0])
        tw = m.quat_from_axis_angle(twist_axis, 0.5)
        sw = m.quat_from_axis_angle(jnp.array([0.0, 0.0, 1.0]), 0.3)
        q = m.quat_mul(sw, tw)  # q = swing * twist
        twist, swing = m.twist_swing_decompose(q, twist_axis)
        assert np.allclose(twist, tw, atol=1e-5)
        assert np.allclose(swing, sw, atol=1e-5)


class TestLinear:
    def test_solve_2x2(self):
        A = jnp.array([[3.0, 1.0], [1.0, 2.0]])
        b = jnp.array([5.0, 5.0])
        x = m.solve_2x2(A, b)
        assert np.allclose(A @ x, b, atol=1e-5)

    def test_solve_3x3(self):
        rng = np.random.default_rng(4)
        A = rng.normal(size=(16, 3, 3)).astype(np.float32)
        A = A @ np.swapaxes(A, -1, -2) + 3 * np.eye(3, dtype=np.float32)
        b = rng.normal(size=(16, 3)).astype(np.float32)
        x = m.solve_3x3(jnp.asarray(A), jnp.asarray(b))
        assert np.allclose(np.einsum("bij,bj->bi", A, np.asarray(x)), b, atol=1e-3)

    def test_solve_singular_returns_zero_scale(self):
        A = jnp.zeros((3, 3))
        b = jnp.array([1.0, 2.0, 3.0])
        x = m.solve_3x3(A, b)
        assert np.all(np.isfinite(np.asarray(x)))

    def test_skew(self):
        r = jnp.array([1.0, 2.0, 3.0])
        v = jnp.array([-0.5, 0.7, 0.2])
        assert np.allclose(m.mat3_vec(m.skew(r), v), jnp.cross(r, v), atol=1e-6)


class TestTangents:
    def test_orthonormal(self):
        rng = np.random.default_rng(5)
        n = m.normalize(jnp.asarray(rng.normal(size=(128, 3)).astype(np.float32)))
        t, b = m.get_tangents(n)
        assert np.allclose(m.dot(n, t), 0, atol=1e-5)
        assert np.allclose(m.dot(n, b), 0, atol=1e-5)
        assert np.allclose(m.dot(t, b), 0, atol=1e-5)
        assert np.allclose(m.length(t), 1, atol=1e-5)

    def test_noz(self):
        assert np.allclose(m.noz(jnp.zeros(3)), 0.0)
        assert np.allclose(m.noz(jnp.array([2.0, 0.0, 0.0])), [1.0, 0.0, 0.0])


class TestTransforms:
    def test_roundtrip(self):
        rng = np.random.default_rng(6)
        q = rand_quat(rng)
        pos = rng.normal(size=3).astype(np.float32)
        p = rng.normal(size=3).astype(np.float32)
        g = m.transform_position(pos, q, p)
        back = m.inverse_transform_position(pos, q, g)
        assert np.allclose(back, p, atol=1e-5)

    def test_angle_wrap(self):
        assert np.allclose(m.angle_to_npi_pi(jnp.float32(3 * np.pi)), -np.pi, atol=1e-5) or \
               np.allclose(m.angle_to_npi_pi(jnp.float32(3 * np.pi)), np.pi, atol=1e-5)
        assert np.allclose(m.angle_to_npi_pi(jnp.float32(0.5)), 0.5, atol=1e-6)


if __name__ == "__main__":
    pytest.main([__file__, "-x", "-q"])
