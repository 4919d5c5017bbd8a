import jax.numpy as jnp
import numpy as np
import pytest

from offline_raytracer_tpu.utils import math as m


def test_quat_rotate_matches_matrix():
    rs = np.random.RandomState(0)
    for _ in range(10):
        axis = rs.randn(3)
        axis /= np.linalg.norm(axis)
        ang = rs.uniform(-np.pi, np.pi)
        q = m.quat_from_axis_angle(jnp.asarray(axis, jnp.float32), ang)
        v = jnp.asarray(rs.randn(3), jnp.float32)
        got = m.quat_rotate(q, v)
        R = np.asarray(m.quat_to_matrix(q))
        np.testing.assert_allclose(np.asarray(got), R @ np.asarray(v), atol=1e-5)


def test_quat_mul_composes():
    q1 = m.quat_from_axis_angle(jnp.array([0.0, 0.0, 1.0]), 0.7)
    q2 = m.quat_from_axis_angle(jnp.array([0.0, 1.0, 0.0]), -0.4)
    v = jnp.array([0.3, -1.2, 0.5])
    lhs = m.quat_rotate(m.quat_mul(q1, q2), v)
    rhs = m.quat_rotate(q1, m.quat_rotate(q2, v))
    np.testing.assert_allclose(np.asarray(lhs), np.asarray(rhs), atol=1e-5)


def test_quat_180_about_tilted_axis():
    # the bunny instance quaternion from testscene.scn: w=0 => 180 degrees
    q = jnp.array([0.0, 0.707107, 0.707106, 0.0])
    v = jnp.array([1.0, 0.0, 0.0])
    out = m.quat_rotate(q, v)
    # 180° about (0,1,1)/sqrt2 maps x -> -x
    np.testing.assert_allclose(np.asarray(out), [-1.0, 0.0, 0.0], atol=1e-4)


def test_build_frame_orthonormal():
    rs = np.random.RandomState(1)
    n = rs.randn(128, 3).astype(np.float32)
    n /= np.linalg.norm(n, axis=-1, keepdims=True)
    # include the poles
    n[0] = [0, 0, 1]
    n[1] = [0, 0, -1]
    t, b = m.build_frame(jnp.asarray(n))
    t, b = np.asarray(t), np.asarray(b)
    np.testing.assert_allclose(np.sum(t * n, -1), 0, atol=1e-5)
    np.testing.assert_allclose(np.sum(b * n, -1), 0, atol=1e-5)
    np.testing.assert_allclose(np.sum(t * b, -1), 0, atol=1e-5)
    np.testing.assert_allclose(np.linalg.norm(t, axis=-1), 1, atol=1e-5)
    np.testing.assert_allclose(np.cross(t, b), n, atol=1e-5)  # right-handed


def test_frame_to_world_z_is_normal():
    n = jnp.asarray(np.array([[0.6, 0.0, 0.8]], np.float32))
    out = m.frame_to_world(jnp.array([[0.0, 0.0, 1.0]]), n)
    np.testing.assert_allclose(np.asarray(out), np.asarray(n), atol=1e-6)


def test_rotation_matrix_to_z():
    for axis in ([0, 0, 1], [0, 0, -1], [1, 0, 0], [0.3, -0.4, 0.2]):
        R = m.rotation_matrix_to_z(axis)
        a = np.asarray(axis, np.float64)
        a /= np.linalg.norm(a)
        np.testing.assert_allclose(R @ a, [0, 0, 1], atol=1e-5)
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-5)


def test_reflect():
    w = jnp.array([[0.6, 0.0, 0.8]])
    n = jnp.array([[0.0, 0.0, 1.0]])
    out = m.reflect(w, n)
    np.testing.assert_allclose(np.asarray(out), [[-0.6, 0.0, 0.8]], atol=1e-6)
