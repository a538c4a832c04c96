import jax.numpy as jnp
import numpy as np

from slam_tpu.geometry import (
    covariance_ellipse,
    laser_lines,
    sqrtm_2x2_psd,
    transform_to_global,
    wrap_angle,
)


def test_wrap_angle_range():
    angs = np.linspace(-25.0, 25.0, 1001)
    wrapped = np.asarray(wrap_angle(jnp.asarray(angs)))
    assert np.all(wrapped >= -np.pi) and np.all(wrapped < np.pi)
    # wrap preserves the angle modulo 2pi
    np.testing.assert_allclose(np.sin(wrapped), np.sin(angs), atol=1e-5)
    np.testing.assert_allclose(np.cos(wrapped), np.cos(angs), atol=1e-5)


def test_wrap_angle_identity_inside():
    angs = np.linspace(-np.pi + 1e-3, np.pi - 1e-3, 101)
    np.testing.assert_allclose(
        np.asarray(wrap_angle(jnp.asarray(angs))), angs, atol=1e-6)


def test_transform_to_global():
    pose = jnp.array([1.0, 2.0, np.pi / 2])
    pts = jnp.array([[1.0, 0.0], [0.0, 1.0]])
    out = np.asarray(transform_to_global(pts, pose))
    np.testing.assert_allclose(out, [[1.0, 3.0], [0.0, 2.0]], atol=1e-6)


def test_laser_lines():
    pose = jnp.array([0.0, 0.0, 0.0])
    z = jnp.array([[2.0, 0.0], [1.0, np.pi / 2]])
    lines = np.asarray(laser_lines(z, pose))
    np.testing.assert_allclose(lines[0], [0, 0, 2, 0], atol=1e-6)
    np.testing.assert_allclose(lines[1], [0, 0, 0, 1], atol=1e-6)


def test_sqrtm_2x2():
    rng = np.random.default_rng(0)
    A = rng.normal(size=(50, 2, 2)).astype(np.float32)
    P = A @ np.swapaxes(A, -1, -2) + 0.1 * np.eye(2, dtype=np.float32)
    r = np.asarray(sqrtm_2x2_psd(jnp.asarray(P)))
    np.testing.assert_allclose(r @ np.swapaxes(r, -1, -2), P,
                               rtol=2e-3, atol=2e-3)


def test_covariance_ellipse_circle():
    pts = np.asarray(covariance_ellipse(jnp.zeros(2), jnp.eye(2)))
    radii = np.linalg.norm(pts, axis=-1)
    np.testing.assert_allclose(radii, 2.0, atol=1e-2)  # 2-sigma circle (f32)
    assert pts.shape == (17, 2)
