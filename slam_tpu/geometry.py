"""Geometry primitives shared by simulation, estimation and telemetry.

All functions are pure jnp and batch-friendly (work on any leading shape).

Reference counterparts:
- ``wrap_angle``       <- trigonometricOffset (core.cpp:460-477)
- ``transform_to_global`` (core.cpp:827-852)
- ``laser_lines``      <- makeLaserLines (core.cpp:330-355)
- ``covariance_ellipse`` <- makeCovarianceEllipse (core.cpp:358-380); the
  reference uses Eigen's dense matrix sqrt, here the closed-form 2x2
  PSD square root.
"""

from __future__ import annotations

import jax.numpy as jnp

TWO_PI = 2.0 * jnp.pi


def wrap_angle(ang):
    """Wrap angle(s) to [-pi, pi).

    The reference's trigonometricOffset (core.cpp:460-477) lands in
    [-pi, pi]; the half-open variant is branch-free and differs only on the
    measure-zero boundary, which is statistically irrelevant.
    """
    return jnp.mod(ang + jnp.pi, TWO_PI) - jnp.pi


def transform_to_global(points, pose):
    """Rotate+translate local points [..., 2] into the global frame of
    ``pose`` [3] = (x, y, theta) (core.cpp:827-852)."""
    c, s = jnp.cos(pose[2]), jnp.sin(pose[2])
    x = points[..., 0] * c - points[..., 1] * s + pose[0]
    y = points[..., 0] * s + points[..., 1] * c + pose[1]
    return jnp.stack([x, y], axis=-1)


def laser_lines(z, pose):
    """Observation rays for plotting: for each (range, bearing) row of
    ``z`` [K, 2], a segment from the pose to the observed point.
    Returns [K, 4] rows (x0, y0, x1, y1) (core.cpp:330-355)."""
    local = jnp.stack([z[..., 0] * jnp.cos(z[..., 1]),
                       z[..., 0] * jnp.sin(z[..., 1])], axis=-1)
    pts = transform_to_global(local, pose)
    origin = jnp.broadcast_to(pose[:2], pts.shape)
    return jnp.concatenate([origin, pts], axis=-1)


def sqrtm_2x2_psd(P):
    """Closed-form principal square root of symmetric PSD 2x2 matrices
    [..., 2, 2]. Replaces Eigen's unsupported MatrixFunctions sqrt
    (core.cpp:370) with the trace/determinant formula:
        sqrt(M) = (M + sqrt(det) I) / sqrt(trace + 2 sqrt(det))
    """
    a = P[..., 0, 0]
    b = P[..., 0, 1]
    c = P[..., 1, 1]
    det = jnp.maximum(a * c - b * b, 0.0)
    s = jnp.sqrt(det)
    tau = a + c
    t = jnp.sqrt(jnp.maximum(tau + 2.0 * s, 1e-30))
    eye = jnp.eye(2, dtype=P.dtype)
    return (P + s[..., None, None] * eye) / t[..., None, None]


def covariance_ellipse(center, P, n_segments: int = 16, scale: float = 2.0):
    """2-sigma covariance ellipse polyline for plotting
    (core.cpp:358-380): returns [n_segments+1, 2] points."""
    r = sqrtm_2x2_psd(P)
    phi = jnp.linspace(0.0, TWO_PI, n_segments + 1)
    circle = jnp.stack([jnp.cos(phi), jnp.sin(phi)], axis=-1)  # [S+1, 2]
    return center + scale * circle @ r.T
