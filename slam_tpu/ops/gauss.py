"""Gaussian density evaluation and sampling.

Log-space closed forms replacing the reference's gaussEvaluate
(fastslam2.cpp:127-163, which Cholesky-factorizes then SVD-solves a 2x2!)
and the linear-space weight products of FastSLAM1 computeWeight
(fastslam1.cpp:108-117) that underflow at large particle counts. Weights in
slam_tpu are kept in log space throughout (SURVEY.md §7 design stance).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_LOG_2PI = jnp.log(2.0 * jnp.pi)


def log_gauss_2x2(v, S):
    """log N(v; 0, S) for 2-D innovations, batched.

    v: [..., 2], S: [..., 2, 2] symmetric PD.
    Closed form: -0.5 (v^T S^-1 v) - log(2 pi) - 0.5 log det S.
    """
    a, b = S[..., 0, 0], S[..., 0, 1]
    c, d = S[..., 1, 0], S[..., 1, 1]
    det = a * d - b * c
    det = jnp.maximum(det, 1e-30)
    v0, v1 = v[..., 0], v[..., 1]
    # v^T S^-1 v with the adjugate
    quad = (d * v0 * v0 - (b + c) * v0 * v1 + a * v1 * v1) / det
    return -0.5 * quad - _LOG_2PI - 0.5 * jnp.log(det)


def log_gauss_3x3(v, S):
    """log N(v; 0, S) for 3-D innovations (FastSLAM2 prior/proposal terms,
    fastslam2.cpp:359-367), batched via Cholesky."""
    L = jnp.linalg.cholesky(S)
    y = jax.scipy.linalg.solve_triangular(L, v[..., None], lower=True)[..., 0]
    quad = jnp.sum(y * y, axis=-1)
    logdet = 2.0 * jnp.sum(
        jnp.log(jnp.diagonal(L, axis1=-2, axis2=-1)), axis=-1)
    return -0.5 * quad - 1.5 * _LOG_2PI - 0.5 * logdet


def multivariate_gauss(key, x, P):
    """Sample N(x, P) (core.cpp:452-458: chol(P) @ randn + x), batched over
    leading axes of x/P with one key per call site."""
    L = jnp.linalg.cholesky(P)
    n = jax.random.normal(key, x.shape, dtype=x.dtype)
    return x + (L @ n[..., None])[..., 0]
