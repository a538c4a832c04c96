"""Unit tests for the jnp estimation kernels against closed forms and
numpy oracles (the systematized DATA_DUMP idea, SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np

from slam_tpu.ops import (
    add_feature_init,
    cholesky_update,
    compute_jacobians,
    effective_particles,
    feature_update_2x2,
    joseph_update,
    normalize_log_weights,
    resample_particles,
    stratified_indices,
)
from slam_tpu.ops.kalman import innovation, inv_2x2


def _rand_psd(rng, n, d, scale=1.0):
    A = rng.normal(size=(n, d, d)).astype(np.float32) * scale
    return A @ np.swapaxes(A, -1, -2) + 0.1 * np.eye(d, dtype=np.float32)


# --- Jacobians -----------------------------------------------------------

def test_compute_jacobians_values(rng):
    """Check against a hand-computed numpy oracle of the reference math
    (core.cpp:666-713)."""
    n = 64
    xv = rng.normal(size=(n, 3)).astype(np.float32)
    xf = (xv[:, :2] + rng.normal(size=(n, 2)) * 10 + 1.0).astype(np.float32)
    Pf = _rand_psd(rng, n, 2, 0.3)
    R = np.diag([0.01, 0.0003]).astype(np.float32)

    zp, Hv, Hf, Sf = compute_jacobians(
        jnp.asarray(xv), jnp.asarray(xf), jnp.asarray(Pf), jnp.asarray(R))
    zp, Hv, Hf, Sf = map(np.asarray, (zp, Hv, Hf, Sf))

    dx = xf[:, 0] - xv[:, 0]
    dy = xf[:, 1] - xv[:, 1]
    d2 = dx**2 + dy**2
    d = np.sqrt(d2)

    np.testing.assert_allclose(zp[:, 0], d, rtol=1e-5)
    brg = np.arctan2(dy, dx) - xv[:, 2]
    np.testing.assert_allclose(np.sin(zp[:, 1]), np.sin(brg), atol=1e-5)
    np.testing.assert_allclose(np.cos(zp[:, 1]), np.cos(brg), atol=1e-5)

    Hv_ref = np.stack([
        np.stack([-dx / d, -dy / d, np.zeros(n)], -1),
        np.stack([dy / d2, -dx / d2, -np.ones(n)], -1)], -2)
    np.testing.assert_allclose(Hv, Hv_ref, rtol=1e-4, atol=1e-5)

    Hf_ref = np.stack([
        np.stack([dx / d, dy / d], -1),
        np.stack([-dy / d2, dx / d2], -1)], -2)
    np.testing.assert_allclose(Hf, Hf_ref, rtol=1e-4, atol=1e-5)

    Sf_ref = Hf_ref @ Pf @ np.swapaxes(Hf_ref, -1, -2) + R
    np.testing.assert_allclose(Sf, Sf_ref, rtol=1e-3, atol=1e-5)


def test_compute_jacobians_broadcast():
    """One pose against L landmarks, and [P, L] batches."""
    xv = jnp.array([1.0, 2.0, 0.3])
    xf = jnp.ones((5, 2)) * 7
    Pf = jnp.broadcast_to(jnp.eye(2) * 0.1, (5, 2, 2))
    R = jnp.eye(2) * 0.01
    zp, Hv, Hf, Sf = compute_jacobians(xv, xf, Pf, R)
    assert zp.shape == (5, 2) and Hv.shape == (5, 2, 3)

    xvP = jnp.broadcast_to(xv, (3, 1, 3))
    xfPL = jnp.broadcast_to(xf, (3, 5, 2))
    PfPL = jnp.broadcast_to(Pf, (3, 5, 2, 2))
    zp2, _, _, _ = compute_jacobians(xvP, xfPL, PfPL, R)
    assert zp2.shape == (3, 5, 2)
    np.testing.assert_allclose(np.asarray(zp2[0]), np.asarray(zp), atol=1e-6)


# --- Kalman updates ------------------------------------------------------

def test_joseph_update_scalar_heading():
    """Matches the textbook scalar Kalman update and keeps P symmetric
    (josephUpdate, core.cpp:294-317)."""
    rng = np.random.default_rng(1)
    P = _rand_psd(rng, 1, 3)[0]
    x = np.array([1.0, 2.0, 0.5], dtype=np.float32)
    H = np.array([0.0, 0.0, 1.0], dtype=np.float32)
    r = 0.01
    v = 0.2

    x2, P2 = joseph_update(jnp.asarray(x), jnp.asarray(P), v, r,
                           jnp.asarray(H))
    x2, P2 = np.asarray(x2), np.asarray(P2)

    S = P[2, 2] + r
    K = P[:, 2] / S
    np.testing.assert_allclose(x2, x + K * v, rtol=1e-5)
    C = np.eye(3) - np.outer(K, H)
    P_ref = C @ P @ C.T + r * np.outer(K, K)
    np.testing.assert_allclose(P2, P_ref, rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(P2, P2.T, atol=1e-7)


def test_cholesky_update_matches_textbook():
    rng = np.random.default_rng(2)
    N, M = 9, 4
    P = _rand_psd(rng, 1, N)[0]
    x = rng.normal(size=N).astype(np.float32)
    H = rng.normal(size=(M, N)).astype(np.float32)
    R = _rand_psd(rng, 1, M, 0.1)[0]
    v = rng.normal(size=M).astype(np.float32)

    x2, P2 = cholesky_update(*map(jnp.asarray, (x, P, v, R, H)))
    x2, P2 = np.asarray(x2), np.asarray(P2)

    S = H @ P @ H.T + R
    K = P @ H.T @ np.linalg.inv(S)
    np.testing.assert_allclose(x2, x + K @ v, rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(P2, P - K @ S @ K.T, rtol=1e-3, atol=1e-4)


def test_feature_update_2x2_matches_cholesky_update():
    """The closed-form 2x2 path agrees with the dense path it specializes
    (featureUpdate -> choleskyUpdate, core.cpp:132-175)."""
    rng = np.random.default_rng(3)
    n = 32
    Pf = _rand_psd(rng, n, 2, 0.5)
    xf = rng.normal(size=(n, 2)).astype(np.float32)
    Hf = rng.normal(size=(n, 2, 2)).astype(np.float32)
    R = np.diag([0.01, 0.0003]).astype(np.float32)
    v = (rng.normal(size=(n, 2)) * 0.1).astype(np.float32)

    xf2, Pf2 = feature_update_2x2(*map(jnp.asarray, (xf, Pf, v, R, Hf)))
    xf2, Pf2 = np.asarray(xf2), np.asarray(Pf2)

    for i in range(n):
        xr, Pr = cholesky_update(*map(jnp.asarray,
                                      (xf[i], Pf[i], v[i], R, Hf[i])))
        np.testing.assert_allclose(xf2[i], np.asarray(xr), rtol=1e-3,
                                   atol=1e-5)
        np.testing.assert_allclose(Pf2[i], np.asarray(Pr), rtol=2e-2,
                                   atol=1e-5)


def test_inv_2x2(rng):
    S = _rand_psd(rng, 20, 2)
    Si = np.asarray(inv_2x2(jnp.asarray(S)))
    np.testing.assert_allclose(Si @ S, np.broadcast_to(np.eye(2), S.shape),
                               atol=1e-4)


def test_add_feature_init():
    xv = jnp.array([1.0, 2.0, np.pi / 2])
    z = jnp.array([3.0, 0.0])  # straight ahead (+y in global)
    xf, Gz = add_feature_init(xv, z)
    np.testing.assert_allclose(np.asarray(xf), [1.0, 5.0], atol=1e-6)
    R = np.diag([0.01, 0.0003]).astype(np.float32)
    Pf = np.asarray(Gz) @ R @ np.asarray(Gz).T
    assert Pf.shape == (2, 2)
    # PSD
    assert np.all(np.linalg.eigvalsh(Pf) > 0)


def test_innovation_wraps_bearing():
    z = jnp.array([5.0, 3.1])
    zp = jnp.array([4.0, -3.1])
    v = np.asarray(innovation(z, zp))
    np.testing.assert_allclose(v[0], 1.0, atol=1e-6)
    assert abs(v[1]) < 0.2  # wrapped, not 6.2


# --- Gaussians -----------------------------------------------------------

def test_log_gauss2_planes_vs_numpy(rng):
    """Oracle for the live plane-form 2-D log-density (ops.planes), the
    weighting math FastSLAM1/2 actually run (fastslam2.cpp:127-163)."""
    from slam_tpu.ops.planes import log_gauss2_planes

    n = 50
    S = _rand_psd(rng, n, 2)
    v = rng.normal(size=(n, 2)).astype(np.float32)
    got = np.asarray(log_gauss2_planes(
        jnp.asarray(v[:, 0]), jnp.asarray(v[:, 1]),
        jnp.asarray(S[:, 0, 0]), jnp.asarray(S[:, 0, 1]),
        jnp.asarray(S[:, 1, 1])))
    for i in range(n):
        ref = (-0.5 * v[i] @ np.linalg.solve(S[i], v[i])
               - np.log(2 * np.pi) - 0.5 * np.log(np.linalg.det(S[i])))
        np.testing.assert_allclose(got[i], ref, rtol=1e-3, atol=1e-4)


# --- Resampling ----------------------------------------------------------

def test_normalize_log_weights():
    logw = jnp.array([0.0, 0.0, jnp.log(2.0)])
    w = np.exp(np.asarray(normalize_log_weights(logw)))
    np.testing.assert_allclose(w.sum(), 1.0, rtol=1e-6)
    np.testing.assert_allclose(w, [0.25, 0.25, 0.5], rtol=1e-5)


def test_effective_particles():
    # uniform weights -> Neff == N
    logw = jnp.zeros(100)
    np.testing.assert_allclose(float(effective_particles(logw)), 100.0,
                               rtol=1e-4)
    # one dominant particle -> Neff ~ 1
    logw = jnp.array([0.0] + [-30.0] * 99)
    assert float(effective_particles(logw)) < 1.01


def test_stratified_indices_proportional():
    """Ancestor counts approximate N*w_i (unbiasedness of stratified
    resampling)."""
    w = np.array([0.5, 0.3, 0.15, 0.05], dtype=np.float32)
    logw = jnp.log(jnp.asarray(w))
    counts = np.zeros(4)
    for i in range(200):
        idx = np.asarray(stratified_indices(jax.random.PRNGKey(i), logw,
                                            n_out=100))
        counts += np.bincount(idx, minlength=4)
    freq = counts / counts.sum()
    np.testing.assert_allclose(freq, w, atol=0.01)


def test_resample_particles_gate():
    """No resampling when Neff >= n_min; full reset when below
    (core.cpp:739-748)."""
    key = jax.random.PRNGKey(0)
    # Uniform weights: Neff = N = 8 >= 6 -> identity
    logw = jnp.zeros(8)
    idx, new_logw, did = resample_particles(key, logw, n_min=6)
    np.testing.assert_array_equal(np.asarray(idx), np.arange(8))
    assert not bool(did)
    np.testing.assert_allclose(np.asarray(new_logw), -np.log(8), rtol=1e-5)

    # Degenerate weights -> resample to the dominant ancestor + uniform w
    logw = jnp.array([0.0] + [-40.0] * 7)
    idx, new_logw, did = resample_particles(key, logw, n_min=6)
    assert bool(did)
    np.testing.assert_array_equal(np.asarray(idx), np.zeros(8))
    np.testing.assert_allclose(np.asarray(new_logw), -np.log(8), rtol=1e-5)


def test_resample_disabled():
    logw = jnp.array([0.0] + [-40.0] * 7)
    idx, _, did = resample_particles(jax.random.PRNGKey(0), logw, n_min=6,
                                     do_resample=False)
    assert not bool(did)
    np.testing.assert_array_equal(np.asarray(idx), np.arange(8))
