"""Shared Rao-Blackwellized particle filter building blocks.

Used by both FastSLAM 1 (slam_tpu.models.fastslam1) and FastSLAM 2
(slam_tpu.models.fastslam2). Everything operates on the whole particle set
at once — the reference's per-particle for-loops (fastslam1.cpp:21-32,
fastslam2.cpp:26-45) become batched array ops over the [P] axis, which
vmap/shard_map then distribute.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from slam_tpu.geometry import wrap_angle
from slam_tpu.models.particles import ParticleState, gather_particles
from slam_tpu.ops.kalman import add_feature_init, feature_update_2x2
from slam_tpu.ops.resampling import resample_particles


def sample_controls(key, vn, gn, Q, n_particles: int, add_noise):
    """Per-particle control sample ~ N((vn, gn), Q) (the multivariateGauss
    draw in predictState, fastslam1.cpp:37-54). Q is diagonal in every
    shipped config; we use the general 2x2 Cholesky anyway."""
    Q = jnp.asarray(Q, jnp.float32)
    L = jnp.linalg.cholesky(Q + 1e-20 * jnp.eye(2, dtype=Q.dtype))
    eps = jax.random.normal(key, (n_particles, 2), dtype=Q.dtype)
    noise = (L @ eps[..., None])[..., 0]
    noise = jnp.where(jnp.asarray(add_noise), noise, 0.0)
    return vn + noise[:, 0], gn + noise[:, 1]


def propagate_poses(xv, V, G, wheelbase: float, dt: float):
    """Batched bicycle step over particles (predictState,
    fastslam1.cpp:37-54 / fastslam2.cpp:70-105).

    DESIGN DECISION (SURVEY.md §7 hard-part d): the reference's particle
    predict uses ``sin(G / wheelBase)`` (fastslam1.cpp:52,
    fastslam2.cpp:103) while its own truth propagation and EKF use the
    correct ``sin(G) / wheelBase`` (core.cpp:38, ekfslam.cpp:76). We use
    the correct form everywhere: the estimator's motion model then matches
    the simulator's, which can only improve ATE.
    """
    theta = xv[:, 2]
    return jnp.stack([
        xv[:, 0] + V * dt * jnp.cos(G + theta),
        xv[:, 1] + V * dt * jnp.sin(G + theta),
        wrap_angle(theta + V * dt * jnp.sin(G) / wheelbase),
    ], axis=-1)


def observe_heading_particles(state: ParticleState, phi, sigma_phi
                              ) -> ParticleState:
    """Per-particle scalar heading Joseph update on (xv, Pv)
    (fastslam1.cpp:74-86; no-op while Pv == 0, exactly like the
    reference)."""
    r = sigma_phi * sigma_phi
    PHt = state.Pv[:, :, 2]                                   # [P, 3]
    s = state.Pv[:, 2, 2] + r                                 # [P]
    W = PHt / s[:, None]                                      # [P, 3]
    v = wrap_angle(phi - state.xv[:, 2])                      # [P]
    xv = state.xv + W * v[:, None]
    # Joseph: (I - W H) P (I - W H)^T + r W W^T with H = e3.
    C = jnp.broadcast_to(jnp.eye(3, dtype=state.Pv.dtype),
                         state.Pv.shape) - W[:, :, None] * _E3
    Pv = C @ state.Pv @ jnp.swapaxes(C, -1, -2) \
        + r * W[:, :, None] * W[:, None, :]
    xv = xv.at[:, 2].set(wrap_angle(xv[:, 2]))
    return state._replace(xv=xv, Pv=Pv)


_E3 = jnp.array([[0.0, 0.0, 1.0]], dtype=jnp.float32)


def associate_known(state: ParticleState, ids, zmask):
    """Shared id-table association (core.cpp:91-120): returns
    (slot [K] int32 with -1 for unmatched, is_new [K] bool)."""
    slot = state.da_table[jnp.clip(ids, 0, state.da_table.shape[0] - 1)]
    assoc = jnp.where(zmask & (slot >= 0), slot, -1)
    is_new = zmask & (slot < 0)
    return assoc, is_new


def update_matched_features(state: ParticleState, z, assoc, R,
                            zp, Hf, mask) -> ParticleState:
    """Per-landmark 2x2 EKF updates for all (particle, matched-obs) pairs
    in one batch, then masked scatter back (featureUpdate,
    core.cpp:132-175).

    ``zp``/``Hf``: [P, K, ...] predicted observations and Jacobians
    evaluated at each particle's pose; ``mask``: [K] matched mask.
    """
    slot = jnp.where(mask, assoc, 0)
    v = z[None, :, :] - zp
    v = v.at[..., 1].set(wrap_angle(v[..., 1]))

    xf = jnp.take_along_axis(state.lm, slot[None, :, None], axis=1)
    Pf = jnp.take_along_axis(
        state.lm_P, slot[None, :, None, None], axis=1)
    xf_new, Pf_new = feature_update_2x2(xf, Pf, v, jnp.asarray(R), Hf)

    # Masked scatter: unmatched slots write out of bounds and are dropped.
    L = state.capacity
    tgt = jnp.where(mask, slot, L)
    parr = jnp.arange(state.n_particles)[:, None]
    lm = state.lm.at[parr, tgt[None, :]].set(xf_new, mode="drop")
    lm_P = state.lm_P.at[parr, tgt[None, :]].set(Pf_new, mode="drop")
    return state._replace(lm=lm, lm_P=lm_P)


def add_new_features(state: ParticleState, z, ids, is_new, R
                     ) -> ParticleState:
    """Initialize new landmarks at shared slots for every particle from
    its own pose (addFeature, core.cpp:479-509)."""
    K = z.shape[0]
    L = state.capacity
    R = jnp.asarray(R, state.lm.dtype)

    offset = jnp.cumsum(is_new.astype(jnp.int32)) - is_new.astype(jnp.int32)
    slot = state.n + offset
    ok = is_new & (slot < L)
    tgt = jnp.where(ok, slot, L)                              # [K]

    # Per-particle initialization: [P, K, ...].
    zb = jnp.broadcast_to(z[None, :, :], (state.n_particles, K, 2))
    xf, Gz = add_feature_init(state.xv[:, None, :], zb)
    Pf = Gz @ R @ jnp.swapaxes(Gz, -1, -2)

    parr = jnp.arange(state.n_particles)[:, None]
    lm = state.lm.at[parr, tgt[None, :]].set(xf, mode="drop")
    lm_P = state.lm_P.at[parr, tgt[None, :]].set(Pf, mode="drop")

    n = state.n + jnp.sum(ok, dtype=jnp.int32)
    table = state.da_table.at[
        jnp.where(ok, ids, state.da_table.shape[0])].set(slot, mode="drop")
    return state._replace(lm=lm, lm_P=lm_P, n=n, da_table=table)


def resample(state: ParticleState, key, n_min, do_resample) -> ParticleState:
    """Neff-gated stratified resampling + ancestor gather
    (resampleParticles, core.cpp:718-749)."""
    idx, new_logw, _ = resample_particles(key, state.logw, n_min,
                                          do_resample)
    state = gather_particles(state, idx)
    return state._replace(logw=new_logw)
