"""Struct-of-arrays particle state shared by FastSLAM 1 and 2.

The reference keeps a ``vector<Particle>`` of objects, each with
dynamically-growing per-landmark Eigen vectors (Particle.h:44-50,
Particle.cpp:61-73) and walks them in sequential loops. Here the particle
set is one pytree of fixed-capacity arrays — the particle axis vmaps on a
single chip and shards across a device mesh (slam_tpu.parallel); landmark
growth is a masked write at a shared slot (the reference uses *known*
association for both FastSLAM variants — fastslam1wrapper.cpp:76-79,
fastslam2wrapper.cpp:86 — so all particles share one id->slot table).

Weights are log-space: the reference's linear weights
(fastslam1.cpp:108-117) underflow far below the 1M-particle target.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class ParticleState(NamedTuple):
    """Fixed-capacity Rao-Blackwellized particle set.

    ``logw``: [P] log weights. ``xv``: [P, 3] poses. ``Pv``: [P, 3, 3] pose
    covariances (FastSLAM2 proposal; zeros for FastSLAM1). ``lm``:
    [P, L, 2] landmark means. ``lm_P``: [P, L, 2, 2] landmark covariances.
    ``n``: scalar int32 live landmark count (shared across particles under
    known association). ``da_table``: [n_map] int32 id -> slot, -1 unseen.
    """
    logw: jnp.ndarray
    xv: jnp.ndarray
    Pv: jnp.ndarray
    lm: jnp.ndarray
    lm_P: jnp.ndarray
    n: jnp.ndarray
    da_table: jnp.ndarray

    @property
    def n_particles(self) -> int:
        return self.logw.shape[-1]

    @property
    def capacity(self) -> int:
        return self.lm.shape[-2]

    def lm_mask(self) -> jnp.ndarray:
        """[L] validity mask over landmark slots."""
        return jnp.arange(self.capacity) < self.n


def init_particles(n_particles: int, capacity: int, n_map_landmarks: int,
                   dtype=jnp.float32) -> ParticleState:
    """Uniform weights, origin poses, empty maps
    (ParticleSLAMWrapper::initializeParticles, ParticleSLAMWrapper.cpp:8-32)."""
    P = n_particles
    return ParticleState(
        logw=jnp.full((P,), -jnp.log(float(P)), dtype=dtype),
        xv=jnp.zeros((P, 3), dtype=dtype),
        Pv=jnp.zeros((P, 3, 3), dtype=dtype),
        lm=jnp.zeros((P, capacity, 2), dtype=dtype),
        lm_P=jnp.zeros((P, capacity, 2, 2), dtype=dtype),
        n=jnp.int32(0),
        da_table=jnp.full((n_map_landmarks,), -1, dtype=jnp.int32),
    )


def estimate_position(state: ParticleState) -> jnp.ndarray:
    """Pose estimate: weighted mean x/y + heading of the max-weight
    particle — the reference's default estimator uses the unweighted mean
    over x/y (ParticleSLAMWrapper::computeEstimatedPosition,
    ParticleSLAMWrapper.cpp:56-119); we use the weighted mean, which
    coincides right after resampling and is strictly more consistent
    between resamples. Heading comes from the max-weight particle, as in
    the reference."""
    w = jax.nn.softmax(state.logw)
    xy = jnp.sum(w[:, None] * state.xv[:, :2], axis=0)
    theta = state.xv[jnp.argmax(state.logw), 2]
    return jnp.concatenate([xy, theta[None]])


def gather_particles(state: ParticleState, idx) -> ParticleState:
    """Reindex the per-particle arrays by ancestor indices (the
    copy-and-keep step of resampleParticles, core.cpp:736-748)."""
    return state._replace(
        logw=state.logw[idx],
        xv=state.xv[idx],
        Pv=state.Pv[idx],
        lm=state.lm[idx],
        lm_P=state.lm_P[idx],
    )
