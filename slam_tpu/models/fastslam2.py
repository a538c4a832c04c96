"""FastSLAM 2.0 — RBPF with the optimal (observation-driven) proposal.

TPU-first re-design of the reference FastSLAM2
(src/backend/algorithms/fastslam2.cpp). Structure per observe tick
(fastslam2wrapper.cpp:31-122, fastslam2.cpp:21-48):

  predict: pose + pose-covariance propagation
           Pv <- Gv Pv Gv' + Gu Q Gu'        (fastslam2.cpp:70-105)
  proposal refinement per matched feature (sequential, pose re-linearized
  after each feature, exactly like sampleProposal fastslam2.cpp:290-368):
           Pv <- (Hv' Sf^-1 Hv + Pv^-1)^-1
           xv <- xv + Pv Hv' Sf^-1 v
  sample xvs ~ N(xv, Pv); Pv <- 0
  w *= likelihood(z | xvs) * prior / proposal (log-space here;
           the reference's gaussEvaluate Cholesky+SVD dance,
           fastslam2.cpp:127-163, collapses to closed 2x2/3x3 forms)
  feature EKF updates + new features at the sampled pose
  Neff-gated stratified resampling

The whole particle axis is batched; the K-observation refinement loop is a
masked ``lax.fori_loop`` (static bound = max_obs), so one compiled program
serves every tick. The reference's MULTIPARTICLE_ACCELERATOR FPGA batch
(fastslam2.cpp:168-287) corresponds to the batched Jacobian+likelihood
evaluation here (and its Pallas kernel form in slam_tpu.ops.pallas).

A unified-path observation: with zero matched features the refinement loop
is an identity, so "sample from N(xv, Pv)" (the reference's new-only
branch, fastslam2.cpp:36-42) and the prior/proposal weight terms (which
cancel exactly) fall out of the same code path — no branching program.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from slam_tpu.config import SlamConfig
from slam_tpu.geometry import wrap_angle
from slam_tpu.models import rbpf
from slam_tpu.models.particles import ParticleState, estimate_position, init_particles
from slam_tpu.ops.gauss import log_gauss_2x2, log_gauss_3x3
from slam_tpu.ops.jacobians import compute_jacobians
from slam_tpu.ops.kalman import inv_2x2

_HIGHEST = jax.lax.Precision.HIGHEST
_PV_JITTER = 1e-9


def fs2_predict(state: ParticleState, key, vn, gn, Q,
                *, wheelbase: float, dt: float, add_noise: bool
                ) -> ParticleState:
    """Propagate poses and pose covariances (FastSLAM2::predictState,
    fastslam2.cpp:70-105). Control noise sampling is gated by
    SWITCH_PREDICT_NOISE (fastslam2wrapper.cpp:18)."""
    V, G = rbpf.sample_controls(key, vn, gn, Q, state.n_particles,
                                add_noise)
    theta = state.xv[:, 2]
    s, c = jnp.sin(G + theta), jnp.cos(G + theta)
    vts, vtc = V * dt * s, V * dt * c

    P = state.n_particles
    eye = jnp.broadcast_to(jnp.eye(3, dtype=state.Pv.dtype), (P, 3, 3))
    Gv = eye.at[:, 0, 2].set(-vts).at[:, 1, 2].set(vtc)
    sg, cg = jnp.sin(G), jnp.cos(G)
    Gu = jnp.stack([
        jnp.stack([dt * c, -vts], -1),
        jnp.stack([dt * s, vtc], -1),
        jnp.stack([dt * sg / wheelbase, V * dt * cg / wheelbase], -1),
    ], -2)                                                   # [P, 3, 2]
    Qm = jnp.asarray(Q, state.Pv.dtype)
    Pv = Gv @ state.Pv @ jnp.swapaxes(Gv, -1, -2) \
        + Gu @ Qm @ jnp.swapaxes(Gu, -1, -2)

    xv = rbpf.propagate_poses(state.xv, V, G, wheelbase, dt)
    return state._replace(xv=xv, Pv=Pv)


def _refine_proposal(xv, Pv, lm, lm_P, z, slot, matched, R):
    """Sequential per-feature Gaussian proposal refinement, batched over
    particles (sampleProposal core loop, fastslam2.cpp:321-357)."""
    K = z.shape[0]
    R = jnp.asarray(R, xv.dtype)
    eye3 = jnp.eye(3, dtype=xv.dtype)

    def body(k, carry):
        xv_c, Pv_c = carry
        s = slot[k]
        xf = lm[:, s]                                         # [P, 2]
        Pf = lm_P[:, s]                                       # [P, 2, 2]
        zp, Hv, _, Sf = compute_jacobians(xv_c, xf, Pf, R)
        Sfi = inv_2x2(0.5 * (Sf + jnp.swapaxes(Sf, -1, -2)))
        HtSi = jnp.einsum("pba,pbc->pac", Hv, Sfi,
                          precision=_HIGHEST)                 # [P, 3, 2]
        info = jnp.einsum("pac,pcb->pab", HtSi, Hv,
                          precision=_HIGHEST)                 # [P, 3, 3]
        Pv_inv = jnp.linalg.inv(Pv_c + _PV_JITTER * eye3)
        Pv_new = jnp.linalg.inv(info + Pv_inv)
        Pv_new = 0.5 * (Pv_new + jnp.swapaxes(Pv_new, -1, -2))

        v = z[k][None, :] - zp
        v = v.at[:, 1].set(wrap_angle(v[:, 1]))
        dx = jnp.einsum("pab,pbc,pc->pa", Pv_new, HtSi, v,
                        precision=_HIGHEST)
        xv_new = xv_c + dx
        xv_new = xv_new.at[:, 2].set(wrap_angle(xv_new[:, 2]))

        keep = matched[k]
        return (jnp.where(keep, xv_new, xv_c),
                jnp.where(keep, Pv_new, Pv_c))

    return jax.lax.fori_loop(0, K, body, (xv, Pv))


def _log_likelihood_given_pose(pose, lm, lm_P, z, slot, matched, R):
    """Sum over matched obs of log N(v; 0, Hf Pf Hf' + R) at the given
    poses (likelihoodGivenXv, fastslam2.cpp:370-400), batched [P, K]."""
    xf = jnp.take_along_axis(lm, slot[None, :, None], axis=1)
    Pf = jnp.take_along_axis(lm_P, slot[None, :, None, None], axis=1)
    zp, _, _, Sf = compute_jacobians(pose[:, None, :], xf, Pf,
                                     jnp.asarray(R, pose.dtype))
    v = z[None, :, :] - zp
    v = v.at[..., 1].set(wrap_angle(v[..., 1]))
    logl = jnp.where(matched[None, :], log_gauss_2x2(v, Sf), 0.0)
    return jnp.sum(logl, axis=1)


def fs2_update(state: ParticleState, key, z, ids, zmask, R, n_min,
               *, do_resample: bool = True,
               resample_fn=None) -> ParticleState:
    """Proposal sampling, weighting, map update, resampling
    (FastSLAM2::update, fastslam2.cpp:21-48).

    ``resample_fn(state, key, n_min)``: override for the sharded
    collective resampler (slam_tpu.parallel)."""
    assoc, is_new = rbpf.associate_known(state, ids, zmask)
    matched = assoc >= 0
    slot = jnp.where(matched, assoc, 0)
    any_obs = jnp.any(zmask)

    xv0, Pv0 = state.xv, state.Pv
    xv_r, Pv_r = _refine_proposal(xv0, Pv0, state.lm, state.lm_P,
                                  z, slot, matched, R)

    # Sample the proposal (multivariateGauss, fastslam2.cpp:353).
    key, sub = jax.random.split(key)
    eye3 = jnp.eye(3, dtype=xv_r.dtype)
    Lch = jnp.linalg.cholesky(Pv_r + _PV_JITTER * eye3)
    eps = jax.random.normal(sub, xv_r.shape, dtype=xv_r.dtype)
    xvs = xv_r + (Lch @ eps[..., None])[..., 0]
    xvs = xvs.at[:, 2].set(wrap_angle(xvs[:, 2]))
    xvs = jnp.where(any_obs, xvs, xv0)

    # Importance weight: likelihood * prior / proposal, in log space
    # (fastslam2.cpp:359-367).
    log_lik = _log_likelihood_given_pose(xvs, state.lm, state.lm_P,
                                         z, slot, matched, R)
    dp = xv0 - xvs
    dp = dp.at[:, 2].set(wrap_angle(dp[:, 2]))
    log_prior = log_gauss_3x3(dp, Pv0 + _PV_JITTER * eye3)
    dq = xv_r - xvs
    dq = dq.at[:, 2].set(wrap_angle(dq[:, 2]))
    log_prop = log_gauss_3x3(dq, Pv_r + _PV_JITTER * eye3)
    dlogw = jnp.where(any_obs, log_lik + log_prior - log_prop, 0.0)
    state = state._replace(
        logw=state.logw + dlogw,
        xv=xvs,
        Pv=jnp.where(any_obs, jnp.zeros_like(Pv0), Pv0),
    )

    # Map update at the sampled pose (featureUpdate + addFeature).
    xf = jnp.take_along_axis(state.lm, slot[None, :, None], axis=1)
    Pf = jnp.take_along_axis(state.lm_P, slot[None, :, None, None], axis=1)
    zp, _, Hf, _ = compute_jacobians(state.xv[:, None, :], xf, Pf,
                                     jnp.asarray(R, state.lm.dtype))
    state = rbpf.update_matched_features(state, z, assoc, R, zp, Hf,
                                         matched)
    state = rbpf.add_new_features(state, z, ids, is_new, R)
    if resample_fn is not None:
        return resample_fn(state, key, n_min)
    return rbpf.resample(state, key, n_min, do_resample)


class FastSlam2:
    """Config-bound FastSLAM 2.0 with jitted step functions."""

    def __init__(self, config: SlamConfig, n_map_landmarks: int):
        self.config = config
        self.n_map = n_map_landmarks
        self.capacity = config.max_landmarks or n_map_landmarks
        cfg = config
        self._predict = jax.jit(partial(
            fs2_predict, wheelbase=cfg.WHEELBASE, dt=cfg.DT_CONTROLS,
            add_noise=bool(cfg.SWITCH_PREDICT_NOISE)))
        self._update = jax.jit(partial(
            fs2_update, do_resample=bool(cfg.SWITCH_RESAMPLE)))
        self._observe_heading = jax.jit(rbpf.observe_heading_particles)

    def init(self, n_particles: int | None = None) -> ParticleState:
        n = n_particles or self.config.NPARTICLES
        return init_particles(n, self.capacity, self.n_map)

    def predict(self, state, key, vn, gn, phi_true) -> ParticleState:
        """Per control tick: pose + covariance propagation; under
        SWITCH_HEADING_KNOWN also a per-particle heading Joseph update
        against the TRUE heading (FastSLAM2::predict,
        fastslam2.cpp:50-60)."""
        state = self._predict(state, key, vn, gn,
                              jnp.diag(jnp.asarray(self.config.Qe,
                                                   jnp.float32)))
        if self.config.SWITCH_HEADING_KNOWN:
            state = self._observe_heading(state, phi_true,
                                          self.config.sigmaT)
        return state

    def update(self, state, key, z, ids, zmask, phi=None) -> ParticleState:
        cfg = self.config
        n_min = cfg.NEFFECTIVE * state.n_particles / cfg.NPARTICLES \
            if cfg.NPARTICLES else cfg.NEFFECTIVE
        return self._update(state, key, z, ids, zmask,
                            jnp.diag(jnp.asarray(cfg.Re, jnp.float32)),
                            jnp.float32(n_min))

    def pose(self, state) -> "jnp.ndarray":
        """Estimated pose from the particle cloud
        (computeEstimatedPosition, ParticleSLAMWrapper.cpp:56-119)."""
        return estimate_position(state)
