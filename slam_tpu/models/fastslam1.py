"""FastSLAM 1.0 — RBPF with likelihood weighting (plane form).

TPU-first re-design of the reference FastSLAM1
(src/backend/algorithms/fastslam1.cpp): the per-particle loops become
plane arithmetic over the trailing particle axis; weights live in log
space; the per-landmark 2x2 EKFs run as one [K, P] batch (and, on TPU,
through the fused Pallas observation kernel).

Pipeline per observe tick (fastslam1wrapper.cpp:55-109):
  predict (noisy motion sample, forced on: fastslam1wrapper.cpp:20)
  -> optional per-particle heading observe (fastslam1.cpp:74-86)
  -> known data association (fastslam1wrapper.cpp:76-79)
  -> weight *= likelihood of matched obs (computeWeight, fastslam1.cpp:91-118)
  -> per-landmark feature EKF updates (core.cpp:132-175)
  -> new-feature initialization (core.cpp:479-509)
  -> Neff-gated stratified resampling (core.cpp:718-749)
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from slam_tpu.config import SlamConfig
from slam_tpu.models import rbpf
from slam_tpu.models.particles import (
    ParticleState,
    estimate_position,
    init_particles,
)
from slam_tpu.ops.planes import log_gauss2_planes


def fs1_predict(state: ParticleState, key, vn, gn, Q,
                *, wheelbase: float, dt: float, add_noise: bool = True
                ) -> ParticleState:
    """Sample per-particle controls and propagate poses
    (FastSLAM1::predictState, fastslam1.cpp:37-54). The FS1 wrapper forces
    noise on unconditionally (fastslam1wrapper.cpp:20)."""
    shp = rbpf.tile_shape(state.n_particles)
    V, G = rbpf.sample_controls(key, vn, gn, Q, shp, add_noise)
    xv = rbpf.propagate_poses(state.xv.reshape(3, *shp), V, G,
                              wheelbase, dt)
    return state._replace(xv=xv.reshape(3, state.n_particles))


def fs1_update(state: ParticleState, key, z, ids, zmask, R, n_min,
               *, do_resample: bool = True, use_pallas: bool = False,
               resample_fn=None) -> ParticleState:
    """Weight, per-landmark EKF update, new features, resample
    (FastSLAM1::update, fastslam1.cpp:18-35).

    ``use_pallas``: route the fused Jacobian+likelihood+feature-update
    through the TPU kernel (slam_tpu.ops.pallas). ``resample_fn(state,
    key, n_min)``: override for the sharded collective resampler."""
    assoc, is_new = rbpf.associate_known(state, ids, zmask)
    matched = assoc >= 0
    slot = jnp.where(matched, assoc, 0)

    if use_pallas:
        from slam_tpu.ops.pallas.kernels import (
            _fused_block,
            fs1_update_tpu,
        )
        if _fused_block(state.n_particles, state.capacity,
                        z.shape[0]) is not None:
            # Fully-fused single-pass update: weights + matched EKF +
            # new-feature planes in one aliased kernel; only the id
            # table / live count bookkeeping stays out here.
            L = state.capacity
            offset = (jnp.cumsum(is_new.astype(jnp.int32))
                      - is_new.astype(jnp.int32))
            slot_new = state.n + offset
            ok = is_new & (slot_new < L)
            state = fs1_update_tpu(state, z, slot, matched, slot_new,
                                   ok, R)
            table = state.da_table.at[
                jnp.where(ok, ids, state.da_table.shape[0])].set(
                slot_new, mode="drop")
            state = state._replace(
                n=state.n + jnp.sum(ok, dtype=jnp.int32),
                da_table=table)
            if resample_fn is not None:
                return resample_fn(state, key, n_min)
            return rbpf.resample(state, key, n_min, do_resample)
        from slam_tpu.ops.pallas import fs1_observe_tpu
        state = fs1_observe_tpu(state, z, slot, matched, R)
    else:
        # Batched Jacobians at every particle's pose for every matched
        # obs (the reference's per-particle computeJacobians loop,
        # fastslam1.cpp:91-118 -> core.cpp:666-713)...
        gathered = rbpf.gather_landmarks(state, slot)
        J, v0, v1 = rbpf.observe_planes(state, z, slot, R, gathered)
        # ...computeWeight: product over matched obs of N(v; 0, Sf) — a
        # masked log-sum (fastslam1.cpp:108-117 is linear-space and
        # underflows at scale)...
        logl = jnp.where(matched[:, None],
                         log_gauss2_planes(v0, v1, J.s00, J.s01, J.s11),
                         0.0)
        state = state._replace(logw=state.logw + jnp.sum(logl, axis=0))
        # ...then the per-landmark 2x2 EKF updates.
        state = rbpf.update_matched_features(state, slot, matched,
                                             v0, v1, J, gathered)

    state = rbpf.add_new_features(state, z, ids, is_new, R)
    if resample_fn is not None:
        return resample_fn(state, key, n_min)
    return rbpf.resample(state, key, n_min, do_resample)


def deferred_resample_bounds(logw, key, n_min, do_resample):
    """Neff-gated stratified resample DECISION as offspring bounds:
    returns (S [P] int32 — identity arange(1, P+1) when the gate does
    not fire — the per-block kernel metadata, the fired flag, and the
    new log-weights). The permutation encoded by S is NOT applied here;
    the landmark planes are permuted inside the next superstep's fused
    update kernel (fs1_resample_update_tpu), and the caller eagerly
    permutes only the small pose rows. The bounds computation and the
    metadata searchsorteds run under the gate's lax.cond — its operands
    are [P] vectors, so the conditional costs microseconds, unlike the
    round-4 resample cond whose landmark-plane operands copied
    2.5 ms/superstep (BENCH_NOTES)."""
    from slam_tpu.ops import resampling as rs
    from slam_tpu.ops.pallas.kernels import (
        deferred_bounds_meta,
        identity_bounds_meta,
    )

    n = logw.shape[-1]
    logw_n = rs.normalize_log_weights(logw)
    neff = jnp.exp(-jax.scipy.special.logsumexp(2.0 * logw_n, axis=-1))
    need = jnp.asarray(do_resample) & (neff < n_min)

    def fire():
        csum = rs._cumsum_2d(jnp.exp(logw_n))
        S = rs.offspring_bounds(key, csum, n)
        return (S,) + deferred_bounds_meta(S)

    def skip():
        return (jnp.arange(1, n + 1, dtype=jnp.int32),
                ) + identity_bounds_meta(n)

    S, lo, nch, ident = jax.lax.cond(need, fire, skip)
    uniform = jnp.full_like(logw_n, -jnp.log(jnp.float32(n)))
    return S, (lo, nch, ident), need, jnp.where(need, uniform, logw_n)


class DeferredState(NamedTuple):
    """FastSlam1Deferred carry: particle state whose landmark planes
    are PRE-permutation, plus the pending offspring bounds and their
    per-block kernel metadata."""
    ps: ParticleState
    S: jnp.ndarray      # [P] int32 pending offspring bounds
    lo: jnp.ndarray     # [nb] int32 window starts
    nch: jnp.ndarray    # [nb] int32 chunks per block
    ident: jnp.ndarray  # [nb] int32 identity-block flags


def fs1_update_deferred(dstate: DeferredState, key, z, ids, zmask, R,
                        n_min, *, do_resample: bool = True,
                        interpret: bool = False,
                        lseg: int | None = None) -> DeferredState:
    """FS1 observe update with DEFERRED resampling: the pending
    permutation from the previous superstep is applied to the landmark
    planes inside the fused update kernel's single state pass; this
    superstep's resample decision becomes the next pending bounds, with
    only the small pose rows permuted eagerly (they feed predict before
    the next update). Semantically equal to fs1_update followed by the
    eager gather, up to the one-superstep deferral of the landmark
    permutation (tests/test_deferred.py equality-checks full runs
    through finalize_deferred)."""
    from slam_tpu.ops.pallas.gather import bounds_gather_multi
    from slam_tpu.ops.pallas.kernels import fs1_resample_update_tpu

    state, S = dstate.ps, dstate.S
    assoc, is_new = rbpf.associate_known(state, ids, zmask)
    matched = assoc >= 0
    slot = jnp.where(matched, assoc, 0)
    L = state.capacity
    offset = (jnp.cumsum(is_new.astype(jnp.int32))
              - is_new.astype(jnp.int32))
    slot_new = state.n + offset
    ok = is_new & (slot_new < L)

    state = fs1_resample_update_tpu(state, S,
                                    (dstate.lo, dstate.nch,
                                     dstate.ident),
                                    z, slot, matched, slot_new, ok, R,
                                    lseg=lseg, interpret=interpret)
    table = state.da_table.at[
        jnp.where(ok, ids, state.da_table.shape[0])].set(
        slot_new, mode="drop")
    state = state._replace(n=state.n + jnp.sum(ok, dtype=jnp.int32),
                           da_table=table)

    # Same key discipline as the eager path (rbpf.resample consumes the
    # update key unsplit), so both paths draw the same stratified
    # dither and pick identical ancestors.
    S_next, meta, need, new_logw = deferred_resample_bounds(
        state.logw, key, n_min, do_resample)
    # Eager small-row permutation, fire supersteps only: the one-hot
    # gather's cost is per (block x chunk) — row-count independent —
    # so running it branchlessly on identity bounds cost a measured
    # 2.5 ms/superstep for 9 rows. The cond's [9, P] operands copy in
    # ~0.1 ms.
    # (512, 768) is the swept optimum for the bounds gather: per-visit
    # DMA latency dominates, and chunk > block makes nch == 1 for
    # nearly every block (round-5 on-chip sweep: 2.5 ms vs 3.9 at
    # (512,512), 5.5 at (1024,1024) for these 9 rows).
    small = jnp.concatenate([state.xv, state.Pv], axis=0)    # [9, P]
    small_g = jax.lax.cond(
        need,
        lambda sm: bounds_gather_multi([sm], S_next,
                                       interpret=interpret)[0],
        lambda sm: sm,
        small)
    state = state._replace(logw=new_logw, xv=small_g[:3],
                           Pv=small_g[3:9])
    return DeferredState(ps=state, S=S_next, lo=meta[0], nch=meta[1],
                         ident=meta[2])


def finalize_deferred(dstate: DeferredState,
                      interpret: bool = False) -> ParticleState:
    """Apply the pending landmark permutation (the pose rows are
    already permuted) — call once after the run to materialize the
    logical particle state."""
    from slam_tpu.ops.pallas.gather import bounds_gather_multi

    state, S = dstate.ps, dstate.S
    P = state.n_particles
    L = state.capacity
    lm_g, lmP_g = bounds_gather_multi(
        [state.lm.reshape(2 * L, P), state.lm_P.reshape(3 * L, P)],
        S, interpret=interpret)
    return state._replace(lm=lm_g.reshape(2, L, P),
                          lm_P=lmP_g.reshape(3, L, P))


class FastSlam1:
    """Config-bound FastSLAM 1.0 with jitted step functions."""

    # Fields the per-tick predict may modify (run-loop freeze hint).
    # FS1 never maintains a pose covariance (Pv starts zero and no FS1
    # path writes a nonzero value — the heading Joseph update is an
    # exact no-op at Pv == 0), so the freeze select skips Pv: at 1M
    # particles that is 48 MB/tick of pure select traffic.
    PREDICT_TOUCHED = ("xv",)

    def __init__(self, config: SlamConfig, n_map_landmarks: int,
                 use_pallas: bool | None = None):
        self.config = config
        self.n_map = n_map_landmarks
        # Capacity rounds up to a multiple of 8 (free: slots beyond
        # ``n`` are dead) so the resample gather kernel's reshaped
        # [2L, P]/[3L, P] views are sublane-aligned with no row pad.
        cap = config.max_landmarks or n_map_landmarks
        self.capacity = -(-cap // 8) * 8
        if use_pallas is None:
            use_pallas = jax.default_backend() == "tpu"
        self.use_pallas = use_pallas
        cfg = config
        self._predict = jax.jit(partial(
            fs1_predict, wheelbase=cfg.WHEELBASE, dt=cfg.DT_CONTROLS,
            add_noise=True))
        self._update = jax.jit(partial(
            fs1_update, do_resample=bool(cfg.SWITCH_RESAMPLE),
            use_pallas=use_pallas))
        self._observe_heading = jax.jit(rbpf.observe_heading_particles)

    def init(self, n_particles: int | None = None) -> ParticleState:
        n = n_particles or self.config.NPARTICLES
        return init_particles(n, self.capacity, self.n_map)

    def predict(self, state, key, vn, gn, phi_true) -> ParticleState:
        """Per control tick: noisy motion sample; under
        SWITCH_HEADING_KNOWN also a per-particle heading Joseph update
        against the TRUE heading (FastSLAM1::predict,
        fastslam1.cpp:57-65 — a no-op while Pv stays zero, as in the
        reference)."""
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

    def pose(self, state) -> jnp.ndarray:
        """Estimated pose from the particle cloud
        (computeEstimatedPosition, ParticleSLAMWrapper.cpp:56-119)."""
        return estimate_position(state, self.config.POSE_ESTIMATE)


class FastSlam1Deferred(FastSlam1):
    """FastSLAM 1.0 with the resample permutation of the landmark
    planes DEFERRED into the next superstep's fused kernel pass
    (fs1_update_deferred): per superstep the landmark state moves
    through HBM exactly once — the TPU-native replacement for the
    reference's copy-everything resample loop (resampleParticles,
    core.cpp:736-748) at large particle counts. Requires a TPU backend
    (or interpret=True for tests) and P % 512 == 0."""

    PREDICT_TOUCHED = ("xv",)
    # Run-loop hint: scan two supersteps per body so the non-aliased
    # deferred kernel's output lands back in the carry allocation
    # (A -> B -> A) instead of forcing a per-iteration carry copy.
    SCAN_PAIR = True

    def __init__(self, config: SlamConfig, n_map_landmarks: int,
                 interpret: bool = False, fused_predict: bool = True):
        super().__init__(config, n_map_landmarks, use_pallas=True)
        cfg = config
        self._interpret = interpret
        self._update_d = jax.jit(partial(
            fs1_update_deferred, do_resample=bool(cfg.SWITCH_RESAMPLE),
            interpret=interpret))
        if fused_predict and jax.default_backend() == "tpu":
            # All control ticks in one kernel pass (kernel 6). The
            # per-tick heading Joseph observe under
            # SWITCH_HEADING_KNOWN is an EXACT no-op for FS1 (Pv
            # starts zero and no FS1 path ever writes a nonzero
            # value — observe_heading_particles at Pv == 0 returns the
            # state unchanged), so skipping it here is lossless.
            from slam_tpu.ops.pallas.kernels import fs1_predict_multi_tpu
            Qe = jnp.diag(jnp.asarray(cfg.Qe, jnp.float32))

            def predict_multi(state, key, controls):
                xv = fs1_predict_multi_tpu(
                    state.ps.xv, key, controls, Qe,
                    wheelbase=cfg.WHEELBASE, dt=cfg.DT_CONTROLS,
                    add_noise=True)
                return state._replace(ps=state.ps._replace(xv=xv))

            self.predict_multi = jax.jit(predict_multi)

    def init(self, n_particles: int | None = None) -> DeferredState:
        from slam_tpu.ops.pallas.kernels import identity_bounds_meta
        ps = super().init(n_particles)
        P = ps.n_particles
        assert P % 512 == 0, \
            "deferred resampling needs kernel-tileable P"
        lo, nch, ident = identity_bounds_meta(P)
        return DeferredState(
            ps=ps, S=jnp.arange(1, P + 1, dtype=jnp.int32),
            lo=lo, nch=nch, ident=ident)

    def predict(self, state: DeferredState, key, vn, gn, phi_true
                ) -> DeferredState:
        return state._replace(
            ps=super().predict(state.ps, key, vn, gn, phi_true))

    def update(self, state: DeferredState, key, z, ids, zmask,
               phi=None) -> DeferredState:
        cfg = self.config
        n_min = cfg.NEFFECTIVE * state.ps.n_particles / cfg.NPARTICLES \
            if cfg.NPARTICLES else cfg.NEFFECTIVE
        return self._update_d(state, key, z, ids, zmask,
                              jnp.diag(jnp.asarray(cfg.Re, jnp.float32)),
                              jnp.float32(n_min))

    def pose(self, state: DeferredState) -> jnp.ndarray:
        return estimate_position(state.ps, self.config.POSE_ESTIMATE)

    def finalize(self, state: DeferredState) -> ParticleState:
        return finalize_deferred(state, interpret=self._interpret)
