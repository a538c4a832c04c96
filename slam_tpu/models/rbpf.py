"""Shared Rao-Blackwellized particle filter building blocks (plane form).

Used by both FastSLAM 1 (slam_tpu.models.fastslam1) and FastSLAM 2
(slam_tpu.models.fastslam2). The reference's per-particle for-loops
(fastslam1.cpp:21-32, fastslam2.cpp:26-45) become batched plane arithmetic
over the trailing particle axis (TPU lanes) — see
slam_tpu.models.particles for the layout rationale — which vmap-free XLA
fuses into a few VPU loops and shard_map distributes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from slam_tpu.geometry import wrap_angle
from slam_tpu.models.particles import ParticleState, gather_particles
from slam_tpu.ops import planes as pk
from slam_tpu.ops.resampling import resample_particles

# Test hook: drive the TPU bounds-resample arm of ``resample`` in
# Pallas interpret mode on CPU (tests/test_models.py equality-checks
# it against the materialized-index path).
_FORCE_BOUNDS_INTERPRET = False


TILE_SUB = 8


def tile_shape(P: int):
    """Sublane-blocked particle shape [8, P/8] for full-width VPU
    tiles, or the flat (P,) when P doesn't tile.

    Per-tick predict math runs on sliced [1, P] planes whose T(1,128)
    layout uses one sublane in eight — measured 0.43 ms for a 1M-lane
    multiply-add chain that moves 4 MB (round-4 trace). Reshaping the
    trailing particle axis to [8, P/8] (a free row-major bitcast; the
    PRNG draws the same stream, counters are linear-index based) turns
    every elementwise op into full (8, 128) tiles."""
    for sub in (8, 4, 2):
        if P % (sub * 128) == 0:
            return (sub, P // sub)
    return (P,)


def sample_controls(key, vn, gn, Q, shape, add_noise):
    """Per-particle control sample ~ N((vn, gn), Q) (the multivariateGauss
    draw in predictState, fastslam1.cpp:37-54). Q is diagonal in every
    shipped config; the general 2x2 Cholesky costs nothing extra.
    ``shape``: particle-axis shape — (P,) or the blocked tile_shape."""
    if isinstance(shape, int):
        shape = (shape,)
    Q = jnp.asarray(Q, jnp.float32)
    L = jnp.linalg.cholesky(Q + 1e-20 * jnp.eye(2, dtype=Q.dtype))
    eps = jax.random.normal(key, (2,) + tuple(shape), dtype=Q.dtype)
    n0 = L[0, 0] * eps[0]
    n1 = L[1, 0] * eps[0] + L[1, 1] * eps[1]
    on = jnp.asarray(add_noise, Q.dtype)
    return vn + on * n0, gn + on * n1


def propagate_poses(xv, V, G, wheelbase: float, dt: float):
    """Batched bicycle step over particles (predictState,
    fastslam1.cpp:37-54 / fastslam2.cpp:70-105). ``xv``: [3, P].

    DESIGN DECISION (SURVEY.md §7 hard-part d): the reference's particle
    predict uses ``sin(G / wheelBase)`` (fastslam1.cpp:52,
    fastslam2.cpp:103) while its own truth propagation and EKF use the
    correct ``sin(G) / wheelBase`` (core.cpp:38, ekfslam.cpp:76). We use
    the correct form everywhere: the estimator's motion model then matches
    the simulator's, which can only improve ATE.
    """
    theta = xv[2]
    return jnp.stack([
        xv[0] + V * dt * jnp.cos(G + theta),
        xv[1] + V * dt * jnp.sin(G + theta),
        wrap_angle(theta + V * dt * jnp.sin(G) / wheelbase),
    ])


def observe_heading_particles(state: ParticleState, phi, sigma_phi
                              ) -> ParticleState:
    """Per-particle scalar heading Joseph update on (xv, Pv)
    (fastslam1.cpp:74-86; a no-op while Pv == 0, exactly like the
    reference). Packed-symmetric Joseph form, fully expanded."""
    P = state.n_particles
    shp = tile_shape(P)
    xv_b = state.xv.reshape(3, *shp)
    r = sigma_phi * sigma_phi
    a, b, c, d, e, f = state.Pv.reshape(6, *shp)
    s = f + r
    k0, k1, k2 = c / s, e / s, f / s
    v = wrap_angle(phi - xv_b[2])

    xv = jnp.stack([xv_b[0] + k0 * v,
                    xv_b[1] + k1 * v,
                    wrap_angle(xv_b[2] + k2 * v)])

    # P' = (I - K e3') P (I - K e3')' + r K K'.
    q2 = 1.0 - k2
    Pv = jnp.stack([
        a - 2.0 * k0 * c + k0 * k0 * f + r * k0 * k0,
        b - k0 * e - k1 * c + k0 * k1 * f + r * k0 * k1,
        q2 * (c - k0 * f) + r * k0 * k2,
        d - 2.0 * k1 * e + k1 * k1 * f + r * k1 * k1,
        q2 * (e - k1 * f) + r * k1 * k2,
        q2 * q2 * f + r * k2 * k2,
    ])
    return state._replace(xv=xv.reshape(3, P), Pv=Pv.reshape(6, P))


def associate_known(state: ParticleState, ids, zmask):
    """Shared id-table association (core.cpp:91-120): returns
    (assoc [K] int32 with -1 for unmatched, is_new [K] bool)."""
    slot = state.da_table[jnp.clip(ids, 0, state.da_table.shape[0] - 1)]
    assoc = jnp.where(zmask & (slot >= 0), slot, -1)
    is_new = zmask & (slot < 0)
    return assoc, is_new


def scatter_slots(planes, tgt, vals, valid):
    """Write ``vals`` [C, K, P] into landmark slots ``tgt`` [K] of
    ``planes`` [C, L, P], masked by ``valid`` [K].

    Not an XLA scatter: a one-hot contraction over K (slots are unique),
    which maps onto the MXU instead of TPU scatter's serialized
    dynamic-update loop. At 1M particles this is the difference between
    ~0.5 ms and tens of ms per observe. (Re-measured round 4: the
    row-granular ``.at[:, tgt, :].set(mode="drop")`` form lowers to a
    while-of-dynamic-update-slice at ~0.7 ms per 4 MB row — 9.6 ms per
    observe vs ~2.8 ms for this full-buffer rewrite.)"""
    L = planes.shape[1]
    sel = ((tgt[:, None] == jnp.arange(L)[None, :])
           & valid[:, None]).astype(planes.dtype)       # [K, L]
    hit = jnp.sum(sel, axis=0)                          # [L] in {0, 1}
    new = jnp.einsum("kl,ckp->clp", sel, vals,
                     precision=jax.lax.Precision.HIGHEST)
    return planes * (1.0 - hit)[None, :, None] + new


def gather_landmarks(state: ParticleState, slot):
    """Gather [K]-indexed landmark planes: returns (lmx, lmy, p00, p01,
    p11), each [K, P]."""
    lm = state.lm[:, slot, :]      # [2, K, P]
    lm_P = state.lm_P[:, slot, :]  # [3, K, P]
    return lm[0], lm[1], lm_P[0], lm_P[1], lm_P[2]


def observe_planes(state: ParticleState, z, slot, R, gathered=None):
    """Jacobian planes + wrapped innovations at each particle's pose for
    each (gathered) observation slot. Returns (J, v0 [K,P], v1 [K,P]).
    Pass ``gathered`` (from gather_landmarks) to reuse a prior gather."""
    if gathered is None:
        gathered = gather_landmarks(state, slot)
    lmx, lmy, p00, p01, p11 = gathered
    r00, r01, r11 = R[0, 0], R[0, 1], R[1, 1]
    J = pk.jacobians_planes(state.xv[0][None, :], state.xv[1][None, :],
                            state.xv[2][None, :],
                            lmx, lmy, p00, p01, p11, r00, r01, r11)
    v0 = z[:, 0][:, None] - J.zr
    v1 = wrap_angle(z[:, 1][:, None] - J.zb)
    return J, v0, v1


def update_matched_features(state: ParticleState, slot, matched,
                            v0, v1, J, gathered=None) -> ParticleState:
    """Per-landmark 2x2 EKF updates for all (particle, matched-obs) pairs,
    then masked scatter back (featureUpdate, core.cpp:132-175).

    ``slot``/``matched``: [K]; ``v0``/``v1``/``J`` planes: [K, P].
    """
    if gathered is None:
        gathered = gather_landmarks(state, slot)
    lmx, lmy, p00, p01, p11 = gathered
    upd = pk.feature_update_planes(lmx, lmy, p00, p01, p11, v0, v1, J)

    lm = scatter_slots(state.lm, slot,
                       jnp.stack([upd.nx, upd.ny]), matched)
    lm_P = scatter_slots(state.lm_P, slot,
                         jnp.stack([upd.np00, upd.np01, upd.np11]),
                         matched)
    return state._replace(lm=lm, lm_P=lm_P)


def add_new_features(state: ParticleState, z, ids, is_new, R
                     ) -> ParticleState:
    """Initialize new landmarks at shared slots for every particle from
    its own pose (addFeature, core.cpp:479-509)."""
    L = state.capacity
    R = jnp.asarray(R, state.lm.dtype)

    offset = jnp.cumsum(is_new.astype(jnp.int32)) - is_new.astype(jnp.int32)
    slot = state.n + offset
    ok = is_new & (slot < L)

    def do_add(state):
        nx, ny, p00, p01, p11 = pk.feature_init_planes(
            state.xv[0][None, :], state.xv[1][None, :],
            state.xv[2][None, :],
            z[:, 0][:, None], z[:, 1][:, None],
            R[0, 0], R[0, 1], R[1, 1])                        # [K, P]

        lm = scatter_slots(state.lm, slot, jnp.stack([nx, ny]), ok)
        lm_P = scatter_slots(state.lm_P, slot,
                             jnp.stack([p00, p01, p11]), ok)
        n = state.n + jnp.sum(ok, dtype=jnp.int32)
        table = state.da_table.at[
            jnp.where(ok, ids, state.da_table.shape[0])].set(
            slot, mode="drop")
        return state._replace(lm=lm, lm_P=lm_P, n=n, da_table=table)

    # New features only appear while the map is being discovered; once
    # the id table is complete this is a guaranteed no-op — the cond
    # skips the [K, P] initialization AND the full landmark-buffer
    # rewrite (~1.4 GB at 1M particles) on every later observe.
    return jax.lax.cond(jnp.any(ok), do_add, lambda s: s, state)


def resample(state: ParticleState, key, n_min, do_resample) -> ParticleState:
    """Neff-gated stratified resampling + ancestor gather
    (resampleParticles, core.cpp:718-749).

    The ancestor gather permutes the FULL particle state along the lane
    axis — at 1M particles that is ~GBs of cross-lane traffic — so it
    runs under lax.cond and is skipped entirely on the (common)
    Neff >= n_min ticks. On TPU (particle counts that tile the kernel
    blocks) the gather is driven directly by the offspring bounds —
    the ancestor index vector is never materialized (see
    gather_particles_bounds)."""
    from slam_tpu.ops import resampling as rs

    n = state.n_particles
    logw_n = rs.normalize_log_weights(state.logw)
    neff = jnp.exp(-jax.scipy.special.logsumexp(2.0 * logw_n, axis=-1))
    need = jnp.asarray(do_resample) & (neff < n_min)
    uniform = jnp.full_like(logw_n, -jnp.log(jnp.float32(n)))
    new_logw = jnp.where(need, uniform, logw_n)

    if ((jax.default_backend() == "tpu" or _FORCE_BOUNDS_INTERPRET)
            and n % 512 == 0):
        from slam_tpu.models.particles import gather_particles_bounds

        def do(s):
            csum = rs._cumsum_2d(jnp.exp(logw_n))
            S = rs.offspring_bounds(key, csum, n)
            return gather_particles_bounds(
                s, S, interpret=_FORCE_BOUNDS_INTERPRET)

        state = jax.lax.cond(need, do, lambda s: s, state)
    else:
        idx = jax.lax.cond(
            need,
            lambda: rs.stratified_indices(key, logw_n),
            lambda: jnp.arange(n, dtype=jnp.int32))
        state = jax.lax.cond(need,
                             lambda s: gather_particles(s, idx),
                             lambda s: s,
                             state)
    return state._replace(logw=new_logw)
