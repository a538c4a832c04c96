"""Particle resampling: stratified, log-space, sort-free.

Replaces the reference pipeline resampleParticles -> stratifiedResample ->
stratifiedRandom / cumulativeSum (core.cpp:718-824) with:

- log-space weight normalization (the reference's linear weights underflow
  at large particle counts);
- stratified positions u_i = (i + U_i)/N — exactly the reference's
  "deterministic interval midpoints + uniform dither of width 1/N"
  (core.cpp:751-769) without its off-by-one assert failure;
- O(N log N) searchsorted on a prefix sum instead of the reference's
  O(N^2) cumulativeSum (core.cpp:813-824) + linear merge;
- the reference's semantics: weights are normalized on every call, but
  particles are copied (and weights reset to uniform) only when
  ``do_resample`` and Neff < n_min (core.cpp:739-748).

Everything is fixed-shape and jittable; the sharded multi-chip variant
lives in slam_tpu.parallel.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def normalize_log_weights(logw):
    """Normalize so that sum(exp(logw)) == 1."""
    return logw - jax.scipy.special.logsumexp(logw, axis=-1, keepdims=True)


def effective_particles(logw):
    """Neff = 1 / sum(w^2) on normalized weights (core.cpp:780-788)."""
    logw = normalize_log_weights(logw)
    return jnp.exp(-jax.scipy.special.logsumexp(2.0 * logw, axis=-1))


def stratified_indices(key, logw, n_out: int | None = None):
    """Stratified resampling indices.

    Draw u_i = (i + U_i)/n_out with U_i ~ Uniform[0,1), then map each u_i
    to the particle whose cumulative normalized weight first exceeds it.
    Returns int32 [n_out] ancestor indices (non-decreasing).
    """
    n = logw.shape[-1]
    n_out = n if n_out is None else n_out
    w = jnp.exp(normalize_log_weights(logw))
    csum = jnp.cumsum(w, axis=-1)
    u = (jnp.arange(n_out, dtype=logw.dtype)
         + jax.random.uniform(key, (n_out,), dtype=logw.dtype)) / n_out
    idx = jnp.searchsorted(csum, u, side="right")
    return jnp.clip(idx, 0, n - 1).astype(jnp.int32)


def resample_particles(key, logw, n_min, do_resample: bool = True):
    """Full reference semantics (resampleParticles, core.cpp:718-749).

    Returns (ancestor_idx [N] int32, new_logw [N], resampled bool).
    When Neff >= n_min (or resampling disabled): identity ancestors and
    normalized weights. Otherwise: stratified ancestors and uniform
    weights. Gathering particle state by ``ancestor_idx`` is the caller's
    job (struct-of-arrays gather).
    """
    n = logw.shape[-1]
    logw_n = normalize_log_weights(logw)
    neff = jnp.exp(-jax.scipy.special.logsumexp(2.0 * logw_n, axis=-1))
    need = jnp.asarray(do_resample) & (neff < n_min)

    strat = stratified_indices(key, logw_n)
    identity = jnp.arange(n, dtype=jnp.int32)
    idx = jnp.where(need, strat, identity)
    uniform = jnp.full_like(logw_n, -jnp.log(jnp.float32(n)))
    new_logw = jnp.where(need, uniform, logw_n)
    return idx, new_logw, need
