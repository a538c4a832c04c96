"""Deferred-resample FastSLAM1 (kernel 5: fused resample+update) ==
the eager chain (update -> materialized resample gather), over multi-
superstep sequences with the Neff gate firing and skipping — the
permutation is applied one superstep late to the landmark planes, so
equality holds after finalize_deferred. Interpret mode on CPU; the
real compile is exercised by bench.py on TPU."""

import jax
import jax.numpy as jnp
import numpy as np

from slam_tpu.models import rbpf
from slam_tpu.models.fastslam1 import (
    DeferredState,
    finalize_deferred,
    fs1_update,
    fs1_update_deferred,
)
from slam_tpu.models.particles import init_particles

R = jnp.asarray(np.diag([0.01, 0.0003]).astype(np.float32))


def _mk_state(P, L, n_map, seed=0):
    rng = np.random.default_rng(seed)
    state = init_particles(P, L, n_map)
    return state._replace(
        xv=jnp.asarray(rng.normal(size=(3, P)).astype(np.float32) * 0.1))


def _obs_round(rng, n_map, K, t):
    """Observation batch for round t: a moving subset of map ids."""
    ids = np.sort(rng.choice(n_map, K, replace=False)).astype(np.int32)
    z = np.column_stack([rng.uniform(3, 8, K),
                         rng.uniform(-0.5, 0.5, K)]).astype(np.float32)
    zmask = rng.uniform(size=K) < 0.9
    return jnp.asarray(z), jnp.asarray(ids), jnp.asarray(zmask)


def _run_pair(P=1024, L=16, n_map=24, K=5, rounds=4, n_min_frac=0.99,
              lseg=None, seed=7):
    from slam_tpu.ops.pallas.kernels import identity_bounds_meta
    rng = np.random.default_rng(seed)
    state_e = _mk_state(P, L, n_map, seed=seed)
    lo, nch, ident = identity_bounds_meta(P)
    state_d = DeferredState(
        ps=state_e, S=jnp.arange(1, P + 1, dtype=jnp.int32),
        lo=lo, nch=nch, ident=ident)
    n_min = jnp.float32(n_min_frac * P)

    fired = 0
    for t in range(rounds):
        z, ids, zmask = _obs_round(rng, n_map, K, t)
        key = jax.random.key(100 + t)
        # Perturb poses so weights spread (drives the Neff gate).
        dxv = jnp.asarray(
            rng.normal(size=(3, P)).astype(np.float32) * 0.05)
        state_e = state_e._replace(xv=state_e.xv + dxv)
        state_d = state_d._replace(
            ps=state_d.ps._replace(xv=state_d.ps.xv + dxv))

        state_e = fs1_update(state_e, key, z, ids, zmask, R, n_min,
                             use_pallas=False)
        state_d = fs1_update_deferred(state_d, key, z, ids, zmask,
                                      R, n_min, interpret=True,
                                      lseg=lseg)
        # A firing resample resets the weights to exactly uniform.
        if np.allclose(np.asarray(state_e.logw), -np.log(P)):
            fired += 1

    final = finalize_deferred(state_d, interpret=True)
    return state_e, final, fired


def _assert_state_close(got, want):
    np.testing.assert_array_equal(int(got.n), int(want.n))
    np.testing.assert_array_equal(np.asarray(got.da_table),
                                  np.asarray(want.da_table))
    np.testing.assert_allclose(np.asarray(got.logw),
                               np.asarray(want.logw),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got.xv), np.asarray(want.xv),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got.lm), np.asarray(want.lm),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got.lm_P),
                               np.asarray(want.lm_P),
                               rtol=1e-3, atol=1e-5)


def test_deferred_matches_eager_with_resampling():
    """Gate fires on (nearly) every round: the deferred permutation
    path is exercised repeatedly, including back-to-back firings."""
    want, got, fired = _run_pair(n_min_frac=0.999, rounds=4)
    assert fired >= 2, f"resampling fired only {fired}x — weak test"
    _assert_state_close(got, want)


def test_deferred_matches_eager_no_resampling():
    """Gate never fires: every superstep takes the identity fast path."""
    want, got, fired = _run_pair(n_min_frac=0.0, rounds=3)
    _assert_state_close(got, want)


def test_deferred_segmented_matches_eager():
    """Multi-segment deferred kernel (lseg < L) with resampling."""
    want, got, fired = _run_pair(n_min_frac=0.999, rounds=3, lseg=4)
    assert fired >= 1
    _assert_state_close(got, want)


def test_fused_predict_deterministic_matches_jnp():
    """Kernel 6 with add_noise=False == T sequential jnp bicycle steps
    (the PRNG arm has no CPU lowering; its moments are checked on chip
    by tools/smoke_predict.py)."""
    from slam_tpu.models.rbpf import propagate_poses
    from slam_tpu.ops.pallas.kernels import fs1_predict_multi_tpu

    P, T = 512, 8
    rng = np.random.default_rng(3)
    xv = jnp.asarray(rng.normal(size=(3, P)).astype(np.float32))
    controls = jnp.asarray(
        np.column_stack([rng.uniform(1, 4, T),
                         rng.uniform(-0.3, 0.3, T)]).astype(np.float32))
    Q = jnp.asarray(np.diag([0.09, 0.0025]), jnp.float32)

    got = fs1_predict_multi_tpu(xv, jax.random.key(0), controls, Q,
                                wheelbase=4.0, dt=0.025,
                                add_noise=False, interpret=True)
    want = xv
    for t in range(T):
        want = propagate_poses(want, controls[t, 0], controls[t, 1],
                               4.0, 0.025)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_fs2_fused_predict_deterministic_matches_jnp():
    """Kernel 6 FS2 variant with add_noise=False == T sequential jnp
    fs2_predict steps (pose + packed-symmetric Pv propagation)."""
    from slam_tpu.models.fastslam2 import fs2_predict
    from slam_tpu.ops.pallas.kernels import fs2_predict_multi_tpu

    P, T = 512, 8
    rng = np.random.default_rng(5)
    state = init_particles(P, 4, 4)
    Pv = np.zeros((6, P), np.float32)
    Pv[0] = 0.02
    Pv[3] = 0.02
    Pv[5] = 0.01
    state = state._replace(
        xv=jnp.asarray(rng.normal(size=(3, P)).astype(np.float32)),
        Pv=jnp.asarray(Pv))
    controls = jnp.asarray(
        np.column_stack([rng.uniform(1, 4, T),
                         rng.uniform(-0.3, 0.3, T)]).astype(np.float32))
    Q = jnp.asarray(np.diag([0.09, 0.0025]), jnp.float32)

    got_xv, got_Pv = fs2_predict_multi_tpu(
        state.xv, state.Pv, jax.random.key(0), controls, Q,
        wheelbase=4.0, dt=0.025, add_noise=False, interpret=True)
    want = state
    for t in range(T):
        want = fs2_predict(want, jax.random.key(1), controls[t, 0],
                           controls[t, 1], Q, wheelbase=4.0, dt=0.025,
                           add_noise=False)
    np.testing.assert_allclose(np.asarray(got_xv),
                               np.asarray(want.xv), rtol=1e-5,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_Pv),
                               np.asarray(want.Pv), rtol=1e-4,
                               atol=1e-6)


def test_runner_deferred_matches_eager_end_to_end():
    """Full Runner integration on CPU: the deferred estimator (pair
    scan + donated args + interpret kernels, jnp predict) produces the
    SAME pose trace and final state as the eager estimator over a real
    sim run — the regression net for the scan-pairing and donation
    machinery around kernel 5."""
    from slam_tpu.config import SlamConfig
    from slam_tpu.maps import synthetic_map
    from slam_tpu.models.fastslam1 import FastSlam1Deferred
    from slam_tpu.runtime import Runner

    cfg = SlamConfig(SWITCH_HEADING_KNOWN=0, max_landmarks=16,
                     max_observations=8, NPARTICLES=1024,
                     NEFFECTIVE=768)
    slam_map = synthetic_map(16, 9, radius=40.0, seed=2)

    r_e = Runner(cfg, slam_map, "FASTSLAM1",
                 n_particles=1024).run(seed=3, n_ticks=200)
    est_d = FastSlam1Deferred(cfg, slam_map.n_landmarks,
                              interpret=True, fused_predict=False)
    r_d = Runner(cfg, slam_map, "FASTSLAM1", n_particles=1024,
                 estimator=est_d).run(seed=3, n_ticks=200)

    np.testing.assert_allclose(r_d.est_pose, r_e.est_pose,
                               rtol=1e-4, atol=1e-4)
    want = r_e.final_state
    got = est_d.finalize(r_d.final_state)
    np.testing.assert_allclose(np.asarray(got.lm),
                               np.asarray(want.lm),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(got.logw),
                               np.asarray(want.logw),
                               rtol=1e-4, atol=1e-5)
