"""Streaming run loop with live GUI telemetry.

Replays the reference wrappers' per-tick plotting sequence
(configurePlot/addWaypointsAndLandmarks slamwrapper.cpp:94-139, the
per-iteration emission ekfslamwrapper.cpp:88-105 and the particle drawing
ParticleSLAMWrapper.cpp:34-54) against the compiled superstep program:
the estimator still runs as one XLA program per superstep; only the
telemetry hop is host-side.
"""

from __future__ import annotations

import time

import jax
import numpy as np

from slam_tpu.geometry import covariance_ellipse, laser_lines
from slam_tpu.models.ekf import EKFState
from slam_tpu.models.particles import ParticleState


def _configure_plot(plot, runner, sim_name):
    """Initial scene setup (SLAMWrapper::configurePlot,
    slamwrapper.cpp:94-110 + setPlotRange :141-172)."""
    ext = runner.map.extent()
    plot.set_plot_range(ext[0], ext[1], ext[2], ext[3])
    plot.set_simulation_name(sim_name)
    plot.set_car_size(runner.config.WHEELBASE, 0)
    plot.set_car_size(runner.config.WHEELBASE, 1)
    lm = runner.map.landmarks
    wp = runner.map.waypoints
    plot.set_landmarks(list(lm[:, 0]), list(lm[:, 1]))
    plot.set_waypoints(list(wp[:, 0]), list(wp[:, 1]))


def _emit_state(plot, est_state):
    """Estimator-specific overlays: particle clouds for FastSLAM
    (ParticleSLAMWrapper.cpp:34-54), covariance ellipses for the EKF
    (EKFSLAMWrapper::drawCovarianceEllipseLines,
    ekfslamwrapper.cpp:117-137)."""
    if isinstance(est_state, ParticleState):
        xv = np.asarray(est_state.xv)
        plot.set_particles(list(xv[0]), list(xv[1]))
        n = int(est_state.n)
        if n:
            lm = np.asarray(est_state.lm[:, :n, :])   # [2, n, P]
            plot.set_feature_particles(list(lm[0].reshape(-1)),
                                       list(lm[1].reshape(-1)))
    elif isinstance(est_state, EKFState):
        x = np.asarray(est_state.x)
        P = np.asarray(est_state.P)
        n = int(est_state.n)
        plot.cov_ellipse_add(n + 1)
        ell = covariance_ellipse(x[:2], P[:2, :2])
        plot.set_cov_ellipse(np.asarray(ell).T, 0)
        for j in range(n):
            o = 3 + 2 * j
            ell = covariance_ellipse(x[o:o + 2], P[o:o + 2, o:o + 2])
            plot.set_cov_ellipse(np.asarray(ell).T, j + 1)


def stream_run(runner, seed=0, n_ticks=None, plot=None,
               sim_name="simulation"):
    from slam_tpu.runtime.loop import RunResult

    cfg = runner.config
    period = cfg.steps_per_observe
    if n_ticks is None:
        n_ticks = runner.estimate_run_ticks()
    n_supersteps = n_ticks // period

    sim_state = runner.sim.init(seed=seed or cfg.SWITCH_SEED_RANDOM)
    est_state = runner.est.init(runner.n_particles)
    key = runner.sim.make_key(seed + 1)

    superstep = jax.jit(lambda c: runner._superstep(c, None))

    if plot is not None:
        _configure_plot(plot, runner, sim_name)

    outs = []
    carry = (sim_state, est_state, key)
    t_compile = time.perf_counter()
    compiled = superstep.lower(carry).compile()
    t0 = time.perf_counter()
    for _ in range(n_supersteps):
        it0 = time.perf_counter()
        carry, out = compiled(carry)
        out = jax.tree.map(np.asarray, jax.block_until_ready(out))
        outs.append(out)
        if plot is not None:
            (tp, ep, active, count, _rs, z, zmask, _ids, _odom) = out
            plot.add_true_position(tp[0], tp[1])
            plot.add_estimated_position(ep[0], ep[1])
            plot.set_car_true_position(tp[0], tp[1], tp[2])
            plot.set_car_estimated_position(ep[0], ep[1], ep[2])
            lines = laser_lines(z[zmask], tp)
            plot.set_laser_lines(np.asarray(lines).T)
            _emit_state(plot, carry[1])
            plot.loop_time(int(1e6 * (time.perf_counter() - it0)))
            plot.plot()
            if not bool(active):
                break
    wall = time.perf_counter() - t0
    if plot is not None:
        plot.end_plot()

    stacked = [np.stack([o[i] for o in outs]) for i in range(9)]
    return RunResult(
        true_pose=stacked[0], est_pose=stacked[1],
        active=stacked[2].astype(bool), obs_count=stacked[3],
        obs_range_sum=stacked[4], obs_z=stacked[5],
        obs_mask=stacked[6].astype(bool), obs_ids=stacked[7],
        odom=stacked[8],
        final_state=carry[1],
        n_ticks=len(outs) * period,
        wall_seconds=wall,
        compile_seconds=t0 - t_compile,
    )
