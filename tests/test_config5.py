"""BASELINE config #5 composed end-to-end on the 8-device CPU mesh:
landmark-sharded FastSLAM1 over a (p, l) mesh on a 10k-landmark synthetic
map -> problem_from_run -> solve_ba_sharded over the same devices.

The reference's analog chain is sim -> estimator -> smoothing
(fastslam1wrapper.cpp:32-109); here the whole thing is one mesh program.
"""

import numpy as np
import pytest

from slam_tpu.runtime.config5 import config5_setup, run_config5


@pytest.mark.slow
def test_config5_pipeline_composes_on_cpu_mesh():
    r = run_config5(n_particles=64, mesh_shape=(4, 2),
                    n_landmarks=10_000, capacity=256,
                    n_supersteps=16, ba_iters=8)
    assert r.n_keyframes == 16
    assert r.n_landmarks_map == 10_000
    # The trajectory must instantiate a real subset of the map and the
    # BA stage must keep (or improve) the filter's accuracy.
    assert r.n_landmarks_observed > 50
    assert r.ate_refined < max(2.0 * r.ate_filter, 0.15)
    assert r.ba_iters >= 1


@pytest.mark.slow
def test_config5_sharded_ba_matches_single_chip():
    """The padded, landmark-sharded solve on the composed problem must
    agree with the replicated single-chip solver (same LM schedule);
    L=9981-ish is deliberately not a multiple of 8 to exercise the
    padding path."""
    import jax
    from jax.sharding import Mesh
    from slam_tpu.parallel.landmarks import (LandmarkShardedFastSlam1,
                                             make_mesh_2d)
    from slam_tpu.posegraph import problem_from_run
    from slam_tpu.posegraph.ba import solve_ba
    from slam_tpu.posegraph.distributed import solve_ba_sharded
    from slam_tpu.runtime import Runner

    cfg, slam_map = config5_setup(10_000, capacity=256)
    est = LandmarkShardedFastSlam1(cfg, slam_map.n_landmarks,
                                   make_mesh_2d(4, 2), n_particles=64)
    runner = Runner(cfg, slam_map, "FASTSLAM1", estimator=est,
                    n_particles=64)
    result = runner.run(seed=3, n_ticks=16 * cfg.steps_per_observe)
    prob = problem_from_run(result, cfg, slam_map)
    assert prob.L % 8 != 0  # padding path must actually engage

    mesh = Mesh(np.asarray(jax.devices()[:8]), ("l",))
    p_sh, l_sh = solve_ba_sharded(prob, mesh, iters=6, damping=1e-4)
    p_1c, l_1c = solve_ba(prob, iters=6, damping=1e-4)
    np.testing.assert_allclose(np.asarray(p_sh), np.asarray(p_1c),
                               atol=5e-3)
    assert l_sh.shape == prob.landmarks0.shape
    # Landmark agreement where observed (unobserved rows are damped
    # no-ops in both solvers and stay at their init).
    np.testing.assert_allclose(np.asarray(l_sh), np.asarray(l_1c),
                               atol=5e-2)
