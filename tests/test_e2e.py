"""End-to-end seeded replays: every method x map must stay within an ATE
bound (the BASELINE.md acceptance criterion; statistical, not
trace-identical, per SURVEY.md §7 hard-part e — the RNG is threefry, not
the reference's std::rand Box-Muller)."""

import numpy as np
import pytest

from slam_tpu.config import SlamConfig
from slam_tpu.maps import read_map_file
from slam_tpu.runtime import Runner, compute_metrics, write_report

DATA = "/root/reference/data"

# (method, map, n_particles, n_ticks, ate_bound_m)
CASES = [
    ("EKF1", "example_loop1", None, 2400, 1.0),
    ("FASTSLAM1", "example_loop1", 60, 2400, 1.5),
    ("FASTSLAM2", "example_loop1", 60, 2400, 1.0),
    ("EKF1", "example_webmap", None, 2400, 3.0),
    ("FASTSLAM1", "example_webmap", 60, 2400, 4.0),
    ("FASTSLAM2", "example_webmap", 60, 2400, 4.0),
    ("FASTSLAM2", "example_loop2", 60, 2400, 1.0),
    ("EKF1", "example_loop2", None, 2400, 1.0),
    ("FASTSLAM1", "example_loop902", 60, 2400, 2.0),
    ("EKF1", "example_loop902", None, 1600, 2.0),
]


@pytest.mark.parametrize("method,mapname,n_particles,n_ticks,bound", CASES)
def test_ate_within_bound(method, mapname, n_particles, n_ticks, bound):
    slam_map = read_map_file(f"{DATA}/{mapname}.mat")
    cfg = SlamConfig.from_ini(f"{DATA}/{mapname}.ini")
    runner = Runner(cfg, slam_map, method, n_particles=n_particles)
    result = runner.run(seed=7, n_ticks=n_ticks)
    m = compute_metrics(result)
    assert np.isfinite(m.ate_rmse), f"{method}/{mapname}: non-finite ATE"
    assert m.ate_rmse < bound, (
        f"{method}/{mapname}: ATE {m.ate_rmse:.3f} m >= bound {bound}")
    # The run must actually do SLAM: landmarks were mapped.
    assert int(result.final_state.n) > 0


def test_deterministic_replay():
    """Same seed -> identical trajectory (SWITCH_SEED_RANDOM semantics,
    slamwrapper.cpp:48-52, with jax.random keys)."""
    slam_map = read_map_file(f"{DATA}/example_loop1.mat")
    cfg = SlamConfig.from_ini(f"{DATA}/example_loop1.ini")
    r1 = Runner(cfg, slam_map, "FASTSLAM1", n_particles=30).run(
        seed=5, n_ticks=800)
    r2 = Runner(cfg, slam_map, "FASTSLAM1", n_particles=30).run(
        seed=5, n_ticks=800)
    np.testing.assert_array_equal(r1.est_pose, r2.est_pose)
    np.testing.assert_array_equal(r1.true_pose, r2.true_pose)


def test_write_report(tmp_path):
    slam_map = read_map_file(f"{DATA}/example_loop1.mat")
    cfg = SlamConfig.from_ini(f"{DATA}/example_loop1.ini")
    result = Runner(cfg, slam_map, "EKF1").run(seed=1, n_ticks=400)
    out = write_report(result, "sim_test", str(tmp_path))
    import os
    for f in ("results.txt", "errors.txt", "times.txt", "positions.txt",
              "observedCounts.txt", "averageLengthLandmark.txt"):
        assert os.path.exists(os.path.join(out, f)), f
    errors = np.loadtxt(os.path.join(out, "errors.txt"))
    pos = np.loadtxt(os.path.join(out, "positions.txt"), delimiter=",")
    assert errors.shape[0] == pos.shape[0]


def test_rbg_rng_impl_runs():
    """The fast-RNG path (rng_impl='rbg') produces a sane run."""
    slam_map = read_map_file(f"{DATA}/example_loop1.mat")
    cfg = SlamConfig.from_ini(f"{DATA}/example_loop1.ini")
    r = Runner(cfg, slam_map, "FASTSLAM1", n_particles=30,
               rng_impl="rbg").run(seed=5, n_ticks=800)
    m = compute_metrics(r)
    assert np.isfinite(m.ate_rmse) and m.ate_rmse < 3.0


def test_time_phases_smoke():
    from slam_tpu.runtime.profiling import time_phases
    slam_map = read_map_file(f"{DATA}/example_loop1.mat")
    cfg = SlamConfig.from_ini(f"{DATA}/example_loop1.ini")
    runner = Runner(cfg, slam_map, "FASTSLAM1", n_particles=16)
    t = time_phases(runner, iters=2)
    assert t["predict_tick_s"] > 0 and t["observe_update_s"] > 0
    assert t["steps_per_observe"] == cfg.steps_per_observe
