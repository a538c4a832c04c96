"""End-to-end seeded replays: every method x map must stay within an ATE
bound anchored to the MEASURED reference ATE (ref_baseline.json, produced
by tools/ref_baseline.py running the real C++ backend with its position
errors accumulated exactly as DataGatherer.cpp:103-115 does). Statistical,
not trace-identical, per SURVEY.md §7 hard-part e — the RNG is threefry,
not the reference's std::rand Box-Muller."""

import json
import os

import numpy as np
import pytest

from slam_tpu.config import SlamConfig
from slam_tpu.maps import read_map_file
from slam_tpu.runtime import Runner, compute_metrics, write_report

DATA = "/root/reference/data"
# Reference ATE x margin. The margin absorbs: different RNG stream,
# truncated runs (vs the reference's full 12k-34k ticks), and 60
# particles vs the reference's 100. The reference anchor is the RMSE
# over 6 seeds of the real C++ backend (tools/ref_baseline.py); rows
# whose per-seed spread is intrinsically large assert a seed-averaged
# RMSE instead of a single draw — same estimator quality bar, far lower
# flake variance.
#
# Per-row margins are set so the MEASURED headroom (bound / measured
# seed-averaged ATE, CPU, 2026-08) is >= 2x on every row — i.e. a
# failure signals a real regression, not noise. Rows above 2.0 are
# justified by measurement, not convenience:
#   - FASTSLAM1/webmap 3.0: heading-unknown drift regime; the REFERENCE
#     itself spreads 0.25-1.27 m over 10 seeds, and our 3-seed RMSE
#     (0.98 m) sits inside that spread vs its 6-seed anchor 0.749 m.
#   - EKF1/loop2 2.2: parity row — ours 0.216 m vs reference 0.205 m
#     (within 5%); a 2.0 margin would leave only 1.9x headroom on a
#     quality gap that does not exist.
MARGIN = 2.0

# (method, map, n_particles, n_ticks, seeds, margin)
CASES = [
    ("EKF1", "example_loop1", None, 2400, (7,), 2.0),
    ("FASTSLAM1", "example_loop1", 60, 2400, (7,), 2.0),
    ("FASTSLAM2", "example_loop1", 60, 4800, (7, 11, 23), 2.0),
    ("EKF1", "example_webmap", None, 2400, (7,), 2.0),
    ("FASTSLAM1", "example_webmap", 60, 2400, (7, 11, 23), 3.0),
    ("FASTSLAM2", "example_webmap", 60, 2400, (7, 11, 23), 2.0),
    ("FASTSLAM2", "example_loop2", 60, 4800, (7, 11, 23), 2.0),
    ("EKF1", "example_loop2", None, 4800, (7, 11, 23), 2.2),
    ("FASTSLAM1", "example_loop902", 60, 2400, (7,), 2.0),
    ("EKF1", "example_loop902", None, 1600, (7,), 2.0),
]


@pytest.fixture(scope="module")
def ref_baseline():
    path = os.path.join(os.path.dirname(__file__), os.pardir,
                        "ref_baseline.json")
    if not os.path.exists(path):
        pytest.skip("ref_baseline.json absent — run tools/ref_baseline.py "
                    "to measure the reference C++ backend first")
    with open(path) as f:
        return json.load(f)


def ref_ate(ref, method: str, mapname: str) -> float:
    key = {"EKF1": "ekf1", "FASTSLAM1": "fastslam1",
           "FASTSLAM2": "fastslam2"}[method]
    return ref[f"ate_rmse_{key}_{mapname.replace('example_', '')}"]


@pytest.mark.parametrize(
    "method,mapname,n_particles,n_ticks,seeds,margin", CASES)
def test_ate_within_reference_bound(ref_baseline, method, mapname,
                                    n_particles, n_ticks, seeds,
                                    margin):
    slam_map = read_map_file(f"{DATA}/{mapname}.mat")
    cfg = SlamConfig.from_ini(f"{DATA}/{mapname}.ini")
    ates = []
    for seed in seeds:
        runner = Runner(cfg, slam_map, method, n_particles=n_particles)
        result = runner.run(seed=seed, n_ticks=n_ticks)
        m = compute_metrics(result)
        assert np.isfinite(m.ate_rmse), \
            f"{method}/{mapname}/seed={seed}: non-finite ATE"
        ates.append(m.ate_rmse)
    ate = float(np.sqrt(np.mean(np.square(ates))))
    ref = ref_ate(ref_baseline, method, mapname)
    bound = margin * ref
    assert ate < bound, (
        f"{method}/{mapname}: ATE {ate:.3f} m (seeds {list(seeds)}: "
        f"{[round(a, 3) for a in ates]}) >= {margin}x reference "
        f"({ref:.3f} m)")
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
