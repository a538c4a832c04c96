"""Benchmark harness: SLAM steps/sec/chip on example_webmap.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Primary metric (BASELINE.md): SLAM steps (control ticks) per second per
chip, FASTSLAM1 on example_webmap with the reference default workload
(NPARTICLES=100). Secondary numbers (particles/sec at 1M, EKF and FS2
steps/s) go to stderr so the driver's one-line contract holds.

The baseline value is the reference C++ backend (single x86 core, ZMQ
stubbed out) measured on this machine — see tools/ref_baseline.py; the
reference repo publishes no numbers (SURVEY.md §6).
"""

from __future__ import annotations

import json
import os
import sys
import time

# Reference C++ backend steps/sec measured on this host (FASTSLAM1,
# example_webmap, 100 particles). Updated by tools/ref_baseline.py;
# fallback is a conservative estimate if the reference was never built.
BASELINE_FILE = os.path.join(os.path.dirname(__file__),
                             "ref_baseline.json")
DEFAULT_BASELINE_STEPS_PER_SEC = 10_000.0

DATA = "/root/reference/data"


def _log(*a):
    print(*a, file=sys.stderr, flush=True)


def load_workload():
    from slam_tpu.config import SlamConfig
    from slam_tpu.maps import read_map_file, synthetic_map

    mat = os.path.join(DATA, "example_webmap.mat")
    ini = os.path.join(DATA, "example_webmap.ini")
    if os.path.exists(mat):
        return SlamConfig.from_ini(ini), read_map_file(mat)
    _log("reference data not found; using synthetic webmap-like map")
    return SlamConfig(SWITCH_HEADING_KNOWN=0), synthetic_map(35, 17,
                                                             radius=100.0)


def bench_run(method: str, n_particles, n_ticks: int = 4000, seed=3):
    from slam_tpu.runtime import Runner, compute_metrics
    cfg, slam_map = load_workload()
    runner = Runner(cfg, slam_map, method, n_particles=n_particles)
    result = runner.run(seed=seed, n_ticks=n_ticks)
    m = compute_metrics(result)
    _log(f"{method} p={n_particles or cfg.NPARTICLES}: "
         f"{m.steps_per_second:,.0f} steps/s  ATE {m.ate_rmse:.3f} m  "
         f"compile {result.compile_seconds:.1f}s wall "
         f"{result.wall_seconds:.2f}s")
    return m


def bench_particle_throughput(n_particles=1_000_000, n_supersteps=8):
    """particles/sec at 1M particles: FS1 observation supersteps
    (8 predict ticks + weight/update/resample) on the webmap."""
    import jax
    from slam_tpu.runtime import Runner
    cfg, slam_map = load_workload()
    runner = Runner(cfg, slam_map, "FASTSLAM1", n_particles=n_particles)
    period = cfg.steps_per_observe
    n_ticks = n_supersteps * period
    try:
        result = runner.run(seed=3, n_ticks=n_ticks)
    except Exception as e:  # OOM etc.
        _log(f"1M-particle bench failed: {type(e).__name__}: {e}")
        return None
    ticks_per_sec = result.n_ticks / max(result.wall_seconds, 1e-9)
    pps = ticks_per_sec * n_particles
    _log(f"FASTSLAM1 p={n_particles:,}: {ticks_per_sec:,.1f} ticks/s "
         f"=> {pps:,.3g} particle-steps/s")
    return pps


def main():
    t0 = time.time()
    m = bench_run("FASTSLAM1", n_particles=100)
    try:
        bench_run("EKF1", None, n_ticks=2000)
        bench_run("FASTSLAM2", n_particles=100, n_ticks=2000)
        bench_particle_throughput()
    except Exception as e:
        _log(f"secondary benches failed: {type(e).__name__}: {e}")

    baseline = DEFAULT_BASELINE_STEPS_PER_SEC
    if os.path.exists(BASELINE_FILE):
        with open(BASELINE_FILE) as fh:
            baseline = float(json.load(fh).get(
                "fastslam1_webmap_100p_steps_per_sec", baseline))

    _log(f"total bench time {time.time() - t0:.1f}s")
    print(json.dumps({
        "metric": "slam_steps_per_sec_chip_webmap_fastslam1_100p",
        "value": round(m.steps_per_second, 1),
        "unit": "steps/s",
        "vs_baseline": round(m.steps_per_second / baseline, 3),
    }))


if __name__ == "__main__":
    main()
