#!/usr/bin/env python3
"""Measure the reference C++ backend's steps/sec on this host.

The reference (matzipan/slam) publishes no benchmark numbers (SURVEY.md
§6); to make bench.py's ``vs_baseline`` meaningful, this script builds the
reference backend from /root/reference with its ZMQ telemetry stubbed to a
no-op (headers for libzmq are absent in this image; telemetry is also not
part of the compute being measured), runs each method on each map, and
records the per-turn loop times the backend itself measures
(slamwrapper.cpp:240-254) into ref_baseline.json.

Usage: python tools/ref_baseline.py [--ref /root/reference] [--out ref_baseline.json]
"""

from __future__ import annotations

import argparse
import json
import os
import re
import shutil
import subprocess
import sys
import tempfile

STUB_HEADER = """\
// Benchmark stub: telemetry replaced by an in-process DataGatherer
// equivalent (builds without libzmq headers). loopTime() accumulates
// per-turn wall time; plot() accumulates the per-turn Euclidean
// truth-vs-estimate position error EXACTLY as the GUI does
// (Controller.cpp:172-196 routes setCarTruePosition /
// setCarEstimatedPosition into DataGatherer and calls nextTurn() on
// every "plot" message; DataGatherer.cpp:103-115 takes
// sqrt((tx-ex)^2+(ty-ey)^2)). Stats print at endPlot().
#ifndef SLAM_GUI_NETWORKPLOT_H
#define SLAM_GUI_NETWORKPLOT_H
#include <Eigen/Dense>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <string>
#include <vector>
class NetworkPlot {
public:
    NetworkPlot() {}
    ~NetworkPlot() {}
    void setLandmarks(std::vector<double>&, std::vector<double>&) {}
    void setWaypoints(std::vector<double>&, std::vector<double>&) {}
    void setParticles(std::vector<double>&, std::vector<double>&) {}
    void setFeatureParticles(std::vector<double>&, std::vector<double>&) {}
    void setLaserLines(Eigen::MatrixXf&) {}
    void setCovEllipse(Eigen::MatrixXf&, int) {}
    void addTruePosition(double, double) {}
    void addEstimatedPosition(double, double) {}
    void setCarSize(double, uint32_t = 0) {}
    void setCarTruePosition(double x, double y, double) { tx = x; ty = y; }
    void setCarEstimatedPosition(double x, double y, double) { ex = x; ey = y; }
    void setPlotRange(double, double, double, double) {}
    void clear() {}
    void setSimulationName(std::string) {}
    void plot() {
        double e2 = (tx - ex) * (tx - ex) + (ty - ey) * (ty - ey);
        err_sum += std::sqrt(e2);
        err_sq_sum += e2;
        nerr++;
    }
    void endPlot() {
        double mean = turns ? total_us / (double)turns : 0.0;
        fprintf(stderr, "STUB_TIMES turns=%lu total_us=%.0f mean_us=%.3f\\n",
                (unsigned long)turns, total_us, mean);
        fprintf(stderr, "STUB_ERR n=%lu mean=%.6f rmse=%.6f\\n",
                (unsigned long)nerr,
                nerr ? err_sum / (double)nerr : 0.0,
                nerr ? std::sqrt(err_sq_sum / (double)nerr) : 0.0);
    }
    void setCurrentIteration(uint32_t) {}
    void covEllipseAdd(uint32_t) {}
    void loopTime(uint32_t t) { total_us += t; turns++; }
private:
    double total_us = 0;
    uint64_t turns = 0;
    double tx = 0, ty = 0, ex = 0, ey = 0;
    double err_sum = 0, err_sq_sum = 0;
    uint64_t nerr = 0;
};
#endif
"""


def build(ref: str, workdir: str) -> str:
    dst = os.path.join(workdir, "ref")
    shutil.copytree(ref, dst)
    with open(os.path.join(dst, "src/backend/plotting/NetworkPlot.h"),
              "w") as fh:
        fh.write(STUB_HEADER)
    os.remove(os.path.join(dst, "src/backend/plotting/NetworkPlot.cpp"))

    def patch(path, pattern, repl):
        p = os.path.join(dst, path)
        src = open(p).read()
        open(p, "w").write(re.sub(pattern, repl, src, flags=re.M))

    patch("src/backend/CMakeLists.txt", r"^.*plotting/NetworkPlot\.cpp\n",
          "")
    patch("src/backend/CMakeLists.txt",
          r"target_link_libraries\(slam-backend zmqpp\)", "")
    patch("CMakeLists.txt", r"^add_subdirectory\(libs/zmqpp\)$", "")
    patch("CMakeLists.txt", r'option\(BUILD_GUI "build-gui" ON\)',
          'option(BUILD_GUI "build-gui" OFF)')
    # Vestigial wait() in wrapper destructors fails to resolve outside
    # the original environment (SURVEY.md §2.2 note).
    for f in ("ekfslamwrapper", "fastslam1wrapper", "fastslam2wrapper"):
        patch(f"src/backend/wrappers/{f}.cpp", r"^\s*wait\(\);$", "")

    bld = os.path.join(dst, "build")
    os.makedirs(bld)
    subprocess.run(["cmake", "..", "-DCMAKE_BUILD_TYPE=Release",
                    "-G", "Ninja"], cwd=bld, check=True,
                   capture_output=True)
    subprocess.run(["ninja", "slam-backend"], cwd=bld, check=True,
                   capture_output=True)
    return os.path.join(bld, "src/backend/slam-backend")


def measure(binary: str, data: str, method: str, mapname: str,
            seed: int = 1):
    out = subprocess.run(
        [binary, "-m", f"{data}/{mapname}.mat", "-method", method,
         "-mode", "waypoints", "-SWITCH_SEED_RANDOM", str(seed)],
        capture_output=True, text=True, timeout=1200, cwd=os.path.dirname(
            os.path.dirname(data)))
    txt = out.stdout + out.stderr
    m = re.search(r"STUB_TIMES turns=(\d+) total_us=(\d+)", txt)
    if not m:
        raise RuntimeError(f"no STUB_TIMES for {method}/{mapname}")
    turns, total_us = int(m.group(1)), float(m.group(2))
    e = re.search(r"STUB_ERR n=(\d+) mean=([\d.eE+-]+) rmse=([\d.eE+-]+)",
                  txt)
    if not e:
        raise RuntimeError(f"no STUB_ERR for {method}/{mapname}")
    return turns, turns / (total_us / 1e6), float(e.group(2)), \
        float(e.group(3))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ref", default="/root/reference")
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "ref_baseline.json"))
    args = ap.parse_args()

    results = {
        "comment": "Reference C++ backend (matzipan/slam) measured on "
                   "this host with telemetry replaced by an in-process "
                   "DataGatherer-equivalent (tools/ref_baseline.py). "
                   "Release build, single x86 core. steps = control "
                   "ticks (turns). ate_* = per-turn Euclidean position "
                   "error stats exactly as DataGatherer.cpp:103-115 "
                   "computes them, RMSE over 6 seeds. 6 seeds because "
                   "the per-seed spread is large on some workloads "
                   "(FASTSLAM2/webmap measured 0.25-1.27 m over seeds "
                   "1-10: heading drift with SWITCH_HEADING_KNOWN=0 "
                   "locks in a small map rotation on unlucky seeds) — "
                   "a 3-seed anchor under-estimated it by 2.3x.",
        "host": "x86_64 container, g++ Release, ZMQ sender stubbed",
        "ate_seeds": [1, 2, 3, 4, 5, 6],
    }
    seeds = [1, 2, 3, 4, 5, 6]
    with tempfile.TemporaryDirectory() as wd:
        binary = build(args.ref, wd)
        data = os.path.join(wd, "ref", "data")
        for method, key in [("EKF1", "ekf1"), ("FASTSLAM1", "fastslam1"),
                            ("FASTSLAM2", "fastslam2")]:
            for mapname in ("example_webmap", "example_loop1",
                            "example_loop2", "example_loop902"):
                mkey = mapname.replace("example_", "")
                rmses, means = [], []
                for seed in seeds:
                    turns, sps, ate_mean, ate_rmse = measure(
                        binary, data, method, mapname, seed)
                    rmses.append(ate_rmse)
                    means.append(ate_mean)
                suffix = "" if method == "EKF1" else "_100p"
                # steps/s from the last (timing varies little by seed).
                results[f"{key}_{mkey}{suffix}_steps_per_sec"] = \
                    round(sps, 1)
                results[f"{mkey}_run_ticks"] = turns
                # RMSE over seeds (not mean-of-RMSEs): the quadratic
                # mean weights divergent seeds the same way a pooled
                # per-turn RMSE would.
                results[f"ate_rmse_{key}_{mkey}"] = round(
                    (sum(v * v for v in rmses) / len(rmses)) ** 0.5, 4)
                results[f"ate_rmse_{key}_{mkey}_per_seed"] = [
                    round(v, 4) for v in rmses]
                results[f"ate_mean_{key}_{mkey}"] = round(
                    sum(means) / len(means), 4)
                print(f"{method} {mapname}: {sps:,.0f} steps/s "
                      f"({turns} turns)  ATE rmse {rmses} m",
                      file=sys.stderr)

    with open(args.out, "w") as fh:
        json.dump(results, fh, indent=2)
    print(f"wrote {args.out}", file=sys.stderr)


if __name__ == "__main__":
    main()
