"""Capture an xprof trace of a workload's superstep and print a per-op
stage table (TPU-pid ops, dur summed by name) — the ground-truth
instrument on this machine (wall diffs through the axon tunnel lie;
see memory / BENCH_NOTES).

Usage:
  python tools/trace_superstep.py --method FASTSLAM1 -p 1048576 \
      --supersteps 6 --out artifacts/trace_1m_r05 [--deferred]
  python tools/trace_superstep.py --workload ekf10k --out artifacts/...
  python tools/trace_superstep.py --parse artifacts/trace_1m_r05
"""

import argparse
import glob
import gzip
import json
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def parse_trace(trace_dir, top=40):
    """Sum op durations by name over TPU pids from vm.trace.json.gz."""
    paths = glob.glob(os.path.join(
        trace_dir, "**", "*.trace.json.gz"), recursive=True)
    assert paths, f"no trace under {trace_dir}"
    path = max(paths, key=os.path.getmtime)
    with gzip.open(path, "rt") as fh:
        data = json.load(fh)
    events = data["traceEvents"]
    # TPU pids: process_name metadata mentioning the device.
    tpu_pids = set()
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            name = e.get("args", {}).get("name", "")
            if "TPU" in name or "/device:" in name.upper():
                tpu_pids.add(e["pid"])
    # Fallback: pids hosting "XLA Ops"-like threads.
    agg = defaultdict(list)
    tmin, tmax = float("inf"), 0.0
    for e in events:
        if e.get("ph") != "X":
            continue
        if tpu_pids and e.get("pid") not in tpu_pids:
            continue
        dur = e.get("dur", 0.0)
        name = e.get("name", "?")
        agg[name].append(dur)
        ts = e.get("ts", 0.0)
        tmin = min(tmin, ts)
        tmax = max(tmax, ts + dur)
    # The outermost program op spans everything — exclude from busy.
    outer = max(agg, key=lambda k: max(agg[k])) if agg else None
    total = sum(sum(v) for k, v in agg.items() if k != outer)
    rows = sorted(agg.items(), key=lambda kv: -sum(kv[1]))[:top]
    span = (tmax - tmin) / 1e3 if tmax > tmin else 0.0
    print(f"{path}\n  busy {total/1e3:.2f} ms (excl outer "
          f"{outer}) over span {span:.2f} ms")
    print(f"  {'total':>9}  {'n':>3} {'mean':>8} {'min':>8} "
          f"{'max':>8}  op")
    for name, durs in rows:
        print(f"  {sum(durs)/1e3:9.3f} {len(durs):3d} "
              f"{sum(durs)/len(durs)/1e3:8.3f} {min(durs)/1e3:8.3f} "
              f"{max(durs)/1e3:8.3f}  {name[:70]}")
    return agg, span


def build_runner(args):
    import jax
    from bench import load_workload
    from slam_tpu.runtime import Runner

    if args.workload == "ekf10k":
        import numpy as np
        from jax.sharding import Mesh
        from slam_tpu.parallel.ekf import ShardedEkfSlam
        from slam_tpu.runtime.config5 import config5_setup
        cfg, slam_map = config5_setup(10_000, capacity=10_000,
                                      max_obs=96)
        mesh = Mesh(np.array(jax.devices()[:1]), ("lm",))
        est = ShardedEkfSlam(cfg, slam_map.n_landmarks, mesh)
        return Runner(cfg, slam_map, "EKF1", estimator=est), cfg

    cfg, slam_map = load_workload()
    est = None
    if args.deferred:
        from slam_tpu.models.fastslam1 import FastSlam1Deferred
        est = FastSlam1Deferred(cfg, slam_map.n_landmarks)
    runner = Runner(cfg, slam_map, args.method,
                    n_particles=args.particles, estimator=est,
                    rng_impl="rbg")
    return runner, cfg


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--method", default="FASTSLAM1")
    ap.add_argument("-p", "--particles", type=int, default=1 << 20)
    ap.add_argument("--supersteps", type=int, default=6)
    ap.add_argument("--warmup", type=int, default=6)
    ap.add_argument("--deferred", action="store_true")
    ap.add_argument("--workload", default=None)
    ap.add_argument("--out", default="/tmp/trace_superstep")
    ap.add_argument("--scan", action="store_true",
                    help="trace the COMPILED lax.scan program (what "
                         "bench.py runs — includes carry-buffer "
                         "effects) instead of per-call supersteps")
    ap.add_argument("--parse", default=None,
                    help="only parse an existing trace dir")
    args = ap.parse_args()

    if args.parse:
        parse_trace(args.parse)
        return

    import jax
    import numpy as np

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    runner, cfg = build_runner(args)
    est = runner.est
    sim_state = runner.sim.init(seed=3)
    est_state = est.init(args.particles if not args.workload else None)
    key = runner.sim.make_key(4)

    def fence(tree):
        for leaf in jax.tree_util.tree_leaves(tree):
            if hasattr(leaf, "ravel") and getattr(leaf, "size", 0):
                np.asarray(leaf).ravel()[:1]
                return

    if args.scan:
        # Warm the state first so the traced window is steady-state.
        step = jax.jit(lambda c: runner._superstep(c, None)[0])
        carry = (sim_state, est_state, key)
        for _ in range(args.warmup):
            carry = step(carry)
        fence(carry)
        # The built program DONATES its arguments — pass a fresh
        # device copy per call (the kept `carry` is never donated).
        import jax.numpy as jnp

        def fresh():
            return jax.tree.map(jnp.copy, carry)

        comp = runner._build(args.supersteps).lower(*carry).compile()
        out = comp(*fresh())
        fence(out)
        with jax.profiler.trace(args.out):
            out = comp(*fresh())
            fence(out)
    else:
        step = jax.jit(lambda c: runner._superstep(c, None)[0])
        carry = (sim_state, est_state, key)
        for _ in range(args.warmup):
            carry = step(carry)
        fence(carry)
        with jax.profiler.trace(args.out):
            for _ in range(args.supersteps):
                carry = step(carry)
            fence(carry)
    print(f"traced {args.supersteps} supersteps -> {args.out}")
    agg, span = parse_trace(args.out)
    print(f"mean/superstep (span): {span/args.supersteps:.2f} ms")


if __name__ == "__main__":
    main()
