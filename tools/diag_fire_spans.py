"""Diagnostic: ancestor-window span distribution of REAL resample
firings at the 1M webmap workload — decides whether a narrow-window
selection fast path in the deferred kernel is worth building (blocks
whose ancestors span << chunk could use a smaller matmul).

Run: python tools/diag_fire_spans.py
"""
import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main(P=1 << 20, supersteps=24):
    jax.config.update("jax_compilation_cache_dir", ".jax_cache")
    from bench import load_workload
    from slam_tpu.models.fastslam1 import FastSlam1Deferred
    from slam_tpu.ops.pallas.kernels import DEFERRED_BLOCK
    from slam_tpu.runtime import Runner

    cfg, slam_map = load_workload()
    est = FastSlam1Deferred(cfg, slam_map.n_landmarks)
    runner = Runner(cfg, slam_map, "FASTSLAM1", n_particles=P,
                    estimator=est, rng_impl="rbg")
    sim_state = runner.sim.init(seed=3)
    est_state = est.init(P)
    key = runner.sim.make_key(4)
    step = jax.jit(lambda c: runner._superstep(c, None)[0])
    carry = (sim_state, est_state, key)

    B = DEFERRED_BLOCK
    nb = P // B
    edges = np.arange(nb) * B
    fires = 0
    spans_all = []
    for t in range(supersteps):
        carry = step(carry)
        S = np.asarray(carry[1].S)
        if np.array_equal(S, np.arange(1, P + 1)):
            continue
        fires += 1
        first = np.searchsorted(S, edges, side="right")
        last = np.searchsorted(S, edges + (B - 1), side="right")
        spans_all.append(last - first + 1)
    if not fires:
        print("no firings observed")
        return
    spans = np.concatenate(spans_all)
    print(f"{fires}/{supersteps} supersteps fired; "
          f"{spans.size} block windows")
    for q in (5, 25, 50, 75, 95, 99):
        print(f"  span p{q}: {np.percentile(spans, q):.0f} ancestors")
    for thr in (128, 256, 384, 512):
        frac = float((spans <= thr).mean())
        print(f"  span <= {thr}: {frac:.1%} of blocks")


if __name__ == "__main__":
    main()
