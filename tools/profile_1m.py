"""Attribute the 1M-particle FastSLAM1 superstep cost component by component.

Times each jitted piece of the superstep in isolation at the bench's 1M
webmap workload (the whole-superstep number from bench.py is the ground
truth; the pieces here explain it). Run on the TPU:

    python tools/profile_1m.py [P]

Optionally captures an xprof trace of the full superstep with --trace DIR.
"""

import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")


def _fence(out):
    """block_until_ready through the axon tunnel can return before
    execution finishes (measured: a 7.6 s matmul chain "blocked" in
    0.09 ms); fetching one element is the reliable completion fence."""
    import numpy as np
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf).ravel()[:1]


def timeit(fn, *args, n=10, warmup=2):
    """NOTE: per-call numbers include a host round trip (~5-20 ms
    through the tunnel) — ONLY relative comparisons are meaningful
    here. The ground truth for in-program cost is the xprof trace
    (artifacts/trace_1m_r04/, --trace below); BENCH_NOTES carries the
    per-stage table extracted from it."""
    for _ in range(warmup):
        out = fn(*args)
    _fence(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    _fence(out)
    return (time.perf_counter() - t0) / n * 1e3  # ms


def main():
    P = int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1].isdigit() \
        else 1 << 20
    trace_dir = None
    if "--trace" in sys.argv:
        trace_dir = sys.argv[sys.argv.index("--trace") + 1]

    from bench import load_workload
    from slam_tpu.models import rbpf
    from slam_tpu.models.particles import gather_particles
    from slam_tpu.ops.pallas import fs1_observe_tpu
    from slam_tpu.runtime import Runner

    cfg, slam_map = load_workload()
    runner = Runner(cfg, slam_map, "FASTSLAM1", n_particles=P,
                    rng_impl="rbg")
    est = runner.est
    period = cfg.steps_per_observe

    sim_state = runner.sim.init(seed=3)
    est_state = est.init(P)
    key = runner.sim.make_key(4)

    # Drive a few supersteps so the map is discovered and state is "warm".
    step = jax.jit(lambda c: runner._superstep(c, None)[0])
    carry = (sim_state, est_state, key)
    for _ in range(6):
        carry = step(carry)
    jax.block_until_ready(carry)
    sim_state, est_state, key = carry
    print(f"P={P:,}  L={est_state.capacity}  n={int(est_state.n)}  "
          f"max_obs={runner.sim.max_obs}  period={period}")

    ms_super = timeit(step, carry)
    print(f"full superstep        {ms_super:8.2f} ms   "
          f"({P * period / ms_super * 1e3:,.3g} particle-steps/s)")

    # --- pieces ---------------------------------------------------------
    Q = jnp.diag(jnp.asarray(cfg.Qe, jnp.float32))
    R = jnp.diag(jnp.asarray(cfg.Re, jnp.float32))
    sub = jax.random.split(key)[0]

    ms = timeit(est._predict, est_state, sub, jnp.float32(3.0),
                jnp.float32(0.1), Q)
    print(f"predict x1            {ms:8.2f} ms   (x{period} = "
          f"{ms * period:.2f})")

    # one observation batch off the simulator
    sim2, obs = jax.jit(runner.sim.observe_step)(sim_state)
    z, ids, zmask = obs.z, obs.ids, obs.mask
    assoc, is_new = rbpf.associate_known(est_state, ids, zmask)
    matched = assoc >= 0
    slot = jnp.where(matched, assoc, 0)
    print(f"  obs: K={z.shape[0]} matched={int(matched.sum())} "
          f"new={int(is_new.sum())}")

    ms = timeit(jax.jit(runner.sim.observe_step), sim_state)
    print(f"sim observe_step      {ms:8.2f} ms")

    gather = jax.jit(lambda s: rbpf.gather_landmarks(s, slot))
    ms = timeit(gather, est_state)
    print(f"gather_landmarks      {ms:8.2f} ms")

    obs_fused = jax.jit(lambda s: fs1_observe_tpu(s, z, slot, matched, R))
    ms = timeit(obs_fused, est_state)
    print(f"fused observe (g+k+s) {ms:8.2f} ms")

    gathered = gather(est_state)
    from slam_tpu.ops.pallas.kernels import _observe_call
    kernel_only = jax.jit(lambda g: _observe_call(
        est_state.xv, *g, z, matched, R))
    ms = timeit(kernel_only, gathered)
    print(f"  kernel only         {ms:8.2f} ms")

    vals = jnp.stack([gathered[0], gathered[1]])
    scat = jax.jit(lambda s: rbpf.scatter_slots(s.lm, slot, vals, matched))
    ms = timeit(scat, est_state)
    print(f"  scatter lm (2pl)    {ms:8.2f} ms")

    addf = jax.jit(lambda s: rbpf.add_new_features(s, z, ids, is_new, R))
    ms = timeit(addf, est_state)
    print(f"add_new_features      {ms:8.2f} ms  (cond, no-op here)")

    res_skip = jax.jit(lambda s, k: rbpf.resample(
        s, k, jnp.float32(0.0), True))
    ms = timeit(res_skip, est_state, sub)
    print(f"resample (skip path)  {ms:8.2f} ms")

    res_hit = jax.jit(lambda s, k: rbpf.resample(
        s, k, jnp.float32(2 * P), True))
    ms = timeit(res_hit, est_state, sub, n=3)
    print(f"resample (hit path)   {ms:8.2f} ms")

    idx = jnp.arange(P, dtype=jnp.int32)
    ms = timeit(jax.jit(lambda s: gather_particles(s, idx)), est_state, n=3)
    print(f"  gather_particles    {ms:8.2f} ms")

    # freeze select cost (predict-touched only vs full)
    done = sim_state.vehicle.done
    from slam_tpu.runtime.loop import _freeze
    fr = jax.jit(lambda s: _freeze(done, s, s))
    ms = timeit(fr, est_state)
    print(f"freeze (full tree)    {ms:8.2f} ms")

    if trace_dir:
        with jax.profiler.trace(trace_dir):
            for _ in range(3):
                carry = step(carry)
            jax.block_until_ready(carry)
        print(f"trace written to {trace_dir}")


if __name__ == "__main__":
    main()
