import time
import jax, jax.numpy as jnp, numpy as np
from slam_tpu.config import SlamConfig
from slam_tpu.maps import read_map_file
from slam_tpu.runtime import Runner

cfg = SlamConfig.from_ini("/root/reference/data/example_webmap.ini")
m = read_map_file("/root/reference/data/example_webmap.mat")
P = 1_000_000
runner = Runner(cfg, m, "FASTSLAM1", n_particles=P, rng_impl="rbg")
est, sim = runner.est, runner.sim
sim_state = sim.init(seed=3)
est_state = est.init(P)
key = sim.make_key(4)
step = jax.jit(lambda c: runner._superstep(c, None))
carry = (sim_state, est_state, key)
for _ in range(4):
    carry, _ = step(carry)
jax.block_until_ready(carry[1].xv)

def timeit(name, fn, *args, n=20):
    out = fn(*args); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    print(f"{name:44s} {(time.perf_counter()-t0)/n*1e3:8.2f} ms", flush=True)

timeit("superstep full", lambda c: step(c)[0], carry)

def ss_ticks(c):
    sim_state, est_state, key = c
    def tick(cc, _):
        sim_state, est_state, key = cc
        sim_state, controls = sim.control_step(sim_state)
        phi = sim_state.vehicle.pose[2]
        key, sub = jax.random.split(key)
        est2 = est.predict(est_state, sub, controls.v_noisy, controls.g_noisy, phi)
        return (sim_state, est2, key), None
    cc, _ = jax.lax.scan(tick, c, None, length=cfg.steps_per_observe)
    return cc
timeit("A: 8 ticks only (sim+predict)", jax.jit(ss_ticks), carry)

def ss_upd(c):
    sim_state, est_state, key = c
    sim_state, obs = sim.observe_step(sim_state)
    key, sub = jax.random.split(key)
    est2 = est.update(est_state, sub, obs.z, obs.ids, obs.mask)
    return sim_state, est2, key
timeit("C: update only", jax.jit(ss_upd), carry)

from slam_tpu.models import rbpf
Qe = jnp.diag(jnp.asarray(cfg.Qe, jnp.float32))
def ss_batched(c):
    sim_state, est_state, key = c
    def tick(ss, _):
        ss, controls = sim.control_step(ss)
        return ss, (controls.v_noisy, controls.g_noisy)
    sim_state, (V8, G8) = jax.lax.scan(tick, sim_state, None, length=8)
    key, sub = jax.random.split(key)
    eps = jax.random.normal(sub, (8, 2, P), jnp.float32)
    L = jnp.linalg.cholesky(Qe + 1e-20*jnp.eye(2))
    Vp = V8[:, None] + L[0,0]*eps[:,0]
    Gp = G8[:, None] + L[1,0]*eps[:,0] + L[1,1]*eps[:,1]
    dt, wb = cfg.DT_CONTROLS, cfg.WHEELBASE
    xv = est_state.xv
    dth = Vp * dt * jnp.sin(Gp) / wb
    th = xv[2][None, :] + jnp.cumsum(dth, axis=0)
    th_before = jnp.concatenate([xv[2][None, :], th[:-1]], axis=0)
    x = xv[0] + jnp.sum(Vp * dt * jnp.cos(Gp + th_before), axis=0)
    y = xv[1] + jnp.sum(Vp * dt * jnp.sin(Gp + th_before), axis=0)
    from slam_tpu.geometry import wrap_angle
    new_xv = jnp.stack([x, y, wrap_angle(th[-1])])
    est2 = est_state._replace(xv=new_xv)
    return sim_state, est2, key
timeit("D: batched 8-tick predict", jax.jit(ss_batched), carry)
