"""On-chip value check of the landmark-segmented fused update kernel
at full-10k capacity (round 5): fused vs the unfused jnp chain on the
same state, plus a single-segment cross-check at small L.

Run: python tools/smoke_seg_kernel.py
"""
import numpy as np
import jax
import jax.numpy as jnp

from slam_tpu.models import rbpf
from slam_tpu.models.particles import init_particles
from slam_tpu.ops.pallas.kernels import _fused_tiling, fs1_update_tpu
from slam_tpu.ops.planes import log_gauss2_planes

R = jnp.asarray(np.diag([0.01, 0.0003]).astype(np.float32))


def check(P, L, K, n_live, tag):
    rng = np.random.default_rng(5)
    state = init_particles(P, L, 2 * K + n_live)
    lm = np.zeros((2, L, P), np.float32)
    lm[:, :n_live] = rng.normal(size=(2, n_live, P)).astype(np.float32) * 5
    lm_P = np.zeros((3, L, P), np.float32)
    lm_P[0, :n_live] = 0.1
    lm_P[2, :n_live] = 0.1
    table = -np.ones(2 * K + n_live, np.int32)
    live_ids = rng.choice(2 * K + n_live, n_live, replace=False)
    table[live_ids] = np.arange(n_live)
    state = state._replace(
        xv=jnp.asarray(rng.normal(size=(3, P)).astype(np.float32) * 0.1),
        lm=jnp.asarray(lm), lm_P=jnp.asarray(lm_P),
        n=jnp.int32(n_live), da_table=jnp.asarray(table))

    z = jnp.asarray(np.column_stack(
        [rng.uniform(3, 8, K), rng.uniform(-0.5, 0.5, K)]
    ).astype(np.float32))
    # Mix: 2/3 matched (random live ids), 1/3 new ids, a couple invalid.
    ids_np = np.where(rng.uniform(size=K) < 0.67,
                      rng.choice(live_ids, K),
                      n_live + rng.choice(2 * K, K, replace=False))
    ids = jnp.asarray(ids_np.astype(np.int32))
    zmask = jnp.asarray(rng.uniform(size=K) < 0.9)

    assoc, is_new = rbpf.associate_known(state, ids, zmask)
    matched = assoc >= 0
    slot = jnp.where(matched, assoc, 0)
    offset = (jnp.cumsum(is_new.astype(jnp.int32))
              - is_new.astype(jnp.int32))
    slot_new = state.n + offset
    ok = is_new & (slot_new < L)

    tiling = _fused_tiling(P, L, K)
    print(f"[{tag}] P={P} L={L} K={K} tiling={tiling}")
    got = fs1_update_tpu(state, z, slot, matched, slot_new, ok, R)

    J, v0, v1 = rbpf.observe_planes(state, z, slot, R)
    logl = jnp.where(matched[:, None],
                     log_gauss2_planes(v0, v1, J.s00, J.s01, J.s11), 0.0)
    want = state._replace(logw=state.logw + jnp.sum(logl, axis=0))
    want = rbpf.update_matched_features(want, slot, matched, v0, v1, J)
    want = rbpf.add_new_features(want, z, ids, is_new, R)

    for name in ("logw", "lm", "lm_P"):
        g = np.asarray(getattr(got, name))
        w = np.asarray(getattr(want, name))
        err = np.max(np.abs(g - w) / (np.abs(w) + 1e-3))
        print(f"  {name}: max rel err {err:.2e}")
        assert err < 1e-3, (tag, name, err)
    print(f"  [{tag}] OK")


if __name__ == "__main__":
    print("devices:", jax.devices())
    check(P=1024, L=64, K=8, n_live=20, tag="single-seg")
    check(P=4096, L=10000, K=96, n_live=700, tag="full-10k")
