"""On-chip moment check of kernel 6's Box-Muller noise stream: the
per-tick control sample must match N((vn, gn), Qe) — mean/std of the
one-tick displacement against the closed form.

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/smoke_predict.py
"""
import numpy as np
import jax
import jax.numpy as jnp

from slam_tpu.ops.pallas.kernels import fs1_predict_multi_tpu


def main(P=1 << 20):
    dt, wb = 0.025, 4.0
    xv = jnp.zeros((3, P), jnp.float32)

    # One tick, longitudinal noise only: x+ = (vn + n0) dt.
    qv = 0.09
    out = fs1_predict_multi_tpu(
        xv, jax.random.key(7), jnp.asarray([[3.0, 0.0]], jnp.float32),
        jnp.asarray(np.diag([qv, 0.0]), jnp.float32),
        wheelbase=wb, dt=dt)
    x = np.asarray(out[0])
    mean, std = x.mean() / dt, x.std() / dt
    print(f"V: mean {mean:.4f} (want 3.0), std {std:.4f} "
          f"(want {np.sqrt(qv):.4f})")
    assert abs(mean - 3.0) < 0.01 and abs(std - np.sqrt(qv)) < 0.01

    # One tick, steering noise only: th+ = vn dt sin(G)/wb, G ~ N(0,qg).
    qg = 0.0025
    out = fs1_predict_multi_tpu(
        xv, jax.random.key(8), jnp.asarray([[3.0, 0.0]], jnp.float32),
        jnp.asarray(np.diag([0.0, qg]), jnp.float32),
        wheelbase=wb, dt=dt)
    th = np.asarray(out[2])
    want_std = 3.0 * dt * np.sqrt(qg) / wb
    print(f"th: mean {th.mean():.2e} (want 0), std {th.std():.3e} "
          f"(want {want_std:.3e})")
    assert abs(th.mean()) < 3e-5 and abs(th.std() - want_std) < 3e-5

    # Successive keys give fresh draws (no accidental stream reuse).
    o2 = fs1_predict_multi_tpu(
        xv, jax.random.key(9), jnp.asarray([[3.0, 0.0]], jnp.float32),
        jnp.asarray(np.diag([0.0, qg]), jnp.float32),
        wheelbase=wb, dt=dt)
    corr = np.corrcoef(th, np.asarray(o2[2]))[0, 1]
    print(f"cross-key correlation {corr:.4f} (want ~0)")
    assert abs(corr) < 0.01
    print("OK")


if __name__ == "__main__":
    print("devices:", jax.devices())
    main()
