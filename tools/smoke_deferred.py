"""On-chip check of the deferred-resample FS1 path (kernel 5): a short
webmap run with FastSlam1Deferred vs the eager estimator — pose traces
and final weights must agree to float tolerance (the two paths compute
the same math; only the landmark permutation is deferred a superstep).

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/smoke_deferred.py
"""
import numpy as np
import jax

from slam_tpu.models.fastslam1 import FastSlam1Deferred
from slam_tpu.runtime import Runner


def main(P=2048, n_ticks=400):
    import bench
    cfg, slam_map = bench.load_workload()

    r_e = Runner(cfg, slam_map, "FASTSLAM1", n_particles=P).run(
        seed=3, n_ticks=n_ticks)
    # fused_predict=False: the in-kernel PRNG is a different (equally
    # distributed) noise stream; the bit-exactness check needs the
    # same draws as the eager estimator.
    est_d = FastSlam1Deferred(cfg, slam_map.n_landmarks,
                              fused_predict=False)
    r_d = Runner(cfg, slam_map, "FASTSLAM1", n_particles=P,
                 estimator=est_d).run(seed=3, n_ticks=n_ticks)

    err = np.max(np.abs(r_e.est_pose - r_d.est_pose))
    print(f"max |est_pose_eager - est_pose_deferred| = {err:.3e}")
    fs_e = r_e.final_state
    fs_d = est_d.finalize(r_d.final_state)
    for name in ("logw", "xv", "lm", "lm_P"):
        a = np.asarray(getattr(fs_e, name))
        b = np.asarray(getattr(fs_d, name))
        rel = np.max(np.abs(a - b) / (np.abs(a) + 1e-3))
        print(f"  final {name}: max rel diff {rel:.3e}")
        assert rel < 5e-2, (name, rel)
    assert err < 0.5, err

    # Fused-predict arm (kernel 6, its own noise stream): trajectory
    # quality must match the jnp-predict run statistically.
    est_f = FastSlam1Deferred(cfg, slam_map.n_landmarks)
    assert hasattr(est_f, "predict_multi")
    r_f = Runner(cfg, slam_map, "FASTSLAM1", n_particles=P,
                 estimator=est_f).run(seed=3, n_ticks=n_ticks)
    act = r_e.active
    d_e = np.linalg.norm((r_e.est_pose - r_e.true_pose)[act, :2],
                         axis=1)
    d_f = np.linalg.norm((r_f.est_pose - r_f.true_pose)[act, :2],
                         axis=1)
    print(f"ATE jnp-predict {np.sqrt((d_e**2).mean()):.3f} m, "
          f"fused-predict {np.sqrt((d_f**2).mean()):.3f} m")
    assert np.sqrt((d_f ** 2).mean()) < 3 * np.sqrt(
        (d_e ** 2).mean()) + 0.5
    print("OK")


if __name__ == "__main__":
    print("devices:", jax.devices())
    main()
