"""Estimators: EKF-SLAM, FastSLAM 1.0, FastSLAM 2.0.

TPU-first re-designs of the reference algorithms (src/backend/algorithms/):
struct-of-arrays fixed-capacity state, mask-driven landmark growth, vmapped
particle axes, jittable step functions.
"""

from slam_tpu.models.ekf import (
    EKFState,
    ekf_augment,
    ekf_batch_update,
    ekf_data_associate,
    ekf_init,
    ekf_observe_heading,
    ekf_predict,
    ekf_step,
)
from slam_tpu.models.fastslam1 import FastSlam1
from slam_tpu.models.fastslam2 import FastSlam2
from slam_tpu.models.particles import (
    ParticleState,
    estimate_position,
    init_particles,
)

__all__ = [
    "EKFState",
    "ekf_init",
    "ekf_predict",
    "ekf_observe_heading",
    "ekf_data_associate",
    "ekf_batch_update",
    "ekf_augment",
    "ekf_step",
    "ParticleState",
    "init_particles",
    "estimate_position",
    "FastSlam1",
    "FastSlam2",
]
