"""Deterministic simulation core: vehicle truth, steering, sensors.

Functional, jittable replacements for the reference's in-process simulator
(src/backend/core.cpp:24-78, 185-273, 438-449 and
src/backend/wrappers/slamwrapper.cpp:174-238).
"""

from slam_tpu.sim.vehicle import (
    VehicleState,
    init_vehicle,
    steer_and_move,
    predict_true_position,
)
from slam_tpu.sim.sensors import observe, Observation
from slam_tpu.sim.simulator import Simulator, SimState

__all__ = [
    "VehicleState",
    "init_vehicle",
    "steer_and_move",
    "predict_true_position",
    "observe",
    "Observation",
    "Simulator",
    "SimState",
]
