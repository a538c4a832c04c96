"""Bicycle (Ackermann) vehicle truth model and waypoint steering.

Functional equivalents of the reference's truth propagation
(predictTruePosition, core.cpp:35-39), waypoint chasing (updateSteering,
core.cpp:41-78) and the wrapper's loop/termination bookkeeping
(SLAMWrapper::control, slamwrapper.cpp:174-238) — restructured as a pure
state-transition function suitable for ``lax.scan``.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from slam_tpu.geometry import wrap_angle


class VehicleState(NamedTuple):
    """Truth-side vehicle state.

    ``pose``: [3] (x, y, theta). ``steer``: current steering angle G.
    ``waypoint``: index of the waypoint being chased. ``loops``: remaining
    loop count. ``done``: True once the waypoint list is exhausted on the
    final loop (reference: control() returning -1, slamwrapper.cpp:177-190).
    """
    pose: jnp.ndarray      # [3] float32
    steer: jnp.ndarray     # scalar float32
    waypoint: jnp.ndarray  # scalar int32
    loops: jnp.ndarray     # scalar int32
    done: jnp.ndarray      # scalar bool


def init_vehicle(number_loops: int) -> VehicleState:
    """Initial truth state: origin pose, zero steer, first waypoint
    (slamwrapper.cpp:20-23, 42-43)."""
    return VehicleState(
        pose=jnp.zeros(3, dtype=jnp.float32),
        steer=jnp.float32(0.0),
        waypoint=jnp.int32(0),
        loops=jnp.int32(number_loops),
        done=jnp.bool_(False),
    )


def predict_true_position(pose, V, G, wheelbase, dt):
    """One bicycle-model step (core.cpp:35-39):
        x += V dt cos(G + theta); y += V dt sin(G + theta);
        theta = wrap(theta + V dt sin(G) / wheelbase)
    """
    theta = pose[2]
    return jnp.stack([
        pose[0] + V * dt * jnp.cos(G + theta),
        pose[1] + V * dt * jnp.sin(G + theta),
        wrap_angle(theta + V * dt * jnp.sin(G) / wheelbase),
    ])


def _update_steering(pose, steer, waypoint, loops, waypoints,
                     at_waypoint, rateg, maxg, dt):
    """Steering update toward the current waypoint with rate and angle
    clamps, plus waypoint/loop advancement (core.cpp:41-78 and the loop
    restart logic in slamwrapper.cpp:181-190).

    Returns (new_steer, new_waypoint, new_loops, done).
    """
    n_wp = waypoints.shape[0]
    wp = waypoints[waypoint]
    d2 = jnp.sum((wp - pose[:2]) ** 2)

    reached = d2 < at_waypoint * at_waypoint
    next_idx = jnp.where(reached, waypoint + 1, waypoint)

    exhausted = next_idx >= n_wp
    # On exhaustion: restart the list if loops remain, else terminate
    # (slamwrapper.cpp:183-190). Either way the reference's updateSteering
    # returned early (core.cpp:52-55), so the steer angle is unchanged on
    # the exhaustion tick; the vehicle still propagates with the old steer
    # when the run continues.
    new_loops = jnp.where(exhausted & (loops > 1), loops - 1, loops)
    done = exhausted & (loops <= 1)
    next_idx = jnp.where(exhausted, 0, next_idx)

    target = waypoints[jnp.clip(next_idx, 0, n_wp - 1)]
    delta = wrap_angle(
        jnp.arctan2(target[1] - pose[1], target[0] - pose[0])
        - pose[2] - steer)
    max_delta = rateg * dt
    delta = jnp.clip(delta, -max_delta, max_delta)
    new_steer = jnp.clip(steer + delta, -maxg, maxg)

    new_steer = jnp.where(exhausted, steer, new_steer)
    return new_steer, next_idx, new_loops, done


def steer_and_move(state: VehicleState, waypoints, *, V, wheelbase, dt,
                   at_waypoint, rateg, maxg) -> VehicleState:
    """One control tick: chase waypoint, clamp steering, propagate truth.

    A no-op once ``state.done`` (fixed-length scans stay safe past the
    end of the run).
    """
    steer, wp_idx, loops, done = _update_steering(
        state.pose, state.steer, state.waypoint, state.loops, waypoints,
        at_waypoint, rateg, maxg, dt)
    done = state.done | done

    new_pose = predict_true_position(state.pose, V, steer, wheelbase, dt)
    pose = jnp.where(done, state.pose, new_pose)
    return VehicleState(
        pose=pose,
        steer=jnp.where(done, state.steer, steer),
        waypoint=jnp.where(done, state.waypoint, wp_idx),
        loops=jnp.where(done, state.loops, loops),
        done=done,
    )
