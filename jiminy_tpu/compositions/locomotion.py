"""Locomotion rewards & terminations (reference
`compositions/locomotion.py:33-813`)."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from jiminy_tpu.compositions.generic import TrackingQuantityReward
from jiminy_tpu.quantities.locomotion import (
    BaseOdometryVelocity,
    BaseRelativeHeight,
)
from jiminy_tpu.ops import lie


class TrackingBaseOdometryVelocityReward(TrackingQuantityReward):
    """RBF tracking of the horizontal base velocity (vx, vy, wz)
    (reference `TrackingBaseOdometryVelocityReward`)."""

    def __init__(self, target, cutoff: float = 0.5):
        super().__init__(
            "reward_tracking_odometry_velocity",
            BaseOdometryVelocity(),
            jnp.asarray(target) if not callable(target) else target,
            cutoff,
        )


class TrackingBaseHeightReward(TrackingQuantityReward):
    """RBF tracking of the base height above ground (reference
    `TrackingBaseHeightReward`)."""

    def __init__(self, target: float, cutoff: float = 0.1):
        super().__init__(
            "reward_tracking_base_height", BaseRelativeHeight(), target, cutoff
        )


class MechanicalPowerConsumptionReward:
    """Negative mean mechanical power |u·v| (reference
    `AverageMechanicalPowerConsumption`-based reward)."""

    name = "reward_power_consumption"

    def __init__(self, scale: float = 1.0e-3):
        self.scale = scale

    def __call__(self, env, prev_state, action, next_state):
        sim = next_state.sim
        motors = env.robot.motors
        vidx = jnp.asarray(motors.v_indices, jnp.int32)
        v_motor = jnp.take(sim.v, vidx, axis=-1) * motors.mechanical_reduction
        power = jnp.sum(jnp.abs(sim.u_motor * v_motor), axis=-1)
        return -self.scale * power


# --------------------------------------------------------------------------- #
# Terminations — callables (env, state) -> bool
# --------------------------------------------------------------------------- #


class BaseRollPitchTermination:
    """Terminate when base roll/pitch exceed limits (reference
    `BaseRollPitchTermination`)."""

    def __init__(self, max_roll: float = 0.5, max_pitch: float = 0.5):
        self.max_roll = max_roll
        self.max_pitch = max_pitch

    def __call__(self, env, state):
        quat = state.sim.q[..., 3:7]
        qx, qy, qz, qw = quat[..., 0], quat[..., 1], quat[..., 2], quat[..., 3]
        roll = jnp.arctan2(2 * (qw * qx + qy * qz), 1 - 2 * (qx**2 + qy**2))
        pitch = jnp.arcsin(jnp.clip(2 * (qw * qy - qz * qx), -1.0, 1.0))
        return (jnp.abs(roll) > self.max_roll) | (jnp.abs(pitch) > self.max_pitch)


class BaseHeightTermination:
    """Terminate when the base drops below a height (reference `FallingTermination`)."""

    def __init__(self, min_height: float = 0.3):
        self.min_height = min_height

    def __call__(self, env, state):
        return BaseRelativeHeight()(env, state) < self.min_height


class FlyingTermination:
    """Terminate when no contact is active for the whole step (reference
    `FlyingTermination`)."""

    def __init__(self, max_height: float = 0.1):
        self.max_height = max_height

    def __call__(self, env, state):
        f = state.sim.contact_forces
        in_contact = jnp.any(jnp.abs(f[..., 2]) > 1e-6, axis=-1)
        return ~in_contact


class ImpactForceTermination:
    """Terminate on excessive vertical contact force (reference
    `ImpactForceTermination`)."""

    def __init__(self, max_force_rel: float = 10.0):
        self.max_force_rel = max_force_rel  # in units of robot weight

    def __call__(self, env, state):
        model = env.robot.model
        weight = jnp.sum(model.mass, axis=-1) * 9.81
        f = state.sim.contact_forces
        return jnp.any(f[..., 2] > self.max_force_rel * weight, axis=-1)
