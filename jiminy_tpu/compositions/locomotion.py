"""Locomotion rewards & terminations (reference
`compositions/locomotion.py:33-813`)."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from jiminy_tpu.compositions.generic import (
    DriftTrackingQuantityTermination,
    QuantityReward,
    QuantityTermination,
    ShiftTrackingQuantityTermination,
    TrackingQuantityReward,
    radial_basis_function,
)
from jiminy_tpu.quantities.locomotion import (
    AverageBaseMomentum,
    BaseOdometryPose,
    BaseOdometryVelocity,
    BaseRelativeHeight,
    CapturePoint,
    MultiContactNormalizedSpatialForce,
    MultiFootCollisionDetection,
    MultiFootMeanOdometryPose,
    MultiFootNormalizedForceVertical,
    MultiFootRelativeXYZQuat,
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


class DriftTrackingBaseOdometryPoseReward(TrackingQuantityReward):
    """RBF tracking of the base odometry pose (x, y, yaw) drift vs its target
    (reference `DriftTrackingBaseOdometryPoseReward`,
    `compositions/locomotion.py:85`)."""

    def __init__(self, target, cutoff: float = 0.3):
        super().__init__(
            "reward_tracking_odometry_pose", BaseOdometryPose(), target, cutoff
        )


class TrackingCapturePointReward(TrackingQuantityReward):
    """RBF tracking of the capture point / DCM (reference
    `TrackingCapturePointReward`, `compositions/locomotion.py:123`)."""

    def __init__(self, target, cutoff: float = 0.1):
        super().__init__(
            "reward_tracking_capture_point", CapturePoint(), target, cutoff
        )


class TrackingFootPositionsReward(TrackingQuantityReward):
    """RBF tracking of the foot positions relative to the mean foot pose
    (reference `TrackingFootPositionsReward`, `compositions/locomotion.py:146`)."""

    def __init__(self, target, cutoff: float = 0.1):
        from jiminy_tpu.quantities.generic import MaskedQuantity

        super().__init__(
            "reward_tracking_foot_positions",
            MaskedQuantity(MultiFootRelativeXYZQuat(), (0, 1, 2), axis=-1),
            target,
            cutoff,
            value_ndim=2,
        )


class TrackingFootOrientationsReward(TrackingQuantityReward):
    """RBF tracking of the foot orientations relative to the mean foot pose
    (reference `TrackingFootOrientationsReward`,
    `compositions/locomotion.py:179`)."""

    def __init__(self, target, cutoff: float = 0.2):
        from jiminy_tpu.quantities.generic import MaskedQuantity

        super().__init__(
            "reward_tracking_foot_orientations",
            MaskedQuantity(MultiFootRelativeXYZQuat(), (3, 4, 5, 6), axis=-1),
            target,
            cutoff,
        )

    def __call__(self, env, prev_state, action, next_state):
        value = self.quantity(env, next_state)
        target = self.target(env, next_state) if callable(self.target) else self.target
        # Quaternion error: geodesic angle per foot (sign-invariant)
        dots = jnp.clip(jnp.abs(jnp.sum(value * target, axis=-1)), 0.0, 1.0)
        ang = 2.0 * jnp.arccos(dots)
        return radial_basis_function(ang, self.cutoff)


class TrackingFootForceDistributionReward(TrackingQuantityReward):
    """RBF tracking of the vertical force distribution over the feet
    (reference `TrackingFootForceDistributionReward`,
    `compositions/locomotion.py:217`)."""

    def __init__(self, target, cutoff: float = 0.2):
        super().__init__(
            "reward_tracking_foot_force_distribution",
            MultiFootNormalizedForceVertical(),
            target,
            cutoff,
        )


class MinimizeAngularMomentumReward(QuantityReward):
    """RBF-shaped penalty on the base angular momentum (reference
    `MinimizeAngularMomentumReward`, `compositions/locomotion.py:257`)."""

    def __init__(self, cutoff: float = 0.5):
        super().__init__(
            "reward_momentum",
            AverageBaseMomentum(),
            transform=lambda h: radial_basis_function(h, cutoff),
            is_normalized=True,
        )


class MinimizeFrictionReward(QuantityReward):
    """RBF-shaped penalty on the tangential contact forces (reference
    `MinimizeFrictionReward`, `compositions/locomotion.py:284`)."""

    def __init__(self, cutoff: float = 0.5):
        super().__init__(
            "reward_friction",
            MultiContactNormalizedSpatialForce(),
            transform=lambda f: radial_basis_function(
                f[..., 0:2].reshape(f.shape[:-2] + (-1,)), cutoff
            ),
            is_normalized=True,
        )


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


# Reference name for the base-height fall check (`compositions/locomotion.py:358`)
FallingTermination = BaseHeightTermination


class FootCollisionTermination(QuantityTermination):
    """Terminate when two feet come closer than the security margin (reference
    `FootCollisionTermination`, `compositions/locomotion.py:401`)."""

    def __init__(self, security_margin: float = 0.02, grace_period: float = 0.0):
        super().__init__(
            "termination_foot_collision",
            MultiFootCollisionDetection(security_margin),
            high=0.5,  # quantity is boolean: True -> terminate
            grace_period=grace_period,
        )


class DriftTrackingBaseOdometryPositionTermination(DriftTrackingQuantityTermination):
    """Terminate when the base odometry position drifts too far from its
    target (reference `DriftTrackingBaseOdometryPositionTermination`,
    `compositions/locomotion.py:623`)."""

    def __init__(self, target, max_drift: float, grace_period: float = 0.0):
        from jiminy_tpu.quantities.generic import MaskedQuantity

        super().__init__(
            "termination_tracking_base_odometry_position",
            MaskedQuantity(BaseOdometryPose(), (0, 1)),
            target,
            max_drift,
            grace_period,
        )


class DriftTrackingBaseOdometryOrientationTermination(DriftTrackingQuantityTermination):
    """Terminate when the base yaw drifts too far from its target (reference
    `DriftTrackingBaseOdometryOrientationTermination`,
    `compositions/locomotion.py:686`)."""

    def __init__(self, target, max_drift: float, grace_period: float = 0.0):
        from jiminy_tpu.quantities.generic import MaskedQuantity, UnaryOpQuantity

        yaw = MaskedQuantity(BaseOdometryPose(), (2,))
        super().__init__(
            "termination_tracking_base_odometry_orientation",
            yaw,
            target,
            max_drift,
            grace_period,
        )

    def __call__(self, env, state):
        value = jnp.asarray(self.quantity(env, state))
        target = self.target(env, state) if callable(self.target) else self.target
        err = value - target
        err = jnp.arctan2(jnp.sin(err), jnp.cos(err))  # wrap angle
        out = jnp.linalg.norm(jnp.atleast_1d(err), axis=-1) > self.max_drift
        if self.grace_period > 0.0:
            out = out & (state.sim.t >= self.grace_period)
        return out


class ShiftTrackingFootOdometryPositionsTermination(ShiftTrackingQuantityTermination):
    """Terminate when the mean foot odometry position deviates too far from
    its target (reference `ShiftTrackingFootOdometryPositionsTermination`,
    `compositions/locomotion.py:739`)."""

    def __init__(self, target, max_shift: float, grace_period: float = 0.0):
        from jiminy_tpu.quantities.generic import MaskedQuantity

        super().__init__(
            "termination_tracking_foot_odometry_positions",
            MaskedQuantity(MultiFootMeanOdometryPose(), (0, 1)),
            target,
            max_shift,
            grace_period,
        )


class ShiftTrackingFootOdometryOrientationsTermination(
    DriftTrackingBaseOdometryOrientationTermination
):
    """Terminate when the mean foot yaw deviates too far from its target
    (reference `ShiftTrackingFootOdometryOrientationsTermination`,
    `compositions/locomotion.py:813`)."""

    def __init__(self, target, max_shift: float, grace_period: float = 0.0):
        from jiminy_tpu.quantities.generic import MaskedQuantity

        QuantityTermination.__init__(
            self,
            "termination_tracking_foot_odometry_orientations",
            MaskedQuantity(MultiFootMeanOdometryPose(), (2,)),
            grace_period=grace_period,
        )
        self.target = target
        self.max_drift = max_shift
