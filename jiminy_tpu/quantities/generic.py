"""Generic quantities: frame kinematics, energies, and transform combinators
(reference `quantities/generic.py:176-1887` + `quantities/transform.py`)."""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import jax.numpy as jnp

from jiminy_tpu.ops import dynamics as dyn
from jiminy_tpu.ops import lie
from jiminy_tpu.ops.kinematics import (
    forward_kinematics,
    frame_placement,
    frame_velocity_local,
    frame_velocity_world_aligned,
)


class Quantity:
    """Base: a pure callable `(env, env_state) -> jnp value`."""

    def __call__(self, env, state):
        raise NotImplementedError

    def carries(self) -> dict:
        """Named inner quantities whose end-of-step values must be carried
        into the next step (written by `ComposedEnv` into
        `state.blocks['quantity_delta']`).  The TPU-native replacement of the
        reference's auto-refreshed `StackedQuantity` requirements
        (`bases/quantities.py:159` SharedCache + transform stacks): history is
        explicit carried state instead of a host-side ring."""
        return {}


def _kin(env, state, with_velocity=False):
    model = env.robot.model
    sim = state.sim
    if with_velocity:
        return model, forward_kinematics(model, sim.q, sim.v)
    return model, forward_kinematics(model, sim.q)


class FramePosition(Quantity):
    """World position of a frame (reference `FramePosition`)."""

    def __init__(self, frame_name: str):
        self.frame_name = frame_name

    def __call__(self, env, state):
        model, kin = _kin(env, state)
        return frame_placement(model, kin, model.frame_index(self.frame_name)).pos


class FrameOrientation(Quantity):
    """World rotation matrix of a frame (reference `FrameOrientation`)."""

    def __init__(self, frame_name: str):
        self.frame_name = frame_name

    def __call__(self, env, state):
        model, kin = _kin(env, state)
        return frame_placement(model, kin, model.frame_index(self.frame_name)).rot


class FrameSpatialVelocity(Quantity):
    """Spatial velocity (ang, lin) of a frame, LOCAL or world-aligned
    (reference `FrameSpatialAverageVelocity` family)."""

    def __init__(self, frame_name: str, world_aligned: bool = True):
        self.frame_name = frame_name
        self.world_aligned = world_aligned

    def __call__(self, env, state):
        model, kin = _kin(env, state, with_velocity=True)
        fidx = model.frame_index(self.frame_name)
        if self.world_aligned:
            return frame_velocity_world_aligned(model, kin, fidx)
        return frame_velocity_local(model, kin, fidx)


class _DifferenceFrameXYZQuat(Quantity):
    """Geodesic SE(3) difference of a frame pose between the previous and
    current env step, as a LOCAL-frame (angular, linear) twist (reference
    `_DifferenceFrameXYZQuat`, `quantities/generic.py:1203`).  The previous
    pose is carried in `state.blocks['quantity_delta']` by `ComposedEnv`;
    before the first step the twist is zero."""

    def __init__(self, frame_name: str):
        self.frame_name = frame_name
        self.carry_name = f"_xyzquat::{frame_name}"
        self.pose = FrameXYZQuat(frame_name)

    def carries(self):
        return {self.carry_name: self.pose}

    def __call__(self, env, state):
        now = self.pose(env, state)
        prev = state.blocks.get("quantity_delta", {}).get(self.carry_name)
        if prev is None:
            return jnp.zeros(now.shape[:-1] + (6,), now.dtype)
        return lie.xyzquat_difference(prev, now)


class AverageFrameXYZQuat(Quantity):
    """Midpoint pose of a frame over the last env step, obtained by
    integrating half the SE(3) step difference backward from the end-of-step
    pose (reference `AverageFrameXYZQuat`, `quantities/generic.py:1290`).
    Falls back to the instantaneous pose when no carry is attached."""

    def __init__(self, frame_name: str):
        self.pose = FrameXYZQuat(frame_name)
        self.diff = _DifferenceFrameXYZQuat(frame_name)

    def carries(self):
        return self.diff.carries()

    def __call__(self, env, state):
        now = self.pose(env, state)
        return lie.xyzquat_integrate(now, -0.5 * self.diff(env, state))


class AverageFrameSpatialVelocity(Quantity):
    """Finite-difference average spatial velocity of a frame over the last
    env step: SE(3) step difference over `step_dt`, expressed in the midpoint
    local frame, optionally re-aligned with world axes (reference
    `FrameSpatialAverageVelocity`, `quantities/generic.py:1428`).  Falls back
    to the instantaneous spatial velocity when no carry is attached."""

    def __init__(self, frame_name: str, world_aligned: bool = False):
        self.frame_name = frame_name
        self.world_aligned = world_aligned
        self.diff = _DifferenceFrameXYZQuat(frame_name)
        self.mean_pose = AverageFrameXYZQuat(frame_name)
        self.instantaneous = FrameSpatialVelocity(frame_name, world_aligned)

    def carries(self):
        return self.diff.carries()

    def __call__(self, env, state):
        prev = state.blocks.get("quantity_delta", {}).get(self.diff.carry_name)
        if prev is None:
            return self.instantaneous(env, state)
        v_local = self.diff(env, state) / env.step_dt
        if not self.world_aligned:
            return v_local
        # Re-align with world axes using the midpoint orientation (the frame
        # in which the geodesic twist is naturally expressed).
        quat_mid = self.mean_pose(env, state)[..., 3:7]
        return jnp.concatenate(
            [
                lie.quat_rotate(quat_mid, v_local[..., 0:3]),
                lie.quat_rotate(quat_mid, v_local[..., 3:6]),
            ],
            axis=-1,
        )


# Reference class name (`quantities/generic.py:1429`)
FrameSpatialAverageVelocity = AverageFrameSpatialVelocity


class FrameXYZQuat(Quantity):
    """World pose of a frame as (x, y, z, qx, qy, qz, qw) (reference
    `FrameXYZQuat`, `quantities/generic.py:812`)."""

    def __init__(self, frame_name: str):
        self.frame_name = frame_name

    def __call__(self, env, state):
        model, kin = _kin(env, state)
        fpl = frame_placement(model, kin, model.frame_index(self.frame_name))
        return jnp.concatenate([fpl.pos, lie.mat_to_quat(fpl.rot)], axis=-1)


class MultiFrameXYZQuat(Quantity):
    """Stacked world poses (..., n, 7) of several frames in one FK pass
    (reference `MultiFrameXYZQuat`, `quantities/generic.py:880`)."""

    def __init__(self, frame_names: Sequence[str]):
        self.frame_names = tuple(frame_names)

    def __call__(self, env, state):
        model, kin = _kin(env, state)
        out = []
        for n in self.frame_names:
            fpl = frame_placement(model, kin, model.frame_index(n))
            out.append(jnp.concatenate([fpl.pos, lie.mat_to_quat(fpl.rot)], axis=-1))
        return jnp.stack(out, axis=-2)


class MultiFrameMeanXYZQuat(Quantity):
    """Mean pose of several frames: arithmetic mean position + quaternion
    average (reference `MultiFrameMeanXYZQuat`, `quantities/generic.py:984`)."""

    def __init__(self, frame_names: Sequence[str]):
        self.inner = MultiFrameXYZQuat(frame_names)

    def __call__(self, env, state):
        poses = self.inner(env, state)
        pos = jnp.mean(poses[..., 0:3], axis=-2)
        quat = lie.quat_average(poses[..., 3:7], axis=-2)
        return jnp.concatenate([pos, quat], axis=-1)


def remove_yaw(quat: jnp.ndarray) -> jnp.ndarray:
    """Quaternion with the yaw component removed (roll-pitch only): conjugate
    by the inverse yaw rotation (reference `remove_yaw_from_quat`)."""
    yaw = jnp.arctan2(
        2.0 * (quat[..., 3] * quat[..., 2] + quat[..., 0] * quat[..., 1]),
        1.0 - 2.0 * (quat[..., 1] ** 2 + quat[..., 2] ** 2),
    )
    half = -0.5 * yaw
    q_yaw_inv = jnp.stack(
        [
            jnp.zeros_like(half),
            jnp.zeros_like(half),
            jnp.sin(half),
            jnp.cos(half),
        ],
        axis=-1,
    )
    return lie.quat_mul(q_yaw_inv, quat)


class AverageFrameRollPitch(Quantity):
    """Yaw-free orientation (roll-pitch quaternion) of the midpoint frame
    pose over the last env step (reference `AverageFrameRollPitch`,
    `quantities/generic.py:1364`, built on `AverageFrameXYZQuat`)."""

    def __init__(self, frame_name: str):
        self.frame_name = frame_name
        self.mean_pose = AverageFrameXYZQuat(frame_name)

    def carries(self):
        return self.mean_pose.carries()

    def __call__(self, env, state):
        return remove_yaw(self.mean_pose(env, state)[..., 3:7])


class MultiActuatedJointKinematic(Quantity):
    """Positions or velocities of all actuated (motor-side or joint-side)
    1-dof joints, in motor order (reference `MultiActuatedJointKinematic`,
    `quantities/generic.py:1538`)."""

    def __init__(self, kinematic_level: str = "position", motor_side: bool = False):
        if kinematic_level not in ("position", "velocity"):
            raise ValueError("kinematic_level must be 'position' or 'velocity'")
        self.kinematic_level = kinematic_level
        self.motor_side = motor_side

    def __call__(self, env, state):
        motors = env.robot.motors
        sim = state.sim
        if self.kinematic_level == "position":
            idx = jnp.asarray(motors.q_indices, jnp.int32)
            val = jnp.take(sim.q, idx, axis=-1)
        else:
            idx = jnp.asarray(motors.v_indices, jnp.int32)
            val = jnp.take(sim.v, idx, axis=-1)
        if self.motor_side:
            val = val * motors.mechanical_reduction
        return val


class EnergyGenerationMode:
    """What happens to the energy generated by motors when braking (reference
    `EnergyGenerationMode`, `quantities/generic.py:1694`): CHARGE flows back
    to the battery (signed sum), LOST_EACH dissipates each motor's generated
    energy individually (per-motor clamp at 0), LOST_GLOBAL dissipates only a
    net-negative total (global clamp at 0), PENALIZE counts generation as
    consumption (absolute sum)."""

    CHARGE = "charge"
    LOST_EACH = "lost_each"
    LOST_GLOBAL = "lost_global"
    PENALIZE = "penalize"

    ALL = (CHARGE, LOST_EACH, LOST_GLOBAL, PENALIZE)


class MechanicalPowerConsumption(Quantity):
    """Instantaneous total mechanical power consumption of the motors under a
    given `EnergyGenerationMode` (reference `MechanicalPowerConsumption` +
    `compute_power`, `quantities/generic.py:1723-1750`)."""

    def __init__(self, generator_mode: str = EnergyGenerationMode.PENALIZE):
        if generator_mode not in EnergyGenerationMode.ALL:
            raise ValueError(f"unknown generator_mode {generator_mode!r}")
        self.generator_mode = generator_mode

    def __call__(self, env, state):
        sim = state.sim
        motors = env.robot.motors
        vidx = jnp.asarray(motors.v_indices, jnp.int32)
        v_motor = jnp.take(sim.v, vidx, axis=-1) * motors.mechanical_reduction
        power = sim.u_motor * v_motor
        mode = self.generator_mode
        if mode == EnergyGenerationMode.CHARGE:
            return jnp.sum(power, axis=-1)
        if mode == EnergyGenerationMode.LOST_GLOBAL:
            return jnp.maximum(jnp.sum(power, axis=-1), 0.0)
        if mode == EnergyGenerationMode.LOST_EACH:
            return jnp.sum(jnp.maximum(power, 0.0), axis=-1)
        return jnp.sum(jnp.abs(power), axis=-1)


class AverageMechanicalPowerConsumption(MechanicalPowerConsumption):
    """Power consumption averaged over the last env step. The functional env
    evaluates per step (ZOH command), so the end-of-step instantaneous value
    is the step average (reference `AverageMechanicalPowerConsumption`,
    `quantities/generic.py:1820`, trace-window variant)."""


class MultiFrameCollisionDetection(Quantity):
    """True when any pair of the given frames is closer than a security
    margin — sphere-swept point approximation of the reference's hpp-fcl
    geometry pairs (reference `MultiFrameCollisionDetection`,
    `quantities/generic.py:1066`)."""

    def __init__(self, frame_names: Sequence[str], security_margin: float = 0.0):
        self.frame_names = tuple(frame_names)
        self.security_margin = security_margin

    def __call__(self, env, state):
        model, kin = _kin(env, state)
        pos = [
            frame_placement(model, kin, model.frame_index(n)).pos
            for n in self.frame_names
        ]
        hit = jnp.asarray(False)
        for i in range(len(pos)):
            for j in range(i + 1, len(pos)):
                d = jnp.linalg.norm(pos[i] - pos[j], axis=-1)
                hit = hit | (d < self.security_margin)
        return hit


class MultiFramePosition(Quantity):
    """Batched world positions of several frames in one FK pass (the
    reference's batched frame-kinematics optimization comes for free here)."""

    def __init__(self, frame_names: Sequence[str]):
        self.frame_names = tuple(frame_names)

    def __call__(self, env, state):
        model, kin = _kin(env, state)
        return jnp.stack(
            [
                frame_placement(model, kin, model.frame_index(n)).pos
                for n in self.frame_names
            ],
            axis=-2,
        )


class EnergyQuantity(Quantity):
    """Total mechanical energy (kinetic + potential)."""

    def __init__(self, kinetic: bool = True, potential: bool = True):
        self.kinetic = kinetic
        self.potential = potential

    def __call__(self, env, state):
        model = env.robot.model
        sim = state.sim
        e = jnp.asarray(0.0, sim.q.dtype)
        if self.kinetic:
            e = e + dyn.kinetic_energy(model, sim.q, sim.v)
        if self.potential:
            e = e + dyn.potential_energy(model, env.engine.gravity, sim.q)
        return e


# --------------------------------------------------------------------------- #
# Transform combinators (reference quantities/transform.py)
# --------------------------------------------------------------------------- #


class MaskedQuantity(Quantity):
    def __init__(self, inner: Quantity, indices: Sequence[int], axis: int = -1):
        self.inner = inner
        self.indices = tuple(indices)
        self.axis = axis

    def carries(self):
        return getattr(self.inner, "carries", dict)()

    def __call__(self, env, state):
        return jnp.take(self.inner(env, state), jnp.asarray(self.indices), axis=self.axis)


class MultiFrameOrientation(Quantity):
    """Stacked world rotations (..., n, 3, 3) of several frames in one FK
    pass (reference `MultiFrameOrientation`, `quantities/generic.py:700`)."""

    def __init__(self, frame_names: Sequence[str]):
        self.frame_names = tuple(frame_names)

    def __call__(self, env, state):
        model, kin = _kin(env, state)
        return jnp.stack(
            [
                frame_placement(model, kin, model.frame_index(n)).rot
                for n in self.frame_names
            ],
            axis=-3,
        )


class OrientationType:
    """Representation selector for orientation quantities (reference
    `quantities/generic.py OrientationType` enum)."""

    MATRIX = "matrix"
    QUATERNION = "quaternion"
    RPY = "rpy"
    ANGLE_AXIS = "angle_axis"


class UnaryOpQuantity(Quantity):
    def __init__(self, inner: Quantity, op: Callable):
        self.inner = inner
        self.op = op

    def carries(self):
        return getattr(self.inner, "carries", dict)()

    def __call__(self, env, state):
        return self.op(self.inner(env, state))


class MultiAryOpQuantity(Quantity):
    """`op(*values)` over any number of inner quantities (reference
    `MultiAryOpQuantity`, `quantities/transform.py`)."""

    def __init__(self, inners: Sequence[Quantity], op: Callable):
        self.inners = tuple(inners)
        self.op = op

    def carries(self):
        out = {}
        for q in self.inners:
            out.update(getattr(q, "carries", dict)())
        return out

    def __call__(self, env, state):
        return self.op(*[q(env, state) for q in self.inners])


class BinaryOpQuantity(Quantity):
    def __init__(self, left: Quantity, right: Quantity, op: Callable):
        self.left = left
        self.right = right
        self.op = op

    def carries(self):
        return {**getattr(self.left, "carries", dict)(),
                **getattr(self.right, "carries", dict)()}

    def __call__(self, env, state):
        return self.op(self.left(env, state), self.right(env, state))


class ConcatenatedQuantity(Quantity):
    def __init__(self, *inners: Quantity, axis: int = -1):
        self.inners = inners
        self.axis = axis

    def carries(self):
        out = {}
        for q in self.inners:
            out.update(getattr(q, "carries", dict)())
        return out

    def __call__(self, env, state):
        return jnp.concatenate([q(env, state) for q in self.inners], axis=self.axis)


class DeltaQuantity(Quantity):
    """Difference between the quantity now and at the previous env step; the
    previous value is carried in `state.blocks['quantity_delta']`, written by
    `ComposedEnv` when built with a `QuantityManager` (reference
    `DeltaQuantity` over a horizon)."""

    def __init__(self, inner: Quantity, name: str):
        self.inner = inner
        self.name = name

    def carries(self):
        inner_carries = getattr(self.inner, "carries", dict)()
        return {self.name: self.inner, **inner_carries}

    def __call__(self, env, state):
        current = self.inner(env, state)
        prev = state.blocks.get("quantity_delta", {}).get(self.name, current)
        return current - prev


class StackedQuantity(Quantity):
    """Last `num_stack` values of the inner quantity, stacked along a new
    leading axis, oldest first (reference `StackedQuantity`,
    `quantities/transform.py`).  The history ring is carried in
    `state.blocks['quantity_stack'][name]` (written by `ComposedEnv` built
    with a `QuantityManager`); before enough env steps have elapsed the
    buffer is pre-filled with the reset-time value."""

    def __init__(self, inner: Quantity, name: str, num_stack: int):
        self.inner = inner
        self.name = name
        self.num_stack = int(num_stack)

    def __call__(self, env, state):
        current = jnp.asarray(self.inner(env, state))
        buf = state.blocks.get("quantity_stack", {}).get(self.name)
        if buf is None:
            return jnp.stack([current] * self.num_stack, axis=0)
        return jnp.concatenate([buf[1:], current[None]], axis=0)
