"""Locomotion quantities: CoM, ZMP, capture point, base odometry
(reference `quantities/locomotion.py:101-1693`)."""

from __future__ import annotations

import jax.numpy as jnp

from jiminy_tpu.ops import lie
from jiminy_tpu.ops.kinematics import forward_kinematics
from jiminy_tpu.quantities.generic import Quantity


def com_position(model, kin):
    """Whole-body CoM in world frame."""
    total_m = jnp.sum(model.mass, axis=-1)
    pos = 0.0
    for i in range(model.njoints):
        c_w = lie.se3_apply(
            lie.SE3(kin.omi.rot[..., i, :, :], kin.omi.pos[..., i, :]),
            model.com[..., i, :],
        )
        pos = pos + model.mass[..., i, None] * c_w
    return pos / jnp.maximum(total_m[..., None], 1e-12)


def com_velocity(model, kin):
    """CoM velocity in world frame (from LOCAL body spatial velocities)."""
    total_m = jnp.sum(model.mass, axis=-1)
    vel = 0.0
    for i in range(model.njoints):
        rot = kin.omi.rot[..., i, :, :]
        w, v = kin.vel[..., i, 0:3], kin.vel[..., i, 3:6]
        v_com_local = v + jnp.cross(w, model.com[..., i, :])
        vel = vel + model.mass[..., i, None] * lie.mv(rot, v_com_local)
    return vel / jnp.maximum(total_m[..., None], 1e-12)


def com_acceleration(model, kin):
    """Classical CoM acceleration in world frame (needs kin computed with a)."""
    total_m = jnp.sum(model.mass, axis=-1)
    acc = 0.0
    for i in range(model.njoints):
        rot = kin.omi.rot[..., i, :, :]
        w = kin.vel[..., i, 0:3]
        dw, dv = kin.acc[..., i, 0:3], kin.acc[..., i, 3:6]
        c = model.com[..., i, :]
        a_local = dv + jnp.cross(dw, c) + jnp.cross(w, jnp.cross(w, c) + kin.vel[..., i, 3:6])
        acc = acc + model.mass[..., i, None] * lie.mv(rot, a_local)
    return acc / jnp.maximum(total_m[..., None], 1e-12)


class CenterOfMass(Quantity):
    """CoM position (reference `CenterOfMass` kinematic level 0)."""

    def __call__(self, env, state):
        model = env.robot.model
        kin = forward_kinematics(model, state.sim.q)
        return com_position(model, kin)


class CenterOfMassVelocity(Quantity):
    def __call__(self, env, state):
        model = env.robot.model
        kin = forward_kinematics(model, state.sim.q, state.sim.v)
        return com_velocity(model, kin)


class ZeroMomentPoint(Quantity):
    """ZMP from CoM dynamics on flat ground (reference `ZeroMomentPoint`):
    zmp_xy = c_xy − c_z·a_xy / (g + a_z), neglecting the centroidal angular
    momentum rate (point-mass model, the standard approximation)."""

    def __call__(self, env, state):
        model = env.robot.model
        sim = state.sim
        kin = forward_kinematics(model, sim.q, sim.v, sim.a)
        c = com_position(model, kin)
        a = com_acceleration(model, kin)
        g = -env.engine.gravity[..., 2]
        denom = jnp.maximum(g + a[..., 2], 1e-6)
        return c[..., 0:2] - c[..., 2:3] * a[..., 0:2] / denom[..., None]


class CapturePoint(Quantity):
    """Instantaneous capture point / DCM: ξ = c_xy + ċ_xy/ω, ω = sqrt(g/c_z)
    (reference `CapturePoint`)."""

    def __call__(self, env, state):
        model = env.robot.model
        kin = forward_kinematics(model, state.sim.q, state.sim.v)
        c = com_position(model, kin)
        dc = com_velocity(model, kin)
        g = -env.engine.gravity[..., 2]
        omega = jnp.sqrt(g / jnp.maximum(c[..., 2], 1e-6))
        return c[..., 0:2] + dc[..., 0:2] / omega[..., None]


class BaseOdometryPose(Quantity):
    """(x, y, yaw) of the floating base (reference `BaseOdometryPose`)."""

    def __call__(self, env, state):
        q = state.sim.q
        quat = q[..., 3:7]
        yaw = jnp.arctan2(
            2.0 * (quat[..., 3] * quat[..., 2] + quat[..., 0] * quat[..., 1]),
            1.0 - 2.0 * (quat[..., 1] ** 2 + quat[..., 2] ** 2),
        )
        return jnp.stack([q[..., 0], q[..., 1], yaw], axis=-1)


class BaseOdometryVelocity(Quantity):
    """(vx, vy, wz) of the base in the horizontal (yaw-aligned world) frame
    (reference `BaseOdometryAverageVelocity`)."""

    def __call__(self, env, state):
        q, v = state.sim.q, state.sim.v
        quat = q[..., 3:7]
        # World-frame base linear velocity (freeflyer v is LOCAL)
        rot = lie.quat_to_mat(quat)
        v_world = lie.mv(rot, v[..., 0:3])
        w_world = lie.mv(rot, v[..., 3:6])
        yaw = jnp.arctan2(
            2.0 * (quat[..., 3] * quat[..., 2] + quat[..., 0] * quat[..., 1]),
            1.0 - 2.0 * (quat[..., 1] ** 2 + quat[..., 2] ** 2),
        )
        c, s = jnp.cos(yaw), jnp.sin(yaw)
        vx = c * v_world[..., 0] + s * v_world[..., 1]
        vy = -s * v_world[..., 0] + c * v_world[..., 1]
        return jnp.stack([vx, vy, w_world[..., 2]], axis=-1)


class BaseRelativeHeight(Quantity):
    """Base height above the ground profile (reference `BaseRelativeHeight`)."""

    def __call__(self, env, state):
        q = state.sim.q
        ground = env.engine.ground_fn
        if ground is None:
            return q[..., 2]
        h, _ = ground(q[..., 0:2])
        return q[..., 2] - h
