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


class BaseSpatialAverageVelocity(Quantity):
    """Average spatial velocity (angular, linear) of the floating base over
    the last env step, expressed in the local odometry frame: z world-aligned,
    x/y local — the yaw-free midpoint orientation applied to the local
    geodesic average velocity (reference `BaseSpatialAverageVelocity`,
    `quantities/locomotion.py:223`).  Falls back to the instantaneous local
    velocity (same odometry-frame alignment) when no carry is attached."""

    # Distinct namespace from _DifferenceFrameXYZQuat's f"_xyzquat::{frame}"
    # keys: a robot may legitimately have a frame named "base", and the two
    # specs snapshot different poses (raw q[0:7] vs FK of that frame).
    _CARRY = "_xyzquat::__floating_base__"

    def carries(self):
        from jiminy_tpu.quantities.generic import Quantity as _Q

        class _BasePose(_Q):
            def __call__(self, env, state):
                return state.sim.q[..., 0:7]

        return {self._CARRY: _BasePose()}

    def __call__(self, env, state):
        from jiminy_tpu.quantities.generic import remove_yaw

        q, v = state.sim.q, state.sim.v
        now = q[..., 0:7]
        prev = state.blocks.get("quantity_delta", {}).get(self._CARRY)
        if prev is None:
            v_local = jnp.concatenate([v[..., 3:6], v[..., 0:3]], axis=-1)
            quat_no_yaw = remove_yaw(q[..., 3:7])
        else:
            diff = lie.xyzquat_difference(prev, now)
            v_local = diff / env.step_dt
            mid = lie.xyzquat_integrate(now, -0.5 * diff)
            quat_no_yaw = remove_yaw(mid[..., 3:7])
        return jnp.concatenate(
            [
                lie.quat_rotate(quat_no_yaw, v_local[..., 0:3]),
                lie.quat_rotate(quat_no_yaw, v_local[..., 3:6]),
            ],
            axis=-1,
        )


class BaseOdometryAverageVelocity(Quantity):
    """Average odometry velocity (vx, vy, wz) of the floating base in the
    local odometry frame over the last env step (reference
    `BaseOdometryAverageVelocity`, `quantities/locomotion.py:292`)."""

    def __init__(self):
        self.inner = BaseSpatialAverageVelocity()

    def carries(self):
        return self.inner.carries()

    def __call__(self, env, state):
        v6 = self.inner(env, state)  # (angular, linear)
        return jnp.stack([v6[..., 3], v6[..., 4], v6[..., 2]], axis=-1)


class AverageBaseMomentum(Quantity):
    """Angular momentum of the floating base in the local odometry (yaw-free)
    frame: R_no_yaw · (I_base · ω_local) (reference `AverageBaseMomentum`,
    `quantities/locomotion.py:344`)."""

    def __call__(self, env, state):
        from jiminy_tpu.quantities.generic import remove_yaw

        model = env.robot.model
        q, v = state.sim.q, state.sim.v
        inertia = model.inertia[..., 0, :, :]  # base body angular inertia
        w_local = v[..., 3:6]
        h = lie.mv(inertia, w_local)
        quat_no_yaw = remove_yaw(q[..., 3:7])
        return lie.quat_rotate(quat_no_yaw, h)


def foot_frames(env):
    """Foot contact frames grouped by parent joint: {joint_index: [frame_idx]}
    (the reference auto-detects feet from the contact-frame tree)."""
    model = env.robot.model
    groups: dict = {}
    for fidx in env.robot.contact_frame_indices:
        groups.setdefault(model.frame_parents[fidx], []).append(fidx)
    return groups


class MultiFootMeanXYZQuat(Quantity):
    """Mean pose of all feet: average position + quaternion average of the
    foot body placements (reference `MultiFootMeanXYZQuat`,
    `quantities/locomotion.py:416`)."""

    def __call__(self, env, state):
        model = env.robot.model
        kin = forward_kinematics(model, state.sim.q)
        poses = []
        for j in foot_frames(env):
            pos = kin.omi.pos[..., j, :]
            quat = lie.mat_to_quat(kin.omi.rot[..., j, :, :])
            poses.append(jnp.concatenate([pos, quat], axis=-1))
        poses = jnp.stack(poses, axis=-2)
        return jnp.concatenate(
            [
                jnp.mean(poses[..., 0:3], axis=-2),
                lie.quat_average(poses[..., 3:7], axis=-2),
            ],
            axis=-1,
        )


class MultiFootMeanOdometryPose(Quantity):
    """(x, y, yaw) of the mean foot pose (reference `MultiFootMeanOdometryPose`,
    `quantities/locomotion.py:482`)."""

    def __call__(self, env, state):
        mean = MultiFootMeanXYZQuat()(env, state)
        quat = mean[..., 3:7]
        yaw = jnp.arctan2(
            2.0 * (quat[..., 3] * quat[..., 2] + quat[..., 0] * quat[..., 1]),
            1.0 - 2.0 * (quat[..., 1] ** 2 + quat[..., 2] ** 2),
        )
        return jnp.stack([mean[..., 0], mean[..., 1], yaw], axis=-1)


class MultiFootRelativeXYZQuat(Quantity):
    """Poses (..., nfeet, 7) of every foot relative to the mean foot pose
    (reference `MultiFootRelativeXYZQuat`, `quantities/locomotion.py:702`)."""

    def __call__(self, env, state):
        model = env.robot.model
        kin = forward_kinematics(model, state.sim.q)
        mean = MultiFootMeanXYZQuat()(env, state)
        mean_rot = lie.quat_to_mat(mean[..., 3:7])
        mean_rot_t = jnp.swapaxes(mean_rot, -1, -2)
        out = []
        for j in foot_frames(env):
            rel_p = lie.mv(mean_rot_t, kin.omi.pos[..., j, :] - mean[..., 0:3])
            rel_r = lie.mm(mean_rot_t, kin.omi.rot[..., j, :, :])
            out.append(jnp.concatenate([rel_p, lie.mat_to_quat(rel_r)], axis=-1))
        return jnp.stack(out, axis=-2)


class MultiContactNormalizedSpatialForce(Quantity):
    """All contact forces stacked and normalized by the robot's weight
    (reference `MultiContactNormalizedSpatialForce`,
    `quantities/locomotion.py:1158`)."""

    def __call__(self, env, state):
        model = env.robot.model
        weight = jnp.sum(model.mass, axis=-1) * jnp.linalg.norm(
            env.engine.gravity, axis=-1
        )
        return state.sim.contact_forces / weight[..., None, None]


class MultiFootNormalizedForceVertical(Quantity):
    """Vertical ground reaction per foot (contact forces summed per foot
    body), normalized by the robot's weight (reference
    `MultiFootNormalizedForceVertical`, `quantities/locomotion.py:1315`)."""

    def __call__(self, env, state):
        model = env.robot.model
        weight = jnp.sum(model.mass, axis=-1) * jnp.linalg.norm(
            env.engine.gravity, axis=-1
        )
        frames = list(env.robot.contact_frame_indices)
        out = []
        for j, fidxs in foot_frames(env).items():
            fz = 0.0
            for fidx in fidxs:
                k = frames.index(fidx)
                fz = fz + state.sim.contact_forces[..., k, 2]
            out.append(fz / weight)
        return jnp.stack(out, axis=-1)


class MultiFootCollisionDetection(Quantity):
    """True when two feet are closer than the security margin (reference
    `MultiFootCollisionDetection`, `quantities/locomotion.py:1485`; feet are
    sphere-swept contact-point sets, matching the primitive narrow phase)."""

    def __init__(self, security_margin: float = 0.02):
        self.security_margin = security_margin

    def __call__(self, env, state):
        from jiminy_tpu.ops.kinematics import frame_placement

        model = env.robot.model
        kin = forward_kinematics(model, state.sim.q)
        groups = list(foot_frames(env).values())
        hit = jnp.asarray(False)
        for i in range(len(groups)):
            for j in range(i + 1, len(groups)):
                for fa in groups[i]:
                    for fb in groups[j]:
                        pa = frame_placement(model, kin, fa).pos
                        pb = frame_placement(model, kin, fb).pos
                        d = jnp.linalg.norm(pa - pb, axis=-1)
                        hit = hit | (d < self.security_margin)
        return hit


class DeltaBaseOdometryPosition(Quantity):
    """Drift of the base odometry position (x, y) since the carry snapshot
    (reference `DeltaBaseOdometryPosition`, `quantities/locomotion.py:1537`;
    the horizon is set by how often `QuantityManager.attach_delta` snapshots)."""

    def __init__(self, name: str = "base_odometry_position"):
        from jiminy_tpu.quantities.generic import DeltaQuantity, MaskedQuantity

        self.inner = DeltaQuantity(
            MaskedQuantity(BaseOdometryPose(), (0, 1)), name
        )

    def __call__(self, env, state):
        return self.inner(env, state)


class DeltaBaseOdometryOrientation(Quantity):
    """Drift of the base yaw since the carry snapshot (reference
    `DeltaBaseOdometryOrientation`, `quantities/locomotion.py:1631`)."""

    def __init__(self, name: str = "base_odometry_yaw"):
        from jiminy_tpu.quantities.generic import DeltaQuantity, MaskedQuantity

        self.inner = DeltaQuantity(MaskedQuantity(BaseOdometryPose(), (2,)), name)

    def __call__(self, env, state):
        delta = self.inner(env, state)
        return jnp.arctan2(jnp.sin(delta), jnp.cos(delta))  # wrap to (-pi, pi]
