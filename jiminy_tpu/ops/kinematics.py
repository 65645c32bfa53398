"""Forward kinematics, frame kinematics and Jacobians.

These are the XLA-native equivalents of the pinocchio kinematics the reference engine
calls every dynamics evaluation (`Engine::computeForwardKinematics`, reference
`core/src/engine/engine.cc:2957-3014`; frame velocity/acceleration getters used by
sensors and constraints).

Design: the kinematic tree is static, so every function is a trace-time Python loop
over joints producing a fixed op graph; `vmap` adds the env batch axis.  Spatial
quantities are expressed in the LOCAL (moving joint/frame) coordinates, with helpers
for the LOCAL_WORLD_ALIGNED convention used by contacts.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax.numpy as jnp

from jiminy_tpu.models import joints as jt
from jiminy_tpu.models.model import RobotModel
from jiminy_tpu.ops import lie


class KinData(NamedTuple):
    """Stacked per-joint kinematics: world placements + LOCAL spatial vel/acc."""

    omi: lie.SE3  # rot (nj, 3, 3), pos (nj, 3): joint (moving) frames in world
    vel: jnp.ndarray  # (nj, 6) spatial velocity, LOCAL joint frame
    acc: jnp.ndarray  # (nj, 6) spatial acceleration, LOCAL joint frame (gravity-free)


def joint_child_placements(model: RobotModel, q: jnp.ndarray) -> list[lie.SE3]:
    """Placement of each joint's moving frame in its *parent joint* moving frame:
    X_i = X_tree_i o XJ_i(q_i)."""
    xs = []
    for i in range(model.njoints):
        q_j = q[..., model.q_slice(i)]
        xj = jt.joint_transform(model.joint_types[i], model.joint_axes[..., i, :], q_j)
        xs.append(lie.se3_mul(model.joint_placement(i), xj))
    return xs


def forward_kinematics(
    model: RobotModel,
    q: jnp.ndarray,
    v: Optional[jnp.ndarray] = None,
    a: Optional[jnp.ndarray] = None,
) -> KinData:
    """FK of positions (and optionally spatial velocities/accelerations)."""
    xs = joint_child_placements(model, q)
    omi_list: list[lie.SE3] = []
    vel_list: list[jnp.ndarray] = []
    acc_list: list[jnp.ndarray] = []
    dtype = q.dtype
    batch = q.shape[:-1]
    zero6 = jnp.zeros(batch + (6,), dtype=dtype)

    for i in range(model.njoints):
        parent = model.parents[i]
        x_i = xs[i]
        omi_p = omi_list[parent] if parent >= 0 else lie.se3_identity(dtype, batch)
        omi_list.append(lie.se3_mul(omi_p, x_i))

        if v is not None:
            s_i = jt.motion_subspace(model.joint_types[i], model.joint_axes[..., i, :])
            vq = v[..., model.v_slice(i)]
            vj = lie.mv(s_i, vq)
            v_p = vel_list[parent] if parent >= 0 else zero6
            v_i = lie.motion_act_inv(x_i, v_p) + vj
            vel_list.append(v_i)
            if a is not None:
                aq = a[..., model.v_slice(i)]
                aj = lie.mv(s_i, aq)
                a_p = acc_list[parent] if parent >= 0 else zero6
                a_i = lie.motion_act_inv(x_i, a_p) + aj + lie.motion_cross(v_i, vj)
                acc_list.append(a_i)

    omi = lie.SE3(
        jnp.stack([t.rot for t in omi_list], axis=-3) if omi_list else jnp.zeros(batch + (0, 3, 3), dtype),
        jnp.stack([t.pos for t in omi_list], axis=-2) if omi_list else jnp.zeros(batch + (0, 3), dtype),
    )
    vel = jnp.stack(vel_list, axis=-2) if vel_list else jnp.zeros(batch + (0, 6), dtype)
    acc = jnp.stack(acc_list, axis=-2) if acc_list else jnp.zeros(batch + (0, 6), dtype)
    return KinData(omi, vel, acc)


# --------------------------------------------------------------------------- #
# Frame kinematics
# --------------------------------------------------------------------------- #


def _parent_omi(model: RobotModel, kin: KinData, frame_idx: int) -> lie.SE3:
    parent = model.frame_parents[frame_idx]
    if parent < 0:
        rot = jnp.broadcast_to(
            jnp.eye(3, dtype=kin.omi.rot.dtype), kin.omi.rot.shape[:-3] + (3, 3)
        )
        return lie.SE3(rot, jnp.zeros(kin.omi.pos.shape[:-2] + (3,), kin.omi.pos.dtype))
    return lie.SE3(kin.omi.rot[..., parent, :, :], kin.omi.pos[..., parent, :])


def frame_placement(model: RobotModel, kin: KinData, frame_idx: int) -> lie.SE3:
    """World placement of a frame (pinocchio oMf)."""
    return lie.se3_mul(_parent_omi(model, kin, frame_idx), model.frame_placement(frame_idx))


def frame_velocity_local(model: RobotModel, kin: KinData, frame_idx: int) -> jnp.ndarray:
    """Spatial velocity of a frame in LOCAL frame coordinates, (ang, lin)."""
    parent = model.frame_parents[frame_idx]
    if parent < 0:
        return jnp.zeros(kin.vel.shape[:-2] + (6,), kin.vel.dtype)
    return lie.motion_act_inv(model.frame_placement(frame_idx), kin.vel[..., parent, :])


def frame_velocity_world_aligned(model: RobotModel, kin: KinData, frame_idx: int) -> jnp.ndarray:
    """Spatial velocity in LOCAL_WORLD_ALIGNED coords (frame origin, world axes)."""
    v_local = frame_velocity_local(model, kin, frame_idx)
    rot = frame_placement(model, kin, frame_idx).rot
    return jnp.concatenate(
        [lie.mv(rot, v_local[..., :3]), lie.mv(rot, v_local[..., 3:])], axis=-1
    )


def frame_classical_acceleration_local(
    model: RobotModel, kin: KinData, frame_idx: int
) -> jnp.ndarray:
    """Classical (not spatial) acceleration of the frame origin, LOCAL coords.

    a_classical_lin = a_spatial_lin + omega x v_lin (reference IMU/constraint use —
    `basic_sensors.cc:152-160`, `frame_constraint.cc:160-165`)."""
    parent = model.frame_parents[frame_idx]
    if parent < 0:
        return jnp.zeros(kin.acc.shape[:-2] + (6,), kin.acc.dtype)
    fpl = model.frame_placement(frame_idx)
    a = lie.motion_act_inv(fpl, kin.acc[..., parent, :])
    v = lie.motion_act_inv(fpl, kin.vel[..., parent, :])
    a_lin = a[..., 3:] + jnp.cross(v[..., :3], v[..., 3:])
    return jnp.concatenate([a[..., :3], a_lin], axis=-1)


# --------------------------------------------------------------------------- #
# Jacobians
# --------------------------------------------------------------------------- #


def joint_space_jacobian(model: RobotModel, kin: KinData) -> jnp.ndarray:
    """World-frame joint-space Jacobian (pinocchio data.J): (..., 6, nv) whose column
    block for joint i is the world transform of its motion subspace (at world origin,
    world axes)."""
    batch = kin.vel.shape[:-2]
    cols = []
    for i in range(model.njoints):
        omi = lie.SE3(kin.omi.rot[..., i, :, :], kin.omi.pos[..., i, :])
        s_i = jt.motion_subspace(model.joint_types[i], model.joint_axes[..., i, :])
        s_i = jnp.broadcast_to(s_i, batch + s_i.shape[-2:])
        # Transform each column (a motion in joint-local coords) to world coords
        cols_i = [
            lie.motion_act(omi, s_i[..., :, k]) for k in range(s_i.shape[-1])
        ]
        cols.extend(cols_i)
    if not cols:
        return jnp.zeros(batch + (6, 0), model.dtype)
    return jnp.stack(cols, axis=-1)


def ancestor_dof_mask(model: RobotModel, joint_idx: int) -> tuple[int, ...]:
    """Static tuple of v-dof indices actuating the subtree containing joint_idx."""
    dofs = []
    j = joint_idx
    while j >= 0:
        sl = model.v_slice(j)
        dofs.extend(range(sl.start, sl.stop))
        j = model.parents[j]
    return tuple(sorted(dofs))


def frame_jacobian_world_aligned(
    model: RobotModel, kin: KinData, jac_world: jnp.ndarray, frame_idx: int
) -> jnp.ndarray:
    """Frame Jacobian in LOCAL_WORLD_ALIGNED coords: (..., 6, nv), rows (ang, lin).

    Columns for non-ancestor joints are exactly zero (static mask), matching the
    sparsity the reference exploits in `FrameConstraint::computeJacobianAndDrift`."""
    pos = frame_placement(model, kin, frame_idx).pos
    j_ang = jac_world[..., :3, :]
    j_lin = jac_world[..., 3:, :] - lie.mm(lie.skew(pos), j_ang)
    jac = jnp.concatenate([j_ang, j_lin], axis=-2)
    parent = model.frame_parents[frame_idx]
    if parent < 0:
        return jnp.zeros_like(jac)
    mask = jnp.zeros((model.nv,), dtype=jac.dtype)
    for d in ancestor_dof_mask(model, parent):
        mask = mask.at[d].set(1.0)
    return jac * mask
