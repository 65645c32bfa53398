"""Kinematics/dynamics convenience helpers (reference `jiminy_py.dynamics`):
inverse dynamics, freeflyer estimation from a fixed body, quantity refresh."""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from jiminy_tpu.ops import dynamics as dyn
from jiminy_tpu.ops import lie
from jiminy_tpu.ops.kinematics import forward_kinematics, frame_placement, frame_velocity_local


def compute_inverse_dynamics(robot, q, v, a, fext=None, gravity=(0.0, 0.0, -9.81)):
    """Motor-space efforts realizing acceleration `a` at state (q, v)
    (reference `compute_inverse_dynamics`, `dynamics.py:929`): full RNEA then
    selection of the motorized dofs, divided by the mechanical reduction."""
    g = jnp.asarray(gravity, q.dtype)
    tau = dyn.rnea(robot.model, g, q, v, a, fext)
    if robot.motors is None:
        return tau
    vidx = jnp.asarray(robot.motors.v_indices, jnp.int32)
    return jnp.take(tau, vidx, axis=-1) / robot.motors.mechanical_reduction


def convert_force_global_frame_to_joint(model, frame, f_global, q=None, kin=None):
    """World-aligned wrench at a frame's origin -> LOCAL parent-joint spatial
    force (the engine's `fext` convention).

    Mirrors the reference helper (`utilities/pinocchio.cc:794-809`):
    rotate both components into the parent joint frame, then shift the torque
    by the frame's static placement lever. `f_global` is (..., 6) (ang, lin);
    pass either `q` or a precomputed `kin` (forward_kinematics result).
    """
    fidx = model.frame_index(frame) if isinstance(frame, str) else int(frame)
    parent = model.frame_parents[fidx]
    if kin is None:
        if q is None:
            raise ValueError("pass q or kin")
        kin = forward_kinematics(model, jnp.asarray(q, model.dtype))
    rt = jnp.swapaxes(kin.omi.rot[..., parent, :, :], -1, -2)
    f_global = jnp.asarray(f_global, model.dtype)
    lin = lie.mv(rt, f_global[..., 3:6])
    ang = lie.mv(rt, f_global[..., 0:3])
    lever = jnp.asarray(model.fplacement_pos[fidx], model.dtype)
    ang = ang + jnp.cross(lever, lin)
    return jnp.concatenate([ang, lin], axis=-1)


def compute_freeflyer_state_from_fixed_body(
    robot,
    q: jnp.ndarray,
    v: Optional[jnp.ndarray] = None,
    fixed_body_name: Optional[str] = None,
    ground_height: float = 0.0,
):
    """Estimate the freeflyer pose (and optionally velocity) assuming a given
    body frame is welded flat to the ground (reference
    `compute_freeflyer_state_from_fixed_body`, `dynamics.py:765`).

    Returns (q', v') with the first 7 (and 6) entries replaced so the fixed
    frame sits at the origin height with identity yaw-less orientation.
    """
    model = robot.model
    if fixed_body_name is None:
        fixed_body_name = model.frame_names[model.frame_parents.index(0)]
    fidx = model.frame_index(fixed_body_name)

    # FK with the freeflyer at identity
    q_id = q.at[..., 0:3].set(0.0).at[..., 3:7].set(jnp.asarray([0.0, 0.0, 0.0, 1.0], q.dtype))
    kin = forward_kinematics(model, q_id, v)
    fpl = frame_placement(model, kin, fidx)
    # Base placement = inverse of the fixed frame placement (frame -> world id)
    w_m_f = lie.SE3(fpl.rot, fpl.pos)
    f_m_w = lie.se3_inv(w_m_f)
    quat = lie.mat_to_quat(f_m_w.rot)
    pos = f_m_w.pos + jnp.asarray([0.0, 0.0, ground_height], q.dtype)
    q_out = q.at[..., 0:3].set(pos).at[..., 3:7].set(quat)

    v_out = v
    if v is not None:
        # Base velocity cancelling the fixed frame's spatial velocity
        v_f = frame_velocity_local(model, kin, fidx)  # with zero base velocity
        # Transport to base frame: the base must move so the frame is static:
        # v_base (LOCAL) = -X_{base<-frame} v_frame
        base_in_frame = lie.se3_mul(f_m_w, lie.se3_identity(q.dtype, q.shape[:-1]))
        vel6 = -lie.motion_act(lie.se3_inv(lie.SE3(fpl.rot, fpl.pos)), v_f)
        v_out = v.at[..., 0:3].set(vel6[..., 3:6]).at[..., 3:6].set(vel6[..., 0:3])
    return q_out, v_out


def update_quantities(robot, q, v=None, a=None):
    """One-stop FK refresh returning the kinematics data used by quantities
    (reference `update_quantities`, `dynamics.py:395`)."""
    return forward_kinematics(robot.model, q, v, a)


# --------------------------------------------------------------------------- #
# Pose/velocity representation conversions (reference `jiminy_py/dynamics.py:
# 38-93` SE3ToXYZRPY..velocityXYZQuatToXYZRPY — same names, batched + jittable)
# --------------------------------------------------------------------------- #


def SE3ToXYZRPY(m: lie.SE3) -> jnp.ndarray:
    """Placement -> [X,Y,Z,Roll,Pitch,Yaw] (reference `dynamics.py:38`)."""
    return jnp.concatenate([m.pos, lie.mat_to_rpy(m.rot)], axis=-1)


def XYZRPYToSE3(xyzrpy: jnp.ndarray) -> lie.SE3:
    """[X,Y,Z,Roll,Pitch,Yaw] -> placement (reference `dynamics.py:44`)."""
    return lie.SE3(lie.rpy_to_mat(xyzrpy[..., 3:6]), xyzrpy[..., 0:3])


def XYZRPYToXYZQuat(xyzrpy: jnp.ndarray) -> jnp.ndarray:
    """[X,Y,Z,R,P,Y] -> [X,Y,Z,Qx,Qy,Qz,Qw] (reference `dynamics.py:50`)."""
    return jnp.concatenate(
        [xyzrpy[..., 0:3], lie.mat_to_quat(lie.rpy_to_mat(xyzrpy[..., 3:6]))],
        axis=-1,
    )


def XYZQuatToXYZRPY(xyzquat: jnp.ndarray) -> jnp.ndarray:
    """[X,Y,Z,Qx,Qy,Qz,Qw] -> [X,Y,Z,R,P,Y] (reference `dynamics.py:57`)."""
    return jnp.concatenate(
        [
            xyzquat[..., 0:3],
            lie.mat_to_rpy(lie.quat_to_mat(xyzquat[..., 3:7])),
        ],
        axis=-1,
    )


def velocityXYZRPYToXYZQuat(xyzrpy: jnp.ndarray, dxyzrpy: jnp.ndarray) -> jnp.ndarray:
    """XYZRPY time derivative -> (linear LOCAL, angular LOCAL) freeflyer
    velocity; input linear velocity is world-aligned (reference
    `dynamics.py:64-74`)."""
    rpy = xyzrpy[..., 3:6]
    rot = lie.rpy_to_mat(rpy)
    rot_t = jnp.swapaxes(rot, -1, -2)
    v_local = lie.mv(rot_t, dxyzrpy[..., 0:3])
    w_local = lie.mv(lie.rpy_jacobian(rpy), dxyzrpy[..., 3:6])
    return jnp.concatenate([v_local, w_local], axis=-1)


def velocityXYZQuatToXYZRPY(xyzquat: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """(linear LOCAL, angular LOCAL) freeflyer velocity -> XYZRPY time
    derivative; output linear velocity is world-aligned (reference
    `dynamics.py:77-93`)."""
    rot = lie.quat_to_mat(xyzquat[..., 3:7])
    rpy = lie.mat_to_rpy(rot)
    v_world = lie.mv(rot, v[..., 0:3])
    drpy = lie.mv(lie.rpy_jacobian_inverse(rpy), v[..., 3:6])
    return jnp.concatenate([v_world, drpy], axis=-1)


def get_body_world_transform(robot, q, body_name: str) -> lie.SE3:
    """World placement of a body/frame (reference
    `dynamics.py get_body_world_transform`)."""
    from jiminy_tpu.ops.kinematics import forward_kinematics, frame_placement

    model = robot.model
    kin = forward_kinematics(model, q)
    return frame_placement(model, kin, model.frame_index(body_name))


def get_body_world_velocity(robot, q, v, body_name: str) -> jnp.ndarray:
    """World-aligned spatial velocity (angular, linear) of a body/frame
    (reference `dynamics.py get_body_world_velocity`)."""
    from jiminy_tpu.ops.kinematics import (
        forward_kinematics,
        frame_velocity_world_aligned,
    )

    model = robot.model
    kin = forward_kinematics(model, q, v)
    return frame_velocity_world_aligned(model, kin, model.frame_index(body_name))


def get_body_world_acceleration(robot, q, v, a, body_name: str) -> jnp.ndarray:
    """World-aligned spatial acceleration (angular, linear) of a body/frame
    (reference `dynamics.py get_body_world_acceleration` — like the
    reference, this is the 'spatial' acceleration, NOT the classical
    point acceleration)."""
    from jiminy_tpu.ops.kinematics import forward_kinematics, frame_placement

    model = robot.model
    kin = forward_kinematics(model, q, v, a)
    fidx = model.frame_index(body_name)
    fpl = frame_placement(model, kin, fidx)
    parent = model.frame_parents[fidx]
    if parent < 0:  # world-attached frame (same guard as frame_velocity_local)
        return jnp.zeros(q.shape[:-1] + (6,), q.dtype)
    acc = kin.acc[..., parent, :]
    # Translate the parent-joint LOCAL spatial acceleration to the frame
    # origin, world-aligned (same algebra as frame_velocity_world_aligned)
    rot_t = jnp.swapaxes(fpl.rot, -1, -2)
    acc_f = lie.motion_act(
        lie.SE3(lie.mm(rot_t, kin.omi.rot[..., parent, :, :]),
                lie.mv(rot_t, kin.omi.pos[..., parent, :] - fpl.pos)),
        acc,
    )
    rot = fpl.rot
    return jnp.concatenate(
        [lie.mv(rot, acc_f[..., 0:3]), lie.mv(rot, acc_f[..., 3:6])], axis=-1
    )


def compute_transform_contact(robot, q, ground_fn=None) -> lie.SE3:
    """Freeflyer correction transform so the deepest contact points touch the
    ground, with the contact plane fitted to the three deepest points
    (reference `compute_transform_contact`, `dynamics.py:628` — host-side
    initial-pose helper, numpy).

    Use with `compute_freeflyer_state_from_fixed_body` to start an episode
    with no penetration and up to three touching points."""
    import numpy as np

    from jiminy_tpu.ops.kinematics import forward_kinematics, frame_placement

    model = robot.model
    kin = forward_kinematics(model, q)
    frames = list(robot.contact_frame_indices)
    if not frames:
        return lie.SE3(jnp.eye(3, dtype=q.dtype), jnp.zeros(3, q.dtype))

    pts, grounds = [], []
    for fidx in frames:
        p = np.asarray(frame_placement(model, kin, fidx).pos, float)
        pts.append(p)
        if ground_fn is not None:
            h, normal = ground_fn(jnp.asarray(p[0:2]))
            n = np.asarray(normal, float).reshape(3)
            n = n / max(np.linalg.norm(n), 1e-12)
            g_rot = _rotation_from_two_vectors(np.array([0.0, 0.0, 1.0]), n)
            grounds.append((g_rot, np.array([0.0, 0.0, float(h)])))
        else:
            grounds.append((np.eye(3), np.zeros(3)))

    # Contact positions relative to their local ground frame
    rel = [gr.T @ (p - gp) for p, (gr, gp) in zip(pts, grounds)]
    order = np.argsort([p[2] for p in rel])
    rel_sorted = [rel[i] for i in order]

    # Plane normal from the three deepest points (reference fallback rules)
    normal = np.array([0.0, 0.0, 1.0])
    if len(rel_sorted) > 2:
        e1 = rel_sorted[0] - rel_sorted[1]
        e2 = rel_sorted[0] - rel_sorted[2]
        n1, n2 = np.linalg.norm(e1), np.linalg.norm(e2)
        if n1 > 1e-12 and n2 > 1e-12:
            cand = np.cross(e1 / n1, e2 / n2)
            if np.linalg.norm(cand) >= 0.6:
                normal = cand if cand[2] >= 0.0 else -cand
                normal = normal / np.linalg.norm(normal)

    rot_offset = _rotation_from_two_vectors(normal, np.array([0.0, 0.0, 1.0]))
    deepest = pts[order[0]]
    pos_shift = (rot_offset @ deepest)[2] - deepest[2]
    pos_offset = np.array([0.0, 0.0, -pos_shift - rel_sorted[0][2]])
    return lie.SE3(jnp.asarray(rot_offset, q.dtype), jnp.asarray(pos_offset, q.dtype))


def _rotation_from_two_vectors(a, b):
    """Rotation matrix sending unit vector a to unit vector b (role of
    `pin.Quaternion.FromTwoVectors`)."""
    import numpy as np

    a = a / max(np.linalg.norm(a), 1e-12)
    b = b / max(np.linalg.norm(b), 1e-12)
    c = np.cross(a, b)
    d = float(a @ b)
    if np.linalg.norm(c) < 1e-12:
        if d > 0:
            return np.eye(3)
        # Opposite vectors: rotate pi about any orthogonal axis
        axis = np.cross(a, [1.0, 0.0, 0.0])
        if np.linalg.norm(axis) < 1e-6:
            axis = np.cross(a, [0.0, 1.0, 0.0])
        axis = axis / np.linalg.norm(axis)
        return 2.0 * np.outer(axis, axis) - np.eye(3)
    skew = np.array([[0, -c[2], c[1]], [c[2], 0, -c[0]], [-c[1], c[0], 0]])
    return np.eye(3) + skew + skew @ skew / (1.0 + d)


def compute_efforts_from_fixed_body(
    robot, q, v, a, fixed_body_name: str, gravity=(0.0, 0.0, -9.81)
):
    """Joint efforts + the external support wrench assuming the given body is
    welded to the world (reference `compute_efforts_from_fixed_body`,
    `dynamics.py:876`): a first RNEA pass yields the net root wrench, which is
    re-applied as an external force at the support joint before the final
    RNEA pass.  Returns (tau, f_ext_support) with the wrench (torque, force)
    in the support joint's LOCAL frame."""
    from jiminy_tpu.ops import dynamics as dyn
    from jiminy_tpu.ops.dynamics import _joint_quantities
    from jiminy_tpu.ops.kinematics import forward_kinematics

    model = robot.model
    g = jnp.asarray(gravity, q.dtype)
    tau0 = dyn.rnea(model, g, q, v, a)
    # Root spatial force from the freeflyer torques: tau_root = S^T f_root
    ss0 = _joint_quantities(model, q, v)[1][0]
    s_mat = jnp.broadcast_to(ss0, q.shape[:-1] + ss0.shape[-2:])
    f_root = jnp.linalg.solve(
        jnp.swapaxes(s_mat, -1, -2), tau0[..., 0:6][..., None]
    )[..., 0]

    kin = forward_kinematics(model, q)
    support_joint = model.frame_parents[model.frame_index(fixed_body_name)]
    m_root = lie.SE3(kin.omi.rot[..., 0, :, :], kin.omi.pos[..., 0, :])
    m_sup = lie.SE3(
        kin.omi.rot[..., support_joint, :, :], kin.omi.pos[..., support_joint, :]
    )
    rel = lie.se3_mul(lie.se3_inv(m_sup), m_root)  # root frame in support frame
    f_sup = lie.force_act(rel, f_root)

    fext = jnp.zeros(q.shape[:-1] + (model.njoints, 6), q.dtype)
    fext = fext.at[..., support_joint, :].set(f_sup)
    tau = dyn.rnea(model, g, q, v, a, fext)
    return tau, f_sup
