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
