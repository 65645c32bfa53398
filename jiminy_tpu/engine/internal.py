"""Internal dynamics: flexibility spring-dampers and joint-bound reaction forces.

Re-design of `Engine::computeInternalDynamics` (`core/src/engine/engine.cc:3340-3392`):
flexibility joints get a quaternion-log spring + viscous damper; position bounds can
be enforced with a smooth penalty here (spring-damper mode) or left to the constraint
solver (constraint mode, reference behavior).
"""

from __future__ import annotations

import jax.numpy as jnp

from jiminy_tpu.engine.robot import Robot
from jiminy_tpu.models import joints as jt
from jiminy_tpu.ops import lie


def flexibility_torque(robot: Robot, q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Spring-damper torque of every flexibility (spherical) joint, scattered into
    a full (..., nv) vector (reference `engine.cc:3369-3392`)."""
    u = jnp.zeros(q.shape[:-1] + (robot.nv,), q.dtype)
    flex = robot.flexibility
    if flex is None or not flex.joint_indices:
        return u
    model = robot.model
    for k, j in enumerate(flex.joint_indices):
        qi, vi = model.idx_q[j], model.idx_v[j]
        quat = q[..., qi : qi + 4]
        angle_axis = lie.log3_quat(quat)
        jl = lie.jlog3(angle_axis)
        tau = -lie.mv(jl, flex.stiffness[..., k, :] * angle_axis)
        tau = tau - flex.damping[..., k, :] * v[..., vi : vi + 3]
        u = u.at[..., vi : vi + 3].add(tau)
    return u


def penalty_bounds_torque(gains: dict, nv: int, q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Stable penalty bound torques with precomputed per-dof gains
    {vidx: (lo, hi, kp, kd)} — mirror of the cdyn fast-path formula so both
    paths produce identical physics."""
    u = jnp.zeros(q.shape[:-1] + (nv,), q.dtype)
    if not gains:
        return u
    # vidx == qidx offset mapping is resolved by the caller providing gains
    # keyed by velocity index of 1-dof joints (idx_q == idx_v only when no
    # quaternion joints precede; the caller stores (lo, hi) so only q/v lookup
    # by index matters) — we need the q index too; infer from ordering is
    # unsafe, so gains may optionally carry it as 5th element.
    for vi, entry in gains.items():
        if len(entry) == 5:
            lo, hi, kp, kd, qi = entry
        else:
            lo, hi, kp, kd = entry
            qi = vi
        qj, vj = q[..., qi], v[..., vi]
        over = jnp.maximum(qj - hi, 0.0)
        under = jnp.maximum(lo - qj, 0.0)
        active = (over > 0.0) | (under > 0.0)
        u = u.at[..., vi].add(kp * (under - over) - jnp.where(active, kd * vj, 0.0))
    return u


def position_bounds_torque(
    robot: Robot,
    q: jnp.ndarray,
    v: jnp.ndarray,
    stiffness: float = 1.0e5,
    damping: float = 1.0e2,
) -> jnp.ndarray:
    """Smooth penalty enforcing configuration limits on 1-dof joints.

    The reference enforces bounds through `JointConstraint`s solved by PGS; this
    spring-damper fallback serves the impedance contact mode and is exact in the
    interior (zero force strictly inside the limits)."""
    u = jnp.zeros(q.shape[:-1] + (robot.nv,), q.dtype)
    model = robot.model
    for j in range(model.njoints):
        t = jt.JointType(model.joint_types[j])
        if t not in (jt.JointType.REVOLUTE, jt.JointType.PRISMATIC):
            continue
        qi, vi = model.idx_q[j], model.idx_v[j]
        lo = model.position_limit_lower[..., qi]
        hi = model.position_limit_upper[..., qi]
        qj, vj = q[..., qi], v[..., vi]
        over = jnp.maximum(qj - hi, 0.0)
        under = jnp.maximum(lo - qj, 0.0)
        active = (over > 0.0) | (under > 0.0)
        f = stiffness * (under - over) - jnp.where(active, damping * vj, 0.0)
        u = u.at[..., vi].add(jnp.where(jnp.isfinite(lo) | jnp.isfinite(hi), f, 0.0))
    return u
