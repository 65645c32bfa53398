"""Joint-type metadata and per-type kinematic maps.

Joint types mirror the minimal-coordinate joint set of the reference engine
(pinocchio joints used by jiminy — see reference `core/src/robot/model.cc` and
`pinocchio_overload_algorithms.h` specializations): free-flyer, revolute (bounded and
unbounded/continuous), prismatic, spherical (used for flexibility joints).

Configuration-vector layout matches pinocchio so that logs/trajectories are
interchangeable with the reference:

| type                 | nq | q layout            | nv | v layout (LOCAL frame)     |
|----------------------|----|---------------------|----|-----------------------------|
| FREE                 | 7  | x y z  qx qy qz qw  | 6  | v_lin(3) omega(3)           |
| REVOLUTE             | 1  | angle               | 1  | dangle                      |
| REVOLUTE_UNBOUNDED   | 2  | cos(a) sin(a)       | 1  | dangle                      |
| PRISMATIC            | 1  | displacement        | 1  | ddisplacement               |
| SPHERICAL            | 4  | qx qy qz qw         | 3  | omega(3)                    |

All functions here are dispatched at **trace time** on the static joint type, so the
compiled program contains no joint-type branching.
"""

from __future__ import annotations

import enum

import jax.numpy as jnp
import numpy as np

from jiminy_tpu.ops import lie


class JointType(enum.IntEnum):
    FREE = 0
    REVOLUTE = 1
    REVOLUTE_UNBOUNDED = 2
    PRISMATIC = 3
    SPHERICAL = 4


JOINT_NQ = {
    JointType.FREE: 7,
    JointType.REVOLUTE: 1,
    JointType.REVOLUTE_UNBOUNDED: 2,
    JointType.PRISMATIC: 1,
    JointType.SPHERICAL: 4,
}

JOINT_NV = {
    JointType.FREE: 6,
    JointType.REVOLUTE: 1,
    JointType.REVOLUTE_UNBOUNDED: 1,
    JointType.PRISMATIC: 1,
    JointType.SPHERICAL: 3,
}


def neutral_q(jtype: JointType, dtype=np.float64) -> np.ndarray:
    """Neutral configuration segment for one joint (host-side numpy)."""
    if jtype == JointType.FREE:
        return np.array([0, 0, 0, 0, 0, 0, 1], dtype=dtype)
    if jtype == JointType.REVOLUTE_UNBOUNDED:
        return np.array([1, 0], dtype=dtype)
    if jtype == JointType.SPHERICAL:
        return np.array([0, 0, 0, 1], dtype=dtype)
    return np.zeros(JOINT_NQ[jtype], dtype=dtype)


def joint_transform(jtype: int, axis: jnp.ndarray, q_j: jnp.ndarray) -> lie.SE3:
    """Placement of the child (moving) joint frame relative to the joint's fixed
    attachment frame, as a function of the joint configuration segment."""
    jtype = JointType(jtype)
    if jtype == JointType.FREE:
        return lie.SE3(lie.quat_to_mat(q_j[..., 3:7]), q_j[..., 0:3])
    if jtype == JointType.REVOLUTE:
        return lie.SE3(lie.exp3_mat(axis * q_j[..., 0:1]), jnp.zeros_like(axis))
    if jtype == JointType.REVOLUTE_UNBOUNDED:
        # Rodrigues with (cos, sin) given directly: R = I + s*S + (1-c)*S^2
        c, s = q_j[..., 0], q_j[..., 1]
        sk = lie.skew(axis)
        eye = jnp.broadcast_to(jnp.eye(3, dtype=axis.dtype), sk.shape)
        rot = eye + s[..., None, None] * sk + (1.0 - c)[..., None, None] * lie.mm(sk, sk)
        return lie.SE3(rot, jnp.zeros_like(axis))
    if jtype == JointType.PRISMATIC:
        rot = jnp.broadcast_to(jnp.eye(3, dtype=axis.dtype), axis.shape[:-1] + (3, 3))
        return lie.SE3(rot, axis * q_j[..., 0:1])
    if jtype == JointType.SPHERICAL:
        return lie.SE3(lie.quat_to_mat(q_j[..., 0:4]), jnp.zeros(axis.shape, dtype=axis.dtype))
    raise ValueError(f"unsupported joint type {jtype}")


def motion_subspace(jtype: int, axis: jnp.ndarray) -> jnp.ndarray:
    """Constant motion subspace S (6, nv_j) in the moving joint frame, rows ordered
    (angular(3), linear(3)) to match `jiminy_tpu.ops.lie` spatial conventions.

    The joint spatial velocity (in the moving frame) is ``S @ v_j`` with ``v_j`` the
    joint velocity segment in pinocchio layout.
    """
    jtype = JointType(jtype)
    dtype = axis.dtype
    if jtype == JointType.FREE:
        # v_j = (v_lin(3), omega(3)) -> motion (omega, v_lin)
        s = jnp.zeros((6, 6), dtype=dtype)
        s = s.at[0:3, 3:6].set(jnp.eye(3, dtype=dtype))
        s = s.at[3:6, 0:3].set(jnp.eye(3, dtype=dtype))
        return s
    if jtype in (JointType.REVOLUTE, JointType.REVOLUTE_UNBOUNDED):
        return jnp.concatenate([axis, jnp.zeros_like(axis)], axis=-1)[..., None]
    if jtype == JointType.PRISMATIC:
        return jnp.concatenate([jnp.zeros_like(axis), axis], axis=-1)[..., None]
    if jtype == JointType.SPHERICAL:
        s = jnp.zeros((6, 3), dtype=dtype)
        return s.at[0:3, 0:3].set(jnp.eye(3, dtype=dtype))
    raise ValueError(f"unsupported joint type {jtype}")


def integrate_joint(jtype: int, q_j: jnp.ndarray, dv_j: jnp.ndarray) -> jnp.ndarray:
    """Lie-group retraction q_j (+) dv_j for one joint (pinocchio-compatible).

    The free-flyer uses the SE(3) exponential (coupled rotation/translation), matching
    pinocchio's `SpecialEuclidean(3)` Lie-group used by the reference integrator
    (`core/include/jiminy/core/stepper/lie_group.h:452`)."""
    jtype = JointType(jtype)
    if jtype in (JointType.REVOLUTE, JointType.PRISMATIC):
        return q_j + dv_j
    if jtype == JointType.REVOLUTE_UNBOUNDED:
        c, s = q_j[..., 0], q_j[..., 1]
        cd, sd = jnp.cos(dv_j[..., 0]), jnp.sin(dv_j[..., 0])
        return jnp.stack([c * cd - s * sd, s * cd + c * sd], axis=-1)
    if jtype == JointType.SPHERICAL:
        return lie.quat_normalize(lie.quat_mul(q_j, lie.exp3(dv_j)))
    if jtype == JointType.FREE:
        p, quat = q_j[..., 0:3], q_j[..., 3:7]
        v_lin, omega = dv_j[..., 0:3], dv_j[..., 3:6]
        _, p_d = _exp6(omega, v_lin)  # p_d = V(omega) @ v_lin
        rot = lie.quat_to_mat(quat)
        p_new = p + lie.mv(rot, p_d)
        quat_new = lie.quat_normalize(lie.quat_mul(quat, lie.exp3(omega)))
        return jnp.concatenate([p_new, quat_new], axis=-1)
    raise ValueError(f"unsupported joint type {jtype}")


def _exp6(omega: jnp.ndarray, v: jnp.ndarray):
    """SE(3) exponential: returns (rotation matrix, translation) of exp([omega, v])."""
    rot = lie.exp3_mat(omega)
    theta2 = jnp.sum(omega * omega, axis=-1)
    small = theta2 < 1e-6
    theta = jnp.sqrt(jnp.maximum(theta2, jnp.finfo(omega.dtype).eps ** 2))
    # V = I + (1-cos)/t^2 W + (t - sin)/t^3 W^2
    b = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / jnp.maximum(theta2, 1e-30))
    c = jnp.where(
        small, 1.0 / 6.0 - theta2 / 120.0, (theta - jnp.sin(theta)) / jnp.maximum(theta2 * theta, 1e-30)
    )
    sk = lie.skew(omega)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=omega.dtype), sk.shape)
    v_mat = eye + b[..., None, None] * sk + c[..., None, None] * lie.mm(sk, sk)
    return rot, lie.mv(v_mat, v)


def _log6(rot: jnp.ndarray, p: jnp.ndarray):
    """SE(3) logarithm: returns (omega, v) with exp6(omega, v) = (rot, p)."""
    omega = lie.log3_mat(rot)
    theta2 = jnp.sum(omega * omega, axis=-1)
    small = theta2 < 1e-6
    theta = jnp.sqrt(jnp.maximum(theta2, jnp.finfo(p.dtype).eps ** 2))
    # V^{-1} = I - W/2 + (1/t^2 - (1+cos)/(2 t sin)) W^2
    st, ct = jnp.sin(theta), jnp.cos(theta)
    coef = jnp.where(
        small,
        1.0 / 12.0 + theta2 / 720.0,
        (1.0 / jnp.maximum(theta2, 1e-30)) - (1.0 + ct) / jnp.maximum(2.0 * theta * st, 1e-30),
    )
    sk = lie.skew(omega)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=p.dtype), sk.shape)
    v_inv = eye - 0.5 * sk + coef[..., None, None] * lie.mm(sk, sk)
    return omega, lie.mv(v_inv, p)


def difference_joint(jtype: int, q0_j: jnp.ndarray, q1_j: jnp.ndarray) -> jnp.ndarray:
    """Tangent-space difference q1 (-) q0 for one joint (pinocchio-compatible)."""
    jtype = JointType(jtype)
    if jtype in (JointType.REVOLUTE, JointType.PRISMATIC):
        return q1_j - q0_j
    if jtype == JointType.REVOLUTE_UNBOUNDED:
        c0, s0 = q0_j[..., 0], q0_j[..., 1]
        c1, s1 = q1_j[..., 0], q1_j[..., 1]
        return jnp.arctan2(s1 * c0 - c1 * s0, c1 * c0 + s1 * s0)[..., None]
    if jtype == JointType.SPHERICAL:
        return lie.log3_quat(lie.quat_mul(lie.quat_conjugate(q0_j), q1_j))
    if jtype == JointType.FREE:
        p0, quat0 = q0_j[..., 0:3], q0_j[..., 3:7]
        p1, quat1 = q1_j[..., 0:3], q1_j[..., 3:7]
        rot0 = lie.quat_to_mat(quat0)
        dp_local = lie.mv(jnp.swapaxes(rot0, -1, -2), p1 - p0)
        drot = lie.quat_to_mat(lie.quat_mul(lie.quat_conjugate(quat0), quat1))
        omega, v = _log6(drot, dp_local)
        return jnp.concatenate([v, omega], axis=-1)
    raise ValueError(f"unsupported joint type {jtype}")


def normalize_joint(jtype: int, q_j: jnp.ndarray) -> jnp.ndarray:
    jtype = JointType(jtype)
    if jtype == JointType.REVOLUTE_UNBOUNDED:
        return q_j / jnp.linalg.norm(q_j, axis=-1, keepdims=True)
    if jtype == JointType.SPHERICAL:
        return lie.quat_normalize(q_j)
    if jtype == JointType.FREE:
        return jnp.concatenate([q_j[..., 0:3], lie.quat_normalize(q_j[..., 3:7])], axis=-1)
    return q_j
