"""Lie-group and spatial-algebra primitives (SO(3)/SE(3), quaternions, spatial vectors).

This is the foundation of the TPU-native physics core. Everything here is a pure
function over `jnp` arrays, dtype-polymorphic (float32 on TPU, float64 on CPU for
parity tests), broadcastable over arbitrary leading batch dimensions, and safe to
`jit`/`vmap`/`grad`.

Conventions
-----------
- Quaternions are stored ``(x, y, z, w)`` — matching the configuration-vector layout of
  the reference engine (pinocchio convention; see reference
  `core/src/stepper/lie_group.h` usage of quaternion maps).
- An SE(3) *placement* of frame B in frame A is a pair ``(rot, pos)`` with ``rot`` the
  (..., 3, 3) orientation of B's axes expressed in A and ``pos`` the (..., 3) origin of
  B in A: ``x_A = rot @ x_B + pos``.
- Spatial motion vectors are 6-vectors ``(angular, linear)`` at a frame origin,
  expressed in that frame's axes.  Spatial force vectors are ``(torque, force)``.

Small-angle branches use Taylor expansions selected with `jnp.where` on a conservative
threshold so they remain accurate in float32 and differentiable everywhere.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class SE3(NamedTuple):
    """Placement of a frame: rotation (..., 3, 3) and translation (..., 3)."""

    rot: jnp.ndarray
    pos: jnp.ndarray


# All small matmuls in the physics core must run at full float32 precision: on TPU,
# jnp.dot/einsum default to bfloat16 MXU passes (~8-bit mantissa), which is catastrophic
# for contact depths (~1e-3 m) and energy balance.  `mv`/`mm` are the mandated helpers.
_HIGHEST = jax.lax.Precision.HIGHEST


def mv(m: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Batched matrix @ vector at full precision: (..., i, j), (..., j) -> (..., i)."""
    return jnp.einsum("...ij,...j->...i", m, v, precision=_HIGHEST)


def mm(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Batched matrix @ matrix at full precision."""
    return jnp.einsum("...ij,...jk->...ik", a, b, precision=_HIGHEST)



# --------------------------------------------------------------------------- #
# Basic helpers
# --------------------------------------------------------------------------- #


def skew(v: jnp.ndarray) -> jnp.ndarray:
    """Skew-symmetric matrix S(v) with S(v) @ u = v x u. Shape (..., 3) -> (..., 3, 3)."""
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    zero = jnp.zeros_like(x)
    return jnp.stack(
        [
            jnp.stack([zero, -z, y], axis=-1),
            jnp.stack([z, zero, -x], axis=-1),
            jnp.stack([-y, x, zero], axis=-1),
        ],
        axis=-2,
    )


def cross(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jnp.cross(a, b)


def _eps(dtype) -> float:
    return float(jnp.finfo(dtype).eps)


# --------------------------------------------------------------------------- #
# Quaternions (x, y, z, w)
# --------------------------------------------------------------------------- #


def quat_identity(dtype=jnp.float32, shape=()) -> jnp.ndarray:
    q = jnp.zeros(shape + (4,), dtype=dtype)
    return q.at[..., 3].set(1.0)


def quat_normalize(q: jnp.ndarray) -> jnp.ndarray:
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def quat_conjugate(q: jnp.ndarray) -> jnp.ndarray:
    return q * jnp.array([-1.0, -1.0, -1.0, 1.0], dtype=q.dtype)


def quat_mul(q1: jnp.ndarray, q2: jnp.ndarray) -> jnp.ndarray:
    """Hamilton product, (x, y, z, w) layout: rotation q1 followed-by... (q1*q2)v = q1(q2 v)."""
    x1, y1, z1, w1 = q1[..., 0], q1[..., 1], q1[..., 2], q1[..., 3]
    x2, y2, z2, w2 = q2[..., 0], q2[..., 1], q2[..., 2], q2[..., 3]
    return jnp.stack(
        [
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
        ],
        axis=-1,
    )


def quat_rotate(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Rotate vector(s) v by quaternion q (same as quat_to_mat(q) @ v)."""
    u = q[..., :3]
    w = q[..., 3:4]
    t = 2.0 * jnp.cross(u, v)
    return v + w * t + jnp.cross(u, t)


def quat_rotate_inv(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    return quat_rotate(quat_conjugate(q), v)


def quat_to_mat(q: jnp.ndarray) -> jnp.ndarray:
    """Quaternion to rotation matrix, (..., 4) -> (..., 3, 3)."""
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    r = jnp.stack(
        [
            jnp.stack([1.0 - 2.0 * (yy + zz), 2.0 * (xy - wz), 2.0 * (xz + wy)], axis=-1),
            jnp.stack([2.0 * (xy + wz), 1.0 - 2.0 * (xx + zz), 2.0 * (yz - wx)], axis=-1),
            jnp.stack([2.0 * (xz - wy), 2.0 * (yz + wx), 1.0 - 2.0 * (xx + yy)], axis=-1),
        ],
        axis=-2,
    )
    return r


def mat_to_quat(r: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix to quaternion (x, y, z, w), branchless and vmap-safe.

    Uses the four-hypothesis construction: compute the four candidate quaternions from
    the diagonal terms and select the one with the largest pivot for stability.
    """
    m00, m01, m02 = r[..., 0, 0], r[..., 0, 1], r[..., 0, 2]
    m10, m11, m12 = r[..., 1, 0], r[..., 1, 1], r[..., 1, 2]
    m20, m21, m22 = r[..., 2, 0], r[..., 2, 1], r[..., 2, 2]
    tr = m00 + m11 + m22

    # Candidate squared norms (4 * q_i^2 shifted by 1): pick the max for stability.
    tw = 1.0 + tr
    tx = 1.0 + m00 - m11 - m22
    ty = 1.0 - m00 + m11 - m22
    tz = 1.0 - m00 - m11 + m22

    def _safe_sqrt(t):
        return jnp.sqrt(jnp.maximum(t, _eps(r.dtype)))

    # Branch w
    sw = _safe_sqrt(tw) * 2.0
    qw_w = 0.25 * sw
    qx_w = (m21 - m12) / sw
    qy_w = (m02 - m20) / sw
    qz_w = (m10 - m01) / sw
    # Branch x
    sx = _safe_sqrt(tx) * 2.0
    qw_x = (m21 - m12) / sx
    qx_x = 0.25 * sx
    qy_x = (m01 + m10) / sx
    qz_x = (m02 + m20) / sx
    # Branch y
    sy = _safe_sqrt(ty) * 2.0
    qw_y = (m02 - m20) / sy
    qx_y = (m01 + m10) / sy
    qy_y = 0.25 * sy
    qz_y = (m12 + m21) / sy
    # Branch z
    sz = _safe_sqrt(tz) * 2.0
    qw_z = (m10 - m01) / sz
    qx_z = (m02 + m20) / sz
    qy_z = (m12 + m21) / sz
    qz_z = 0.25 * sz

    cand = jnp.stack(
        [
            jnp.stack([qx_w, qy_w, qz_w, qw_w], axis=-1),
            jnp.stack([qx_x, qy_x, qz_x, qw_x], axis=-1),
            jnp.stack([qx_y, qy_y, qz_y, qw_y], axis=-1),
            jnp.stack([qx_z, qy_z, qz_z, qw_z], axis=-1),
        ],
        axis=-2,
    )  # (..., 4 candidates, 4)
    scores = jnp.stack([tw, tx, ty, tz], axis=-1)
    best = jnp.argmax(scores, axis=-1)
    q = jnp.take_along_axis(cand, best[..., None, None], axis=-2)[..., 0, :]
    # Canonical sign: w >= 0
    q = jnp.where(q[..., 3:4] < 0.0, -q, q)
    return quat_normalize(q)


# --------------------------------------------------------------------------- #
# SO(3) exp / log with small-angle safety
# --------------------------------------------------------------------------- #

_SMALL_ANGLE = 1e-3  # radians; Taylor error far below f32 eps at this threshold


def exp3(w: jnp.ndarray) -> jnp.ndarray:
    """Exponential map so(3) -> quaternion (x, y, z, w)."""
    theta2 = jnp.sum(w * w, axis=-1, keepdims=True)
    theta = jnp.sqrt(jnp.maximum(theta2, _eps(w.dtype) ** 2))
    half = 0.5 * theta
    # sin(t/2)/t with Taylor fallback: 1/2 - t^2/48
    small = theta2 < _SMALL_ANGLE**2
    s_over = jnp.where(small, 0.5 - theta2 / 48.0, jnp.sin(half) / theta)
    c = jnp.where(small, 1.0 - theta2 / 8.0 + theta2 * theta2 / 384.0, jnp.cos(half))
    return jnp.concatenate([w * s_over, c], axis=-1)


def exp3_mat(w: jnp.ndarray) -> jnp.ndarray:
    """Exponential map so(3) -> rotation matrix (Rodrigues with Taylor fallback)."""
    theta2 = jnp.sum(w * w, axis=-1)
    theta = jnp.sqrt(jnp.maximum(theta2, _eps(w.dtype) ** 2))
    small = theta2 < _SMALL_ANGLE**2
    a = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    b = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / jnp.maximum(theta2, _eps(w.dtype) ** 2))
    s = skew(w)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), s.shape)
    return eye + a[..., None, None] * s + b[..., None, None] * mm(s, s)


def log3_quat(q: jnp.ndarray) -> jnp.ndarray:
    """Logarithm map quaternion -> so(3) (angle * axis), angle in [0, pi]."""
    q = jnp.where(q[..., 3:4] < 0.0, -q, q)  # enforce w >= 0 => angle <= pi
    vec = q[..., :3]
    w = q[..., 3]
    norm_v = jnp.linalg.norm(vec, axis=-1)
    half = jnp.arctan2(norm_v, w)  # in [0, pi/2]
    theta2 = (2.0 * half) ** 2
    small = norm_v < _SMALL_ANGLE
    # theta / sin(theta/2): 2/(sinc) ~ 2 + theta^2/12
    scale = jnp.where(small, 2.0 + theta2 / 12.0, 2.0 * half / jnp.maximum(norm_v, _eps(q.dtype)))
    return vec * scale[..., None]


def log3_mat(r: jnp.ndarray) -> jnp.ndarray:
    """Logarithm map rotation matrix -> so(3), via quaternion for robustness."""
    return log3_quat(mat_to_quat(r))


def jlog3(w: jnp.ndarray) -> jnp.ndarray:
    """Right Jacobian inverse of log3 at rotation exp3(w): Jlog3 such that
    d/dt log3(R(t)) = Jlog3 @ omega_local.  Matches pinocchio `Jlog3(theta, axis)`.
    """
    theta2 = jnp.sum(w * w, axis=-1)
    theta = jnp.sqrt(jnp.maximum(theta2, _eps(w.dtype) ** 2))
    small = theta2 < _SMALL_ANGLE**2
    # coefficient: 1/theta^2 * (1 - theta*sin/(2*(1-cos)))
    st, ct = jnp.sin(theta), jnp.cos(theta)
    denom = jnp.maximum(2.0 * (1.0 - ct), _eps(w.dtype))
    coef = jnp.where(small, 1.0 / 12.0 + theta2 / 720.0, (1.0 - theta * st / denom) / jnp.maximum(theta2, _eps(w.dtype) ** 2))
    s = skew(w)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), s.shape)
    return eye + 0.5 * s + coef[..., None, None] * mm(s, s)


# --------------------------------------------------------------------------- #
# SE(3) placements
# --------------------------------------------------------------------------- #


def se3_identity(dtype=jnp.float32, shape=()) -> SE3:
    rot = jnp.broadcast_to(jnp.eye(3, dtype=dtype), shape + (3, 3))
    pos = jnp.zeros(shape + (3,), dtype=dtype)
    return SE3(rot, pos)


def se3_mul(a: SE3, b: SE3) -> SE3:
    """Compose placements: placement of C in A given C in B (=b) and B in A (=a)."""
    return SE3(mm(a.rot, b.rot), mv(a.rot, b.pos) + a.pos)


def se3_inv(a: SE3) -> SE3:
    rt = jnp.swapaxes(a.rot, -1, -2)
    return SE3(rt, -mv(rt, a.pos))


def se3_apply(a: SE3, x: jnp.ndarray) -> jnp.ndarray:
    """Transform point coordinates from frame B to frame A (a = placement of B in A)."""
    return mv(a.rot, x) + a.pos


# --------------------------------------------------------------------------- #
# Spatial vectors: motion = (angular, linear), force = (torque, force)
# Expressed at a frame origin in that frame's axes.
# --------------------------------------------------------------------------- #


def motion_act(a: SE3, m: jnp.ndarray) -> jnp.ndarray:
    """Change motion coordinates from frame B to frame A, a = placement of B in A.

    omega_A = R omega_B ; v_A = R v_B + (R omega_B) x (-p)... derived from the rigid
    velocity field: the body point at A's origin is at -p relative to B's origin (in A
    axes it is at -p from the point at B origin).
    """
    w_b, v_b = m[..., :3], m[..., 3:]
    w_a = mv(a.rot, w_b)
    v_a = mv(a.rot, v_b) + jnp.cross(a.pos, w_a)
    return jnp.concatenate([w_a, v_a], axis=-1)


def motion_act_inv(a: SE3, m: jnp.ndarray) -> jnp.ndarray:
    """Change motion coordinates from frame A to frame B, a = placement of B in A."""
    w_a, v_a = m[..., :3], m[..., 3:]
    rt = jnp.swapaxes(a.rot, -1, -2)
    w_b = mv(rt, w_a)
    v_b = mv(rt, v_a - jnp.cross(a.pos, w_a))
    return jnp.concatenate([w_b, v_b], axis=-1)


def force_act(a: SE3, f: jnp.ndarray) -> jnp.ndarray:
    """Change force coordinates from frame B to frame A, a = placement of B in A."""
    n_b, f_b = f[..., :3], f[..., 3:]
    f_a = mv(a.rot, f_b)
    n_a = mv(a.rot, n_b) + jnp.cross(a.pos, f_a)
    return jnp.concatenate([n_a, f_a], axis=-1)


def force_act_inv(a: SE3, f: jnp.ndarray) -> jnp.ndarray:
    """Change force coordinates from frame A to frame B, a = placement of B in A."""
    n_a, f_a = f[..., :3], f[..., 3:]
    rt = jnp.swapaxes(a.rot, -1, -2)
    f_b = mv(rt, f_a)
    n_b = mv(rt, n_a - jnp.cross(a.pos, f_a))
    return jnp.concatenate([n_b, f_b], axis=-1)


def motion_cross(m: jnp.ndarray, m2: jnp.ndarray) -> jnp.ndarray:
    """Spatial motion cross product m x m2."""
    w, v = m[..., :3], m[..., 3:]
    w2, v2 = m2[..., :3], m2[..., 3:]
    return jnp.concatenate([jnp.cross(w, w2), jnp.cross(w, v2) + jnp.cross(v, w2)], axis=-1)


def motion_cross_force(m: jnp.ndarray, f: jnp.ndarray) -> jnp.ndarray:
    """Spatial motion-cross-force product m x* f (dual cross product)."""
    w, v = m[..., :3], m[..., 3:]
    n, fl = f[..., :3], f[..., 3:]
    return jnp.concatenate([jnp.cross(w, n) + jnp.cross(v, fl), jnp.cross(w, fl)], axis=-1)


# --------------------------------------------------------------------------- #
# Spatial inertia: 6x6 about a frame origin, (angular, linear) block layout:
#   [[ I_O       , m * skew(c) ],
#    [ m*skew(c)^T, m * eye(3) ]]  with I_O = I_C - m * skew(c) @ skew(c)
# --------------------------------------------------------------------------- #


def spatial_inertia_matrix(mass: jnp.ndarray, com: jnp.ndarray, inertia_c: jnp.ndarray) -> jnp.ndarray:
    """Build (..., 6, 6) spatial inertia from mass (...), CoM (..., 3) and rotational
    inertia about the CoM (..., 3, 3), all in the same frame (about its origin)."""
    sc = skew(com)
    m = mass[..., None, None]
    i_o = inertia_c - m * mm(sc, sc)
    top = jnp.concatenate([i_o, m * sc], axis=-1)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=com.dtype), sc.shape)
    bot = jnp.concatenate([m * jnp.swapaxes(sc, -1, -2), m * eye], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


def inertia_transform(a: SE3, inertia: jnp.ndarray) -> jnp.ndarray:
    """Express a (..., 6, 6) spatial inertia given in frame B in frame A
    (a = placement of B in A):  I_A = X_f I_B X_m^{-1}  = (dual act) I (act inv).

    Implemented as the congruence transform with the 6x6 motion transform
    M = [[R, 0], [skew(p) R, R]] (maps motion B -> A):  I_A = M^{-T}... careful:
    forces transform with the dual: F_A = [[R, skew(p) R], [0, R]] F_B, and
    I_A m_A = force_act(I_B motion_act_inv(m_A)) => I_A = X_F I_B X_M^{-1}.
    """
    r, p = a.rot, a.pos
    sp = skew(p)
    zero = jnp.zeros_like(r)
    # Motion transform B<-A:  X_M_inv = [[R^T, 0], [-R^T skew(p), R^T]]
    rt = jnp.swapaxes(r, -1, -2)
    xm_inv = jnp.concatenate(
        [
            jnp.concatenate([rt, zero], axis=-1),
            jnp.concatenate([-mm(rt, sp), rt], axis=-1),
        ],
        axis=-2,
    )
    # Force transform A<-B: X_F = [[R, skew(p) R], [0, R]]
    xf = jnp.concatenate(
        [
            jnp.concatenate([r, mm(sp, r)], axis=-1),
            jnp.concatenate([zero, r], axis=-1),
        ],
        axis=-2,
    )
    return mm(mm(xf, inertia), xm_inv)


# --------------------------------------------------------------------------- #
# SE(3) exponential/logarithm (motion convention: (angular, linear))
# --------------------------------------------------------------------------- #


def _so3_left_jacobian(w: jnp.ndarray) -> jnp.ndarray:
    """Left Jacobian V(w) of SO(3): exp6((w, v)) has translation V(w) @ v."""
    theta2 = jnp.sum(w * w, axis=-1)
    theta = jnp.sqrt(jnp.maximum(theta2, _eps(w.dtype) ** 2))
    small = theta2 < _SMALL_ANGLE**2
    st, ct = jnp.sin(theta), jnp.cos(theta)
    t2 = jnp.maximum(theta2, _eps(w.dtype) ** 2)
    # (1 - cos)/theta^2 and (theta - sin)/theta^3 with small-angle series
    c1 = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - ct) / t2)
    c2 = jnp.where(small, 1.0 / 6.0 - theta2 / 120.0, (theta - st) / (t2 * theta))
    s = skew(w)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), s.shape)
    return eye + c1[..., None, None] * s + c2[..., None, None] * mm(s, s)


def _so3_left_jacobian_inv(w: jnp.ndarray) -> jnp.ndarray:
    """Inverse left Jacobian V(w)^-1 of SO(3) (closed form)."""
    theta2 = jnp.sum(w * w, axis=-1)
    theta = jnp.sqrt(jnp.maximum(theta2, _eps(w.dtype) ** 2))
    small = theta2 < _SMALL_ANGLE**2
    st, ct = jnp.sin(theta), jnp.cos(theta)
    denom = jnp.maximum(2.0 * (1.0 - ct), _eps(w.dtype))
    t2 = jnp.maximum(theta2, _eps(w.dtype) ** 2)
    coef = jnp.where(small, 1.0 / 12.0 + theta2 / 720.0, (1.0 - theta * st / denom) / t2)
    s = skew(w)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), s.shape)
    return eye - 0.5 * s + coef[..., None, None] * mm(s, s)


def exp6(motion: jnp.ndarray) -> SE3:
    """SE(3) exponential: motion (angular, linear) twist -> placement
    (role of `pinocchio::exp6`, reference freeflyer Lie-group integrate,
    `core/src/stepper/lie_group.h:452`; pinocchio motion is (linear, angular)
    — here the package-wide (angular, linear) layout is kept)."""
    w, v = motion[..., 0:3], motion[..., 3:6]
    return SE3(exp3_mat(w), mv(_so3_left_jacobian(w), v))


def log6(m: SE3) -> jnp.ndarray:
    """SE(3) logarithm: placement -> motion (angular, linear) twist
    (role of `pinocchio::log6`; inverse of `exp6`)."""
    w = log3_mat(m.rot)
    v = mv(_so3_left_jacobian_inv(w), m.pos)
    return jnp.concatenate([w, v], axis=-1)


def _xyzquat_to_se3(pose: jnp.ndarray) -> SE3:
    return SE3(quat_to_mat(pose[..., 3:7]), pose[..., 0:3])


def xyzquat_difference(prev: jnp.ndarray, now: jnp.ndarray) -> jnp.ndarray:
    """Geodesic SE(3) difference between two (x,y,z,qx,qy,qz,qw) poses as a
    LOCAL-frame (angular, linear) twist: log6(M_prev^-1 * M_now)
    (role of `pin.liegroups.SE3().difference`, reference
    `quantities/generic.py:1203` `_DifferenceFrameXYZQuat`)."""
    m_prev, m_now = _xyzquat_to_se3(prev), _xyzquat_to_se3(now)
    return log6(se3_mul(se3_inv(m_prev), m_now))


def xyzquat_integrate(pose: jnp.ndarray, motion: jnp.ndarray) -> jnp.ndarray:
    """Retract a LOCAL-frame (angular, linear) twist onto an xyzquat pose:
    M * exp6(motion) (role of `pin.liegroups.SE3().integrate`)."""
    m = se3_mul(_xyzquat_to_se3(pose), exp6(motion))
    return jnp.concatenate([m.pos, mat_to_quat(m.rot)], axis=-1)


# RPY (URDF convention: extrinsic XYZ = R_z @ R_y @ R_x)
def rpy_to_mat(rpy: jnp.ndarray) -> jnp.ndarray:
    r, p, y = rpy[..., 0], rpy[..., 1], rpy[..., 2]
    cr, sr = jnp.cos(r), jnp.sin(r)
    cp, sp = jnp.cos(p), jnp.sin(p)
    cy, sy = jnp.cos(y), jnp.sin(y)
    return jnp.stack(
        [
            jnp.stack([cy * cp, cy * sp * sr - sy * cr, cy * sp * cr + sy * sr], axis=-1),
            jnp.stack([sy * cp, sy * sp * sr + cy * cr, sy * sp * cr - cy * sr], axis=-1),
            jnp.stack([-sp, cp * sr, cp * cr], axis=-1),
        ],
        axis=-2,
    )


def mat_to_rpy(r: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix -> (roll, pitch, yaw), URDF convention R = Rz Ry Rx
    (role of `pinocchio::rpy::matrixToRpy`); pitch in [-pi/2, pi/2]."""
    roll = jnp.arctan2(r[..., 2, 1], r[..., 2, 2])
    pitch = jnp.arcsin(jnp.clip(-r[..., 2, 0], -1.0, 1.0))
    yaw = jnp.arctan2(r[..., 1, 0], r[..., 0, 0])
    return jnp.stack([roll, pitch, yaw], axis=-1)


def rpy_jacobian(rpy: jnp.ndarray) -> jnp.ndarray:
    """J(rpy) mapping RPY rates to the LOCAL angular velocity:
    omega_local = J @ d(rpy)/dt (role of `pinocchio::rpy::computeRpyJacobian`,
    LOCAL convention)."""
    r, p = rpy[..., 0], rpy[..., 1]
    cr, sr = jnp.cos(r), jnp.sin(r)
    cp, sp = jnp.cos(p), jnp.sin(p)
    zero, one = jnp.zeros_like(r), jnp.ones_like(r)
    return jnp.stack(
        [
            jnp.stack([one, zero, -sp], axis=-1),
            jnp.stack([zero, cr, cp * sr], axis=-1),
            jnp.stack([zero, -sr, cp * cr], axis=-1),
        ],
        axis=-2,
    )


def rpy_jacobian_inverse(rpy: jnp.ndarray) -> jnp.ndarray:
    """J(rpy)^-1: LOCAL angular velocity -> RPY rates (role of
    `pinocchio::rpy::computeRpyJacobianInverse`); singular at |pitch|=pi/2."""
    r, p = rpy[..., 0], rpy[..., 1]
    cr, sr = jnp.cos(r), jnp.sin(r)
    cp = jnp.cos(p)
    tp = jnp.tan(p)
    zero, one = jnp.zeros_like(r), jnp.ones_like(r)
    inv_cp = 1.0 / cp
    return jnp.stack(
        [
            jnp.stack([one, sr * tp, cr * tp], axis=-1),
            jnp.stack([zero, cr, -sr], axis=-1),
            jnp.stack([zero, sr * inv_cp, cr * inv_cp], axis=-1),
        ],
        axis=-2,
    )


def quat_average(quats: jnp.ndarray, axis: int = -2) -> jnp.ndarray:
    """Average of unit quaternions via the dominant eigenvector of the outer-
    product accumulator (Markley et al. 2007; reference `quat_average`,
    `gym_jiminy/common/utils/math.py`)."""
    q = quats
    m = jnp.einsum("...i,...j->...ij", q, q, precision=_HIGHEST)
    m = jnp.sum(m, axis=axis - 1 if axis < 0 else axis)
    _, vecs = jnp.linalg.eigh(m)
    avg = vecs[..., -1]
    # Fix the sign convention (w >= 0)
    return avg * jnp.where(avg[..., 3:4] < 0, -1.0, 1.0)
