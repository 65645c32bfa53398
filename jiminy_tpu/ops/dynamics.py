"""Rigid-body dynamics: RNEA, CRBA, ABA — all with motor armature (rotor inertia).

XLA-native re-designs of the reference's pinocchio overloads
(`core/include/jiminy/core/robot/pinocchio_overload_algorithms.h:36-554`): armature is
added to the mass-matrix diagonal in CRBA, to the joint-space inertia `D` in ABA, and
to the generalized torque in RNEA — exactly the semantics the reference validates in
`test_simple_pendulum.py` (armature test).

All tree recursions are trace-time Python loops over the static kinematic structure;
per-joint math is small dense (6,) / (6,6) algebra batched over envs by `vmap`.
External forces `fext` are per-joint spatial wrenches at the joint origin in LOCAL
joint coordinates (pinocchio convention).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from jiminy_tpu.models import joints as jt
from jiminy_tpu.models.model import RobotModel
from jiminy_tpu.ops import lie
from jiminy_tpu.ops.kinematics import joint_child_placements


def _spatial_gravity(model: RobotModel, gravity: jnp.ndarray, batch, dtype) -> jnp.ndarray:
    """-gravity as a spatial acceleration of the world frame (root trick)."""
    g = jnp.broadcast_to(gravity, batch + (3,)).astype(dtype)
    return jnp.concatenate([jnp.zeros(batch + (3,), dtype), -g], axis=-1)


def _joint_quantities(model: RobotModel, q, v):
    """Per-joint placements X_i, motion subspaces S_i and joint velocities."""
    xs = joint_child_placements(model, q)
    ss = [
        jt.motion_subspace(model.joint_types[i], model.joint_axes[..., i, :])
        for i in range(model.njoints)
    ]
    vqs = [v[..., model.v_slice(i)] for i in range(model.njoints)] if v is not None else None
    return xs, ss, vqs


def _body_inertias(model: RobotModel) -> jnp.ndarray:
    """(nj, 6, 6) spatial inertia of each body about its joint frame."""
    return lie.spatial_inertia_matrix(model.mass, model.com, model.inertia)


def rnea(
    model: RobotModel,
    gravity: jnp.ndarray,
    q: jnp.ndarray,
    v: jnp.ndarray,
    a: jnp.ndarray,
    fext: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Inverse dynamics: tau such that M(q) a + C(q,v) v + g(q) - J^T fext = tau,
    including armature * a on each dof (reference overload `rnea`, line 122)."""
    batch = q.shape[:-1]
    dtype = q.dtype
    xs, ss, vqs = _joint_quantities(model, q, v)
    inertias = _body_inertias(model)

    a0 = _spatial_gravity(model, gravity, batch, dtype)
    vel: list = [None] * model.njoints
    acc: list = [None] * model.njoints
    f: list = [None] * model.njoints

    for i in range(model.njoints):
        parent = model.parents[i]
        vj = lie.mv(ss[i], vqs[i])
        aj = lie.mv(ss[i], a[..., model.v_slice(i)])
        v_p = vel[parent] if parent >= 0 else jnp.zeros(batch + (6,), dtype)
        a_p = acc[parent] if parent >= 0 else a0
        vel[i] = lie.motion_act_inv(xs[i], v_p) + vj
        acc[i] = lie.motion_act_inv(xs[i], a_p) + aj + lie.motion_cross(vel[i], vj)

    tau = jnp.zeros(batch + (model.nv,), dtype)
    for i in reversed(range(model.njoints)):
        inertia_i = inertias[..., i, :, :]
        f_i = lie.mv(inertia_i, acc[i]) + lie.motion_cross_force(
            vel[i], lie.mv(inertia_i, vel[i])
        )
        if f[i] is not None:
            f_i = f_i + f[i]  # accumulated children contributions
        if fext is not None:
            f_i = f_i - fext[..., i, :]
        sl = model.v_slice(i)
        tau_i = jnp.einsum("...ik,...i->...k", ss[i], f_i, precision=lie._HIGHEST)
        tau_i = tau_i + model.armature[..., sl] * a[..., sl]
        tau = tau.at[..., sl].set(tau_i)
        parent = model.parents[i]
        if parent >= 0:
            f_p = lie.force_act(xs[i], f_i)
            f[parent] = f_p if f[parent] is None else f[parent] + f_p
    return tau


def nonlinear_effects(model, gravity, q, v, fext=None) -> jnp.ndarray:
    """Coriolis + centrifugal + gravity (- external) torques (pinocchio nle)."""
    a = jnp.zeros(q.shape[:-1] + (model.nv,), q.dtype)
    return rnea(model, gravity, q, v, a, fext)


def crba(model: RobotModel, q: jnp.ndarray) -> jnp.ndarray:
    """Joint-space mass matrix M(q) (..., nv, nv), armature on the diagonal
    (reference overload `crba`, `pinocchio_overload_algorithms.h:146-160`)."""
    batch = q.shape[:-1]
    dtype = q.dtype
    xs, ss, _ = _joint_quantities(model, q, None)
    inertias = _body_inertias(model)
    ic: list = [
        jnp.broadcast_to(inertias[..., i, :, :], batch + (6, 6)) for i in range(model.njoints)
    ]
    m = jnp.zeros(batch + (model.nv, model.nv), dtype)

    for i in reversed(range(model.njoints)):
        sl_i = model.v_slice(i)
        s_i = jnp.broadcast_to(ss[i], batch + ss[i].shape[-2:])
        f = lie.mm(ic[i], s_i)  # (..., 6, nv_i)
        block = jnp.einsum("...ik,...il->...kl", s_i, f, precision=lie._HIGHEST)
        m = m.at[..., sl_i, sl_i].set(block)
        # Walk up the ancestor chain
        j = i
        while model.parents[j] >= 0:
            f = _force_act_mat(xs[j], f)
            j = model.parents[j]
            sl_j = model.v_slice(j)
            s_j = ss[j]
            off = jnp.einsum("...ik,...il->...kl", f, jnp.broadcast_to(s_j, batch + s_j.shape[-2:]), precision=lie._HIGHEST)
            m = m.at[..., sl_i, sl_j].set(off)
            m = m.at[..., sl_j, sl_i].set(jnp.swapaxes(off, -1, -2))
        parent = model.parents[i]
        if parent >= 0:
            ic[parent] = ic[parent] + lie.inertia_transform(xs[i], ic[i])

    m = m + jnp.eye(model.nv, dtype=dtype) * model.armature[..., None, :]
    return m


def _force_act_mat(a: lie.SE3, f_mat: jnp.ndarray) -> jnp.ndarray:
    """Apply force_act columnwise: (..., 6, k) force matrix from frame B to A."""
    n, fl = f_mat[..., :3, :], f_mat[..., 3:, :]
    f_a = lie.mm(a.rot, fl)
    n_a = lie.mm(a.rot, n) + lie.mm(lie.skew(a.pos), f_a)
    return jnp.concatenate([n_a, f_a], axis=-2)


def _inertia_act_mat(a: lie.SE3, m_mat: jnp.ndarray) -> jnp.ndarray:
    """Apply motion_act columnwise: (..., 6, k) motion matrix from frame B to A."""
    w, v = m_mat[..., :3, :], m_mat[..., 3:, :]
    w_a = lie.mm(a.rot, w)
    v_a = lie.mm(a.rot, v) + lie.mm(lie.skew(a.pos), w_a)
    return jnp.concatenate([w_a, v_a], axis=-2)


def aba(
    model: RobotModel,
    gravity: jnp.ndarray,
    q: jnp.ndarray,
    v: jnp.ndarray,
    tau: jnp.ndarray,
    fext: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Forward dynamics via the Articulated Body Algorithm with armature
    (reference overload `aba` + `AbaBackwardStep`,
    `pinocchio_overload_algorithms.h:180-554`: `StYS = S^T IA S + armature`)."""
    batch = q.shape[:-1]
    dtype = q.dtype
    nj = model.njoints
    xs, ss, vqs = _joint_quantities(model, q, v)
    inertias = _body_inertias(model)

    vel: list = [None] * nj
    bias_c: list = [None] * nj
    ia: list = [None] * nj
    pa: list = [None] * nj

    # Pass 1: outward velocities and bias terms
    for i in range(nj):
        parent = model.parents[i]
        vj = lie.mv(ss[i], vqs[i])
        v_p = vel[parent] if parent >= 0 else jnp.zeros(batch + (6,), dtype)
        vel[i] = lie.motion_act_inv(xs[i], v_p) + vj
        bias_c[i] = lie.motion_cross(vel[i], vj)
        ia[i] = jnp.broadcast_to(inertias[..., i, :, :], batch + (6, 6))
        pa_i = lie.motion_cross_force(vel[i], lie.mv(ia[i], vel[i]))
        if fext is not None:
            pa_i = pa_i - fext[..., i, :]
        pa[i] = pa_i

    # Pass 2: inward articulated inertia
    u_mats: list = [None] * nj
    d_invs: list = [None] * nj
    u_vecs: list = [None] * nj
    for i in reversed(range(nj)):
        sl = model.v_slice(i)
        s_i = jnp.broadcast_to(ss[i], batch + ss[i].shape[-2:])
        u_mat = lie.mm(ia[i], s_i)  # (..., 6, nv_i)
        d = jnp.einsum("...ik,...il->...kl", s_i, u_mat, precision=lie._HIGHEST)
        d = d + jnp.eye(d.shape[-1], dtype=dtype) * model.armature[..., None, sl]
        if d.shape[-1] == 1:
            d_inv = 1.0 / d
        else:
            d_inv = jnp.linalg.inv(d)
        u_vec = (
            tau[..., sl]
            - jnp.einsum("...ik,...i->...k", s_i, pa[i], precision=lie._HIGHEST)
        )
        u_mats[i], d_invs[i], u_vecs[i] = u_mat, d_inv, u_vec
        parent = model.parents[i]
        if parent >= 0:
            udu = lie.mm(u_mat, lie.mm(d_inv, jnp.swapaxes(u_mat, -1, -2)))
            ia_a = ia[i] - udu
            pa_a = (
                pa[i]
                + lie.mv(ia_a, bias_c[i])
                + lie.mv(u_mat, lie.mv(d_inv, u_vec))
            )
            ia[parent] = ia[parent] + lie.inertia_transform(xs[i], ia_a)
            pa[parent] = pa[parent] + lie.force_act(xs[i], pa_a)

    # Pass 3: outward accelerations
    a0 = _spatial_gravity(model, gravity, batch, dtype)
    acc: list = [None] * nj
    qdd = jnp.zeros(batch + (model.nv,), dtype)
    for i in range(nj):
        parent = model.parents[i]
        a_p = acc[parent] if parent >= 0 else a0
        a_mid = lie.motion_act_inv(xs[i], a_p) + bias_c[i]
        sl = model.v_slice(i)
        qdd_i = lie.mv(
            d_invs[i],
            u_vecs[i]
            - jnp.einsum("...ik,...i->...k", u_mats[i], a_mid, precision=lie._HIGHEST),
        )
        qdd = qdd.at[..., sl].set(qdd_i)
        s_i = ss[i]
        acc[i] = a_mid + lie.mv(jnp.broadcast_to(s_i, qdd_i.shape[:-1] + s_i.shape[-2:]), qdd_i)
    return qdd


def kinetic_energy(model: RobotModel, q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Total kinetic energy including armature (reference `computeKineticEnergy`,
    `pinocchio_overload_algorithms.h:55-76`)."""
    batch = q.shape[:-1]
    dtype = q.dtype
    xs, ss, vqs = _joint_quantities(model, q, v)
    inertias = _body_inertias(model)
    vel: list = [None] * model.njoints
    e = jnp.zeros(batch, dtype)
    for i in range(model.njoints):
        parent = model.parents[i]
        vj = lie.mv(ss[i], vqs[i])
        v_p = vel[parent] if parent >= 0 else jnp.zeros(batch + (6,), dtype)
        vel[i] = lie.motion_act_inv(xs[i], v_p) + vj
        e = e + 0.5 * jnp.einsum(
            "...i,...ij,...j->...", vel[i], inertias[..., i, :, :], vel[i], precision=lie._HIGHEST
        )
    e = e + 0.5 * jnp.sum(model.armature * v * v, axis=-1)
    return e


def potential_energy(model: RobotModel, gravity: jnp.ndarray, q: jnp.ndarray) -> jnp.ndarray:
    """Gravitational potential energy."""
    from jiminy_tpu.ops.kinematics import forward_kinematics

    kin = forward_kinematics(model, q)
    e = jnp.zeros(q.shape[:-1], q.dtype)
    for i in range(model.njoints):
        com_w = lie.se3_apply(
            lie.SE3(kin.omi.rot[..., i, :, :], kin.omi.pos[..., i, :]), model.com[..., i, :]
        )
        e = e - model.mass[..., i] * jnp.sum(gravity * com_w, axis=-1)
    return e
