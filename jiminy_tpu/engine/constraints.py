"""Kinematic constraints: static registry + batched Jacobian/drift assembly.

Re-design of the reference constraint stack (`core/src/constraints/*`,
`Model::computeConstraints` `model.cc:1238-1287`): the registry (what constraints
exist, their row layout, their PGS block structure) is resolved at build time in the
reference ordering BOUNDS_JOINTS → CONTACT_FRAMES → COLLISION_BODIES → USER (the PGS
solution depends on this ordering, `robot/model.h:40-46`); per-step activity is a
boolean mask with the reference's hysteresis (`transitionEps`), carried in the sim
state instead of enable/disable object calls.

Row conventions per constraint type:
- joint bound (1 row): J = ±e_vidx, λ ∈ [0, ∞) (blocked in one direction,
  reference `computePositionLimitsForcesAlgo`, `engine.cc:3268-3338`)
- contact frame (4 rows [tx, ty, tz, rz] in the ground-normal basis): normal row
  λ_z ∈ [0, ∞), torsion row |λ_rz| ≤ torsion·λ_z, tangent rows ‖λ_xy‖ ≤ µ·λ_z
  (reference `FrameConstraint` + PGS block setup `constraint_solvers.cc:46-92`)
- distance (1 row): closed kinematic loops (reference `DistanceConstraint`)
- joint lock (nv_j rows): backlash / user joint locks (reference `JointConstraint`)
"""

from __future__ import annotations

import math
from typing import Callable, NamedTuple, Optional

import jax.numpy as jnp
import numpy as np
from flax import struct

from jiminy_tpu.engine.config import ContactOptions
from jiminy_tpu.engine.contact import flat_ground
from jiminy_tpu.models import joints as jt
from jiminy_tpu.models.model import RobotModel
from jiminy_tpu.ops import lie
from jiminy_tpu.ops.kinematics import (
    KinData,
    frame_jacobian_world_aligned,
    frame_placement,
    frame_velocity_local,
)


@struct.dataclass
class ConstraintSet:
    """Static constraint registry (reference `ConstraintTree`)."""

    # Joint bounds: one row per bounded 1-dof joint (mechanical joints with motors)
    bound_joint_indices: tuple = struct.field(pytree_node=False, default=())
    # Ground contacts: frame indices (must match robot.contact_frame_indices order)
    contact_frame_indices: tuple = struct.field(pytree_node=False, default=())
    # Per-contact sphere radius, 0.0 = point (primitive collision bodies)
    contact_radii: tuple = struct.field(pytree_node=False, default=())
    # Closed loops: ((frame_a, frame_b), ...)
    distance_pairs: tuple = struct.field(pytree_node=False, default=())
    distance_ref: jnp.ndarray = struct.field(default_factory=lambda: jnp.zeros(0))
    # Rolling-without-slip: spheres ((frame_idx, radius), ...) and wheels
    # ((frame_idx, radius, (ax, ay, az)), ...) — reference `SphereConstraint`/
    # `WheelConstraint`, 3 unbounded rows each
    sphere_specs: tuple = struct.field(pytree_node=False, default=())
    wheel_specs: tuple = struct.field(pytree_node=False, default=())

    @property
    def n_bounds(self) -> int:
        return len(self.bound_joint_indices)

    @property
    def n_contacts(self) -> int:
        return len(self.contact_frame_indices)

    @property
    def n_distance(self) -> int:
        return len(self.distance_pairs)

    @property
    def n_rolling(self) -> int:
        return len(self.sphere_specs) + len(self.wheel_specs)

    @property
    def total_rows(self) -> int:
        return self.n_bounds + 4 * self.n_contacts + self.n_distance + 3 * self.n_rolling

    def row_offsets(self):
        """(bounds_start, contacts_start, distance_start, rolling_start)."""
        off_d = self.n_bounds + 4 * self.n_contacts
        return 0, self.n_bounds, off_d, off_d + self.n_distance


class ConstraintSystem(NamedTuple):
    """Per-eval assembled constraint problem (all shapes static)."""

    jac: jnp.ndarray  # (N, nv)
    drift: jnp.ndarray  # (N,)
    active: jnp.ndarray  # (N,) bool row activity
    contact_basis: jnp.ndarray  # (nc, 3, 3) ground-normal basis (world cols)
    contact_active: jnp.ndarray  # (nc,)
    bound_active: jnp.ndarray  # (nb,)
    contact_depth: jnp.ndarray  # (nc,)


def build_constraint_set(
    robot, loop_pairs=(), include_contacts=True, include_bounds=True
) -> ConstraintSet:
    """Assemble the registry from a robot: bounds for motorized 1-dof joints with
    finite limits, contacts for every contact frame (constraint contact mode
    only), plus explicit loop closures."""
    model = robot.model
    bounds = []
    if include_bounds:
        lo = np.asarray(model.position_limit_lower)
        hi = np.asarray(model.position_limit_upper)
        candidates = list(robot.motors.joint_indices) if robot.motors else []
        candidates += list(robot.backlash_joint_indices)
        for j in candidates:
            t = jt.JointType(model.joint_types[j])
            if t in (jt.JointType.REVOLUTE, jt.JointType.PRISMATIC):
                qi = model.idx_q[j]
                if np.isfinite(lo[qi]) or np.isfinite(hi[qi]):
                    bounds.append(j)
    pairs = tuple(
        (model.frame_index(a) if isinstance(a, str) else a,
         model.frame_index(b) if isinstance(b, str) else b)
        for a, b in loop_pairs
    )
    spheres, wheels = [], []
    for name, radius, axis in getattr(robot, "rolling_specs", ()):
        fidx = model.frame_index(name) if isinstance(name, str) else name
        if axis is None:
            spheres.append((fidx, radius))
        else:
            wheels.append((fidx, radius, tuple(axis)))
    return ConstraintSet(
        bound_joint_indices=tuple(bounds),
        contact_frame_indices=robot.contact_frame_indices if include_contacts else (),
        contact_radii=(
            (robot.contact_radii or (0.0,) * len(robot.contact_frame_indices))
            if include_contacts
            else ()
        ),
        distance_pairs=pairs,
        distance_ref=jnp.zeros(len(pairs), model.dtype),
        sphere_specs=tuple(spheres),
        wheel_specs=tuple(wheels),
    )


def compute_distance_refs(model: RobotModel, cset: ConstraintSet, kin: KinData) -> jnp.ndarray:
    """Reference distances at the current configuration (constraint targets)."""
    refs = []
    for fa, fb in cset.distance_pairs:
        pa = frame_placement(model, kin, fa).pos
        pb = frame_placement(model, kin, fb).pos
        refs.append(jnp.linalg.norm(pa - pb, axis=-1))
    return jnp.stack(refs, axis=-1) if refs else jnp.zeros(kin.vel.shape[:-2] + (0,), kin.vel.dtype)


def _normal_basis(n: jnp.ndarray) -> jnp.ndarray:
    """Right-handed basis with column 2 = ground normal (reference
    `FrameConstraint::setNormal`, `frame_constraint.cc:62-68`)."""
    ex = jnp.zeros_like(n).at[..., 0].set(1.0)
    c1 = jnp.cross(n, ex)
    # Degenerate when n ~ ex: fall back to n x ey
    ey = jnp.zeros_like(n).at[..., 1].set(1.0)
    c1_alt = jnp.cross(n, ey)
    use_alt = jnp.linalg.norm(c1, axis=-1, keepdims=True) < 1e-6
    c1 = jnp.where(use_alt, c1_alt, c1)
    c1 = c1 / jnp.maximum(jnp.linalg.norm(c1, axis=-1, keepdims=True), 1e-12)
    c0 = jnp.cross(c1, n)
    return jnp.stack([c0, c1, n], axis=-1)


def compute_constraint_system(
    model: RobotModel,
    cset: ConstraintSet,
    opts: ContactOptions,
    ground_fn: Optional[Callable],
    kin_bias: KinData,
    jac_world: jnp.ndarray,
    q: jnp.ndarray,
    v: jnp.ndarray,
    prev_contact_active: jnp.ndarray,
    prev_bound_active: jnp.ndarray,
    distance_ref: Optional[jnp.ndarray] = None,
    rolling_ref: Optional[jnp.ndarray] = None,
) -> ConstraintSystem:
    """Assemble (J, γ, active) for all registered constraints.

    `kin_bias` must be forward kinematics computed with zero acceleration so its
    `acc` leaves are the velocity-bias terms (reference `model.cc:1253-1268`).
    """
    if ground_fn is None:
        ground_fn = flat_ground
    dtype = q.dtype
    batch = q.shape[:-1]
    nv = model.nv
    n_rows = cset.total_rows
    jac = jnp.zeros(batch + (n_rows, nv), dtype)
    drift = jnp.zeros(batch + (n_rows,), dtype)
    active = jnp.zeros(batch + (n_rows,), bool)

    omega = 2.0 * math.pi * opts.stabilization_freq
    kp, kd = omega * omega, 2.0 * omega
    off_b, off_c, off_d, off_r = cset.row_offsets()

    # ---------------- joint bounds ----------------
    bound_active_list = []
    for k, j in enumerate(cset.bound_joint_indices):
        qi, vi = model.idx_q[j], model.idx_v[j]
        qj, vj = q[..., qi], v[..., vi]
        lo = model.position_limit_lower[..., qi]
        hi = model.position_limit_upper[..., qi]
        over = qj > hi
        raw = over | (qj < lo)
        inside = (qj > lo + opts.transition_eps) & (qj < hi - opts.transition_eps)
        act = raw | (prev_bound_active[..., k] & ~inside)
        bound_active_list.append(act)
        # Blocked in one direction: J = -e if above upper bound else +e, λ >= 0
        sign = jnp.where(over, -1.0, 1.0).astype(dtype)
        row = off_b + k
        jac = jac.at[..., row, vi].set(sign)
        dq = qj - jnp.clip(qj, lo, hi)
        drift = drift.at[..., row].set(sign * (kp * dq + kd * vj))
        active = active.at[..., row].set(act)
    bound_active = (
        jnp.stack(bound_active_list, axis=-1)
        if bound_active_list
        else jnp.zeros(batch + (0,), bool)
    )

    # ---------------- contact frames ----------------
    basis_list, cact_list, depth_list = [], [], []
    radii = cset.contact_radii or (0.0,) * cset.n_contacts
    for k, fidx in enumerate(cset.contact_frame_indices):
        radius = radii[k]
        fpl = frame_placement(model, kin_bias, fidx)
        pos = fpl.pos
        h, n = ground_fn(pos[..., :2])
        n = n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-12)
        depth = (pos[..., 2] - h) * n[..., 2]
        if radius > 0.0:
            depth = depth - radius
        act = (depth < 0.0) | (prev_contact_active[..., k] & (depth <= opts.transition_eps))
        basis = _normal_basis(n)

        # Frame jacobian, world-aligned (ang, lin) -> basis coordinates
        jf = frame_jacobian_world_aligned(model, kin_bias, jac_world, fidx)
        bt = jnp.swapaxes(basis, -1, -2)
        j_lin_w = jf[..., 3:6, :]
        if radius > 0.0:
            # Sphere primitive: constrain the surface point at -r n̂
            # (skewRadius = r·skew(n), reference `sphere_constraint.cc`)
            sk = radius * lie.skew(n)
            j_lin_w = j_lin_w + lie.mm(sk, jf[..., 0:3, :])
        j_lin = lie.mm(bt, j_lin_w)
        j_ang = lie.mm(bt, jf[..., 0:3, :])

        # Classical world-aligned bias acceleration + velocity of the frame
        v_local = frame_velocity_local(model, kin_bias, fidx)
        parent = model.frame_parents[fidx]
        f_in_parent = model.frame_placement(fidx)
        a_sp_local = lie.motion_act_inv(f_in_parent, kin_bias.acc[..., parent, :])
        rot = fpl.rot
        v_ang_w = lie.mv(rot, v_local[..., 0:3])
        v_lin_w = lie.mv(rot, v_local[..., 3:6])
        a_lin_w = lie.mv(rot, a_sp_local[..., 3:6]) + jnp.cross(v_ang_w, v_lin_w)
        a_ang_w = lie.mv(rot, a_sp_local[..., 0:3])
        if radius > 0.0:
            v_lin_w = v_lin_w + lie.mv(sk, v_ang_w)
            a_lin_w = a_lin_w + lie.mv(sk, a_ang_w)

        # Baumgarte: reference transform sits on the ground surface below the
        # frame, so Δposition = depth·n and Δrotation = 0 (engine.cc:3182-3195)
        g_lin = a_lin_w + kp * depth[..., None] * n + kd * v_lin_w
        g_ang = a_ang_w + kd * v_ang_w
        g_lin_b = lie.mv(bt, g_lin)
        g_ang_b = lie.mv(bt, g_ang)

        row = off_c + 4 * k
        jac = jac.at[..., row : row + 3, :].set(j_lin)
        jac = jac.at[..., row + 3, :].set(j_ang[..., 2, :])
        drift = drift.at[..., row : row + 3].set(g_lin_b)
        drift = drift.at[..., row + 3].set(g_ang_b[..., 2])
        for r in range(4):
            active = active.at[..., row + r].set(act)
        basis_list.append(basis)
        cact_list.append(act)
        depth_list.append(depth)

    contact_basis = (
        jnp.stack(basis_list, axis=-3)
        if basis_list
        else jnp.zeros(batch + (0, 3, 3), dtype)
    )
    contact_active = (
        jnp.stack(cact_list, axis=-1) if cact_list else jnp.zeros(batch + (0,), bool)
    )
    contact_depth = (
        jnp.stack(depth_list, axis=-1) if depth_list else jnp.zeros(batch + (0,), dtype)
    )

    # ---------------- distance loops ----------------
    for k, (fa, fb) in enumerate(cset.distance_pairs):
        pa = frame_placement(model, kin_bias, fa)
        pb = frame_placement(model, kin_bias, fb)
        dp = pa.pos - pb.pos
        dist = jnp.maximum(jnp.linalg.norm(dp, axis=-1), 1e-12)
        direction = dp / dist[..., None]

        def _wa(fidx, fpl):
            vl = frame_velocity_local(model, kin_bias, fidx)
            parent = model.frame_parents[fidx]
            asp = lie.motion_act_inv(model.frame_placement(fidx), kin_bias.acc[..., parent, :])
            vw_ang = lie.mv(fpl.rot, vl[..., 0:3])
            vw_lin = lie.mv(fpl.rot, vl[..., 3:6])
            aw_lin = lie.mv(fpl.rot, asp[..., 3:6]) + jnp.cross(vw_ang, vw_lin)
            jf = frame_jacobian_world_aligned(model, kin_bias, jac_world, fidx)
            return vw_lin, aw_lin, jf[..., 3:6, :]

        va, aa, ja = _wa(fa, pa)
        vb, ab, jb = _wa(fb, pb)
        dv = va - vb
        row_jac = jnp.einsum("...i,...ij->...j", direction, ja - jb, precision=lie._HIGHEST)
        dv_proj = jnp.sum(dv * direction, axis=-1)
        g = jnp.sum(direction * (aa - ab), axis=-1)
        g = g + (jnp.sum(dv * dv, axis=-1) - dv_proj**2) / dist
        ref = cset.distance_ref if distance_ref is None else distance_ref
        g = g + kp * (dist - ref[..., k]) + kd * dv_proj
        row = off_d + k
        jac = jac.at[..., row, :].set(row_jac)
        drift = drift.at[..., row].set(g)
        active = active.at[..., row].set(jnp.ones(batch, bool))

    # ---------------- rolling constraints (spheres, wheels) ----------------
    def _frame_wa(fidx):
        fpl = frame_placement(model, kin_bias, fidx)
        vl = frame_velocity_local(model, kin_bias, fidx)
        parent = model.frame_parents[fidx]
        asp = lie.motion_act_inv(model.frame_placement(fidx), kin_bias.acc[..., parent, :])
        vw_ang = lie.mv(fpl.rot, vl[..., 0:3])
        vw_lin = lie.mv(fpl.rot, vl[..., 3:6])
        aw_lin = lie.mv(fpl.rot, asp[..., 3:6]) + jnp.cross(vw_ang, vw_lin)
        aw_ang = lie.mv(fpl.rot, asp[..., 0:3])
        jf = frame_jacobian_world_aligned(model, kin_bias, jac_world, fidx)
        return fpl, vw_ang, vw_lin, aw_ang, aw_lin, jf

    rolling_slot = 0
    ez = jnp.asarray([0.0, 0.0, 1.0], dtype)
    for fidx, radius in cset.sphere_specs:
        fpl, w_w, v_w, a_ang, a_lin, jf = _frame_wa(fidx)
        # skewRadius = r * skew(n): contact point at -r n (reference
        # `sphere_constraint.cc`)
        n = jnp.broadcast_to(ez, batch + (3,))
        sk = radius * lie.skew(n)
        row_jac = jf[..., 3:6, :] + lie.mm(sk, jf[..., 0:3, :])
        ref_h = rolling_ref[..., rolling_slot] if rolling_ref is not None else fpl.pos[..., 2]
        delta = fpl.pos[..., 2] - ref_h
        vel = v_w + lie.mv(sk, w_w)
        g = a_lin + lie.mv(sk, a_ang) + kp * delta[..., None] * n + kd * vel
        row = off_r + 3 * rolling_slot
        jac = jac.at[..., row : row + 3, :].set(row_jac)
        drift = drift.at[..., row : row + 3].set(g)
        for r_i in range(3):
            active = active.at[..., row + r_i].set(jnp.ones(batch, bool))
        rolling_slot += 1

    for fidx, radius, axis in cset.wheel_specs:
        fpl, w_w, v_w, a_ang, a_lin, jf = _frame_wa(fidx)
        n = jnp.broadcast_to(ez, batch + (3,))
        axis_w = lie.mv(fpl.rot, jnp.asarray(axis, dtype))
        x = jnp.cross(jnp.cross(axis_w, n), axis_w)
        x_norm = jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-9)
        y = x / x_norm
        sk = radius * lie.skew(y)
        row_jac = jf[..., 3:6, :] + lie.mm(sk, jf[..., 0:3, :])
        ref_h = rolling_ref[..., rolling_slot] if rolling_ref is not None else fpl.pos[..., 2]
        delta = (
            fpl.pos[..., 2]
            - ref_h
            + radius * (n[..., 2] - y[..., 2])
        )
        daxis = jnp.cross(w_w, axis_w)
        dx = jnp.cross(jnp.cross(daxis, n), axis_w) + jnp.cross(
            jnp.cross(axis_w, n), daxis
        )
        z = dx / x_norm
        dy = z - jnp.sum(y * z, axis=-1, keepdims=True) * y
        vel = v_w + lie.mv(sk, w_w)
        g = (
            a_lin
            + lie.mv(sk, a_ang)
            + lie.mv(radius * lie.skew(dy), w_w)
            + kp * delta[..., None] * n
            + kd * vel
        )
        row = off_r + 3 * rolling_slot
        jac = jac.at[..., row : row + 3, :].set(row_jac)
        drift = drift.at[..., row : row + 3].set(g)
        for r_i in range(3):
            active = active.at[..., row + r_i].set(jnp.ones(batch, bool))
        rolling_slot += 1

    return ConstraintSystem(
        jac=jac,
        drift=drift,
        active=active,
        contact_basis=contact_basis,
        contact_active=contact_active,
        bound_active=bound_active,
        contact_depth=contact_depth,
    )
