"""Component-wise batched dynamics core — the TPU fast path.

Why this exists: the generic `ops.dynamics` builds (..., 3, 3)/(…, 6, 6)
tensor ops whose *feature* dims land in the TPU lane dimension — at batch B the
VPU runs at ~2% lane utilization and the ABA compiles to thousands of tiny
un-fusable contractions (measured ~6 ms per 2048-env ABA on v5e).  Here every
scalar component of every spatial quantity is its own (B,) array and every
operation is a plain elementwise mul/add over the env batch — XLA fuses the
whole tree sweep into a handful of VPU kernels with lanes fully occupied by
envs.  This is the struct-of-arrays "scalar SSA over env vectors" formulation;
it is also the exact layout a Pallas kernel would use, so kernels can later be
carved out without changing the math.

Supported models (checked by `supports_model`): fixed base or FREE root joint,
all other joints REVOLUTE/PRISMATIC (1-dof) or SPHERICAL (3-dof, used by the
flexibility-joint surgery).  Semantics match `ops.dynamics.aba`
+ `engine.contact` bit-for-bit at matched precision (validated in
tests/test_cdyn.py); reference: `pinocchio_overload_algorithms.h` (ABA with
armature), `engine.cc:3117-3238` (spring-damper contact).

Everything static (joint placements, axes, inertias, limits) is baked in as
Python floats at trace time — zero constant traffic at runtime.
"""

from __future__ import annotations

import math
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from jiminy_tpu.models import joints as jt
from jiminy_tpu.models.model import RobotModel

# --------------------------------------------------------------------------- #
# Scalar-component linear algebra: V3 = [x, y, z], M3 = 3x3 nested list.
# Entries are jnp arrays of identical shape (the env batch) or python floats.
# --------------------------------------------------------------------------- #


def v3(x=0.0, y=0.0, z=0.0):
    return [x, y, z]


def v_add(a, b):
    return [a[0] + b[0], a[1] + b[1], a[2] + b[2]]


def v_sub(a, b):
    return [a[0] - b[0], a[1] - b[1], a[2] - b[2]]


def v_scale(a, s):
    return [a[0] * s, a[1] * s, a[2] * s]


def v_dot(a, b):
    return a[0] * b[0] + a[1] * b[1] + a[2] * b[2]


def v_cross(a, b):
    return [
        a[1] * b[2] - a[2] * b[1],
        a[2] * b[0] - a[0] * b[2],
        a[0] * b[1] - a[1] * b[0],
    ]


def m_identity():
    return [[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]]


def m_mv(m, v):
    return [
        m[0][0] * v[0] + m[0][1] * v[1] + m[0][2] * v[2],
        m[1][0] * v[0] + m[1][1] * v[1] + m[1][2] * v[2],
        m[2][0] * v[0] + m[2][1] * v[1] + m[2][2] * v[2],
    ]


def m_tv(m, v):
    """m^T @ v"""
    return [
        m[0][0] * v[0] + m[1][0] * v[1] + m[2][0] * v[2],
        m[0][1] * v[0] + m[1][1] * v[1] + m[2][1] * v[2],
        m[0][2] * v[0] + m[1][2] * v[1] + m[2][2] * v[2],
    ]


def m_mm(a, b):
    return [
        [sum(a[i][k] * b[k][j] for k in range(3)) for j in range(3)] for i in range(3)
    ]


def m_add(a, b):
    return [[a[i][j] + b[i][j] for j in range(3)] for i in range(3)]


def rodrigues(axis, q):
    """Rotation matrix exp(axis * q); axis = python float triple (constant)."""
    c, s = jnp.cos(q), jnp.sin(q)
    x, y, z = axis
    one_c = 1.0 - c
    return [
        [c + x * x * one_c, x * y * one_c - z * s, x * z * one_c + y * s],
        [y * x * one_c + z * s, c + y * y * one_c, y * z * one_c - x * s],
        [z * x * one_c - y * s, z * y * one_c + x * s, c + z * z * one_c],
    ]


def quat_to_m(qx, qy, qz, qw):
    xx, yy, zz = qx * qx, qy * qy, qz * qz
    xy, xz, yz = qx * qy, qx * qz, qy * qz
    wx, wy, wz = qw * qx, qw * qy, qw * qz
    return [
        [1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy)],
        [2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx)],
        [2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy)],
    ]


# Symmetric 6x6 (articulated spatial inertia) as a python 6x6 list of (B,)
# entries in (ang, lin) block order; only built/updated through helpers.


def sym6_from_body(mass, com, inertia_c):
    """Spatial inertia about the joint origin: [[I_O, m c^], [m c^T^, m I]]."""
    cx, cy, cz = com
    m = mass
    # skew(c)
    sc = [[0.0, -cz, cy], [cz, 0.0, -cx], [-cy, cx, 0.0]]
    # I_O = I_C - m * sc @ sc
    scsc = [[sum(sc[i][k] * sc[k][j] for k in range(3)) for j in range(3)] for i in range(3)]
    top_left = [[inertia_c[i][j] - m * scsc[i][j] for j in range(3)] for i in range(3)]
    out = [[0.0] * 6 for _ in range(6)]
    for i in range(3):
        for j in range(3):
            out[i][j] = top_left[i][j]
            out[i][3 + j] = m * sc[i][j]
            out[3 + i][j] = m * sc[j][i]
            out[3 + i][3 + j] = m * (1.0 if i == j else 0.0)
    return out


def sym6_mv(m6, ang, lin):
    """(6x6) @ (ang, lin) -> (ang', lin')."""
    out = []
    vec = [*ang, *lin]
    for i in range(6):
        out.append(sum(m6[i][j] * vec[j] for j in range(6)))
    return out[:3], out[3:]


def solve_sym3(m3, rhs):
    """Solve symmetric positive definite 3x3 via unrolled LDL^T."""
    n = 3
    l = [[0.0] * n for _ in range(n)]
    d = [0.0] * n
    for j in range(n):
        dj = m3[j][j]
        for k in range(j):
            dj = dj - l[j][k] * l[j][k] * d[k]
        d[j] = dj
        inv_dj = 1.0 / dj
        for i in range(j + 1, n):
            s = m3[i][j]
            for k in range(j):
                s = s - l[i][k] * l[j][k] * d[k]
            l[i][j] = s * inv_dj
    y = list(rhs)
    for i in range(n):
        for k in range(i):
            y[i] = y[i] - l[i][k] * y[k]
    for i in range(n):
        y[i] = y[i] / d[i]
    for i in reversed(range(n)):
        for k in range(i + 1, n):
            y[i] = y[i] - l[k][i] * y[k]
    return y


def solve_sym6(m6, rhs):
    """Solve symmetric positive definite 6x6 via unrolled Cholesky (LDL^T)."""
    # LDL^T decomposition on python 6x6 of (B,) arrays
    n = 6
    l = [[0.0] * n for _ in range(n)]
    d = [0.0] * n
    for j in range(n):
        dj = m6[j][j]
        for k in range(j):
            dj = dj - l[j][k] * l[j][k] * d[k]
        d[j] = dj
        inv_dj = 1.0 / dj
        for i in range(j + 1, n):
            s = m6[i][j]
            for k in range(j):
                s = s - l[i][k] * l[j][k] * d[k]
            l[i][j] = s * inv_dj
    # Forward solve L y = rhs
    y = list(rhs)
    for i in range(n):
        for k in range(i):
            y[i] = y[i] - l[i][k] * y[k]
    # Diagonal
    for i in range(n):
        y[i] = y[i] / d[i]
    # Backward solve L^T x = y
    for i in reversed(range(n)):
        for k in range(i + 1, n):
            y[i] = y[i] - l[k][i] * y[k]
    return y


# --------------------------------------------------------------------------- #
# Model support check + constant extraction
# --------------------------------------------------------------------------- #


def supports_model(model: RobotModel) -> bool:
    for i, t in enumerate(model.joint_types):
        t = jt.JointType(t)
        if i == 0 and t == jt.JointType.FREE:
            continue
        if t not in (
            jt.JointType.REVOLUTE,
            jt.JointType.PRISMATIC,
            jt.JointType.SPHERICAL,
        ):
            return False
    return True


class _Consts:
    """Static per-joint constants as python floats (baked into the program)."""

    def __init__(self, model: RobotModel):
        self.nj = model.njoints
        self.parents = model.parents
        self.types = [jt.JointType(t) for t in model.joint_types]
        self.idx_q = model.idx_q
        self.idx_v = model.idx_v
        self.rot = np.asarray(model.jplacement_rot, dtype=np.float64)
        self.pos = np.asarray(model.jplacement_pos, dtype=np.float64)
        self.axis = np.asarray(model.joint_axes, dtype=np.float64)
        self.mass = np.asarray(model.mass, dtype=np.float64)
        self.com = np.asarray(model.com, dtype=np.float64)
        self.inertia = np.asarray(model.inertia, dtype=np.float64)
        self.armature = np.asarray(model.armature, dtype=np.float64)
        self.damping = np.asarray(model.damping, dtype=np.float64)
        self.frame_parents = model.frame_parents
        self.frot = np.asarray(model.fplacement_rot, dtype=np.float64)
        self.fpos = np.asarray(model.fplacement_pos, dtype=np.float64)
        self.has_free_root = bool(self.types) and self.types[0] == jt.JointType.FREE


# --------------------------------------------------------------------------- #
# The fused dynamics evaluation
# --------------------------------------------------------------------------- #


class ComponentDynamics:
    """Fused spring-damper forward dynamics for one robot model.

    `accel(q, v, u)`: (..., nq), (..., nv), (..., nv) -> (..., nv) acceleration,
    identical to `aba(model, g, q, v, u + contact + bounds ...)` on the generic
    path.  All tree loops unroll at trace time; every op is elementwise over
    the batch.
    """

    def __init__(
        self,
        model: RobotModel,
        gravity,
        contact_opts=None,
        contact_frames: tuple = (),
        contact_radii: tuple = (),
        ground_fn: Optional[Callable] = None,
        bound_gains: Optional[dict] = None,
        pallas_tile: int = 0,
    ):
        if not supports_model(model):
            raise ValueError("ComponentDynamics: unsupported joint types")
        self.c = _Consts(model)
        self.model = model
        self.gravity = tuple(float(g) for g in np.asarray(gravity))
        self.contact_opts = contact_opts
        self.contact_frames = tuple(contact_frames)
        self.contact_radii = tuple(contact_radii) or (0.0,) * len(self.contact_frames)
        self.ground_fn = ground_fn
        # Optional stable penalty bounds: {vidx: (lo, hi, kp, kd)}
        self.bound_gains = bound_gains or {}
        # Pallas megakernel: 0 = off; otherwise the preferred env-tile size
        # (the call falls back to the XLA path when the batch doesn't divide).
        self.pallas_tile = int(pallas_tile)
        self._pallas_runs = {}

    def _pallas_ground_ok(self) -> bool:
        """The megakernel supports flat ground and any heightmap exposing the
        elementwise `height_components` API (all `utils.terrain` generators)."""
        return self.ground_fn is None or (
            getattr(self.ground_fn, "height_components", None) is not None
        )

    # ---------------- kinematics ----------------
    def _joint_x(self, qc):
        """Per-joint placement in parent joint frame: (M3, V3) lists."""
        c = self.c
        xs = []
        for i in range(c.nj):
            tree_r = c.rot[i].tolist()
            tree_p = c.pos[i].tolist()
            if c.types[i] == jt.JointType.FREE:
                qi = c.idx_q[i]
                rot_j = quat_to_m(qc[qi + 3], qc[qi + 4], qc[qi + 5], qc[qi + 6])
                pos_j = [qc[qi], qc[qi + 1], qc[qi + 2]]
                rot = m_mm(tree_r, rot_j)
                pos = v_add(m_mv(tree_r, pos_j), tree_p)
            elif c.types[i] == jt.JointType.SPHERICAL:
                qi = c.idx_q[i]
                rot_j = quat_to_m(qc[qi], qc[qi + 1], qc[qi + 2], qc[qi + 3])
                rot = m_mm(tree_r, rot_j)
                pos = tree_p
            elif c.types[i] == jt.JointType.REVOLUTE:
                rot_j = rodrigues(c.axis[i].tolist(), qc[c.idx_q[i]])
                rot = m_mm(tree_r, rot_j)
                pos = tree_p
            else:  # PRISMATIC
                rot = tree_r
                disp = v_scale(c.axis[i].tolist(), qc[c.idx_q[i]])
                pos = v_add(m_mv(tree_r, disp), tree_p)
            xs.append((rot, pos))
        return xs

    def _world_placements(self, xs):
        c = self.c
        world = []
        for i in range(c.nj):
            rot_i, pos_i = xs[i]
            p = c.parents[i]
            if p < 0:
                world.append((rot_i, pos_i))
            else:
                rw, pw = world[p]
                world.append((m_mm(rw, rot_i), v_add(m_mv(rw, pos_i), pw)))
        return world

    # ---------------- contact ----------------
    def _contact_fext(self, xs, world, vel, want_aux: bool = False):
        """Spring-damper ground forces -> per-joint LOCAL wrench components
        ((ang V3, lin V3) per joint) + world forces per contact (V3).

        `want_aux` additionally collects per-contact (depth, w_local6) where
        w_local6 is the LOCAL contact-frame wrench [n(3), f(3)] — mirror of
        `engine.contact.compute_contact_forces`'s aux outputs."""
        c = self.c
        opts = self.contact_opts
        fext = [None] * c.nj
        f_world_all = []
        aux_all = []
        for fidx, radius in zip(self.contact_frames, self.contact_radii):
            parent = c.frame_parents[fidx]
            fp = c.fpos[fidx].tolist()
            rw, pw = world[parent]
            # Contact point world position
            pc = v_add(m_mv(rw, fp), pw)
            # Point velocity (world axes): R_w (v_lin + w x fp)
            w_l, v_l = vel[parent]
            v_pt = v_add(v_l, v_cross(w_l, fp))
            v_w = m_mv(rw, v_pt)
            d_off = None
            if self.ground_fn is None:
                h = 0.0
                n = [0.0, 0.0, 1.0]
                depth = pc[2]
                v_depth = v_w[2]
            else:
                cfn = getattr(self.ground_fn, "height_components", None)
                if cfn is not None:
                    # Elementwise terrain query — traces inside the Pallas
                    # megakernel (heightmap evaluated per contact, on-chip)
                    h, n = cfn(pc[0], pc[1])
                    n = list(n)
                else:
                    xy = jnp.stack(
                        jnp.broadcast_arrays(pc[0], pc[1]), axis=-1
                    )
                    h, n_arr = self.ground_fn(xy)
                    n = [n_arr[..., 0], n_arr[..., 1], n_arr[..., 2]]
                nn = jnp.sqrt(jnp.maximum(v_dot(n, n), 1e-24))
                n = v_scale(n, 1.0 / nn)
                depth = (pc[2] - h) * n[2]
                v_depth = v_dot(v_w, n)
            if radius > 0.0:
                # Sphere primitive: surface point at -r n̂ from the center
                depth = depth - radius
                d_off = v_scale(n, -radius)
                w_w = m_mv(rw, w_l)
                v_w = v_add(v_w, v_cross(w_w, d_off))
                v_depth = v_dot(v_w, n)
            f_normal = -jnp.minimum(opts.stiffness * depth + opts.damping * v_depth, 0.0)
            fw = v_scale(n, f_normal)
            # Saturated tangential friction
            v_tang = v_sub(v_w, v_scale(n, v_depth))
            v_norm = jnp.sqrt(jnp.maximum(v_dot(v_tang, v_tang), 1e-24))
            v_ratio = jnp.minimum(v_norm / opts.transition_velocity, 1.0)
            scale_t = opts.friction * v_ratio * f_normal / v_norm
            fw = v_sub(fw, v_scale(v_tang, scale_t))
            if opts.transition_eps > 1e-12:
                blend = jnp.tanh(2.0 * (-depth) / opts.transition_eps)
                fw = v_scale(fw, blend)
            active = depth < 0.0
            fw = [jnp.where(active, comp, 0.0) for comp in fw]
            f_world_all.append(fw)
            # Transport to parent joint origin, LOCAL frame
            lever = v_sub(pc, pw)
            if d_off is not None:
                lever = v_add(lever, d_off)
            tau_w = v_cross(lever, fw)
            f_j = m_tv(rw, fw)
            n_j = m_tv(rw, tau_w)
            if want_aux:
                # LOCAL contact-frame wrench: R_f = R_w(parent) @ frot
                frot = c.frot[fidx].tolist()
                f_local = m_tv(frot, f_j)
                if d_off is not None:
                    n_local = m_tv(frot, m_tv(rw, v_cross(d_off, fw)))
                else:
                    n_local = [jnp.zeros_like(f_local[0])] * 3
                aux_all.append((depth, [*n_local, *f_local]))
            if fext[parent] is None:
                fext[parent] = (n_j, f_j)
            else:
                pa, pl = fext[parent]
                fext[parent] = (v_add(pa, n_j), v_add(pl, f_j))
        return fext, f_world_all, aux_all

    # ---------------- main evaluation ----------------
    def accel(self, q, v, tau, return_contacts: bool = False):
        """Array-facing API: splits into components, runs the core, restacks."""
        model = self.model
        if (
            self.pallas_tile
            and not return_contacts
            and q.ndim == 2
            and self._pallas_ground_ok()
        ):
            b = q.shape[0]
            for tile in (self.pallas_tile, 4096, 2048, 1024, 512, 256):
                if tile and b % tile == 0 and tile % 128 == 0:
                    if tile not in self._pallas_runs:
                        self._pallas_runs[tile] = _pallas_accel_fn(self, tile=tile)
                    return self._pallas_runs[tile](q, v, tau)
        qc = [q[..., i] for i in range(model.nq)]
        vc = [v[..., i] for i in range(model.nv)]
        tc = [tau[..., i] for i in range(model.nv)]
        qdd_parts, f_world_all = self._accel_core(qc, vc, tc)
        batch = jnp.broadcast_shapes(*[jnp.shape(val) for val in qdd_parts])
        cols = [jnp.broadcast_to(x, batch) for x in qdd_parts]
        qdd_full = jnp.stack(cols, axis=-1)
        if return_contacts:
            fw = (
                jnp.stack(
                    [jnp.stack(jnp.broadcast_arrays(*f), axis=-1) for f in f_world_all],
                    axis=-2,
                )
                if f_world_all
                else jnp.zeros(batch + (0, 3), qdd_full.dtype)
            )
            return qdd_full, fw
        return qdd_full

    # ---------------- post-step auxiliary outputs ----------------
    def _fk_accel_components(self, xs, vc, ac):
        """Velocity + gravity-free acceleration recursion given the solved
        joint accelerations (component mirror of
        `ops.kinematics.forward_kinematics(model, q, v, a)`)."""
        c = self.c
        vel = [None] * c.nj
        acc = [None] * c.nj
        for i in range(c.nj):
            rot_i, pos_i = xs[i]
            p = c.parents[i]
            w_p, v_p = vel[p] if p >= 0 else (v3(), v3())
            a_p = acc[p] if p >= 0 else (v3(), v3())
            w_in = m_tv(rot_i, w_p)
            v_in = m_tv(rot_i, v_sub(v_p, v_cross(pos_i, w_p)))
            aw_in = m_tv(rot_i, a_p[0])
            al_in = m_tv(rot_i, v_sub(a_p[1], v_cross(pos_i, a_p[0])))
            vi = c.idx_v[i]
            if c.types[i] == jt.JointType.FREE:
                vj_lin = [vc[vi], vc[vi + 1], vc[vi + 2]]
                vj_ang = [vc[vi + 3], vc[vi + 4], vc[vi + 5]]
                aj_lin = [ac[vi], ac[vi + 1], ac[vi + 2]]
                aj_ang = [ac[vi + 3], ac[vi + 4], ac[vi + 5]]
            elif c.types[i] == jt.JointType.SPHERICAL:
                vj_ang = [vc[vi], vc[vi + 1], vc[vi + 2]]
                vj_lin = v3()
                aj_ang = [ac[vi], ac[vi + 1], ac[vi + 2]]
                aj_lin = v3()
            elif c.types[i] == jt.JointType.REVOLUTE:
                ax = c.axis[i].tolist()
                vj_ang, vj_lin = v_scale(ax, vc[vi]), v3()
                aj_ang, aj_lin = v_scale(ax, ac[vi]), v3()
            else:  # PRISMATIC
                ax = c.axis[i].tolist()
                vj_ang, vj_lin = v3(), v_scale(ax, vc[vi])
                aj_ang, aj_lin = v3(), v_scale(ax, ac[vi])
            w_i = v_add(w_in, vj_ang)
            v_i = v_add(v_in, vj_lin)
            vel[i] = (w_i, v_i)
            # a_i = X^-1 a_p + S qdd + v_i x vj (motion cross)
            b_ang = v_cross(w_i, vj_ang)
            b_lin = v_add(v_cross(w_i, vj_lin), v_cross(v_i, vj_ang))
            acc[i] = (
                v_add(v_add(aw_in, aj_ang), b_ang),
                v_add(v_add(al_in, aj_lin), b_lin),
            )
        return vel, acc

    def _aux_components(self, qc, vc, ac, imu_frames: tuple = ()):
        """Component-level post-step outputs given solved accelerations:
        returns (f_world rows, w_local rows, depth list, imu rows) where every
        row is a list of components (see `aux_outputs` for semantics)."""
        c = self.c
        xs = self._joint_x(qc)
        world = self._world_placements(xs)
        vel, acc = self._fk_accel_components(xs, vc, ac)
        if self.contact_frames and self.contact_opts is not None:
            _, f_world_all, aux_all = self._contact_fext(
                xs, world, vel, want_aux=True
            )
            w_local_all = [w for _, w in aux_all]
            depth_all = [d for d, _ in aux_all]
        else:
            f_world_all, w_local_all, depth_all = [], [], []

        imu_rows = []
        g = self.gravity
        for fidx in imu_frames:
            parent = c.frame_parents[fidx]
            frot = c.frot[fidx].tolist()
            fp = c.fpos[fidx].tolist()
            w_l, v_l = vel[parent]
            a_a, a_l = acc[parent]
            # Frame-LOCAL spatial velocity / gravity-free acceleration
            w_f = m_tv(frot, w_l)
            v_f = m_tv(frot, v_sub(v_l, v_cross(fp, w_l)))
            al_f = m_tv(frot, v_sub(a_l, v_cross(fp, a_a)))
            acc_cl = v_add(al_f, v_cross(w_f, v_f))
            rw, _pw = world[parent]
            rot_f = m_mm(rw, frot)
            g_f = m_tv(rot_f, [g[0], g[1], g[2]])
            accel = v_sub(acc_cl, g_f)
            imu_rows.append([*w_f, *accel])
        return f_world_all, w_local_all, depth_all, imu_rows

    def aux_outputs(self, q, v, a, imu_frames: tuple = ()):
        """Post-integration outputs computed component-wise in one trace:
        spring-damper contact forces (world force, LOCAL contact-frame wrench,
        signed depth) and raw IMU measurements (gyro, accel) for the given
        frames.  Bit-identical at f64 to the generic pipeline the engine
        otherwise runs per sensor period (`engine.contact.compute_contact_forces`
        + `ops.kinematics` frame getters + `ImuSensorGroup.compute_raw` —
        reference `engine.cc:3117-3238`, `basic_sensors.cc:142-188`); validated
        in tests/test_cdyn.py.

        Returns a dict: contact_f_world (..., nc, 3), contact_w_local
        (..., nc, 6), contact_depth (..., nc), imu_raw (..., n_imu, 6).
        """
        model = self.model
        qc = [q[..., i] for i in range(model.nq)]
        vc = [v[..., i] for i in range(model.nv)]
        ac = [a[..., i] for i in range(model.nv)]
        batch = jnp.broadcast_shapes(q.shape[:-1], v.shape[:-1])
        dtype = q.dtype
        fw, wl, depth, imu = self._aux_components(qc, vc, ac, imu_frames)

        def stack_v(rows, width):
            if not rows:
                return jnp.zeros(batch + (0, width), dtype)
            flat = []
            for r in rows:
                comps = jnp.broadcast_arrays(
                    *[jnp.asarray(x, dtype) + jnp.zeros(batch, dtype) for x in r]
                )
                flat.append(jnp.stack(comps, axis=-1))
            return jnp.stack(flat, axis=-2)

        out = {
            "contact_f_world": stack_v(fw, 3),
            "contact_w_local": stack_v(wl, 6),
            "imu_raw": stack_v(imu, 6),
        }
        if depth:
            depths = jnp.broadcast_arrays(
                *[d + jnp.zeros(batch, dtype) for d in depth]
            )
            out["contact_depth"] = jnp.stack(depths, axis=-1)
        else:
            out["contact_depth"] = jnp.zeros(batch + (0,), dtype)
        return out

    # ---------------- component Lie-group integration ----------------
    @staticmethod
    def _exp3_quat_c(w):
        """so(3) -> quaternion components [x, y, z, w] — mirror of `lie.exp3`
        (same Taylor thresholds, bit-identical at matched precision)."""
        theta2 = w[0] * w[0] + w[1] * w[1] + w[2] * w[2]
        dtype = getattr(theta2, "dtype", jnp.float64)
        eps = float(jnp.finfo(dtype).eps)
        theta = jnp.sqrt(jnp.maximum(theta2, eps * eps))
        small = theta2 < 1e-6  # lie._SMALL_ANGLE ** 2
        s_over = jnp.where(small, 0.5 - theta2 / 48.0, jnp.sin(0.5 * theta) / theta)
        c = jnp.where(
            small,
            1.0 - theta2 / 8.0 + theta2 * theta2 / 384.0,
            jnp.cos(0.5 * theta),
        )
        return [w[0] * s_over, w[1] * s_over, w[2] * s_over, c]

    @staticmethod
    def _vmat_mv_c(w, vl):
        """V(omega) @ v of the SE(3) exponential — mirror of `joints._exp6`."""
        theta2 = w[0] * w[0] + w[1] * w[1] + w[2] * w[2]
        dtype = getattr(theta2, "dtype", jnp.float64)
        eps = float(jnp.finfo(dtype).eps)
        theta = jnp.sqrt(jnp.maximum(theta2, eps * eps))
        small = theta2 < 1e-6
        b = jnp.where(
            small, 0.5 - theta2 / 24.0,
            (1.0 - jnp.cos(theta)) / jnp.maximum(theta2, 1e-30),
        )
        c = jnp.where(
            small, 1.0 / 6.0 - theta2 / 120.0,
            (theta - jnp.sin(theta)) / jnp.maximum(theta2 * theta, 1e-30),
        )
        wxv = v_cross(w, vl)
        wxwxv = v_cross(w, wxv)
        return [vl[k] + b * wxv[k] + c * wxwxv[k] for k in range(3)]

    @staticmethod
    def _quat_mul_c(q1, q2):
        x1, y1, z1, w1 = q1
        x2, y2, z2, w2 = q2
        return [
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
        ]

    @staticmethod
    def _quat_normalize_c(q):
        n = jnp.sqrt(q[0] * q[0] + q[1] * q[1] + q[2] * q[2] + q[3] * q[3])
        return [q[0] / n, q[1] / n, q[2] / n, q[3] / n]

    def integrate_components(self, qc, dvc):
        """Configuration retraction q (+) dv, component-wise (mirror of
        `ops.integrate.integrate` / `joints.integrate_joint`)."""
        c = self.c
        out = list(qc)
        for i in range(c.nj):
            qi, vi = c.idx_q[i], c.idx_v[i]
            t = c.types[i]
            if t == jt.JointType.FREE:
                p = [qc[qi], qc[qi + 1], qc[qi + 2]]
                quat = [qc[qi + 3], qc[qi + 4], qc[qi + 5], qc[qi + 6]]
                vlin = [dvc[vi], dvc[vi + 1], dvc[vi + 2]]
                om = [dvc[vi + 3], dvc[vi + 4], dvc[vi + 5]]
                p_d = self._vmat_mv_c(om, vlin)
                rot = quat_to_m(quat[0], quat[1], quat[2], quat[3])
                p_new = v_add(p, m_mv(rot, p_d))
                q_new = self._quat_normalize_c(
                    self._quat_mul_c(quat, self._exp3_quat_c(om))
                )
                out[qi : qi + 3] = p_new
                out[qi + 3 : qi + 7] = q_new
            elif t == jt.JointType.SPHERICAL:
                quat = [qc[qi], qc[qi + 1], qc[qi + 2], qc[qi + 3]]
                om = [dvc[vi], dvc[vi + 1], dvc[vi + 2]]
                out[qi : qi + 4] = self._quat_normalize_c(
                    self._quat_mul_c(quat, self._exp3_quat_c(om))
                )
            else:
                out[qi] = qc[qi] + dvc[vi]
        return out

    # ---------------- fused multi-substep integration ----------------
    def _build_final_outputs(self, tau_c_fn, imu_frames):
        """End-of-period solved accel + aux as one flat component list:
        `[a (nv) | f_world (nc*3) | w_local (nc*6) | depth (nc) | imu (ni*6)]`."""

        def final_outputs(qc, vc, cc):
            ac = self._accel_core(qc, vc, tau_c_fn(qc, vc, cc))[0]
            fw, wl, depth, imu = self._aux_components(qc, vc, ac, imu_frames)
            extras = list(ac)
            for r in fw:
                extras.extend(r)
            for r in wl:
                extras.extend(r)
            extras.extend(depth)
            for r in imu:
                extras.extend(r)
            return extras

        return final_outputs

    def _build_substep(self, tau_c_fn, dt: float, integrator: str):
        """One fixed-dt integration substep, component lists in/out."""
        nv = self.model.nv

        def substep(qc, vc, cc):
            k1a = self._accel_core(qc, vc, tau_c_fn(qc, vc, cc))[0]
            if integrator == "euler":
                q_n = self.integrate_components(qc, [dt * x for x in vc])
                v_n = [vc[k] + dt * k1a[k] for k in range(nv)]
                return q_n, v_n
            q2 = self.integrate_components(qc, [0.5 * dt * x for x in vc])
            v2 = [vc[k] + 0.5 * dt * k1a[k] for k in range(nv)]
            k2a = self._accel_core(q2, v2, tau_c_fn(q2, v2, cc))[0]
            q3 = self.integrate_components(qc, [0.5 * dt * x for x in v2])
            v3 = [vc[k] + 0.5 * dt * k2a[k] for k in range(nv)]
            k3a = self._accel_core(q3, v3, tau_c_fn(q3, v3, cc))[0]
            q4 = self.integrate_components(qc, [dt * x for x in v3])
            v4 = [vc[k] + dt * k3a[k] for k in range(nv)]
            k4a = self._accel_core(q4, v4, tau_c_fn(q4, v4, cc))[0]
            dq = [
                (dt / 6.0) * (vc[k] + 2.0 * v2[k] + 2.0 * v3[k] + v4[k])
                for k in range(nv)
            ]
            dv = [
                (dt / 6.0) * (k1a[k] + 2.0 * k2a[k] + 2.0 * k3a[k] + k4a[k])
                for k in range(nv)
            ]
            q_n = self.integrate_components(qc, dq)
            v_n = [vc[k] + dv[k] for k in range(nv)]
            return q_n, v_n

        return substep

    def make_period_integrator(
        self,
        tau_c_fn,
        dt: float,
        n_substeps: int,
        integrator: str = "rk4",
        pallas_tile: int = 0,
        imu_frames: Optional[tuple] = None,
    ):
        """Build the fused whole-period integrator:

        - `imu_frames is None`: `(q, v, command) -> (q', v')`
        - otherwise: `(q, v, command) -> (q', v', extras)` where `extras`
          additionally carries the END-OF-PERIOD dynamics outputs computed in
          the SAME kernel: solved acceleration, contact forces (world + LOCAL
          wrench + depth) and raw IMU measurements, laid out as
          `[a (nv) | f_world (nc*3) | w_local (nc*6) | depth (nc) | imu (ni*6)]`.

        The whole sensor period is ONE trace (and one Pallas kernel per env
        tile): no per-stage array restacking, no per-eval kernel dispatch.
        `tau_c_fn(qc, vc, cmd_c) -> tc` yields joint torques component-wise
        (the engine builds it from the motor transmission constants).  Values
        match `steppers.rk4_step`/`euler_step` + `Engine._accel_fn` +
        `aux_outputs` bit-for-bit at f64 (tests/test_cdyn.py)."""
        model = self.model
        nq, nv = model.nq, model.nv
        nc = len(self.contact_frames)
        with_outputs = imu_frames is not None
        ni = len(imu_frames) if with_outputs else 0
        n_extra = nv + nc * 10 + ni * 6 if with_outputs else 0
        final_outputs = (
            self._build_final_outputs(tau_c_fn, imu_frames) if with_outputs
            else None
        )
        substep = self._build_substep(tau_c_fn, dt, integrator)

        def run_xla(q, v, cmd):
            # Substeps via `lax.scan` so trace/compile cost is one substep
            # regardless of the substep count (CPU XLA chokes on the unrolled
            # graph; TPU compile time also scales with it).
            cc = [cmd[..., i] for i in range(cmd.shape[-1])]
            batch = jnp.broadcast_shapes(q.shape[:-1], v.shape[:-1])

            def stack(comps):
                return jnp.stack(
                    [jnp.broadcast_to(x, batch) for x in comps], axis=-1
                )

            def body(carry, _):
                qa, va = carry
                qc = [qa[..., i] for i in range(nq)]
                vc = [va[..., i] for i in range(nv)]
                qo, vo = substep(qc, vc, cc)
                return (stack(qo), stack(vo)), None

            if n_substeps == 1:
                (q_new, v_new), _ = body((q, v), None)
            else:
                (q_new, v_new), _ = jax.lax.scan(
                    body, (q, v), None, length=n_substeps
                )
            if not with_outputs:
                return q_new, v_new
            extras = final_outputs(
                [q_new[..., i] for i in range(nq)],
                [v_new[..., i] for i in range(nv)],
                cc,
            )
            return q_new, v_new, stack(extras)

        if not pallas_tile:
            return run_xla
        pallas_runs = {}

        def run(q, v, cmd):
            if q.ndim == 2 and self._pallas_ground_ok():
                b = q.shape[0]
                for tile in (pallas_tile, 4096, 2048, 1024, 512, 256):
                    if tile and b % tile == 0 and tile % 128 == 0:
                        if tile not in pallas_runs:
                            pallas_runs[tile] = _pallas_period_fn(
                                self,
                                substep,
                                n_substeps,
                                tile=tile,
                                final_outputs=(
                                    final_outputs if with_outputs else None
                                ),
                                n_extra=n_extra,
                            )
                        return pallas_runs[tile](q, v, cmd)
            return run_xla(q, v, cmd)

        return run

    def make_rollout_integrator(
        self,
        tau_c_fn,
        dt: float,
        n_substeps: int,
        n_ticks: int,
        controller_fn,
        n_carry: int,
        n_action: int,
        n_cmd: int,
        integrator: str = "rk4",
        pallas_tile: int = 0,
        imu_frames: tuple = (),
    ):
        """Fused WHOLE-ENV-STEP integrator: `n_ticks` controller periods, each
        `n_substeps` fixed substeps, with the controller itself re-evaluated
        in-kernel at every period boundary — the TPU-first form of the
        reference's FunctionalController bridge (`controller_functor.h:27`:
        the control pipeline runs inside the physics loop at its own update
        period).  One kernel launch per env tile covers the full env step —
        no per-period kernel dispatch, no HBM round trips of the state
        between controller updates.

        `controller_fn(qc, vc, bc, ac) -> (cc, bc')` is component-wise: `bc`
        is the controller carry (`n_carry` channels, e.g. the PD command
        state), `ac` the env-level action (`n_action` channels, constant
        across the env step), `cc` the motor command (`n_cmd` channels).

        Returned callable: `(q, v, action, carry) -> (q', v', extras)` with
        `extras = [a | f_world | w_local | depth | imu | cc_final (n_cmd) |
        carry' (n_carry)]` — the standard period-integrator extras layout
        plus the last tick's command and the updated controller carry."""
        nc = len(self.contact_frames)
        ni = len(imu_frames)
        n_extra_std = self.model.nv + nc * 10 + ni * 6
        return make_generic_rollout(
            self,
            self._build_substep(tau_c_fn, dt, integrator),
            self._build_final_outputs(tau_c_fn, imu_frames),
            n_extra_std,
            n_substeps,
            n_ticks,
            controller_fn,
            n_carry,
            n_action,
            n_cmd,
            pallas_tile=pallas_tile,
            pallas_ok=self._pallas_ground_ok,
        )

    def _accel_core(self, qc, vc, tc):
        """Component-level dynamics core: lists in, lists out (used directly
        by the Pallas megakernel where each component is one VPU tile)."""
        c = self.c
        # Passive viscous joint damping (constants baked in; skipped when zero)
        if np.any(c.damping != 0.0):
            tc = [
                tc[i] - float(c.damping[i]) * vc[i] if c.damping[i] != 0.0 else tc[i]
                for i in range(len(tc))
            ]
        xs = self._joint_x(qc)

        # Pass 1: velocities + bias, and body-frame articulated inertia init
        vel = [None] * c.nj  # (ang V3, lin V3) in LOCAL joint frame
        bias = [None] * c.nj
        ia = [None] * c.nj  # 6x6 symmetric python lists
        pa = [None] * c.nj  # (V3, V3) bias force
        svec = [None] * c.nj  # 1-dof motion subspace as (ang, lin) python consts
        for i in range(c.nj):
            rot_i, pos_i = xs[i]
            p = c.parents[i]
            if p < 0:
                w_p, v_p = v3(), v3()
            else:
                w_p, v_p = vel[p]
            # X^-1 act: w = R^T w_p ; v = R^T (v_p - pos x w_p)
            w_in = m_tv(rot_i, w_p)
            v_in = m_tv(rot_i, v_sub(v_p, v_cross(pos_i, w_p)))
            if c.types[i] == jt.JointType.FREE:
                vi = c.idx_v[i]
                vj_lin = [vc[vi], vc[vi + 1], vc[vi + 2]]
                vj_ang = [vc[vi + 3], vc[vi + 4], vc[vi + 5]]
            elif c.types[i] == jt.JointType.SPHERICAL:
                vi = c.idx_v[i]
                vj_ang = [vc[vi], vc[vi + 1], vc[vi + 2]]
                vj_lin = v3()
            else:
                ax = c.axis[i].tolist()
                qd = vc[c.idx_v[i]]
                if c.types[i] == jt.JointType.REVOLUTE:
                    vj_ang, vj_lin = v_scale(ax, qd), v3()
                    svec[i] = (ax, (0.0, 0.0, 0.0))
                else:
                    vj_ang, vj_lin = v3(), v_scale(ax, qd)
                    svec[i] = ((0.0, 0.0, 0.0), ax)
            w_i = v_add(w_in, vj_ang)
            v_i = v_add(v_in, vj_lin)
            vel[i] = (w_i, v_i)
            # bias c_i = v_i x vj  (motion cross)
            b_ang = v_cross(w_i, vj_ang)
            b_lin = v_add(v_cross(w_i, vj_lin), v_cross(v_i, vj_ang))
            bias[i] = (b_ang, b_lin)
            ia[i] = sym6_from_body(
                float(c.mass[i]), c.com[i].tolist(), c.inertia[i].tolist()
            )
            # pa = v x* (I v)
            iv_a, iv_l = sym6_mv(ia[i], w_i, v_i)
            pa_ang = v_add(v_cross(w_i, iv_a), v_cross(v_i, iv_l))
            pa_lin = v_cross(w_i, iv_l)
            pa[i] = (pa_ang, pa_lin)

        # Contacts subtract from pa (fext in LOCAL joint coords)
        world = None
        f_world_all = []
        if self.contact_frames and self.contact_opts is not None:
            world = self._world_placements(xs)
            fext, f_world_all, _ = self._contact_fext(xs, world, vel)
            for i in range(c.nj):
                if fext[i] is not None:
                    pa_a, pa_l = pa[i]
                    pa[i] = (v_sub(pa_a, fext[i][0]), v_sub(pa_l, fext[i][1]))

        # Stable penalty joint bounds (optional)
        tau_extra = {}
        for vi, entry in self.bound_gains.items():
            if len(entry) == 5:
                lo, hi, kp, kd, qi = entry
            else:
                lo, hi, kp, kd = entry
                qi = None
                for j in range(c.nj):
                    if c.idx_v[j] == vi and c.types[j] in (
                        jt.JointType.REVOLUTE,
                        jt.JointType.PRISMATIC,
                    ):
                        qi = c.idx_q[j]
            if qi is None:
                continue
            qj = qc[qi]
            vj = vc[vi]
            over = jnp.maximum(qj - hi, 0.0)
            under = jnp.maximum(lo - qj, 0.0)
            active = (over > 0.0) | (under > 0.0)
            tau_extra[vi] = kp * (under - over) - jnp.where(active, kd * vj, 0.0)

        # Pass 2: articulated inertia, inward
        u_of = [None] * c.nj  # U = IA S (6-vector as (ang, lin))
        d_inv = [None] * c.nj
        u_rhs = [None] * c.nj
        ia_root = None
        for i in reversed(range(c.nj)):
            rot_i, pos_i = xs[i]
            p = c.parents[i]
            if c.types[i] == jt.JointType.FREE:
                ia_root = ia[i]
                continue
            vi = c.idx_v[i]
            pa_a, pa_l = pa[i]
            pa6 = [*pa_a, *pa_l]
            if c.types[i] == jt.JointType.SPHERICAL:
                # 3-dof angular subspace: U = IA[:, 0:3], D = IA[0:3,0:3]+arm
                u63 = [[ia[i][r][col] for col in range(3)] for r in range(6)]
                dmat = [[ia[i][r][col] for col in range(3)] for r in range(3)]
                for k in range(3):
                    dmat[k][k] = dmat[k][k] + float(c.armature[vi + k])
                u_r3 = [
                    tc[vi + k] + tau_extra.get(vi + k, 0.0) - pa_a[k]
                    for k in range(3)
                ]
                u_of[i], d_inv[i], u_rhs[i] = u63, dmat, u_r3
                if p >= 0:
                    # Ia = IA - U D^-1 U^T (X[:,c] = D^-1 U[c,:] per column)
                    xcols = [solve_sym3(dmat, list(u63[c6])) for c6 in range(6)]
                    ia_a = [
                        [
                            ia[i][r][c6]
                            - sum(u63[r][k] * xcols[c6][k] for k in range(3))
                            for c6 in range(6)
                        ]
                        for r in range(6)
                    ]
                    b_a, b_l = bias[i]
                    iab_a, iab_l = sym6_mv(ia_a, b_a, b_l)
                    coef3 = solve_sym3(dmat, u_r3)
                    pa_n = [
                        pa6[k6]
                        + [*iab_a, *iab_l][k6]
                        + sum(u63[k6][k] * coef3[k] for k in range(3))
                        for k6 in range(6)
                    ]
                    ia_p = _transform_sym6(ia_a, rot_i, pos_i)
                    for r in range(6):
                        for col in range(6):
                            ia[p][r][col] = ia[p][r][col] + ia_p[r][col]
                    n_b, f_b = pa_n[:3], pa_n[3:]
                    f_a = m_mv(rot_i, f_b)
                    n_a = v_add(m_mv(rot_i, n_b), v_cross(pos_i, f_a))
                    pp_a, pp_l = pa[p]
                    pa[p] = (v_add(pp_a, n_a), v_add(pp_l, f_a))
                continue
            ax_a, ax_l = svec[i]
            s6 = [*ax_a, *ax_l]
            ua, ul = sym6_mv(ia[i], list(ax_a), list(ax_l))
            u6 = [*ua, *ul]
            d = sum(s6[k] * u6[k] for k in range(6)) + float(c.armature[vi])
            dinv = 1.0 / d
            u_r = tc[vi] + tau_extra.get(vi, 0.0) - sum(
                s6[k] * pa6[k] for k in range(6)
            )
            u_of[i], d_inv[i], u_rhs[i] = u6, dinv, u_r
            if p >= 0:
                # Ia = IA - U U^T / d ;  pa' = pa + Ia*bias + U*(u/d)
                ia_a = [
                    [ia[i][r][col] - u6[r] * u6[col] * dinv for col in range(6)]
                    for r in range(6)
                ]
                b_a, b_l = bias[i]
                iab_a, iab_l = sym6_mv(ia_a, b_a, b_l)
                coef = u_r * dinv
                pa_n = [
                    pa6[k] + [*iab_a, *iab_l][k] + u6[k] * coef for k in range(6)
                ]
                # Transform to parent: IA_p += X_f Ia X_m^-1, pa_p += force_act(X, pa_n)
                ia_p = _transform_sym6(ia_a, rot_i, pos_i)
                for r in range(6):
                    for col in range(6):
                        ia[p][r][col] = ia[p][r][col] + ia_p[r][col]
                n_b, f_b = pa_n[:3], pa_n[3:]
                f_a = m_mv(rot_i, f_b)
                n_a = v_add(m_mv(rot_i, n_b), v_cross(pos_i, f_a))
                pp_a, pp_l = pa[p]
                pa[p] = (v_add(pp_a, n_a), v_add(pp_l, f_a))

        # Pass 3: outward accelerations
        g = self.gravity
        a0 = ([0.0, 0.0, 0.0], [-g[0], -g[1], -g[2]])  # -gravity trick
        acc = [None] * c.nj
        qdd_parts = {}
        for i in range(c.nj):
            rot_i, pos_i = xs[i]
            p = c.parents[i]
            a_p = acc[p] if p >= 0 else a0
            aw_in = m_tv(rot_i, a_p[0])
            al_in = m_tv(rot_i, v_sub(a_p[1], v_cross(pos_i, a_p[0])))
            b_a, b_l = bias[i]
            am_a = v_add(aw_in, b_a)
            am_l = v_add(al_in, b_l)
            if c.types[i] == jt.JointType.FREE:
                vi = c.idx_v[i]
                # D = S^T IA S with S=(lin,ang)->(ang,lin) permutation:
                # D[[0:3],[0:3]] = C, D[0:3,3:6] = B^T, D[3:6,3:6] = A
                m6 = [[None] * 6 for _ in range(6)]
                for r in range(6):
                    for col in range(6):
                        rr = (r + 3) % 6
                        cc = (col + 3) % 6
                        val = ia_root[rr][cc]
                        m6[r][col] = val
                arm = [float(c.armature[vi + k]) for k in range(6)]
                for k in range(6):
                    m6[k][k] = m6[k][k] + arm[k]
                pa_a, pa_l = pa[i]
                # u = tau - S^T pa ; S^T pa = (pa_lin, pa_ang)
                rhs = [
                    tc[vi + 0] - pa_l[0],
                    tc[vi + 1] - pa_l[1],
                    tc[vi + 2] - pa_l[2],
                    tc[vi + 3] - pa_a[0],
                    tc[vi + 4] - pa_a[1],
                    tc[vi + 5] - pa_a[2],
                ]
                # subtract U^T a_mid = (IA a_mid) permuted
                iam_a, iam_l = sym6_mv(ia_root, am_a, am_l)
                rhs = [
                    rhs[0] - iam_l[0],
                    rhs[1] - iam_l[1],
                    rhs[2] - iam_l[2],
                    rhs[3] - iam_a[0],
                    rhs[4] - iam_a[1],
                    rhs[5] - iam_a[2],
                ]
                qdd6 = solve_sym6(m6, rhs)
                for k in range(6):
                    qdd_parts[vi + k] = qdd6[k]
                aj_ang = qdd6[3:6]
                aj_lin = qdd6[0:3]
                acc[i] = (v_add(am_a, aj_ang), v_add(am_l, aj_lin))
            elif c.types[i] == jt.JointType.SPHERICAL:
                vi = c.idx_v[i]
                u63 = u_of[i]
                am6 = [*am_a, *am_l]
                rhs3 = [
                    u_rhs[i][k] - sum(u63[k6][k] * am6[k6] for k6 in range(6))
                    for k in range(3)
                ]
                qdd3 = solve_sym3(d_inv[i], rhs3)
                for k in range(3):
                    qdd_parts[vi + k] = qdd3[k]
                acc[i] = (v_add(am_a, qdd3), list(am_l))
            else:
                vi = c.idx_v[i]
                u6 = u_of[i]
                am6 = [*am_a, *am_l]
                qdd = d_inv[i] * (u_rhs[i] - sum(u6[k] * am6[k] for k in range(6)))
                qdd_parts[vi] = qdd
                ax_a, ax_l = svec[i]
                acc[i] = (
                    v_add(am_a, v_scale(list(ax_a), qdd)),
                    v_add(am_l, v_scale(list(ax_l), qdd)),
                )

        nv = self.model.nv
        return [qdd_parts[k] for k in range(nv)], f_world_all


def _transform_sym6(ia6, rot, pos):
    """I_parent = X_F I X_M^{-1} for placement (rot, pos) of child in parent,
    (ang, lin) block layout — component-wise version of `lie.inertia_transform`.

    With blocks I = [[A, B], [B^T, C]]:
      A' = R (A + p^x_h...)  — implemented as the explicit congruence:
      M = [[R, 0], [S R, R]] with S = skew(p):     (motion child->parent)
      I' = M_F I M_M^{-1},  M_F = [[R, S R], [0, R]], M_M^{-1} = [[R^T,0],[-R^T S, R^T]]
    Expanded:
      A' = R A R^T + S R B^T R^T + (R B + S R C) (R^T S)^T ... done blockwise below.
    """
    a = [[ia6[i][j] for j in range(3)] for i in range(3)]
    b = [[ia6[i][3 + j] for j in range(3)] for i in range(3)]
    bt = [[ia6[3 + i][j] for j in range(3)] for i in range(3)]
    cc = [[ia6[3 + i][3 + j] for j in range(3)] for i in range(3)]
    s = [[0.0, -pos[2], pos[1]], [pos[2], 0.0, -pos[0]], [-pos[1], pos[0], 0.0]]

    def mt(m):
        return [[m[j][i] for j in range(3)] for i in range(3)]

    r = rot
    rt = mt(r)
    # X_F I = [[R A + S R B^T, R B + S R C], [R B^T, R C]]
    ra = m_mm(r, a)
    rbt = m_mm(r, bt)
    rb = m_mm(r, b)
    rc = m_mm(r, cc)
    sr_bt = m_mm(s, rbt)
    sr_c = m_mm(s, rc)
    top_l = m_add(ra, sr_bt)
    top_r = m_add(rb, sr_c)
    bot_l = rbt
    bot_r = rc
    # (X_F I) X_M^{-1} with X_M^{-1} = [[R^T, 0], [-R^T S, R^T]]
    # out_tl = top_l R^T + top_r (-R^T S) ... careful: -R^T S applied as right mult
    neg_rts = [[-x for x in row] for row in m_mm(rt, s)]
    out_tl = m_add(m_mm(top_l, rt), m_mm(top_r, neg_rts))
    out_tr = m_mm(top_r, rt)
    out_bl = m_add(m_mm(bot_l, rt), m_mm(bot_r, neg_rts))
    out_br = m_mm(bot_r, rt)
    out = [[None] * 6 for _ in range(6)]
    for i in range(3):
        for j in range(3):
            out[i][j] = out_tl[i][j]
            out[i][3 + j] = out_tr[i][j]
            out[3 + i][j] = out_bl[i][j]
            out[3 + i][3 + j] = out_br[i][j]
    return out


# --------------------------------------------------------------------------- #
# Pallas megakernel: the full dynamics eval as ONE TPU kernel
# --------------------------------------------------------------------------- #
#
# The XLA-compiled component core runs as ~144 separate fusion kernels whose
# dispatch overhead dominates (measured ~14 µs/kernel on v5e); the true IO of
# one eval is only (nq+2*nv) * B floats.  This kernel evaluates the whole tree
# sweep for a tile of envs entirely in VMEM/registers: every component is one
# (8, 128) f32 tile (1024 envs), every operation a single VPU instruction.


def _pallas_accel_fn(cd: "ComponentDynamics", tile: int = 1024):
    import jax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    model = cd.model
    nq, nv = model.nq, model.nv
    sub = tile // 128  # sublane count (8 for tile=1024)

    def kernel(q_ref, v_ref, t_ref, out_ref):
        qc = [q_ref[0, i] for i in range(nq)]
        vc = [v_ref[0, i] for i in range(nv)]
        tc = [t_ref[0, i] for i in range(nv)]
        qdd, _ = cd._accel_core(qc, vc, tc)
        for i in range(nv):
            out_ref[0, i] = jnp.broadcast_to(qdd[i], (sub, 128)).astype(out_ref.dtype)

    def run(q, v, tau):
        # (B, n) -> (G, n, sub, 128) tiles with envs on lanes
        b = q.shape[0]
        g = b // tile

        def to_tiles(x, n):
            return (
                x.reshape(g, sub, 128, n).transpose(0, 3, 1, 2)
            )

        out = pl.pallas_call(
            kernel,
            grid=(g,),
            in_specs=[
                pl.BlockSpec((1, nq, sub, 128), lambda i: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, nv, sub, 128), lambda i: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, nv, sub, 128), lambda i: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, nv, sub, 128), lambda i: (i, 0, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((g, nv, sub, 128), q.dtype),
        )(to_tiles(q, nq), to_tiles(v, nv), to_tiles(tau, nv))
        return out.transpose(0, 2, 3, 1).reshape(b, nv)

    return run


def _pallas_period_fn(cd: "ComponentDynamics", substep, n_substeps: int,
                      tile: int = 1024, final_outputs=None, n_extra: int = 0,
                      thread_cc: bool = False):
    """The WHOLE sensor-period integration (n_substeps x RK4, each stage a full
    contact-dynamics eval) as ONE Pallas kernel per env tile — optionally
    including the end-of-period dynamics outputs (`final_outputs`).

    vs `_pallas_accel_fn` (one kernel per dynamics eval): a 1 ms-substep, 5 ms
    period RK4 pipeline needs 20 evals — 20 kernel dispatches and 40 HBM
    round-trips of the state per period.  Here the state lives in VMEM across
    all stages; HBM traffic is exactly one read and one write of (q, v, cmd).
    """
    import jax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    model = cd.model
    nq, nv = model.nq, model.nv
    sub = tile // 128
    with_outputs = final_outputs is not None

    def kernel(q_ref, v_ref, c_ref, qo_ref, vo_ref, *extra_refs):
        nm = c_ref.shape[1]
        cc0 = tuple(c_ref[0, i] for i in range(nm))
        dtype = qo_ref.dtype

        def tile_of(x):
            return jnp.broadcast_to(x, (sub, 128)).astype(dtype)

        def body(_, carry):
            if thread_cc:
                # Stage-chained warm start: the substep updates the command
                # row's solver channels (multipliers/active sets) in-place.
                qs, vs, ccs = carry
                qo, vo, cco = substep(list(qs), list(vs), list(ccs))
                return (
                    tuple(tile_of(x) for x in qo),
                    tuple(tile_of(x) for x in vo),
                    tuple(tile_of(x) for x in cco),
                )
            qs, vs = carry
            qo, vo = substep(list(qs), list(vs), list(cc0))
            return (
                tuple(tile_of(x) for x in qo),
                tuple(tile_of(x) for x in vo),
            )

        qs0 = tuple(q_ref[0, i] for i in range(nq))
        vs0 = tuple(v_ref[0, i] for i in range(nv))
        init = (qs0, vs0, cc0) if thread_cc else (qs0, vs0)
        if n_substeps == 1:
            fin = body(0, init)
        else:
            fin = jax.lax.fori_loop(0, n_substeps, body, init)
        if thread_cc:
            qs, vs, cc = fin
        else:
            (qs, vs), cc = fin, cc0
        for i in range(nq):
            qo_ref[0, i] = tile_of(qs[i])
        for i in range(nv):
            vo_ref[0, i] = tile_of(vs[i])
        if with_outputs:
            extras = final_outputs(list(qs), list(vs), list(cc))
            assert len(extras) == n_extra, (
                f"extras layout mismatch: {len(extras)} != {n_extra}"
            )
            eo_ref = extra_refs[0]
            for i in range(n_extra):
                eo_ref[0, i] = tile_of(extras[i])

    def run(q, v, cmd):
        b = q.shape[0]
        g = b // tile
        nm = max(cmd.shape[-1], 1)
        if cmd.shape[-1] == 0:
            cmd = jnp.zeros(cmd.shape[:-1] + (1,), q.dtype)

        def to_tiles(x, n):
            return x.reshape(g, sub, 128, n).transpose(0, 3, 1, 2)

        spec = lambda n: pl.BlockSpec(
            (1, n, sub, 128), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
        )
        out_specs = [spec(nq), spec(nv)]
        out_shape = [
            jax.ShapeDtypeStruct((g, nq, sub, 128), q.dtype),
            jax.ShapeDtypeStruct((g, nv, sub, 128), q.dtype),
        ]
        if with_outputs:
            out_specs.append(spec(n_extra))
            out_shape.append(jax.ShapeDtypeStruct((g, n_extra, sub, 128), q.dtype))
        outs = pl.pallas_call(
            kernel,
            grid=(g,),
            in_specs=[spec(nq), spec(nv), spec(nm)],
            out_specs=out_specs,
            out_shape=out_shape,
        )(to_tiles(q, nq), to_tiles(v, nv), to_tiles(cmd, nm))

        def from_tiles(x, n):
            return x.transpose(0, 2, 3, 1).reshape(b, n)

        if with_outputs:
            q_new, v_new, extras = outs
            return (
                from_tiles(q_new, nq),
                from_tiles(v_new, nv),
                from_tiles(extras, n_extra),
            )
        q_new, v_new = outs
        return from_tiles(q_new, nq), from_tiles(v_new, nv)

    return run


def make_generic_rollout(cd, substep, final_outputs, n_extra_std: int,
                         n_substeps: int, n_ticks: int, controller_fn,
                         n_carry: int, n_action: int, n_cmd: int,
                         pallas_tile: int = 0, pallas_ok=None,
                         post_tick_fn=None, thread_cc: bool = False):
    """Shared scaffolding for fused multi-tick rollout integrators (spring and
    constrained paths): XLA scan fallback + Pallas kernel dispatch per tile.

    - `controller_fn(qc, vc, bc, ac) -> (cc, bc')` runs at each tick START
      (command assembly + controller carry update).
    - `post_tick_fn(qc, vc, cc, bc) -> bc'` (optional) runs at each tick END —
      the constrained path refreshes the PGS warm-start multipliers and the
      active-set hysteresis masks there, mirroring the per-tick carry
      recomputation of `Engine.step`.
    - `thread_cc=True`: substep returns `(q', v', cc')` and the command row is
      threaded through the substeps of each tick (stage-chained PGS warm
      start); post_tick/final_outputs then see the last stage's cc.
    - extras = `final_outputs(q_end, v_end, cc_last) + cc_last + bc_final`."""

    def run_xla(q, v, action, carry):
        nq_, nv_ = q.shape[-1], v.shape[-1]
        ac = [action[..., i] for i in range(n_action)]
        batch = jnp.broadcast_shapes(q.shape[:-1], v.shape[:-1])

        def stack(comps):
            if not comps:  # zero-width carry/command (e.g. ZOH pass-through)
                return jnp.zeros(batch + (0,), q.dtype)
            return jnp.stack(
                [jnp.broadcast_to(x, batch).astype(q.dtype) for x in comps],
                axis=-1,
            )

        def tick_body(c, _, skip_post=False):
            qa, va, ba, _cca = c
            cc, bc2 = controller_fn(
                [qa[..., i] for i in range(nq_)],
                [va[..., i] for i in range(nv_)],
                [ba[..., i] for i in range(n_carry)],
                ac,
            )

            def sub_body(c2, _):
                if thread_cc:
                    qa2, va2, cca2 = c2
                    qo, vo, cco = substep(
                        [qa2[..., i] for i in range(nq_)],
                        [va2[..., i] for i in range(nv_)],
                        [cca2[..., i] for i in range(n_cmd)],
                    )
                    return (stack(qo), stack(vo), stack(cco)), None
                qa2, va2 = c2
                qo, vo = substep(
                    [qa2[..., i] for i in range(nq_)],
                    [va2[..., i] for i in range(nv_)],
                    cc,
                )
                return (stack(qo), stack(vo)), None

            init = (qa, va, stack(cc)) if thread_cc else (qa, va)
            if n_substeps == 1:
                fin, _ = sub_body(init, None)
            else:
                fin, _ = jax.lax.scan(sub_body, init, None, length=n_substeps)
            if thread_cc:
                qa, va, cc_fin = fin
                cc = [cc_fin[..., i] for i in range(n_cmd)]
            else:
                qa, va = fin
            if post_tick_fn is not None and not skip_post:
                bc2 = post_tick_fn(
                    [qa[..., i] for i in range(nq_)],
                    [va[..., i] for i in range(nv_)],
                    cc,
                    bc2,
                )
            return (qa, va, stack(bc2), stack(cc)), None

        cc0 = jnp.zeros(batch + (n_cmd,), q.dtype)
        # The LAST tick skips the end-of-tick post solve: its refreshed
        # warm-start multipliers/masks are discarded (the caller reads them
        # from `final_outputs`, which solves the same end state anyway) —
        # one full constraint solve saved per env step.
        c_fin = (q, v, carry, cc0)
        if n_ticks > 1:
            c_fin, _ = jax.lax.scan(
                tick_body, c_fin, None, length=n_ticks - 1
            )
        (q_new, v_new, b_new, cc_fin), _ = tick_body(c_fin, None, skip_post=True)
        extras = final_outputs(
            [q_new[..., i] for i in range(nq_)],
            [v_new[..., i] for i in range(nv_)],
            [cc_fin[..., i] for i in range(n_cmd)],
        )
        extras_all = stack(extras)
        return (
            q_new,
            v_new,
            jnp.concatenate([extras_all, cc_fin, b_new], axis=-1),
        )

    if not pallas_tile:
        return run_xla
    pallas_runs = {}

    def run(q, v, action, carry):
        if q.ndim == 2 and (pallas_ok is None or pallas_ok()):
            b = q.shape[0]
            for tile in (pallas_tile, 4096, 2048, 1024, 512, 256):
                if tile and b % tile == 0 and tile % 128 == 0:
                    if tile not in pallas_runs:
                        pallas_runs[tile] = _pallas_rollout_fn(
                            cd,
                            substep,
                            n_substeps,
                            n_ticks,
                            controller_fn,
                            n_carry,
                            n_action,
                            n_cmd,
                            tile=tile,
                            final_outputs=final_outputs,
                            n_extra_std=n_extra_std,
                            post_tick_fn=post_tick_fn,
                            thread_cc=thread_cc,
                        )
                    return pallas_runs[tile](q, v, action, carry)
        return run_xla(q, v, action, carry)

    return run


def _pallas_rollout_fn(cd: "ComponentDynamics", substep, n_substeps: int,
                       n_ticks: int, controller_fn, n_carry: int,
                       n_action: int, n_cmd: int, tile: int = 1024,
                       final_outputs=None, n_extra_std: int = 0,
                       post_tick_fn=None, thread_cc: bool = False):
    """The WHOLE env step — `n_ticks` controller periods, the in-kernel
    controller update at each period boundary, and `n_substeps` integration
    substeps per period — as ONE Pallas kernel per env tile.

    vs `_pallas_period_fn` (one kernel per controller period): an 8-period
    env step needs 8 kernel dispatches with the controller glue (command
    state ZOH integration, encoder read-out, effort clipping) running as
    dozens of small XLA ops between launches.  Here the controller is traced
    INTO the kernel (it is component-wise elementwise math), so per env step
    HBM traffic is one read of (q, v, action, carry) and one write of
    (q', v', extras) — nothing in between."""
    import jax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    model = cd.model
    nq, nv = model.nq, model.nv
    sub = tile // 128
    n_extra = n_extra_std + n_cmd + n_carry

    def kernel(q_ref, v_ref, a_ref, b_ref, qo_ref, vo_ref, eo_ref):
        ac = [a_ref[0, i] for i in range(n_action)]
        dtype = qo_ref.dtype

        def tile_of(x):
            return jnp.broadcast_to(x, (sub, 128)).astype(dtype)

        def tick_body(_, carry, skip_post=False):
            qs, vs, bs, _cc = carry
            cc, bs2 = controller_fn(list(qs), list(vs), list(bs), ac)

            def body(_, c2):
                if thread_cc:
                    qs2, vs2, cc2 = c2
                    qo, vo, cco = substep(list(qs2), list(vs2), list(cc2))
                    return (
                        tuple(tile_of(x) for x in qo),
                        tuple(tile_of(x) for x in vo),
                        tuple(tile_of(x) for x in cco),
                    )
                qs2, vs2 = c2
                qo, vo = substep(list(qs2), list(vs2), cc)
                return (
                    tuple(tile_of(x) for x in qo),
                    tuple(tile_of(x) for x in vo),
                )

            init = (
                (qs, vs, tuple(tile_of(x) for x in cc))
                if thread_cc
                else (qs, vs)
            )
            if n_substeps == 1:
                fin = body(0, init)
            else:
                fin = jax.lax.fori_loop(0, n_substeps, body, init)
            if thread_cc:
                qs, vs, cc = fin
            else:
                qs, vs = fin
            if post_tick_fn is not None and not skip_post:
                bs2 = post_tick_fn(list(qs), list(vs), cc, bs2)
            return (
                qs,
                vs,
                tuple(tile_of(x) for x in bs2),
                tuple(tile_of(x) for x in cc),
            )

        qs0 = tuple(q_ref[0, i] for i in range(nq))
        vs0 = tuple(v_ref[0, i] for i in range(nv))
        bs0 = tuple(b_ref[0, i] for i in range(n_carry))
        cc0 = tuple(
            jnp.zeros((sub, 128), dtype) for _ in range(n_cmd)
        )
        # Last tick skips the end-of-tick post solve (its refreshed carry is
        # discarded — `final_outputs` below solves the same end state): one
        # full in-kernel constraint solve saved per env step.
        c_fin = (qs0, vs0, bs0, cc0)
        if n_ticks > 1:
            c_fin = jax.lax.fori_loop(0, n_ticks - 1, tick_body, c_fin)
        qs, vs, bs, cc = tick_body(0, c_fin, skip_post=True)
        for i in range(nq):
            qo_ref[0, i] = tile_of(qs[i])
        for i in range(nv):
            vo_ref[0, i] = tile_of(vs[i])
        extras = final_outputs(list(qs), list(vs), list(cc))
        extras = list(extras) + list(cc) + list(bs)
        assert len(extras) == n_extra, (
            f"extras layout mismatch: {len(extras)} != {n_extra}"
        )
        for i in range(n_extra):
            eo_ref[0, i] = tile_of(extras[i])

    def run(q, v, action, carry):
        b = q.shape[0]
        g = b // tile
        na = max(n_action, 1)
        nb = max(n_carry, 1)
        if action.shape[-1] == 0:
            action = jnp.zeros(action.shape[:-1] + (1,), q.dtype)
        if carry.shape[-1] == 0:
            carry = jnp.zeros(carry.shape[:-1] + (1,), q.dtype)

        def to_tiles(x, n):
            return x.reshape(g, sub, 128, n).transpose(0, 3, 1, 2)

        spec = lambda n: pl.BlockSpec(
            (1, n, sub, 128), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
        )
        q_new, v_new, extras = pl.pallas_call(
            kernel,
            grid=(g,),
            in_specs=[spec(nq), spec(nv), spec(na), spec(nb)],
            out_specs=[spec(nq), spec(nv), spec(n_extra)],
            out_shape=[
                jax.ShapeDtypeStruct((g, nq, sub, 128), q.dtype),
                jax.ShapeDtypeStruct((g, nv, sub, 128), q.dtype),
                jax.ShapeDtypeStruct((g, n_extra, sub, 128), q.dtype),
            ],
        )(
            to_tiles(q, nq),
            to_tiles(v, nv),
            to_tiles(action, na),
            to_tiles(carry, nb),
        )

        def from_tiles(x, n):
            return x.transpose(0, 2, 3, 1).reshape(b, n)

        return (
            from_tiles(q_new, nq),
            from_tiles(v_new, nv),
            from_tiles(extras, n_extra),
        )

    return run


# --------------------------------------------------------------------------- #
# Component-wise CRBA + RNEA(nle): the constrained-dynamics fast path
# --------------------------------------------------------------------------- #
#
# The PGS-constrained path needs M(q) and nle(q, v) (reference
# `SolveBoxedForwardDynamics`); computing them with the generic spatial-algebra
# ops leaves the TPU idle exactly like ABA did.  These methods return python
# lists of (B,) components that feed the unrolled LDL^T solve directly.


def _force_transform_col(rot, pos, n, f):
    """Force (ang n, lin f) from child joint frame to parent."""
    f_a = m_mv(rot, f)
    n_a = v_add(m_mv(rot, n), v_cross(pos, f_a))
    return n_a, f_a


class _CRBAMixin:
    def mass_matrix_components(self, qc, xs=None):
        """CRBA with armature: returns nv x nv python list of (B,) entries."""
        c = self.c
        nv = self.model.nv
        if xs is None:
            xs = self._joint_x(qc)
        ic = [
            sym6_from_body(float(c.mass[i]), c.com[i].tolist(), c.inertia[i].tolist())
            for i in range(c.nj)
        ]
        m_out = [[0.0] * nv for _ in range(nv)]

        def vel_perm(k):  # free-joint vel index -> motion index
            return (k + 3) % 6

        def _ancestor_fill(i, vi_row, n_c, f_c):
            """Transport one force column up the tree, filling M[vi_row, :]."""
            j = i
            while c.parents[j] >= 0:
                rot_j, pos_j = xs[j]
                n_c, f_c = _force_transform_col(rot_j, pos_j, n_c, f_c)
                j = c.parents[j]
                vj = c.idx_v[j]
                if c.types[j] == jt.JointType.FREE:
                    full = [*n_c, *f_c]
                    for k in range(6):
                        val = full[vel_perm(k)]
                        m_out[vi_row][vj + k] = val
                        m_out[vj + k][vi_row] = val
                elif c.types[j] == jt.JointType.SPHERICAL:
                    for k in range(3):
                        m_out[vi_row][vj + k] = n_c[k]
                        m_out[vj + k][vi_row] = n_c[k]
                else:
                    axj_a, axj_l = (
                        (c.axis[j].tolist(), (0.0, 0.0, 0.0))
                        if c.types[j] == jt.JointType.REVOLUTE
                        else ((0.0, 0.0, 0.0), c.axis[j].tolist())
                    )
                    val = sum(axj_a[k] * n_c[k] for k in range(3)) + sum(
                        axj_l[k] * f_c[k] for k in range(3)
                    )
                    m_out[vi_row][vj] = val
                    m_out[vj][vi_row] = val

        for i in reversed(range(c.nj)):
            vi = c.idx_v[i]
            if c.types[i] == jt.JointType.FREE:
                # F = IA (6x6); diagonal block = permuted IA + armature
                for r in range(6):
                    for col in range(6):
                        m_out[vi + r][vi + col] = ic[i][vel_perm(r)][vel_perm(col)]
                    m_out[vi + r][vi + r] = (
                        m_out[vi + r][vi + r] + float(c.armature[vi + r])
                    )
                # Free root has no ancestors by construction
                continue
            if c.types[i] == jt.JointType.SPHERICAL:
                # F = IA S = IA[:, 0:3]; diagonal block = IA[0:3,0:3] + arm
                for r in range(3):
                    for col in range(3):
                        m_out[vi + r][vi + col] = ic[i][r][col]
                    m_out[vi + r][vi + r] = (
                        m_out[vi + r][vi + r] + float(c.armature[vi + r])
                    )
                for col in range(3):
                    n_c = [ic[i][r][col] for r in range(3)]
                    f_c = [ic[i][3 + r][col] for r in range(3)]
                    _ancestor_fill(i, vi + col, n_c, f_c)
            else:
                ax_a, ax_l = (
                    (c.axis[i].tolist(), (0.0, 0.0, 0.0))
                    if c.types[i] == jt.JointType.REVOLUTE
                    else ((0.0, 0.0, 0.0), c.axis[i].tolist())
                )
                fa, fl = sym6_mv(ic[i], list(ax_a), list(ax_l))
                # Diagonal entry: S^T F + armature
                m_out[vi][vi] = (
                    sum(ax_a[k] * fa[k] for k in range(3))
                    + sum(ax_l[k] * fl[k] for k in range(3))
                    + float(c.armature[vi])
                )
                _ancestor_fill(i, vi, fa, fl)
            # Accumulate composite inertia into the parent
            p = c.parents[i]
            if p >= 0:
                rot_i, pos_i = xs[i]
                ia_p = _transform_sym6(ic[i], rot_i, pos_i)
                for r in range(6):
                    for col in range(6):
                        ic[p][r][col] = ic[p][r][col] + ia_p[r][col]
        return m_out

    def nle_components(self, qc, vc, fext=None, xs=None):
        """Nonlinear effects (gravity + Coriolis/centrifugal) as nv components
        (RNEA with zero acceleration, reference `nonlinear_effects`).

        `fext`: optional per-joint LOCAL wrenches [(ang V3, lin V3) or None]
        subtracted from the backward force pass (same convention as
        `_contact_fext`); `xs`: optional precomputed joint placements."""
        c = self.c
        g = self.gravity
        if xs is None:
            xs = self._joint_x(qc)
        vel = [None] * c.nj
        acc = [None] * c.nj
        f = [None] * c.nj
        svec = [None] * c.nj
        a0 = ([0.0, 0.0, 0.0], [-g[0], -g[1], -g[2]])
        for i in range(c.nj):
            rot_i, pos_i = xs[i]
            p = c.parents[i]
            w_p, v_p = vel[p] if p >= 0 else (v3(), v3())
            a_p = acc[p] if p >= 0 else a0
            w_in = m_tv(rot_i, w_p)
            v_in = m_tv(rot_i, v_sub(v_p, v_cross(pos_i, w_p)))
            aw_in = m_tv(rot_i, a_p[0])
            al_in = m_tv(rot_i, v_sub(a_p[1], v_cross(pos_i, a_p[0])))
            vi = c.idx_v[i]
            if c.types[i] == jt.JointType.FREE:
                vj_lin = [vc[vi], vc[vi + 1], vc[vi + 2]]
                vj_ang = [vc[vi + 3], vc[vi + 4], vc[vi + 5]]
            elif c.types[i] == jt.JointType.SPHERICAL:
                vj_ang = [vc[vi], vc[vi + 1], vc[vi + 2]]
                vj_lin = v3()
            elif c.types[i] == jt.JointType.REVOLUTE:
                ax = c.axis[i].tolist()
                vj_ang, vj_lin = v_scale(ax, vc[vi]), v3()
                svec[i] = (ax, (0.0, 0.0, 0.0))
            else:
                ax = c.axis[i].tolist()
                vj_ang, vj_lin = v3(), v_scale(ax, vc[vi])
                svec[i] = ((0.0, 0.0, 0.0), ax)
            w_i = v_add(w_in, vj_ang)
            v_i = v_add(v_in, vj_lin)
            vel[i] = (w_i, v_i)
            # a_i = Xinv(a_p) + v_i x vj  (zero joint acceleration)
            b_ang = v_cross(w_i, vj_ang)
            b_lin = v_add(v_cross(w_i, vj_lin), v_cross(v_i, vj_ang))
            acc[i] = (v_add(aw_in, b_ang), v_add(al_in, b_lin))

        nv = self.model.nv
        tau = [0.0] * nv
        for i in reversed(range(c.nj)):
            ia = sym6_from_body(
                float(c.mass[i]), c.com[i].tolist(), c.inertia[i].tolist()
            )
            a_a, a_l = acc[i]
            w_i, v_i = vel[i]
            ia_a, ia_l = sym6_mv(ia, a_a, a_l)
            iv_a, iv_l = sym6_mv(ia, w_i, v_i)
            f_a = v_add(ia_a, v_add(v_cross(w_i, iv_a), v_cross(v_i, iv_l)))
            f_l = v_add(ia_l, v_cross(w_i, iv_l))
            if fext is not None and fext[i] is not None:
                f_a = v_sub(f_a, fext[i][0])
                f_l = v_sub(f_l, fext[i][1])
            if f[i] is not None:
                f_a = v_add(f_a, f[i][0])
                f_l = v_add(f_l, f[i][1])
            vi = c.idx_v[i]
            if c.types[i] == jt.JointType.FREE:
                full = [*f_a, *f_l]
                for k in range(6):
                    tau[vi + k] = full[(k + 3) % 6]
            elif c.types[i] == jt.JointType.SPHERICAL:
                for k in range(3):
                    tau[vi + k] = f_a[k]
            else:
                ax_a, ax_l = svec[i]
                tau[vi] = sum(ax_a[k] * f_a[k] for k in range(3)) + sum(
                    ax_l[k] * f_l[k] for k in range(3)
                )
            p = c.parents[i]
            if p >= 0:
                rot_i, pos_i = xs[i]
                n_p, f_p = _force_transform_col(rot_i, pos_i, f_a, f_l)
                if f[p] is None:
                    f[p] = (n_p, f_p)
                else:
                    f[p] = (v_add(f[p][0], n_p), v_add(f[p][1], f_p))
        return tau


class _ConstraintMixin:
    """Component-wise constraint-system assembly for the distance-loop-only
    constrained path (Cassie/Digit pushrods): frame kinematics, Jacobian rows
    and Baumgarte drifts mirror `engine.constraints.compute_constraint_system`
    bit-for-bit at matched precision, with zero generic spatial-algebra ops."""

    def _vel_bias_components(self, xs, vc):
        """Per-joint LOCAL velocity and velocity-bias acceleration (FK with
        zero joint acceleration, no gravity — matches the `kin_bias` semantics
        of `compute_constraint_system`)."""
        c = self.c
        vel = [None] * c.nj
        acc = [None] * c.nj
        for i in range(c.nj):
            rot_i, pos_i = xs[i]
            p = c.parents[i]
            w_p, v_p = vel[p] if p >= 0 else (v3(), v3())
            a_p = acc[p] if p >= 0 else (v3(), v3())
            w_in = m_tv(rot_i, w_p)
            v_in = m_tv(rot_i, v_sub(v_p, v_cross(pos_i, w_p)))
            aw_in = m_tv(rot_i, a_p[0])
            al_in = m_tv(rot_i, v_sub(a_p[1], v_cross(pos_i, a_p[0])))
            vi = c.idx_v[i]
            if c.types[i] == jt.JointType.FREE:
                vj_lin = [vc[vi], vc[vi + 1], vc[vi + 2]]
                vj_ang = [vc[vi + 3], vc[vi + 4], vc[vi + 5]]
            elif c.types[i] == jt.JointType.SPHERICAL:
                vj_ang = [vc[vi], vc[vi + 1], vc[vi + 2]]
                vj_lin = v3()
            elif c.types[i] == jt.JointType.REVOLUTE:
                ax = c.axis[i].tolist()
                vj_ang, vj_lin = v_scale(ax, vc[vi]), v3()
            else:
                ax = c.axis[i].tolist()
                vj_ang, vj_lin = v3(), v_scale(ax, vc[vi])
            w_i = v_add(w_in, vj_ang)
            v_i = v_add(v_in, vj_lin)
            vel[i] = (w_i, v_i)
            b_ang = v_cross(w_i, vj_ang)
            b_lin = v_add(v_cross(w_i, vj_lin), v_cross(v_i, vj_ang))
            acc[i] = (v_add(aw_in, b_ang), v_add(al_in, b_lin))
        return vel, acc

    def _ancestors(self, joint):
        out = []
        j = joint
        while j >= 0:
            out.append(j)
            j = self.c.parents[j]
        return out[::-1]

    def _point_jacobian_cols(self, world, joint, pf):
        """World-aligned LINEAR Jacobian columns {vdof: V3} of the point `pf`
        (world V3 components) attached to `joint`'s subtree."""
        c = self.c
        cols = {}
        for j in self._ancestors(joint):
            rw, pw = world[j]
            vi = c.idx_v[j]
            if c.types[j] == jt.JointType.FREE:
                for k in range(3):  # translational dofs: R e_k
                    cols[vi + k] = [rw[0][k], rw[1][k], rw[2][k]]
                for k in range(3):  # rotational dofs: (R e_k) x (pf - p)
                    axis_w = [rw[0][k], rw[1][k], rw[2][k]]
                    cols[vi + 3 + k] = v_cross(axis_w, v_sub(pf, pw))
            elif c.types[j] == jt.JointType.SPHERICAL:
                for k in range(3):
                    axis_w = [rw[0][k], rw[1][k], rw[2][k]]
                    cols[vi + k] = v_cross(axis_w, v_sub(pf, pw))
            elif c.types[j] == jt.JointType.REVOLUTE:
                ax = c.axis[j].tolist()
                axis_w = m_mv(rw, ax)
                cols[vi] = v_cross(axis_w, v_sub(pf, pw))
            else:  # PRISMATIC
                ax = c.axis[j].tolist()
                cols[vi] = m_mv(rw, ax)
        return cols

    def _frame_jacobian_cols(self, world, joint, pf):
        """World-aligned frame Jacobian columns at the point `pf` (world V3
        components): `(ang_cols, lin_cols)`, each a {vdof: V3} dict — the
        component mirror of `ops.kinematics.frame_jacobian_world_aligned`
        (angular rows) + the linear point Jacobian of `_point_jacobian_cols`."""
        c = self.c
        ang, lin = {}, {}
        for j in self._ancestors(joint):
            rw, pw = world[j]
            vi = c.idx_v[j]
            if c.types[j] == jt.JointType.FREE:
                for k in range(3):  # translational dofs
                    lin[vi + k] = [rw[0][k], rw[1][k], rw[2][k]]
                    ang[vi + k] = v3()
                for k in range(3):  # rotational dofs
                    axis_w = [rw[0][k], rw[1][k], rw[2][k]]
                    ang[vi + 3 + k] = axis_w
                    lin[vi + 3 + k] = v_cross(axis_w, v_sub(pf, pw))
            elif c.types[j] == jt.JointType.SPHERICAL:
                for k in range(3):
                    axis_w = [rw[0][k], rw[1][k], rw[2][k]]
                    ang[vi + k] = axis_w
                    lin[vi + k] = v_cross(axis_w, v_sub(pf, pw))
            elif c.types[j] == jt.JointType.REVOLUTE:
                axis_w = m_mv(rw, c.axis[j].tolist())
                ang[vi] = axis_w
                lin[vi] = v_cross(axis_w, v_sub(pf, pw))
            else:  # PRISMATIC
                ang[vi] = v3()
                lin[vi] = m_mv(rw, c.axis[j].tolist())
        return ang, lin

    def distance_rows_components(self, xs, world, vel, acc, pairs, dist_ref,
                                 kp: float, kd: float):
        """Jacobian rows + Baumgarte drifts of the distance-loop constraints
        (mirror of the `---- distance loops ----` block in
        `compute_constraint_system`). Returns (rows [nd][nv components], drift
        [nd])."""
        c = self.c
        nv = self.model.nv
        rows, drifts = [], []
        for k, (fa, fb) in enumerate(pairs):
            data = []
            for fidx in (fa, fb):
                parent = c.frame_parents[fidx]
                fp = c.fpos[fidx].tolist()
                rw, pw = world[parent]
                p_f = v_add(m_mv(rw, fp), pw)
                w_l, v_l = vel[parent]
                a_l = acc[parent]
                vw_lin = m_mv(rw, v_add(v_l, v_cross(w_l, fp)))
                vw_ang = m_mv(rw, w_l)
                aw_lin = v_add(
                    m_mv(rw, v_sub(a_l[1], v_cross(fp, a_l[0]))),
                    v_cross(vw_ang, vw_lin),
                )
                data.append((parent, p_f, vw_lin, aw_lin))
            (ja_parent, pa, va, aa), (jb_parent, pb, vb, ab) = data
            dp = v_sub(pa, pb)
            dist = jnp.sqrt(jnp.maximum(v_dot(dp, dp), 1e-24))
            direction = v_scale(dp, 1.0 / dist)
            cols_a = self._point_jacobian_cols(world, ja_parent, pa)
            cols_b = self._point_jacobian_cols(world, jb_parent, pb)
            row = [0.0] * nv
            for d, col in cols_a.items():
                row[d] = row[d] + v_dot(direction, col)
            for d, col in cols_b.items():
                row[d] = row[d] - v_dot(direction, col)
            dv = v_sub(va, vb)
            dv_proj = v_dot(dv, direction)
            g = v_dot(direction, v_sub(aa, ab))
            g = g + (v_dot(dv, dv) - dv_proj * dv_proj) / dist
            g = g + kp * (dist - dist_ref[k]) + kd * dv_proj
            rows.append(row)
            drifts.append(g)
        return rows, drifts


# Attach the mixin methods to ComponentDynamics
ComponentDynamics.mass_matrix_components = _CRBAMixin.mass_matrix_components
ComponentDynamics.nle_components = _CRBAMixin.nle_components
ComponentDynamics._vel_bias_components = _ConstraintMixin._vel_bias_components
ComponentDynamics._ancestors = _ConstraintMixin._ancestors
ComponentDynamics._point_jacobian_cols = _ConstraintMixin._point_jacobian_cols
ComponentDynamics._frame_jacobian_cols = _ConstraintMixin._frame_jacobian_cols
ComponentDynamics.distance_rows_components = (
    _ConstraintMixin.distance_rows_components
)
