"""The static robot model: a pytree of arrays + hashable trace-time metadata.

Equivalent in role to the reference's `Model` wrapper around `pinocchio::Model`
(reference `core/src/robot/model.cc`), re-designed for XLA: the kinematic structure
(joint types, parents, q/v index maps, frame tree) is *static metadata* resolved at
trace time, while every numeric quantity (placements, inertias, limits, armature) is a
JAX array leaf — so models can be `vmap`-ed for per-env randomization (the reference's
`addBiasedToExtendedModel`, `model.cc:1166-1236`) and donated/sharded like any pytree.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from jiminy_tpu.models import joints as jt
from jiminy_tpu.ops import lie


@struct.dataclass
class RobotModel:
    # ---------------- static metadata (hashable, trace-time) ----------------
    name: str = struct.field(pytree_node=False)
    nq: int = struct.field(pytree_node=False)
    nv: int = struct.field(pytree_node=False)
    njoints: int = struct.field(pytree_node=False)
    joint_types: tuple = struct.field(pytree_node=False)  # tuple[int], len nj
    parents: tuple = struct.field(pytree_node=False)  # tuple[int], parent joint or -1
    idx_q: tuple = struct.field(pytree_node=False)  # tuple[int] q segment start per joint
    idx_v: tuple = struct.field(pytree_node=False)  # tuple[int] v segment start per joint
    joint_names: tuple = struct.field(pytree_node=False)
    frame_names: tuple = struct.field(pytree_node=False)
    frame_parents: tuple = struct.field(pytree_node=False)  # parent joint index per frame

    # ---------------- array data (leaves) ----------------
    # Placement of each joint's fixed attachment frame in its parent joint frame.
    jplacement_rot: jnp.ndarray  # (nj, 3, 3)
    jplacement_pos: jnp.ndarray  # (nj, 3)
    joint_axes: jnp.ndarray  # (nj, 3) motion axis (unused for FREE/SPHERICAL)
    # Body (link) spatial inertia attached to each joint, in the joint frame:
    mass: jnp.ndarray  # (nj,)
    com: jnp.ndarray  # (nj, 3) CoM in joint frame
    inertia: jnp.ndarray  # (nj, 3, 3) rotational inertia about the CoM, joint frame
    armature: jnp.ndarray  # (nv,) rotor inertia added to the mass-matrix diagonal
    damping: jnp.ndarray  # (nv,) passive viscous joint damping (URDF <dynamics>)
    # Limits (pinocchio-model level; motors refine these):
    position_limit_lower: jnp.ndarray  # (nq,)
    position_limit_upper: jnp.ndarray  # (nq,)
    velocity_limit: jnp.ndarray  # (nv,)
    effort_limit: jnp.ndarray  # (nv,)
    # Frame placements in their parent joint frame:
    fplacement_rot: jnp.ndarray  # (nf, 3, 3)
    fplacement_pos: jnp.ndarray  # (nf, 3)

    # ------------------------------------------------------------------ #
    @property
    def nframes(self) -> int:
        return len(self.frame_names)

    @property
    def dtype(self):
        return self.mass.dtype

    def joint_index(self, name: str) -> int:
        return self.joint_names.index(name)

    def frame_index(self, name: str) -> int:
        return self.frame_names.index(name)

    def joint_placement(self, i: int) -> lie.SE3:
        return lie.SE3(self.jplacement_rot[..., i, :, :], self.jplacement_pos[..., i, :])

    def frame_placement(self, i: int) -> lie.SE3:
        return lie.SE3(self.fplacement_rot[..., i, :, :], self.fplacement_pos[..., i, :])

    def nv_of(self, i: int) -> int:
        return jt.JOINT_NV[jt.JointType(self.joint_types[i])]

    def nq_of(self, i: int) -> int:
        return jt.JOINT_NQ[jt.JointType(self.joint_types[i])]

    def q_slice(self, i: int) -> slice:
        return slice(self.idx_q[i], self.idx_q[i] + self.nq_of(i))

    def v_slice(self, i: int) -> slice:
        return slice(self.idx_v[i], self.idx_v[i] + self.nv_of(i))

    # ------------------------------------------------------------------ #
    def neutral(self) -> jnp.ndarray:
        """Neutral configuration vector."""
        segs = [jt.neutral_q(jt.JointType(t)) for t in self.joint_types]
        q = np.concatenate(segs) if segs else np.zeros(0)
        return jnp.asarray(q, dtype=self.dtype)

    def add_frame(self, name: str, parent_joint: int, placement: lie.SE3) -> "RobotModel":
        """Return a new model with an extra operational frame (host-side op)."""
        return self.replace(
            frame_names=self.frame_names + (name,),
            frame_parents=self.frame_parents + (parent_joint,),
            fplacement_rot=jnp.concatenate([self.fplacement_rot, placement.rot[None]], axis=0),
            fplacement_pos=jnp.concatenate([self.fplacement_pos, placement.pos[None]], axis=0),
        )

    def astype(self, dtype) -> "RobotModel":
        """Cast all float leaves to dtype."""
        return jax.tree.map(
            lambda x: x.astype(dtype) if jnp.issubdtype(x.dtype, jnp.floating) else x, self
        )


def build_model(
    name: str,
    joint_specs: Sequence[dict[str, Any]],
    frame_specs: Sequence[dict[str, Any]] = (),
    dtype=None,
) -> RobotModel:
    """Assemble a RobotModel from per-joint dicts (host-side, numpy float64).

    Each joint spec: {name, type: JointType, parent: int, placement: (R, p),
    axis: (3,), mass, com, inertia, [armature], [position_limit], [velocity_limit],
    [effort_limit]}.  Frame spec: {name, parent: int, placement: (R, p)}.

    dtype defaults to float64 when x64 is enabled (CPU parity tests) and float32
    otherwise (TPU throughput).
    """
    if dtype is None:
        dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    nj = len(joint_specs)
    joint_types, parents, idx_q, idx_v, names = [], [], [], [], []
    nq = nv = 0
    jrot = np.zeros((nj, 3, 3))
    jpos = np.zeros((nj, 3))
    axes = np.zeros((nj, 3))
    mass = np.zeros(nj)
    com = np.zeros((nj, 3))
    inertia = np.zeros((nj, 3, 3))
    armature_list, damping_list, pos_lo, pos_hi, vel_lim, eff_lim = [], [], [], [], [], []

    for i, spec in enumerate(joint_specs):
        t = jt.JointType(spec["type"])
        joint_types.append(int(t))
        parents.append(int(spec["parent"]))
        idx_q.append(nq)
        idx_v.append(nv)
        names.append(spec["name"])
        nq_j, nv_j = jt.JOINT_NQ[t], jt.JOINT_NV[t]
        nq += nq_j
        nv += nv_j
        r, p = spec.get("placement", (np.eye(3), np.zeros(3)))
        jrot[i], jpos[i] = np.asarray(r), np.asarray(p)
        axes[i] = np.asarray(spec.get("axis", (0.0, 0.0, 1.0)))
        mass[i] = float(spec.get("mass", 0.0))
        com[i] = np.asarray(spec.get("com", np.zeros(3)))
        inertia[i] = np.asarray(spec.get("inertia", np.zeros((3, 3))))
        armature_list.extend(np.broadcast_to(np.asarray(spec.get("armature", 0.0)), (nv_j,)))
        damping_list.extend(np.broadcast_to(np.asarray(spec.get("damping", 0.0)), (nv_j,)))
        lo, hi = spec.get("position_limit", (None, None))
        if t == jt.JointType.FREE:
            default_lo = np.concatenate([np.full(3, -np.inf), np.full(4, -1.0)])
            default_hi = np.concatenate([np.full(3, np.inf), np.full(4, 1.0)])
        elif t in (jt.JointType.REVOLUTE_UNBOUNDED, jt.JointType.SPHERICAL):
            default_lo, default_hi = np.full(nq_j, -1.0), np.full(nq_j, 1.0)
        else:
            default_lo, default_hi = np.full(nq_j, -np.inf), np.full(nq_j, np.inf)
        pos_lo.extend(np.asarray(lo) if lo is not None else default_lo)
        pos_hi.extend(np.asarray(hi) if hi is not None else default_hi)
        vel_lim.extend(np.broadcast_to(np.asarray(spec.get("velocity_limit", np.inf)), (nv_j,)))
        eff_lim.extend(np.broadcast_to(np.asarray(spec.get("effort_limit", np.inf)), (nv_j,)))

    frame_names = tuple(f["name"] for f in frame_specs)
    frame_parents = tuple(int(f["parent"]) for f in frame_specs)
    nf = len(frame_specs)
    frot = np.zeros((nf, 3, 3))
    fpos = np.zeros((nf, 3))
    for i, f in enumerate(frame_specs):
        r, p = f.get("placement", (np.eye(3), np.zeros(3)))
        frot[i], fpos[i] = np.asarray(r), np.asarray(p)

    asarr = lambda x: jnp.asarray(np.asarray(x, dtype=np.float64), dtype=dtype)  # noqa: E731
    return RobotModel(
        name=name,
        nq=nq,
        nv=nv,
        njoints=nj,
        joint_types=tuple(joint_types),
        parents=tuple(parents),
        idx_q=tuple(idx_q),
        idx_v=tuple(idx_v),
        joint_names=tuple(names),
        frame_names=frame_names,
        frame_parents=frame_parents,
        jplacement_rot=asarr(jrot),
        jplacement_pos=asarr(jpos),
        joint_axes=asarr(axes),
        mass=asarr(mass),
        com=asarr(com),
        inertia=asarr(inertia),
        armature=asarr(np.array(armature_list) if armature_list else np.zeros(0)),
        damping=asarr(np.array(damping_list) if damping_list else np.zeros(0)),
        position_limit_lower=asarr(np.array(pos_lo) if pos_lo else np.zeros(0)),
        position_limit_upper=asarr(np.array(pos_hi) if pos_hi else np.zeros(0)),
        velocity_limit=asarr(np.array(vel_lim) if vel_lim else np.zeros(0)),
        effort_limit=asarr(np.array(eff_lim) if eff_lim else np.zeros(0)),
        fplacement_rot=asarr(frot),
        fplacement_pos=asarr(fpos),
    )
