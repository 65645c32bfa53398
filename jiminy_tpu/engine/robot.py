"""Robot = model + hardware (motors, sensors) + contact frames + flexibility.

Role-equivalent to the reference's `Robot` (`core/src/robot/robot.cc`) and the
theoretical-vs-extended `Model` split (`core/src/robot/model.cc`): the *theoretical*
model comes from the URDF; the *extended* model adds flexibility joints and folds
motor armature (rotor inertia x reduction^2, `abstract_motor.cc:340`) onto the
mass-matrix diagonal.  All of it resolves to static arrays at build time.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax.numpy as jnp
import numpy as np
from flax import struct

from jiminy_tpu.models import joints as jt
from jiminy_tpu.models.model import RobotModel, build_model
from jiminy_tpu.models.urdf import build_model_from_urdf
from jiminy_tpu.engine.hardware import (
    ContactSensorGroup,
    EffortSensorGroup,
    EncoderSensorGroup,
    ForceSensorGroup,
    ImuSensorGroup,
    MotorBank,
    SensorSuite,
    _opt_arrays,
    build_motor_bank,
)
from jiminy_tpu.ops import lie


@struct.dataclass
class FlexibilityConfig:
    """Spherical spring-damper flexibility joints (reference
    `model.cc:1087-1164` + internal dynamics `engine.cc:3340-3392`)."""

    joint_indices: tuple = struct.field(pytree_node=False)  # spherical joints in extended model
    stiffness: jnp.ndarray  # (nflex, 3)
    damping: jnp.ndarray  # (nflex, 3)
    inertia: jnp.ndarray  # (nflex, 3)


@struct.dataclass
class Robot:
    name: str = struct.field(pytree_node=False)
    model: RobotModel  # extended model (flexibility folded in)
    theoretical_model: RobotModel = struct.field(pytree_node=True)
    motors: Optional[MotorBank] = None
    sensors: SensorSuite = struct.field(default_factory=SensorSuite)
    contact_frame_indices: tuple = struct.field(pytree_node=False, default=())
    # Per-contact-point sphere radius (0.0 = plain point): primitive collision
    # bodies expand into contact points with radii (reference COLLISION_BODIES
    # registry + hpp-fcl primitive-vs-ground, `model.h:40-129`, `engine.cc:3022`)
    contact_radii: tuple = struct.field(pytree_node=False, default=())
    flexibility: Optional[FlexibilityConfig] = None
    # Closed kinematic loops: ((frame_a, frame_b), ...) distance constraints
    # (reference `DistanceConstraint`, e.g. Cassie pushrods)
    loop_pairs: tuple = struct.field(pytree_node=False, default=())
    # Backlash joints auto-inserted in series with motors that declare play
    # (reference `Robot::initializeExtendedModel`, `robot.cc:582-630`)
    backlash_joint_indices: tuple = struct.field(pytree_node=False, default=())
    # Rolling-without-slip user constraints: ({"frame_name", "radius", ["axis"]},)
    # (reference Sphere/WheelConstraint)
    rolling_specs: tuple = struct.field(pytree_node=False, default=())
    # Body-vs-body narrowphase (self-collision): static (ga, gb) geometry
    # pairs with g = (parent_joint, radius, p0, p1) — a segment + radius in
    # the parent joint frame (sphere: zero-length segment; capsule: its axis).
    # See `contact.compute_pair_forces`. Beyond-reference capability.
    collision_pairs_geom: tuple = struct.field(pytree_node=False, default=())
    # Display-only geometry from the URDF's <visual> elements (reference
    # viewer geometry model, `jiminy_py/viewer/viewer.py`): hashable tuples
    # (link_frame_name, tag, params, origin_rot_flat9, origin_pos3,
    # mesh_path_or_None, scale3_or_None) consumed by `viewer.gltf`.
    visual_geoms: tuple = struct.field(pytree_node=False, default=())

    @property
    def nq(self):
        return self.model.nq

    @property
    def nv(self):
        return self.model.nv

    @property
    def nmotors(self):
        return 0 if self.motors is None else self.motors.nmotors

    @property
    def has_freeflyer(self) -> bool:
        return bool(self.model.joint_types) and (
            jt.JointType(self.model.joint_types[0]) == jt.JointType.FREE
        )

    # ------------------------------------------------------------------ #
    # Theoretical <-> extended state mapping (reference `model.h:366-373`:
    # getExtendedPositionFromTheoretical & co.). Joint names are preserved by
    # the flexibility/backlash surgery, so the maps are static name matches.
    # ------------------------------------------------------------------ #
    def _state_index_maps(self):
        """(ext_q<-th, ext_v<-th, th_q<-ext, th_v<-ext) static index arrays;
        -1 marks extended-only slots (flexibility/backlash joints)."""
        th, ext = self.theoretical_model, self.model
        q_map = -np.ones(ext.nq, np.int64)
        v_map = -np.ones(ext.nv, np.int64)
        th_q = np.zeros(th.nq, np.int64)
        th_v = np.zeros(th.nv, np.int64)
        for j, nm in enumerate(ext.joint_names):
            if nm not in th.joint_names:
                continue
            i = th.joint_names.index(nm)
            for k in range(ext.nq_of(j)):
                q_map[ext.idx_q[j] + k] = th.idx_q[i] + k
                th_q[th.idx_q[i] + k] = ext.idx_q[j] + k
            for k in range(ext.nv_of(j)):
                v_map[ext.idx_v[j] + k] = th.idx_v[i] + k
                th_v[th.idx_v[i] + k] = ext.idx_v[j] + k
        return q_map, v_map, th_q, th_v

    def extended_position_from_theoretical(self, q) -> jnp.ndarray:
        """Theoretical q -> extended q, flexibility quaternions / backlash
        angles at neutral. Batch-transparent on the leading axes."""
        q_map, _, _, _ = self._state_index_maps()
        q = jnp.asarray(q, self.model.dtype)
        out = jnp.take(q, jnp.asarray(np.maximum(q_map, 0)), axis=-1)
        return jnp.where(jnp.asarray(q_map) >= 0, out, self.model.neutral())

    def extended_velocity_from_theoretical(self, v) -> jnp.ndarray:
        """Theoretical v -> extended v (extended-only DoFs at rest)."""
        _, v_map, _, _ = self._state_index_maps()
        v = jnp.asarray(v, self.model.dtype)
        out = jnp.take(v, jnp.asarray(np.maximum(v_map, 0)), axis=-1)
        return jnp.where(jnp.asarray(v_map) >= 0, out, 0.0)

    def theoretical_position_from_extended(self, q) -> jnp.ndarray:
        """Extended q -> theoretical q (flexibility/backlash slots dropped)."""
        _, _, th_q, _ = self._state_index_maps()
        return jnp.take(jnp.asarray(q, self.model.dtype), jnp.asarray(th_q), axis=-1)

    def theoretical_velocity_from_extended(self, v) -> jnp.ndarray:
        """Extended v -> theoretical v."""
        _, _, _, th_v = self._state_index_maps()
        return jnp.take(jnp.asarray(v, self.model.dtype), jnp.asarray(th_v), axis=-1)

    # ------------------------------------------------------------------ #
    @staticmethod
    def build(
        model_or_urdf,
        has_freeflyer: bool = False,
        name: Optional[str] = None,
        motors: Sequence[dict] = (),
        sensors: Optional[dict] = None,
        contact_frames: Sequence[str] = (),
        collision_bodies: Sequence[dict] = (),
        flexibility: Sequence[dict] = (),
        loop_constraints: Sequence[tuple] = (),
        rolling_constraints: Sequence[dict] = (),
        collision_pairs: Sequence[tuple] = (),
        lock_joints: Sequence[str] = (),
        visual_geoms: Sequence[tuple] = (),
        dtype=None,
    ) -> "Robot":
        """Assemble a robot.

        - model_or_urdf: RobotModel, URDF path, or URDF XML string.
        - motors: motor specs (see `build_motor_bank`).
        - sensors: {"imu": [...], "encoder": [...], "effort": [...],
          "contact": [...], "force": [...]} — spec dicts per type.
        - contact_frames: frame names treated as ground contact points.
        - collision_bodies: ground-collision geometries. Each entry is either
          a spec dict ``{"frame_name", "geometry": "sphere"|"capsule"|"box"|
          "cylinder"|"mesh"|"points", ...}`` with ``radius`` (sphere/capsule/
          cylinder), ``length``+``axis`` (capsule/cylinder), ``size`` (3,)
          (box), ``points`` (N,3) (mesh/points) and optional ``origin``
          (rot, pos) — or a bare link name (string), in which case the
          geometry is read from the URDF's ``<collision>`` elements (requires
          `model_or_urdf` to be a URDF; reference hardware-TOML
          ``collisionBodyNames``, `jiminy_py/robot.py:518`). Expanded at
          build time into derived contact points: sphere -> 1 radius-r point,
          capsule -> 2 endpoint spheres, box -> 8 corners, cylinder -> rim
          points, mesh -> convex-hull vertices (reference collision-body
          registry checked against the ground via hpp-fcl, `model.h:40-129`).
        - flexibility: [{frame_name/joint_name, stiffness(3), damping(3), inertia(3)}]
          inserted as spherical joints (extended model).
        - collision_pairs: body-vs-body narrowphase (self-collision) pairs of
          frame/link names, e.g. ``[("left_shin", "right_shin")]``. Each name
          selects all collision points expanded from that link's collision
          bodies (or a direct contact frame); the pair expands to the cross
          product of sphere-sphere tests (`contact.compute_pair_forces`).
          Goes beyond the reference, which only dispatches ground collision.
        """
        if isinstance(model_or_urdf, RobotModel):
            theoretical = model_or_urdf
        else:
            theoretical = build_model_from_urdf(
                model_or_urdf, has_freeflyer, lock_joints=lock_joints, dtype=dtype
            )
        if any(isinstance(cb, str) for cb in collision_bodies):
            if isinstance(model_or_urdf, RobotModel):
                raise ValueError(
                    "collision_bodies by link name require building from URDF"
                )
            from jiminy_tpu.models.urdf import parse_collision_geometries

            geoms = parse_collision_geometries(model_or_urdf)
            expanded: list = []
            for cb in collision_bodies:
                if isinstance(cb, str):
                    if cb not in geoms:
                        raise ValueError(
                            f"link '{cb}' has no <collision> geometry in the URDF"
                        )
                    expanded.extend(geoms[cb])
                else:
                    expanded.append(cb)
            collision_bodies = expanded
        name = name or theoretical.name
        model = theoretical
        flex_cfg = None
        if flexibility:
            model, flex_cfg = _add_flexibility_joints(theoretical, flexibility)
        dtype = dtype or model.dtype

        bank = build_motor_bank(model, motors, dtype=dtype) if motors else None
        backlash_idx: tuple = ()
        if bank is not None and np.any(np.asarray(bank.backlash) > 0.0):
            model, bank, backlash_idx = _add_backlash_joints(model, bank)
        if bank is not None and bank.nmotors:
            # Fold joint-side armature (rotor inertia * reduction^2) into the model
            arm = np.asarray(model.armature).copy()
            for i, vi in enumerate(bank.v_indices):
                arm[vi] += float(np.asarray(bank.armature)[i]) * float(
                    np.asarray(bank.mechanical_reduction)[i]
                ) ** 2
            model = model.replace(armature=jnp.asarray(arm, dtype=dtype))

        contact_idx = tuple(model.frame_index(fn) for fn in contact_frames)
        radii = [0.0] * len(contact_idx)
        if collision_bodies:
            model, extra_idx, extra_radii = _expand_collision_bodies(
                model, collision_bodies
            )
            contact_idx = contact_idx + extra_idx
            radii += extra_radii
        pair_geoms: list = []
        if collision_pairs:
            geoms_by_name = _pair_geometries(model, collision_bodies, contact_idx)

            def geoms_of(nm: str) -> list:
                gs = geoms_by_name.get(nm)
                if not gs:
                    raise ValueError(
                        f"collision pair link '{nm}' has no contact frame or "
                        "collision body"
                    )
                return gs

            def _nondegenerate(g) -> bool:
                return g[1] == "box" or float(g[2]) > 0.0

            for nm_a, nm_b in collision_pairs:
                degenerate = True
                for ga in geoms_of(nm_a):
                    for gb in geoms_of(nm_b):
                        pair_geoms.append((ga, gb))
                        if _nondegenerate(ga) or _nondegenerate(gb):
                            degenerate = False
                if degenerate:
                    import warnings

                    warnings.warn(
                        f"collision pair ({nm_a!r}, {nm_b!r}) resolves to "
                        "zero-radius geometries on both sides: contact depth "
                        "can never go negative, so the pair will never "
                        "generate force. Attach a sphere/capsule/box/cylinder/"
                        "mesh collision body to at least one side.",
                        stacklevel=2,
                    )
        suite = _build_sensor_suite(model, bank, sensors or {}, contact_idx, dtype)
        return Robot(
            name=name,
            model=model,
            theoretical_model=theoretical,
            motors=bank,
            sensors=suite,
            contact_frame_indices=contact_idx,
            contact_radii=tuple(radii),
            flexibility=flex_cfg,
            loop_pairs=tuple(tuple(p) for p in loop_constraints),
            backlash_joint_indices=backlash_idx,
            rolling_specs=tuple(
                (
                    r["frame_name"],
                    float(r["radius"]),
                    tuple(r["axis"]) if "axis" in r else None,
                )
                for r in rolling_constraints
            ),
            collision_pairs_geom=tuple(pair_geoms),
            visual_geoms=tuple(visual_geoms),
        )


# --------------------------------------------------------------------------- #
# Collision-body expansion
# --------------------------------------------------------------------------- #


def _hull_downsample(points: np.ndarray, max_points: int) -> np.ndarray:
    """Reduce a vertex cloud to its convex-hull vertices, then (if still too
    many) a farthest-point subset of size `max_points`.  Only hull vertices can
    ever touch a (locally planar) ground, so this is lossless for resting
    contact up to the sampling cap."""
    points = np.asarray(points, dtype=np.float64).reshape(-1, 3)
    if len(points) > 4:
        try:
            from scipy.spatial import ConvexHull

            points = points[np.unique(ConvexHull(points).vertices)]
        except Exception:
            pass
    if len(points) <= max_points:
        return points
    # Greedy farthest-point sampling seeded at the lowest vertex (most likely
    # first ground contact for a roughly upright body).
    chosen = [int(np.argmin(points[:, 2]))]
    d = np.linalg.norm(points - points[chosen[0]], axis=1)
    for _ in range(max_points - 1):
        nxt = int(np.argmax(d))
        chosen.append(nxt)
        d = np.minimum(d, np.linalg.norm(points - points[nxt], axis=1))
    return points[chosen]


def _compose_origin(model: RobotModel, spec) -> tuple:
    """(rot0, pos0): the geometry placement in the PARENT JOINT frame —
    frame placement composed with the spec's optional `origin`."""
    fidx = model.frame_index(spec["frame_name"])
    rot0 = np.asarray(model.fplacement_rot[fidx])
    pos0 = np.asarray(model.fplacement_pos[fidx])
    o_rot, o_pos = spec.get("origin", (np.eye(3), np.zeros(3)))
    return rot0 @ np.asarray(o_rot, float), pos0 + rot0 @ np.asarray(o_pos, float)


def _pair_geometries(model: RobotModel, specs, contact_idx) -> dict:
    """Resolve each link/frame name to narrowphase geometries for body-vs-body
    pairs, tagged tuples in the parent joint frame:

    - capsule: ``(parent, "capsule", radius, p0, p1)`` — sphere-swept segment
      (sphere: zero length; cylinder: its axis with the same radius, a tight
      round-capped overapproximation).
    - box:     ``(parent, "box", rot9, center3, half3)`` — oriented box; URDF
      boxes are exact, meshes use their oriented bounding box.

    Dispatch in `contact.pair_narrowphase_force`: capsule-capsule (exact),
    capsule-box (exact point-box at the convex-minimizing segment parameter),
    box-box (15-axis SAT).  A bare contact frame remains a radius-0 point."""
    out: dict = {}

    def add(nm, parent, r, p0, p1):
        out.setdefault(nm, []).append(
            (int(parent), "capsule", float(r),
             tuple(map(float, p0)), tuple(map(float, p1)))
        )

    def add_box(nm, parent, rot, center, half):
        out.setdefault(nm, []).append(
            (
                int(parent),
                "box",
                tuple(float(x) for x in np.asarray(rot, float).ravel()),
                tuple(map(float, center)),
                tuple(map(float, half)),
            )
        )

    for spec in specs:
        if not isinstance(spec, dict):
            continue
        nm = spec["frame_name"]
        parent = model.frame_parents[model.frame_index(nm)]
        rot0, pos0 = _compose_origin(model, spec)
        geom = spec["geometry"]
        if geom == "sphere":
            add(nm, parent, spec["radius"], pos0, pos0)
        elif geom in ("capsule", "cylinder"):
            axis = np.asarray(spec.get("axis", (0.0, 0.0, 1.0)), float)
            axis = axis / max(np.linalg.norm(axis), 1e-12)
            half = 0.5 * float(spec["length"])
            add(nm, parent, spec["radius"], pos0 - rot0 @ (axis * half),
                pos0 + rot0 @ (axis * half))
        elif geom == "box":
            half = [0.5 * float(s) for s in spec["size"]]
            add_box(nm, parent, rot0, pos0, half)
        else:  # mesh / points -> oriented bounding box
            pts = np.asarray([o for o, _ in _geometry_points(spec)], float)
            if len(pts) >= 4 and np.linalg.matrix_rank(pts - pts.mean(0)) == 3:
                from jiminy_tpu.models.urdf import oriented_bounding_box

                corners = oriented_bounding_box(pts)
                center = corners.mean(axis=0)
                ax_x = 0.5 * (corners[4] - corners[0])
                ax_y = 0.5 * (corners[2] - corners[0])
                ax_z = 0.5 * (corners[1] - corners[0])
                half = [np.linalg.norm(ax_x), np.linalg.norm(ax_y),
                        np.linalg.norm(ax_z)]
                rot = np.stack(
                    [ax_x / max(half[0], 1e-12), ax_y / max(half[1], 1e-12),
                     ax_z / max(half[2], 1e-12)], axis=1
                )
                add_box(nm, parent, rot0 @ rot,
                        pos0 + rot0 @ center, half)
            else:
                # Degenerate cloud: fall back to point spheres
                for off in pts:
                    add(nm, parent, 0.0, pos0 + rot0 @ off, pos0 + rot0 @ off)
    # Plain contact frames referenced by exact name
    for fi in contact_idx:
        nm = model.frame_names[fi]
        if nm not in out:
            parent = model.frame_parents[fi]
            p = np.asarray(model.fplacement_pos[fi])
            add(nm, parent, 0.0, p, p)
    return out


def _geometry_points(spec) -> list:
    """Candidate points (offset, radius) covering a box/cylinder/mesh geometry
    (shared with `_expand_collision_bodies`' ground-contact expansion)."""
    geom = spec["geometry"]
    if geom == "box":
        sx, sy, sz = (0.5 * float(s) for s in spec["size"])
        return [
            (np.array([ex * sx, ey * sy, ez * sz]), 0.0)
            for ex in (-1.0, 1.0)
            for ey in (-1.0, 1.0)
            for ez in (-1.0, 1.0)
        ]
    if geom == "cylinder":
        axis = np.asarray(spec.get("axis", (0.0, 0.0, 1.0)), float)
        axis = axis / max(np.linalg.norm(axis), 1e-12)
        half = 0.5 * float(spec["length"])
        rad = float(spec["radius"])
        n_rim = int(spec.get("n_rim", 8))
        ref = np.array([1.0, 0.0, 0.0])
        if abs(axis @ ref) > 0.9:
            ref = np.array([0.0, 1.0, 0.0])
        u = np.cross(axis, ref)
        u /= np.linalg.norm(u)
        w = np.cross(axis, u)
        return [
            (end * half * axis + rad * (np.cos(a) * u + np.sin(a) * w), 0.0)
            for end in (-1.0, 1.0)
            for a in np.linspace(0.0, 2.0 * np.pi, n_rim, endpoint=False)
        ]
    if geom in ("mesh", "points"):
        pts = _hull_downsample(spec["points"], int(spec.get("max_points", 16)))
        return [(p, 0.0) for p in pts]
    raise ValueError(f"unsupported collision geometry '{geom}'")


def _expand_collision_bodies(model: RobotModel, specs) -> tuple:
    """Expand primitive/mesh collision bodies into derived contact points.

    Returns (model_with_extra_frames, frame_indices, radii). Sphere -> one
    point of radius r at the geometry center; capsule -> one radius-r point at
    each segment endpoint; box -> its 8 corners as radius-0 points; cylinder ->
    `n_rim` radius-0 points around each end rim; mesh/points -> the convex-hull
    vertices of the cloud (capped at `max_points`, default 16) as radius-0
    points. This is the static-shape equivalent of the reference's hpp-fcl
    primitive-vs-ground narrow phase (`engine.cc:3022-3114`): candidate points
    are fixed at build time and activity is a runtime mask.  Each spec may
    carry an `origin` (rot, pos) placement of the geometry in the frame
    (URDF `<collision><origin>`).
    """
    idx: list = []
    radii: list = []
    used: dict = {}
    for spec in specs:
        fname = spec["frame_name"]
        fidx = model.frame_index(fname)
        parent = model.frame_parents[fidx]
        rot0 = np.asarray(model.fplacement_rot[fidx])
        pos0 = np.asarray(model.fplacement_pos[fidx])
        o_rot, o_pos = spec.get("origin", (np.eye(3), np.zeros(3)))
        rot0, pos0 = rot0 @ np.asarray(o_rot, float), pos0 + rot0 @ np.asarray(
            o_pos, float
        )
        geom = spec["geometry"]
        if geom == "sphere":
            offsets = [np.zeros(3)]
            r = float(spec["radius"])
        elif geom == "capsule":
            axis = np.asarray(spec.get("axis", (0.0, 0.0, 1.0)), float)
            axis = axis / max(np.linalg.norm(axis), 1e-12)
            half = 0.5 * float(spec["length"])
            offsets = [axis * half, -axis * half]
            r = float(spec["radius"])
        elif geom == "box":
            sx, sy, sz = (0.5 * float(s) for s in spec["size"])
            offsets = [
                np.array([ex * sx, ey * sy, ez * sz])
                for ex in (-1.0, 1.0)
                for ey in (-1.0, 1.0)
                for ez in (-1.0, 1.0)
            ]
            r = 0.0
        elif geom == "cylinder":
            axis = np.asarray(spec.get("axis", (0.0, 0.0, 1.0)), float)
            axis = axis / max(np.linalg.norm(axis), 1e-12)
            half = 0.5 * float(spec["length"])
            rad = float(spec["radius"])
            n_rim = int(spec.get("n_rim", 8))
            # Orthonormal basis of the rim plane
            ref = np.array([1.0, 0.0, 0.0])
            if abs(axis @ ref) > 0.9:
                ref = np.array([0.0, 1.0, 0.0])
            u = np.cross(axis, ref)
            u /= np.linalg.norm(u)
            w = np.cross(axis, u)
            offsets = [
                end * half * axis
                + rad * (np.cos(a) * u + np.sin(a) * w)
                for end in (-1.0, 1.0)
                for a in np.linspace(0.0, 2.0 * np.pi, n_rim, endpoint=False)
            ]
            r = 0.0
        elif geom in ("mesh", "points"):
            pts = _hull_downsample(
                spec["points"], int(spec.get("max_points", 16))
            )
            offsets = list(pts)
            r = 0.0
        else:
            raise ValueError(f"unsupported collision geometry '{geom}'")
        base = used.get(fname, 0)
        used[fname] = base + len(offsets)
        single = len(offsets) == 1 and base == 0
        for k, off in enumerate(offsets):
            pname = (
                f"{fname}_collision" if single else f"{fname}_collision_{base + k}"
            )
            place = lie.SE3(
                rot=jnp.asarray(rot0, model.dtype),
                pos=jnp.asarray(pos0 + rot0 @ off, model.dtype),
            )
            model = model.add_frame(pname, parent, place)
            idx.append(model.nframes - 1)
            radii.append(r)
    return model, tuple(idx), radii


# --------------------------------------------------------------------------- #
# Extended model surgery
# --------------------------------------------------------------------------- #


def _add_flexibility_joints(model: RobotModel, flex_specs) -> tuple[RobotModel, FlexibilityConfig]:
    """Insert a spherical joint at each named joint (deformation *before* the joint),
    mirroring `Model::addFlexibilityJointsToExtendedModel` (`model.cc:1087-1164`).

    The flexibility joint takes over the child subtree: the original joint is
    re-parented to the new spherical joint with identity placement, and the
    flexibility point-inertia (3,) is attached to the spherical joint body.
    """
    # Rebuild joint spec list from the model arrays, inserting spherical joints.
    specs: list[dict] = []
    index_map: dict[int, int] = {-1: -1}
    flex_entries = {s.get("joint_name") or s["frame_name"]: s for s in flex_specs}
    flex_joint_positions: list[int] = []
    stiff, damp, inert = [], [], []

    for i in range(model.njoints):
        spec = {
            "name": model.joint_names[i],
            "type": jt.JointType(model.joint_types[i]),
            "parent": index_map[model.parents[i]],
            "placement": (
                np.asarray(model.jplacement_rot)[i],
                np.asarray(model.jplacement_pos)[i],
            ),
            "axis": np.asarray(model.joint_axes)[i],
            "mass": float(np.asarray(model.mass)[i]),
            "com": np.asarray(model.com)[i],
            "inertia": np.asarray(model.inertia)[i],
            "armature": np.asarray(model.armature)[model.idx_v[i] : model.idx_v[i] + model.nv_of(i)],
            "damping": np.asarray(model.damping)[model.idx_v[i] : model.idx_v[i] + model.nv_of(i)],
            "position_limit": (
                np.asarray(model.position_limit_lower)[
                    model.idx_q[i] : model.idx_q[i] + model.nq_of(i)
                ],
                np.asarray(model.position_limit_upper)[
                    model.idx_q[i] : model.idx_q[i] + model.nq_of(i)
                ],
            ),
            "velocity_limit": np.asarray(model.velocity_limit)[
                model.idx_v[i] : model.idx_v[i] + model.nv_of(i)
            ],
            "effort_limit": np.asarray(model.effort_limit)[
                model.idx_v[i] : model.idx_v[i] + model.nv_of(i)
            ],
        }
        if model.joint_names[i] in flex_entries:
            fs = flex_entries[model.joint_names[i]]
            flex_joint_positions.append(len(specs))
            stiff.append(np.broadcast_to(np.asarray(fs.get("stiffness", 0.0), float), (3,)))
            damp.append(np.broadcast_to(np.asarray(fs.get("damping", 0.0), float), (3,)))
            inert.append(np.broadcast_to(np.asarray(fs.get("inertia", 0.0), float), (3,)))
            flex_inertia = np.diag(np.broadcast_to(np.asarray(fs.get("inertia", 0.0), float), (3,)))
            specs.append(
                {
                    "name": model.joint_names[i] + "_flexibility",
                    "type": jt.JointType.SPHERICAL,
                    "parent": spec["parent"],
                    "placement": spec["placement"],
                    "axis": np.array([0.0, 0.0, 1.0]),
                    "mass": 0.0,
                    "com": np.zeros(3),
                    "inertia": flex_inertia,
                }
            )
            spec["parent"] = len(specs) - 1
            spec["placement"] = (np.eye(3), np.zeros(3))
        index_map[i] = len(specs)
        specs.append(spec)

    frame_specs = [
        {
            "name": model.frame_names[i],
            "parent": index_map[model.frame_parents[i]],
            "placement": (
                np.asarray(model.fplacement_rot)[i],
                np.asarray(model.fplacement_pos)[i],
            ),
        }
        for i in range(model.nframes)
    ]
    new_model = build_model(model.name, specs, frame_specs, dtype=model.dtype)
    cfg = FlexibilityConfig(
        joint_indices=tuple(flex_joint_positions),
        stiffness=jnp.asarray(np.array(stiff), model.dtype),
        damping=jnp.asarray(np.array(damp), model.dtype),
        inertia=jnp.asarray(np.array(inert), model.dtype),
    )
    return new_model, cfg


# --------------------------------------------------------------------------- #
# Sensor suite assembly
# --------------------------------------------------------------------------- #


def _build_sensor_suite(model, bank, sensor_specs, contact_idx, dtype) -> SensorSuite:
    suite = {}

    enc_specs = sensor_specs.get("encoder", ())
    if enc_specs:
        names, qidx, vidx, types, side, reds = [], [], [], [], [], []
        for s in enc_specs:
            if "motor_name" in s and bank is not None:
                m = bank.names.index(s["motor_name"])
                j = bank.joint_indices[m]
                red = float(np.asarray(bank.mechanical_reduction)[m])
                joint_side = bool(s.get("joint_side", False))
            else:
                j = model.joint_index(s["joint_name"])
                red = 1.0
                joint_side = True
            names.append(s.get("name", model.joint_names[j]))
            qidx.append(model.idx_q[j])
            vidx.append(model.idx_v[j])
            types.append(int(model.joint_types[j]))
            side.append(joint_side)
            reds.append(red)
        noise, bias, delay, jitter, order = _opt_arrays(len(names), 2, enc_specs, dtype)
        suite["encoder"] = EncoderSensorGroup(
            names=tuple(names),
            q_indices=tuple(qidx),
            v_indices=tuple(vidx),
            joint_types=tuple(types),
            joint_side=tuple(side),
            interp_order=order,
            reduction=jnp.asarray(np.array(reds), dtype),
            noise_std=noise,
            bias=bias,
            delay=delay,
            jitter=jitter,
        )

    eff_specs = sensor_specs.get("effort", ())
    if eff_specs:
        names = [s.get("name", s["motor_name"]) for s in eff_specs]
        midx = tuple(bank.names.index(s["motor_name"]) for s in eff_specs)
        noise, bias, delay, jitter, order = _opt_arrays(len(names), 1, eff_specs, dtype)
        suite["effort"] = EffortSensorGroup(
            names=tuple(names),
            motor_indices=midx,
            interp_order=order,
            noise_std=noise,
            bias=bias,
            delay=delay,
            jitter=jitter,
        )

    imu_specs = sensor_specs.get("imu", ())
    if imu_specs:
        names = [s.get("name", s["frame_name"]) for s in imu_specs]
        fidx = tuple(model.frame_index(s["frame_name"]) for s in imu_specs)
        n = len(names)
        noise = np.zeros((n, 6))
        bias6 = np.zeros((n, 6))
        rot_bias_inv = np.tile(np.eye(3), (n, 1, 1))
        delay = np.zeros(n)
        jitter = np.zeros(n)
        order = 1
        for i, s in enumerate(imu_specs):
            noise[i] = np.broadcast_to(np.asarray(s.get("noise_std", 0.0), float), (6,))
            b = np.asarray(s.get("bias", np.zeros(9)), float)
            if b.size == 9:
                # Host-side Rodrigues (numpy): R_b^-1 = exp3(-rotation bias)
                w = -b[:3]
                th = float(np.linalg.norm(w))
                sk = np.array(
                    [[0, -w[2], w[1]], [w[2], 0, -w[0]], [-w[1], w[0], 0]], dtype=float
                )
                if th > 1e-12:
                    rot_bias_inv[i] = (
                        np.eye(3)
                        + np.sin(th) / th * sk
                        + (1 - np.cos(th)) / th**2 * (sk @ sk)
                    )
                bias6[i] = b[3:]
            else:
                bias6[i] = np.broadcast_to(b, (6,))
            delay[i] = float(s.get("delay", 0.0))
            jitter[i] = float(s.get("jitter", 0.0))
            order = int(s.get("delay_interpolation_order", order))
        suite["imu"] = ImuSensorGroup(
            names=tuple(names),
            frame_indices=fidx,
            interp_order=order,
            rot_bias_inv=jnp.asarray(rot_bias_inv, dtype),
            noise_std=jnp.asarray(noise, dtype),
            bias=jnp.asarray(bias6, dtype),
            delay=jnp.asarray(delay, dtype),
            jitter=jnp.asarray(jitter, dtype),
        )

    con_specs = sensor_specs.get("contact", ())
    if con_specs:
        names = [s.get("name", s["frame_name"]) for s in con_specs]
        slots = tuple(contact_idx.index(model.frame_index(s["frame_name"])) for s in con_specs)
        noise, bias, delay, jitter, order = _opt_arrays(len(names), 3, con_specs, dtype)
        suite["contact"] = ContactSensorGroup(
            names=tuple(names),
            contact_slots=slots,
            interp_order=order,
            noise_std=noise,
            bias=bias,
            delay=delay,
            jitter=jitter,
        )

    frc_specs = sensor_specs.get("force", ())
    if frc_specs:
        names = [s.get("name", s["frame_name"]) for s in frc_specs]
        fidx = tuple(model.frame_index(s["frame_name"]) for s in frc_specs)
        slots = []
        for f in fidx:
            parent = model.frame_parents[f]
            slots.append(
                tuple(
                    k
                    for k, c in enumerate(contact_idx)
                    if model.frame_parents[c] == parent
                )
            )
        noise, bias, delay, jitter, order = _opt_arrays(len(names), 6, frc_specs, dtype)
        suite["force"] = ForceSensorGroup(
            names=tuple(names),
            frame_indices=fidx,
            contact_slots=tuple(slots),
            interp_order=order,
            noise_std=noise,
            bias=bias,
            delay=delay,
            jitter=jitter,
        )

    return SensorSuite(**suite)


def _add_backlash_joints(model: RobotModel, bank: MotorBank):
    """Insert a passive revolute joint (same axis, limits ±backlash/2) in series
    after each motor joint declaring play; the link body moves to the backlash
    joint while the motor joint keeps only the transmission (reference
    `Robot::initializeExtendedModel`, `robot.cc:582-630`; bound constraints on
    backlash joints enforce the hard stops)."""
    backlash_of = {}
    for k, j in enumerate(bank.joint_indices):
        bl = float(np.asarray(bank.backlash)[k])
        if bl > 0.0:
            backlash_of[j] = bl

    specs: list[dict] = []
    index_map: dict[int, int] = {-1: -1}
    backlash_positions: list[int] = []
    for i in range(model.njoints):
        spec = {
            "name": model.joint_names[i],
            "type": jt.JointType(model.joint_types[i]),
            "parent": index_map[model.parents[i]],
            "placement": (
                np.asarray(model.jplacement_rot)[i],
                np.asarray(model.jplacement_pos)[i],
            ),
            "axis": np.asarray(model.joint_axes)[i],
            "mass": float(np.asarray(model.mass)[i]),
            "com": np.asarray(model.com)[i],
            "inertia": np.asarray(model.inertia)[i],
            "armature": np.asarray(model.armature)[
                model.idx_v[i] : model.idx_v[i] + model.nv_of(i)
            ],
            "damping": np.asarray(model.damping)[
                model.idx_v[i] : model.idx_v[i] + model.nv_of(i)
            ],
            "position_limit": (
                np.asarray(model.position_limit_lower)[
                    model.idx_q[i] : model.idx_q[i] + model.nq_of(i)
                ],
                np.asarray(model.position_limit_upper)[
                    model.idx_q[i] : model.idx_q[i] + model.nq_of(i)
                ],
            ),
            "velocity_limit": np.asarray(model.velocity_limit)[
                model.idx_v[i] : model.idx_v[i] + model.nv_of(i)
            ],
            "effort_limit": np.asarray(model.effort_limit)[
                model.idx_v[i] : model.idx_v[i] + model.nv_of(i)
            ],
        }
        index_map[i] = len(specs)
        if i in backlash_of:
            bl = backlash_of[i]
            # Motor joint keeps the transmission only (a sliver of the body
            # inertia for numerical conditioning); the body follows the
            # backlash joint.
            body = dict(spec)
            spec["mass"] = 0.0
            spec["com"] = np.zeros(3)
            spec["inertia"] = np.eye(3) * 1e-6
            specs.append(spec)
            specs.append(
                {
                    "name": model.joint_names[i] + "_backlash",
                    "type": jt.JointType.REVOLUTE,
                    "parent": index_map[i],
                    "placement": (np.eye(3), np.zeros(3)),
                    "axis": np.asarray(model.joint_axes)[i],
                    "mass": body["mass"],
                    "com": body["com"],
                    "inertia": body["inertia"],
                    "position_limit": (
                        np.array([-bl / 2.0]),
                        np.array([bl / 2.0]),
                    ),
                }
            )
            backlash_positions.append(len(specs) - 1)
            # Children of this joint must attach to the backlash joint
            index_map[i] = len(specs) - 1
        else:
            specs.append(spec)

    frame_specs = [
        {
            "name": model.frame_names[i],
            "parent": index_map[model.frame_parents[i]],
            "placement": (
                np.asarray(model.fplacement_rot)[i],
                np.asarray(model.fplacement_pos)[i],
            ),
        }
        for i in range(model.nframes)
    ]
    new_model = build_model(model.name, specs, frame_specs, dtype=model.dtype)
    # Remap the motor bank onto the new model (motors keep their joint names)
    new_bank = bank.replace(
        joint_indices=tuple(new_model.joint_index(n) for n in _motor_joint_names(model, bank)),
        v_indices=tuple(
            new_model.idx_v[new_model.joint_index(n)]
            for n in _motor_joint_names(model, bank)
        ),
        q_indices=tuple(
            new_model.idx_q[new_model.joint_index(n)]
            for n in _motor_joint_names(model, bank)
        ),
    )
    return new_model, new_bank, tuple(backlash_positions)


def _motor_joint_names(model: RobotModel, bank: MotorBank) -> list:
    return [model.joint_names[j] for j in bank.joint_indices]
