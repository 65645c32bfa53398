"""Packaged robots built from the reference's actual asset files.

The reference ships each robot as URDF + `*_hardware.toml` (+ meshes), loaded
by `gym_jiminy.envs` (`anymal.py:62-79`, `cassie.py:77-155`, `digit.py:96-172`,
`atlas.py:113-236`) through `jiminy_py.robot.load_hardware_description_file`
(`robot.py:518`).  Those files are vendored verbatim under `jiminy_tpu/data/`;
this module rebuilds the same robots through the package's own loaders:

- `models.urdf.build_model_from_urdf` (incl. locked passive joints — the
  reference's `pinocchio.buildReducedModel` calls),
- `hardware.load_hardware_description_file` (reference TOML schema),
- the reference's `avoid_instable_collisions` contact generation
  (`robot.py:590-720`): collision boxes -> contact points at the corners,
  collision/visual meshes -> contact points at the vertices of the oriented
  bounding box; other primitives stay collision bodies,
- per-env contact-point cleanup (`atlas.py:100-112` hull pruning,
  `cassie.py:157-161` / `digit.py:169-172` bottom-face selection) — realized
  geometrically (keep the lowest candidates at the nominal standing pose)
  instead of the reference's hard-coded trimesh vertex indices,
- the Cassie/Digit pushrod loop closures (`cassie.py:122-152`) as distance
  constraints between frames added at the reference's exact placements.
"""

from __future__ import annotations

import math
import os
from typing import Optional

import numpy as np

from jiminy_tpu.engine.robot import Robot
from jiminy_tpu.hardware import load_hardware_description_file
from jiminy_tpu.models.urdf import (
    build_model_from_urdf,
    load_mesh_vertices,
    oriented_bounding_box,
    parse_collision_geometries,
    parse_visual_geometries,
    _resolve_mesh_path,
)

DATA_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "data")

_ASSET_SUBDIRS = {
    "cartpole": "toys_models/cartpole",
    "acrobot": "toys_models/acrobot",
    "simple_pendulum": "toys_models/simple_pendulum",
    "double_pendulum": "toys_models/double_pendulum",
    "ant": "toys_models/ant",
    "anymal": "quadrupedal_robots/anymal",
    "cassie": "bipedal_robots/cassie",
    "digit": "bipedal_robots/digit",
    "atlas": "bipedal_robots/atlas",
}

# Passive joints folded away at build time (reference `buildReducedModel`
# calls: cassie.py:92-100, digit.py:108-116).
_LOCKED_JOINTS = {
    "cassie": ("knee_to_shin_left", "knee_to_shin_right"),
    "digit": ("shin_to_tarsus_left", "shin_to_tarsus_right"),
}


def robot_data_dir(name: str) -> str:
    try:
        sub = _ASSET_SUBDIRS[name]
    except KeyError:
        raise ValueError(
            f"no packaged assets for '{name}'; available: {sorted(_ASSET_SUBDIRS)}"
        ) from None
    return os.path.normpath(os.path.join(DATA_DIR, sub))


def urdf_path(name: str) -> str:
    return os.path.join(robot_data_dir(name), f"{name}.urdf")


def hardware_path(name: str) -> Optional[str]:
    p = os.path.join(robot_data_dir(name), f"{name}_hardware.toml")
    return p if os.path.exists(p) else None


def options_path(name: str) -> Optional[str]:
    p = os.path.join(robot_data_dir(name), f"{name}_options.toml")
    return p if os.path.exists(p) else None


# --------------------------------------------------------------------------- #
# Contact-point generation (reference avoid_instable_collisions)
# --------------------------------------------------------------------------- #


def _collision_body_specs(name: str, body: str) -> tuple[list, list]:
    """(collision_specs, candidate_points) for one collision body.

    Mirrors `load_hardware_description_file`'s avoid_instable_collisions
    branch (`jiminy_py/robot.py:590-720`): boxes are replaced by their corner
    points, meshes (collision, else visual fallback) by the vertices of their
    oriented bounding box; sphere/cylinder/capsule primitives are kept as
    collision bodies.  Candidate points are (3,) offsets in the LINK frame.
    """
    urdf = urdf_path(name)
    data_dir = robot_data_dir(name)
    cols = parse_collision_geometries(urdf, links=(body,)).get(body, [])
    keep_specs: list = []
    points: list = []

    def add_points(offsets, rot, pos):
        for off in offsets:
            points.append(pos + rot @ np.asarray(off, float))

    boxes = [s for s in cols if s["geometry"] == "box"]
    meshes = [s for s in cols if s["geometry"] == "mesh"]
    keep_specs += [s for s in cols if s["geometry"] not in ("box", "mesh")]

    for s in boxes:
        rot, pos = s.get("origin", (np.eye(3), np.zeros(3)))
        sx, sy, sz = (0.5 * float(v) for v in s["size"])
        add_points(
            [
                (ex * sx, ey * sy, ez * sz)
                for ex in (-1.0, 1.0)
                for ey in (-1.0, 1.0)
                for ez in (-1.0, 1.0)
            ],
            np.asarray(rot, float),
            np.asarray(pos, float),
        )
    if not boxes:
        mesh_sources = []
        for s in meshes:
            mesh_sources.append((s["points"], *s.get("origin", (np.eye(3), np.zeros(3)))))
        if not mesh_sources:
            # Visual-mesh fallback (reference robot.py:602-610)
            for s in parse_visual_geometries(urdf).get(body, []):
                if s.get("tag") != "mesh":
                    continue
                scale = None
                if s.get("scale"):
                    scale = np.array([float(x) for x in s["scale"].split()])
                path = _resolve_mesh_path(s["filename"], data_dir)
                rot, pos = s["origin"]
                mesh_sources.append((load_mesh_vertices(path, scale), rot, pos))
        for verts, rot, pos in mesh_sources:
            add_points(
                oriented_bounding_box(verts), np.asarray(rot, float), np.asarray(pos, float)
            )
    if not keep_specs and not points:
        # No geometry at all: single contact point at the body frame
        points.append(np.zeros(3))
    return keep_specs, points


def _select_bottom_points(model, nominal_q, body, points, mode) -> list:
    """Prune candidate contact points like the reference envs do.

    - mode "bottom4": keep the 4 lowest points at the nominal pose (the
      geometric meaning of the reference's hard-coded OBB vertex indices,
      `cassie.py:157-161`, `digit.py:169-172` — the bottom face of the toe
      slab).
    - mode "hull": keep the lower half, then only the vertices of its 2D
      convex hull (`atlas.py:100-112` `_cleanup_contact_points`).
    - mode None: keep everything.
    """
    if mode is None or len(points) <= 4:
        return points
    import jax.numpy as jnp

    from jiminy_tpu.ops.kinematics import forward_kinematics, frame_placement

    kin = forward_kinematics(model, jnp.asarray(nominal_q))
    fidx = model.frame_index(body)
    pl = frame_placement(model, kin, fidx)
    rot = np.asarray(pl.rot, float)
    pos = np.asarray(pl.pos, float)
    world = np.stack([pos + rot @ p for p in points])
    order = np.argsort(world[:, 2])
    if mode == "bottom4":
        return [points[i] for i in order[:4]]
    if mode == "hull":
        bottom = order[: max(len(points) // 2, 3)]
        xy = world[bottom, :2]
        try:
            from scipy.spatial import ConvexHull

            keep = bottom[np.unique(ConvexHull(xy).vertices)]
        except Exception:
            keep = bottom
        return [points[i] for i in keep]
    raise ValueError(f"unknown contact cleanup mode {mode!r}")


# --------------------------------------------------------------------------- #
# Nominal poses (reference env `_neutral` overrides)
# --------------------------------------------------------------------------- #


def _set_joint_angle(model, q, joint_name, theta):
    from jiminy_tpu.models import joints as jt

    j = model.joint_index(joint_name)
    t = jt.JointType(model.joint_types[j])
    if t == jt.JointType.REVOLUTE_UNBOUNDED:
        q[model.idx_q[j]] = math.cos(theta)
        q[model.idx_q[j] + 1] = math.sin(theta)
    else:
        q[model.idx_q[j]] = theta


def nominal_pose(name: str, model) -> np.ndarray:
    """Reference `_neutral` configuration for each packaged robot (base at the
    origin; the env auto-levels the height onto the ground)."""
    q = np.asarray(model.neutral(), float).copy()
    if name == "cassie":
        # cassie.py:20-24, 163-183
        for s in ("left", "right"):
            _set_joint_angle(model, q, f"hip_flexion_{s}", 25.0 / 180.0 * math.pi)
            _set_joint_angle(model, q, f"knee_joint_{s}", -65.0 / 180.0 * math.pi)
            _set_joint_angle(model, q, f"ankle_joint_{s}", 80.0 / 180.0 * math.pi)
            _set_joint_angle(model, q, f"toe_joint_{s}", -90.0 / 180.0 * math.pi)
    elif name == "digit":
        # digit.py:25-28, 174-201
        for s, sign in (("left", 1.0), ("right", -1.0)):
            _set_joint_angle(model, q, f"hip_abduction_{s}", sign * 20.0 / 180.0 * math.pi)
            _set_joint_angle(model, q, f"hip_flexion_{s}", sign * 5.7 / 180.0 * math.pi)
            _set_joint_angle(
                model, q, f"shoulder_pitch_joint_{s}", sign * 45.0 / 180.0 * math.pi
            )
            _set_joint_angle(model, q, f"elbow_joint_{s}", sign * 68.0 / 180.0 * math.pi)
    elif name == "atlas":
        q = _atlas_posed(model, q)
    elif name == "anymal":
        # The reference stands ANYmal at the URDF neutral (straight legs,
        # anymal.py has no _neutral override); an x-stance with bent knees is
        # kinematically identical to the procedural builders' pose and far
        # from the knee singularity, so it is the packaged default.
        for leg in ("LF", "RF", "LH", "RH"):
            sx = 1.0 if leg[1] == "F" else -1.0
            _set_joint_angle(model, q, f"{leg}_HFE", sx * 0.4)
            _set_joint_angle(model, q, f"{leg}_KFE", -sx * 0.8)
    return q


def _atlas_posed(model, q):
    # atlas.py:152-169 arm/back pose
    a = 0.2
    for jn, th in (
        ("back_bky", a),
        ("l_arm_elx", a),
        ("l_arm_shx", -math.pi / 2.0),
        ("l_arm_shz", math.pi / 4.0),
        ("l_arm_ely", math.pi / 4.0 + math.pi / 2.0),
        ("r_arm_elx", -a),
        ("r_arm_shx", math.pi / 2.0),
        ("r_arm_shz", -math.pi / 4.0),
        ("r_arm_ely", math.pi / 4.0 + math.pi / 2.0),
    ):
        if jn in model.joint_names:
            _set_joint_angle(model, q, jn, th)
    return q


# --------------------------------------------------------------------------- #
# Robot assembly
# --------------------------------------------------------------------------- #

# SE3 placements of the pushrod attachment frames (reference cassie.py:122-152
# and digit.py:146-168, verbatim translations).
_PUSHRODS = {
    "cassie": [
        ("right_pushrod_tarsus", "right_tarsus", (-0.12, 0.03, -0.005)),
        ("right_pushrod_hip", "hip_flexion_right", (0.0, 0.0, -0.045)),
        ("left_pushrod_tarsus", "left_tarsus", (-0.12, 0.03, 0.005)),
        ("left_pushrod_hip", "hip_flexion_left", (0.0, 0.0, 0.045)),
    ],
    "digit": [
        ("right_pushrod_tarsus", "right_tarsus", (-0.11, 0.0, 0.0)),
        ("right_pushrod_hip", "hip_flexion_right", (0.0, 0.0, 0.046)),
        ("left_pushrod_tarsus", "left_tarsus", (-0.11, 0.0, 0.0)),
        ("left_pushrod_hip", "hip_flexion_left", (0.0, 0.0, 0.046)),
    ],
}

_LOOP_PAIRS = {
    "cassie": [
        ("right_pushrod_tarsus", "right_pushrod_hip"),
        ("left_pushrod_tarsus", "left_pushrod_hip"),
    ],
    "digit": [
        ("right_pushrod_tarsus", "right_pushrod_hip"),
        ("left_pushrod_tarsus", "left_pushrod_hip"),
    ],
}

# Contact cleanup mode per robot (see _select_bottom_points)
_CLEANUP = {"cassie": "bottom4", "digit": "bottom4", "atlas": "hull"}


def load_robot(
    name: str,
    has_freeflyer: Optional[bool] = None,
    lock_joints=None,
    dtype=None,
) -> Robot:
    """Build the named packaged robot from its vendored reference assets."""
    if has_freeflyer is None:
        has_freeflyer = name in ("ant", "anymal", "cassie", "digit", "atlas")
    if lock_joints is None:
        lock_joints = _LOCKED_JOINTS.get(name, ())
    urdf = urdf_path(name)
    hw_file = hardware_path(name)
    hw = (
        load_hardware_description_file(hw_file)
        if hw_file
        else {"motors": [], "sensors": {}, "contact_frames": [], "collision_bodies": []}
    )

    model = build_model_from_urdf(
        urdf, has_freeflyer=has_freeflyer, lock_joints=lock_joints, dtype=dtype
    )

    # Pushrod frames for closed kinematic loops
    import jax.numpy as jnp

    from jiminy_tpu.ops import lie

    for fname, parent_frame, xyz in _PUSHRODS.get(name, ()):
        if parent_frame in model.joint_names:
            # pinocchio resolves movable-joint names to the joint's moving
            # frame (identity placement in the joint frame)
            parent_joint = model.joint_index(parent_frame)
            rot, pos = np.eye(3), np.asarray(xyz, float)
        else:
            pf = model.frame_index(parent_frame)
            parent_joint = model.frame_parents[pf]
            rot = np.asarray(model.fplacement_rot[pf], float)
            pos = np.asarray(model.fplacement_pos[pf], float) + rot @ np.asarray(
                xyz, float
            )
        model = model.add_frame(
            fname,
            parent_joint,
            lie.SE3(jnp.asarray(rot, model.dtype), jnp.asarray(pos, model.dtype)),
        )

    # Collision bodies -> contact points / primitive specs
    nominal = nominal_pose(name, model)
    collision_specs: list = []
    cleanup = _CLEANUP.get(name)
    for body in hw["collision_bodies"]:
        keep, points = _collision_body_specs(name, body)
        collision_specs += keep
        if points:
            points = _select_bottom_points(model, nominal, body, points, cleanup)
            collision_specs.append(
                {"frame_name": body, "geometry": "points", "points": np.stack(points),
                 "max_points": len(points)}
            )

    # Drop hardware attached to locked-away joints (the reference logs a
    # warning and skips them when loading hardware onto a reduced model)
    motors = [m for m in hw["motors"] if m["joint_name"] in model.joint_names]
    motor_names = {m["name"] for m in motors}
    sensors = {}
    for kind, specs in hw["sensors"].items():
        kept = []
        for s in specs:
            if "motor_name" in s and s["motor_name"] not in motor_names:
                continue
            if "joint_name" in s and s["joint_name"] not in model.joint_names:
                continue
            kept.append(s)
        if kept:
            sensors[kind] = kept

    # Display geometry from the URDF visuals (only for links that survived
    # joint locking — the viewer resolves links by frame name).
    from jiminy_tpu.models.urdf import visual_geom_tuples

    visuals = tuple(
        vg
        for vg in visual_geom_tuples(urdf)
        if vg[0] in model.frame_names
    )

    return Robot.build(
        model,
        name=name,
        motors=motors,
        sensors=sensors,
        contact_frames=hw["contact_frames"],
        collision_bodies=collision_specs,
        loop_constraints=_LOOP_PAIRS.get(name, ()),
        visual_geoms=visuals,
        dtype=dtype,
    )
