"""URDF -> RobotModel loader (host-side, numpy float64).

Role-equivalent to the reference's `buildModelsFromUrdf` path
(`core/src/utilities/pinocchio.cc`): parses the URDF kinematic tree, optionally roots
it on a free-flyer joint, folds fixed joints away (merging their link inertias into
the supporting movable link, parallel-axis transformed), and records operational
frames for every link and fixed joint so contact points / sensors can attach by name.

Only the joint types the reference robots use are supported: revolute, continuous,
prismatic, fixed, floating.  `<visual>` geometries (primitives and OBJ/STL meshes)
are parsed into `RobotModel.visual_geoms` for the glTF/HTML viewer
(`viewer/gltf.py`); `<collision>` meshes can be reduced to oriented-bounding-box
corner contact points (`oriented_bounding_box`), mirroring the reference's
`avoid_instable_collisions` asset pipeline, while the engine's runtime narrow
phase handles primitives exactly (box/sphere/capsule SAT in `engine/contact.py`).
"""

from __future__ import annotations

import os
import xml.etree.ElementTree as ET
from typing import Optional

import numpy as np

from jiminy_tpu.models import joints as jt
from jiminy_tpu.models.model import RobotModel, build_model


def _parse_origin(elem: Optional[ET.Element]) -> tuple[np.ndarray, np.ndarray]:
    if elem is None:
        return np.eye(3), np.zeros(3)
    xyz = np.array([float(x) for x in elem.get("xyz", "0 0 0").split()])
    rpy = np.array([float(x) for x in elem.get("rpy", "0 0 0").split()])
    return _rpy_mat(rpy), xyz


def _axis_angle_mat(axis: np.ndarray, theta: float) -> np.ndarray:
    """Rodrigues rotation about a unit axis."""
    k = np.asarray(axis, dtype=float)
    kx = np.array([[0, -k[2], k[1]], [k[2], 0, -k[0]], [-k[1], k[0], 0]])
    return np.eye(3) + np.sin(theta) * kx + (1.0 - np.cos(theta)) * (kx @ kx)


def _rpy_mat(rpy: np.ndarray) -> np.ndarray:
    r, p, y = rpy
    cr, sr, cp, sp, cy, sy = np.cos(r), np.sin(r), np.cos(p), np.sin(p), np.cos(y), np.sin(y)
    rx = np.array([[1, 0, 0], [0, cr, -sr], [0, sr, cr]])
    ry = np.array([[cp, 0, sp], [0, 1, 0], [-sp, 0, cp]])
    rz = np.array([[cy, -sy, 0], [sy, cy, 0], [0, 0, 1]])
    return rz @ ry @ rx


class _LinkInertia:
    """Mass, CoM and rotational inertia about the CoM, in a given frame."""

    def __init__(self, mass=0.0, com=None, inertia=None):
        self.mass = float(mass)
        self.com = np.zeros(3) if com is None else np.asarray(com, dtype=float)
        self.inertia = np.zeros((3, 3)) if inertia is None else np.asarray(inertia, dtype=float)

    @staticmethod
    def from_urdf(link: ET.Element) -> "_LinkInertia":
        inertial = link.find("inertial")
        if inertial is None:
            return _LinkInertia()
        rot, pos = _parse_origin(inertial.find("origin"))
        mass_el = inertial.find("mass")
        mass = float(mass_el.get("value")) if mass_el is not None else 0.0
        in_el = inertial.find("inertia")
        if in_el is not None:
            ixx, iyy, izz = (float(in_el.get(k, "0")) for k in ("ixx", "iyy", "izz"))
            ixy, ixz, iyz = (float(in_el.get(k, "0")) for k in ("ixy", "ixz", "iyz"))
            i_c = np.array([[ixx, ixy, ixz], [ixy, iyy, iyz], [ixz, iyz, izz]])
        else:
            i_c = np.zeros((3, 3))
        # Rotate inertia from the inertial frame into the link frame
        return _LinkInertia(mass, pos, rot @ i_c @ rot.T)

    def transformed(self, rot: np.ndarray, pos: np.ndarray) -> "_LinkInertia":
        """Express this inertia in a frame A, given our frame's placement (rot,pos) in A."""
        return _LinkInertia(self.mass, rot @ self.com + pos, rot @ self.inertia @ rot.T)

    def merged(self, other: "_LinkInertia") -> "_LinkInertia":
        """Combine two inertias expressed in the same frame."""
        m = self.mass + other.mass
        if m <= 0.0:
            return _LinkInertia(m, np.zeros(3), self.inertia + other.inertia)
        com = (self.mass * self.com + other.mass * other.com) / m

        def shift(li: "_LinkInertia") -> np.ndarray:
            d = li.com - com
            return li.inertia + li.mass * (np.dot(d, d) * np.eye(3) - np.outer(d, d))

        return _LinkInertia(m, com, shift(self) + shift(other))


_JOINT_TYPE_MAP = {
    "revolute": jt.JointType.REVOLUTE,
    "continuous": jt.JointType.REVOLUTE_UNBOUNDED,
    "prismatic": jt.JointType.PRISMATIC,
    "floating": jt.JointType.FREE,
}


def build_model_from_urdf(
    path_or_str: str,
    has_freeflyer: bool = False,
    root_joint_name: str = "root_joint",
    lock_joints: Sequence[str] = (),
    dtype=None,
) -> RobotModel:
    """Parse a URDF file (or literal XML string) into a RobotModel.

    ``lock_joints`` folds the named movable joints away — a sequence of names
    (locked at the neutral configuration, angle/displacement 0) or a
    ``{name: angle}`` mapping (locked at the given 1-dof joint position) —
    exactly like the reference envs' `pinocchio.buildReducedModel(model,
    locked_indices, qpos)` calls (Cassie/Digit passive shin-spring joints at
    neutral, `gym_jiminy/envs/.../cassie.py:92-100`; AtlasReduced upper body
    at a posed configuration, `atlas.py:200-207`): the child subtree
    re-attaches to the parent through the joint placement composed with the
    locked joint motion, the child link inertia merges into the supporting
    link, and an operational frame keeps the joint name addressable."""
    import jax.numpy as jnp

    if dtype is None:
        dtype = jnp.float64 if jnp.zeros(()).dtype == jnp.float64 else jnp.float32
    if os.path.exists(path_or_str):
        root = ET.parse(path_or_str).getroot()
    else:
        root = ET.fromstring(path_or_str)
    name = root.get("name", "robot")

    links = {link.get("name"): link for link in root.findall("link")}
    joints_by_child: dict[str, ET.Element] = {}
    children_of: dict[str, list[ET.Element]] = {}
    for joint in root.findall("joint"):
        child = joint.find("child").get("link")
        parent = joint.find("parent").get("link")
        joints_by_child[child] = joint
        children_of.setdefault(parent, []).append(joint)

    root_links = [ln for ln in links if ln not in joints_by_child]
    if len(root_links) != 1:
        raise ValueError(f"expected one root link, got {root_links}")
    root_link = root_links[0]

    lock_angles = dict(lock_joints) if isinstance(lock_joints, dict) else {}
    lock_set = set(lock_joints)
    joint_specs: list[dict] = []
    frame_specs: list[dict] = []
    # Deferred inertia accumulation: joint index -> _LinkInertia in joint frame
    inertias: dict[int, _LinkInertia] = {}

    def visit(link_name: str, parent_joint: int, rot: np.ndarray, pos: np.ndarray):
        """Attach `link_name`, whose frame placement in joint `parent_joint`'s moving
        frame is (rot, pos), then recurse into its child joints."""
        li = _LinkInertia.from_urdf(links[link_name]).transformed(rot, pos)
        if parent_joint >= 0:
            inertias[parent_joint] = inertias.get(parent_joint, _LinkInertia()).merged(li)
        # Record a frame for the link itself
        frame_specs.append({"name": link_name, "parent": parent_joint, "placement": (rot, pos)})

        for joint in children_of.get(link_name, []):
            jname = joint.get("name")
            jtype_str = joint.get("type")
            j_rot, j_pos = _parse_origin(joint.find("origin"))
            # Placement of the joint's fixed attachment frame in the parent *joint* frame
            a_rot, a_pos = rot @ j_rot, rot @ j_pos + pos
            child_link = joint.find("child").get("link")
            if jtype_str == "fixed" or jname in lock_set:
                if jname in lock_set:
                    theta = lock_angles.get(jname, 0.0)
                    lock_set.discard(jname)
                    if theta != 0.0:
                        axis_el = joint.find("axis")
                        axis = (
                            np.array([float(x) for x in axis_el.get("xyz").split()])
                            if axis_el is not None
                            else np.array([1.0, 0.0, 0.0])
                        )
                        axis = axis / max(np.linalg.norm(axis), 1e-12)
                        if jtype_str == "prismatic":
                            a_pos = a_pos + a_rot @ (axis * theta)
                        else:
                            a_rot = a_rot @ _axis_angle_mat(axis, theta)
                frame_specs.append(
                    {"name": jname, "parent": parent_joint, "placement": (a_rot, a_pos)}
                )
                visit(child_link, parent_joint, a_rot, a_pos)
                continue
            if jtype_str not in _JOINT_TYPE_MAP:
                raise ValueError(f"unsupported joint type '{jtype_str}' ({jname})")
            t = _JOINT_TYPE_MAP[jtype_str]
            axis_el = joint.find("axis")
            axis = (
                np.array([float(x) for x in axis_el.get("xyz").split()])
                if axis_el is not None
                else np.array([1.0, 0.0, 0.0])
            )
            nrm = np.linalg.norm(axis)
            axis = axis / nrm if nrm > 0 else axis
            dyn_el = joint.find("dynamics")
            damping = float(dyn_el.get("damping", "0")) if dyn_el is not None else 0.0
            limit_el = joint.find("limit")
            lo = hi = None
            eff = vel = np.inf
            if limit_el is not None:
                if limit_el.get("lower") is not None and t in (
                    jt.JointType.REVOLUTE,
                    jt.JointType.PRISMATIC,
                ):
                    lo = np.array([float(limit_el.get("lower", "0"))])
                    hi = np.array([float(limit_el.get("upper", "0"))])
                if limit_el.get("effort") is not None:
                    eff = float(limit_el.get("effort"))
                if limit_el.get("velocity") is not None:
                    vel = float(limit_el.get("velocity"))
            idx = len(joint_specs)
            joint_specs.append(
                {
                    "name": jname,
                    "type": t,
                    "parent": parent_joint,
                    "placement": (a_rot, a_pos),
                    "axis": axis,
                    "damping": damping,
                    "position_limit": (lo, hi),
                    "velocity_limit": vel,
                    "effort_limit": eff,
                }
            )
            visit(child_link, idx, np.eye(3), np.zeros(3))

    if has_freeflyer:
        joint_specs.append(
            {
                "name": root_joint_name,
                "type": jt.JointType.FREE,
                "parent": -1,
                "placement": (np.eye(3), np.zeros(3)),
                "axis": np.array([0.0, 0.0, 1.0]),
                "position_limit": (None, None),
            }
        )
        visit(root_link, 0, np.eye(3), np.zeros(3))
    else:
        visit(root_link, -1, np.eye(3), np.zeros(3))

    if lock_set:
        raise ValueError(f"lock_joints not found in URDF: {sorted(lock_set)}")
    # Fill merged inertias back into the joint specs
    for i, spec in enumerate(joint_specs):
        li = inertias.get(i, _LinkInertia())
        spec["mass"], spec["com"], spec["inertia"] = li.mass, li.com, li.inertia
        lo, hi = spec.pop("position_limit", (None, None))
        if lo is not None:
            spec["position_limit"] = (lo, hi)

    return build_model(name, joint_specs, frame_specs, dtype=dtype)


# --------------------------------------------------------------------------- #
# Collision geometry (link name -> primitive/mesh specs)
# --------------------------------------------------------------------------- #


def load_mesh_vertices(path: str, scale=None) -> np.ndarray:
    """Load the vertex cloud of an OBJ or STL mesh file (host-side numpy).

    Minimal standalone loader (no trimesh in the image): OBJ ``v`` records,
    STL binary (84-byte header + 50-byte triangles) or ASCII ``vertex`` lines.
    Returns an (N, 3) float64 array; ``scale`` is an optional scalar or (3,)
    per-axis factor (URDF ``<mesh scale=...>``).
    """
    ext = os.path.splitext(path)[1].lower()
    verts: list = []
    if ext == ".obj":
        with open(path, "r", errors="ignore") as f:
            for line in f:
                if line.startswith("v "):
                    parts = line.split()
                    verts.append([float(parts[1]), float(parts[2]), float(parts[3])])
        out = np.asarray(verts, dtype=np.float64)
    elif ext == ".stl":
        with open(path, "rb") as f:
            data = f.read()
        if data[:5] == b"solid" and b"facet" in data[:500]:
            for line in data.decode(errors="ignore").splitlines():
                parts = line.split()
                if parts[:1] == ["vertex"]:
                    verts.append([float(parts[1]), float(parts[2]), float(parts[3])])
            out = np.asarray(verts, dtype=np.float64)
        else:
            (ntri,) = np.frombuffer(data[80:84], dtype="<u4")
            tri = np.frombuffer(
                data[84 : 84 + 50 * int(ntri)], dtype=np.uint8
            ).reshape(int(ntri), 50)
            # Each record: normal (3f) + 3 vertices (9f) + 2-byte attribute
            floats = tri[:, :48].copy().view("<f4").reshape(int(ntri), 4, 3)
            out = floats[:, 1:, :].reshape(-1, 3).astype(np.float64)
        if out.size:
            out = np.unique(out, axis=0)
    else:
        raise ValueError(f"unsupported mesh format '{ext}' ({path})")
    if out.size == 0:
        raise ValueError(f"no vertices found in mesh {path}")
    if scale is not None:
        out = out * np.asarray(scale, dtype=np.float64)
    return out


def oriented_bounding_box(points: np.ndarray) -> np.ndarray:
    """8 vertices of a near-minimum-volume oriented bounding box of a cloud.

    Role-equivalent to the reference's `trimesh.bounding_box_oriented` used to
    replace collision meshes by contact points at the OBB vertices
    (`jiminy_py/robot.py:697-720`): searches orientations with a box face
    flush to a convex-hull facet, solving the in-plane rotation exactly with
    2D rotating calipers (minimum-area rectangle).  Returns an (8, 3) array
    ordered by the sign pattern (-/-/-, -/-/+, -/+/-, ... +/+/+) of the local
    box axes, axes sorted so the box's shortest extent is last.
    """
    from scipy.spatial import ConvexHull

    pts = np.asarray(points, dtype=np.float64).reshape(-1, 3)
    hull = ConvexHull(pts)
    hp = pts[np.unique(hull.vertices)]

    def min_area_rect(xy: np.ndarray) -> tuple:
        """(area, R2) minimum-area rectangle of 2D points via edge-flush search."""
        h2 = ConvexHull(xy)
        poly = xy[h2.vertices]
        edges = np.roll(poly, -1, axis=0) - poly
        ang = np.unique(np.mod(np.arctan2(edges[:, 1], edges[:, 0]), np.pi / 2))
        best = (np.inf, np.eye(2))
        for a in ang:
            c, s = np.cos(a), np.sin(a)
            r = np.array([[c, s], [-s, c]])
            proj = poly @ r.T
            ext = proj.max(axis=0) - proj.min(axis=0)
            area = float(ext[0] * ext[1])
            if area < best[0]:
                best = (area, r)
        return best

    best_vol, best_rot = np.inf, np.eye(3)
    # Unit normals of the hull facets (deduplicated by rounding)
    normals = hull.equations[:, :3]
    normals = np.unique(np.round(normals, 9), axis=0)
    for n in normals:
        n = n / np.linalg.norm(n)
        ref = np.array([1.0, 0.0, 0.0]) if abs(n[0]) < 0.9 else np.array([0.0, 1.0, 0.0])
        u = np.cross(n, ref)
        u /= np.linalg.norm(u)
        w = np.cross(n, u)
        xy = hp @ np.stack([u, w], axis=1)
        _, r2 = min_area_rect(xy)
        # Box frame: rows = axes (in-plane rotated u, w, then n)
        axes = np.vstack([r2 @ np.vstack([u, w]), n[None]])
        proj = hp @ axes.T
        ext = proj.max(axis=0) - proj.min(axis=0)
        vol = float(np.prod(ext))
        if vol < best_vol:
            best_vol, best_rot = vol, axes
    proj = hp @ best_rot.T
    lo, hi = proj.min(axis=0), proj.max(axis=0)
    # Put the shortest extent on the last axis for a deterministic layout
    order = np.argsort(-(hi - lo))
    rot = best_rot[order]
    lo, hi = lo[order], hi[order]
    corners_local = np.array(
        [
            [lo[0] if not (i & 4) else hi[0],
             lo[1] if not (i & 2) else hi[1],
             lo[2] if not (i & 1) else hi[2]]
            for i in range(8)
        ]
    )
    return corners_local @ rot


def parse_visual_geometries(path_or_str: str) -> dict[str, list[dict]]:
    """Per-link ``<visual>`` geometry specs, same format as
    `parse_collision_geometries` but WITHOUT eager mesh loading (the
    ``filename``/``scale`` attributes are returned raw).  Used by the asset
    pipeline when a collision body has no collision geometry and the
    reference falls back to the visual mesh (`jiminy_py/robot.py:602-610`)."""
    if os.path.exists(path_or_str):
        root = ET.parse(path_or_str).getroot()
    else:
        root = ET.fromstring(path_or_str)
    out: dict[str, list[dict]] = {}
    for link in root.findall("link"):
        lname = link.get("name")
        specs = []
        for vis in link.findall("visual"):
            geom = vis.find("geometry")
            if geom is None or len(geom) == 0:
                continue
            g = geom[0]
            rot, pos = _parse_origin(vis.find("origin"))
            spec: dict = {"frame_name": lname, "origin": (rot, pos), "tag": g.tag}
            spec.update({k: v for k, v in g.attrib.items()})
            specs.append(spec)
        if specs:
            out[lname] = specs
    return out


def visual_geom_tuples(path: str, mesh_dirs=()) -> tuple:
    """Hashable display-geometry entries for `Robot.visual_geoms`.

    Parses the URDF's ``<visual>`` elements into static tuples
    ``(link_name, tag, params, rot9, pos3, mesh_path_or_None, scale_or_None)``
    consumed by `viewer.gltf.export_gltf` (reference viewer geometry loading,
    `jiminy_py/viewer/viewer.py`).  Mesh files that cannot be resolved on disk
    are kept with ``mesh_path=None`` (skipped at render time)."""
    urdf_dir = os.path.dirname(os.path.abspath(path))
    out = []
    for link, specs in parse_visual_geometries(path).items():
        for s in specs:
            rot, pos = s["origin"]
            rot9 = tuple(float(x) for x in np.asarray(rot, float).ravel())
            pos3 = tuple(float(x) for x in np.asarray(pos, float))
            tag = s["tag"]
            params: tuple = ()
            mesh_path = None
            scale = None
            if tag == "box":
                params = tuple(float(v) for v in s["size"].split())
            elif tag == "cylinder":
                params = (float(s["radius"]), float(s["length"]))
            elif tag == "sphere":
                params = (float(s["radius"]),)
            elif tag == "mesh":
                if s.get("scale"):
                    scale = tuple(float(x) for x in s["scale"].split())
                try:
                    mesh_path = _resolve_mesh_path(
                        s["filename"], urdf_dir, mesh_dirs
                    )
                except FileNotFoundError:
                    mesh_path = None
            else:
                continue
            out.append((link, tag, params, rot9, pos3, mesh_path, scale))
    # Display fallback: links whose visuals are ALL unresolvable meshes (the
    # big vendor mesh packs are not shipped) fall back to their <collision>
    # primitives — boxes/cylinders/spheres give a faithful silhouette of the
    # real robot where mesh files are absent.
    by_link: dict = {}
    for e in out:
        by_link.setdefault(e[0], []).append(e)
    root = ET.parse(path).getroot() if os.path.exists(path) else ET.fromstring(path)
    result = []
    for link_el in root.findall("link"):
        lname = link_el.get("name")
        entries = by_link.get(lname, [])
        renderable = [
            e for e in entries if not (e[1] == "mesh" and e[5] is None)
        ]
        if renderable:
            result += renderable
            continue
        for col in link_el.findall("collision"):
            geom = col.find("geometry")
            if geom is None or len(geom) == 0:
                continue
            g = geom[0]
            if g.tag == "box":
                params = tuple(float(v) for v in g.get("size").split())
            elif g.tag == "cylinder":
                params = (float(g.get("radius")), float(g.get("length")))
            elif g.tag == "sphere":
                params = (float(g.get("radius")),)
            else:
                continue
            rot, pos = _parse_origin(col.find("origin"))
            result.append(
                (
                    lname,
                    g.tag,
                    params,
                    tuple(float(x) for x in np.asarray(rot, float).ravel()),
                    tuple(float(x) for x in np.asarray(pos, float)),
                    None,
                    None,
                )
            )
    return tuple(result)


def _resolve_mesh_path(filename: str, urdf_dir: str, mesh_dirs=()) -> str:
    """Resolve a URDF mesh reference (``package://...`` or relative path)."""
    cands = []
    if filename.startswith("package://"):
        rel = filename[len("package://") :]
        for base in (*mesh_dirs, urdf_dir):
            cands.append(os.path.join(base, rel))
            # Also try dropping the package name component
            cands.append(os.path.join(base, *rel.split("/")[1:]))
    elif os.path.isabs(filename):
        cands.append(filename)
    else:
        for base in (urdf_dir, *mesh_dirs):
            cands.append(os.path.join(base, filename))
    for c in cands:
        if os.path.exists(c):
            return c
    raise FileNotFoundError(f"mesh '{filename}' not found (tried {cands})")


def parse_collision_geometries(
    path_or_str: str, mesh_dirs=(), links=None
) -> dict[str, list[dict]]:
    """Parse per-link ``<collision>`` geometries from a URDF.

    ``links`` optionally restricts parsing to the named links (so mesh files
    of unrelated links need not be present on disk).

    Role-equivalent to the reference's collision-body pipeline: hardware-file
    ``collisionBodyNames`` designate links whose collision geometry (declared
    in the URDF, loaded through hpp-fcl) is checked against the ground
    (`jiminy_py/robot.py:518`, `engine.cc:3022-3114`).  Returns
    ``{link_name: [collision spec, ...]}`` where each spec is a
    `Robot.build(collision_bodies=...)` dict: geometry kind + parameters +
    ``origin`` (rot, pos) placement in the link frame.  Mesh geometries load
    their vertex cloud eagerly (``points`` key) so downstream stays file-free.
    """
    if os.path.exists(path_or_str):
        root = ET.parse(path_or_str).getroot()
        urdf_dir = os.path.dirname(os.path.abspath(path_or_str))
    else:
        root = ET.fromstring(path_or_str)
        urdf_dir = os.getcwd()
    out: dict[str, list[dict]] = {}
    for link in root.findall("link"):
        lname = link.get("name")
        if links is not None and lname not in links:
            continue
        specs = []
        for col in link.findall("collision"):
            geom = col.find("geometry")
            if geom is None or len(geom) == 0:
                continue
            g = geom[0]
            rot, pos = _parse_origin(col.find("origin"))
            spec: dict = {"frame_name": lname, "origin": (rot, pos)}
            if g.tag == "sphere":
                spec.update(geometry="sphere", radius=float(g.get("radius")))
            elif g.tag == "box":
                spec.update(
                    geometry="box",
                    size=tuple(float(x) for x in g.get("size").split()),
                )
            elif g.tag == "cylinder":
                spec.update(
                    geometry="cylinder",
                    radius=float(g.get("radius")),
                    length=float(g.get("length")),
                )
            elif g.tag == "capsule":
                spec.update(
                    geometry="capsule",
                    radius=float(g.get("radius")),
                    length=float(g.get("length")),
                )
            elif g.tag == "mesh":
                scale_attr = g.get("scale")
                scale = (
                    np.array([float(x) for x in scale_attr.split()])
                    if scale_attr
                    else None
                )
                mesh_path = _resolve_mesh_path(
                    g.get("filename"), urdf_dir, mesh_dirs
                )
                spec.update(
                    geometry="mesh",
                    points=load_mesh_vertices(mesh_path, scale),
                    filename=mesh_path,
                )
            else:
                raise ValueError(
                    f"unsupported collision geometry <{g.tag}> on link {lname}"
                )
            specs.append(spec)
        if specs:
            out[lname] = specs
    return out
