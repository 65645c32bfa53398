"""Standalone glTF 2.0 (.glb) scene/animation export — the 3D replay backend.

Role-equivalent to the reference's meshcat/panda3d viewers and
`play_trajectories` video recording (`jiminy_py/viewer/viewer.py:436`,
`jiminy_py/viewer/replay.py`), re-designed for a headless TPU pod: instead of
a ZMQ server + browser (meshcat) or an OpenGL context (panda3d), the replay is
written as a self-contained binary glTF file that any glTF 2.0 viewer (three.js
editor, Blender, VS Code, macOS Quick Look, Windows 3D Viewer, <model-viewer>)
plays back — no display, no network, no extra dependencies.

Scene structure: one animated node per joint (world translation + rotation
keyframes sampled from the trajectory), with *static* child nodes for the
bone geometry (the parent->child segment is rigid in the parent joint frame)
and for the contact-point spheres (robot.contact_radii). The ground heightmap
is triangulated once. Everything is packed into a single GLB buffer.
"""

from __future__ import annotations

import json
import struct as _struct
from typing import Any, Optional, Sequence

import numpy as np

__all__ = ["export_gltf", "load_glb", "GltfBuilder"]

_MAGIC = 0x46546C67  # 'glTF'
_CHUNK_JSON = 0x4E4F534A
_CHUNK_BIN = 0x004E4942

_F32 = 5126
_U32 = 5125


# --------------------------------------------------------------------------- #
# Primitive meshes (numpy, +z aligned, centered at the origin)
# --------------------------------------------------------------------------- #
def _uv_sphere(radius: float, n_lat: int = 9, n_lon: int = 12):
    lat = np.linspace(0.0, np.pi, n_lat)
    lon = np.linspace(0.0, 2 * np.pi, n_lon, endpoint=False)
    v, f = [], []
    for i, th in enumerate(lat):
        for ph in lon:
            v.append(
                (
                    radius * np.sin(th) * np.cos(ph),
                    radius * np.sin(th) * np.sin(ph),
                    radius * np.cos(th),
                )
            )
    for i in range(n_lat - 1):
        for j in range(n_lon):
            a = i * n_lon + j
            b = i * n_lon + (j + 1) % n_lon
            c = a + n_lon
            d = b + n_lon
            f.append((a, c, b))
            f.append((b, c, d))
    verts = np.asarray(v, np.float32)
    norms = verts / max(radius, 1e-12)
    return verts, norms.astype(np.float32), np.asarray(f, np.uint32)


def _cylinder(radius: float, length: float, n: int = 12):
    """Closed cylinder along +z, from z=0 to z=length."""
    ph = np.linspace(0.0, 2 * np.pi, n, endpoint=False)
    ring = np.stack([radius * np.cos(ph), radius * np.sin(ph)], -1)
    bot = np.concatenate([ring, np.zeros((n, 1))], -1)
    top = np.concatenate([ring, np.full((n, 1), length)], -1)
    verts = np.concatenate([bot, top, [[0, 0, 0]], [[0, 0, length]]], 0)
    nrm_side = np.concatenate([ring / max(radius, 1e-12), np.zeros((n, 1))], -1)
    norms = np.concatenate([nrm_side, nrm_side, [[0, 0, -1]], [[0, 0, 1]]], 0)
    f = []
    for j in range(n):
        a, b = j, (j + 1) % n
        f.append((a, b, a + n))
        f.append((b, b + n, a + n))
        f.append((2 * n, b, a))  # bottom cap
        f.append((2 * n + 1, a + n, b + n))  # top cap
    return verts.astype(np.float32), norms.astype(np.float32), np.asarray(f, np.uint32)


def _box(sx: float, sy: float, sz: float):
    hx, hy, hz = sx / 2, sy / 2, sz / 2
    verts, norms, faces = [], [], []
    for axis in range(3):
        for sgn in (-1.0, 1.0):
            n = np.zeros(3)
            n[axis] = sgn
            u = np.zeros(3)
            u[(axis + 1) % 3] = 1.0
            w = np.cross(n, u)
            c = n * (hx, hy, hz)[axis]
            du = u * (hx, hy, hz)[(axis + 1) % 3]
            dw = w * (hx, hy, hz)[(np.nonzero(w)[0][0])]
            base = len(verts)
            for su, sw in ((-1, -1), (1, -1), (1, 1), (-1, 1)):
                verts.append(c + su * du + sw * dw)
                norms.append(n)
            faces.append((base, base + 1, base + 2))
            faces.append((base, base + 2, base + 3))
    return (
        np.asarray(verts, np.float32),
        np.asarray(norms, np.float32),
        np.asarray(faces, np.uint32),
    )


def _load_mesh_triangles(path: str, scale=None):
    """(verts, norms, faces) of an OBJ/STL mesh, flat-shaded (host-side).

    Standalone loader (no trimesh in the image): OBJ ``v``/``f`` records
    (polygon fans triangulated), binary/ASCII STL triangle soup.  Vertices
    are duplicated per face with the face normal — robust for viewer use."""
    import os as _os

    ext = _os.path.splitext(path)[1].lower()
    tris = None
    if ext == ".obj":
        vs, faces = [], []
        with open(path, "r", errors="ignore") as f:
            for line in f:
                if line.startswith("v "):
                    p = line.split()
                    vs.append([float(p[1]), float(p[2]), float(p[3])])
                elif line.startswith("f "):
                    idx = [int(tok.split("/")[0]) for tok in line.split()[1:]]
                    idx = [i - 1 if i > 0 else len(vs) + i for i in idx]
                    for k in range(1, len(idx) - 1):
                        faces.append([idx[0], idx[k], idx[k + 1]])
        vs = np.asarray(vs, np.float64)
        tris = vs[np.asarray(faces, np.int64)]
    elif ext == ".stl":
        with open(path, "rb") as f:
            data = f.read()
        if data[:5] == b"solid" and b"facet" in data[:500]:
            verts = []
            for line in data.decode(errors="ignore").splitlines():
                p = line.split()
                if p[:1] == ["vertex"]:
                    verts.append([float(p[1]), float(p[2]), float(p[3])])
            tris = np.asarray(verts, np.float64).reshape(-1, 3, 3)
        else:
            (ntri,) = np.frombuffer(data[80:84], dtype="<u4")
            rec = np.frombuffer(
                data[84 : 84 + 50 * int(ntri)], dtype=np.uint8
            ).reshape(int(ntri), 50)
            floats = rec[:, :48].copy().view("<f4").reshape(int(ntri), 4, 3)
            tris = floats[:, 1:, :].astype(np.float64)
    else:
        raise ValueError(f"unsupported mesh format '{ext}' ({path})")
    if scale is not None:
        tris = tris * np.asarray(scale, np.float64)
    # Flat shading: per-face normal on duplicated vertices
    n = np.cross(tris[:, 1] - tris[:, 0], tris[:, 2] - tris[:, 0])
    ln = np.linalg.norm(n, axis=-1, keepdims=True)
    n = n / np.maximum(ln, 1e-12)
    verts = tris.reshape(-1, 3)
    norms = np.repeat(n, 3, axis=0)
    faces = np.arange(len(verts), dtype=np.uint32).reshape(-1, 3)
    return verts, norms, faces


def _arrow_z(radius: float):
    """Unit arrow along +z anchored at the origin (shaft + widened tip):
    scaled per-frame via a glTF scale channel to visualize force vectors."""
    sv, sn, sf = _cylinder(radius, 1.0)
    sv = sv.copy()
    sv[:, 2] += 0.5  # span 0..1 instead of centered
    tv, tn, tf = _cylinder(radius * 2.2, 0.14)
    tv = tv.copy()
    tv[:, 2] += 0.93
    verts = np.concatenate([sv, tv])
    norms = np.concatenate([sn, tn])
    faces = np.concatenate([sf, tf + len(sv)])
    return verts, norms, faces


def _ground_grid(ground_fn, extent: float, n: int = 33, center=(0.0, 0.0)):
    import jax.numpy as jnp

    xs = np.linspace(center[0] - extent, center[0] + extent, n)
    ys = np.linspace(center[1] - extent, center[1] + extent, n)
    gx, gy = np.meshgrid(xs, ys, indexing="ij")
    xy = np.stack([gx.ravel(), gy.ravel()], -1)
    if ground_fn is None:
        h = np.zeros(len(xy))
        nrm = np.tile([0.0, 0.0, 1.0], (len(xy), 1))
    else:
        h, nrm = ground_fn(jnp.asarray(xy))
        h, nrm = np.asarray(h, np.float64).ravel(), np.asarray(nrm, np.float64)
        nrm = nrm.reshape(-1, 3)
    verts = np.concatenate([xy, h[:, None]], -1).astype(np.float32)
    f = []
    for i in range(n - 1):
        for j in range(n - 1):
            a = i * n + j
            f.append((a, a + n, a + 1))
            f.append((a + 1, a + n, a + n + 1))
    return verts, nrm.astype(np.float32), np.asarray(f, np.uint32)


# --------------------------------------------------------------------------- #
# GLB document builder
# --------------------------------------------------------------------------- #
class GltfBuilder:
    """Incrementally assemble a glTF 2.0 document with one binary buffer."""

    def __init__(self):
        self._bin = bytearray()
        self.doc: dict[str, Any] = {
            "asset": {"version": "2.0", "generator": "jiminy_tpu"},
            "scene": 0,
            "scenes": [{"nodes": []}],
            "nodes": [],
            "meshes": [],
            "materials": [],
            "accessors": [],
            "bufferViews": [],
            "buffers": [],
            "animations": [],
        }
        self._materials: dict[tuple, int] = {}

    # -- low-level -------------------------------------------------------- #
    def _accessor(self, arr: np.ndarray, target: Optional[int] = None) -> int:
        arr = np.ascontiguousarray(arr)
        comp = _F32 if arr.dtype == np.float32 else _U32
        kind = "SCALAR" if arr.ndim == 1 else f"VEC{arr.shape[-1]}"
        off = len(self._bin)
        pad = (-off) % 4
        self._bin.extend(b"\0" * pad)
        off += pad
        self._bin.extend(arr.tobytes())
        view = {"buffer": 0, "byteOffset": off, "byteLength": arr.nbytes}
        if target is not None:
            view["target"] = target
        self.doc["bufferViews"].append(view)
        acc = {
            "bufferView": len(self.doc["bufferViews"]) - 1,
            "componentType": comp,
            "count": int(arr.shape[0]),
            "type": kind,
        }
        if comp == _F32:
            flat = arr.reshape(arr.shape[0], -1)
            acc["min"] = [float(x) for x in flat.min(0)]
            acc["max"] = [float(x) for x in flat.max(0)]
            if arr.ndim == 1:
                acc["min"], acc["max"] = [acc["min"][0]], [acc["max"][0]]
        self.doc["accessors"].append(acc)
        return len(self.doc["accessors"]) - 1

    def material(self, rgba: Sequence[float], metallic=0.1, roughness=0.8) -> int:
        key = tuple(round(float(c), 4) for c in rgba)
        if key not in self._materials:
            self.doc["materials"].append(
                {
                    "pbrMetallicRoughness": {
                        "baseColorFactor": [float(c) for c in rgba],
                        "metallicFactor": metallic,
                        "roughnessFactor": roughness,
                    },
                    "doubleSided": True,
                    **({"alphaMode": "BLEND"} if rgba[3] < 1.0 else {}),
                }
            )
            self._materials[key] = len(self.doc["materials"]) - 1
        return self._materials[key]

    def mesh(self, verts, norms, faces, rgba=(0.5, 0.5, 0.8, 1.0)) -> int:
        verts = np.asarray(verts, np.float32)
        norms = np.asarray(norms, np.float32)
        prim = {
            "attributes": {
                "POSITION": self._accessor(verts, target=34962),
                "NORMAL": self._accessor(norms, target=34962),
            },
            "indices": self._accessor(faces.ravel().astype(np.uint32), target=34963),
            "material": self.material(rgba),
        }
        self.doc["meshes"].append({"primitives": [prim]})
        return len(self.doc["meshes"]) - 1

    def node(
        self,
        name: str,
        mesh: Optional[int] = None,
        translation=None,
        rotation=None,
        scale=None,
        parent: Optional[int] = None,
        root: bool = True,
    ) -> int:
        nd: dict[str, Any] = {"name": name}
        if mesh is not None:
            nd["mesh"] = mesh
        if translation is not None:
            nd["translation"] = [float(x) for x in translation]
        if rotation is not None:
            nd["rotation"] = [float(x) for x in rotation]  # xyzw
        if scale is not None:
            nd["scale"] = [float(x) for x in scale]
        self.doc["nodes"].append(nd)
        idx = len(self.doc["nodes"]) - 1
        if parent is not None:
            self.doc["nodes"][parent].setdefault("children", []).append(idx)
        elif root:
            self.doc["scenes"][0]["nodes"].append(idx)
        return idx

    def animate(
        self,
        channels: Sequence[tuple[int, str, np.ndarray, np.ndarray]],
        name: str = "replay",
    ):
        """channels: (node, path 'translation'|'rotation'|'scale', times (T,),
        values (T,k)) — one shared-clock animation."""
        anim: dict[str, Any] = {"name": name, "samplers": [], "channels": []}
        time_acc: dict[int, int] = {}
        for node, path, times, values in channels:
            tid = id(times)
            if tid not in time_acc:
                time_acc[tid] = self._accessor(np.asarray(times, np.float32))
            anim["samplers"].append(
                {
                    "input": time_acc[tid],
                    "interpolation": "LINEAR",
                    "output": self._accessor(np.asarray(values, np.float32)),
                }
            )
            anim["channels"].append(
                {
                    "sampler": len(anim["samplers"]) - 1,
                    "target": {"node": node, "path": path},
                }
            )
        self.doc["animations"].append(anim)

    def to_glb(self) -> bytes:
        self.doc["buffers"] = [{"byteLength": len(self._bin)}]
        doc = {k: v for k, v in self.doc.items() if v != []}
        js = json.dumps(doc, separators=(",", ":")).encode()
        js += b" " * ((-len(js)) % 4)
        bb = bytes(self._bin) + b"\0" * ((-len(self._bin)) % 4)
        total = 12 + 8 + len(js) + 8 + len(bb)
        out = _struct.pack("<III", _MAGIC, 2, total)
        out += _struct.pack("<II", len(js), _CHUNK_JSON) + js
        out += _struct.pack("<II", len(bb), _CHUNK_BIN) + bb
        return out

    def save(self, path: str) -> str:
        with open(path, "wb") as f:
            f.write(self.to_glb())
        return path


def load_glb(path: str) -> tuple[dict, bytes]:
    """Parse a .glb back into (json document, binary chunk) — used by tests."""
    with open(path, "rb") as f:
        raw = f.read()
    magic, version, total = _struct.unpack_from("<III", raw, 0)
    if magic != _MAGIC or version != 2 or total != len(raw):
        raise ValueError("not a valid GLB container")
    off, doc, blob = 12, None, b""
    while off < len(raw):
        ln, kind = _struct.unpack_from("<II", raw, off)
        off += 8
        chunk = raw[off : off + ln]
        off += ln
        if kind == _CHUNK_JSON:
            doc = json.loads(chunk)
        elif kind == _CHUNK_BIN:
            blob = chunk
    if doc is None:
        raise ValueError("GLB missing JSON chunk")
    return doc, blob


# --------------------------------------------------------------------------- #
# Robot replay -> GLB
# --------------------------------------------------------------------------- #
def _mat_to_quat_np(r: np.ndarray) -> np.ndarray:
    """Rotation matrices (..., 3, 3) -> xyzw quaternions, Shepperd's method."""
    r = np.asarray(r, np.float64)
    batch = r.shape[:-2]
    q = np.zeros(batch + (4,))
    tr = np.trace(r, axis1=-2, axis2=-1)
    # Case selection per element (vectorized via masks)
    m = [[r[..., i, j] for j in range(3)] for i in range(3)]
    c0 = tr > 0
    c1 = (~c0) & (m[0][0] >= m[1][1]) & (m[0][0] >= m[2][2])
    c2 = (~c0) & (~c1) & (m[1][1] >= m[2][2])
    c3 = ~(c0 | c1 | c2)
    s = np.sqrt(np.maximum(tr + 1.0, 0.0)) * 2
    with np.errstate(divide="ignore", invalid="ignore"):
        q0 = np.stack(
            [(m[2][1] - m[1][2]) / s, (m[0][2] - m[2][0]) / s, (m[1][0] - m[0][1]) / s, s / 4],
            -1,
        )
        s1 = np.sqrt(np.maximum(1.0 + m[0][0] - m[1][1] - m[2][2], 0.0)) * 2
        q1 = np.stack(
            [s1 / 4, (m[0][1] + m[1][0]) / s1, (m[0][2] + m[2][0]) / s1,
             (m[2][1] - m[1][2]) / s1],
            -1,
        )
        s2 = np.sqrt(np.maximum(1.0 - m[0][0] + m[1][1] - m[2][2], 0.0)) * 2
        q2 = np.stack(
            [(m[0][1] + m[1][0]) / s2, s2 / 4, (m[1][2] + m[2][1]) / s2,
             (m[0][2] - m[2][0]) / s2],
            -1,
        )
        s3 = np.sqrt(np.maximum(1.0 - m[0][0] - m[1][1] + m[2][2], 0.0)) * 2
        q3 = np.stack(
            [(m[0][2] + m[2][0]) / s3, (m[1][2] + m[2][1]) / s3, s3 / 4,
             (m[1][0] - m[0][1]) / s3],
            -1,
        )
    for c, qq in ((c0, q0), (c1, q1), (c2, q2), (c3, q3)):
        q[c] = qq[c]
    q /= np.maximum(np.linalg.norm(q, axis=-1, keepdims=True), 1e-12)
    # Keep quaternion tracks continuous for interpolation (sign flips)
    return q


def _align_z_quat(d: np.ndarray) -> np.ndarray:
    """xyzw quaternion rotating +z onto direction d (shortest arc)."""
    d = d / max(np.linalg.norm(d), 1e-12)
    z = np.array([0.0, 0.0, 1.0])
    c = float(np.dot(z, d))
    if c > 1.0 - 1e-9:
        return np.array([0.0, 0.0, 0.0, 1.0])
    if c < -1.0 + 1e-9:
        return np.array([1.0, 0.0, 0.0, 0.0])
    ax = np.cross(z, d)
    s = np.sqrt((1 + c) * 2)
    return np.concatenate([ax / s, [s / 2]])


def export_gltf(
    trajectory,
    path: str,
    robot=None,
    fps: float = 25.0,
    ground_fn=None,
    ground_extent: Optional[float] = None,
    bone_radius: Optional[float] = None,
    color=(0.35, 0.45, 0.85, 1.0),
    contact_forces=None,
    force_scale: Optional[float] = None,
    markers: Sequence[dict] = (),
    show_skeleton: Optional[bool] = None,
) -> str:
    """Export a trajectory replay as a self-contained .glb animation.

    `trajectory`: `jiminy_tpu.telemetry.Trajectory` (robot attached or passed
    explicitly). The animation carries per-joint world translation/rotation
    keyframes at `fps`.

    Scene fidelity (reference `viewer/replay.py` feature set):
    - When the robot carries URDF `<visual>` geometry (`robot.visual_geoms`,
      set by the asset loader), the real link shapes — boxes, cylinders,
      spheres, OBJ/STL meshes — are rendered under their animated joints;
      the skeleton bones are then hidden unless `show_skeleton=True`.
    - `contact_forces`: (T, nc, 3) world contact forces sampled at
      `trajectory.times` (defaults to `trajectory.contact_forces`) rendered
      as per-contact arrows whose length follows the force magnitude through
      an animated glTF scale channel; `force_scale` in meters/newton
      (default: auto from the peak force).
    - `markers`: [{"frame_name", "radius", "rgba"}] spheres attached to
      their frame (reference viewer markers).
    """
    import jax.numpy as jnp

    from jiminy_tpu.ops.kinematics import forward_kinematics

    robot = robot or trajectory.robot
    if robot is None:
        raise ValueError("export_gltf needs a robot (trajectory.robot is None)")
    model = robot.model

    times = np.arange(trajectory.times[0], trajectory.times[-1] + 1e-9, 1.0 / fps)
    if len(times) == 0:
        times = np.asarray([trajectory.times[0]])
    qs = np.stack([trajectory.state_at(float(t)).q for t in times])

    kin = forward_kinematics(model, jnp.asarray(qs))
    pos = np.asarray(kin.omi.pos, np.float64)  # (T, nj, 3)
    rot = np.asarray(kin.omi.rot, np.float64)  # (T, nj, 3, 3)
    quat = _mat_to_quat_np(rot)
    # Hemisphere-align consecutive keyframes so LINEAR interpolation stays short
    for k in range(1, quat.shape[0]):
        flip = np.sum(quat[k] * quat[k - 1], axis=-1) < 0
        quat[k][flip] *= -1.0

    # Robot scale heuristics
    span = float(np.ptp(pos.reshape(-1, 3), axis=0).max())
    r_bone = bone_radius if bone_radius is not None else max(0.012, 0.02 * span / 1.5)

    b = GltfBuilder()
    # Ground
    extent = ground_extent if ground_extent is not None else max(2.0, span * 1.5)
    center = pos[..., :2].reshape(-1, 2).mean(0)
    gv, gn, gf = _ground_grid(ground_fn, extent, center=center)
    b.node("ground", mesh=b.mesh(gv, gn, gf, rgba=(0.55, 0.55, 0.5, 1.0)))

    visuals = getattr(robot, "visual_geoms", ()) or ()
    if show_skeleton is None:
        show_skeleton = not visuals

    sphere = _uv_sphere(r_bone * 1.4)
    joint_nodes = []
    t32 = times.astype(np.float32)
    channels = []
    for j in range(model.njoints):
        nd = b.node(
            f"joint/{model.joint_names[j]}",
            mesh=(
                b.mesh(*sphere, rgba=(0.9, 0.55, 0.2, 1.0))
                if show_skeleton
                else None
            ),
            translation=pos[0, j],
            rotation=quat[0, j],
        )
        joint_nodes.append(nd)
        channels.append((nd, "translation", t32, pos[:, j].astype(np.float32)))
        channels.append((nd, "rotation", t32, quat[:, j].astype(np.float32)))
        # Bone to parent: rigid in the PARENT joint frame
        p = model.parents[j]
        if p >= 0 and show_skeleton:
            seg = np.asarray(model.jplacement_pos[j], np.float64)
            ln = float(np.linalg.norm(seg))
            if ln > 1e-6:
                cyl = _cylinder(r_bone, ln)
                b.node(
                    f"bone/{model.joint_names[j]}",
                    mesh=b.mesh(*cyl, rgba=color),
                    rotation=_align_z_quat(seg),
                    parent=joint_nodes[p],
                )

    # URDF <visual> geometry: the real link shapes, rigid children of their
    # animated parent joints (placement = link frame composed with the
    # visual origin).  Repeated primitives/meshes share one glTF mesh.
    mesh_cache: dict = {}
    for link, tag, params, rot9, pos3, mesh_path, scale in visuals:
        if link not in model.frame_names:
            continue
        fidx = model.frame_index(link)
        parent = model.frame_parents[fidx]
        frot = np.asarray(model.fplacement_rot[fidx], np.float64)
        fpos = np.asarray(model.fplacement_pos[fidx], np.float64)
        orot = np.asarray(rot9, np.float64).reshape(3, 3)
        opos = np.asarray(pos3, np.float64)
        vrot = frot @ orot
        vpos = fpos + frot @ opos
        key = (tag, params, mesh_path, scale)
        mid = mesh_cache.get(key)
        if mid is None:
            if tag == "box":
                geom = _box(*params)
            elif tag == "cylinder":
                geom = _cylinder(params[0], params[1])
            elif tag == "sphere":
                geom = _uv_sphere(params[0])
            elif tag == "mesh":
                if mesh_path is None:
                    continue  # mesh file not vendored
                geom = _load_mesh_triangles(mesh_path, scale)
            else:
                continue
            mid = b.mesh(*geom, rgba=color)
            mesh_cache[key] = mid
        b.node(
            f"visual/{link}",
            mesh=mid,
            translation=vpos,
            rotation=_mat_to_quat_np(vrot[None])[0],
            parent=joint_nodes[parent],
        )

    # Contact points: static children of their parent joint
    radii = getattr(robot, "contact_radii", ()) or ()
    contact_frames = tuple(getattr(robot, "contact_frame_indices", ()))
    for k, fidx in enumerate(contact_frames):
        r = radii[k] if k < len(radii) and radii[k] > 0 else r_bone
        fp = np.asarray(model.fplacement_pos[fidx], np.float64)
        b.node(
            f"contact/{model.frame_names[fidx]}",
            mesh=b.mesh(*_uv_sphere(float(r)), rgba=(0.85, 0.2, 0.2, 1.0)),
            translation=fp,
            rotation=_mat_to_quat_np(
                np.asarray(model.fplacement_rot[fidx])[None]
            )[0],
            parent=joint_nodes[model.frame_parents[fidx]],
        )

    # Frame markers (reference viewer markers)
    for mk in markers:
        fidx = model.frame_index(mk["frame_name"])
        b.node(
            f"marker/{mk['frame_name']}",
            mesh=b.mesh(
                *_uv_sphere(float(mk.get("radius", r_bone * 1.6))),
                rgba=tuple(mk.get("rgba", (0.2, 0.85, 0.3, 1.0))),
            ),
            translation=np.asarray(model.fplacement_pos[fidx], np.float64),
            rotation=_mat_to_quat_np(
                np.asarray(model.fplacement_rot[fidx])[None]
            )[0],
            parent=joint_nodes[model.frame_parents[fidx]],
        )

    # Contact-force arrows: world-frame nodes animated in translation
    # (contact position), rotation (force direction) and scale (magnitude).
    if contact_forces is None:
        contact_forces = getattr(trajectory, "contact_forces", None)
    if contact_forces is not None and len(contact_frames):
        from jiminy_tpu.ops.kinematics import frame_placement

        forces = np.asarray(contact_forces, np.float64)
        if forces.shape[-1] == 6:
            forces = forces[..., 3:6]  # (ang, lin) wrench -> linear force
        # Resample from trajectory.times onto the fps grid
        tt = np.asarray(trajectory.times, np.float64)
        f_fps = np.stack(
            [
                np.stack(
                    [np.interp(times, tt, forces[:, c, i]) for i in range(3)],
                    axis=-1,
                )
                for c in range(forces.shape[1])
            ],
            axis=1,
        )  # (T, nc, 3)
        mag = np.linalg.norm(f_fps, axis=-1)
        peak = float(mag.max())
        fscale = (
            force_scale
            if force_scale is not None
            else (0.6 * max(span, 0.5) / peak if peak > 0 else 0.0)
        )
        arrow = _arrow_z(max(0.006, r_bone * 0.5))
        for c, fidx in enumerate(contact_frames):
            # `kin` is already batched over the fps keyframes
            cpos = np.asarray(frame_placement(model, kin, fidx).pos, np.float64)
            dirs = f_fps[:, c] / np.maximum(mag[:, c][:, None], 1e-12)
            quats = np.stack([_align_z_quat(d) for d in dirs])
            scales = np.stack(
                [
                    np.ones(len(times)),
                    np.ones(len(times)),
                    np.maximum(mag[:, c] * fscale, 1e-6),
                ],
                axis=-1,
            )
            nd = b.node(
                f"force/{model.frame_names[fidx]}",
                mesh=b.mesh(*arrow, rgba=(0.95, 0.35, 0.1, 1.0)),
                translation=cpos[0],
                rotation=quats[0],
                scale=scales[0],
            )
            channels.append((nd, "translation", t32, cpos.astype(np.float32)))
            channels.append((nd, "rotation", t32, quats.astype(np.float32)))
            channels.append((nd, "scale", t32, scales.astype(np.float32)))

    if len(times) > 1:
        b.animate(channels)
    return b.save(path)
