"""glTF replay export (viewer backend): structural validation of the GLB
container + animation against a real simulated trajectory (reference viewer
`play_trajectories`/video-record scope, `jiminy_py/viewer/replay.py`)."""

import json

import numpy as np

from jiminy_tpu.envs import make
from jiminy_tpu.telemetry.trajectory import Trajectory
from jiminy_tpu.viewer import export_gltf, load_glb

_F32, _U32 = 5126, 5125
_NCOMP = {"SCALAR": 1, "VEC2": 2, "VEC3": 3, "VEC4": 4}


def _validate_glb(doc, blob):
    """Minimal structural glTF 2.0 validator (accessor/view/buffer bounds)."""
    assert doc["asset"]["version"] == "2.0"
    assert doc["buffers"][0]["byteLength"] <= len(blob)
    for view in doc["bufferViews"]:
        assert view["byteOffset"] + view["byteLength"] <= len(blob)
    for acc in doc["accessors"]:
        view = doc["bufferViews"][acc["bufferView"]]
        itemsize = 4  # f32/u32 only
        assert acc["count"] * _NCOMP[acc["type"]] * itemsize == view["byteLength"]
    for mesh in doc["meshes"]:
        for prim in mesh["primitives"]:
            pos = doc["accessors"][prim["attributes"]["POSITION"]]
            assert pos["type"] == "VEC3" and pos["componentType"] == _F32
            idx = doc["accessors"][prim["indices"]]
            assert idx["componentType"] == _U32
            # index range within vertex count
            view = doc["bufferViews"][idx["bufferView"]]
            tri = np.frombuffer(
                blob[view["byteOffset"] : view["byteOffset"] + view["byteLength"]],
                np.uint32,
            )
            assert tri.max() < pos["count"]
    for anim in doc.get("animations", []):
        for ch in anim["channels"]:
            assert 0 <= ch["target"]["node"] < len(doc["nodes"])
            smp = anim["samplers"][ch["sampler"]]
            tin = doc["accessors"][smp["input"]]
            out = doc["accessors"][smp["output"]]
            assert tin["count"] == out["count"]
            want = "VEC4" if ch["target"]["path"] == "rotation" else "VEC3"
            assert out["type"] == want


def _accessor_data(doc, blob, idx):
    acc = doc["accessors"][idx]
    view = doc["bufferViews"][acc["bufferView"]]
    raw = blob[view["byteOffset"] : view["byteOffset"] + view["byteLength"]]
    dt = np.float32 if acc["componentType"] == _F32 else np.uint32
    arr = np.frombuffer(raw, dt)
    return arr.reshape(acc["count"], -1)


def test_export_gltf_pendulum_trajectory(tmp_path):
    env = make("pendulum")
    robot = env.engine.robot
    nq = robot.nq
    times = np.linspace(0.0, 2.0, 51)
    qs = np.stack([np.full(nq, np.sin(t)) for t in times])
    traj = Trajectory(times=times, qs=qs, robot=robot)

    path = str(tmp_path / "replay.glb")
    out = export_gltf(traj, path, fps=20.0)
    assert out == path

    doc, blob = load_glb(path)
    _validate_glb(doc, blob)

    # One animated node per joint, with translation+rotation channels
    joint_nodes = [n for n in doc["nodes"] if n["name"].startswith("joint/")]
    assert len(joint_nodes) == robot.model.njoints
    anim = doc["animations"][0]
    assert len(anim["channels"]) == 2 * robot.model.njoints

    # Rotation keyframes are unit quaternions; times span the trajectory
    for ch in anim["channels"]:
        smp = anim["samplers"][ch["sampler"]]
        t = _accessor_data(doc, blob, smp["input"]).ravel()
        assert abs(t[0] - 0.0) < 1e-5 and t[-1] <= 2.0 + 1e-4
        if ch["target"]["path"] == "rotation":
            quat = _accessor_data(doc, blob, smp["output"])
            np.testing.assert_allclose(np.linalg.norm(quat, axis=-1), 1.0, atol=1e-5)


def test_simulator_replay_glb(tmp_path):
    from jiminy_tpu.simulator import Simulator

    env = make("anymal")
    sim = Simulator(env.engine.robot)
    q0 = np.array(env.engine.robot.model.neutral())
    q0[2] = 0.6
    sim.start(q0)
    sim.simulate(0.2, q0)
    path = str(tmp_path / "anymal.glb")
    sim.replay(output_path=path)
    doc, blob = load_glb(path)
    _validate_glb(doc, blob)
    names = json.dumps([n["name"] for n in doc["nodes"]])
    assert "ground" in names and "contact/" in names
    # Real ANYmal carries URDF visual geometry, which replaces the skeleton
    assert "visual/" in names and "bone/" not in names


def test_export_gltf_visuals_forces_markers(tmp_path):
    """Scene-fidelity pass: URDF visual geometry rendered under the animated
    joints, per-contact force arrows animated via scale channels, and frame
    markers (reference viewer/replay.py feature scope)."""
    import jax

    env = make("anymal")
    robot = env.robot
    assert robot.visual_geoms  # asset loader attached URDF visuals
    st, _ = env.reset(jax.random.PRNGKey(0))
    qs, ts, fs = [], [], []
    import jax.numpy as jnp

    step = jax.jit(env.step)
    for _ in range(6):
        st, *_ = step(st, jnp.zeros((env.action_size,)))
        ts.append(float(st.sim.t))
        qs.append(np.asarray(st.sim.q))
        fs.append(np.asarray(st.sim.contact_forces))
    traj = Trajectory(
        times=np.asarray(ts),
        qs=np.stack(qs),
        robot=robot,
        contact_forces=np.stack(fs),
    )
    path = str(tmp_path / "anymal.glb")
    export_gltf(
        traj, path, fps=10.0,
        markers=[{"frame_name": robot.model.frame_names[-1], "radius": 0.03}],
    )
    doc, blob = load_glb(path)
    _validate_glb(doc, blob)
    names = [nd.get("name", "") for nd in doc["nodes"]]
    n_visual = sum(1 for n in names if n.startswith("visual/"))
    n_force = sum(1 for n in names if n.startswith("force/"))
    n_marker = sum(1 for n in names if n.startswith("marker/"))
    assert n_visual >= 10  # real link shapes present
    assert n_force == len(robot.contact_frame_indices)
    assert n_marker == 1
    assert not any(n.startswith("bone/") for n in names)  # skeleton hidden
    # Scale channels animate the arrows
    scale_ch = [
        ch
        for anim in doc["animations"]
        for ch in anim["channels"]
        if ch["target"]["path"] == "scale"
    ]
    assert len(scale_ch) == n_force
    # Standing robot: some contact force arrow has nonzero length
    anim = doc["animations"][0]
    lens = []
    for ch in scale_ch:
        out = _accessor_data(doc, blob, anim["samplers"][ch["sampler"]]["output"])
        lens.append(out[:, 2].max())
    assert max(lens) > 1e-4


def test_export_gltf_mesh_visuals(tmp_path):
    """OBJ/STL visual meshes (vendored cassie toe STLs) load with triangles."""
    import jax

    env = make("cassie")
    robot = env.robot
    has_mesh = any(
        vg[1] == "mesh" and vg[5] is not None for vg in robot.visual_geoms
    )
    st, _ = env.reset(jax.random.PRNGKey(0))
    traj = Trajectory(
        times=np.asarray([0.0]), qs=np.asarray(st.sim.q)[None], robot=robot
    )
    path = str(tmp_path / "cassie.glb")
    export_gltf(traj, path)
    doc, blob = load_glb(path)
    _validate_glb(doc, blob)
    names = [nd.get("name", "") for nd in doc["nodes"]]
    # Cassie ships only its two toe meshes; other links' visuals/collisions
    # are unvendored meshes, so exactly the toes render.
    assert sum(1 for n in names if n.startswith("visual/")) >= 2
    if has_mesh:
        # Mesh geometry is big: at least one mesh primitive with many verts
        counts = [
            doc["accessors"][p["attributes"]["POSITION"]]["count"]
            for m in doc["meshes"]
            for p in m["primitives"]
        ]
        assert max(counts) > 1000
