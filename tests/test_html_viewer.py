"""Standalone HTML replay export (viewer backend; reference meshcat-browser
replay scope, `jiminy_py/viewer/meshcat/` + `replay.py play_trajectories`):
the exported file must be self-contained (no external assets) and embed a
structurally valid animated GLB."""

import base64
import json
import re
import struct

import numpy as np

from jiminy_tpu.envs import make
from jiminy_tpu.telemetry.trajectory import Trajectory
from jiminy_tpu.viewer import export_gltf, export_html


def _extract_glb(html: str) -> bytes:
    m = re.search(r'start\("([A-Za-z0-9+/=]+)"\)', html)
    assert m, "no embedded base64 GLB payload"
    return base64.b64decode(m.group(1))


def _parse_glb(glb: bytes):
    magic, version, length = struct.unpack("<III", glb[:12])
    assert magic == 0x46546C67 and version == 2 and length == len(glb)
    jlen, jtype = struct.unpack("<II", glb[12:20])
    assert jtype == 0x4E4F534A
    doc = json.loads(glb[20 : 20 + jlen])
    off = 20 + jlen
    blen, btype = struct.unpack("<II", glb[off : off + 8])
    assert btype == 0x004E4942
    return doc, glb[off + 8 : off + 8 + blen]


def test_export_html_pendulum(tmp_path):
    env = make("pendulum")
    robot = env.engine.robot
    times = np.linspace(0.0, 1.0, 26)
    qs = np.stack([np.full(robot.nq, np.sin(3 * t)) for t in times])
    traj = Trajectory(times=times, qs=qs, robot=robot)

    path = str(tmp_path / "replay.html")
    out = export_html(traj, path, fps=20.0, title="pendulum replay")
    assert out == path
    html = open(path).read()

    # Self-contained: no external scripts/stylesheets/fetches
    assert "<script src" not in html and "http://" not in html
    assert "https://" not in html
    assert "pendulum replay" in html
    # Player chrome present
    for marker in ('id="view"', 'id="time"', 'id="play"', 'id="speed"',
                   "parseGlb", "requestAnimationFrame"):
        assert marker in html, marker

    doc, blob = _parse_glb(_extract_glb(html))
    assert doc["asset"]["version"] == "2.0"
    assert doc["buffers"][0]["byteLength"] <= len(blob)
    assert len(doc.get("animations", [])) == 1
    assert len(doc["animations"][0]["channels"]) == 2 * robot.model.njoints


def test_export_html_from_glb_file(tmp_path):
    env = make("cartpole")
    robot = env.engine.robot
    times = np.linspace(0.0, 0.5, 6)
    qs = np.zeros((6, robot.nq))
    qs[:, 0] = np.linspace(0.0, 0.3, 6)
    traj = Trajectory(times=times, qs=qs, robot=robot)
    glb_path = str(tmp_path / "a.glb")
    export_gltf(traj, glb_path, fps=10.0)

    html_path = str(tmp_path / "a.html")
    export_html(glb_path, html_path)
    glb = _extract_glb(open(html_path).read())
    assert glb == open(glb_path, "rb").read()


def test_simulator_replay_html(tmp_path):
    from jiminy_tpu.simulator import Simulator

    env = make("pendulum")
    sim = Simulator(env.engine.robot)
    q0 = np.array(env.engine.robot.model.neutral())
    sim.start(q0)
    sim.simulate(0.2, q0)
    path = str(tmp_path / "replay.html")
    assert sim.replay(output_path=path) == path
    doc, blob = _parse_glb(_extract_glb(open(path).read()))
    assert any(n["name"] == "ground" for n in doc["nodes"])
