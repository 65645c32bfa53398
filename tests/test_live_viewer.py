"""Live-viewing protocol: trailing-window glb + seq file + polling page
(VERDICT r4 item 4; reference `viewer/viewer.py:436` live backends and
`envs/generic.py play_interactive`)."""

import json
import os
import urllib.request

import jax
import jax.numpy as jnp
import numpy as np

from jiminy_tpu.envs import make
from jiminy_tpu.viewer import LiveViewer, LiveWrapper
from jiminy_tpu.viewer.gltf import load_glb


def _anim_tmax(glb_path):
    g, bin_ = load_glb(glb_path)
    tmax = 0.0
    for anim in g.get("animations", []):
        for smp in anim["samplers"]:
            acc = g["accessors"][smp["input"]]
            tmax = max(tmax, acc["max"][0])
    return tmax


def test_live_protocol_seq_and_window(tmp_path):
    env = make("pendulum")
    live = LiveViewer(env.robot, str(tmp_path), window=0.5, fps=50.0,
                      refresh_every=1000)
    # Initial publish: seq 1, neutral placeholder
    meta = json.load(open(tmp_path / "live.json"))
    assert meta["seq"] == 1 and meta["glb"] == "live.glb"
    assert (tmp_path / "live.html").exists()

    st, _ = env.reset(jax.random.PRNGKey(0))
    step = jax.jit(env.step)
    for i in range(30):
        st, *_ = step(st, jnp.asarray([0.3]))
        live.push(float(st.sim.t), np.asarray(st.sim.q))
    seq = live.flush()
    meta = json.load(open(tmp_path / "live.json"))
    assert meta["seq"] == seq == 2
    assert meta["n_frames"] > 1
    t1 = _anim_tmax(tmp_path / "live.glb")
    assert t1 > 0.0

    # More frames -> new seq, animation advances, trailing window enforced
    for i in range(30):
        st, *_ = step(st, jnp.asarray([0.3]))
        live.push(float(st.sim.t), np.asarray(st.sim.q))
    live.flush()
    meta2 = json.load(open(tmp_path / "live.json"))
    assert meta2["seq"] == 3
    assert meta2["t_end"] > meta["t_end"]
    # 0.5 s window at pendulum step_dt keeps at most window/dt + 1 frames
    dt = float(st.sim.t) / 60
    assert meta2["n_frames"] <= int(0.5 / dt) + 2

    # The page carries the hot-swap player and the polling protocol
    html = open(tmp_path / "live.html").read()
    for needle in ("__loadGlb", "live.json", "__liveFollow", "loadBuffer"):
        assert needle in html, needle


def test_live_http_server(tmp_path):
    env = make("pendulum")
    live = LiveViewer(env.robot, str(tmp_path))
    url = live.serve()
    assert url.endswith("/live.html")
    base = url.rsplit("/", 1)[0]
    meta = json.loads(urllib.request.urlopen(base + "/live.json").read())
    assert meta["seq"] == 1
    glb = urllib.request.urlopen(base + "/live.glb").read()
    assert glb[:4] == b"glTF"
    live.close()


def test_live_wrapper_streams_from_jit(tmp_path):
    env = make("pendulum")
    live = LiveViewer(env.robot, str(tmp_path), refresh_every=10_000)
    wrapped = LiveWrapper(env, live, every=2)
    st, _ = wrapped.reset(jax.random.PRNGKey(0))
    step = jax.jit(wrapped.step)
    for _ in range(10):
        st, *_ = step(st, jnp.asarray([0.1]))
    jax.block_until_ready(st.sim.q)
    # every=2 -> 5 frames tapped out of the jitted step
    assert len(live._times) == 5
    assert live._times == sorted(live._times)
    live.close()  # final flush publishes them
    meta = json.load(open(tmp_path / "live.json"))
    assert meta["n_frames"] == 5


def test_play_interactive_scripted(tmp_path):
    from jiminy_tpu.gym.gym_adapter import GymnasiumEnv

    genv = GymnasiumEnv(make("pendulum"))
    keys = iter(["a", "d", "a", "q"])
    actions = {"a": np.asarray([0.5]), "d": np.asarray([-0.5])}
    stats = genv.play_interactive(
        key_handler=lambda k: actions.get(k),
        input_fn=lambda: next(keys),
        live_dir=str(tmp_path),
        serve=False,
        seed=0,
    )
    assert stats["steps"] == 3
    meta = json.load(open(tmp_path / "live.json"))
    assert meta["n_frames"] == 3  # one frame per key press
