"""Simulator facade, hardware TOML, plotting, viewer (reference
`jiminy_py/unit_py/test_simulator.py` scope)."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from jiminy_tpu.hardware import (
    generate_default_hardware_description_file,
    load_hardware_description_file,
)
from jiminy_tpu.simulator import Simulator

PENDULUM_URDF = """<robot name="pend">
  <link name="base"/>
  <joint name="pivot" type="revolute">
    <parent link="base"/><child link="arm"/>
    <origin xyz="0 0 0"/><axis xyz="0 1 0"/>
    <limit lower="-10" upper="10" effort="20" velocity="50"/>
  </joint>
  <link name="arm">
    <inertial><origin xyz="0 0 -0.5"/><mass value="1.2"/>
      <inertia ixx="0.0" iyy="0.0" izz="0.0" ixy="0" ixz="0" iyz="0"/></inertial>
  </link>
</robot>"""

HARDWARE_TOML = """
has_freeflyer = false

[Global]
contact_frames = []

[Motor.SimpleMotor.pivot]
joint_name = "pivot"
mechanical_reduction = 2.0
armature = 0.01

[Sensor.EncoderSensor.pivot]
motor_name = "pivot"

[Sensor.EffortSensor.pivot]
motor_name = "pivot"
"""


def _write_assets(tmp_path):
    urdf = tmp_path / "pend.urdf"
    urdf.write_text(PENDULUM_URDF)
    hw = tmp_path / "pend_hardware.toml"
    hw.write_text(HARDWARE_TOML)
    return str(urdf), str(hw)


def test_simulator_build_and_simulate(tmp_path):
    urdf, hw = _write_assets(tmp_path)
    sim = Simulator.build(urdf)  # hardware file auto-discovered
    assert sim.robot.nmotors == 1
    assert float(np.asarray(sim.robot.model.armature)[0]) - 0.04 < 1e-9  # 0.01*2^2
    sim.seed(42)
    log = sim.simulate(1.0, jnp.array([0.7]))
    assert len(log.time) == 1000
    q = log.variables["pend.currentPositionQ0"]
    assert abs(q[0] - 0.7) < 0.05 and np.max(np.abs(q)) <= 0.7 + 1e-6


def test_simulator_step_api_and_log(tmp_path):
    urdf, hw = _write_assets(tmp_path)
    sim = Simulator.build(urdf)
    sim.start(jnp.array([0.3]))
    for _ in range(10):
        sim.step(jnp.array([0.0]))
    log = sim.stop()
    assert len(log.time) == 11  # initial snapshot + 10 steps
    p = str(tmp_path / "out.jtl")
    sim._log = log
    sim.write_log(p)
    from jiminy_tpu.telemetry import read_log

    log2 = read_log(p)
    np.testing.assert_allclose(log2.time, log.variables["Global.Time"])


def test_options_export_import(tmp_path):
    urdf, hw = _write_assets(tmp_path)
    sim = Simulator.build(urdf)
    p_toml = str(tmp_path / "opts.toml")
    sim.export_options(p_toml)
    sim.import_options(p_toml)
    p_json = str(tmp_path / "opts.json")
    sim.export_options(p_json)
    sim.import_options(p_json)
    assert sim.engine.options.contacts.stiffness == 1.0e6


def test_generate_default_hardware(tmp_path):
    urdf, _ = _write_assets(tmp_path)
    out = generate_default_hardware_description_file(urdf, str(tmp_path / "gen.toml"))
    hw = load_hardware_description_file(out)
    assert hw["motors"][0]["joint_name"] == "pivot"
    assert "encoder" in hw["sensors"]
    assert "arm" in hw["contact_frames"]


def test_plot_and_viewer(tmp_path):
    urdf, hw = _write_assets(tmp_path)
    sim = Simulator.build(urdf)
    log = sim.simulate(0.2, jnp.array([0.5]))
    figs = sim.plot(save_prefix=str(tmp_path / "fig"))
    assert len(figs.figures) >= 2
    assert os.path.exists(str(tmp_path / "fig_state_positions.png"))

    from jiminy_tpu.telemetry import extract_trajectory_from_log
    from jiminy_tpu.viewer import Viewer

    traj = extract_trajectory_from_log(log)
    v = Viewer(traj.robot)
    frame = v.save_frame(traj.qs[0], str(tmp_path / "frame.png"))
    assert os.path.exists(frame)


def test_render_and_replay(tmp_path):
    urdf, hw = _write_assets(tmp_path)
    sim = Simulator.build(urdf)
    sim.simulate(0.1, jnp.array([0.4]))
    sim.start(jnp.array([0.4]))
    frame = sim.render(str(tmp_path / "frame.png"))
    assert os.path.exists(frame)
    sim._log = sim._log or sim.stop()


def test_spaces_utils():
    import jax
    from jiminy_tpu.gym import spaces

    sp = {"q": spaces.Bounds(jnp.zeros(2), jnp.ones(2))}
    val = spaces.clip(sp, {"q": jnp.asarray([3.0, -2.0])})
    assert bool(spaces.contains(sp, val))
    s = spaces.sample(sp, jax.random.PRNGKey(1))
    assert bool(spaces.contains(sp, s))
