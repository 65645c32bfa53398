"""Telemetry: on-device recording, native TLMC codec round trip, HDF5 round
trip, robot-from-log reconstruction (reference `test_simulator.py` log tests)."""

import jax
import jax.numpy as jnp
import numpy as np

from jiminy_tpu.engine import Engine, EngineOptions, Robot
from jiminy_tpu.engine.config import StepperOptions
from jiminy_tpu.models import JointType, build_model
from jiminy_tpu.telemetry import (
    build_robot_from_log,
    extract_trajectory_from_log,
    read_hdf5,
    read_log,
    record_rollout,
    write_hdf5,
    write_log,
)


def _pendulum_engine():
    model = build_model(
        "pendulum",
        [
            {
                "name": "pivot",
                "type": JointType.REVOLUTE,
                "parent": -1,
                "axis": np.array([0.0, 1.0, 0.0]),
                "mass": 1.0,
                "com": np.array([0.0, 0.0, -0.7]),
                "inertia": np.zeros((3, 3)),
            }
        ],
        [{"name": "tip", "parent": 0, "placement": (np.eye(3), np.array([0.0, 0.0, -0.7]))}],
    )
    robot = Robot.build(
        model,
        motors=[{"joint_name": "pivot"}],
        sensors={"encoder": [{"motor_name": "pivot"}]},
    )
    return Engine(robot, EngineOptions(stepper=StepperOptions(dt_max=1e-3)))


def test_record_rollout_columns():
    eng = _pendulum_engine()
    st = eng.reset(jnp.array([0.4]))
    final, log = record_rollout(eng, st, 100)
    assert len(log.time) == 100
    assert abs(log.time[-1] - 0.1) < 1e-9
    q = log.variables["pendulum.currentPositionQ0"]
    assert q.shape == (100,)
    assert abs(q[0] - 0.4) < 1e-2
    enc = log.variables["pendulum.encoder.pivot.Q"]
    np.testing.assert_allclose(enc, q, atol=1e-12)


def test_tlmc_roundtrip(tmp_path):
    eng = _pendulum_engine()
    st = eng.reset(jnp.array([0.4]))
    _, log = record_rollout(eng, st, 50)
    p = str(tmp_path / "log.jtl")
    write_log(p, log)
    log2 = read_log(p)
    assert set(log2.variables) == set(log.variables)
    for k in log.variables:
        np.testing.assert_array_equal(log.variables[k], log2.variables[k])
    assert log2.constants["jiminy_tpu.version"] == log.constants["jiminy_tpu.version"]


def test_hdf5_roundtrip(tmp_path):
    eng = _pendulum_engine()
    st = eng.reset(jnp.array([0.4]))
    _, log = record_rollout(eng, st, 20)
    p = str(tmp_path / "log.h5")
    write_hdf5(p, log)
    log2 = read_hdf5(p)
    for k in log.variables:
        np.testing.assert_array_equal(log.variables[k], log2.variables[k])


def test_build_robot_from_log(tmp_path):
    """The robot embedded in the log rebuilds an identical simulation
    (reference `build_robot_from_log` + trajectory replay round trip)."""
    eng = _pendulum_engine()
    st = eng.reset(jnp.array([0.4]))
    _, log = record_rollout(eng, st, 50)
    p = str(tmp_path / "log.jtl")
    write_log(p, log)
    log2 = read_log(p)
    robot2 = build_robot_from_log(log2)
    assert robot2.model.nq == 1
    assert robot2.motors.names == ("pivot",)
    # Re-simulate: trajectories must match bitwise (same engine options)
    from jiminy_tpu.engine import EngineOptions
    from jiminy_tpu.engine.config import StepperOptions

    eng2 = Engine(robot2, EngineOptions(stepper=StepperOptions(dt_max=1e-3)))
    st2 = eng2.reset(jnp.array([0.4]))
    _, log3 = record_rollout(eng2, st2, 50)
    np.testing.assert_array_equal(
        log.variables["pendulum.currentPositionQ0"],
        log3.variables["pendulum.currentPositionQ0"],
    )


def test_trajectory_interpolation(tmp_path):
    eng = _pendulum_engine()
    st = eng.reset(jnp.array([0.4]))
    _, log = record_rollout(eng, st, 50)
    traj = extract_trajectory_from_log(log)
    assert len(traj) == 50
    s = traj.state_at(0.0105)  # between samples
    q_lo = traj.qs[np.searchsorted(traj.times, 0.0105) - 1]
    q_hi = traj.qs[np.searchsorted(traj.times, 0.0105)]
    assert min(q_lo[0], q_hi[0]) - 1e-12 <= s.q[0] <= max(q_lo[0], q_hi[0]) + 1e-12
    res = traj.resample(np.linspace(traj.times[0], traj.times[-1], 11))
    assert res.qs.shape == (11, 1)


def test_tabbed_figure_interactive_api(tmp_path):
    """Reference-style TabbedFigure: add/select/remove tabs in ONE window
    with a button row, refresh_data in place (reference `jiminy_py/plot.py:162`)."""
    import numpy as np

    from jiminy_tpu.plot import TabbedFigure

    t = np.linspace(0.0, 1.0, 50)
    fig = TabbedFigure(offscreen=True)
    fig.add_tab("A", t, {"sin": np.sin(t), "cos": np.cos(t)})
    fig.add_tab("B", t, {"lin": t, "sq": t**2, "cube": t**3})
    assert fig.tabs == ["A", "B"] and fig.active_tab == "A"
    assert len(fig._buttons) == 2  # clickable tab row exists

    fig.select_tab("B")
    assert fig.active_tab == "B"
    # One subplot per variable on the active tab
    assert len(fig._content_axes()) == 3

    fig.refresh_data("B", t, {"lin": 2 * t, "sq": t, "cube": t})
    p1 = fig.save_tab(str(tmp_path / "b.png"))
    assert (tmp_path / "b.png").exists()

    fig.remove_tab("B")
    assert fig.tabs == ["A"] and fig.active_tab == "A"
    paths = fig.save_all(str(tmp_path / "fig"))
    assert all(__import__("os").path.exists(p) for p in paths)
    fig.close()


def test_log_extraction_helpers(tmp_path):
    """extract_variables / build_robots / extract_trajectories /
    update_sensor_measurements_from_log (reference `jiminy_py/log.py` names)."""
    import jax.numpy as jnp

    from jiminy_tpu.envs import make
    from jiminy_tpu.simulator import Simulator
    from jiminy_tpu.telemetry import (
        build_robots_from_log,
        extract_trajectories_from_log,
        extract_variables_from_log,
        update_sensor_measurements_from_log,
    )

    import glob
    import os

    urdf = sorted(glob.glob(os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "jiminy_tpu", "data", "toys_models", "**", "*.urdf"), recursive=True))[0]
    sim = Simulator.build(urdf)
    log = sim.simulate(0.2, jnp.zeros(sim.engine.robot.model.nq) + 0.3)

    name = sim.engine.robot.name
    cols = extract_variables_from_log(
        log, ["currentPositionQ0"], namespace=name
    )
    assert len(cols) == 1 and cols[0].shape == log.time.shape
    try:
        extract_variables_from_log(log, ["nope"])
        raise AssertionError("expected KeyError")
    except KeyError:
        pass

    robots = build_robots_from_log(log)
    assert len(robots) == 1 and robots[0].model.nq == sim.engine.robot.model.nq
    trajs = extract_trajectories_from_log(log)
    assert list(trajs) == [name]

    sensors_at = update_sensor_measurements_from_log(log)
    mid = float(log.time[len(log.time) // 2])
    snap = sensors_at(mid)
    assert isinstance(snap, dict)
    for stype, arr in snap.items():
        assert arr.ndim == 2


def test_update_sensor_measurements_from_log_real_sensors(tmp_path):
    """Sensor replay on a robot that actually has sensors: column layout
    follows the recorder's canonical sensor/field order and values match the
    recorded columns (reference `update_sensor_measurements_from_log`,
    `log.py:298`)."""
    import glob
    import os

    import jax.numpy as jnp

    from jiminy_tpu.simulator import Simulator
    from jiminy_tpu.telemetry import update_sensor_measurements_from_log

    urdf = sorted(glob.glob(os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "jiminy_tpu", "data", "quadrupedal_robots", "**", "*.urdf"),
        recursive=True))[0]
    sim = Simulator.build(urdf, has_freeflyer=True)
    robot = sim.engine.robot
    assert robot.sensors.groups, "anymal hardware TOML must declare sensors"
    q0 = robot.model.neutral()
    q0 = jnp.asarray(q0).at[2].add(0.6)
    log = sim.simulate(0.1, q0)

    at = update_sensor_measurements_from_log(log)
    assert at.layout, "sensor banks must not be empty on a sensored robot"
    snap = at(float(log.time[-1]))
    for stype, arr in snap.items():
        lay = at.layout[stype]
        assert arr.shape == (len(lay["sensors"]), len(lay["fields"]))
    # Spot-check one recorded column against the bank lookup
    stype = next(iter(at.layout))
    sname = at.layout[stype]["sensors"][0]
    field = at.layout[stype]["fields"][0]
    col = log.variables[f"{robot.name}.{stype}.{sname}.{field}"]
    np.testing.assert_allclose(snap[stype][0, 0], col[-1], atol=1e-12)
