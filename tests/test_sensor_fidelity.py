"""Sensor-fidelity sweep: jitter age distribution, ZOH delay interpolation,
IMU rotation-bias composition, force-sensor wrench summation.

Reference semantics covered: `abstract_sensor.h:67-99` + `abstract_sensor.hxx:
306-400` (delay = delay + U(0, jitter), interpolation order 0/1, ZOH grid
bias), `basic_sensors.cc:142-188` (IMU bias composition), `basic_sensors.cc:
368-387` (force sensor sums contact wrenches on the parent joint).
"""

import jax
import jax.numpy as jnp
import numpy as np

from jiminy_tpu.engine import Engine, EngineOptions, Robot
from jiminy_tpu.engine.config import StepperOptions
from jiminy_tpu.models import JointType, build_model
from jiminy_tpu.ops import lie


def _slider_robot(**sensor_opts):
    """Gravity-free prismatic slider along x: with v0 = 1 the encoder raw
    measurement is exactly Q(t) = t, so a delayed measurement m taken at time
    t reveals the exact measurement age as t - m."""
    model = build_model(
        "slider",
        [
            {
                "name": "slide",
                "type": JointType.PRISMATIC,
                "parent": -1,
                "axis": np.array([1.0, 0.0, 0.0]),
                "mass": 1.0,
                "com": np.zeros(3),
                "inertia": np.eye(3) * 1e-3,
            }
        ],
    )
    return Robot.build(
        model,
        sensors={"encoder": [{"joint_name": "slide", **sensor_opts}]},
    )


def _ages(robot, n_steps=400, seed=0):
    eng = Engine(robot, EngineOptions(stepper=StepperOptions(dt_max=1e-3)))
    st = eng.reset(jnp.zeros(1), v0=jnp.ones(1), key=jax.random.PRNGKey(seed))
    step = jax.jit(eng.step)
    ages = []
    for _ in range(n_steps):
        st = step(st)
        m = float(st.measurements["encoder"][0, 0])  # delayed Q
        ages.append(float(st.t) - m)
    # Discard warm-up while the ring fills
    return np.asarray(ages[50:])


def test_jitter_age_distribution():
    """delay=4 ms, jitter=3 ms, linear interpolation: the measurement age must
    be U(4 ms, 7 ms) — bounds exact, mean/std within statistical tolerance
    (reference `abstract_sensor.hxx:315-317`: delay + uniform(0, jitter))."""
    d0, J = 4e-3, 3e-3
    ages = _ages(_slider_robot(delay=d0, jitter=J))
    assert ages.min() >= d0 - 1e-9
    assert ages.max() <= d0 + J + 1e-9
    # U(a, b): mean (a+b)/2, std (b-a)/sqrt(12); n = 350 samples
    assert abs(ages.mean() - (d0 + J / 2)) < 3 * J / np.sqrt(12 * len(ages))
    assert abs(ages.std() - J / np.sqrt(12)) < 0.15 * J / np.sqrt(12)
    # Spread actually covers the window (not collapsed to a constant)
    assert ages.max() - ages.min() > 0.8 * J


def test_delay_without_jitter_is_constant_age():
    d0 = 5e-3
    ages = _ages(_slider_robot(delay=d0))
    np.testing.assert_allclose(ages, d0, atol=1e-9)


def test_zoh_interpolation_order_0():
    """ZOH (delay_interpolation_order=0) with delay = exactly one update
    period: the measurement must be the grid sample at t - period, every step,
    with no rounding flicker (reference bias shift, abstract_sensor.hxx:327)."""
    period = 1e-3
    robot = _slider_robot(delay=period, delay_interpolation_order=0)
    eng = Engine(robot, EngineOptions(stepper=StepperOptions(dt_max=1e-3)))
    st = eng.reset(jnp.zeros(1), v0=jnp.ones(1))
    step = jax.jit(eng.step)
    for k in range(1, 60):
        st = step(st)
        m = float(st.measurements["encoder"][0, 0])
        expected = max(0.0, (k - 1)) * period  # sample taken one tick ago
        assert abs(m - expected) < 1e-12, (k, m, expected)


def test_zoh_holds_between_grid_points():
    """ZOH with delay = 2.5 periods: the measurement is the newest sample
    OLDER than t - delay (piecewise-constant), i.e. age in [2.5, 3.5) periods
    quantized to the grid."""
    period = 1e-3
    robot = _slider_robot(delay=2.5 * period, delay_interpolation_order=0)
    ages = _ages(robot, n_steps=100)
    # Every age is an exact grid multiple: 3 periods (ceil of 2.5)
    np.testing.assert_allclose(ages, 3 * period, atol=1e-9)


def test_imu_rotation_bias_composition():
    """IMU with a pure rotation bias: measurement = R_b^{-1} @ raw for BOTH
    gyro and accel triplets (reference composes the orientation bias into the
    IMU pose, `basic_sensors.cc:142-188`).  Static tilted pendulum: raw accel
    = -R^T g, gyro = 0."""
    rot_bias = np.array([0.0, 0.0, np.pi / 2])  # 90 deg yaw
    model = build_model(
        "tilt",
        [
            {
                "name": "pivot",
                "type": JointType.REVOLUTE,
                "parent": -1,
                "axis": np.array([0.0, 1.0, 0.0]),
                "mass": 1.0,
                "com": np.array([0.0, 0.0, -0.5]),
                "inertia": np.eye(3) * 1e-3,
            }
        ],
        [{"name": "imu_f", "parent": 0, "placement": (np.eye(3), np.zeros(3))}],
    )
    bias9 = np.concatenate([rot_bias, np.zeros(6)])  # [rot, gyro, accel]
    robot_b = Robot.build(
        model, sensors={"imu": [{"frame_name": "imu_f", "bias": bias9}]}
    )
    robot_0 = Robot.build(model, sensors={"imu": [{"frame_name": "imu_f"}]})
    eng_b = Engine(robot_b, EngineOptions(stepper=StepperOptions(dt_max=1e-3)))
    eng_0 = Engine(robot_0, EngineOptions(stepper=StepperOptions(dt_max=1e-3)))
    q0 = jnp.array([0.4])
    m_b = np.asarray(eng_b.reset(q0).measurements["imu"][0])
    m_0 = np.asarray(eng_0.reset(q0).measurements["imu"][0])
    R_b = np.asarray(lie.exp3_mat(jnp.asarray(rot_bias)))
    np.testing.assert_allclose(m_b[0:3], R_b.T @ m_0[0:3], atol=1e-12)
    np.testing.assert_allclose(m_b[3:6], R_b.T @ m_0[3:6], atol=1e-12)
    # Sanity: the unbiased static accel reads -R^T g with norm |g|
    assert abs(np.linalg.norm(m_0[3:6]) - 9.81) < 1e-9


def test_force_sensor_sums_contact_wrenches():
    """A force sensor at a frame whose parent joint carries TWO contact points
    must report the sum of both contact wrenches transported to the sensor
    frame (reference `basic_sensors.cc:368-387`).  Box resting on two corner
    contacts: total measured Fz = m g, and the moment balances the lever arms."""
    model = build_model(
        "box2",
        [
            {
                "name": "root_joint",
                "type": JointType.FREE,
                "parent": -1,
                "mass": 2.0,
                "com": np.zeros(3),
                "inertia": np.eye(3) * 0.05,
            }
        ],
        [
            {"name": "c_left", "parent": 0,
             "placement": (np.eye(3), np.array([-0.2, 0.0, -0.1]))},
            {"name": "c_right", "parent": 0,
             "placement": (np.eye(3), np.array([0.2, 0.0, -0.1]))},
            {"name": "fsense", "parent": 0,
             "placement": (np.eye(3), np.array([0.0, 0.0, -0.05]))},
        ],
    )
    robot = Robot.build(
        model,
        contact_frames=["c_left", "c_right"],
        sensors={"force": [{"frame_name": "fsense"}]},
    )
    from jiminy_tpu.engine.config import ContactOptions

    eng = Engine(
        robot,
        EngineOptions(
            contacts=ContactOptions(stiffness=5e4, damping=1e3, friction=1.0),
            stepper=StepperOptions(dt_max=5e-4),
        ),
    )
    q0 = jnp.array([0.0, 0.0, 0.099, 0.0, 0.0, 0.0, 1.0])  # slight penetration
    st = eng.reset(q0)
    step = jax.jit(eng.step)
    for _ in range(600):  # settle to rest
        st = step(st)
    assert abs(float(jnp.linalg.norm(st.v))) < 1e-6
    meas = np.asarray(st.measurements["force"][0])  # (FX FY FZ MX MY MZ)
    np.testing.assert_allclose(meas[2], 2.0 * 9.81, rtol=1e-6)
    # Symmetric layout: lateral force and net moment vanish
    np.testing.assert_allclose(meas[[0, 1, 3, 4, 5]], 0.0, atol=1e-6)
    # Cross-check against a direct transport of the engine's contact wrenches
    wrench_local = np.asarray(st.contact_forces)  # world-frame contact forces
    assert wrench_local.shape[0] == 2


def test_contact_sensor_reads_local_force():
    """Contact sensor = LOCAL 3D force at its declared contact frame."""
    model = build_model(
        "drop",
        [
            {
                "name": "pz",
                "type": JointType.PRISMATIC,
                "parent": -1,
                "axis": np.array([0.0, 0.0, 1.0]),
                "mass": 1.5,
                "com": np.zeros(3),
                "inertia": np.eye(3) * 1e-3,
            }
        ],
        [{"name": "foot", "parent": 0, "placement": (np.eye(3), np.zeros(3))}],
    )
    robot = Robot.build(
        model,
        contact_frames=["foot"],
        sensors={"contact": [{"frame_name": "foot"}]},
    )
    from jiminy_tpu.engine.config import ContactOptions

    eng = Engine(
        robot,
        EngineOptions(
            contacts=ContactOptions(stiffness=5e4, damping=1e3, friction=1.0),
            stepper=StepperOptions(dt_max=5e-4),
        ),
    )
    st = eng.reset(jnp.array([-0.001]))
    step = jax.jit(eng.step)
    for _ in range(400):
        st = step(st)
    meas = np.asarray(st.measurements["contact"][0])
    np.testing.assert_allclose(meas[2], 1.5 * 9.81, rtol=1e-6)
