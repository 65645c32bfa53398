"""Engine validation, mirroring the reference's analytic-oracle strategy
(`python/jiminy_py/unit_py/test_simple_pendulum.py`, `test_simple_mass.py`):
simulate with the engine, integrate the same ODE with scipy dopri5 (or closed
form), compare trajectories at the reference tolerance 1e-7 — plus batching
consistency (vmap == single env), which the reference cannot even express."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.integrate import ode

from jiminy_tpu.engine import Engine, EngineOptions, Robot
from jiminy_tpu.engine.config import ContactOptions, IntegratorType, StepperOptions
from jiminy_tpu.models import JointType, build_model

TOLERANCE = 1e-7
GRAV = 9.81


def pendulum_robot(mass=1.5, length=0.8, armature=0.0, **motor_kw):
    model = build_model(
        "pendulum",
        [
            {
                "name": "pivot",
                "type": JointType.REVOLUTE,
                "parent": -1,
                "axis": np.array([0.0, 1.0, 0.0]),
                "mass": mass,
                "com": np.array([0.0, 0.0, -length]),
                "inertia": np.zeros((3, 3)),
            }
        ],
        [{"name": "tip", "parent": 0, "placement": (np.eye(3), np.array([0.0, 0.0, -length]))}],
    )
    motors = [dict({"joint_name": "pivot", "armature": armature}, **motor_kw)]
    return Robot.build(model, motors=motors)


def point_mass_robot(mass=1.0):
    """A point mass on a vertical prismatic joint with a ground contact frame."""
    model = build_model(
        "mass",
        [
            {
                "name": "slider",
                "type": JointType.PRISMATIC,
                "parent": -1,
                "axis": np.array([0.0, 0.0, 1.0]),
                "mass": mass,
                "com": np.zeros(3),
                "inertia": np.zeros((3, 3)),
            }
        ],
        [{"name": "contact", "parent": 0, "placement": (np.eye(3), np.zeros(3))}],
    )
    return Robot.build(model, contact_frames=["contact"])


def scipy_traj(f, y0, ts):
    r = ode(f).set_integrator("dopri5", rtol=1e-12, atol=1e-12, nsteps=100000)
    r.set_initial_value(list(y0), 0.0)
    out = []
    for t in ts:
        r.integrate(t)
        out.append(np.array(r.y))
    return np.array(out)


@pytest.mark.parametrize(
    "integrator", [IntegratorType.RUNGE_KUTTA_4, IntegratorType.RUNGE_KUTTA_DOPRI]
)
def test_pendulum_vs_scipy(integrator):
    robot = pendulum_robot()
    opts = EngineOptions(
        stepper=StepperOptions(integrator=integrator, dt_max=1e-3, tol_abs=1e-10, tol_rel=1e-10)
    )
    eng = Engine(robot, opts)
    st = eng.reset(jnp.array([0.3]))
    _, (ts, qs, vs) = jax.jit(lambda s: eng.simulate(s, 500))(st)
    ref = scipy_traj(lambda t, y: [y[1], -GRAV / 0.8 * np.sin(y[0])], [0.3, 0.0], np.asarray(ts))
    assert np.max(np.abs(np.asarray(qs)[:, 0] - ref[:, 0])) < TOLERANCE


def test_pendulum_armature():
    """Armature adds rotor inertia: qdd = -m g l sin(q) / (m l^2 + Ja) with
    Ja = armature * reduction^2 (reference test_simple_pendulum.py armature test)."""
    arm, red, m, l = 0.5, 2.0, 1.5, 0.8
    robot = pendulum_robot(armature=arm, mechanical_reduction=red)
    eng = Engine(robot, EngineOptions(stepper=StepperOptions(dt_max=1e-3)))
    st = eng.reset(jnp.array([0.3]))
    _, (ts, qs, _) = jax.jit(lambda s: eng.simulate(s, 400))(st)
    inertia = m * l**2 + arm * red**2
    ref = scipy_traj(
        lambda t, y: [y[1], -m * GRAV * l * np.sin(y[0]) / inertia], [0.3, 0.0], np.asarray(ts)
    )
    assert np.max(np.abs(np.asarray(qs)[:, 0] - ref[:, 0])) < TOLERANCE


def test_pendulum_constant_torque():
    robot = pendulum_robot(effort_limit=10.0)
    eng = Engine(robot, EngineOptions(stepper=StepperOptions(dt_max=1e-3)))
    st = eng.reset(jnp.array([0.0]))
    u = 1.7
    _, (ts, qs, _) = jax.jit(lambda s: eng.simulate(s, 300, lambda st: jnp.array([u])))(st)
    m, l = 1.5, 0.8
    ref = scipy_traj(
        lambda t, y: [y[1], (u - m * GRAV * l * np.sin(y[0])) / (m * l**2)],
        [0.0, 0.0],
        np.asarray(ts),
    )
    assert np.max(np.abs(np.asarray(qs)[:, 0] - ref[:, 0])) < TOLERANCE


def test_motor_effort_clamp():
    robot = pendulum_robot(effort_limit=1.0)
    eng = Engine(robot, EngineOptions(stepper=StepperOptions(dt_max=1e-3)))
    st = eng.reset(jnp.array([0.0]))
    st = jax.jit(eng.step)(st, jnp.array([5.0]))
    assert np.allclose(np.asarray(st.u_motor), [1.0])


def test_bouncing_mass_vs_scipy():
    """Spring-damper ground contact: the engine must track the identical
    hybrid-smooth ODE integrated by scipy (reference test_simple_mass.py)."""
    k, nu, m = 1.0e4, 1.0e2, 1.0
    contact = ContactOptions(
        stiffness=k, damping=nu, friction=0.0, transition_eps=0.0, transition_velocity=1e-2
    )
    robot = point_mass_robot(mass=m)
    eng = Engine(
        robot,
        EngineOptions(
            contacts=contact,
            stepper=StepperOptions(
                integrator=IntegratorType.RUNGE_KUTTA_DOPRI, tol_abs=1e-8, tol_rel=1e-8
            ),
        ),
    )
    st = eng.reset(jnp.array([0.1]))
    _, (ts, qs, vs) = jax.jit(lambda s: eng.simulate(s, 600))(st)

    def f(t, y):
        z, vz = y
        fc = max(-(k * z + nu * vz), 0.0) if z < 0 else 0.0
        return [vz, fc / m - GRAV]

    ref = scipy_traj(f, [0.1, 0.0], np.asarray(ts))
    assert np.max(np.abs(np.asarray(qs)[:, 0] - ref[:, 0])) < 1e-6


def test_contact_force_reported():
    robot = point_mass_robot()
    contact = ContactOptions(stiffness=1e4, damping=1e2, friction=0.0, transition_eps=0.0)
    eng = Engine(robot, EngineOptions(contacts=contact, stepper=StepperOptions(dt_max=1e-3)))
    st = eng.reset(jnp.array([-9.81 / 1e4]))  # static equilibrium penetration
    step = jax.jit(eng.step)  # ONE wrapper: `jax.jit(eng.step)` in the loop
    for _ in range(400):      # would retrace every iteration (bound method
        st = step(st)         # identity changes) — 543 s instead of ~2 s.
    f = np.asarray(st.contact_forces)
    assert f.shape == (1, 3)
    # Settled: ground reaction balances gravity
    assert abs(f[0, 2] - 9.81) < 1e-3
    assert abs(float(st.v[0])) < 1e-4


def test_vmap_matches_single():
    robot = pendulum_robot()
    eng = Engine(robot, EngineOptions(stepper=StepperOptions(dt_max=1e-3)))
    q0s = jnp.array([[0.1], [0.5], [-0.7], [1.2]])
    batched_reset = jax.vmap(lambda q: eng.reset(q))
    stb = batched_reset(q0s)
    stepb = jax.jit(jax.vmap(lambda s: eng.step(s)))
    for _ in range(20):
        stb = stepb(stb)
    for i in range(4):
        st = eng.reset(q0s[i])
        step1 = jax.jit(eng.step)
        for _ in range(20):
            st = step1(st)
        assert np.allclose(np.asarray(stb.q[i]), np.asarray(st.q), atol=1e-12)


def test_energy_conservation_double_pendulum():
    """No contact, no friction: total energy drift must be tiny (reference
    `core/unit/engine_sanity_check.cc:45`)."""
    from jiminy_tpu.ops import dynamics as dyn

    model = build_model(
        "double",
        [
            {
                "name": "j1",
                "type": JointType.REVOLUTE,
                "parent": -1,
                "axis": np.array([0.0, 1.0, 0.0]),
                "mass": 1.0,
                "com": np.array([0.0, 0.0, -0.5]),
                "inertia": np.zeros((3, 3)),
            },
            {
                "name": "j2",
                "type": JointType.REVOLUTE,
                "parent": 0,
                "placement": (np.eye(3), np.array([0.0, 0.0, -1.0])),
                "axis": np.array([0.0, 1.0, 0.0]),
                "mass": 1.0,
                "com": np.array([0.0, 0.0, -0.5]),
                "inertia": np.zeros((3, 3)),
            },
        ],
    )
    robot = Robot.build(model)
    eng = Engine(
        robot,
        EngineOptions(
            stepper=StepperOptions(
                integrator=IntegratorType.RUNGE_KUTTA_DOPRI, tol_abs=1e-10, tol_rel=1e-10
            )
        ),
    )
    st = eng.reset(jnp.array([1.0, 0.3]))
    grav = jnp.asarray([0.0, 0.0, -9.81])
    e0 = dyn.kinetic_energy(model, st.q, st.v) + dyn.potential_energy(model, grav, st.q)
    final, (ts, qs, vs) = jax.jit(lambda s: eng.simulate(s, 1000))(st)
    e1 = dyn.kinetic_energy(model, final.q, final.v) + dyn.potential_energy(model, grav, final.q)
    assert abs(float(e1 - e0)) < 1e-6


def test_sensor_measurements_encoder_effort():
    robot_model = pendulum_robot().model
    robot = Robot.build(
        robot_model,
        motors=[{"joint_name": "pivot"}],
        sensors={
            "encoder": [{"motor_name": "pivot"}],
            "effort": [{"motor_name": "pivot"}],
        },
    )
    eng = Engine(robot, EngineOptions(stepper=StepperOptions(dt_max=1e-3)))
    st = eng.reset(jnp.array([0.3]))
    st = jax.jit(eng.step)(st, jnp.array([0.5]))
    enc = np.asarray(st.measurements["encoder"])
    assert np.allclose(enc[0, 0], np.asarray(st.q)[0], atol=1e-12)
    assert np.allclose(enc[0, 1], np.asarray(st.v)[0], atol=1e-12)
    eff = np.asarray(st.measurements["effort"])
    assert np.allclose(eff[0, 0], 0.5, atol=1e-12)


def test_imu_static_gravity():
    """A pendulum held at rest: gyro = 0, accel = -R^T g (specific force)."""
    model = pendulum_robot().model
    robot = Robot.build(model, sensors={"imu": [{"frame_name": "tip"}]})
    eng = Engine(robot, EngineOptions(stepper=StepperOptions(dt_max=1e-3)))
    st = eng.reset(jnp.zeros(1))
    imu = np.asarray(st.measurements["imu"])[0]
    assert np.allclose(imu[:3], 0.0, atol=1e-9)
    assert np.allclose(imu[3:], [0.0, 0.0, 9.81], atol=1e-9)


def test_sensor_delay():
    model = pendulum_robot().model
    delay = 3e-3
    robot = Robot.build(
        model,
        motors=[{"joint_name": "pivot"}],
        sensors={"encoder": [{"motor_name": "pivot", "delay": delay, "delay_interpolation_order": 1}]},
    )
    eng = Engine(robot, EngineOptions(stepper=StepperOptions(dt_max=1e-3)))
    st = eng.reset(jnp.array([0.5]))
    qs, meas = [], []
    step = jax.jit(eng.step)
    for _ in range(12):
        st = step(st)
        qs.append(float(st.q[0]))
        meas.append(float(st.measurements["encoder"][0, 0]))
    # After the ring fills: measurement at step k == true q at step k-3
    for k in range(6, 12):
        assert abs(meas[k] - qs[k - 3]) < 1e-9


def test_sensor_noise_reproducible():
    model = pendulum_robot().model
    robot = Robot.build(
        model,
        motors=[{"joint_name": "pivot"}],
        sensors={"encoder": [{"motor_name": "pivot", "noise_std": 0.01}]},
    )
    eng = Engine(robot, EngineOptions(stepper=StepperOptions(dt_max=1e-3)))
    st1 = eng.reset(jnp.array([0.5]), key=jax.random.PRNGKey(7))
    st2 = eng.reset(jnp.array([0.5]), key=jax.random.PRNGKey(7))
    st3 = eng.reset(jnp.array([0.5]), key=jax.random.PRNGKey(8))
    s1 = jax.jit(eng.step)(st1)
    s2 = jax.jit(eng.step)(st2)
    s3 = jax.jit(eng.step)(st3)
    m1 = np.asarray(s1.measurements["encoder"])
    m2 = np.asarray(s2.measurements["encoder"])
    m3 = np.asarray(s3.measurements["encoder"])
    assert np.array_equal(m1, m2)
    assert not np.array_equal(m1, m3)
    assert abs(m1[0, 0] - float(s1.q[0])) > 1e-5  # noise actually applied


def test_flexibility_joint():
    """A flexible pendulum: flexibility spherical joint with high stiffness
    behaves like the rigid model (reference test_flexible_arm.py limit case)."""
    model = pendulum_robot().model
    robot_rigid = Robot.build(model, motors=[{"joint_name": "pivot"}])
    robot_flex = Robot.build(
        model,
        motors=[{"joint_name": "pivot"}],
        flexibility=[
            {"joint_name": "pivot", "stiffness": 1e6, "damping": 1e2, "inertia": 1e-3}
        ],
    )
    assert robot_flex.model.nq == model.nq + 4
    assert robot_flex.model.nv == model.nv + 3
    eng_r = Engine(robot_rigid, EngineOptions(stepper=StepperOptions(dt_max=1e-3)))
    eng_f = Engine(robot_flex, EngineOptions(stepper=StepperOptions(dt_max=2e-4)))
    st_r = eng_r.reset(jnp.array([0.3]))
    q0_f = jnp.asarray(np.concatenate([[0, 0, 0, 1], [0.3]]))
    st_f = eng_f.reset(q0_f)
    _, (t_r, q_r, _) = jax.jit(lambda s: eng_r.simulate(s, 200))(st_r)
    _, (t_f, q_f, _) = jax.jit(lambda s: eng_f.simulate(s, 200))(st_f)
    assert np.max(np.abs(np.asarray(q_r)[:, 0] - np.asarray(q_f)[:, 4])) < 1e-3


def test_options_roundtrip():
    opts = EngineOptions(stepper=StepperOptions(integrator=IntegratorType.RUNGE_KUTTA_DOPRI))
    d = opts.to_dict()
    opts2 = EngineOptions.from_dict(d)
    assert opts2.stepper.integrator == IntegratorType.RUNGE_KUTTA_DOPRI
    assert opts2.contacts.stiffness == opts.contacts.stiffness


def test_controller_faster_than_sensors():
    """Sensor period = 2x the controller period: measurements refresh on the
    sensor grid only, while the physics advances per controller period and the
    trajectory matches an engine with sensors on every tick (reference supports
    arbitrary GCD-compatible periods, `engine.cc:1892-1940`)."""
    model = pendulum_robot().model
    robot = Robot.build(
        model,
        motors=[{"joint_name": "pivot"}],
        sensors={"encoder": [{"motor_name": "pivot"}]},
    )
    base = dict(stepper=StepperOptions(dt_max=1e-3))
    eng_slow = Engine(
        robot,
        EngineOptions(
            controller_update_period=1e-3, sensor_update_period=2e-3, **base
        ),
    )
    eng_fast = Engine(
        robot,
        EngineOptions(
            controller_update_period=1e-3, sensor_update_period=1e-3, **base
        ),
    )
    assert eng_slow.n_ctrl_per_sensor == 2 and eng_slow.n_sensor_periods == 1
    st_s = eng_slow.reset(jnp.array([0.5]))
    st_f = eng_fast.reset(jnp.array([0.5]))
    step_s = jax.jit(eng_slow.step)
    step_f = jax.jit(eng_fast.step)
    meas_s, meas_f, qs = [], [], []
    for _ in range(8):
        st_s = step_s(st_s)
        st_f = step_f(st_f)
        meas_s.append(float(st_s.measurements["encoder"][0, 0]))
        meas_f.append(float(st_f.measurements["encoder"][0, 0]))
        qs.append(float(st_s.q[0]))
        # Physics identical regardless of the sensor grid
        np.testing.assert_allclose(
            np.asarray(st_s.q), np.asarray(st_f.q), atol=1e-12
        )
    # Odd ticks hold the previous measurement; even ticks match the fast grid
    for k in range(8):
        if (k + 1) % 2 == 0:
            assert abs(meas_s[k] - meas_f[k]) < 1e-12
            assert abs(meas_s[k] - qs[k]) < 1e-12
        else:
            expect = meas_s[k - 1] if k > 0 else 0.5  # reset-primed value
            assert abs(meas_s[k] - expect) < 1e-12
