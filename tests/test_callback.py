"""Host-callback controller/force bridge (reference FunctionalController →
Python functor path, `controller_functor.h:27`): arbitrary numpy controllers
must run inside jit/scan/vmap and match the equivalent jittable controller."""

import jax
import jax.numpy as jnp
import numpy as np

from jiminy_tpu.engine import (
    Engine,
    EngineOptions,
    Robot,
    host_controller,
    host_force,
)
from jiminy_tpu.engine.config import StepperOptions
from jiminy_tpu.models import JointType, build_model


def _pendulum_robot():
    model = build_model(
        "pend",
        [
            {
                "name": "j0",
                "type": JointType.REVOLUTE,
                "parent": -1,
                "axis": np.array([0.0, 1.0, 0.0]),
                "mass": 1.0,
                "com": np.array([0.0, 0.0, -0.5]),
                "inertia": np.eye(3) * 1e-3,
            }
        ],
        [{"name": "tip", "parent": 0, "placement": (np.eye(3), np.array([0.0, 0.0, -1.0]))}],
    )
    return Robot.build(model, motors=[{"joint_name": "j0"}])


def test_host_controller_matches_jittable():
    robot = _pendulum_robot()
    opts = EngineOptions(stepper=StepperOptions(dt_max=1e-3))
    kp, kd, q_t = 20.0, 2.0, 0.7

    def np_pd(t, q, v, meas):
        return np.asarray([kp * (q_t - q[..., 0]) - kd * v[..., 0]]).T.reshape(
            np.shape(t) + (1,)
        )

    eng_h = Engine(robot, opts)
    eng_h.controller = host_controller(np_pd, 1)
    eng_j = Engine(robot, opts)
    eng_j.controller = lambda t, q, v, meas: jnp.stack(
        [kp * (q_t - q[..., 0]) - kd * v[..., 0]], axis=-1
    )

    st_h = eng_h.reset(jnp.array([0.1]))
    st_j = eng_j.reset(jnp.array([0.1]))
    step_h = jax.jit(eng_h.step)
    step_j = jax.jit(eng_j.step)
    for _ in range(50):
        st_h = step_h(st_h)
        st_j = step_j(st_j)
    np.testing.assert_allclose(np.asarray(st_h.q), np.asarray(st_j.q), atol=1e-12)
    np.testing.assert_allclose(np.asarray(st_h.v), np.asarray(st_j.v), atol=1e-12)
    # And the controller actually did something
    assert abs(float(st_h.q[0]) - 0.1) > 1e-3


def test_host_controller_under_vmap():
    robot = _pendulum_robot()
    opts = EngineOptions(stepper=StepperOptions(dt_max=1e-3))

    def np_pd(t, q, v, meas):
        return (5.0 * (0.5 - q[..., 0:1])) - 0.5 * v[..., 0:1]

    eng = Engine(robot, opts)
    eng.controller = host_controller(np_pd, 1)
    q0s = jnp.array([[0.0], [0.2], [0.4]])
    sts = jax.vmap(eng.reset)(q0s)
    step = jax.jit(jax.vmap(eng.step))
    for _ in range(20):
        sts = step(sts)
    qs = np.asarray(sts.q)
    assert qs.shape == (3, 1) and np.isfinite(qs).all()
    assert not np.allclose(qs[0], qs[2])  # distinct initial conditions evolve


def test_host_force_profile():
    robot = _pendulum_robot()
    opts = EngineOptions(stepper=StepperOptions(dt_max=1e-3))
    eng_h = Engine(robot, opts)
    eng_j = Engine(robot, opts)

    def np_wrench(t):
        # Constant world torque about y at the tip
        return np.broadcast_to(
            np.asarray([0.0, 0.5, 0.0, 0.0, 0.0, 0.0]), np.shape(t) + (6,)
        )

    eng_h.register_profile_force("tip", host_force(np_wrench))
    eng_j.register_profile_force(
        "tip", lambda t: jnp.asarray([0.0, 0.5, 0.0, 0.0, 0.0, 0.0])
    )
    st_h = eng_h.reset(jnp.array([0.0]))
    st_j = eng_j.reset(jnp.array([0.0]))
    step_h = jax.jit(eng_h.step)
    step_j = jax.jit(eng_j.step)
    for _ in range(30):
        st_h = step_h(st_h)
        st_j = step_j(st_j)
    np.testing.assert_allclose(np.asarray(st_h.q), np.asarray(st_j.q), atol=1e-12)
    assert abs(float(st_h.q[0])) > 1e-4  # the force moved the pendulum
