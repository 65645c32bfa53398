"""End-to-end differentiability of the simulation (beyond-reference feature).

The reference engine is a black-box C++ integrator; here the whole rollout is
a JAX program, so `jax.grad` flows through dynamics, contacts and controller —
the basis for trajectory optimization and analytic policy gradients.  Checked
against central finite differences on a pendulum swing.
"""

import jax
import jax.numpy as jnp
import numpy as np

from jiminy_tpu.engine import Engine, EngineOptions, Robot
from jiminy_tpu.engine.config import IntegratorType, StepperOptions
from jiminy_tpu.models import JointType, build_model


def _pendulum_robot():
    model = build_model(
        "pend_ad",
        [
            {
                "name": "pivot",
                "type": JointType.REVOLUTE,
                "parent": -1,
                "axis": np.array([0.0, 1.0, 0.0]),
                "mass": 1.0,
                "com": np.array([0.0, 0.0, -0.5]),
                "inertia": np.eye(3) * 1e-2,
            }
        ],
        [],
    )
    return Robot.build(model, motors=[{"joint_name": "pivot"}])


def _engine():
    return Engine(
        _pendulum_robot(),
        EngineOptions(
            stepper=StepperOptions(
                integrator=IntegratorType.RUNGE_KUTTA_4, dt_max=2e-3
            ),
            controller_update_period=0.01,
            sensor_update_period=0.01,
            joint_bounds_mode="none",
        ),
    )


def _final_angle(eng, q0_scalar, u_scalar, n_steps=5):
    st = eng.reset(jnp.array([q0_scalar]))
    cmd = jnp.array([u_scalar])

    def body(s, _):
        return eng.step(s, cmd), None

    st, _ = jax.lax.scan(body, st, None, length=n_steps)
    return st.q[0]


def test_grad_through_rollout_matches_finite_differences():
    eng = _engine()
    f = lambda q0, u: _final_angle(eng, q0, u)
    q0, u = 0.3, 0.5
    dq0, du = jax.jit(jax.grad(f, argnums=(0, 1)))(q0, u)
    eps = 1e-6
    fd_q0 = (f(q0 + eps, u) - f(q0 - eps, u)) / (2 * eps)
    fd_u = (f(q0, u + eps) - f(q0, u - eps)) / (2 * eps)
    np.testing.assert_allclose(float(dq0), float(fd_q0), rtol=1e-5)
    np.testing.assert_allclose(float(du), float(fd_u), rtol=1e-5)
    # The dynamics actually depend on both inputs
    assert abs(float(dq0)) > 1e-3 and abs(float(du)) > 1e-3


def test_grad_through_spring_contact():
    """Gradients flow through the spring-damper ground contact: sensitivity
    of the rest height of a dropped mass to its initial height is ~0 (it
    settles), while pre-impact it is ~1 (free fall)."""
    corners = [
        {
            "name": "c0",
            "parent": 0,
            "placement": (np.eye(3), np.array([0.0, 0.0, 0.0])),
        }
    ]
    model = build_model(
        "ball_ad",
        [
            {
                "name": "slide",
                "type": JointType.PRISMATIC,
                "parent": -1,
                "axis": np.array([0.0, 0.0, 1.0]),
                "mass": 1.0,
                "com": np.zeros(3),
                "inertia": np.eye(3) * 1e-3,
            }
        ],
        corners,
    )
    robot = Robot.build(model, contact_frames=["c0"])
    eng = Engine(
        robot,
        EngineOptions(
            stepper=StepperOptions(
                integrator=IntegratorType.RUNGE_KUTTA_4, dt_max=1e-3
            ),
            controller_update_period=0.01,
            sensor_update_period=0.01,
            joint_bounds_mode="none",
        ),
    )

    def final_z(z0, n):
        st = eng.reset(jnp.array([z0]))

        def body(s, _):
            return eng.step(s), None

        st, _ = jax.lax.scan(body, st, None, length=n)
        return st.q[0]

    g_free = float(jax.grad(final_z)(0.5, 3))  # still falling: dz/dz0 = 1
    np.testing.assert_allclose(g_free, 1.0, atol=1e-6)
    g_rest = float(jax.grad(final_z)(0.05, 100))  # settled on the ground
    assert abs(g_rest) < 0.05
