"""Constraint-based dynamics validation: PGS contact (normal + friction cone),
joint-bound constraints, distance loop closures — analytic oracles in the spirit
of the reference `test_simple_mass.py` / `test_foot_pendulum.py`."""

import jax
import jax.numpy as jnp
import numpy as np

from jiminy_tpu.engine import Engine, EngineOptions, Robot
from jiminy_tpu.engine.config import (
    ContactModel,
    ContactOptions,
    IntegratorType,
    StepperOptions,
)
from jiminy_tpu.models import JointType, build_model

GRAV = 9.81


def mass2d_robot():
    """Point mass with x/z prismatic joints and a ground contact frame."""
    model = build_model(
        "mass2d",
        [
            {
                "name": "px",
                "type": JointType.PRISMATIC,
                "parent": -1,
                "axis": np.array([1.0, 0.0, 0.0]),
                "mass": 0.0,
                "com": np.zeros(3),
                "inertia": np.zeros((3, 3)),
            },
            {
                "name": "pz",
                "type": JointType.PRISMATIC,
                "parent": 0,
                "axis": np.array([0.0, 0.0, 1.0]),
                "mass": 1.0,
                "com": np.zeros(3),
                "inertia": np.eye(3) * 1e-3,
            },
        ],
        [{"name": "contact", "parent": 1, "placement": (np.eye(3), np.zeros(3))}],
    )
    return Robot.build(model, contact_frames=["contact"])


def constraint_opts(**kw):
    return EngineOptions(
        contacts=ContactOptions(model=ContactModel.CONSTRAINT, **kw),
        stepper=StepperOptions(integrator=IntegratorType.RUNGE_KUTTA_4, dt_max=1e-3),
    )


def test_drop_and_rest():
    eng = Engine(mass2d_robot(), constraint_opts())
    st = eng.reset(jnp.array([0.0, 0.05]))
    step = jax.jit(eng.step)
    for _ in range(300):
        st = step(st)
    assert abs(float(st.q[1])) < 1e-4  # resting on the surface, not inside it
    assert abs(float(st.v[1])) < 1e-6
    assert abs(float(st.contact_forces[0, 2]) - GRAV) < 1e-6
    assert bool(st.contact_active[0])


def test_static_friction_sticks():
    eng = Engine(mass2d_robot(), constraint_opts(friction=1.0))
    eng.external_force_fn = lambda t, q, v: jnp.zeros((2, 6), q.dtype).at[1, 3].set(5.0)
    st = eng.reset(jnp.array([0.0, 0.0]))
    step = jax.jit(eng.step)
    for _ in range(200):
        st = step(st)
    assert abs(float(st.q[0])) < 1e-4
    assert abs(float(st.v[0])) < 1e-3


def test_kinetic_friction_slides():
    """F > µN: a = (F - µ m g)/m exactly (cone saturated)."""
    eng = Engine(mass2d_robot(), constraint_opts(friction=1.0))
    eng.external_force_fn = lambda t, q, v: jnp.zeros((2, 6), q.dtype).at[1, 3].set(15.0)
    st = eng.reset(jnp.array([0.0, 0.0]))
    step = jax.jit(eng.step)
    n = 200
    for _ in range(n):
        st = step(st)
    t = n * 1e-3
    a_ref = (15.0 - 1.0 * GRAV) / 1.0
    assert abs(float(st.v[0]) - a_ref * t) < 1e-3
    assert abs(float(st.q[0]) - 0.5 * a_ref * t**2) < 1e-4


def test_joint_bound_constraint():
    """Pendulum driven into its position limit stops there (λ >= 0 one-sided)."""
    model = build_model(
        "bounded",
        [
            {
                "name": "pivot",
                "type": JointType.REVOLUTE,
                "parent": -1,
                "axis": np.array([0.0, 1.0, 0.0]),
                "mass": 1.0,
                "com": np.array([0.0, 0.0, -0.5]),
                "inertia": np.zeros((3, 3)),
                "position_limit": (np.array([-0.4]), np.array([0.4])),
            }
        ],
    )
    robot = Robot.build(model, motors=[{"joint_name": "pivot", "effort_limit": 100.0}])
    eng = Engine(robot, constraint_opts())
    st = eng.reset(jnp.array([0.0]))
    step = jax.jit(eng.step)
    for _ in range(500):
        st = step(st, jnp.array([3.0]))  # constant torque pushing up
    q = float(st.q[0])
    assert q < 0.405  # cannot pass the limit (small Baumgarte overshoot allowed)
    assert q > 0.39  # did reach it
    assert abs(float(st.v[0])) < 1e-2


def test_distance_loop_constraint():
    """Double pendulum with tip tethered to a world anchor: the distance must
    stay at its initial value (reference DistanceConstraint, e.g. Cassie)."""
    l1 = l2 = 0.5
    model = build_model(
        "double",
        [
            {
                "name": "j1",
                "type": JointType.REVOLUTE,
                "parent": -1,
                "axis": np.array([0.0, 1.0, 0.0]),
                "mass": 1.0,
                "com": np.array([0.0, 0.0, -l1]),
                "inertia": np.zeros((3, 3)),
            },
            {
                "name": "j2",
                "type": JointType.REVOLUTE,
                "parent": 0,
                "placement": (np.eye(3), np.array([0.0, 0.0, -l1])),
                "axis": np.array([0.0, 1.0, 0.0]),
                "mass": 1.0,
                "com": np.array([0.0, 0.0, -l2]),
                "inertia": np.zeros((3, 3)),
            },
        ],
        [
            {"name": "tip", "parent": 1, "placement": (np.eye(3), np.array([0.0, 0.0, -l2]))},
            {"name": "anchor", "parent": -1, "placement": (np.eye(3), np.array([0.3, 0.0, 0.0]))},
        ],
    )
    robot = Robot.build(model, loop_constraints=[("tip", "anchor")])
    eng = Engine(
        robot,
        EngineOptions(
            stepper=StepperOptions(integrator=IntegratorType.RUNGE_KUTTA_4, dt_max=5e-4)
        ),
    )
    st = eng.reset(jnp.array([0.7, -0.9]))
    d0 = float(st.distance_ref[0])
    from jiminy_tpu.ops.kinematics import forward_kinematics, frame_placement

    step = jax.jit(eng.step)
    for _ in range(500):
        st = step(st)
    kin = forward_kinematics(robot.model, st.q)
    tip = frame_placement(robot.model, kin, robot.model.frame_index("tip")).pos
    anchor = frame_placement(robot.model, kin, robot.model.frame_index("anchor")).pos
    d1 = float(jnp.linalg.norm(tip - anchor))
    assert abs(d1 - d0) < 1e-4  # Baumgarte-bounded drift
    # And it actually moved (it is a pendulum, not frozen)
    assert abs(float(st.q[0]) - 0.7) > 1e-3


def test_constraint_vmap_consistency():
    eng = Engine(mass2d_robot(), constraint_opts())
    q0s = jnp.array([[0.0, 0.03], [0.1, 0.01], [-0.2, 0.08], [0.0, -0.001]])
    stb = jax.vmap(lambda q: eng.reset(q))(q0s)
    stepb = jax.jit(jax.vmap(lambda s: eng.step(s)))
    for _ in range(50):
        stb = stepb(stb)
    st0 = eng.reset(q0s[2])
    step = jax.jit(eng.step)
    for _ in range(50):
        st0 = step(st0)
    assert np.allclose(np.asarray(stb.q[2]), np.asarray(st0.q), atol=1e-12)
    assert np.allclose(
        np.asarray(stb.contact_forces[2]), np.asarray(st0.contact_forces), atol=1e-10
    )
