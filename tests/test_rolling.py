"""Sphere/Wheel rolling-without-slip constraints (reference
`SphereConstraint`/`WheelConstraint`): a spinning ball/wheel must translate at
v = ω×(r n) with the contact point pinned to the ground."""

import jax
import jax.numpy as jnp
import numpy as np

from jiminy_tpu.engine import Engine, EngineOptions, Robot
from jiminy_tpu.engine.config import StepperOptions
from jiminy_tpu.models import JointType, build_model


def _ball(radius=0.2, rolling_spec=None):
    model = build_model(
        "ball",
        [
            {
                "name": "root_joint",
                "type": JointType.FREE,
                "parent": -1,
                "mass": 1.0,
                "com": np.zeros(3),
                "inertia": np.eye(3) * (2.0 / 5.0) * 1.0 * radius**2,
            }
        ],
        [{"name": "center", "parent": 0, "placement": (np.eye(3), np.zeros(3))}],
    )
    return Robot.build(model, rolling_constraints=[rolling_spec])


def _roll_and_check(rolling_spec, radius=0.2):
    robot = _ball(radius, rolling_spec)
    eng = Engine(robot, EngineOptions(stepper=StepperOptions(dt_max=1e-3)))
    assert eng.cset.n_rolling == 1
    q0 = jnp.asarray([0.0, 0.0, radius, 0.0, 0.0, 0.0, 1.0])
    v0 = jnp.zeros(6).at[4].set(2.0)  # spin about y
    st = eng.reset(q0, v0)
    step = jax.jit(eng.step)
    for _ in range(200):
        st = step(st)
    # Rolling without slip: v_x = omega_y * r (slip decays via Baumgarte)
    quat = st.q[3:7]
    from jiminy_tpu.ops import lie

    rot = lie.quat_to_mat(quat)
    v_world = np.asarray(lie.mv(rot, st.v[0:3]))
    w_world = np.asarray(lie.mv(rot, st.v[3:6]))
    assert abs(v_world[0] - w_world[1] * radius) < 1e-4  # no slip
    # Angular momentum about the contact point is conserved while the
    # constraint absorbs the initial slip: ω' = I/(I + m r²)·ω₀ (= 2/7·ω₀ for a
    # solid sphere), v = ω' r.
    inertia_ratio = 0.4 / 1.4  # I/(I + m r²) with I = (2/5) m r²
    v_expected = inertia_ratio * 2.0 * radius
    # Baumgarte removes the initial slip smoothly (not impulsively), so a bit
    # of momentum leaks relative to the impulsive ideal — allow 25%.
    assert abs(v_world[0] - v_expected) < 0.25 * v_expected + 1e-3
    # Stays on the ground at height r
    assert abs(float(st.q[2]) - radius) < 1e-3
    # It actually travelled (~v * 0.2 s)
    assert float(st.q[0]) > 0.015


def test_sphere_constraint_rolls():
    _roll_and_check({"frame_name": "center", "radius": 0.2})


def test_wheel_constraint_rolls():
    _roll_and_check({"frame_name": "center", "radius": 0.2, "axis": (0.0, 1.0, 0.0)})


def test_fused_rolling_matches_generic():
    """Rolling rows in the fused constrained path (sphere + wheel) match the
    generic array assembly."""
    for spec in (
        {"frame_name": "center", "radius": 0.2},
        {"frame_name": "center", "radius": 0.2, "axis": (0.0, 1.0, 0.0)},
    ):
        robot = _ball(0.2, spec)
        base = dict(stepper=StepperOptions(dt_max=1e-3))
        eng_f = Engine(robot, EngineOptions(use_fast_dynamics="always", **base))
        eng_r = Engine(robot, EngineOptions(use_fast_dynamics=False, **base))
        assert eng_f._cdyn_cm is not None and eng_f.cset.n_rolling == 1
        q0 = jnp.asarray([0.0, 0.0, 0.2, 0.0, 0.0, 0.0, 1.0])
        v0 = jnp.zeros(6).at[4].set(2.0)
        st_f, st_r = eng_f.reset(q0, v0), eng_r.reset(q0, v0)
        step_f, step_r = jax.jit(eng_f.step), jax.jit(eng_r.step)
        for _ in range(150):
            st_f = step_f(st_f)
            st_r = step_r(st_r)
        assert "cstr-rk4" in eng_f._period_runs
        np.testing.assert_allclose(np.asarray(st_f.q), np.asarray(st_r.q), atol=1e-9)
        np.testing.assert_allclose(np.asarray(st_f.v), np.asarray(st_r.v), atol=1e-8)
        np.testing.assert_allclose(
            np.asarray(st_f.lam), np.asarray(st_r.lam), atol=1e-6
        )
