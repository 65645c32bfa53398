"""Multi-robot engine with coupling forces vs the analytic two-mass-spring
system (reference `test_double_spring_mass.py` / `test_multi_robot.py`)."""

import jax
import jax.numpy as jnp
import numpy as np
from scipy.integrate import ode

from jiminy_tpu.engine import EngineOptions, Robot
from jiminy_tpu.engine.config import StepperOptions
from jiminy_tpu.engine.multi import MultiRobotEngine
from jiminy_tpu.models import JointType, build_model


def _mass_robot(name, mass=1.0):
    model = build_model(
        name,
        [
            {
                "name": "pz",
                "type": JointType.PRISMATIC,
                "parent": -1,
                "axis": np.array([0.0, 0.0, 1.0]),
                "mass": mass,
                "com": np.zeros(3),
                "inertia": np.zeros((3, 3)),
            }
        ],
        [{"name": "body", "parent": 0, "placement": (np.eye(3), np.zeros(3))}],
    )
    return Robot.build(model)


def test_double_spring_mass_vs_scipy():
    """Two vertical masses coupled by a viscoelastic spring, gravity off:
    trajectories must match the scipy-integrated 2-dof linear system."""
    m1, m2, k, nu = 1.0, 2.0, 50.0, 0.5
    robots = {"m1": _mass_robot("m1", m1), "m2": _mass_robot("m2", m2)}
    from jiminy_tpu.engine.config import WorldOptions

    opts = EngineOptions(
        world=WorldOptions(gravity=(0.0, 0.0, 0.0)),
        stepper=StepperOptions(dt_max=1e-3),
    )
    eng = MultiRobotEngine(robots, opts)
    eng.register_viscoelastic_coupling_force(
        "m1", "body", "m2", "body", stiffness=k, damping=nu
    )
    states = eng.reset({"m1": jnp.array([0.0]), "m2": jnp.array([0.3])})
    step = jax.jit(eng.step)
    ts, z1s, z2s = [], [], []
    for _ in range(300):
        states = step(states)
        ts.append(float(states["m1"].t))
        z1s.append(float(states["m1"].q[0]))
        z2s.append(float(states["m2"].q[0]))

    def f(t, y):
        z1, v1, z2, v2 = y
        fs = k * (z2 - z1) + nu * (v2 - v1)  # force on m1 (towards m2)
        return [v1, fs / m1, v2, -fs / m2]

    r = ode(f).set_integrator("dopri5", rtol=1e-12, atol=1e-12)
    r.set_initial_value([0.0, 0.0, 0.3, 0.0], 0.0)
    ref = []
    for t in ts:
        r.integrate(t)
        ref.append([r.y[0], r.y[2]])
    ref = np.array(ref)
    assert np.max(np.abs(np.array(z1s) - ref[:, 0])) < 1e-6
    assert np.max(np.abs(np.array(z2s) - ref[:, 1])) < 1e-6


def test_momentum_conservation():
    """Action-reaction: with gravity off, total momentum stays zero."""
    robots = {"a": _mass_robot("a", 1.0), "b": _mass_robot("b", 3.0)}
    from jiminy_tpu.engine.config import WorldOptions

    opts = EngineOptions(
        world=WorldOptions(gravity=(0.0, 0.0, 0.0)),
        stepper=StepperOptions(dt_max=1e-3),
    )
    eng = MultiRobotEngine(robots, opts)
    eng.register_viscoelastic_coupling_force("a", "body", "b", "body", 20.0, 0.0)
    states = eng.reset({"a": jnp.array([0.0]), "b": jnp.array([0.5])})
    step = jax.jit(eng.step)
    for _ in range(100):
        states = step(states)
    p = 1.0 * float(states["a"].v[0]) + 3.0 * float(states["b"].v[0])
    assert abs(p) < 1e-9


def test_multi_simulator_facade():
    """MultiSimulator: build, add_robot, coupling, start/step/simulate
    (reference multi-robot `Simulator.add_robot` workflow)."""
    import jax.numpy as jnp
    import numpy as np

    from jiminy_tpu.simulator import MultiSimulator

    ra = _mass_robot("a")
    rb = _mass_robot("b")
    sim = MultiSimulator({"a": ra})
    sim.add_robot("b", rb)
    sim.register_viscoelastic_coupling_force(
        "a", "body", "b", "body", stiffness=50.0, damping=2.0
    )
    out = sim.simulate(0.2, {"a": jnp.array([0.3]), "b": jnp.array([-0.3])})
    assert set(out) == {"a", "b"}
    qa, qb = out["a"]["q"][:, 0], out["b"]["q"][:, 0]
    assert np.isfinite(qa).all() and np.isfinite(qb).all()
    # spring coupling pulls the two masses toward each other
    assert abs(qa[-1] - qb[-1]) < abs(qa[0] - qb[0])


def test_multi_step_mirrors_engine_step_semantics():
    """MultiRobotEngine.step must mirror Engine.step per tick (ADVICE r2):
    the tick counter advances once per sensor tick, and with no couplings the
    trajectory is bit-identical to the single-robot Engine under the same
    fixed-step integrator."""
    from jiminy_tpu.engine import Engine
    from jiminy_tpu.engine.config import WorldOptions

    opts = EngineOptions(
        world=WorldOptions(gravity=(0.0, 0.0, -9.81)),
        stepper=StepperOptions(dt_max=1e-3),
        controller_update_period=0.01,
    )
    robots = {"a": _mass_robot("a")}
    multi = MultiRobotEngine(robots, opts)
    single = Engine(_mass_robot("a"), opts)

    states = multi.reset({"a": jnp.array([1.0])})
    st = single.reset(jnp.array([1.0]))
    tick0 = int(states["a"].tick)
    for _ in range(3):
        states = multi.step(states)
        st = single.step(st)
    assert int(states["a"].tick) - tick0 == 3 * multi.n_sensor_periods
    np.testing.assert_array_equal(np.asarray(states["a"].q), np.asarray(st.q))
    np.testing.assert_array_equal(np.asarray(states["a"].v), np.asarray(st.v))


def test_multi_dopri_adaptive_coupled():
    """Merged-model formulation inherits the adaptive DOPRI stepper (the old
    per-robot loop was fixed-step only): coupled two-mass system under DOPRI
    matches the scipy oracle."""
    from jiminy_tpu.engine.config import IntegratorType, WorldOptions

    m1, m2, k, nu = 1.0, 2.0, 50.0, 0.5
    robots = {"m1": _mass_robot("m1", m1), "m2": _mass_robot("m2", m2)}
    opts = EngineOptions(
        world=WorldOptions(gravity=(0.0, 0.0, 0.0)),
        stepper=StepperOptions(
            integrator=IntegratorType.RUNGE_KUTTA_DOPRI,
            tol_abs=1e-9, tol_rel=1e-9, dt_max=5e-3,
        ),
    )
    eng = MultiRobotEngine(robots, opts)
    eng.register_viscoelastic_coupling_force(
        "m1", "body", "m2", "body", stiffness=k, damping=nu
    )
    states = eng.reset({"m1": jnp.array([0.0]), "m2": jnp.array([0.3])})
    step = jax.jit(eng.step)
    ts, z1s, z2s = [], [], []
    for _ in range(200):
        states = step(states)
        ts.append(float(states["m1"].t))
        z1s.append(float(states["m1"].q[0]))
        z2s.append(float(states["m2"].q[0]))

    def f(t, y):
        z1, v1, z2, v2 = y
        fs = k * (z2 - z1) + nu * (v2 - v1)
        return [v1, fs / m1, v2, -fs / m2]

    r = ode(f).set_integrator("dopri5", rtol=1e-12, atol=1e-12)
    r.set_initial_value([0.0, 0.0, 0.3, 0.0], 0.0)
    ref = []
    for t in ts:
        r.integrate(t)
        ref.append([r.y[0], r.y[2]])
    ref = np.array(ref)
    assert np.max(np.abs(np.array(z1s) - ref[:, 0])) < 1e-6
    assert np.max(np.abs(np.array(z2s) - ref[:, 1])) < 1e-6


def test_multi_inherits_fused_fast_path():
    """Without couplings the merged engine takes the single-robot fused
    component-wise fast path (forest-rooted models are supported), and the
    trajectory matches per-robot single engines bitwise."""
    from jiminy_tpu.engine import Engine
    from jiminy_tpu.engine.config import WorldOptions

    opts = EngineOptions(
        world=WorldOptions(gravity=(0.0, 0.0, -9.81)),
        stepper=StepperOptions(dt_max=1e-3),
        use_fast_dynamics="always",
    )
    robots = {"a": _mass_robot("a", 1.0), "b": _mass_robot("b", 2.0)}
    multi = MultiRobotEngine(robots, opts)
    assert multi.engine._cdyn is not None  # fused path active on the forest
    states = multi.reset({"a": jnp.array([0.2]), "b": jnp.array([-0.1])})
    singles = {n: Engine(robots[n], opts) for n in robots}
    sts = {
        "a": singles["a"].reset(jnp.array([0.2])),
        "b": singles["b"].reset(jnp.array([-0.1])),
    }
    step_m = jax.jit(multi.step)
    for _ in range(20):
        states = step_m(states)
        sts = {n: singles[n].step(sts[n]) for n in sts}
    for n in robots:
        np.testing.assert_array_equal(
            np.asarray(states[n].q), np.asarray(sts[n].q)
        )
        np.testing.assert_array_equal(
            np.asarray(states[n].v), np.asarray(sts[n].v)
        )


def test_multi_sensors_split_merge_roundtrip():
    """Sensors on both robots: per-robot measurement views match what each
    robot's own engine would measure, and split->merge->split is stable."""
    from jiminy_tpu.engine.config import WorldOptions
    from jiminy_tpu.models import JointType, build_model

    def sens_robot(name):
        model = build_model(
            name,
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
        )
        return Robot.build(
            model,
            motors=[{"joint_name": "pivot"}],
            sensors={
                "encoder": [{"motor_name": "pivot", "delay": 2e-3}],
                "effort": [{"motor_name": "pivot"}],
            },
        )

    opts = EngineOptions(stepper=StepperOptions(dt_max=1e-3))
    robots = {"r1": sens_robot("r1"), "r2": sens_robot("r2")}
    multi = MultiRobotEngine(robots, opts)
    states = multi.reset({"r1": jnp.array([0.3]), "r2": jnp.array([-0.2])})
    step = jax.jit(multi.step)
    for _ in range(10):
        states = step(
            states, {"r1": jnp.array([0.5]), "r2": jnp.array([-0.5])}
        )
    from jiminy_tpu.engine import Engine

    for name, q0, u in (("r1", 0.3, 0.5), ("r2", -0.2, -0.5)):
        single = Engine(robots[name], opts)
        st = single.reset(jnp.array([q0]))
        sstep = jax.jit(single.step)
        for _ in range(10):
            st = sstep(st, jnp.array([u]))
        np.testing.assert_allclose(
            np.asarray(states[name].measurements["encoder"]),
            np.asarray(st.measurements["encoder"]),
            atol=1e-12,
            err_msg=name,
        )
    # Round trip through merge/split is the identity
    merged = multi.merge_states(states)
    again = multi.split_state(merged)
    for name in robots:
        np.testing.assert_array_equal(
            np.asarray(again[name].q), np.asarray(states[name].q)
        )
        np.testing.assert_array_equal(
            np.asarray(again[name].lam), np.asarray(states[name].lam)
        )
