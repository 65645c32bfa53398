"""Fused whole-env-step rollout: the PD controller block traced INTO the
env-step kernel (`Engine.step_rollout_fused` / `BaseEnv.
step_with_fused_controller`) must be bit-identical to the per-period
`step_with_controller` scan (the reference's FunctionalController bridge,
`controller_functor.h:27`) at f64."""

import jax
import jax.numpy as jnp
import numpy as np

from jiminy_tpu.engine.config import (
    EngineOptions,
    IntegratorType,
    StepperOptions,
)
from jiminy_tpu.engine.robot import Robot
from jiminy_tpu.gym import ControlledEnv, PDController
from jiminy_tpu.gym.base import BaseEnv
from jiminy_tpu.models import JointType, build_model


def _arm_robot():
    """Fixed-base 2-dof arm, both joints motorized with encoders (the PD
    block assumes encoder i <-> motor i, as in the reference)."""
    model = build_model(
        "arm2",
        [
            {
                "name": "shoulder",
                "type": JointType.REVOLUTE,
                "parent": -1,
                "axis": np.array([0.0, 1.0, 0.0]),
                "mass": 1.0,
                "com": np.array([0.0, 0.0, -0.2]),
                "inertia": np.eye(3) * 2e-2,
                "position_limit": (np.array([-2.0]), np.array([2.0])),
                "velocity_limit": 20.0,
                "effort_limit": 60.0,
            },
            {
                "name": "elbow",
                "type": JointType.REVOLUTE,
                "parent": 0,
                "axis": np.array([0.0, 1.0, 0.0]),
                "placement": (np.eye(3), np.array([0.0, 0.0, -0.4])),
                "mass": 0.6,
                "com": np.array([0.0, 0.0, -0.15]),
                "inertia": np.eye(3) * 1e-2,
                "position_limit": (np.array([-2.5]), np.array([2.5])),
                "velocity_limit": 25.0,
                "effort_limit": 40.0,
            },
        ],
        [],
    )
    return Robot.build(
        model,
        motors=[{"joint_name": "shoulder"}, {"joint_name": "elbow"}],
        sensors={
            "encoder": [{"joint_name": "shoulder"}, {"joint_name": "elbow"}],
            "effort": [{"motor_name": "shoulder"}, {"motor_name": "elbow"}],
        },
    )


def _pd_env(fast, fused=True):
    opts = EngineOptions(
        use_fast_dynamics=fast,
        stepper=StepperOptions(
            integrator=IntegratorType.RUNGE_KUTTA_4, dt_max=2e-3
        ),
        controller_update_period=0.01,
        sensor_update_period=0.01,
        joint_bounds_mode="penalty",
    )
    base = BaseEnv(_arm_robot(), opts, step_dt=0.04, horizon=100)
    base._sample_state = lambda key: (
        jnp.array([0.3, -0.5], base.engine.dtype),
        jnp.zeros((2,), base.engine.dtype),
    )
    pd = PDController(
        kp=np.array([40.0, 25.0]),
        kd=np.array([0.2, 0.15]),
        target_acceleration_limit=200.0,
    ).setup(base)
    return ControlledEnv(base, pd, use_fused_rollout=fused)


def test_fused_rollout_matches_per_period_path():
    env_fast = _pd_env("always")
    # Reference: SAME fused component engine, but the block scanned per
    # controller period outside the kernel (so the comparison isolates the
    # new in-kernel controller path, not the cdyn-vs-generic core).
    env_ref = _pd_env("always", fused=False)
    assert env_fast.env.engine.supports_fused_rollout

    key = jax.random.PRNGKey(3)
    st_f, obs_f = env_fast.reset(key)
    st_r, obs_r = env_ref.reset(key)
    step_f = jax.jit(env_fast.step)
    step_r = jax.jit(env_ref.step)
    action = jnp.array([0.5, -0.8], env_fast.env.engine.dtype)
    for i in range(10):
        st_f, obs_f, rew_f, te_f, tr_f, _ = step_f(st_f, action)
        st_r, obs_r, rew_r, te_r, tr_r, _ = step_r(st_r, action)
    np.testing.assert_array_equal(np.asarray(st_f.sim.q), np.asarray(st_r.sim.q))
    np.testing.assert_array_equal(np.asarray(st_f.sim.v), np.asarray(st_r.sim.v))
    np.testing.assert_array_equal(
        np.asarray(st_f.blocks["pd_controller"]),
        np.asarray(st_r.blocks["pd_controller"]),
    )
    np.testing.assert_array_equal(
        np.asarray(st_f.sim.command), np.asarray(st_r.sim.command)
    )
    np.testing.assert_array_equal(
        np.asarray(st_f.sim.measurements["encoder"]),
        np.asarray(st_r.sim.measurements["encoder"]),
    )
    # t: the fused path adds n_periods*dt once per env step (one rounding)
    # where the scan adds dt n_periods times — fused is the more accurate sum
    assert abs(float(st_f.sim.t) - float(st_r.sim.t)) < 1e-12
    assert int(st_f.sim.tick) == int(st_r.sim.tick)
    assert int(st_f.sim.stepper.iterations) == int(st_r.sim.stepper.iterations)
    assert float(rew_f) == float(rew_r)
    # The PD actually did something: joints moved toward the integrated target
    assert float(jnp.abs(st_f.sim.v).max()) > 0.0


def test_fused_rollout_batched():
    """Explicitly-batched states go through the same fused path (the bench
    shape: batch-transparent env, no outer vmap)."""
    env = _pd_env("always")
    keys = jax.random.split(jax.random.PRNGKey(0), 4)
    st, obs = jax.vmap(env.reset)(keys)
    step = jax.jit(env.step)
    action = jnp.zeros((4, 2), env.env.engine.dtype)
    for _ in range(3):
        st, obs, rew, te, tr, _ = step(st, action)
    assert st.sim.q.shape == (4, 2)
    assert np.isfinite(np.asarray(st.sim.q)).all()
    # Matches the single-env fused trajectory
    st1, _ = env.reset(keys[1])
    for _ in range(3):
        st1, *_ = step(st1, jnp.zeros((2,), env.env.engine.dtype))
    np.testing.assert_allclose(
        np.asarray(st.sim.q[1]), np.asarray(st1.sim.q), rtol=0, atol=0
    )


def _pd_env_constrained(fused=True):
    """Same arm, but with joint bounds through the PGS solve (constraint
    mode rows) — exercises `make_constrained_rollout_integrator`."""
    opts = EngineOptions(
        use_fast_dynamics="always",
        stepper=StepperOptions(
            integrator=IntegratorType.RUNGE_KUTTA_4, dt_max=2e-3
        ),
        controller_update_period=0.01,
        sensor_update_period=0.01,
        joint_bounds_mode="constraint",
    )
    base = BaseEnv(_arm_robot(), opts, step_dt=0.04, horizon=100)
    base._sample_state = lambda key: (
        jnp.array([0.3, -0.5], base.engine.dtype),
        jnp.zeros((2,), base.engine.dtype),
    )
    pd = PDController(
        kp=np.array([40.0, 25.0]),
        kd=np.array([0.2, 0.15]),
        target_acceleration_limit=200.0,
    ).setup(base)
    return ControlledEnv(base, pd, use_fused_rollout=fused)


def test_constrained_fused_rollout_matches_per_period_path():
    env_fast = _pd_env_constrained()
    env_ref = _pd_env_constrained(fused=False)
    eng = env_fast.env.engine
    assert eng._cdyn is None and eng._cdyn_cm is not None
    assert eng.cset.total_rows > 0
    assert eng.supports_fused_rollout

    key = jax.random.PRNGKey(5)
    st_f, _ = env_fast.reset(key)
    st_r, _ = env_ref.reset(key)
    step_f = jax.jit(env_fast.step)
    step_r = jax.jit(env_ref.step)
    # Drive into the shoulder bound so the PGS rows activate
    action = jnp.array([500.0, 0.0], env_fast.env.engine.dtype)
    for _ in range(8):
        st_f, *_ = step_f(st_f, action)
        st_r, *_ = step_r(st_r, action)
    np.testing.assert_array_equal(np.asarray(st_f.sim.q), np.asarray(st_r.sim.q))
    np.testing.assert_array_equal(np.asarray(st_f.sim.v), np.asarray(st_r.sim.v))
    np.testing.assert_array_equal(
        np.asarray(st_f.sim.lam), np.asarray(st_r.sim.lam)
    )
    np.testing.assert_array_equal(
        np.asarray(st_f.sim.bound_active), np.asarray(st_r.sim.bound_active)
    )
    np.testing.assert_array_equal(
        np.asarray(st_f.blocks["pd_controller"]),
        np.asarray(st_r.blocks["pd_controller"]),
    )
    # The bound actually engaged at some point (lam carries a bound row) and
    # the joint respected its limit
    assert float(np.asarray(st_f.sim.q)[0]) < 2.05


def test_fused_rollout_falls_back_under_model_randomization():
    """With per-env randomized model params the fused kernel can't bake the
    constants — ControlledEnv must fall back to the per-period scan and still
    produce finite physics."""
    from jiminy_tpu.engine.randomization import randomize_model

    env = _pd_env("always")
    base = env.env

    def sample_params(key):
        return randomize_model(
            base.robot.model, key, mass_std=0.1, com_std=0.01
        )

    base._sample_model_params = sample_params
    st, obs = env.reset(jax.random.PRNGKey(1))
    assert st.sim.model_params is not None
    step = jax.jit(env.step)
    for _ in range(3):
        st, obs, r, te, tr, _ = step(st, jnp.zeros((2,), st.sim.q.dtype))
    assert np.isfinite(np.asarray(st.sim.q)).all()


def test_zoh_fused_step_matches_scan():
    """Plain BaseEnv.step (constant command per env step, e.g. the toys) also
    routes through the rollout kernel with a pass-through controller —
    bit-identical to the per-period engine.step scan."""
    def build():
        opts = EngineOptions(
            use_fast_dynamics="always",
            stepper=StepperOptions(
                integrator=IntegratorType.RUNGE_KUTTA_4, dt_max=2e-3
            ),
            controller_update_period=0.01,
            sensor_update_period=0.01,
            joint_bounds_mode="penalty",
        )
        base = BaseEnv(_arm_robot(), opts, step_dt=0.04, horizon=100)
        base._sample_state = lambda key: (
            jnp.array([0.3, -0.5], base.engine.dtype),
            jnp.zeros((2,), base.engine.dtype),
        )
        return base

    env_f = build()
    env_r = build()
    assert env_f.engine.supports_fused_rollout
    env_r.use_fused_rollout = False  # force the per-period scan path

    key = jax.random.PRNGKey(7)
    st_f, _ = env_f.reset(key)
    st_r, _ = env_r.reset(key)
    step_f = jax.jit(env_f.step)
    step_r = jax.jit(env_r.step)
    action = jnp.array([3.0, -2.0], env_f.engine.dtype)
    for _ in range(6):
        st_f, *_ = step_f(st_f, action)
        st_r, *_ = step_r(st_r, action)
    np.testing.assert_array_equal(np.asarray(st_f.sim.q), np.asarray(st_r.sim.q))
    np.testing.assert_array_equal(np.asarray(st_f.sim.v), np.asarray(st_r.sim.v))
    np.testing.assert_array_equal(
        np.asarray(st_f.sim.measurements["encoder"]),
        np.asarray(st_r.sim.measurements["encoder"]),
    )
    assert int(st_f.sim.tick) == int(st_r.sim.tick)
