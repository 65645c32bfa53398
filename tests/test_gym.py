"""Gym layer tests: env semantics, pipeline blocks (PD control, Mahony filter),
wrappers, declarative pipeline builder — mirroring the reference's
`test_pipeline_control.py` / `test_pipeline_design.py` strategy."""

import jax
import jax.numpy as jnp
import numpy as np

from jiminy_tpu.envs import make
from jiminy_tpu.gym import (
    ControlledEnv,
    FlattenObservation,
    MahonyFilter,
    NormalizeAction,
    ObservedEnv,
    PDController,
    StackObservation,
    build_pipeline,
)
from jiminy_tpu.gym.base import AutoResetWrapper
from jiminy_tpu.ops import lie


def test_cartpole_balance_termination():
    env = make("cartpole")
    st, obs = env.reset(jax.random.PRNGKey(0))
    assert obs.shape == (4,)
    step = jax.jit(env.step)
    done = False
    for _ in range(200):
        st, obs, r, te, tr, _ = step(st, jnp.array([0.0]))
        assert float(r) == 1.0
        if bool(te):
            done = True
            break
    assert done  # uncontrolled pole falls


def test_cartpole_vmap_rollout():
    env = make("cartpole")
    n = 16
    keys = jax.random.split(jax.random.PRNGKey(1), n)
    st, obs = jax.vmap(env.reset)(keys)
    assert obs.shape == (n, 4)
    step = jax.jit(jax.vmap(env.step))
    for _ in range(10):
        st, obs, r, te, tr, _ = step(st, jnp.zeros((n, 1)))
    assert obs.shape == (n, 4)
    # Different seeds -> different trajectories
    assert not np.allclose(np.asarray(obs[0]), np.asarray(obs[1]))


def test_autoreset():
    env = AutoResetWrapper(make("cartpole", horizon=5))
    st, obs = env.reset(jax.random.PRNGKey(0))
    step = jax.jit(env.step)
    for i in range(20):
        st, obs, r, te, tr, info = step(st, jnp.array([0.0]))
    assert int(st.steps) <= 5  # was auto-reset


def test_pd_controller_tracks_target():
    """PD pipeline on the ANYmal: commanding zero velocity/acceleration holds
    the standing pose (reference test_pipeline_control semantics)."""
    env = make("anymal-pid")
    st, obs = env.reset(jax.random.PRNGKey(0))
    q0 = np.asarray(st.sim.q[7:]).copy()
    step = jax.jit(env.step)
    for _ in range(25):
        st, obs, r, te, tr, _ = step(st, jnp.zeros((env.action_size,)))
    q1 = np.asarray(st.sim.q[7:])
    assert not bool(te)
    assert np.max(np.abs(q1 - q0)) < 0.1  # pose held within 0.1 rad
    assert abs(float(st.sim.q[2]) - 0.53) < 0.1  # base height maintained


def test_mahony_filter_static_convergence():
    """On a (PD-held) static robot the Mahony estimate must converge to the
    true IMU frame attitude.  The real ANYmal mounts its IMU yawed 90 deg on
    the base (anymal.urdf imu_joint rpy="0 0 1.5708"), so the estimate is
    compared against the FK orientation of the sensor frame, not the base."""
    env = make("anymal-pid")
    mah = MahonyFilter(kp=5.0, ki=0.1).setup(env)
    wrapped = ObservedEnv(env, mah)
    st, obs = wrapped.reset(jax.random.PRNGKey(0))
    step = jax.jit(wrapped.step)
    for _ in range(25):
        st, obs, *_ = step(st, jnp.zeros((env.action_size,)))
    quat = np.asarray(obs["features"]["mahony_filter"]["attitude"][0])
    # The true IMU frame orientation from forward kinematics:
    from jiminy_tpu.ops import lie
    from jiminy_tpu.ops.kinematics import forward_kinematics, frame_placement

    model = env.robot.model
    kin = forward_kinematics(model, st.sim.q)
    fidx = env.robot.sensors.imu.frame_indices[0]
    true_quat = np.asarray(lie.mat_to_quat(frame_placement(model, kin, fidx).rot))
    dot = abs(float(np.dot(quat, true_quat)))
    assert dot > 0.999  # within ~2.5 deg


def test_flatten_and_stack_wrappers():
    env = StackObservation(FlattenObservation(make("cartpole")), num_stack=3)
    st, obs = env.reset(jax.random.PRNGKey(0))
    assert obs.shape == (3, 4)
    step = jax.jit(env.step)
    st, obs2, *_ = step(st, jnp.array([1.0]))
    assert obs2.shape == (3, 4)
    assert not np.allclose(np.asarray(obs2[-1]), np.asarray(obs2[0]))


def test_normalize_action():
    env = NormalizeAction(make("cartpole"))
    lo, hi = env.action_bounds()
    assert np.allclose(np.asarray(lo), -1.0) and np.allclose(np.asarray(hi), 1.0)
    st, _ = env.reset(jax.random.PRNGKey(0))
    st, *_ = jax.jit(env.step)(st, jnp.array([0.5]))


def test_build_pipeline_from_config():
    config = {
        "env": {"cls": "jiminy_tpu.envs.anymal:ANYmalEnv", "step_dt": 0.04},
        "layers": [
            {"block": "PDController", "kp": 60.0, "kd": 0.12},
            {"block": "MahonyFilter", "kp": 1.0, "ki": 0.1},
            {"wrapper": "jiminy_tpu.gym.wrappers:FlattenObservation"},
        ],
    }
    env = build_pipeline(config)
    st, obs = env.reset(jax.random.PRNGKey(0))
    assert obs.ndim == 1
    step = jax.jit(env.step)
    st, obs, r, te, tr, _ = step(st, jnp.zeros((env.action_size,)))
    assert obs.ndim == 1
    assert not bool(te)


def test_load_pipeline_toml(tmp_path):
    toml_src = """
[env]
cls = "jiminy_tpu.envs.toys:CartPoleEnv"
step_dt = 0.02

[[layers]]
wrapper = "jiminy_tpu.gym.wrappers:FlattenObservation"
"""
    p = tmp_path / "pipeline.toml"
    p.write_text(toml_src)
    from jiminy_tpu.gym import load_pipeline

    env = load_pipeline(str(p))
    st, obs = env.reset(jax.random.PRNGKey(0))
    assert obs.shape == (4,)


def test_flatten_action():
    """FlattenAction splits a flat vector back into the env's action pytree
    (reference `FlattenAction`)."""
    import jax.tree_util  # noqa: F401

    from jiminy_tpu.gym import FlattenAction

    env = make("cartpole")

    class DictActionEnv:
        def __init__(self, env):
            self.env = env
            self.action_size = env.action_size

        def __getattr__(self, name):
            return getattr(self.env, name)

        def step(self, state, action):
            assert isinstance(action, dict)
            return self.env.step(state, action["force"])

    wrapped = FlattenAction(
        DictActionEnv(env), template={"force": jnp.zeros((1,))}
    )
    assert wrapped.action_size == 1
    st, _ = wrapped.reset(jax.random.PRNGKey(0))
    st, obs, r, te, tr, _ = jax.jit(wrapped.step)(st, jnp.array([0.3]))
    assert obs.shape == (4,)


def test_base_transform_observation_and_action():
    """Custom transform base classes apply on reset AND step (reference
    `BaseTransformObservation/Action`, `bases/pipeline.py:1250+`)."""
    import jax
    import jax.numpy as jnp

    from jiminy_tpu.envs import make
    from jiminy_tpu.gym import BaseTransformAction, BaseTransformObservation
    from jiminy_tpu.gym.wrappers import flatten_pytree

    class Negate(BaseTransformObservation):
        def transform(self, obs):
            return jax.tree.map(lambda x: -x, obs)

    env = make("pendulum")
    wrapped = Negate(env)
    st, obs_w = wrapped.reset(jax.random.PRNGKey(0))
    obs_raw = env.observe(st)
    np.testing.assert_allclose(
        np.asarray(flatten_pytree(obs_w)),
        -np.asarray(flatten_pytree(obs_raw)), atol=0,
    )
    st2, obs_w2, *_ = wrapped.step(st, jnp.asarray([0.1]))
    np.testing.assert_allclose(
        np.asarray(flatten_pytree(obs_w2)),
        -np.asarray(flatten_pytree(env.observe(st2))), atol=0,
    )

    class Half(BaseTransformAction):
        def transform(self, action):
            return 0.5 * action

    henv = Half(make("pendulum"))
    sth, _ = henv.reset(jax.random.PRNGKey(0))
    a = jnp.asarray([0.8])
    st_half, *_ = henv.step(sth, a)
    st_direct, *_ = henv.env.step(sth, 0.5 * a)
    np.testing.assert_allclose(
        np.asarray(st_half.sim.q), np.asarray(st_direct.sim.q), atol=0
    )
