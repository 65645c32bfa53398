"""Quantities & compositions vs direct computation (reference
`test_quantities.py` / `test_rewards.py` / `test_terminations.py` strategy)."""

import jax
import jax.numpy as jnp
import numpy as np

from jiminy_tpu.compositions import (
    AdditiveMixtureReward,
    BaseRollPitchTermination,
    SurviveReward,
    TrackingBaseOdometryVelocityReward,
    radial_basis_function,
)
from jiminy_tpu.envs import make
from jiminy_tpu.gym import ComposedEnv
from jiminy_tpu.quantities import (
    BaseOdometryPose,
    BaseOdometryVelocity,
    CapturePoint,
    CenterOfMass,
    CenterOfMassVelocity,
    EnergyQuantity,
    FramePosition,
    MaskedQuantity,
    ZeroMomentPoint,
)


def _env_state():
    env = make("anymal")
    st, _ = env.reset(jax.random.PRNGKey(0))
    return env, st


def test_com_against_direct():
    env, st = _env_state()
    com = CenterOfMass()(env, st)
    # Direct computation from FK
    from jiminy_tpu.ops.kinematics import forward_kinematics
    from jiminy_tpu.ops import lie

    model = env.robot.model
    kin = forward_kinematics(model, st.sim.q)
    num = 0.0
    for i in range(model.njoints):
        c_w = lie.se3_apply(
            lie.SE3(kin.omi.rot[i], kin.omi.pos[i]), model.com[i]
        )
        num = num + model.mass[i] * c_w
    expected = num / jnp.sum(model.mass)
    np.testing.assert_allclose(np.asarray(com), np.asarray(expected), atol=1e-12)
    # Standing robot: CoM near base xy, below base z
    assert abs(float(com[0])) < 0.1
    assert 0.2 < float(com[2]) < 0.6


def test_com_velocity_finite_difference():
    env, st = _env_state()
    step = jax.jit(env.step)
    st1, *_ = step(st, jnp.zeros((env.action_size,)))
    dt = env.step_dt
    c0 = np.asarray(CenterOfMass()(env, st))
    c1 = np.asarray(CenterOfMass()(env, st1))
    v_mid = np.asarray(CenterOfMassVelocity()(env, st1))
    fd = (c1 - c0) / dt
    # Falling/settling robot: the FD velocity should roughly match
    assert np.linalg.norm(fd - v_mid) < 0.5


def test_odometry_pose_and_velocity():
    env, st = _env_state()
    pose = np.asarray(BaseOdometryPose()(env, st))
    np.testing.assert_allclose(pose, [0.0, 0.0, 0.0], atol=1e-9)
    vel = np.asarray(BaseOdometryVelocity()(env, st))
    assert vel.shape == (3,)


def test_zmp_capture_point_static():
    """At rest, ZMP and capture point coincide with the CoM ground projection."""
    env, st = _env_state()
    # Settle first
    step = jax.jit(env.step)
    for _ in range(30):
        st, *_ = step(st, jnp.zeros((env.action_size,)))
    com = np.asarray(CenterOfMass()(env, st))
    zmp = np.asarray(ZeroMomentPoint()(env, st))
    cap = np.asarray(CapturePoint()(env, st))
    assert np.linalg.norm(zmp - com[:2]) < 0.05
    assert np.linalg.norm(cap - com[:2]) < 0.05


def test_frame_position_and_mask():
    env, st = _env_state()
    q = FramePosition("LF_FOOT")
    pos = np.asarray(q(env, st))
    assert pos.shape == (3,)
    masked = MaskedQuantity(q, indices=(2,))
    z = np.asarray(masked(env, st))
    assert z.shape == (1,) and abs(z[0] - pos[2]) < 1e-12


def test_energy_decreases_with_damping():
    env, st = _env_state()
    e = EnergyQuantity()(env, st)
    assert np.isfinite(float(e))


def test_rbf_kernel():
    assert abs(float(radial_basis_function(jnp.zeros(3), 1.0)) - 1.0) < 1e-9
    at_cutoff = float(radial_basis_function(jnp.array([1.0, 0.0]), 1.0))
    assert abs(at_cutoff - 0.01) < 1e-9


def test_composed_env_rewards_terminations():
    env = make("anymal")
    reward = AdditiveMixtureReward(
        [SurviveReward(), TrackingBaseOdometryVelocityReward(jnp.array([0.3, 0.0, 0.0]))],
        weights=[0.5, 0.5],
    )
    env = ComposedEnv(env, reward=reward, terminations=[BaseRollPitchTermination()])
    st, obs = env.reset(jax.random.PRNGKey(0))
    step = jax.jit(env.step)
    st, obs, r, te, tr, _ = step(st, jnp.zeros((env.action_size,)))
    assert 0.0 <= float(r) <= 1.0
    assert isinstance(bool(te), bool)
