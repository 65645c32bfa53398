"""Backlash joint insertion & dead-band dynamics (reference `test_dense_pole.py`
backlash coverage): within the play, motor motion does not drive the load; at
the hard stops the bound constraint engages."""

import jax
import jax.numpy as jnp
import numpy as np

from jiminy_tpu.engine import Engine, EngineOptions, Robot
from jiminy_tpu.engine.config import StepperOptions
from jiminy_tpu.models import JointType, build_model
from jiminy_tpu.quantities.trajectory import TrajectoryDataset


def _pendulum_with_backlash(backlash):
    model = build_model(
        "pend",
        [
            {
                "name": "pivot",
                "type": JointType.REVOLUTE,
                "parent": -1,
                "axis": np.array([0.0, 1.0, 0.0]),
                "mass": 1.0,
                "com": np.array([0.0, 0.0, -0.5]),
                "inertia": np.zeros((3, 3)),
            }
        ],
    )
    return Robot.build(
        model,
        motors=[{"joint_name": "pivot", "backlash": backlash, "armature": 0.02}],
    )


def test_backlash_model_surgery():
    robot = _pendulum_with_backlash(0.1)
    model = robot.model
    assert model.nq == 2 and model.nv == 2
    assert "pivot_backlash" in model.joint_names
    j = model.joint_index("pivot_backlash")
    assert robot.backlash_joint_indices == (j,)
    np.testing.assert_allclose(
        np.asarray(model.position_limit_lower)[model.idx_q[j]], -0.05
    )
    # Body inertia moved to the backlash joint; motor joint keeps transmission
    assert float(np.asarray(model.mass)[model.joint_index("pivot")]) == 0.0
    assert float(np.asarray(model.mass)[j]) == 1.0
    # Armature on the motor joint dof
    assert float(np.asarray(model.armature)[model.idx_v[model.joint_index("pivot")]]) > 0.0


def test_backlash_deadband():
    """Rocking the motor within the play leaves the load (almost) still; the
    engaged stops transmit motion."""
    robot = _pendulum_with_backlash(0.2)
    eng = Engine(robot, EngineOptions(stepper=StepperOptions(dt_max=5e-4)))
    model = robot.model
    j_m = model.joint_index("pivot")
    j_b = model.joint_index("pivot_backlash")
    # Start at rest hanging down
    st = eng.reset(jnp.zeros(model.nq))
    step = jax.jit(eng.step)
    # Drive the motor with torque; the stop at +0.1 must engage: the backlash
    # angle saturates near +0.1 while the motor+load rotate together beyond.
    for _ in range(400):
        st = step(st, jnp.array([1.0]))
    q_b = float(st.q[model.idx_q[j_b]])
    q_m = float(st.q[model.idx_q[j_m]])
    # Motor spins forward, the load lags: the relative (backlash) angle rides
    # the NEGATIVE stop, through which the torque transmits.
    assert -0.13 < q_b < -0.07
    # Load angle = q_m + q_b settles near the torque/gravity equilibrium
    # asin(tau / (m g l)) ~ 0.205 rad — torque DID transmit through the stop.
    assert 0.15 < q_m + q_b < 0.3


def test_reference_trajectory_mode():
    """REFERENCE quantity evaluation: tracking target read from a dataset."""
    from jiminy_tpu.envs import make
    from jiminy_tpu.telemetry import record_rollout, extract_trajectory_from_log
    from jiminy_tpu.quantities import BaseOdometryPose, make_tracking_target
    from jiminy_tpu.compositions import TrackingQuantityReward

    env = make("anymal")
    st, _ = env.reset(jax.random.PRNGKey(0))
    _, log = record_rollout(env.engine, st.sim, 25)
    traj = extract_trajectory_from_log(log)
    ds = TrajectoryDataset(env.engine.control_period)
    ds.add("ref", traj)
    reward = TrackingQuantityReward(
        "track_odom", BaseOdometryPose(), make_tracking_target(BaseOdometryPose(), ds),
        cutoff=0.5,
    )
    # Following the same trajectory: reward ~ 1 at matching times
    st2, _ = env.reset(jax.random.PRNGKey(0))
    r = float(reward(env, st2, None, st2))
    assert r > 0.95
