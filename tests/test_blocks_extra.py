"""QuantityObserver and DeformationEstimator blocks (reference
`test_deformation_estimator.py` scope, simplified: static-pose estimate)."""

import jax
import jax.numpy as jnp
import numpy as np

from jiminy_tpu.engine import Robot
from jiminy_tpu.engine.config import EngineOptions, StepperOptions
from jiminy_tpu.gym import MahonyFilter, ObservedEnv
from jiminy_tpu.gym.base import BaseEnv
from jiminy_tpu.gym.blocks import DeformationEstimator, QuantityObserver
from jiminy_tpu.models import JointType, build_model
from jiminy_tpu.quantities import CenterOfMass


def _flex_arm_robot():
    """Two-segment arm with IMUs on both segments and flexibility at the elbow
    (reference flexible-arm fixture)."""
    model = build_model(
        "arm",
        [
            {
                "name": "shoulder",
                "type": JointType.REVOLUTE,
                "parent": -1,
                "axis": np.array([0.0, 1.0, 0.0]),
                "mass": 1.0,
                "com": np.array([0.0, 0.0, 0.25]),
                "inertia": np.eye(3) * 1e-2,
            },
            {
                "name": "elbow",
                "type": JointType.REVOLUTE,
                "parent": 0,
                "placement": (np.eye(3), np.array([0.0, 0.0, 0.5])),
                "axis": np.array([0.0, 1.0, 0.0]),
                "mass": 0.5,
                "com": np.array([0.0, 0.0, 0.2]),
                "inertia": np.eye(3) * 5e-3,
            },
        ],
        [
            {"name": "imu_upper", "parent": 0, "placement": (np.eye(3), np.array([0, 0, 0.25]))},
            {"name": "imu_lower", "parent": 1, "placement": (np.eye(3), np.array([0, 0, 0.2]))},
        ],
    )
    return Robot.build(
        model,
        motors=[{"joint_name": "shoulder"}],
        sensors={
            "imu": [{"frame_name": "imu_upper"}, {"frame_name": "imu_lower"}],
            "encoder": [{"motor_name": "shoulder"}],
        },
        flexibility=[{"joint_name": "elbow", "stiffness": 50.0, "damping": 2.0,
                      "inertia": 1e-3}],
    )


def test_quantity_observer():
    from jiminy_tpu.envs import make

    env = make("anymal")
    obs_block = QuantityObserver("com", CenterOfMass()).setup(env)
    wrapped = ObservedEnv(env, obs_block)
    st, obs = wrapped.reset(jax.random.PRNGKey(0))
    com = obs["features"]["com"]
    assert com.shape == (3,)
    direct = CenterOfMass()(env, st)
    np.testing.assert_allclose(np.asarray(com), np.asarray(direct), atol=1e-9)


def test_deformation_estimator_static():
    """Hold the arm bent by gravity against the elbow flexibility: after the
    Mahony filter converges, the estimated deformation matches the true
    flexibility quaternion."""
    robot = _flex_arm_robot()
    env = BaseEnv(
        robot,
        EngineOptions(stepper=StepperOptions(dt_max=1e-3)),
        step_dt=0.01,
        horizon=10_000,
    )
    mah = MahonyFilter(kp=10.0, ki=0.2).setup(env)
    env1 = ObservedEnv(env, mah)
    de = DeformationEstimator([("elbow_flexibility", "imu_upper", "imu_lower")]).setup(env1)
    env2 = ObservedEnv(env1, de)
    st, obs = env2.reset(jax.random.PRNGKey(0))
    step = jax.jit(env2.step)
    for _ in range(150):  # 1.5 s: settle + filter convergence
        st, obs, *_ = step(st, jnp.zeros((1,)))
    est = np.asarray(obs["features"]["deformation_estimator"]["deformation"][0])
    model = robot.model
    j = model.joint_index("elbow_flexibility")
    true_quat = np.asarray(st.sim.q[model.idx_q[j] : model.idx_q[j] + 4])
    dot = abs(float(np.dot(est, true_quat)))
    angle_err = 2 * np.arccos(min(dot, 1.0))
    assert angle_err < 0.05  # within ~3 degrees
