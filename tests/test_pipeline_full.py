"""Full TOML pipeline stack: env + PD + Mahony + mixture reward + terminations
(reference `test_pipeline_design.py` + `anymal_pipeline.toml`)."""

import os

import jax
import pytest
import jax.numpy as jnp
import numpy as np

from jiminy_tpu.gym import load_pipeline

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_anymal_pipeline_toml():
    env = load_pipeline(os.path.join(ROOT, "examples", "anymal_pipeline.toml"))
    st, obs = env.reset(jax.random.PRNGKey(0))
    assert "mahony_filter" in obs["features"]
    assert "pd_controller" in obs["targets"]
    step = jax.jit(env.step)
    rs = []
    for _ in range(25):
        st, obs, r, te, tr, _ = step(st, jnp.zeros((env.action_size,)))
        rs.append(float(r))
    assert not bool(te)
    assert 0.4 < np.mean(rs) <= 1.2  # mixture of normalized rewards - power
    # Mahony attitude tracks the true IMU orientation of the standing robot
    # (the real ANYmal mounts its IMU yawed 90 deg on the base)
    from jiminy_tpu.ops import lie
    from jiminy_tpu.ops.kinematics import forward_kinematics, frame_placement

    quat = np.asarray(obs["features"]["mahony_filter"]["attitude"][0])
    model = env.robot.model
    kin = forward_kinematics(model, st.sim.q)
    fidx = env.robot.sensors.imu.frame_indices[0]
    true_quat = np.asarray(lie.mat_to_quat(frame_placement(model, kin, fidx).rot))
    assert abs(float(np.dot(quat, true_quat))) > 0.995
