"""Full TOML pipeline stack: env + PD + Mahony + mixture reward + terminations
(reference `test_pipeline_design.py` + `anymal_pipeline.toml`)."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from jiminy_tpu.gym import load_pipeline

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


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
    # Mahony attitude near identity for the standing robot
    quat = np.asarray(obs["features"]["mahony_filter"]["attitude"][0])
    assert abs(abs(quat[3]) - 1.0) < 0.05
