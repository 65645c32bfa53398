"""Biped envs: construction, numerical soundness, loop-closure integrity.
Untrained bipeds are expected to fall — the checks are physical consistency,
not standing (the reference's biped tests also exercise mechanics, not policy)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jiminy_tpu.envs import make


@pytest.mark.slow
@pytest.mark.parametrize("name,nmot", [("cassie", 10), ("atlas-reduced", 12)])
def test_biped_rollout_no_nan(name, nmot):
    env = make(name)
    st, obs = env.reset(jax.random.PRNGKey(0))
    assert env.action_size == nmot
    step = jax.jit(env.step)
    for _ in range(20):
        st, obs, r, te, tr, _ = step(st, jnp.zeros((env.action_size,)))
    assert np.isfinite(np.asarray(st.sim.q)).all()
    assert np.isfinite(np.asarray(st.sim.v)).all()
    assert np.isfinite(float(r))


@pytest.mark.slow
def test_cassie_loop_closure_maintained():
    env = make("cassie")
    st, _ = env.reset(jax.random.PRNGKey(0))
    d0 = np.asarray(st.sim.distance_ref).copy()
    assert d0.shape == (2,) and np.all(d0 > 0.1)
    from jiminy_tpu.ops.kinematics import forward_kinematics, frame_placement

    model = env.robot.model
    step = jax.jit(env.step)
    for _ in range(15):
        st, *_ = step(st, jnp.zeros((env.action_size,)))
    kin = forward_kinematics(model, st.sim.q)
    for k, (fa, fb) in enumerate(env.engine.cset.distance_pairs):
        pa = frame_placement(model, kin, fa).pos
        pb = frame_placement(model, kin, fb).pos
        d = float(jnp.linalg.norm(pa - pb))
        # Baumgarte-bounded drift even through violent motion
        assert abs(d - d0[k]) < 0.02


def test_atlas_full_has_arms():
    env = make("atlas")
    assert env.action_size == 30
    assert "l_arm_elx" in env.robot.model.joint_names
