"""Per-env model randomization under vmap: each env in a batch simulates its
own biased dynamical parameters (reference `addBiasedToExtendedModel` per
reset, here batched — SURVEY §2.8 'extra batch axis' design)."""

import jax
import jax.numpy as jnp
import numpy as np

from jiminy_tpu.engine import Engine, EngineOptions, Robot
from jiminy_tpu.engine.config import StepperOptions
from jiminy_tpu.engine.randomization import randomize_model
from jiminy_tpu.models import JointType, build_model


def _pendulum():
    model = build_model(
        "p",
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
    return Robot.build(model)


def test_per_env_model_randomization_vmap():
    robot = _pendulum()
    eng = Engine(robot, EngineOptions(stepper=StepperOptions(dt_max=1e-3)))
    n = 4
    keys = jax.random.split(jax.random.PRNGKey(0), n)
    models = jax.vmap(
        lambda k: randomize_model(robot.model, k, mass_std=0.3)
    )(keys)
    assert models.mass.shape == (n, 1)

    def reset_one(m):
        return eng.reset(jnp.array([0.5]), model_params=m)

    states = jax.vmap(reset_one)(models)
    step = jax.jit(jax.vmap(eng.step))
    for _ in range(50):
        states = step(states)
    qs = np.asarray(states.q[:, 0])
    # Different masses -> identical gravity pendulum... mass cancels for a
    # point pendulum, so randomize the COM instead to differentiate dynamics
    models2 = jax.vmap(
        lambda k: randomize_model(robot.model, k, com_std=0.1)
    )(keys)
    states = jax.vmap(reset_one)(models2)
    for _ in range(50):
        states = step(states)
    qs2 = np.asarray(states.q[:, 0])
    assert len(set(np.round(qs2, 10))) == n  # all trajectories differ

    # Each batched trajectory matches its own single-env simulation
    m0 = jax.tree.map(lambda x: x[2], models2)
    st0 = eng.reset(jnp.array([0.5]), model_params=m0)
    step1 = jax.jit(eng.step)
    for _ in range(50):
        st0 = step1(st0)
    np.testing.assert_allclose(qs2[2], float(st0.q[0]), atol=1e-12)


def test_walker_std_ratio_randomizes():
    from jiminy_tpu.envs import make

    env = make("anymal", std_ratio=1.0)
    keys = jax.random.split(jax.random.PRNGKey(0), 3)
    states, _ = jax.vmap(env.reset)(keys)
    masses = np.asarray(states.sim.model_params.mass)
    assert masses.shape[0] == 3
    assert not np.allclose(masses[0], masses[1])
    stepb = jax.jit(jax.vmap(env.step))
    states, obs, r, te, tr, _ = stepb(states, jnp.zeros((3, env.action_size)))
    assert np.isfinite(np.asarray(states.sim.q)).all()
