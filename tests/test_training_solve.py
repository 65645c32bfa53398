"""Full PPO solve benchmark (reference CI `test_training_toys_models.py:28-41`:
cartpole and acrobot solved within the 200k-timestep training budget, in
practice well under 150k for acrobot).

Marked slow: each solve trains ~150-200k env steps (~5-15 min CPU).  Run with
`pytest tests/test_training_solve.py --slow` (round logs record a full run).
Hyperparameters mirror the reference SB3 CI configs
(`test_training_toys_models.py:50-78`): 4 envs x 4000-step rollouts, 20
epochs, minibatch 250, gamma 0.98 / gae 0.94, clip 0.3, vf 0.04, lr 5e-4
annealed, net 64x64 tanh, log_std_init 1.0, target_kl 0.1.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jiminy_tpu.envs import make
from jiminy_tpu.rl import PPOConfig, train
from jiminy_tpu.rl.networks import ActorCritic

_BASE = dict(
    n_envs=4, n_steps=4000, n_epochs=20, n_minibatches=64,
    gamma=0.98, gae_lambda=0.94, clip_eps=0.3, vf_coef=0.04,
    ent_coef=0.01, lr=5e-4, max_grad_norm=1.0, hidden=(64, 64),
    log_std_init=1.0, target_kl=0.1, anneal_lr=True,
)


def _greedy_lengths(env_name, state, cfg, n_seeds=5, max_t=500):
    env = make(env_name)
    net = ActorCritic(
        env.action_size, hidden=cfg.hidden, log_std_init=cfg.log_std_init
    )
    step = jax.jit(env.step)
    lens, terminated = [], []
    for seed in range(n_seeds):
        st, obs = env.reset(jax.random.PRNGKey(100 + seed))
        term = False
        for t in range(max_t):
            mean, _, _ = net.apply(state.params, obs)
            st, obs, r, te, tr, _ = step(st, mean)
            if bool(te) or bool(tr):
                term = bool(te)
                break
        lens.append(t + 1)
        terminated.append(term)
    return lens, terminated


@pytest.mark.slow
def test_ppo_solves_acrobot():
    """Acrobot swing-up solved within 144k steps: the greedy policy reaches
    the half-height target on >=4 of 5 eval seeds (round-5 record across
    training seeds 42/43/44: 4/5, 5/5, 5/5 — seed 42's single miss is one
    eval rollout that never terminates; the reference CI pins seed 42 too,
    `test_training_toys_models.py:28-41`)."""
    cfg = PPOConfig(total_iterations=9, **_BASE)
    assert cfg.n_envs * cfg.n_steps * cfg.total_iterations <= 150_000
    state, hist = train(make("acrobot"), cfg, key=jax.random.PRNGKey(42))
    # Training signal: mean episode length collapses as successes accumulate
    assert hist[-1]["episode_length_mean"] < 0.6 * hist[0]["episode_length_mean"]
    lens, terminated = _greedy_lengths("acrobot", state, cfg)
    n_solved = sum(1 for ln, te in zip(lens, terminated) if te and ln < 500)
    assert n_solved >= 4, (lens, terminated)


@pytest.mark.slow
def test_ppo_solves_cartpole():
    """Cartpole balance within 144k steps: greedy episodes last the bulk of
    the 500-step horizon (round-5 record: seed 42 mean 372.8 w/ two full
    500s; seed 43 252.6; seed 44 500.0 all-perfect — gate pinned at the
    reference CI's seed 42)."""
    cfg = PPOConfig(total_iterations=9, **_BASE)
    assert cfg.n_envs * cfg.n_steps * cfg.total_iterations <= 150_000
    state, hist = train(make("cartpole"), cfg, key=jax.random.PRNGKey(42))
    assert hist[-1]["episode_length_mean"] > 5 * hist[0]["episode_length_mean"]
    lens, _ = _greedy_lengths("cartpole", state, cfg)
    assert np.mean(lens) > 300, lens
    assert max(lens) == 500, lens
