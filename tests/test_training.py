"""End-to-end RL benchmark: PPO must make clear progress on cartpole within the
reference budget (<150k timesteps, `test_training_toys_models.py:28-41`).
Full solve takes ~60 iterations (~80 s CPU); this smoke check trains a shorter
run and asserts the termination rate collapses, plus greedy rollouts last
substantially longer than the untrained ~25-step episodes."""

import jax
import jax.numpy as jnp
import numpy as np

from jiminy_tpu.envs import make
from jiminy_tpu.rl import PPOConfig, train
from jiminy_tpu.rl.networks import ActorCritic


def test_ppo_learns_cartpole():
    cfg = PPOConfig(
        n_envs=32, n_steps=64, n_epochs=4, n_minibatches=4,
        total_iterations=35, lr=3e-4, ent_coef=0.01,
    )
    state, hist = train(make("cartpole"), cfg, key=jax.random.PRNGKey(42))
    assert cfg.n_envs * cfg.n_steps * cfg.total_iterations < 150_000
    early = np.mean([h["mean_done"] for h in hist[:5]])
    late = np.mean([h["mean_done"] for h in hist[-5:]])
    assert late < early  # episodes are getting longer

    # Episode monitor (reference MonitorEpisodeCallback): untrained cartpole
    # episodes end within the rollout, so finished-episode stats are live and
    # consistent; mean length grows as training progresses.
    assert hist[0]["episodes"] > 0
    for h in hist:
        if h["episodes"] > 0:
            assert h["episode_length_mean"] > 0
            assert np.isfinite(h["episode_return_mean"])
            # survival reward = 1/step: return tracks length
            assert abs(h["episode_return_mean"] - h["episode_length_mean"]) < 5.0
    early_len = np.mean([h["episode_length_mean"] for h in hist[:5]])
    late_lens = [h["episode_length_mean"] for h in hist[-5:] if h["episodes"] > 0]
    assert not late_lens or np.mean(late_lens) > early_len

    env = make("cartpole")
    net = ActorCritic(1, hidden=cfg.hidden)
    lengths = []
    step = jax.jit(env.step)
    for seed in range(5):
        st, obs = env.reset(jax.random.PRNGKey(100 + seed))
        for t in range(500):
            mean, _, _ = net.apply(state.params, obs)
            st, obs, r, te, tr, _ = step(st, mean)
            if bool(te) or bool(tr):
                break
        lengths.append(t + 1)
    assert np.mean(lengths) > 100  # untrained policy lasts ~25 steps


def test_evaluate_rollout_and_record(tmp_path):
    """`rl.evaluate`: jitted rollout -> Trajectory + episode stats + GIF replay
    (reference `rllib/utilities.py evaluate_from_runner` record path)."""
    from jiminy_tpu.rl import evaluate

    env = make("pendulum")
    gif = str(tmp_path / "roll.gif")
    traj, stats = evaluate(
        env,
        lambda obs, key: jnp.zeros((env.action_size,)),
        n_steps=40,
        key=jax.random.PRNGKey(0),
        record_gif=gif,
    )
    assert 1 <= stats["length"] <= 40
    assert np.isfinite(stats["return"])
    assert len(traj) == stats["length"]
    assert (tmp_path / "roll.gif").exists()


def test_evaluate_batch_multi_episode():
    """Vmapped multi-episode evaluation aggregates mean/std over seeds
    (reference `evaluate_from_runner`, `rllib/utilities.py:1277-1533`)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from jiminy_tpu.envs import make
    from jiminy_tpu.rl.evaluate import evaluate_batch

    env = make("pendulum", horizon=12)
    stats = evaluate_batch(
        env,
        lambda obs, key: jnp.zeros(env.action_size),
        n_episodes=8,
        n_steps=20,
        key=jax.random.PRNGKey(0),
    )
    eps = stats["episodes"]
    assert eps["return"].shape == (8,)
    # horizon=12 truncates every episode at 12 of the 20 scanned steps
    np.testing.assert_array_equal(eps["length"], 12)
    assert stats["length_std"] == 0.0
    np.testing.assert_allclose(stats["return_mean"], eps["return"].mean())
    # Distinct seeds produce distinct trajectories/returns
    assert np.unique(eps["return"]).size > 1


def test_temporal_barrier_regularizer():
    """Temporal barrier: exponential wall on successive-action deltas beyond a
    threshold (reference `rllib/ppo.py:664-675`); zero when under threshold."""
    import jax
    import jax.numpy as jnp

    from jiminy_tpu.envs import make
    from jiminy_tpu.gym import FlattenObservation
    from jiminy_tpu.rl import PPOConfig, make_train

    env = FlattenObservation(make("pendulum", horizon=8))
    base = dict(n_envs=4, n_steps=8, n_epochs=1, n_minibatches=1,
                total_iterations=1, hidden=(8, 8))
    # Huge threshold: barrier contributes exactly 0 -> same loss as without
    cfgs = [
        PPOConfig(**base),
        PPOConfig(temporal_barrier_reg=1.0,
                  temporal_barrier_threshold=1e9, **base),
        PPOConfig(temporal_barrier_reg=1.0, temporal_barrier_threshold=0.0,
                  temporal_barrier_scale=10.0, **base),
    ]
    losses = []
    for cfg in cfgs:
        init_fn, train_step = make_train(env, cfg)
        state = init_fn(jax.random.PRNGKey(0))
        _, metrics = jax.jit(train_step)(state)
        losses.append(float(metrics["loss"]))
    assert abs(losses[0] - losses[1]) < 1e-9  # inactive barrier is exact zero
    assert losses[2] > losses[1] + 1e-6  # zero threshold penalizes any delta
