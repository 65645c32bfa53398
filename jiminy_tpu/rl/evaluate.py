"""Policy evaluation: deterministic rollouts, trajectory extraction, replay.

Role-equivalent to the reference's `gym_jiminy.rllib.utilities.evaluate_from_algo/
evaluate_from_runner` (reference `rllib/utilities.py:1277-1533`): roll a trained
policy in an env, collect per-step telemetry, return episode statistics and a
replayable `Trajectory` (and optionally record a GIF via the viewer).

TPU-first: the whole rollout is one jitted `lax.scan` (no per-step host
crossing); only the final stacked trajectory is transferred to the host.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from jiminy_tpu.telemetry.trajectory import Trajectory


def _flat_obs_single(obs) -> jnp.ndarray:
    leaves = jax.tree.leaves(obs)
    return jnp.concatenate([jnp.ravel(x) for x in leaves], axis=-1)


def policy_from_params(network, params, deterministic: bool = True) -> Callable:
    """`(obs, key) -> action` closure over trained ActorCritic params."""

    def policy(obs, key):
        flat = _flat_obs_single(obs)
        mean, log_std, _ = network.apply(params, flat[None])
        action = mean[0]
        if not deterministic:
            action = action + jnp.exp(log_std) * jax.random.normal(
                key, action.shape, action.dtype
            )
        return action

    return policy


def evaluate(
    env,
    policy: Callable,
    n_steps: int = 1000,
    key: Optional[jnp.ndarray] = None,
    record_gif: Optional[str] = None,
) -> Tuple[Trajectory, Dict[str, Any]]:
    """Roll `policy(obs, key) -> action` for up to `n_steps` env steps.

    Returns (trajectory, stats) where stats has `return`, `length` (steps until
    first termination/truncation) and `terminated`.  The rollout always runs
    `n_steps` under jit (fixed shape); the episode end is resolved on the host.
    """
    if key is None:
        key = jax.random.PRNGKey(0)
    k_reset, k_roll = jax.random.split(key)
    state, _ = env.reset(k_reset)

    def body(carry, _):
        st = carry
        k, sub = jax.random.split(st.key)
        st = st.replace(key=k)
        action = policy(env.observe(st), sub)
        st, obs, reward, term, trunc, _ = env.step(st, action)
        out = (st.sim.t, st.sim.q, st.sim.v, reward, term | trunc, term)
        return st, out

    state = state.replace(key=k_roll)
    roll = jax.jit(
        lambda st: jax.lax.scan(body, st, None, length=n_steps)
    )
    _, (ts, qs, vs, rewards, dones, terms) = roll(state)
    ts = np.asarray(ts)
    qs, vs = np.asarray(qs), np.asarray(vs)
    rewards = np.asarray(rewards)
    dones = np.asarray(dones)

    done_idx = np.flatnonzero(dones)
    length = int(done_idx[0]) + 1 if done_idx.size else int(n_steps)
    stats = {
        "return": float(rewards[:length].sum()),
        "length": length,
        "terminated": bool(np.asarray(terms)[length - 1]) if done_idx.size else False,
    }
    traj = Trajectory(times=ts[:length], qs=qs[:length], vs=vs[:length],
                      robot=env.robot)
    if record_gif is not None:
        from jiminy_tpu.viewer import play_trajectories

        play_trajectories(
            [traj], output_path=record_gif,
            ground_fn=getattr(env.engine, "ground_fn", None),
        )
        stats["gif"] = record_gif
    return traj, stats


def evaluate_batch(
    env,
    policy: Callable,
    n_episodes: int = 16,
    n_steps: int = 1000,
    key: Optional[jnp.ndarray] = None,
) -> Dict[str, Any]:
    """Vmapped multi-episode evaluation: `n_episodes` independently-seeded
    rollouts in one jitted program, aggregated into mean/std statistics
    (role of the reference's many-episode `evaluate_from_runner` aggregation,
    `rllib/utilities.py:1277-1533` — Ray workers there, one batched scan
    here).

    Returns a dict with `return_mean/std`, `length_mean/std`,
    `terminated_frac`, and the per-episode arrays under `episodes`.
    Episode boundaries: each rollout runs `n_steps` steps with no auto-reset;
    the first termination/truncation ends the scored episode.
    """
    if key is None:
        key = jax.random.PRNGKey(0)
    keys = jax.random.split(key, n_episodes)

    def one_episode(k):
        k_reset, k_roll = jax.random.split(k)
        state, _ = env.reset(k_reset)
        state = state.replace(key=k_roll)

        def body(carry, _):
            st, done_so_far = carry
            kk, sub = jax.random.split(st.key)
            st = st.replace(key=kk)
            action = policy(env.observe(st), sub)
            st, _, reward, term, trunc, _ = env.step(st, action)
            live = ~done_so_far
            done_so_far = done_so_far | term | trunc
            return (st, done_so_far), (
                jnp.where(live, reward, 0.0),
                live,
                term & live,
            )

        (_, _), (rewards, lives, terms) = jax.lax.scan(
            body, (state, jnp.asarray(False)), None, length=n_steps
        )
        return {
            "return": jnp.sum(rewards),
            "length": jnp.sum(lives.astype(jnp.int32)),
            "terminated": jnp.any(terms),
        }

    episodes = jax.jit(jax.vmap(one_episode))(keys)
    returns = np.asarray(episodes["return"], np.float64)
    lengths = np.asarray(episodes["length"], np.float64)
    return {
        "return_mean": float(returns.mean()),
        "return_std": float(returns.std()),
        "length_mean": float(lengths.mean()),
        "length_std": float(lengths.std()),
        "terminated_frac": float(np.asarray(episodes["terminated"]).mean()),
        "episodes": {k: np.asarray(v) for k, v in episodes.items()},
    }
