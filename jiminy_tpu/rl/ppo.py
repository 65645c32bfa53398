"""PPO on fully-jitted batched rollouts, with the reference's regularizers.

Re-design of `gym_jiminy.rllib.ppo` (reference `rllib/ppo.py:207-325`): clipped
surrogate PPO plus

- CAPS temporal smoothness  E|π(s_t) − π(s_{t+1})| (per-dim L1 mean, the
  reference's `action_delta` form, `ppo.py:648-655`)   (caps_temporal_reg)
- temporal barrier          exp wall once that delta exceeds a threshold
- CAPS spatial smoothness   E‖π(s) − π(s+ε)‖², ε∼N(0,σ) (caps_spatial_reg)
- CAPS global regularizer   E‖π(s)‖²                   (caps_global_reg)
- L2 weight decay           (l2_reg)

The whole iteration — rollout scan over the vmapped env, GAE, epochs of
minibatched updates — is ONE jitted function.  Multi-chip: pass a
`jax.sharding.Mesh`; env states and rollout tensors shard over the `data` axis,
parameters stay replicated, and XLA inserts the gradient all-reduce over ICI
(replacing the reference's Ray sampling + torch DDP stack).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from jiminy_tpu.gym.base import AutoResetWrapper
from jiminy_tpu.rl.networks import ActorCritic


@dataclasses.dataclass(frozen=True)
class PPOConfig:
    n_envs: int = 64
    n_steps: int = 64          # rollout length per env per iteration
    n_epochs: int = 4
    n_minibatches: int = 4
    gamma: float = 0.99
    gae_lambda: float = 0.95
    clip_eps: float = 0.2
    vf_coef: float = 0.5
    ent_coef: float = 0.01
    # Early-stop updates once approx KL exceeds 1.5x this (None/0 = off);
    # the reference CI configs set 0.1 (`test_training_toys_models.py:56`).
    target_kl: Optional[float] = None
    lr: float = 3.0e-4
    max_grad_norm: float = 0.5
    anneal_lr: bool = False
    total_iterations: int = 100
    hidden: tuple = (256, 256)
    log_std_init: float = -0.5
    # Regularizers (reference rllib/ppo.py)
    caps_temporal_reg: float = 0.0
    caps_spatial_reg: float = 0.0
    caps_global_reg: float = 0.0
    spatial_noise_std: float = 0.1
    # Temporal barrier (reference `ppo.py:664-675`): exponential penalty once
    # the per-dim successive-action delta exceeds `temporal_barrier_threshold`
    # — a hard wall on action jerk where CAPS-temporal is a soft spring.
    temporal_barrier_reg: float = 0.0
    temporal_barrier_scale: float = 10.0
    temporal_barrier_threshold: float = float("inf")
    # SGLD-style adversarial spatial noise (reference `ppo.py:71`): refine the
    # gaussian perturbation with `spatial_sgld_steps` signed-gradient-ascent
    # steps maximizing the policy change before penalizing it.
    spatial_sgld_steps: int = 0
    l2_reg: float = 0.0
    # Env vectorization: "vmap" (default) or "batched" — the latter steps the
    # env on explicitly-batched states (no per-env vmap), which activates the
    # engine's Pallas megakernel fast path on TPU (~3x rollout throughput).
    vectorization: str = "vmap"
    # Policy symmetry surrogate (reference ppo.py:151): weight of
    # E‖π(mirror_obs(s)) − mirror_act(π(s))‖²; mirror fns passed to make_train.
    symmetry_reg: float = 0.0


@struct.dataclass
class PPOState:
    params: Any
    opt_state: Any
    env_state: Any  # batched EnvState
    last_obs: jnp.ndarray  # (n_envs, obs_dim)
    key: jnp.ndarray
    iteration: jnp.ndarray
    # Per-env episode accumulators (reference `MonitorEpisodeCallback`,
    # `rllib/utilities.py:162`): running return/length of the in-flight
    # episode, carried across rollout boundaries.
    ep_return: jnp.ndarray  # (n_envs,)
    ep_length: jnp.ndarray  # (n_envs,) int32
    # Task-curriculum state (reference `TaskSchedulingSamplingCallback`,
    # `rllib/curriculum.py:84`): per-node moving score stats + the flat task
    # sampling probabilities consumed by auto-reset resampling in the rollout.
    # None unless `make_train(..., curriculum=...)` is used.
    task_stats: Any = None
    task_probs: Any = None


def _gaussian_logp(mean, log_std, action):
    var = jnp.exp(2 * log_std)
    return jnp.sum(
        -0.5 * ((action - mean) ** 2 / var + 2 * log_std + jnp.log(2 * jnp.pi)), axis=-1
    )


def _gaussian_entropy(log_std):
    return jnp.sum(log_std + 0.5 * jnp.log(2 * jnp.pi * jnp.e), axis=-1)


def _find_task_wrapper(env):
    """Locate the `TaskSettableWrapper` in a wrapper chain."""
    from jiminy_tpu.toolbox.meta_envs import TaskSettableWrapper

    node = env
    while node is not None:
        if isinstance(node, TaskSettableWrapper):
            return node
        node = getattr(node, "env", None)
    raise ValueError(
        "curriculum training requires the env to be wrapped with "
        "jiminy_tpu.toolbox.meta_envs.TaskSettableWrapper"
    )


def make_train(
    env,
    config: PPOConfig,
    mesh: Optional[jax.sharding.Mesh] = None,
    symmetry: Optional[tuple] = None,
    curriculum=None,
):
    """Returns (init_fn, train_step_fn).

    `env` must produce flat vector observations (wrap with FlattenObservation);
    auto-reset is applied here.
    `symmetry`: optional (mirror_obs_fn, mirror_act_fn) pair for the symmetry
    surrogate loss (reference mirror matrices, `rllib/ppo.py:151`).
    `curriculum`: optional `jiminy_tpu.rl.curriculum.TaskCurriculum`; the env
    chain must then contain a `TaskSettableWrapper` over the matching task
    space.  Episode tasks are resampled at auto-reset *inside* the jitted
    rollout from `PPOState.task_probs`, and the probabilities are refreshed
    from per-task score deltas every iteration (reference
    `TaskSchedulingSamplingCallback`, `rllib/curriculum.py:84-500`).
    `init_fn(key) -> PPOState`; `train_step(state) -> (state, metrics)`.
    """
    task_wrapper = None
    if curriculum is not None:
        task_wrapper = _find_task_wrapper(env)
        assert task_wrapper.task_space is curriculum.space or (
            task_wrapper.task_space.paths == curriculum.space.paths
        ), "curriculum and TaskSettableWrapper must share the task space"
    env = AutoResetWrapper(env)
    network = ActorCritic(
        env.action_size, hidden=config.hidden,
        log_std_init=config.log_std_init,
    )
    batched = config.vectorization == "batched"

    def flat_obs(obs):
        """Flatten a pytree observation with leading env axis to (B, obs_dim)."""
        leaves = jax.tree.leaves(obs)
        return jnp.concatenate(
            [x.reshape(x.shape[0], -1) for x in leaves], axis=-1
        )
    tx_parts = [optax.clip_by_global_norm(config.max_grad_norm)]
    if config.anneal_lr:
        sched = optax.linear_schedule(config.lr, 0.0, config.total_iterations
                                      * config.n_epochs * config.n_minibatches)
        tx_parts.append(optax.adam(sched))
    else:
        tx_parts.append(optax.adam(config.lr))
    tx = optax.chain(*tx_parts)

    data_sharding = None
    if mesh is not None:
        data_sharding = jax.sharding.NamedSharding(
            mesh, jax.sharding.PartitionSpec("data")
        )

    def init_fn(key) -> PPOState:
        k_env, k_net, k = jax.random.split(key, 3)
        env_keys = jax.random.split(k_env, config.n_envs)
        if data_sharding is not None:
            env_keys = jax.device_put(env_keys, data_sharding)
        env_state, obs = jax.jit(jax.vmap(env.reset))(env_keys)
        obs = flat_obs(obs)
        params = network.init(k_net, obs[:1])
        opt_state = tx.init(params)
        ep_return = jnp.zeros((config.n_envs,), obs.dtype)
        ep_length = jnp.zeros((config.n_envs,), jnp.int32)
        if data_sharding is not None:
            ep_return = jax.device_put(ep_return, data_sharding)
            ep_length = jax.device_put(ep_length, data_sharding)
        task_stats = task_probs = None
        if curriculum is not None:
            task_stats = curriculum.init_stats()
            task_probs = curriculum.flat_probabilities(task_stats)
        return PPOState(
            params=params,
            opt_state=opt_state,
            env_state=env_state,
            last_obs=obs,
            key=k,
            iteration=jnp.asarray(0, jnp.int32),
            ep_return=ep_return,
            ep_length=ep_length,
            task_stats=task_stats,
            task_probs=task_probs,
        )

    def rollout(state: PPOState):
        def step_once(carry, _):
            env_state, obs, key, ep_ret, ep_len = carry
            key, k_act = jax.random.split(key)
            mean, log_std, value = network.apply(state.params, obs)
            action = mean + jnp.exp(log_std) * jax.random.normal(
                k_act, mean.shape, mean.dtype
            )
            logp = _gaussian_logp(mean, log_std, action)
            if curriculum is not None:
                # The episode finishing at this step carries the PRE-reset task
                task_before = env_state.blocks["task"]
            if batched:
                env_state, next_obs, reward, term, trunc, info = env.step(
                    env_state, action
                )
            else:
                env_state, next_obs, reward, term, trunc, info = jax.vmap(env.step)(
                    env_state, action
                )
            next_obs = flat_obs(next_obs)
            done = term | trunc
            ep_ret = ep_ret + reward
            ep_len = ep_len + 1
            data = {
                "obs": obs,
                "action": action,
                "logp": logp,
                "value": value,
                "reward": reward,
                "done": done,
                # Finished-episode stats, nonzero only at termination steps
                # (reference MonitorEpisodeCallback, rllib/utilities.py:162).
                "ep_return_final": jnp.where(done, ep_ret, 0.0),
                "ep_length_final": jnp.where(done, ep_len, 0),
            }
            ep_ret = jnp.where(done, 0.0, ep_ret)
            ep_len = jnp.where(done, 0, ep_len)
            if curriculum is not None:
                # Auto-reset task resampling from the curriculum's live
                # probabilities (role of the reference's per-episode
                # `np_random.choice(..., p=proba_task_tree_flat)` in
                # `meta_envs.py:297` + the runner-group probability broadcast).
                key, k_task = jax.random.split(key)
                new_idx = jax.random.categorical(
                    k_task,
                    jnp.log(jnp.maximum(state.task_probs, 1e-12)),
                    shape=done.shape,
                )
                idx = jnp.where(done, new_idx, env_state.blocks["task"])
                with_idx = env_state.replace(
                    blocks={**env_state.blocks,
                            "task": jnp.asarray(idx, jnp.int32)}
                )
                if task_wrapper.apply_task is not None:
                    # Apply the task transform ONLY to freshly-reset envs —
                    # in-flight episodes must not have it re-applied.
                    applied = task_wrapper.apply_task(
                        task_wrapper.env, with_idx, idx
                    )

                    def _sel(a, b):
                        d = done.reshape(
                            done.shape + (1,) * (a.ndim - done.ndim)
                        )
                        return jnp.where(d, a, b)

                    env_state = jax.tree.map(_sel, applied, with_idx)
                else:
                    env_state = with_idx
                # The reset obs still encodes the task sampled by the
                # wrapper's own reset; rebuild it for the resampled tasks.
                next_obs = flat_obs(env.observe(env_state))
                data["task"] = task_before
            return (env_state, next_obs, key, ep_ret, ep_len), data

        (env_state, last_obs, key, ep_ret, ep_len), traj = jax.lax.scan(
            step_once,
            (state.env_state, state.last_obs, state.key,
             state.ep_return, state.ep_length),
            None,
            length=config.n_steps,
        )
        return env_state, last_obs, key, ep_ret, ep_len, traj

    def compute_gae(traj, last_value):
        def scan_fn(carry, x):
            gae, next_value = carry
            reward, value, done = x
            nonterminal = 1.0 - done.astype(value.dtype)
            delta = reward + config.gamma * next_value * nonterminal - value
            gae = delta + config.gamma * config.gae_lambda * nonterminal * gae
            return (gae, value), gae

        (_, _), advantages = jax.lax.scan(
            scan_fn,
            (jnp.zeros_like(last_value), last_value),
            (traj["reward"], traj["value"], traj["done"]),
            reverse=True,
        )
        return advantages, advantages + traj["value"]

    def loss_fn(params, batch, key):
        mean, log_std, value = network.apply(params, batch["obs"])
        logp = _gaussian_logp(mean, log_std, batch["action"])
        ratio = jnp.exp(logp - batch["logp"])
        adv = batch["advantage"]
        adv = (adv - jnp.mean(adv)) / (jnp.std(adv) + 1e-8)
        unclipped = ratio * adv
        clipped = jnp.clip(ratio, 1 - config.clip_eps, 1 + config.clip_eps) * adv
        pg_loss = -jnp.mean(jnp.minimum(unclipped, clipped))
        v_clipped = batch["value"] + jnp.clip(
            value - batch["value"], -config.clip_eps, config.clip_eps
        )
        vf_loss = 0.5 * jnp.mean(
            jnp.maximum(
                (value - batch["return"]) ** 2, (v_clipped - batch["return"]) ** 2
            )
        )
        ent = jnp.mean(_gaussian_entropy(log_std))
        total = pg_loss + config.vf_coef * vf_loss - config.ent_coef * ent

        # ---- CAPS regularizers (reference rllib/ppo.py:207-325) ----
        if config.caps_temporal_reg > 0.0 or config.temporal_barrier_reg > 0.0:
            mean_next, _, _ = network.apply(params, batch["next_obs"])
            # Per-dim successive action-mean delta (reference `ppo.py:648`)
            action_delta = jnp.abs(mean_next - mean)
            if config.caps_temporal_reg > 0.0:
                total = total + config.caps_temporal_reg * jnp.mean(action_delta)
            if config.temporal_barrier_reg > 0.0:
                # exp(clip(scale*(delta - thr), 0, 5)) - 1 (reference
                # `ppo.py:667-670`)
                barrier = jnp.exp(jnp.clip(
                    config.temporal_barrier_scale
                    * (action_delta - config.temporal_barrier_threshold),
                    0.0, 5.0,
                )) - 1.0
                total = total + config.temporal_barrier_reg * jnp.mean(barrier)
        if config.caps_spatial_reg > 0.0:
            noise = config.spatial_noise_std * jax.random.normal(
                key, batch["obs"].shape, batch["obs"].dtype
            )
            if config.spatial_sgld_steps > 0:
                # Adversarial refinement: signed-gradient ascent on the policy
                # change wrt the perturbation (SGLD flavor, reference ppo.py:71)
                step_size = config.spatial_noise_std / max(config.spatial_sgld_steps, 1)

                def policy_change(n):
                    m, _, _ = network.apply(params, batch["obs"] + n)
                    return jnp.sum((mean - m) ** 2)

                for _ in range(config.spatial_sgld_steps):
                    g = jax.grad(policy_change)(noise)
                    noise = jnp.clip(
                        noise + step_size * jnp.sign(g),
                        -2 * config.spatial_noise_std,
                        2 * config.spatial_noise_std,
                    )
            mean_noisy, _, _ = network.apply(params, batch["obs"] + noise)
            total = total + config.caps_spatial_reg * jnp.mean(
                jnp.sum((mean - mean_noisy) ** 2, axis=-1)
            )
        if config.caps_global_reg > 0.0:
            total = total + config.caps_global_reg * jnp.mean(jnp.sum(mean**2, axis=-1))
        if config.symmetry_reg > 0.0 and symmetry is not None:
            mirror_obs, mirror_act = symmetry
            mean_mirror, _, _ = network.apply(params, mirror_obs(batch["obs"]))
            total = total + config.symmetry_reg * jnp.mean(
                jnp.sum((mean_mirror - mirror_act(mean)) ** 2, axis=-1)
            )
        if config.l2_reg > 0.0:
            l2 = sum(
                jnp.sum(p**2) for p in jax.tree.leaves(params) if p.ndim >= 2
            )
            total = total + config.l2_reg * l2
        metrics = {
            "loss": total,
            "pg_loss": pg_loss,
            "vf_loss": vf_loss,
            "entropy": ent,
            "approx_kl": jnp.mean(batch["logp"] - logp),
            # Nonnegative estimator E[(r - 1) - log r] (the reference's SB3
            # configs gate on it via target_kl, test_training_toys_models.py:56)
            "approx_kl_pos": jnp.mean((ratio - 1.0) - jnp.log(ratio)),
        }
        return total, metrics

    def train_step(state: PPOState):
        env_state, last_obs, key, ep_ret, ep_len, traj = rollout(state)
        _, _, last_value = network.apply(state.params, last_obs)
        advantages, returns = compute_gae(traj, last_value)
        next_obs = jnp.concatenate([traj["obs"][1:], last_obs[None]], axis=0)
        batch = {
            "obs": traj["obs"],
            "next_obs": next_obs,
            "action": traj["action"],
            "logp": traj["logp"],
            "value": traj["value"],
            "advantage": advantages,
            "return": returns,
        }
        # Flatten (T, B) -> (T*B)
        flat = jax.tree.map(
            lambda x: x.reshape((-1,) + x.shape[2:]), batch
        )
        n_total = config.n_steps * config.n_envs
        mb_size = n_total // config.n_minibatches

        def epoch_body(carry, _):
            params, opt_state, key, stop = carry
            key, k_perm, k_noise = jax.random.split(key, 3)
            perm = jax.random.permutation(k_perm, n_total)
            shuffled = jax.tree.map(lambda x: x[perm], flat)

            def mb_body(carry, mb_idx):
                params, opt_state, stop = carry
                mb = jax.tree.map(
                    lambda x: jax.lax.dynamic_slice_in_dim(
                        x, mb_idx * mb_size, mb_size, 0
                    ),
                    shuffled,
                )
                (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                    params, mb, jax.random.fold_in(k_noise, mb_idx)
                )
                # target_kl early stop (reference SB3 config `target_kl`,
                # sb3 ppo.py: break BEFORE applying once KL > 1.5 target):
                # masked in jit — once `stop` trips, later minibatches/epochs
                # leave params untouched.
                if config.target_kl is not None and config.target_kl > 0:
                    stop = stop | (
                        metrics["approx_kl_pos"] > 1.5 * config.target_kl
                    )
                updates, opt_state_new = tx.update(grads, opt_state, params)
                params_new = optax.apply_updates(params, updates)
                keep = lambda new, old: jax.tree.map(
                    lambda a, b: jnp.where(stop, b, a), new, old
                )
                params = keep(params_new, params)
                opt_state = keep(opt_state_new, opt_state)
                return (params, opt_state, stop), metrics

            (params, opt_state, stop), metrics = jax.lax.scan(
                mb_body, (params, opt_state, stop),
                jnp.arange(config.n_minibatches),
            )
            return (params, opt_state, key, stop), metrics

        (params, opt_state, key, _), metrics = jax.lax.scan(
            epoch_body,
            (state.params, state.opt_state, key, jnp.asarray(False)),
            None,
            length=config.n_epochs,
        )
        task_stats, task_probs = state.task_stats, state.task_probs
        extra_metrics = {}
        if curriculum is not None:
            # Standardized episode score = return / max episode steps
            # (reference default score_fn, `rllib/curriculum.py:255-260`),
            # logged to every tree node along the task's path, then softmin
            # probabilities — all in-jit.
            max_steps = float(getattr(env, "horizon", config.n_steps))
            scores = traj["ep_return_final"] / max_steps
            sums, counts = curriculum.node_increments(
                traj["task"], scores, traj["done"]
            )
            task_stats = curriculum.update_stats(task_stats, sums, counts)
            task_probs = curriculum.flat_probabilities(task_stats)
            extra_metrics["task_probs"] = task_probs
            extra_metrics["task_entropy"] = -jnp.sum(
                task_probs * jnp.log(jnp.maximum(task_probs, 1e-12))
            )
        mean_reward = jnp.mean(traj["reward"])
        n_done = jnp.sum(traj["done"].astype(jnp.float32))
        denom = jnp.maximum(n_done, 1.0)
        ep_metrics = {
            **extra_metrics,
            "mean_reward": mean_reward,
            "mean_done": jnp.mean(traj["done"].astype(jnp.float32)),
            "episode_return_mean": jnp.sum(traj["ep_return_final"]) / denom,
            "episode_length_mean": (
                jnp.sum(traj["ep_length_final"].astype(jnp.float32)) / denom
            ),
            "episodes": n_done,
            **jax.tree.map(jnp.mean, metrics),
        }
        new_state = PPOState(
            params=params,
            opt_state=opt_state,
            env_state=env_state,
            last_obs=last_obs,
            key=key,
            iteration=state.iteration + 1,
            ep_return=ep_ret,
            ep_length=ep_len,
            task_stats=task_stats,
            task_probs=task_probs,
        )
        return new_state, ep_metrics

    return init_fn, train_step


def train(
    env,
    config: PPOConfig,
    key=None,
    mesh: Optional[jax.sharding.Mesh] = None,
    callback: Optional[Callable] = None,
    symmetry: Optional[tuple] = None,
    curriculum=None,
    log_dir: Optional[str] = None,
    checkpoint_every: int = 0,
):
    """Run `config.total_iterations` PPO iterations; returns (state, history).

    Role-equivalent to `gym_jiminy.rllib.utilities.train` (reference
    `rllib/utilities.py:564`), minus Ray: one process, N devices.

    If `log_dir` is given, per-iteration metrics are appended to
    `<log_dir>/metrics.jsonl` (the reference's TensorBoard logging role —
    plain JSON lines, plottable with `jiminy_tpu.plot`), and, when
    `checkpoint_every > 0`, the full `PPOState` (params, optimizer, env
    states, RNG keys — bit-exact resume) is saved every that many iterations
    to `<log_dir>/ckpt_<i>` plus a final `<log_dir>/ckpt_final`.
    """
    if key is None:
        key = jax.random.PRNGKey(0)
    init_fn, train_step = make_train(
        env, config, mesh=mesh, symmetry=symmetry, curriculum=curriculum
    )
    state = init_fn(key)
    step = jax.jit(train_step)
    # Multi-controller: every process runs the same program; metrics logging
    # belongs to process 0 only (the reference's Ray driver role), while
    # checkpoint saves stay COLLECTIVE — Orbax requires every process to
    # participate when arrays are sharded across hosts.
    is_primary = jax.process_index() == 0
    metrics_file = None
    if log_dir is not None and is_primary:
        import os

        os.makedirs(log_dir, exist_ok=True)
        metrics_file = open(  # noqa: SIM115 — kept open across iterations
            os.path.join(log_dir, "metrics.jsonl"), "a"
        )
    history = []
    try:
        for i in range(config.total_iterations):
            state, metrics = step(state)
            metrics = {
                k: float(v) if jnp.ndim(v) == 0 else np.asarray(v).tolist()
                for k, v in metrics.items()
            }
            history.append(metrics)
            if metrics_file is not None:
                import json

                metrics_file.write(json.dumps({"iteration": i, **metrics}) + "\n")
                metrics_file.flush()
            if (
                log_dir is not None
                and checkpoint_every > 0
                and (i + 1) % checkpoint_every == 0
            ):
                from jiminy_tpu.rl.checkpoint import save_checkpoint

                save_checkpoint(f"{log_dir}/ckpt_{i + 1}", state)
            if callback is not None:
                callback(i, state, metrics)
        if log_dir is not None and checkpoint_every > 0:
            from jiminy_tpu.rl.checkpoint import save_checkpoint

            save_checkpoint(f"{log_dir}/ckpt_final", state)
    finally:
        if metrics_file is not None:
            metrics_file.close()
    return state, history
