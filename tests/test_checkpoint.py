"""Checkpoint/resume + metrics persistence (reference `rllib/utilities.py`
train checkpointing :564-1022 and rebuild :1535-1652; SURVEY §5
checkpoint/resume — here the saved PPOState includes the batched env states
and RNG keys, so resume is bit-exact, which the reference cannot do)."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from jiminy_tpu.envs import make
from jiminy_tpu.rl import (
    PPOConfig,
    make_train,
    restore_checkpoint,
    save_checkpoint,
    train,
)


def _cfg(total_iterations):
    return PPOConfig(
        n_envs=4, n_steps=8, n_epochs=1, n_minibatches=1,
        total_iterations=total_iterations,
    )


def test_train_logs_metrics_and_checkpoints(tmp_path):
    log_dir = str(tmp_path / "run")
    state, hist = train(
        make("cartpole"), _cfg(4), key=jax.random.PRNGKey(3),
        log_dir=log_dir, checkpoint_every=2,
    )
    lines = [
        json.loads(s)
        for s in open(os.path.join(log_dir, "metrics.jsonl"))
    ]
    assert [rec["iteration"] for rec in lines] == [0, 1, 2, 3]
    assert all("episode_return_mean" in rec for rec in lines)
    for name in ("ckpt_2", "ckpt_4", "ckpt_final"):
        assert os.path.isdir(os.path.join(log_dir, name)), name

    # Restored final checkpoint matches the in-memory state bitwise.
    restored = restore_checkpoint(os.path.join(log_dir, "ckpt_final"), state)
    for a, b in zip(jax.tree.leaves(restored), jax.tree.leaves(state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_resume_is_bit_exact(tmp_path):
    env = make("cartpole")
    key = jax.random.PRNGKey(11)

    # Straight 4-iteration run
    init_fn, train_step = make_train(env, _cfg(4))
    step = jax.jit(train_step)
    state = init_fn(key)
    for _ in range(4):
        state, _ = step(state)

    # 2 iterations, checkpoint, restore, 2 more — must land on the same state
    mid = init_fn(key)
    for _ in range(2):
        mid, _ = step(mid)
    path = save_checkpoint(str(tmp_path / "ckpt_mid"), mid)
    resumed = restore_checkpoint(path, mid)
    for _ in range(2):
        resumed, _ = step(resumed)

    for a, b in zip(jax.tree.leaves(resumed), jax.tree.leaves(state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
