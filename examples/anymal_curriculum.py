"""ANYmal velocity-command curriculum: train a PD-pipeline policy to track a
commanded base velocity where the command is a *task* sampled per episode
from a hierarchical task space, with the sampling probabilities adapted
online from per-task scores (reference
`rllib/curriculum.py:84` `TaskSchedulingSamplingCallback` +
`toolbox/wrappers/meta_envs.py:27` `BaseTaskSettableWrapper`).

Task space: (direction: forward/backward/lateral) x (speed: slow/fast) as a
nested tree — the curriculum learns which (direction, speed) branches are
hard and samples them more (maximin objective), while the one-hot task id is
appended to the observation so one policy serves every command.

Run (CPU smoke):  python examples/anymal_curriculum.py --iters 5
Run (TPU, batched fast path): python examples/anymal_curriculum.py \
    --envs 4096 --iters 50
"""

import argparse
import os
import sys

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _ROOT not in sys.path:
    sys.path.insert(0, _ROOT)

import jax
import jax.numpy as jnp
import numpy as np

from jiminy_tpu.compositions import (
    BaseRollPitchTermination,
    SurviveReward,
    TrackingBaseOdometryVelocityReward,
)
from jiminy_tpu.envs import make
from jiminy_tpu.gym import ComposedEnv, FlattenObservation
from jiminy_tpu.rl import PPOConfig, TaskCurriculum, train
from jiminy_tpu.toolbox import TaskSettableWrapper, TaskSpace

# (direction, speed) command table, one row per flat task index.
# Tree: 3 direction branches x 2 speeds each.
TASK_TREE = ((2, 2, 2),)
COMMANDS = np.array([
    [0.3, 0.0, 0.0],    # forward slow
    [0.8, 0.0, 0.0],    # forward fast
    [-0.3, 0.0, 0.0],   # backward slow
    [-0.8, 0.0, 0.0],   # backward fast
    [0.0, 0.3, 0.0],    # lateral slow
    [0.0, 0.6, 0.0],    # lateral fast
])


def build_env(horizon: int = 128):
    env = make("anymal-pid", horizon=horizon)
    space = TaskSpace(TASK_TREE)
    task_env = TaskSettableWrapper(env, space)

    def command_of(env_, state):
        return jnp.asarray(COMMANDS)[state.blocks["task"]]

    reward = TrackingBaseOdometryVelocityReward(command_of, cutoff=0.5)
    survive = SurviveReward()

    def reward_fn(env_, prev, action, state):
        return reward(env_, prev, action, state) + 0.2 * survive(env_, prev, action, state)

    composed = ComposedEnv(
        task_env,
        reward=reward_fn,
        terminations=(BaseRollPitchTermination(0.6, 0.6),),
    )
    return FlattenObservation(composed), space


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--envs", type=int, default=16)
    ap.add_argument("--steps", type=int, default=64)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--horizon", type=int, default=128)
    args = ap.parse_args()

    env, space = build_env(args.horizon)
    curriculum = TaskCurriculum(space, softmin_beta=4.0, history_length=200)
    config = PPOConfig(
        n_envs=args.envs,
        n_steps=args.steps,
        n_epochs=2,
        n_minibatches=4,
        total_iterations=args.iters,
        hidden=(64, 64),
        caps_temporal_reg=1e-3,
    )
    state, history = train(env, config, curriculum=curriculum)
    probs = np.asarray(state.task_probs)
    print("final task probabilities (direction x speed):")
    labels = ["fwd/slow", "fwd/fast", "back/slow", "back/fast",
              "lat/slow", "lat/fast"]
    for label, p in zip(labels, probs):
        print(f"  {label:10s} {p:.3f}")
    print(f"task entropy: {history[-1]['task_entropy']:.3f} "
          f"(uniform = {np.log(len(labels)):.3f})")
    return state, history


if __name__ == "__main__":
    main()
