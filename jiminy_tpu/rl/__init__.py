"""RL training: PPO with CAPS/symmetry regularizers, sharded over TPU meshes.

Re-design of `gym_jiminy.rllib` (reference `python/gym_jiminy/rllib/`): instead of
Ray actors sampling from per-process Gymnasium envs, the rollout is a `lax.scan`
of the vmapped env step *inside* the learner program, sharded across devices with
`jax.sharding` — gradients all-reduce over ICI, no object store, no RPC.
"""

from jiminy_tpu.rl.checkpoint import restore_checkpoint, save_checkpoint
from jiminy_tpu.rl.curriculum import TaskCurriculum, TaskScheduler
from jiminy_tpu.rl.evaluate import evaluate, evaluate_batch, policy_from_params
from jiminy_tpu.rl.ppo import PPOConfig, PPOState, make_train, train

__all__ = [
    "PPOConfig",
    "TaskCurriculum",
    "TaskScheduler",
    "PPOState",
    "evaluate",
    "evaluate_batch",
    "make_train",
    "policy_from_params",
    "restore_checkpoint",
    "save_checkpoint",
    "train",
]
