"""Meta-RL task-settable env wrappers (reference
`toolbox/wrappers/meta_envs.py:27,364`)."""

from __future__ import annotations

from typing import Any, Callable, Dict, Sequence

from jiminy_tpu.gym.pipeline import _Wrapper


class TaskSettableEnv(_Wrapper):
    """Wrapper exposing a discrete task space; each task re-parameterizes the
    env through a user-provided applicator (e.g. change the target velocity or
    the ground profile).  Works with `jiminy_tpu.rl.curriculum.TaskScheduler`.
    """

    def __init__(self, env, tasks: Sequence, apply_task: Callable[[Any, Any], None]):
        super().__init__(env)
        self.tasks = list(tasks)
        self.apply_task = apply_task
        self._task = self.tasks[0]

    @property
    def task(self):
        return self._task

    def set_task(self, task) -> None:
        if task not in self.tasks:
            raise ValueError(f"unknown task {task}")
        self._task = task
        self.apply_task(self.env, task)

    def sample_tasks(self, n: int, rng=None) -> list:
        import numpy as np

        rng = rng or np.random.default_rng()
        return [self.tasks[i] for i in rng.integers(0, len(self.tasks), n)]

    def reset(self, key):
        return self.env.reset(key)
