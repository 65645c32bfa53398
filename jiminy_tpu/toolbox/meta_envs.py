"""Meta-RL task-settable env wrappers (reference
`toolbox/wrappers/meta_envs.py:27-364` `BaseTaskSettableWrapper`).

TPU-native redesign: the reference samples a task per episode on the host
(`np_random.choice` in `_setup`) from a nested probability tree attached to a
`gym.spaces.Tuple`/`Discrete` task space.  Here the task space is the same
nested structure, but the per-episode task index lives in the functional env
state (`state.blocks['task']`) so sampling-at-reset and resampling-at-auto-
reset happen *inside* the jitted rollout — see `jiminy_tpu.rl.ppo.make_train`
(`curriculum=` argument) and `jiminy_tpu.rl.curriculum.TaskCurriculum`.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from jiminy_tpu.gym.pipeline import _Wrapper


class TaskSpace:
    """Arbitrarily nested task space: branches are tuples, leaves are ints
    (the size of a discrete task set) — the reference's `gym.spaces.Tuple` /
    `Discrete` trees (`meta_envs.py:158-166`) without the gymnasium dependency
    in the hot path.

    Example (the tree from the reference docstring)::

        TaskSpace(((3, 1, 2), 1, (2, 1, 1, (2, 1))))

    Tasks are identified by flat index (0..num_tasks-1) or by path, e.g.
    task 0 has path (0, 0, 0).  Every path prefix is a *node*; siblings under
    one parent form a *group* — the curriculum computes a softmin probability
    within each group and the flat task probability is the product of the
    group probabilities along the task's path (reference `proba_task_tree`).
    """

    def __init__(self, tree):
        self.tree = tree
        paths: List[Tuple[int, ...]] = []

        def walk(node, prefix):
            if isinstance(node, int):
                for i in range(node):
                    paths.append((*prefix, i))
            else:
                for i, child in enumerate(node):
                    walk(child, (*prefix, i))

        walk(tree, ())
        self.paths: Tuple[Tuple[int, ...], ...] = tuple(paths)
        self.num_tasks = len(paths)

        # All path prefixes = scoring nodes (reference logs episode scores to
        # `task_path[:i+1]` for every i, `rllib/curriculum.py:330-340`).
        node_index: Dict[Tuple[int, ...], int] = {}
        for path in paths:
            for i in range(1, len(path) + 1):
                node_index.setdefault(path[:i], len(node_index))
        self.node_paths = tuple(node_index)
        self.num_nodes = len(node_index)

        # Sibling groups: nodes sharing a parent prefix (incl. the root group)
        groups: Dict[Tuple[int, ...], List[int]] = {}
        for path, idx in node_index.items():
            groups.setdefault(path[:-1], []).append(idx)
        self.groups: Tuple[Tuple[int, ...], ...] = tuple(
            tuple(v) for v in groups.values()
        )

        # (num_tasks, max_depth) node index along each task's path, -1 padded
        depth = max(len(p) for p in paths)
        mat = -np.ones((self.num_tasks, depth), np.int32)
        for t, path in enumerate(paths):
            for i in range(1, len(path) + 1):
                mat[t, i - 1] = node_index[path[:i]]
        self.leaf_nodes = mat

    def uniform_flat_probs(self) -> np.ndarray:
        """Flat task probabilities of the evenly-distributed tree (reference
        `meta_envs.py:136-153`: 1/size at every branch, NOT uniform over
        leaves)."""
        sizes: Dict[Tuple[int, ...], int] = {}

        def walk(node, prefix):
            if isinstance(node, int):
                for i in range(node):
                    sizes[(*prefix, i)] = node
            else:
                for i, child in enumerate(node):
                    sizes[(*prefix, i)] = len(node)
                    walk(child, (*prefix, i))

        walk(self.tree, ())
        probs = np.ones(self.num_tasks)
        for t, path in enumerate(self.paths):
            for i in range(1, len(path) + 1):
                probs[t] /= sizes[path[:i]]
        return probs


class TaskSettableWrapper(_Wrapper):
    """Task-settable env layer (reference `BaseTaskSettableWrapper`,
    `toolbox/wrappers/meta_envs.py:27`): carries a per-episode flat task index
    in `state.blocks['task']`, applies it to the env state through a pure
    `apply_task(env, state, task_index) -> state` transform, and (optionally)
    augments the observation with the one-hot task encoding (the jit-friendly
    equivalent of the reference's `Discrete` obs augmentation).

    Sampling: `reset` draws the task from `initial_probs` (default: the
    evenly-distributed tree).  During training, task *re*-sampling at
    auto-reset is driven by the curriculum's live probabilities — see
    `rl.ppo.make_train(curriculum=...)`, which calls `set_task_state`.
    """

    def __init__(
        self,
        env,
        task_space: TaskSpace,
        apply_task: Optional[Callable] = None,
        augment_observation: bool = True,
        initial_probs: Optional[np.ndarray] = None,
    ):
        super().__init__(env)
        if not isinstance(task_space, TaskSpace):
            task_space = TaskSpace(task_space)
        self.task_space = task_space
        self.apply_task = apply_task
        self.augment_observation = augment_observation
        probs = (
            task_space.uniform_flat_probs()
            if initial_probs is None
            else np.asarray(initial_probs, np.float64)
        )
        assert abs(probs.sum() - 1.0) < 1e-6
        self._initial_probs = probs

    # -- functional task plumbing ----------------------------------------- #
    def set_task_state(self, state, task_index):
        """Write the task index into the env state and apply its effect."""
        blocks = {**state.blocks, "task": jnp.asarray(task_index, jnp.int32)}
        state = state.replace(blocks=blocks)
        if self.apply_task is not None:
            state = self.apply_task(self.env, state, task_index)
        return state

    def task_index(self, state):
        return state.blocks["task"]

    def reset(self, key):
        k_env, k_task = jax.random.split(key)
        state, _ = self.env.reset(k_env)
        logits = jnp.log(jnp.asarray(self._initial_probs, jnp.float32))
        idx = jax.random.categorical(k_task, logits)
        state = self.set_task_state(state, idx)
        return state, self.observe(state)

    def step(self, state, action):
        task = state.blocks["task"]
        state, _, reward, terminated, truncated, info = self.env.step(
            state, action
        )
        # Inner layers drop unknown block entries only if they rebuild blocks
        # wholesale; re-attach the task to be safe.
        if "task" not in state.blocks:
            state = state.replace(blocks={**state.blocks, "task": task})
        info = dict(info, task_index=state.blocks["task"])
        return state, self.observe(state), reward, terminated, truncated, info

    def observe(self, state):
        obs = self.env.observe(state)
        if not self.augment_observation:
            return obs
        one_hot = jax.nn.one_hot(
            state.blocks["task"], self.task_space.num_tasks,
            dtype=state.sim.q.dtype,
        )
        if isinstance(obs, dict):
            return {**obs, "task": one_hot}
        # Flat-vector base observations (toy envs): keyed pytree on top
        return {"obs": obs, "task": one_hot}


class TaskSettableEnv(_Wrapper):
    """Host-side flat task-settable wrapper (kept from round 3 for eager
    workflows; the jit-native hierarchical layer above supersedes it)."""

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
        rng = rng or np.random.default_rng()
        return [self.tasks[i] for i in rng.integers(0, len(self.tasks), n)]

    def reset(self, key):
        return self.env.reset(key)


class TrajectorySettableWrapper(TaskSettableWrapper):
    """Expose the reference trajectories of a `TrajectoryDataset` as the flat
    tasks of a task-settable env (reference `TrajectorySettableJiminyEnv`,
    `toolbox/wrappers/meta_envs.py:364`): each episode samples one trajectory
    index, and `ReferenceQuantity(..., task_indexed=True)` / tracking targets
    built with `make_tracking_target(..., task_indexed=True)` read the
    matching trajectory from the stacked device bank inside jit — the
    jit-native form of the reference's host-side
    `trajectory_dataset.select(name)` per episode."""

    def __init__(self, env, dataset, augment_observation: bool = True,
                 initial_probs=None):
        if len(dataset) == 0:
            raise RuntimeError(
                "the trajectory dataset must hold at least one trajectory "
                "before wrapping (reference meta_envs.py:398 lock check)"
            )
        self.dataset = dataset
        self.trajectory_names = tuple(dataset)
        super().__init__(
            env,
            TaskSpace((len(dataset),)),
            apply_task=None,
            augment_observation=augment_observation,
            initial_probs=initial_probs,
        )

    def trajectory_state(self, state):
        """(q_ref, v_ref) of the episode's trajectory at the current time."""
        return self.dataset.state_at(state.sim.t, state.blocks["task"])
