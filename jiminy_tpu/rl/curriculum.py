"""Task curriculum: score-driven task sampling for meta-env training.

Re-design of `gym_jiminy.rllib.curriculum.TaskSchedulingSamplingCallback`
(reference `rllib/curriculum.py:84`): a tree of task groups whose sampling
probabilities follow the *progress* (score delta) of each branch — tasks where
the agent is improving get sampled more, fully-learned or hopeless tasks decay
to a uniform exploration floor.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import numpy as np


class TaskScheduler:
    """Flat or nested task space with softened progress-proportional sampling.

    tasks: sequence of task identifiers (tuples for nested paths, e.g.
    ("stairs", "high")); the tree is rebuilt from the shared prefixes as in the
    reference's space-based tree construction.
    """

    def __init__(
        self,
        tasks: Sequence,
        softmin_beta: float = 1.0,
        explore_ratio: float = 0.2,
        history: int = 10,
        seed: int = 0,
    ):
        self.tasks = [t if isinstance(t, tuple) else (t,) for t in tasks]
        self.beta = softmin_beta
        self.explore_ratio = explore_ratio
        self.history = history
        self._scores: Dict[Tuple, list] = {t: [] for t in self.tasks}
        self._rng = np.random.default_rng(seed)

    # ------------------------------------------------------------------ #
    def update_task_score(self, task, score: float) -> None:
        task = task if isinstance(task, tuple) else (task,)
        buf = self._scores[task]
        buf.append(float(score))
        if len(buf) > 2 * self.history:
            del buf[: len(buf) - 2 * self.history]

    def _progress(self, task) -> float:
        buf = self._scores[task]
        if len(buf) < 2:
            return 1.0  # unexplored tasks look maximally promising
        half = max(len(buf) // 2, 1)
        return abs(float(np.mean(buf[half:]) - np.mean(buf[:half])))

    def probabilities(self) -> np.ndarray:
        deltas = np.array([self._progress(t) for t in self.tasks])
        if deltas.sum() <= 0:
            probs = np.ones(len(self.tasks)) / len(self.tasks)
        else:
            x = deltas / (deltas.max() + 1e-12)
            w = np.exp(self.beta * x)
            probs = w / w.sum()
        uniform = np.ones(len(self.tasks)) / len(self.tasks)
        return (1.0 - self.explore_ratio) * probs + self.explore_ratio * uniform

    def sample(self, n: int = 1):
        probs = self.probabilities()
        idx = self._rng.choice(len(self.tasks), size=n, p=probs)
        picked = [t[0] if len(t) == 1 else t for t in (self.tasks[i] for i in idx)]
        return picked[0] if n == 1 else picked

    def summary(self) -> Dict:
        return {
            "/".join(map(str, t)): {
                "mean_score": float(np.mean(s)) if s else None,
                "progress": self._progress(t),
            }
            for t, s in self._scores.items()
        }


# --------------------------------------------------------------------------- #
# In-jit task curriculum (reference `TaskSchedulingSamplingCallback`,
# `rllib/curriculum.py:84-500`)
# --------------------------------------------------------------------------- #


class TaskCurriculum:
    """Device-side, jit-transparent task curriculum over a hierarchical
    `jiminy_tpu.toolbox.meta_envs.TaskSpace`.

    Semantics follow the reference callback: every finished episode's
    standardized score (return / max episode steps) is logged to **all nodes
    along the task's tree path** under a moving average of horizon
    `history_length`; sibling groups turn node mean-scores into probabilities
    with a softmin (`exp(-beta * mean)`, unvisited nodes fall back to the
    group mean, all-unvisited groups to uniform — `curriculum.py:420-436`);
    the flat probability of a task is the product of the group probabilities
    along its path.  Low-scoring (hard) tasks get sampled more — the maximin
    objective from the reference docstring.

    Differences by design: the moving window is an incremental capped-count
    mean (an EMA with effective horizon `history_length`) instead of a stored
    ring of episodes — O(n_nodes) state, no host round trip; and the update
    runs inside the jitted train step, with the flat probabilities carried in
    `PPOState.task_probs` and consumed by the rollout's auto-reset resampling
    (replacing the reference's Ray `foreach_worker` probability broadcast,
    `curriculum.py:64-82`).
    """

    def __init__(self, task_space, softmin_beta: float = 3.0,
                 history_length: int = 100):
        from jiminy_tpu.toolbox.meta_envs import TaskSpace

        if not isinstance(task_space, TaskSpace):
            task_space = TaskSpace(task_space)
        self.space = task_space
        self.beta = float(softmin_beta)
        self.history = int(history_length)

    # -- state ------------------------------------------------------------- #
    def init_stats(self, dtype=None):
        import jax.numpy as jnp

        dtype = dtype or jnp.float32
        n = self.space.num_nodes
        return {
            "mean": jnp.zeros((n,), dtype),
            "count": jnp.zeros((n,), dtype),
        }

    # -- episode ingestion -------------------------------------------------- #
    def node_increments(self, task_index, score, valid):
        """Per-node (sum, count) increments from a batch of finished episodes.

        task_index, score, valid: arrays of identical shape (any rank);
        episodes with valid=False are ignored.  Returns ((n_nodes,) sums,
        (n_nodes,) counts).
        """
        import jax.numpy as jnp

        leaf_nodes = jnp.asarray(self.space.leaf_nodes)  # (num_tasks, depth)
        nodes = leaf_nodes[task_index.reshape(-1)]  # (N, depth)
        w = valid.reshape(-1).astype(score.dtype)
        s = score.reshape(-1)
        pad = nodes < 0
        nodes = jnp.where(pad, 0, nodes)
        w_full = jnp.where(pad, 0.0, w[:, None])
        n = self.space.num_nodes
        sums = jnp.zeros((n,), score.dtype).at[nodes].add(w_full * s[:, None])
        counts = jnp.zeros((n,), score.dtype).at[nodes].add(w_full)
        return sums, counts

    def update_stats(self, stats, sums, counts):
        """Fold batch increments into the moving node means (capped-count
        incremental mean of horizon `history_length`)."""
        import jax.numpy as jnp

        total = stats["count"] + counts
        new_mean = jnp.where(
            total > 0,
            (stats["mean"] * stats["count"] + sums) / jnp.maximum(total, 1e-9),
            stats["mean"],
        )
        return {
            "mean": new_mean,
            "count": jnp.minimum(total, float(self.history)),
        }

    # -- probabilities ------------------------------------------------------ #
    def node_probabilities(self, stats):
        """Within-group softmin probability of every node (reference
        `curriculum.py:420-436`)."""
        import jax.numpy as jnp

        mean, count = stats["mean"], stats["count"]
        probs = jnp.zeros_like(mean)
        for group in self.space.groups:
            idx = jnp.asarray(group)
            m = mean[idx]
            defined = count[idx] > 0
            n_def = jnp.sum(defined)
            # Unvisited nodes take the mean score of the visited siblings;
            # an all-unvisited group degenerates to uniform.
            fallback = jnp.sum(jnp.where(defined, m, 0.0)) / jnp.maximum(n_def, 1)
            m = jnp.where(defined, m, fallback)
            w = jnp.exp(-self.beta * (m - jnp.min(m)))
            w = jnp.where(n_def > 0, w, jnp.ones_like(w))
            probs = probs.at[idx].set(w / jnp.sum(w))
        return probs

    def flat_probabilities(self, stats):
        """Flat per-task sampling probabilities: product of the group
        probabilities along each task's path (reference `proba_task_tree_flat`,
        `meta_envs.py:210-225`)."""
        import jax.numpy as jnp

        node_p = self.node_probabilities(stats)
        mat = jnp.asarray(self.space.leaf_nodes)  # (num_tasks, depth)
        gathered = jnp.where(mat >= 0, node_p[jnp.where(mat < 0, 0, mat)], 1.0)
        flat = jnp.prod(gathered, axis=-1)
        return flat / jnp.sum(flat)
