"""Reference-trajectory datasets: REFERENCE evaluation mode for quantities.

Re-design of `DatasetTrajectoryQuantity` + `QuantityEvalMode.REFERENCE`
(reference `bases/quantities.py:870`): tracking rewards compare the TRUE value
of a quantity against its value on a reference trajectory at the current time.
For jit, the trajectory is pre-resampled onto a uniform time grid at build time;
lookup inside the step is one gather.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax.numpy as jnp
import numpy as np

from jiminy_tpu.quantities.generic import Quantity


class ReferenceTrajectory:
    """A trajectory resampled to the env's step grid, queryable inside jit."""

    def __init__(self, trajectory, step_dt: float, horizon: Optional[int] = None):
        n = horizon if horizon is not None else int(trajectory.duration / step_dt) + 1
        times = np.minimum(np.arange(n) * step_dt, trajectory.duration)
        res = trajectory.resample(times + float(trajectory.times[0]))
        self.qs = jnp.asarray(res.qs)
        self.vs = jnp.asarray(res.vs) if res.vs is not None else None
        self.step_dt = step_dt
        self.n = n

    def state_at(self, t):
        """(q_ref, v_ref) at time t (clamped, nearest-step)."""
        idx = jnp.clip(jnp.round(t / self.step_dt).astype(jnp.int32), 0, self.n - 1)
        q = jnp.take(self.qs, idx, axis=0)
        v = jnp.take(self.vs, idx, axis=0) if self.vs is not None else None
        return q, v


class TrajectoryDataset:
    """Named reference trajectories with one selected at a time (reference
    `DatasetTrajectoryQuantity.add/select`)."""

    def __init__(self, step_dt: float):
        self.step_dt = step_dt
        self._trajs: Dict[str, ReferenceTrajectory] = {}
        self._selected: Optional[str] = None

    def add(self, name: str, trajectory) -> None:
        self._trajs[name] = ReferenceTrajectory(trajectory, self.step_dt)
        if self._selected is None:
            self._selected = name

    def select(self, name: str) -> None:
        if name not in self._trajs:
            raise ValueError(f"unknown trajectory '{name}'")
        self._selected = name

    @property
    def selected(self) -> ReferenceTrajectory:
        if self._selected is None:
            raise RuntimeError("no reference trajectory registered")
        return self._trajs[self._selected]

    def state_at(self, t):
        return self.selected.state_at(t)


class ReferenceQuantity(Quantity):
    """Evaluate an inner quantity on the REFERENCE trajectory state at the
    current sim time (reference `QuantityEvalMode.REFERENCE`).

    The inner quantity receives a shallow env-state clone whose `sim.q/v` come
    from the dataset; quantities reading only q/v/t (frame kinematics, CoM,
    odometry...) work unchanged."""

    def __init__(self, inner: Quantity, dataset: TrajectoryDataset):
        self.inner = inner
        self.dataset = dataset

    def __call__(self, env, state):
        q_ref, v_ref = self.dataset.state_at(state.sim.t)
        sim_ref = state.sim.replace(
            q=q_ref, v=v_ref if v_ref is not None else jnp.zeros_like(state.sim.v)
        )
        return self.inner(env, state.replace(sim=sim_ref))


def make_tracking_target(quantity: Quantity, dataset: TrajectoryDataset):
    """Target callable for `TrackingQuantityReward`: the quantity evaluated on
    the reference trajectory (completing the reference's tracking-reward
    semantics, `compositions/generic.py:64`)."""
    ref = ReferenceQuantity(quantity, dataset)
    return lambda env, state: ref(env, state)
