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


class ReferencePositionVector(Quantity):
    """Reference configuration with the odometry pose (x, y, yaw) overwritten
    by the TRUE one (reference `ReferencePositionVector`,
    `quantities/locomotion.py:561`): decouples tracking the odometry from
    tracking body-part poses / joint configurations.

    `odometry_mode`: "base" (floating-base pose), "foot" (mean foot pose,
    the reference's recommendation) or None (keep the reference odometry)."""

    def __init__(self, dataset: TrajectoryDataset, odometry_mode="foot"):
        self.dataset = dataset
        self.odometry_mode = odometry_mode

    def _odometry(self, env, state):
        from jiminy_tpu.quantities.locomotion import (
            BaseOdometryPose,
            MultiFootMeanOdometryPose,
        )

        q = (
            MultiFootMeanOdometryPose()
            if self.odometry_mode == "foot"
            else BaseOdometryPose()
        )
        return q(env, state)

    def __call__(self, env, state):
        q_ref, v_ref = self.dataset.state_at(state.sim.t)
        if self.odometry_mode is None:
            return q_ref
        sim_ref = state.sim.replace(
            q=q_ref,
            v=v_ref if v_ref is not None else jnp.zeros_like(state.sim.v),
        )
        o_true = self._odometry(env, state)
        o_ref = self._odometry(env, state.replace(sim=sim_ref))
        dyaw = o_true[..., 2] - o_ref[..., 2]
        c, s = jnp.cos(dyaw), jnp.sin(dyaw)
        # Base position relative to the reference odometry origin, rotated by
        # the yaw mismatch, re-anchored at the true odometry origin.
        rel = q_ref[..., 0:2] - o_ref[..., 0:2]
        xy = jnp.stack(
            [
                o_true[..., 0] + c * rel[..., 0] - s * rel[..., 1],
                o_true[..., 1] + s * rel[..., 0] + c * rel[..., 1],
            ],
            axis=-1,
        )
        # Rotate the base quaternion by Rz(dyaw): q' = qz(dyaw) * q_ref
        half = 0.5 * dyaw
        qz = jnp.stack(
            [jnp.zeros_like(half), jnp.zeros_like(half), jnp.sin(half),
             jnp.cos(half)],
            axis=-1,
        )
        from jiminy_tpu.ops import lie

        quat = lie.quat_mul(qz, q_ref[..., 3:7])
        return jnp.concatenate([xy, q_ref[..., 2:3], quat, q_ref[..., 7:]], axis=-1)
