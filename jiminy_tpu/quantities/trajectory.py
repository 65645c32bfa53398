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
        self._stack_cache = None
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

    def __len__(self) -> int:
        return len(self._trajs)

    def __iter__(self):
        return iter(self._trajs)

    def state_at(self, t, index=None):
        """(q_ref, v_ref) at time t — from the host-`select`ed trajectory, or,
        when `index` (a traced int) is given, gathered from the stacked bank
        of ALL trajectories (per-episode trajectory tasks; role of the
        reference's `TrajectorySettableJiminyEnv.set_task`,
        `toolbox/wrappers/meta_envs.py:424`)."""
        if index is None:
            return self.selected.state_at(t)
        qs, vs, ns = self._stacked()
        n_max = qs.shape[1]
        step = jnp.clip(
            jnp.round(t / self.step_dt).astype(jnp.int32), 0,
            jnp.take(ns, index) - 1,
        )
        flat = index * n_max + step
        q = jnp.take(qs.reshape((-1,) + qs.shape[2:]), flat, axis=0)
        v = (
            jnp.take(vs.reshape((-1,) + vs.shape[2:]), flat, axis=0)
            if vs is not None else None
        )
        return q, v

    def _stacked(self):
        """Padded (K, Tmax, nq)/(K, Tmax, nv) bank + per-trajectory lengths
        (built lazily, cached; edge-padded so clamping stays in-trajectory)."""
        if getattr(self, "_stack_cache", None) is None:
            trajs = list(self._trajs.values())
            n_max = max(tr.n for tr in trajs)

            def pad(arr):
                a = np.asarray(arr)
                return np.concatenate(
                    [a, np.repeat(a[-1:], n_max - len(a), axis=0)], axis=0
                )

            # Cache host numpy (NOT jnp): building device constants inside a
            # jit trace and caching them would leak tracers across traces.
            qs = np.stack([pad(tr.qs) for tr in trajs])
            has_v = all(tr.vs is not None for tr in trajs)
            vs = np.stack([pad(tr.vs) for tr in trajs]) if has_v else None
            ns = np.array([tr.n for tr in trajs], np.int32)
            self._stack_cache = (qs, vs, ns)
        return self._stack_cache


class ReferenceQuantity(Quantity):
    """Evaluate an inner quantity on the REFERENCE trajectory state at the
    current sim time (reference `QuantityEvalMode.REFERENCE`).

    The inner quantity receives a shallow env-state clone whose `sim.q/v` come
    from the dataset; quantities reading only q/v/t (frame kinematics, CoM,
    odometry...) work unchanged."""

    def __init__(self, inner: Quantity, dataset: TrajectoryDataset,
                 task_indexed: bool = False):
        self.inner = inner
        self.dataset = dataset
        # When True, the reference trajectory follows the per-episode task
        # index carried in `state.blocks['task']` (trajectory-as-task envs,
        # `toolbox.meta_envs.TrajectorySettableWrapper`).
        self.task_indexed = task_indexed

    def __call__(self, env, state):
        index = state.blocks["task"] if self.task_indexed else None
        q_ref, v_ref = self.dataset.state_at(state.sim.t, index)
        sim_ref = state.sim.replace(
            q=q_ref, v=v_ref if v_ref is not None else jnp.zeros_like(state.sim.v)
        )
        return self.inner(env, state.replace(sim=sim_ref))


def make_tracking_target(quantity: Quantity, dataset: TrajectoryDataset,
                         task_indexed: bool = False):
    """Target callable for `TrackingQuantityReward`: the quantity evaluated on
    the reference trajectory (completing the reference's tracking-reward
    semantics, `compositions/generic.py:64`).  With `task_indexed=True` the
    trajectory follows the episode's task index (trajectory-as-task envs)."""
    ref = ReferenceQuantity(quantity, dataset, task_indexed=task_indexed)
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
