"""Generic reward/termination compositions (reference
`bases/compositions.py:88-577`, `compositions/generic.py`, `compositions/mixin.py`).

All compositions are callables with the `ComposedEnv` reward signature
`(env, prev_state, action, next_state) -> float` and termination signature
`(env, state) -> bool`, so they plug directly into the pipeline layer.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import jax.numpy as jnp

CUTOFF_ESP = 1.0e-2  # attenuation at the cutoff distance (reference mixin.py)


def radial_basis_function(error, cutoff: float, order: int = 2, value_ndim: int = 1):
    """RBF kernel reward transform (reference `radial_basis_function`):
    CUTOFF_ESP ** ((‖error‖_order / cutoff)²) — 1.0 at zero error, CUTOFF_ESP
    at the cutoff distance.  `value_ndim` trailing axes form the error vector
    (flattened together); leading axes are batch."""
    error = jnp.atleast_1d(jnp.asarray(error))
    vnd = max(min(value_ndim, error.ndim), 1)
    flat = error.reshape(error.shape[: error.ndim - vnd] + (-1,))
    if order == 2:
        sq = jnp.sum(flat * flat, axis=-1) / cutoff**2
    else:
        sq = (
            jnp.sum(jnp.abs(flat) ** order, axis=-1) ** (1.0 / order) / cutoff
        ) ** 2
    return CUTOFF_ESP**sq


class QuantityReward:
    """Reward = transform(quantity(next_state)) (reference `QuantityReward`)."""

    def __init__(self, name: str, quantity, transform: Optional[Callable] = None,
                 is_normalized: bool = False):
        self.name = name
        self.quantity = quantity
        self.transform = transform
        self.is_normalized = is_normalized

    def __call__(self, env, prev_state, action, next_state):
        value = self.quantity(env, next_state)
        if self.transform is not None:
            value = self.transform(value)
        return jnp.asarray(value)


class SurviveReward:
    """+1 while alive (reference `SurviveReward`)."""

    name = "reward_survive"

    def __call__(self, env, prev_state, action, next_state):
        return jnp.asarray(1.0)


class TrackingQuantityReward(QuantityReward):
    """RBF-kernel tracking reward: exp-shaped reward of the error between the
    quantity and its target (reference `TrackingQuantityReward`; the reference
    compares against a reference-trajectory dataset — a fixed or callable
    target covers both uses here)."""

    def __init__(self, name: str, quantity, target, cutoff: float, order: int = 2,
                 value_ndim: int = 1):
        super().__init__(name, quantity, is_normalized=True)
        self.target = target
        self.cutoff = cutoff
        self.order = order
        self.value_ndim = value_ndim

    def __call__(self, env, prev_state, action, next_state):
        value = self.quantity(env, next_state)
        target = self.target(env, next_state) if callable(self.target) else self.target
        return radial_basis_function(
            value - target, self.cutoff, self.order, self.value_ndim
        )


class TrackingActuatedJointPositionsReward(TrackingQuantityReward):
    """RBF tracking of all actuated joint positions (reference
    `TrackingActuatedJointPositionsReward`, `compositions/generic.py:125`)."""

    def __init__(self, target, cutoff: float):
        from jiminy_tpu.quantities.generic import MultiActuatedJointKinematic

        super().__init__(
            "reward_tracking_actuated_joint_positions",
            MultiActuatedJointKinematic("position"),
            target,
            cutoff,
        )


class MinimizeMechanicalPowerConsumption(QuantityReward):
    """RBF-shaped penalty on total mechanical power (reference
    `MinimizeMechanicalPowerConsumption`, `compositions/generic.py:153`)."""

    def __init__(self, cutoff: float = 100.0, generator_mode: str = "penalize"):
        from jiminy_tpu.quantities.generic import AverageMechanicalPowerConsumption

        super().__init__(
            "reward_power_consumption",
            AverageMechanicalPowerConsumption(generator_mode),
            transform=lambda p: radial_basis_function(p[..., None], cutoff),
            is_normalized=True,
        )


class QuantityTermination:
    """Terminate when a quantity leaves [low, high] (reference
    `QuantityTermination`, `bases/compositions.py:398`)."""

    def __init__(self, name: str, quantity, low=None, high=None,
                 grace_period: float = 0.0):
        self.name = name
        self.quantity = quantity
        self.low = low
        self.high = high
        self.grace_period = grace_period

    def __call__(self, env, state):
        value = jnp.asarray(self.quantity(env, state))
        flat = value.reshape(value.shape if value.ndim == 0 else
                             value.shape[: value.ndim - 1] + (-1,))
        out = jnp.asarray(False)
        if self.low is not None:
            out = out | jnp.any(jnp.atleast_1d(flat) < self.low, axis=-1)
        if self.high is not None:
            out = out | jnp.any(jnp.atleast_1d(flat) > self.high, axis=-1)
        if self.grace_period > 0.0:
            out = out & (state.sim.t >= self.grace_period)
        return out


class DriftTrackingQuantityTermination(QuantityTermination):
    """Terminate when the drift |quantity − target| exceeds `max_drift`
    (reference `DriftTrackingQuantityTermination`, `compositions/generic.py:211`
    — there the drift is the delta over a horizon between TRUE and REFERENCE
    evaluation; wrap the quantity/target in `DeltaQuantity` to reproduce the
    horizon semantics)."""

    def __init__(self, name: str, quantity, target, max_drift: float,
                 grace_period: float = 0.0):
        super().__init__(name, quantity, grace_period=grace_period)
        self.target = target
        self.max_drift = max_drift

    def __call__(self, env, state):
        value = jnp.asarray(self.quantity(env, state))
        target = self.target(env, state) if callable(self.target) else self.target
        err = jnp.atleast_1d(value - target)
        out = jnp.linalg.norm(
            err.reshape(err.shape[: err.ndim - 1] + (-1,)), axis=-1
        ) > self.max_drift
        if self.grace_period > 0.0:
            out = out & (state.sim.t >= self.grace_period)
        return out


class ShiftTrackingQuantityTermination(DriftTrackingQuantityTermination):
    """Terminate when the tracking shift (instantaneous deviation from the
    target) exceeds `max_shift` (reference `ShiftTrackingQuantityTermination`,
    `compositions/generic.py:356`; the reference takes the min deviation over
    a stacked window — the per-step deviation is the window-1 case)."""

    def __init__(self, name: str, quantity, target, max_shift: float,
                 grace_period: float = 0.0):
        super().__init__(name, quantity, target, max_shift, grace_period)


class MechanicalSafetyTermination:
    """Terminate when a motor position is at its bound while its velocity
    still pushes outward past the limit (reference
    `MechanicalSafetyTermination`, `compositions/generic.py:505`)."""

    def __init__(self, position_margin: float = 0.0,
                 velocity_max: float = float("inf")):
        self.position_margin = position_margin
        self.velocity_max = velocity_max

    def __call__(self, env, state):
        import jax.numpy as _jnp

        model = env.robot.model
        motors = env.robot.motors
        qidx = _jnp.asarray(motors.q_indices, _jnp.int32)
        vidx = _jnp.asarray(motors.v_indices, _jnp.int32)
        q = _jnp.take(state.sim.q, qidx, axis=-1)
        v = _jnp.take(state.sim.v, vidx, axis=-1)
        lo = _jnp.take(_jnp.asarray(model.position_limit_lower), qidx, axis=-1)
        hi = _jnp.take(_jnp.asarray(model.position_limit_upper), qidx, axis=-1)
        at_low = (q <= lo + self.position_margin) & (v < -self.velocity_max)
        at_high = (q >= hi - self.position_margin) & (v > self.velocity_max)
        return jnp.any(at_low | at_high, axis=-1)


class MechanicalPowerConsumptionTermination(QuantityTermination):
    """Terminate on excessive total mechanical power (reference
    `MechanicalPowerConsumptionTermination`, `compositions/generic.py:598`)."""

    def __init__(self, max_power: float, generator_mode: str = "penalize",
                 grace_period: float = 0.0):
        from jiminy_tpu.quantities.generic import AverageMechanicalPowerConsumption

        super().__init__(
            "termination_power_consumption",
            AverageMechanicalPowerConsumption(generator_mode),
            high=max_power,
            grace_period=grace_period,
        )


class ShiftTrackingMotorPositionsTermination(ShiftTrackingQuantityTermination):
    """Terminate when actuated joint positions deviate from their target by
    more than `max_shift` (reference `ShiftTrackingMotorPositionsTermination`,
    `compositions/generic.py:664`)."""

    def __init__(self, target, max_shift: float, grace_period: float = 0.0):
        from jiminy_tpu.quantities.generic import MultiActuatedJointKinematic

        super().__init__(
            "termination_tracking_motor_positions",
            MultiActuatedJointKinematic("position"),
            target,
            max_shift,
            grace_period,
        )


class AdditiveMixtureReward:
    """Weighted sum of rewards (reference `AdditiveMixtureReward`)."""

    name = "reward_total"

    def __init__(self, components: Sequence, weights: Optional[Sequence[float]] = None):
        self.components = tuple(components)
        self.weights = tuple(weights) if weights is not None else (1.0,) * len(components)

    def __call__(self, env, prev_state, action, next_state):
        total = 0.0
        for w, comp in zip(self.weights, self.components):
            total = total + w * comp(env, prev_state, action, next_state)
        return total


class MultiplicativeMixtureReward:
    """Product of rewards (reference `MultiplicativeMixtureReward`)."""

    name = "reward_product"

    def __init__(self, components: Sequence):
        self.components = tuple(components)

    def __call__(self, env, prev_state, action, next_state):
        total = 1.0
        for comp in self.components:
            total = total * comp(env, prev_state, action, next_state)
        return total
