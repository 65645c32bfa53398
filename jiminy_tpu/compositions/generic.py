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


def radial_basis_function(error, cutoff: float, order: int = 2):
    """RBF kernel reward transform (reference `radial_basis_function`):
    CUTOFF_ESP ** ((‖error‖_order / cutoff)²) — 1.0 at zero error, CUTOFF_ESP
    at the cutoff distance."""
    error = jnp.atleast_1d(jnp.asarray(error))
    flat = error.reshape(error.shape[: error.ndim - 1] + (-1,)) if error.ndim else error
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

    def __init__(self, name: str, quantity, target, cutoff: float, order: int = 2):
        super().__init__(name, quantity, is_normalized=True)
        self.target = target
        self.cutoff = cutoff
        self.order = order

    def __call__(self, env, prev_state, action, next_state):
        value = self.quantity(env, next_state)
        target = self.target(env, next_state) if callable(self.target) else self.target
        return radial_basis_function(value - target, self.cutoff, self.order)


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
