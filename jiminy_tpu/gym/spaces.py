"""Nested-space utilities (reference `gym_jiminy/common/utils/spaces.py`):
zeros/clip/contains over pytrees of bounds — the reference generates
allocation-free code at runtime (`build_reduce`/`build_map`, spaces.py:290-660);
under jit that machinery is unnecessary (XLA fuses and never allocates per op),
so these are plain pytree maps with the same semantics.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp


class Bounds(NamedTuple):
    """A leaf space: element-wise bounds."""

    low: Any
    high: Any


def zeros(space) -> Any:
    """Zero element of a (nested) space of Bounds."""
    return jax.tree.map(
        lambda b: jnp.zeros(jnp.shape(b.low)), space,
        is_leaf=lambda x: isinstance(x, Bounds),
    )


def clip(space, value) -> Any:
    """Clip a value pytree to its space bounds (reference `clip`)."""
    return jax.tree.map(
        lambda b, v: jnp.clip(v, b.low, b.high), space, value,
        is_leaf=lambda x: isinstance(x, Bounds),
    )


def contains(space, value) -> jnp.ndarray:
    """Whether value lies inside the space, all leaves combined."""
    leaves = jax.tree.leaves(
        jax.tree.map(
            lambda b, v: jnp.all((v >= b.low) & (v <= b.high)), space, value,
            is_leaf=lambda x: isinstance(x, Bounds),
        )
    )
    out = jnp.asarray(True)
    for leaf in leaves:
        out = out & leaf
    return out


def sample(space, key) -> Any:
    """Uniform sample from a (bounded) space."""
    leaves, treedef = jax.tree.flatten(
        space, is_leaf=lambda x: isinstance(x, Bounds)
    )
    keys = jax.random.split(key, len(leaves))
    vals = [
        b.low + (b.high - b.low) * jax.random.uniform(k, jnp.shape(b.low))
        for b, k in zip(leaves, keys)
    ]
    return jax.tree.unflatten(treedef, vals)
