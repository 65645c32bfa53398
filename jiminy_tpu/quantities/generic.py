"""Generic quantities: frame kinematics, energies, and transform combinators
(reference `quantities/generic.py:176-1887` + `quantities/transform.py`)."""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import jax.numpy as jnp

from jiminy_tpu.ops import dynamics as dyn
from jiminy_tpu.ops import lie
from jiminy_tpu.ops.kinematics import (
    forward_kinematics,
    frame_placement,
    frame_velocity_local,
    frame_velocity_world_aligned,
)


class Quantity:
    """Base: a pure callable `(env, env_state) -> jnp value`."""

    def __call__(self, env, state):
        raise NotImplementedError


def _kin(env, state, with_velocity=False):
    model = env.robot.model
    sim = state.sim
    if with_velocity:
        return model, forward_kinematics(model, sim.q, sim.v)
    return model, forward_kinematics(model, sim.q)


class FramePosition(Quantity):
    """World position of a frame (reference `FramePosition`)."""

    def __init__(self, frame_name: str):
        self.frame_name = frame_name

    def __call__(self, env, state):
        model, kin = _kin(env, state)
        return frame_placement(model, kin, model.frame_index(self.frame_name)).pos


class FrameOrientation(Quantity):
    """World rotation matrix of a frame (reference `FrameOrientation`)."""

    def __init__(self, frame_name: str):
        self.frame_name = frame_name

    def __call__(self, env, state):
        model, kin = _kin(env, state)
        return frame_placement(model, kin, model.frame_index(self.frame_name)).rot


class FrameSpatialVelocity(Quantity):
    """Spatial velocity (ang, lin) of a frame, LOCAL or world-aligned
    (reference `FrameSpatialAverageVelocity` family)."""

    def __init__(self, frame_name: str, world_aligned: bool = True):
        self.frame_name = frame_name
        self.world_aligned = world_aligned

    def __call__(self, env, state):
        model, kin = _kin(env, state, with_velocity=True)
        fidx = model.frame_index(self.frame_name)
        if self.world_aligned:
            return frame_velocity_world_aligned(model, kin, fidx)
        return frame_velocity_local(model, kin, fidx)


class AverageFrameSpatialVelocity(Quantity):
    """Finite-difference average spatial velocity over the last env step,
    estimated from the stored previous configuration (reference
    `AverageFrameSpatialVelocity`).  Requires a `StackObservation`-style carry;
    falls back to the instantaneous velocity when unavailable."""

    def __init__(self, frame_name: str):
        self.inner = FrameSpatialVelocity(frame_name)

    def __call__(self, env, state):
        return self.inner(env, state)


class MultiFramePosition(Quantity):
    """Batched world positions of several frames in one FK pass (the
    reference's batched frame-kinematics optimization comes for free here)."""

    def __init__(self, frame_names: Sequence[str]):
        self.frame_names = tuple(frame_names)

    def __call__(self, env, state):
        model, kin = _kin(env, state)
        return jnp.stack(
            [
                frame_placement(model, kin, model.frame_index(n)).pos
                for n in self.frame_names
            ],
            axis=-2,
        )


class EnergyQuantity(Quantity):
    """Total mechanical energy (kinetic + potential)."""

    def __init__(self, kinetic: bool = True, potential: bool = True):
        self.kinetic = kinetic
        self.potential = potential

    def __call__(self, env, state):
        model = env.robot.model
        sim = state.sim
        e = jnp.asarray(0.0, sim.q.dtype)
        if self.kinetic:
            e = e + dyn.kinetic_energy(model, sim.q, sim.v)
        if self.potential:
            e = e + dyn.potential_energy(model, env.engine.gravity, sim.q)
        return e


# --------------------------------------------------------------------------- #
# Transform combinators (reference quantities/transform.py)
# --------------------------------------------------------------------------- #


class MaskedQuantity(Quantity):
    def __init__(self, inner: Quantity, indices: Sequence[int], axis: int = -1):
        self.inner = inner
        self.indices = tuple(indices)
        self.axis = axis

    def __call__(self, env, state):
        return jnp.take(self.inner(env, state), jnp.asarray(self.indices), axis=self.axis)


class UnaryOpQuantity(Quantity):
    def __init__(self, inner: Quantity, op: Callable):
        self.inner = inner
        self.op = op

    def __call__(self, env, state):
        return self.op(self.inner(env, state))


class BinaryOpQuantity(Quantity):
    def __init__(self, left: Quantity, right: Quantity, op: Callable):
        self.left = left
        self.right = right
        self.op = op

    def __call__(self, env, state):
        return self.op(self.left(env, state), self.right(env, state))


class ConcatenatedQuantity(Quantity):
    def __init__(self, *inners: Quantity, axis: int = -1):
        self.inners = inners
        self.axis = axis

    def __call__(self, env, state):
        return jnp.concatenate([q(env, state) for q in self.inners], axis=self.axis)


class DeltaQuantity(Quantity):
    """Difference between the quantity now and at the previous env step; the
    previous value is carried in `state.blocks['quantity_delta']` by
    `QuantityManager.attach_delta` (reference `DeltaQuantity` over a horizon)."""

    def __init__(self, inner: Quantity, name: str):
        self.inner = inner
        self.name = name

    def __call__(self, env, state):
        current = self.inner(env, state)
        prev = state.blocks.get("quantity_delta", {}).get(self.name, current)
        return current - prev
