"""Simulation state pytrees.

The whole mutable world of the reference engine (`RobotState`, `RobotData`,
`StepperState` — `engine/engine.h:56-160`) becomes one immutable pytree of arrays,
so a batch of simulations is just this pytree with a leading env axis.
"""

from __future__ import annotations

from typing import Any, Dict

import jax.numpy as jnp
from flax import struct


@struct.dataclass
class StepperState:
    """Adaptive-integrator bookkeeping (reference `stepper_state.{iter, iter_failed,
    dt, t}` introspection surface, SURVEY §5)."""

    dt: jnp.ndarray  # () current adaptive step size
    iterations: jnp.ndarray  # () int32 accepted internal steps
    iter_failed: jnp.ndarray  # () int32 rejected trial steps
    successive_iter_failed: jnp.ndarray  # () int32
    diverged: jnp.ndarray  # () bool — integration gave up (reference throws on
    # successiveIterFailedMax; here the env is flagged and frozen instead)


@struct.dataclass
class SimState:
    t: jnp.ndarray  # () simulation time
    q: jnp.ndarray  # (nq,)
    v: jnp.ndarray  # (nv,)
    a: jnp.ndarray  # (nv,)
    command: jnp.ndarray  # (nm,) motor-side commanded efforts (ZOH)
    u_motor: jnp.ndarray  # (nm,) realized motor efforts
    contact_forces: jnp.ndarray  # (ncontact, 3) linear ground forces, world axes
    stepper: StepperState
    sensor_rings: Dict[str, Any]
    measurements: Dict[str, jnp.ndarray]  # sensor group -> (n, ndata)
    key: jnp.ndarray  # PRNG key for sensor noise / randomization
    # Controller-period counter — phase reference for sensor updates when the
    # sensor period is a multiple of the controller period (the reference
    # supports arbitrary GCD-compatible periods, `engine.cc:1892-1940`)
    tick: jnp.ndarray = None  # () int32
    # Constraint-mode carry (zero-size arrays in spring-damper mode):
    contact_active: jnp.ndarray = None  # (nc,) bool hysteresis state
    bound_active: jnp.ndarray = None  # (nb,) bool
    lam: jnp.ndarray = None  # (N,) warm-started PGS multipliers
    distance_ref: jnp.ndarray = None  # (nd,) loop-closure reference lengths
    rolling_ref: jnp.ndarray = None  # (nr,) rolling-contact reference heights
    # Optional per-env model override (randomized dynamical parameters): a
    # RobotModel pytree whose ARRAY leaves replace the engine robot's — under
    # vmap each env then simulates its own biased model (the reference's
    # `addBiasedToExtendedModel` per-reset behavior, batched)
    model_params: Any = None
