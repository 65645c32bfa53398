"""Model randomization: biased dynamical parameters for robustness training.

Re-design of `Model::addBiasedToExtendedModel` (reference `model.cc:1166-1236`):
gaussian bias on body mass / CoM / inertia and uniform bias on joint placements,
under an explicit PRNG key.  Returns a new `RobotModel` (all biased values are
array leaves, so a *batch* of biased models can be built with `vmap` and fed to
the functional engine paths that accept model arrays; the reference regenerates
one biased model per process reset instead).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from jiminy_tpu.models.model import RobotModel


def randomize_model(
    model: RobotModel,
    key,
    mass_std: float = 0.0,
    com_std: float = 0.0,
    inertia_std: float = 0.0,
    placement_std: float = 0.0,
    friction_lower_ratio: float = 0.0,
) -> RobotModel:
    """Gaussian relative bias of masses/inertias, absolute bias of CoM and
    joint placements.  std arguments are relative ratios (reference
    `std_ratio` semantics in `WalkerJiminyEnv`)."""
    k_m, k_c, k_i, k_p = jax.random.split(key, 4)
    nj = model.njoints
    mass = model.mass
    if mass_std > 0.0:
        mass = mass * (1.0 + mass_std * jax.random.normal(k_m, (nj,), mass.dtype))
        mass = jnp.maximum(mass, 0.0)
    com = model.com
    if com_std > 0.0:
        com = com + com_std * jax.random.normal(k_c, com.shape, com.dtype)
    inertia = model.inertia
    if inertia_std > 0.0:
        scale = 1.0 + inertia_std * jax.random.normal(k_i, (nj, 1, 1), inertia.dtype)
        inertia = inertia * scale
    jpos = model.jplacement_pos
    if placement_std > 0.0:
        jpos = jpos + placement_std * jax.random.uniform(
            k_p, jpos.shape, jpos.dtype, -1.0, 1.0
        )
    return model.replace(mass=mass, com=com, inertia=inertia, jplacement_pos=jpos)


def randomize_robot(robot, key, **kwargs):
    """Robot with a biased extended model (hardware untouched)."""
    return robot.replace(model=randomize_model(robot.model, key, **kwargs))
