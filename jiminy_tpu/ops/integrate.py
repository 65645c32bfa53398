"""Configuration-space Lie-group operations: integrate / difference / interpolate.

Model-level retraction q (+) v*dt and its inverse, applied per joint according to its
Lie group — the XLA equivalent of the reference's `pinocchio::integrate/difference`
usage in the stepper (`core/include/jiminy/core/stepper/lie_group.h:417-470`).
"""

from __future__ import annotations

import jax.numpy as jnp

from jiminy_tpu.models import joints as jt
from jiminy_tpu.models.model import RobotModel


def integrate(model: RobotModel, q: jnp.ndarray, dv: jnp.ndarray) -> jnp.ndarray:
    """q (+) dv : apply a tangent-space increment to a configuration."""
    segs = []
    for i in range(model.njoints):
        q_j = q[..., model.q_slice(i)]
        dv_j = dv[..., model.v_slice(i)]
        segs.append(jt.integrate_joint(model.joint_types[i], q_j, dv_j))
    return jnp.concatenate(segs, axis=-1) if segs else q


def difference(model: RobotModel, q0: jnp.ndarray, q1: jnp.ndarray) -> jnp.ndarray:
    """q1 (-) q0 : tangent-space difference such that integrate(q0, d) ~= q1."""
    segs = []
    for i in range(model.njoints):
        segs.append(
            jt.difference_joint(
                model.joint_types[i], q0[..., model.q_slice(i)], q1[..., model.q_slice(i)]
            )
        )
    return (
        jnp.concatenate(segs, axis=-1)
        if segs
        else jnp.zeros(q0.shape[:-1] + (0,), q0.dtype)
    )


def normalize(model: RobotModel, q: jnp.ndarray) -> jnp.ndarray:
    """Re-normalize the unit-norm sub-vectors (quaternions, cos/sin pairs)."""
    segs = []
    for i in range(model.njoints):
        segs.append(jt.normalize_joint(model.joint_types[i], q[..., model.q_slice(i)]))
    return jnp.concatenate(segs, axis=-1) if segs else q


def interpolate(model: RobotModel, q0: jnp.ndarray, q1: jnp.ndarray, alpha) -> jnp.ndarray:
    """Geodesic interpolation between configurations."""
    return integrate(model, q0, difference(model, q0, q1) * alpha)
