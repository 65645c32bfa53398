"""Host-callback bridge for arbitrary (non-jittable) Python controllers.

The reference engine calls user controllers through a C++→Python functor at
every controller update period (`control/controller_functor.h:27-84`,
`gym_jiminy` `interfaces.py:331`).  In this framework controllers are normally
pure jittable functions fused into the rollout program; this module provides
the escape hatch for arbitrary host Python (numpy code, learned policies in
other frameworks, hardware-in-the-loop): a `jax.pure_callback` that crosses to
the host once per controller period — the same boundary and cost profile as
the reference's bridge (slow path; keep jittable controllers for throughput).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np


def host_controller(
    fn: Callable,
    n_motors: int,
    dtype=None,
) -> Callable:
    """Wrap a host Python function as an engine controller.

    `fn(t, q, v, measurements) -> (n_motors,) array-like` receives numpy
    arrays (batched leading dims included when the engine state is batched)
    and runs on the host, outside the compiled program.  The returned callable
    has the `Engine.controller` signature and is safe to use inside `jit`,
    `scan` and `vmap` (vmapped calls receive the full batch in one host call).

    Example:
        >>> def pd(t, q, v, meas):
        ...     return kp * (q_target - q[..., -n:]) - kd * v[..., -n:]
        >>> engine.controller = host_controller(pd, robot.nmotors)
    """

    def controller(t, q, v, measurements):
        out_dtype = dtype or q.dtype
        # Batch = broadcast of ALL operand batch dims: under vmap some
        # operands may be unmapped (e.g. the constant t=0 of `Engine.reset`'s
        # fixed-point init) and arrive with size-1 batch dims.
        batch = jnp.broadcast_shapes(
            jnp.shape(t), jnp.shape(q)[:-1], jnp.shape(v)[:-1]
        )
        result_shape = jax.ShapeDtypeStruct(tuple(batch) + (n_motors,), out_dtype)

        def host_fn(t_, q_, v_, meas_):
            # Coerce to REAL numpy before handing off to user code: newer JAX
            # passes jax.Arrays into callbacks, and any indexing/math on those
            # dispatches an eager op on the callback thread — which deadlocks
            # against the enclosing computation on the CPU client.  The
            # reference's functor boundary hands out numpy views too
            # (`jiminy_pywrap/utilities.h` Eigen<->numpy), so this also matches
            # its semantics exactly.
            t_, q_, v_ = np.asarray(t_), np.asarray(q_), np.asarray(v_)
            meas_ = jax.tree.map(np.asarray, meas_)
            cmd = np.asarray(fn(t_, q_, v_, meas_), dtype=out_dtype)
            b = np.broadcast_shapes(
                np.shape(t_), np.shape(q_)[:-1], np.shape(v_)[:-1]
            )
            return np.broadcast_to(cmd, tuple(b) + (n_motors,))

        return jax.pure_callback(
            host_fn,
            result_shape,
            t,
            q,
            v,
            measurements,
            vmap_method="expand_dims",
        )

    return controller


def host_force(
    fn: Callable,
    dtype=None,
) -> Callable:
    """Wrap a host Python function as an external force profile
    `fn(t) -> (6,)` world-aligned wrench (see
    `Engine.register_profile_force`); host-crossing variant of the
    reference's Python force callbacks (`engine.h:630-645`)."""

    def force_fn(t):
        out_dtype = dtype or jnp.result_type(t)
        batch = jnp.shape(t)
        result_shape = jax.ShapeDtypeStruct(tuple(batch) + (6,), out_dtype)

        def host_fn(t_):
            w = np.asarray(fn(np.asarray(t_)), dtype=out_dtype)
            return np.broadcast_to(w, tuple(np.shape(t_)) + (6,))

        return jax.pure_callback(
            host_fn, result_shape, t, vmap_method="expand_dims"
        )

    return force_fn
