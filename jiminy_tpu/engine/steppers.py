"""Lie-group ODE integrators: explicit Euler, RK4, adaptive Dormand–Prince 5(4).

TPU re-design of the reference steppers (`core/src/stepper/`): the state (q, v)
lives on a Lie group — increments are applied with the model retraction
``q (+) dt*v`` and errors measured with ``difference`` — and the adaptive DOPRI
loop runs in *masked lock-step*: every env in the batch executes the same bounded
`lax.while_loop`, envs that finished their period early just carry their state
through.  Error control follows the reference/boost-odeint scheme
(`runge_kutta_dopri_stepper.cc:18-82`): inf-norm of the 5th-vs-4th order solution
mismatch scaled by `tolAbs + tolRel * |state|`.

The dynamics callback has signature ``a = f(t, q, v)`` (aux-free closure built by
the engine).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from jiminy_tpu.models.model import RobotModel
from jiminy_tpu.ops import integrate as integ

# Dormand–Prince 5(4) Butcher tableau (public constants, Dormand & Prince 1980);
# step-adjustment constants follow boost::odeint as the reference does.
_DOPRI_A = np.array(
    [
        [0, 0, 0, 0, 0, 0, 0],
        [1 / 5, 0, 0, 0, 0, 0, 0],
        [3 / 40, 9 / 40, 0, 0, 0, 0, 0],
        [44 / 45, -56 / 15, 32 / 9, 0, 0, 0, 0],
        [19372 / 6561, -25360 / 2187, 64448 / 6561, -212 / 729, 0, 0, 0],
        [9017 / 3168, -355 / 33, 46732 / 5247, 49 / 176, -5103 / 18656, 0, 0],
        [35 / 384, 0, 500 / 1113, 125 / 192, -2187 / 6784, 11 / 84, 0],
    ]
)
_DOPRI_C = np.array([0.0, 1 / 5, 3 / 10, 4 / 5, 8 / 9, 1.0, 1.0])
_DOPRI_B = _DOPRI_A[-1]  # FSAL: 5th-order weights = last row
_DOPRI_E = np.array(
    [5179 / 57600, 0.0, 7571 / 16695, 393 / 640, -92097 / 339200, 187 / 2100, 1 / 40]
)
_SAFETY = 0.8
_ERROR_THRESHOLD = 0.5
_MIN_FACTOR = 0.2
_MAX_FACTOR = 5.0
_ORDER = 5.0


def euler_step(model: RobotModel, f: Callable, t, q, v, dt):
    """One explicit-Euler step (reference `EulerExplicitStepper`)."""
    a = f(t, q, v)
    q_new = integ.integrate(model, q, v * dt[..., None])
    v_new = v + a * dt[..., None]
    return q_new, v_new, a


def rk4_step(model: RobotModel, f: Callable, t, q, v, dt):
    """One classical RK4 step on the Lie group (reference `RungeKutta4Stepper`)."""
    dtc = dt[..., None]
    k1v, k1a = v, f(t, q, v)
    q2 = integ.integrate(model, q, 0.5 * dtc * k1v)
    v2 = v + 0.5 * dtc * k1a
    k2v, k2a = v2, f(t + 0.5 * dt, q2, v2)
    q3 = integ.integrate(model, q, 0.5 * dtc * k2v)
    v3 = v + 0.5 * dtc * k2a
    k3v, k3a = v3, f(t + 0.5 * dt, q3, v3)
    q4 = integ.integrate(model, q, dtc * k3v)
    v4 = v + dtc * k3a
    k4v, k4a = v4, f(t + dt, q4, v4)
    dq = (dtc / 6.0) * (k1v + 2.0 * k2v + 2.0 * k3v + k4v)
    dv = (dtc / 6.0) * (k1a + 2.0 * k2a + 2.0 * k3a + k4a)
    q_new = integ.integrate(model, q, dq)
    v_new = v + dv
    return q_new, v_new, k4a


def euler_step_stateful(model: RobotModel, f: Callable, t, q, v, dt, s):
    """`euler_step` with a stateful dynamics callback `(a, s') = f(t, q, v, s)`
    — used to chain the PGS warm start / active-set hysteresis through every
    dynamics evaluation (reference: `constraint->lambda_` persists across
    every solve, `constraint_solvers.cc:344,436-444`)."""
    a, s = f(t, q, v, s)
    q_new = integ.integrate(model, q, v * dt[..., None])
    v_new = v + a * dt[..., None]
    return q_new, v_new, a, s


def rk4_step_stateful(model: RobotModel, f: Callable, t, q, v, dt, s):
    """`rk4_step` with a stateful dynamics callback (see `euler_step_stateful`):
    each RK stage warm-starts the constraint solve from the previous stage."""
    dtc = dt[..., None]
    k1a, s = f(t, q, v, s)
    q2 = integ.integrate(model, q, 0.5 * dtc * v)
    v2 = v + 0.5 * dtc * k1a
    k2a, s = f(t + 0.5 * dt, q2, v2, s)
    q3 = integ.integrate(model, q, 0.5 * dtc * v2)
    v3 = v + 0.5 * dtc * k2a
    k3a, s = f(t + 0.5 * dt, q3, v3, s)
    q4 = integ.integrate(model, q, dtc * v3)
    v4 = v + dtc * k3a
    k4a, s = f(t + dt, q4, v4, s)
    dq = (dtc / 6.0) * (v + 2.0 * v2 + 2.0 * v3 + v4)
    dv = (dtc / 6.0) * (k1a + 2.0 * k2a + 2.0 * k3a + k4a)
    return integ.integrate(model, q, dq), v + dv, k4a, s


def dopri_trial_stateful(model: RobotModel, f: Callable, t, q, v, a0, dt, s):
    """`dopri_trial` with a stateful dynamics callback (see
    `euler_step_stateful`).  The state threads through the 6 in-trial stage
    evaluations and is returned even for rejected trials — mirroring the
    reference, which writes `constraint->lambda_` back on every solve."""
    dtc = dt[..., None]
    kv = [v]
    ka = [a0]
    for i in range(1, 7):
        dq = sum(_DOPRI_A[i][j] * kv[j] for j in range(i)) * dtc
        dv = sum(_DOPRI_A[i][j] * ka[j] for j in range(i)) * dtc
        qi = integ.integrate(model, q, dq)
        vi = v + dv
        kv.append(vi)
        ai, s = f(t + _DOPRI_C[i] * dt, qi, vi, s)
        ka.append(ai)

    dq5 = sum(_DOPRI_B[i] * kv[i] for i in range(7)) * dtc
    dv5 = sum(_DOPRI_B[i] * ka[i] for i in range(7)) * dtc
    q5 = integ.integrate(model, q, dq5)
    v5 = v + dv5

    dq4 = sum(_DOPRI_E[i] * kv[i] for i in range(7)) * dtc
    dv4 = sum(_DOPRI_E[i] * ka[i] for i in range(7)) * dtc
    q4 = integ.integrate(model, q, dq4)
    v4 = v + dv4

    q_zero = jnp.broadcast_to(model.neutral(), q.shape)
    state_mag = jnp.concatenate([integ.difference(model, q_zero, q), v], axis=-1)
    eq = integ.difference(model, q4, q5)
    ev = v5 - v4
    err_vec = jnp.concatenate([eq, ev], axis=-1)
    return q5, v5, err_vec, jnp.abs(state_mag), ka[-1], s


def dopri_trial(model: RobotModel, f: Callable, t, q, v, a0, dt):
    """One DOPRI5 trial step.  Returns (q5, v5, error_norm, a_last).

    a0 is the derivative at (t, q, v) — FSAL: the accepted step's last stage is
    the next step's first stage (reference `tryStepImpl`, first ki = provided
    derivative).
    """
    dtc = dt[..., None]
    kv = [v]
    ka = [a0]
    for i in range(1, 7):
        dq = sum(_DOPRI_A[i][j] * kv[j] for j in range(i)) * dtc
        dv = sum(_DOPRI_A[i][j] * ka[j] for j in range(i)) * dtc
        qi = integ.integrate(model, q, dq)
        vi = v + dv
        kv.append(vi)
        ka.append(f(t + _DOPRI_C[i] * dt, qi, vi))

    dq5 = sum(_DOPRI_B[i] * kv[i] for i in range(7)) * dtc
    dv5 = sum(_DOPRI_B[i] * ka[i] for i in range(7)) * dtc
    q5 = integ.integrate(model, q, dq5)
    v5 = v + dv5

    dq4 = sum(_DOPRI_E[i] * kv[i] for i in range(7)) * dtc
    dv4 = sum(_DOPRI_E[i] * ka[i] for i in range(7)) * dtc
    q4 = integ.integrate(model, q, dq4)
    v4 = v + dv4

    # Scaled inf-norm error (reference `computeError`): scale from |state| wrt the
    # neutral configuration.
    q_zero = jnp.broadcast_to(model.neutral(), q.shape)
    state_mag = jnp.concatenate([integ.difference(model, q_zero, q), v], axis=-1)
    eq = integ.difference(model, q4, q5)
    ev = v5 - v4
    err_vec = jnp.concatenate([eq, ev], axis=-1)
    return q5, v5, err_vec, jnp.abs(state_mag), ka[-1]


def dopri_error_norm(err_vec, state_mag, tol_abs, tol_rel):
    scale = tol_abs + tol_rel * state_mag
    return jnp.max(jnp.abs(err_vec) / scale, axis=-1)


def dopri_adjust(dt, error, dt_min, dt_max):
    """Boost-odeint step adaptation (reference `adjustStep`). Returns (ok, dt')."""
    ok = error < 1.0
    grow_thr = min(_ERROR_THRESHOLD, _SAFETY**_ORDER)
    clipped = jnp.maximum(error, (_MAX_FACTOR / _SAFETY) ** (-_ORDER))
    dt_grow = jnp.where(
        error < grow_thr, dt * _SAFETY * clipped ** (-1.0 / _ORDER), dt
    )
    dt_shrink = dt * jnp.maximum(_SAFETY * error ** (-1.0 / (_ORDER - 2.0)), _MIN_FACTOR)
    dt_new = jnp.where(ok, dt_grow, dt_shrink)
    return ok, jnp.clip(dt_new, dt_min, dt_max)
