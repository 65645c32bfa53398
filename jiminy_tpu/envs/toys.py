"""Toy control environments: CartPole, Acrobot, Pendulum swing-up
(reference `gym_jiminy/envs/.../{cartpole,acrobot}.py` semantics)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from jiminy_tpu.engine.config import EngineOptions, IntegratorType, StepperOptions
from jiminy_tpu.envs import builders
from jiminy_tpu.gym.base import BaseEnv


def _cmd1(action, lo, hi):
    """Coerce an action to a (..., 1) motor command (batch-transparent)."""
    a = jnp.atleast_1d(jnp.asarray(action))
    if a.shape[-1] != 1:
        a = a[..., None]
    return jnp.clip(a, lo, hi)


def _toy_options(dt=1e-3, **kw):
    return EngineOptions(
        stepper=StepperOptions(integrator=IntegratorType.RUNGE_KUTTA_4, dt_max=dt, **kw),
        controller_update_period=dt,
        sensor_update_period=dt,
    )


class CartPoleEnv(BaseEnv):
    """Classic cart-pole balancing (reference `CartPoleJiminyEnv`, mirrors the
    OpenAI-gym termination/reward: +1 per step alive, terminate on |x| > 2.4 or
    |theta| > 12 deg).  Action: horizontal force on the cart, continuous
    [-10, 10] N (the reference exposes discrete +-10 N; use `discrete=True`)."""

    X_THRESHOLD = 2.4
    THETA_THRESHOLD = 12.0 * np.pi / 180.0

    def __init__(self, step_dt: float = 0.02, horizon: int = 500, discrete: bool = False):
        super().__init__(
            builders.build_cartpole(), _toy_options(), step_dt=step_dt, horizon=horizon
        )
        self.discrete = discrete

    def _sample_state(self, key):
        model = self.robot.model
        q = jax.random.uniform(key, (2,), model.dtype, -0.05, 0.05)
        kv = jax.random.fold_in(key, 1)
        v = jax.random.uniform(kv, (2,), model.dtype, -0.05, 0.05)
        return q, v

    def observe(self, state):
        sim = state.sim
        return jnp.stack([sim.q[..., 0], sim.v[..., 0], sim.q[..., 1], sim.v[..., 1]], axis=-1)

    def _action_to_command(self, state, action, obs):
        if self.discrete:
            a = jnp.atleast_1d(jnp.asarray(action))
            if a.shape[-1] != 1:
                a = a[..., None]
            return jnp.where(a > 0, 10.0, -10.0).astype(self.engine.dtype)
        return _cmd1(action, -10.0, 10.0)

    def _compute_reward(self, state, action, next_state):
        return jnp.asarray(1.0, self.engine.dtype)

    def _is_terminated(self, state):
        x = state.sim.q[..., 0]
        th = state.sim.q[..., 1]
        return (
            (jnp.abs(x) > self.X_THRESHOLD)
            | (jnp.abs(th) > self.THETA_THRESHOLD)
            | state.sim.stepper.diverged
        )


class AcrobotEnv(BaseEnv):
    """Acrobot swing-up (reference `AcrobotJiminyEnv`): torque at the elbow,
    -1 reward per step until the tip rises above one link length."""

    def __init__(self, step_dt: float = 0.02, horizon: int = 500, continuous: bool = True):
        super().__init__(
            builders.build_acrobot(), _toy_options(), step_dt=step_dt, horizon=horizon
        )
        self.continuous = continuous

    def _sample_state(self, key):
        model = self.robot.model
        q = jax.random.uniform(key, (2,), model.dtype, -0.1, 0.1)
        kv = jax.random.fold_in(key, 1)
        v = jax.random.uniform(kv, (2,), model.dtype, -0.1, 0.1)
        return q, v

    def observe(self, state):
        q, v = state.sim.q, state.sim.v
        return jnp.stack(
            [
                jnp.cos(q[..., 0]),
                jnp.sin(q[..., 0]),
                jnp.cos(q[..., 1]),
                jnp.sin(q[..., 1]),
                v[..., 0],
                v[..., 1],
            ],
            axis=-1,
        )

    def _tip_height(self, state):
        q = state.sim.q
        return -jnp.cos(q[..., 0]) - jnp.cos(q[..., 0] + q[..., 1])

    def _action_to_command(self, state, action, obs):
        if self.continuous:
            return _cmd1(action, -10.0, 10.0)
        a = jnp.atleast_1d(jnp.asarray(action))
        if a.shape[-1] != 1:
            a = a[..., None]
        return (a - 1.0) * 10.0

    def _compute_reward(self, state, action, next_state):
        return jnp.where(self._tip_height(next_state) > 1.0, 0.0, -1.0).astype(
            self.engine.dtype
        )

    def _is_terminated(self, state):
        return (self._tip_height(state) > 1.0) | state.sim.stepper.diverged


class PendulumEnv(BaseEnv):
    """Torque-limited pendulum swing-up (classic control benchmark)."""

    def __init__(self, step_dt: float = 0.05, horizon: int = 200):
        super().__init__(
            builders.build_pendulum(), _toy_options(), step_dt=step_dt, horizon=horizon
        )

    def _sample_state(self, key):
        model = self.robot.model
        q = jax.random.uniform(key, (1,), model.dtype, -np.pi, np.pi)
        kv = jax.random.fold_in(key, 1)
        v = jax.random.uniform(kv, (1,), model.dtype, -1.0, 1.0)
        return q, v

    def observe(self, state):
        q, v = state.sim.q, state.sim.v
        return jnp.stack([jnp.cos(q[..., 0]), jnp.sin(q[..., 0]), v[..., 0]], axis=-1)

    def _action_to_command(self, state, action, obs):
        return _cmd1(action, -2.0, 2.0)

    def _compute_reward(self, state, action, next_state):
        q = next_state.sim.q[..., 0]
        # Angle error w.r.t. upright (q = pi)
        err = jnp.arctan2(jnp.sin(q - np.pi), jnp.cos(q - np.pi))
        v = next_state.sim.v[..., 0]
        u = jnp.atleast_1d(jnp.asarray(action, self.engine.dtype))[..., 0]
        return -(err**2 + 0.1 * v**2 + 0.001 * u**2)
