"""Gymnasium adapter: expose a functional env through the standard
`gymnasium.Env` API for interop with SB3/Tianshou-style trainers
(the reference's `BaseJiminyEnv` IS a `gymnasium.Env`; here Gymnasium is the
compatibility shell around the jit-native core)."""

from __future__ import annotations

from typing import Any, Optional

import gymnasium
import jax
import jax.numpy as jnp
import numpy as np

from jiminy_tpu.gym.wrappers import flatten_pytree


class GymnasiumEnv(gymnasium.Env):
    """Single-env Gymnasium wrapper over a functional env (obs auto-flattened)."""

    metadata = {"render_modes": ["rgb_array"]}

    def __init__(self, env, render_mode: Optional[str] = None):
        self.env = env
        self.render_mode = render_mode
        self._state = None
        self._step = jax.jit(env.step)
        self._reset = jax.jit(env.reset)
        # Probe spaces
        state, obs = self._reset(jax.random.PRNGKey(0))
        flat = np.asarray(flatten_pytree(obs))
        self.observation_space = gymnasium.spaces.Box(
            -np.inf, np.inf, shape=flat.shape, dtype=np.float64
        )
        try:
            lo, hi = env.action_bounds()
            lo, hi = np.asarray(lo, dtype=np.float64), np.asarray(hi, dtype=np.float64)
        except Exception:
            lo = -np.ones(env.action_size)
            hi = np.ones(env.action_size)
        self.action_space = gymnasium.spaces.Box(lo, hi, dtype=np.float64)
        self._seed_counter = 0

    def reset(self, *, seed: Optional[int] = None, options: Optional[dict] = None):
        if seed is None:
            self._seed_counter += 1
            seed = self._seed_counter
        self._state, obs = self._reset(jax.random.PRNGKey(seed))
        return np.asarray(flatten_pytree(obs)), {}

    def step(self, action):
        self._state, obs, reward, terminated, truncated, info = self._step(
            self._state, jnp.asarray(action)
        )
        return (
            np.asarray(flatten_pytree(obs)),
            float(reward),
            bool(terminated),
            bool(truncated),
            {k: np.asarray(v) for k, v in info.items()},
        )

    def render(self):
        if self.render_mode != "rgb_array":
            return None
        import io

        import matplotlib.pyplot as plt

        from jiminy_tpu.viewer import Viewer

        base = self.env
        while hasattr(base, "env"):
            base = base.env
        v = Viewer(base.robot)
        ax = v.render(self._state.sim.q)
        fig = ax.figure
        fig.canvas.draw()
        buf = np.frombuffer(fig.canvas.buffer_rgba(), dtype=np.uint8)
        w, h = fig.canvas.get_width_height()
        img = buf.reshape(h, w, 4)[..., :3].copy()
        plt.close(fig)
        return img
