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

    def play_interactive(
        self,
        key_handler=None,
        input_fn=None,
        live_dir: Optional[str] = None,
        max_steps: int = 10_000,
        serve: bool = True,
        seed: Optional[int] = None,
    ) -> dict:
        """Drive the env interactively: one env step per key press, streamed
        to a live browser view (reference `BaseJiminyEnv.play_interactive`,
        `envs/generic.py` — pygame window there, `LiveViewer` HTML page here).

        :param key_handler: `key_str -> action` (ndarray) or None for the
            zero action; the key "q" always ends the session.
        :param input_fn: source of key strings; defaults to blocking stdin
            `input()` (scriptable for tests/automation).
        :param live_dir: live-session directory (a temp dir by default).
        :param serve: start a local HTTP server and print the live URL.
        :returns: stats dict (steps, return, terminated).
        """
        import tempfile

        from jiminy_tpu.viewer.live import LiveViewer

        if input_fn is None:
            input_fn = lambda: input("key (q to quit)> ")  # noqa: E731
        if live_dir is None:
            live_dir = tempfile.mkdtemp(prefix="jiminy_live_")
        base = self.env
        while hasattr(base, "env"):
            base = base.env
        live = LiveViewer(base.robot, live_dir, refresh_every=1)
        if serve:
            print(f"live view: {live.serve()}")
        else:
            print(f"live session dir: {live_dir} (serve it and open live.html)")

        obs, _ = self.reset(seed=seed)
        total_reward, steps, terminated = 0.0, 0, False
        try:
            for _ in range(max_steps):
                key = input_fn()
                if key is None or key == "q":
                    break
                action = None if key_handler is None else key_handler(key)
                if action is None:
                    action = np.zeros(self.action_space.shape)
                obs, reward, terminated, truncated, _ = self.step(action)
                total_reward += reward
                steps += 1
                live.push(float(self._state.sim.t), np.asarray(self._state.sim.q))
                if terminated or truncated:
                    break
        finally:
            live.close()
        return {"steps": steps, "return": total_reward,
                "terminated": bool(terminated), "live_dir": live_dir}
