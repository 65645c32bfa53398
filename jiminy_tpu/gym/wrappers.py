"""Observation/action transform wrappers (reference `gym_jiminy/common/wrappers/`):
flatten, filter, normalize, scale, and n-frame stacking — all pure pytree
transforms compatible with jit/vmap.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from jiminy_tpu.gym.pipeline import _Wrapper


def flatten_pytree(obs, batch_ndim: int = 0) -> jnp.ndarray:
    """Flatten a pytree observation to one vector per env, preserving the
    first `batch_ndim` (explicit env-batch) axes of every leaf."""
    leaves = jax.tree.leaves(obs)
    if not leaves:
        return jnp.zeros((0,))
    lead = leaves[0].shape[:batch_ndim]
    return jnp.concatenate(
        [x.reshape(lead + (-1,)).astype(leaves[0].dtype) for x in leaves],
        axis=-1,
    )


class FlattenObservation(_Wrapper):
    """Flatten the nested observation into one vector (reference
    `FlattenObservation`)."""

    def observe(self, state):
        # The carried PRNG key is (2,) per env, so extra leading axes on it
        # count the explicit env-batch dims (vmapped envs see a single env).
        batch_ndim = max(state.key.ndim - 1, 0)
        return flatten_pytree(self.env.observe(state), batch_ndim)

    def reset(self, key):
        state, _ = self.env.reset(key)
        return state, self.observe(state)

    def step(self, state, action):
        state, _, r, te, tr, info = self.env.step(state, action)
        return state, self.observe(state), r, te, tr, info


class FilterObservation(_Wrapper):
    """Keep only selected top-level keys / nested paths (reference
    `FilterObservation`).  `paths` are '/'-separated key paths."""

    def __init__(self, env, paths: Sequence[str]):
        super().__init__(env)
        self.paths = tuple(tuple(p.split("/")) for p in paths)

    def observe(self, state):
        obs = self.env.observe(state)

        def get(d, path):
            for k in path:
                d = d[k]
            return d

        out: dict = {}
        for path in self.paths:
            node = out
            for k in path[:-1]:
                node = node.setdefault(k, {})
            node[path[-1]] = get(obs, path)
        return out

    def reset(self, key):
        state, _ = self.env.reset(key)
        return state, self.observe(state)

    def step(self, state, action):
        state, _, r, te, tr, info = self.env.step(state, action)
        return state, self.observe(state), r, te, tr, info


class ScaleObservation(_Wrapper):
    """Multiply observation leaves by a scale (scalar or matching pytree)."""

    def __init__(self, env, scale):
        super().__init__(env)
        self.scale = scale

    def _apply(self, obs):
        if isinstance(self.scale, (int, float)):
            return jax.tree.map(lambda x: x * self.scale, obs)
        return jax.tree.map(lambda x, s: x * s, obs, self.scale)

    def observe(self, state):
        return self._apply(self.env.observe(state))

    def reset(self, key):
        state, _ = self.env.reset(key)
        return state, self.observe(state)

    def step(self, state, action):
        state, _, r, te, tr, info = self.env.step(state, action)
        return state, self.observe(state), r, te, tr, info


class NormalizeObservation(ScaleObservation):
    """Shift-and-scale normalization with static mean/std pytrees (the
    reference normalizes by space bounds; here mean/std are explicit)."""

    def __init__(self, env, mean, std):
        _Wrapper.__init__(self, env)
        self.mean = mean
        self.std = std

    def _apply(self, obs):
        return jax.tree.map(lambda x, m, s: (x - m) / s, obs, self.mean, self.std)


class FlattenAction(_Wrapper):
    """Expose a flat action vector for a nested/pytree action interface
    (reference `FlattenAction`).  The inner env's action template is taken
    from a zero action; incoming flat vectors are split and reshaped back."""

    def __init__(self, env, template=None):
        super().__init__(env)
        if template is None:
            template = jnp.zeros((env.action_size,))
        self._template = template
        leaves = jax.tree.leaves(template)
        self._sizes = [int(np.prod(jnp.shape(x))) for x in leaves]
        self.action_size = int(sum(self._sizes))

    def _unflatten(self, action):
        action = jnp.asarray(action)
        leaves, treedef = jax.tree.flatten(self._template)
        out, off = [], 0
        for leaf, n in zip(leaves, self._sizes):
            batch = action.shape[:-1]
            out.append(
                action[..., off : off + n].reshape(batch + jnp.shape(leaf))
            )
            off += n
        return jax.tree.unflatten(treedef, out)

    def step(self, state, action):
        return self.env.step(state, self._unflatten(action))


class ScaleAction(_Wrapper):
    """Multiply incoming actions by a scale before the inner env."""

    def __init__(self, env, scale):
        super().__init__(env)
        self.scale = scale

    def step(self, state, action):
        return self.env.step(state, jax.tree.map(lambda a: a * self.scale, action))


class NormalizeAction(_Wrapper):
    """Map actions from [-1, 1] to the inner env's action bounds (reference
    `NormalizeAction`)."""

    def __init__(self, env):
        super().__init__(env)
        lo, hi = env.action_bounds()
        self._mid = (hi + lo) / 2.0
        self._half = (hi - lo) / 2.0

    def action_bounds(self):
        ones = jnp.ones_like(self._mid)
        return -ones, ones

    def step(self, state, action):
        return self.env.step(state, self._mid + self._half * jnp.clip(action, -1.0, 1.0))


class StackObservation(_Wrapper):
    """Stack the last `num_stack` observations along a new leading axis, updating
    every `skip_frames_ratio + 1` steps (reference `StackObservation`)."""

    def __init__(self, env, num_stack: int = 4, skip_frames_ratio: int = 0):
        super().__init__(env)
        self.num_stack = num_stack
        self.skip = skip_frames_ratio

    def observe(self, state):
        entry = state.blocks.get("obs_stack")
        if entry is None:
            obs = self.env.observe(state)
            return jax.tree.map(
                lambda x: jnp.broadcast_to(x, (self.num_stack,) + x.shape), obs
            )
        return entry["stack"]

    def reset(self, key):
        state, obs = self.env.reset(key)
        stack = jax.tree.map(
            lambda x: jnp.broadcast_to(x, (self.num_stack,) + x.shape).copy(), obs
        )
        state = state.replace(
            blocks={**state.blocks, "obs_stack": {"stack": stack, "count": jnp.asarray(0)}}
        )
        return state, self.observe(state)

    def step(self, state, action):
        state, obs, r, te, tr, info = self.env.step(state, action)
        entry = state.blocks["obs_stack"]
        count = entry["count"] + 1
        do_push = (count % (self.skip + 1)) == 0

        def push(stk, x):
            rolled = jnp.roll(stk, -1, axis=0).at[-1].set(x)
            return jnp.where(do_push, rolled, stk)

        stack = jax.tree.map(push, entry["stack"], obs)
        state = state.replace(
            blocks={**state.blocks, "obs_stack": {"stack": stack, "count": count}}
        )
        return state, self.observe(state), r, te, tr, info


class AdaptLayoutObservation(_Wrapper):
    """Reorder/rename the nested observation into a user-defined layout
    (reference `AdaptLayoutObservation`): `layout` maps new '/'-separated paths
    to old paths."""

    def __init__(self, env, layout: dict):
        super().__init__(env)
        self.layout = {
            tuple(new.split("/")): tuple(old.split("/"))
            for new, old in layout.items()
        }

    def observe(self, state):
        obs = self.env.observe(state)

        def get(d, path):
            for k in path:
                d = d[k]
            return d

        out: dict = {}
        for new, old in self.layout.items():
            node = out
            for k in new[:-1]:
                node = node.setdefault(k, {})
            node[new[-1]] = get(obs, old)
        return out

    def reset(self, key):
        state, _ = self.env.reset(key)
        return state, self.observe(state)

    def step(self, state, action):
        state, _, r, te, tr, info = self.env.step(state, action)
        return state, self.observe(state), r, te, tr, info


class BaseTransformObservation(_Wrapper):
    """Base class for custom observation transforms: override `transform`
    (reference `BaseTransformObservation`, `bases/pipeline.py:1250` — the
    functional form needs no pre-allocated buffers)."""

    def transform(self, obs):
        raise NotImplementedError

    def observe(self, state):
        return self.transform(self.env.observe(state))

    def reset(self, key):
        state, _ = self.env.reset(key)
        return state, self.observe(state)

    def step(self, state, action):
        state, _, reward, terminated, truncated, info = self.env.step(
            state, action
        )
        return state, self.observe(state), reward, terminated, truncated, info


class BaseTransformAction(_Wrapper):
    """Base class for custom action transforms: override `transform`
    (reference `BaseTransformAction`, `bases/pipeline.py:1354`)."""

    def transform(self, action):
        raise NotImplementedError

    def step(self, state, action):
        return self.env.step(state, self.transform(action))
