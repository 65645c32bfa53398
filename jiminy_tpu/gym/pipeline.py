"""Composable pipeline wrappers + declarative pipeline builder.

Re-design of `gym_jiminy.common.bases.pipeline` (reference `bases/pipeline.py`) and
`utils/pipeline.py` (`build_pipeline`/`load_pipeline`): wrappers compose the
functional env API, so an entire pipeline — observers, controllers, reward and
termination compositions — is one pure jitted step function.

Wrapper protocol (same as `BaseEnv`): `reset(key)`, `step(state, action)`,
`observe(state)`; block states live in `EnvState.blocks` keyed by block name.
"""

from __future__ import annotations

import importlib
import json
from typing import Any, Callable, Optional, Sequence

import jax
import jax.numpy as jnp

from jiminy_tpu.gym.base import BaseEnv, EnvState
from jiminy_tpu.gym.blocks import (
    BodyObserver,
    DeformationEstimator,
    MahonyFilter,
    MotorSafetyLimit,
    PDAdapter,
    PDController,
    QuantityObserver,
)


class _Wrapper:
    """Shared plumbing for pipeline layers."""

    def __init__(self, env):
        self.env = env

    def __getattr__(self, name):
        return getattr(self.env, name)

    @property
    def unwrapped(self):
        e = self.env
        while isinstance(e, _Wrapper):
            e = e.env
        return e

    def observe(self, state):
        return self.env.observe(state)

    def reset(self, key):
        return self.env.reset(key)

    def step(self, state, action):
        return self.env.step(state, action)


class ControlledEnv(_Wrapper):
    """Attach a controller block: the env action becomes the block's target and
    the block output feeds the inner env (reference `ControlledJiminyEnv`,
    `bases/pipeline.py:1029`)."""

    def __init__(self, env, block, augment_observation: bool = True,
                 use_fused_rollout: bool = True):
        super().__init__(env)
        self.block = block
        self.augment_observation = augment_observation
        # Trace the block into the fused env-step kernel when the engine
        # supports it (delay/noise-free sensors, fixed-step fused core) —
        # bit-identical to the per-period path; disable to force the scan.
        self.use_fused_rollout = use_fused_rollout

    @property
    def action_size(self):
        return self.block.action_size

    def action_bounds(self):
        return jnp.asarray(self.block.action_low), jnp.asarray(self.block.action_high)

    def observe(self, state):
        obs = self.env.observe(state)
        if self.augment_observation and self.block.name in state.blocks:
            obs = dict(obs)
            obs.setdefault("targets", {})
            obs["targets"] = dict(obs["targets"])
            obs["targets"][self.block.name] = state.blocks[self.block.name]
        return obs

    def reset(self, key):
        state, _ = self.env.reset(key)
        bstate = self.block.init_state(state)
        state = state.replace(blocks={**state.blocks, self.block.name: bstate})
        return state, self.observe(state)

    def _block_obs(self, obs, state):
        if "pd_controller" in state.blocks:
            obs = dict(obs)
            obs["_pd_command_state"] = state.blocks["pd_controller"]
        return obs

    def step(self, state, action):
        if isinstance(self.env, BaseEnv):
            # Directly over the base env (the reference REQUIRES this for
            # `PDController`): re-evaluate the block at EVERY controller
            # update period inside the physics loop, exactly like the
            # reference's FunctionalController bridge — not once per env step.
            if (
                self.use_fused_rollout
                and hasattr(self.block, "component_controller")
                and self.env.engine.supports_fused_rollout
                and state.sim.model_params is None
            ):
                # Fused fast path: the block update is traced INTO the
                # env-step kernel — one launch per tile for the whole step.
                (state, _, reward, terminated, truncated, info, bstate) = (
                    self.env.step_with_fused_controller(
                        state, action, self.block,
                        state.blocks[self.block.name],
                    )
                )
                state = state.replace(
                    blocks={**state.blocks, self.block.name: bstate}
                )
                return (state, self.observe(state), reward, terminated,
                        truncated, info)

            def controller(st_view, bstate):
                obs = self.env.observe(st_view)
                return self.block.compute(action, obs, bstate)

            (state, _, reward, terminated, truncated, info, bstate) = (
                self.env.step_with_controller(
                    state, action, controller, state.blocks[self.block.name]
                )
            )
            state = state.replace(
                blocks={**state.blocks, self.block.name: bstate}
            )
            return (state, self.observe(state), reward, terminated, truncated,
                    info)
        # Generic fallback (blocks stacked above other wrappers update at the
        # env-step rate, like the reference's update_ratio=-1 outer layers)
        obs = self._block_obs(self.observe(state), state)
        command, bstate = self.block.compute(action, obs, state.blocks[self.block.name])
        state = state.replace(blocks={**state.blocks, self.block.name: bstate})
        state, _, reward, terminated, truncated, info = self.env.step(state, command)
        return state, self.observe(state), reward, terminated, truncated, info


class ObservedEnv(_Wrapper):
    """Attach an observer block whose features augment the observation
    (reference `ObservedJiminyEnv`, `bases/pipeline.py:852`)."""

    def __init__(self, env, block):
        super().__init__(env)
        self.block = block

    def observe(self, state):
        obs = dict(self.env.observe(state))
        entry = state.blocks.get(self.block.name)
        if entry is not None:
            obs.setdefault("features", {})
            obs["features"] = dict(obs["features"])
            obs["features"][self.block.name] = entry["features"]
        return obs

    def reset(self, key):
        state, _ = self.env.reset(key)
        bstate = self.block.init_state(state)
        features, bstate = self.block.refresh(self.env.observe(state), bstate)
        state = state.replace(
            blocks={**state.blocks, self.block.name: {"state": bstate, "features": features}}
        )
        return state, self.observe(state)

    def step(self, state, action):
        state, _, reward, terminated, truncated, info = self.env.step(state, action)
        entry = state.blocks[self.block.name]
        features, bstate = self.block.refresh(self.env.observe(state), entry["state"])
        state = state.replace(
            blocks={**state.blocks, self.block.name: {"state": bstate, "features": features}}
        )
        return state, self.observe(state), reward, terminated, truncated, info


class ComposedEnv(_Wrapper):
    """Attach reward and termination compositions (reference
    `ComposedJiminyEnv`, `bases/pipeline.py:525`).

    reward: callable(env, state, action, next_state) -> float
    terminations: sequence of callable(env, next_state) -> bool
    """

    def __init__(self, env, reward: Optional[Callable] = None,
                 terminations: Sequence[Callable] = (),
                 quantities=None):
        super().__init__(env)
        self.reward_fn = reward
        self.terminations = tuple(terminations)
        # Optional QuantityManager: when given, Delta/Stacked quantity history
        # is carried across env steps in `state.blocks` (reference shared-cache
        # history; here the history IS part of the functional state).
        self.quantities = quantities

    def _snapshot(self, state):
        if self.quantities is None:
            return state
        blocks = dict(state.blocks)
        blocks["quantity_delta"] = self.quantities.delta_snapshot(state)
        blocks["quantity_stack"] = self.quantities.stack_snapshot(state)
        return state.replace(blocks=blocks)

    def reset(self, key):
        state, obs = self.env.reset(key)
        return self._snapshot(state), obs

    def step(self, state, action):
        prev = state
        state, obs, reward, terminated, truncated, info = self.env.step(state, action)
        if self.reward_fn is not None:
            reward = self.reward_fn(self, prev, action, state)
        for term in self.terminations:
            terminated = terminated | term(self, state)
        state = self._snapshot(state)
        return state, obs, reward, terminated, truncated, info


# =============================================================================
# Declarative pipeline builder
# =============================================================================

_BLOCK_REGISTRY = {
    "PDController": PDController,
    "PDAdapter": PDAdapter,
    "MahonyFilter": MahonyFilter,
    "MotorSafetyLimit": MotorSafetyLimit,
    "BodyObserver": BodyObserver,
    "QuantityObserver": QuantityObserver,
    "DeformationEstimator": DeformationEstimator,
}


def _resolve(path: str):
    mod, _, attr = path.partition(":")
    return getattr(importlib.import_module(mod), attr)


def build_pipeline(config: dict):
    """Build a full pipeline env from a config dict (reference `build_pipeline`,
    `gym_jiminy/common/utils/pipeline.py:232`).

    Schema::

        {"env": {"cls": "jiminy_tpu.envs.cartpole:CartPoleEnv", **kwargs},
         "layers": [{"block": "PDController", **block_kwargs},
                    {"block": "MahonyFilter", ...},
                    {"wrapper": "jiminy_tpu.gym.wrappers:FlattenObservation"}],
         "reward": {"cls": "module:function", **kwargs},          # optional
         "terminations": [{"cls": "module:function", **kwargs}]}  # optional
    """
    env_cfg = dict(config["env"])
    env_cls = _resolve(env_cfg.pop("cls"))
    env = env_cls(**env_cfg)

    pd_block = None
    for layer in config.get("layers", ()):
        layer = dict(layer)
        if "block" in layer:
            name = layer.pop("block")
            cls = _BLOCK_REGISTRY.get(name) or _resolve(name)
            if cls is PDController:
                block = cls(**layer).setup(env)
                pd_block = block
                env = ControlledEnv(env, block)
            elif cls is PDAdapter:
                if pd_block is None:
                    raise ValueError("PDAdapter requires an upstream PDController layer")
                block = cls(**layer).setup(env, pd_block)
                env = ControlledEnv(env, block)
            elif cls in (MahonyFilter, BodyObserver, QuantityObserver, DeformationEstimator):
                block = cls(**layer).setup(env)
                env = ObservedEnv(env, block)
            elif cls is MotorSafetyLimit:
                block = cls(**layer).setup(env)
                env = ControlledEnv(env, block, augment_observation=False)
            else:
                block = cls(**layer)
                if hasattr(block, "setup"):
                    block = block.setup(env)
                env = (
                    ObservedEnv(env, block)
                    if hasattr(block, "refresh")
                    else ControlledEnv(env, block)
                )
        elif "wrapper" in layer:
            cls = _resolve(layer.pop("wrapper"))
            env = cls(env, **layer)

    reward_cfg = config.get("reward")
    term_cfgs = config.get("terminations", ())
    if reward_cfg or term_cfgs:
        reward_fn = _build_reward(reward_cfg) if reward_cfg else None
        terms = []
        for tc in term_cfgs:
            tc = dict(tc)
            fn = _resolve(tc.pop("cls"))
            terms.append(fn(**tc) if tc else fn)
        env = ComposedEnv(env, reward=reward_fn, terminations=terms)
    return env


def _build_reward(cfg):
    """Build a reward (possibly a weighted mixture of sub-rewards)."""
    import jax.numpy as _jnp

    cfg = dict(cfg)
    if "components" in cfg:
        from jiminy_tpu.compositions import AdditiveMixtureReward

        comps = [_build_reward(c) for c in cfg["components"]]
        return AdditiveMixtureReward(comps, weights=cfg.get("weights"))
    fn = _resolve(cfg.pop("cls"))
    # TOML lists become jnp arrays for targets
    for k, v in list(cfg.items()):
        if isinstance(v, list):
            cfg[k] = _jnp.asarray(v)
    return fn(**cfg) if isinstance(fn, type) else fn


def load_pipeline(path: str):
    """Load a pipeline from a TOML or JSON file (reference `load_pipeline`,
    `utils/pipeline.py:623`)."""
    if path.endswith(".json"):
        with open(path) as f:
            return build_pipeline(json.load(f))
    if path.endswith(".toml"):
        import tomllib

        with open(path, "rb") as f:
            return build_pipeline(tomllib.load(f))
    raise ValueError(f"unsupported pipeline file format: {path}")
