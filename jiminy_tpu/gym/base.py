"""BaseEnv: the functional RL environment over the engine.

Role-equivalent to `BaseJiminyEnv` (reference `gym_jiminy/common/envs/generic.py`):
observation = time + agent state + sensor measurements, action = motor commands,
`step` advances `step_dt` (a multiple of the controller period) and evaluates
termination/reward.  Everything is a pure function of `(EnvState, action, key)` —
batching is `jax.vmap`, distribution is `shard_map`, and the whole rollout loop
compiles into a single XLA program (no per-step host crossing, unlike the
reference's C++→Python controller bridge).
"""

from __future__ import annotations

import math
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from jiminy_tpu.engine.config import EngineOptions
from jiminy_tpu.engine.engine import Engine
from jiminy_tpu.engine.robot import Robot
from jiminy_tpu.engine.state import SimState


@struct.dataclass
class EnvState:
    sim: SimState
    steps: jnp.ndarray  # () int32 — env steps since reset
    last_action: jnp.ndarray  # (act_dim,)
    blocks: Dict[str, Any]  # pipeline block states (outer wrappers add entries)
    key: jnp.ndarray  # env-level PRNG key (randomization, rewards)


class BaseEnv:
    """Functional env API:

    - `reset(key) -> (EnvState, obs)`
    - `step(state, action) -> (state', obs, reward, terminated, truncated, info)`
    - `observe(state) -> obs` (pytree of arrays)

    Subclasses/instances override `_sample_state`, `_compute_reward`,
    `_is_terminated` and optionally `observe`/`_action_to_command`.
    """

    def __init__(
        self,
        robot: Robot,
        options: Optional[EngineOptions] = None,
        step_dt: float = 0.02,
        horizon: int = 1000,
        debug: bool = False,
    ):
        self.robot = robot
        self.engine = Engine(robot, options)
        self.step_dt = step_dt
        ratio = step_dt / self.engine.control_period
        self.n_ctrl_per_step = max(int(round(ratio)), 1)
        if abs(ratio - self.n_ctrl_per_step) > 1e-9:
            raise ValueError("step_dt must be a multiple of the controller period")
        self.horizon = horizon
        self.debug = debug
        # Per-block component controllers, lazily built for the fused rollout
        self._component_controllers: Dict[str, Any] = {}
        # Route step()/step_with_fused_controller through the whole-env-step
        # rollout kernel when the engine supports it (set False to force the
        # per-period scan — bit-identical either way)
        self.use_fused_rollout = True

    # ------------------------------------------------------------------ #
    # Spaces (shape/dtype metadata; bounds for wrappers)
    # ------------------------------------------------------------------ #
    @property
    def action_size(self) -> int:
        return self.robot.nmotors

    def action_bounds(self) -> Tuple[jnp.ndarray, jnp.ndarray]:
        m = self.robot.motors
        if m is None:
            z = jnp.zeros((0,), self.engine.dtype)
            return z, z
        return -m.effort_limit, m.effort_limit

    # ------------------------------------------------------------------ #
    # Hooks
    # ------------------------------------------------------------------ #
    def _sample_state(self, key) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Initial (q, v); override for randomized resets."""
        model = self.robot.model
        return model.neutral(), jnp.zeros((model.nv,), model.dtype)

    def _sample_model_params(self, key):
        """Optional per-reset model randomization: return a biased RobotModel
        (array leaves) or None (reference `addBiasedToExtendedModel` hook).
        Under vmapped resets each env gets its own parameters."""
        return None

    def observe(self, state: EnvState):
        """Default observation: t, q, v and the sensor measurement tree
        (reference obs space, `envs/generic.py` + `utils/spaces.py:107-244`)."""
        sim = state.sim
        return {
            "t": sim.t,
            "agent_state": {"q": sim.q, "v": sim.v},
            "measurements": dict(sim.measurements),
        }

    def _action_to_command(self, state: EnvState, action, obs):
        """Map the env action to motor commands (identity for effort control)."""
        return action

    def _compute_reward(self, state: EnvState, action, next_state: EnvState):
        return jnp.asarray(0.0, self.engine.dtype)

    def _is_terminated(self, state: EnvState):
        return jnp.asarray(False) | state.sim.stepper.diverged

    # ------------------------------------------------------------------ #
    # Core API
    # ------------------------------------------------------------------ #
    def reset(self, key) -> Tuple[EnvState, Any]:
        k_state, k_sim, k_env, k_model = jax.random.split(key, 4)
        q0, v0 = self._sample_state(k_state)
        model_params = self._sample_model_params(k_model)
        sim = self.engine.reset(q0, v0, key=k_sim, model_params=model_params)
        state = EnvState(
            sim=sim,
            steps=jnp.asarray(0, jnp.int32),
            last_action=jnp.zeros((self.action_size,), self.engine.dtype),
            blocks={},
            key=k_env,
        )
        return state, self.observe(state)

    def _finalize_step(self, state: EnvState, action, sim) -> Tuple:
        """Shared tail of `step`: bookkeeping, observation, reward, termination."""
        next_state = state.replace(
            sim=sim,
            steps=state.steps + 1,
            last_action=jnp.asarray(action, self.engine.dtype).reshape(
                state.last_action.shape
            ),
        )
        obs = self.observe(next_state)
        reward = self._compute_reward(state, action, next_state)
        terminated = self._is_terminated(next_state)
        truncated = next_state.steps >= self.horizon
        info: Dict[str, Any] = {}
        return next_state, obs, reward, terminated, truncated, info

    def step(self, state: EnvState, action):
        obs = self.observe(state)
        command = self._action_to_command(state, action, obs)
        if (
            self.use_fused_rollout
            and self.engine.supports_fused_rollout
            and state.sim.model_params is None
        ):
            # ZOH command for the whole env step: the rollout kernel with a
            # pass-through "controller" — all n_ctrl_per_step engine ticks in
            # one kernel launch per tile (bit-identical to the scan below).
            nm = self.robot.nmotors

            def passthrough(qc, vc, bc, ac):
                return list(ac[:nm]), list(bc)

            carry = jnp.zeros(state.sim.q.shape[:-1] + (0,), state.sim.q.dtype)
            sim, _ = self.engine.step_rollout_fused(
                state.sim, command, passthrough, carry,
                self.n_ctrl_per_step, cache_key="zoh",
            )
            return self._finalize_step(state, action, sim)

        def ctrl_substep(sim, _):
            return self.engine.step(sim, command), None

        sim, _ = jax.lax.scan(ctrl_substep, state.sim, None, length=self.n_ctrl_per_step)
        return self._finalize_step(state, action, sim)

    def step_with_controller(self, state: EnvState, action, controller: Callable,
                             carry):
        """Advance `step_dt` with `controller(env_state_view, carry) ->
        (command, carry)` re-evaluated at EVERY controller update period —
        the reference's `FunctionalController` bridge semantics
        (`controller_functor.h:27`, `interfaces.py:331`: the whole pipeline
        runs inside the physics loop at its own update period, not once per
        env step).  `action` is the env-level action recorded in the state.
        Returns the usual step tuple plus the final carry."""

        def ctrl_substep(c, _):
            sim, cr = c
            command, cr = controller(state.replace(sim=sim), cr)
            sim = self.engine.step(sim, command)
            return (sim, cr), None

        (sim, carry), _ = jax.lax.scan(
            ctrl_substep, (state.sim, carry), None, length=self.n_ctrl_per_step
        )
        return (*self._finalize_step(state, action, sim), carry)

    def step_with_fused_controller(self, state: EnvState, action, block,
                                   block_state):
        """`step_with_controller` with the controller block traced INTO the
        fused env-step kernel (`Engine.step_rollout_fused`): all
        `n_ctrl_per_step` controller periods — block update + physics
        substeps — run as ONE Pallas kernel launch per env tile instead of a
        scan of per-period kernels with the block glue as separate XLA ops.
        Bit-identical to `step_with_controller` for delay/noise-free sensors
        (tests/test_fused_rollout.py).  Returns the step tuple + block state."""
        cfn = self._component_controllers.get(block.name)
        if cfn is None:
            cfn = block.component_controller(self)
            self._component_controllers[block.name] = cfn
        fn, n_carry = cfn
        carry = block_state.reshape(block_state.shape[:-2] + (n_carry,))
        sim, carry = self.engine.step_rollout_fused(
            state.sim, action, fn, carry, self.n_ctrl_per_step,
            cache_key=block.name,
        )
        block_state = carry.reshape(block_state.shape)
        return (*self._finalize_step(state, action, sim), block_state)

    # ------------------------------------------------------------------ #
    # Convenience rollout (single env or under vmap)
    # ------------------------------------------------------------------ #
    def rollout(self, state: EnvState, policy: Callable, n_steps: int):
        """scan `n_steps` with `policy(obs, key) -> action`; no auto-reset."""

        def body(carry, _):
            st = carry
            k, sub = jax.random.split(st.key)
            st = st.replace(key=k)
            action = policy(self.observe(st), sub)
            st, obs, reward, term, trunc, _ = self.step(st, action)
            return st, (reward, term, trunc)

        return jax.lax.scan(body, state, None, length=n_steps)


class AutoResetWrapper:
    """Vectorized auto-reset: on termination/truncation the env restarts from a
    fresh sample — the standard trick to keep a fixed-shape batched rollout
    (the reference relies on per-process Gymnasium resets instead)."""

    def __init__(self, env):
        self.env = env

    def __getattr__(self, name):
        return getattr(self.env, name)

    def reset(self, key):
        return self.env.reset(key)

    def step(self, state, action):
        state, obs, reward, terminated, truncated, info = self.env.step(state, action)
        done = terminated | truncated
        if state.key.ndim >= 2:
            # Explicitly-batched states (Pallas fast path): per-env keys/resets
            keys = jax.vmap(jax.random.split)(state.key)
            key, sub = keys[..., 0, :], keys[..., 1, :]
            fresh, fresh_obs = jax.vmap(self.env.reset)(sub)
            fresh = fresh.replace(key=key)
        else:
            key, sub = jax.random.split(state.key)
            fresh, fresh_obs = self.env.reset(sub)
            fresh = fresh.replace(key=key)

        def pick(a, b):
            # `done` is scalar under vmap, (B,) on explicitly-batched states;
            # pad trailing dims so it broadcasts against every leaf.
            def sel(x, y):
                d = done.reshape(done.shape + (1,) * (x.ndim - done.ndim))
                return jnp.where(d, y, x)

            return jax.tree.map(sel, a, b)

        state = pick(state, fresh)
        obs = pick(obs, fresh_obs)
        info = dict(info, done=done)
        return state, obs, reward, terminated, truncated, info
