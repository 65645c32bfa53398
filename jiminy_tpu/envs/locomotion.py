"""Locomotion base env: walkers with randomized ground/perturbations and the
standard locomotion reward shaping (reference `WalkerJiminyEnv`,
`gym_jiminy/common/envs/locomotion.py:68`)."""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from jiminy_tpu.engine.config import (
    ContactModel,
    ContactOptions,
    EngineOptions,
    IntegratorType,
    StepperOptions,
)
from jiminy_tpu.gym.base import BaseEnv, EnvState


class WalkerEnv(BaseEnv):
    """Floating-base walker: terminate on falls, reward = alive bonus + forward
    velocity tracking - control effort (the reference composes this from its
    quantity/reward stack; here it is the built-in default, and the composition
    layer can override it)."""

    def __init__(
        self,
        robot,
        nominal_q: np.ndarray,
        step_dt: float = 0.04,
        horizon: int = 500,
        simulation_dt: float = 1.0e-3,
        contact_model: ContactModel = ContactModel.SPRING_DAMPER,
        target_velocity: float = 0.5,
        base_height_min: float = 0.2,
        std_ratio: float = 0.0,
        options: Optional[EngineOptions] = None,
    ):
        if options is None:
            options = EngineOptions(
                contacts=ContactOptions(
                    model=contact_model,
                    stiffness=1.0e5,
                    damping=2.0e3,
                    friction=1.0,
                ),
                stepper=StepperOptions(
                    integrator=IntegratorType.RUNGE_KUTTA_4, dt_max=simulation_dt
                ),
                controller_update_period=simulation_dt * 5,
                sensor_update_period=simulation_dt * 5,
                # Penalty bounds (stable inertia-scaled gains) enable the fused
                # component-wise dynamics fast path for RL workloads.
                joint_bounds_mode="penalty",
            )
        super().__init__(robot, options, step_dt=step_dt, horizon=horizon)
        nominal_q = np.asarray(nominal_q, dtype=float).copy()
        if robot.contact_frame_indices and nominal_q.shape[-1] >= 7:
            # Auto-level: shift the base so the lowest contact point starts just
            # above the ground (avoids huge initial penetration forces).
            from jiminy_tpu.ops.kinematics import forward_kinematics, frame_placement

            kin = forward_kinematics(robot.model, jnp.asarray(nominal_q))
            radii = robot.contact_radii or (0.0,) * len(robot.contact_frame_indices)
            min_z = min(
                float(frame_placement(robot.model, kin, f).pos[2]) - r
                for f, r in zip(robot.contact_frame_indices, radii)
            )
            nominal_q[2] -= min_z - 1e-3
        self.nominal_q = jnp.asarray(nominal_q, self.engine.dtype)
        self.target_velocity = target_velocity
        self.base_height_min = base_height_min
        self.std_ratio = std_ratio

    def _sample_state(self, key):
        model = self.robot.model
        q = self.nominal_q
        if self.std_ratio > 0.0:
            nq_joints = model.nq - 7
            noise = (
                jax.random.uniform(key, (nq_joints,), model.dtype, -1.0, 1.0)
                * 0.1
                * self.std_ratio
            )
            q = q.at[7:].add(noise)
        return q, jnp.zeros((model.nv,), model.dtype)

    def _sample_model_params(self, key):
        """Per-env dynamical randomization scaled by std_ratio (reference
        `WalkerJiminyEnv` model biasing)."""
        if self.std_ratio <= 0.0:
            return None
        from jiminy_tpu.engine.randomization import randomize_model

        return randomize_model(
            self.robot.model,
            key,
            mass_std=0.05 * self.std_ratio,
            com_std=0.005 * self.std_ratio,
            inertia_std=0.05 * self.std_ratio,
        )

    def base_height(self, state: EnvState):
        return state.sim.q[..., 2]

    def base_velocity_x(self, state: EnvState):
        return state.sim.v[..., 0]

    def _compute_reward(self, state, action, next_state):
        dtype = self.engine.dtype
        alive = jnp.asarray(1.0, dtype)
        vel_err = self.base_velocity_x(next_state) - self.target_velocity
        track = jnp.exp(-(vel_err**2) / (2 * 0.25**2))
        effort = jnp.sum(jnp.square(next_state.sim.u_motor), axis=-1) * 1e-4
        return alive + track - effort

    def _is_terminated(self, state):
        low = self.base_height(state) < self.base_height_min
        # Extreme base tilt: local z-axis of the base vs world up
        quat = state.sim.q[..., 3:7]
        from jiminy_tpu.ops import lie

        up = lie.quat_to_mat(quat)[..., 2, 2]
        tilted = up < 0.3
        return low | tilted | state.sim.stepper.diverged
