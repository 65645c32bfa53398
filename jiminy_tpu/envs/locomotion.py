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
            # Explicit-stable contact parameterization.  The fixed-step RK4
            # core integrates the contact spring-damper explicitly, so the
            # stiff contact mode must satisfy omega*dt <~ 0.35 and
            # (c/m_eff)*dt <~ 1 for the LIGHTEST contact-carrying body — the
            # real robots' feet weigh a few hundred grams, where the old
            # k=1e5/c=2e3 pair was unstable and sustained a spurious
            # vibration limit cycle (the reference avoids this with its
            # adaptive DOPRI stepper shrinking dt instead).  The friction
            # regularization slope mu*N/v_t is bounded the same way.
            masses = np.asarray(robot.model.mass, float)
            m_foot = min(
                (
                    float(masses[robot.model.frame_parents[f]])
                    for f in robot.contact_frame_indices
                ),
                default=1.0,
            )
            m_foot = max(m_foot, 0.05)
            omega = 0.35 / simulation_dt
            stiffness = min(m_foot * omega**2, 1.0e5)
            damping = 2.0 * 0.25 * m_foot * omega
            weight = float(masses.sum()) * 9.81
            n_c = max(len(robot.contact_frame_indices), 1)
            transition_velocity = max(
                0.01, 1.0 * (weight / n_c) * simulation_dt / (2.0 * m_foot)
            )
            options = EngineOptions(
                contacts=ContactOptions(
                    model=contact_model,
                    stiffness=stiffness,
                    damping=damping,
                    friction=1.0,
                    transition_velocity=transition_velocity,
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
