"""Toy control environments: CartPole, Acrobot, Pendulum swing-up.

The robots are built from the reference's own URDF assets
(`jiminy_tpu/data/toys_models/...`, vendored from
`gym_jiminy/envs/.../data/toys_models/`), with the same hardware the
reference envs attach in code: one SimpleMotor on the cart slider
(`cartpole.py:112-129`), on the elbow (`acrobot.py:78-96`), or on the
pendulum pivot.  Pass ``procedural=True`` to use the parametric builders
(`envs/builders.py`) instead — handy for randomizing link geometry.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from jiminy_tpu.engine.config import EngineOptions, IntegratorType, StepperOptions
from jiminy_tpu.envs import builders
from jiminy_tpu.envs import assets
from jiminy_tpu.gym.base import BaseEnv
from jiminy_tpu.models import joints as jt


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


class _AngleLayout:
    """Static q-layout helpers for chains of 1-dof joints, transparent to the
    REVOLUTE vs REVOLUTE_UNBOUNDED (cos/sin) representation difference between
    the procedural models and the reference URDFs (`continuous` joints)."""

    def __init__(self, model):
        self.model = model
        self.joints = [
            (jt.JointType(t), model.idx_q[j], model.idx_v[j])
            for j, t in enumerate(model.joint_types)
        ]

    def angles(self, q):
        """Per-joint scalar positions, (..., nj)."""
        out = []
        for t, iq, _ in self.joints:
            if t == jt.JointType.REVOLUTE_UNBOUNDED:
                out.append(jnp.arctan2(q[..., iq + 1], q[..., iq]))
            else:
                out.append(q[..., iq])
        return jnp.stack(out, axis=-1)

    def cos_sin(self, q, k):
        """(cos, sin) of joint k's angle (exact reads for unbounded joints)."""
        t, iq, _ = self.joints[k]
        if t == jt.JointType.REVOLUTE_UNBOUNDED:
            return q[..., iq], q[..., iq + 1]
        return jnp.cos(q[..., iq]), jnp.sin(q[..., iq])

    def q_of(self, thetas):
        """Configuration vector from per-joint scalar positions (..., nj)."""
        segs = []
        for k, (t, _, _) in enumerate(self.joints):
            th = thetas[..., k]
            if t == jt.JointType.REVOLUTE_UNBOUNDED:
                segs += [jnp.cos(th), jnp.sin(th)]
            else:
                segs += [th]
        return jnp.stack(segs, axis=-1)


def _toy_robot(name, procedural, build_fn, motor_joints, effort_limits=None):
    if procedural:
        return build_fn()
    from jiminy_tpu.engine.robot import Robot

    motors = [{"joint_name": j, "enable_velocity_limit": False} for j in motor_joints]
    if effort_limits:
        for m, e in zip(motors, effort_limits):
            m["effort_limit"] = e
    model = assets.load_robot(name, has_freeflyer=False).model
    return Robot.build(model, name=name, motors=motors)


class CartPoleEnv(BaseEnv):
    """Classic cart-pole balancing (reference `CartPoleJiminyEnv`, mirrors the
    OpenAI-gym termination/reward: +1 per step alive, terminate on |x| > 2.4 or
    |theta| > 12 deg).  Action: horizontal force on the cart, continuous
    [-10, 10] N (the reference exposes discrete +-10 N; use `discrete=True`)."""

    X_THRESHOLD = 2.4
    THETA_THRESHOLD = 12.0 * np.pi / 180.0

    def __init__(self, step_dt: float = 0.02, horizon: int = 500,
                 discrete: bool = False, procedural: bool = False):
        robot = _toy_robot(
            "cartpole", procedural, builders.build_cartpole, ["slider_to_cart"]
        )
        super().__init__(robot, _toy_options(), step_dt=step_dt, horizon=horizon)
        self.discrete = discrete
        self.layout = _AngleLayout(robot.model)

    def _sample_state(self, key):
        model = self.robot.model
        th = jax.random.uniform(key, (2,), model.dtype, -0.05, 0.05)
        kv = jax.random.fold_in(key, 1)
        v = jax.random.uniform(kv, (2,), model.dtype, -0.05, 0.05)
        return self.layout.q_of(th), v

    def observe(self, state):
        sim = state.sim
        ang = self.layout.angles(sim.q)
        return jnp.stack(
            [ang[..., 0], sim.v[..., 0], ang[..., 1], sim.v[..., 1]], axis=-1
        )

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
        ang = self.layout.angles(state.sim.q)
        return (
            (jnp.abs(ang[..., 0]) > self.X_THRESHOLD)
            | (jnp.abs(ang[..., 1]) > self.THETA_THRESHOLD)
            | state.sim.stepper.diverged
        )


class AcrobotEnv(BaseEnv):
    """Acrobot swing-up (reference `AcrobotJiminyEnv`): torque at the elbow,
    -1 reward per step until the tip rises above half the reachable height.

    `step_dt` defaults to the classic 0.2 s (reference `acrobot.py:17`
    STEP_DT) — the 1 Nm elbow motor needs ~30 J of resonant pumping, so the
    500-step horizon must span ~100 s for the task to be solvable at all."""

    def __init__(self, step_dt: float = 0.2, horizon: int = 500,
                 continuous: bool = True, procedural: bool = False):
        robot = _toy_robot(
            "acrobot", procedural, builders.build_acrobot, ["SecondArmJoint"]
        )
        super().__init__(robot, _toy_options(), step_dt=step_dt, horizon=horizon)
        self.continuous = continuous
        self.layout = _AngleLayout(robot.model)
        # Tip height threshold scales with the arm length (procedural arms are
        # unit length; the reference URDF's differ slightly)
        self.height_threshold = 1.0

    def _sample_state(self, key):
        model = self.robot.model
        th = jax.random.uniform(key, (2,), model.dtype, -0.1, 0.1)
        kv = jax.random.fold_in(key, 1)
        v = jax.random.uniform(kv, (2,), model.dtype, -0.1, 0.1)
        return self.layout.q_of(th), v

    def observe(self, state):
        q, v = state.sim.q, state.sim.v
        c1, s1 = self.layout.cos_sin(q, 0)
        c2, s2 = self.layout.cos_sin(q, 1)
        return jnp.stack([c1, s1, c2, s2, v[..., 0], v[..., 1]], axis=-1)

    def _tip_height(self, state):
        q = state.sim.q
        c1, s1 = self.layout.cos_sin(q, 0)
        c2, s2 = self.layout.cos_sin(q, 1)
        # cos(th1 + th2) = c1 c2 - s1 s2
        return -c1 - (c1 * c2 - s1 * s2)

    def _action_to_command(self, state, action, obs):
        if self.continuous:
            return _cmd1(action, -10.0, 10.0)
        a = jnp.atleast_1d(jnp.asarray(action))
        if a.shape[-1] != 1:
            a = a[..., None]
        return (a - 1.0) * 10.0

    def _compute_reward(self, state, action, next_state):
        return jnp.where(
            self._tip_height(next_state) > self.height_threshold, 0.0, -1.0
        ).astype(self.engine.dtype)

    def _is_terminated(self, state):
        return (self._tip_height(state) > self.height_threshold) | (
            state.sim.stepper.diverged
        )


class PendulumEnv(BaseEnv):
    """Torque-limited pendulum swing-up (classic control benchmark; robot =
    the reference's `simple_pendulum.urdf` test asset)."""

    def __init__(self, step_dt: float = 0.05, horizon: int = 200,
                 procedural: bool = False, torque_max: float = 2.0):
        if procedural:
            robot = builders.build_pendulum()
        else:
            from jiminy_tpu.engine.robot import Robot

            # The reference pendulum weighs 150 kg (simple_pendulum.urdf) —
            # scale the classic +-2 Nm swing-up torque accordingly.
            model = assets.load_robot("simple_pendulum", has_freeflyer=False).model
            robot = Robot.build(
                model, name="pendulum",
                motors=[{"joint_name": "PendulumJoint",
                         "enable_velocity_limit": False}],
            )
            torque_max = torque_max * float(np.asarray(model.mass).sum()) / 1.0
        self.torque_max = torque_max
        super().__init__(robot, _toy_options(), step_dt=step_dt, horizon=horizon)
        self.layout = _AngleLayout(robot.model)

    def _sample_state(self, key):
        model = self.robot.model
        th = jax.random.uniform(key, (1,), model.dtype, -np.pi, np.pi)
        kv = jax.random.fold_in(key, 1)
        v = jax.random.uniform(kv, (1,), model.dtype, -1.0, 1.0)
        return self.layout.q_of(th), v

    def observe(self, state):
        q, v = state.sim.q, state.sim.v
        c, s = self.layout.cos_sin(q, 0)
        return jnp.stack([c, s, v[..., 0]], axis=-1)

    def _action_to_command(self, state, action, obs):
        return _cmd1(action, -self.torque_max, self.torque_max)

    def _compute_reward(self, state, action, next_state):
        ang = self.layout.angles(next_state.sim.q)[..., 0]
        # Angle error w.r.t. upright (q = pi)
        err = jnp.arctan2(jnp.sin(ang - np.pi), jnp.cos(ang - np.pi))
        v = next_state.sim.v[..., 0]
        u = jnp.atleast_1d(jnp.asarray(action, self.engine.dtype))[..., 0]
        u_norm = u / self.torque_max
        return -(err**2 + 0.1 * v**2 + 0.001 * (2.0 * u_norm) ** 2)
