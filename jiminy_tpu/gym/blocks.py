"""Pipeline blocks: plug-and-play observers/controllers as pure functions.

Re-designs of the reference blocks (`gym_jiminy/common/blocks/`): each block is a
small config object with `init_state(env)` plus a pure update — controllers map
`(action, obs, state) -> (inner_command, state')`, observers map
`(obs, state, dt) -> (features, state')`.  The numba kernels of the reference
(`proportional_derivative_controller.py`, `mahony_filter.py`,
`motor_safety_limit.py`) become vectorized jnp code that batches over envs for
free under `vmap`.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax.numpy as jnp
import numpy as np

from jiminy_tpu.ops import lie


# =============================================================================
# PD controller
# =============================================================================


def integrate_zoh(state, state_min, state_max, dt):
    """Chained clipped integrators for the (pos, vel, accel) command state
    (reference `integrate_zoh`, `proportional_derivative_controller.py:24-100`).

    state: (..., 3, nm) — updated functionally, returns the new state.
    """
    position, velocity, acceleration = state[..., 0, :], state[..., 1, :], state[..., 2, :]
    pos_min, vel_min, acc_min = state_min[..., 0, :], state_min[..., 1, :], state_min[..., 2, :]
    pos_max, vel_max, acc_max = state_max[..., 0, :], state_max[..., 1, :], state_max[..., 2, :]

    acceleration = jnp.clip(acceleration, acc_min, acc_max)
    velocity_prev = velocity
    velocity = jnp.clip(velocity + acceleration * dt, vel_min, vel_max)

    # Slow down early enough to respect acceleration limits at position bounds
    horizon = jnp.maximum(
        jnp.floor(jnp.abs(velocity_prev) / acc_max / dt) * dt, dt
    )
    pos_min_delta = pos_min - position
    pos_max_delta = pos_max - position
    drift = jnp.where(
        horizon > dt, 0.5 * (horizon * (horizon - dt)) * acc_max, 0.0
    )
    v_lo = (pos_min_delta - drift) / horizon
    v_hi = (pos_max_delta + drift) / horizon
    velocity = jnp.clip(velocity, v_lo, v_hi)

    # Velocity after hitting bounds must be cancellable in a single step
    over = jnp.abs(velocity) > dt * acc_max
    safe_v = jnp.where(jnp.abs(velocity) > 1e-12, velocity, 1.0)
    v_lo2 = -jnp.maximum((pos_min_delta - drift) / safe_v, dt) * acc_max
    v_hi2 = jnp.maximum((pos_max_delta + drift) / safe_v, dt) * acc_max
    velocity = jnp.where(over, jnp.clip(velocity, v_lo2, v_hi2), velocity)

    acceleration = (velocity - velocity_prev) / dt
    position = position + dt * velocity
    return jnp.stack([position, velocity, acceleration], axis=-2)


class PDController:
    """Decentralized PD controller on motor side with position/velocity/
    acceleration bounds and ZOH integration of the command state (reference
    `PDController`, `proportional_derivative_controller.py:301`).

    Action = target motor accelerations; command effort =
    ``kp * ((q* - q) + kd * (v* - v))`` clipped to the effort limits.
    """

    name = "pd_controller"

    def __init__(
        self,
        kp,
        kd,
        target_position_margin: float = 0.0,
        target_velocity_limit: Optional[float] = None,
        target_acceleration_limit: Optional[float] = None,
    ):
        self.kp = jnp.asarray(kp)
        self.kd = jnp.asarray(kd)
        self.target_position_margin = target_position_margin
        self.target_velocity_limit = target_velocity_limit
        self.target_acceleration_limit = target_acceleration_limit

    def setup(self, env):
        m = env.robot.motors
        model = env.robot.model
        qidx = jnp.asarray(m.q_indices, jnp.int32)
        pos_lo = jnp.take(model.position_limit_lower, qidx) * m.mechanical_reduction
        pos_hi = jnp.take(model.position_limit_upper, qidx) * m.mechanical_reduction
        vel = m.velocity_limit
        if self.target_velocity_limit is not None:
            vel = jnp.minimum(vel, self.target_velocity_limit)
        acc = jnp.full_like(vel, self.target_acceleration_limit or 1.0e5)
        self._state_min = jnp.stack(
            [pos_lo + self.target_position_margin, -vel, -acc], axis=-2
        )
        self._state_max = jnp.stack(
            [pos_hi - self.target_position_margin, vel, acc], axis=-2
        )
        self._effort_limit = m.effort_limit
        self._dt = env.engine.control_period
        self.action_size = m.nmotors
        self.action_low = -np.asarray(acc)
        self.action_high = np.asarray(acc)
        return self

    def init_state(self, env_state):
        """Command state seeded from the current encoder measurement."""
        enc = env_state.sim.measurements["encoder"]  # (nm, 2)
        zero = jnp.zeros_like(enc[..., 0])
        return jnp.stack([enc[..., 0], enc[..., 1] * 0.0, zero], axis=-2)

    def compute(self, action, obs, block_state):
        cs = block_state.at[..., 2, :].set(action)
        cs = integrate_zoh(cs, self._state_min, self._state_max, self._dt)
        enc = obs["measurements"]["encoder"]  # (nm, 2) [Q, V]
        q_err = cs[..., 0, :] - enc[..., 0]
        v_err = cs[..., 1, :] - enc[..., 1]
        u = self.kp * (q_err + self.kd * v_err)
        u = jnp.clip(u, -self._effort_limit, self._effort_limit)
        return u, cs

    # -- fused in-kernel form ------------------------------------------- #
    def component_controller(self, env):
        """Component-wise form of `compute` for the engine's fused rollout
        (`Engine.step_rollout_fused`): the ZOH command-state integration,
        encoder read-out and PD law as per-motor elementwise math, traced
        into the Pallas env-step kernel.  Carry layout = the flattened
        (3, nm) command state `[pos* | vel* | acc*]`.  Ops mirror
        `integrate_zoh`/`compute` term-for-term, so the fused rollout is
        bit-identical to the per-period path at f64
        (tests/test_fused_rollout.py).  Returns (cfn, n_carry)."""
        from jiminy_tpu.models import joints as jt

        enc = env.robot.sensors.encoder
        nm = env.robot.motors.nmotors
        kp = np.broadcast_to(np.asarray(self.kp, float), (nm,))
        kd = np.broadcast_to(np.asarray(self.kd, float), (nm,))
        smin = np.asarray(self._state_min, float)  # (3, nm)
        smax = np.asarray(self._state_max, float)
        eff = np.asarray(self._effort_limit, float)
        red = np.asarray(enc.reduction, float)
        qidx, vidx = enc.q_indices, enc.v_indices
        jtypes, jside = enc.joint_types, enc.joint_side
        dt = float(self._dt)

        def cfn(qc, vc, bc, ac):
            cc = []
            bc_new = [None] * (3 * nm)
            for i in range(nm):
                p, vel = bc[i], bc[nm + i]
                acc_min, acc_max = smin[2, i], smax[2, i]
                accel = jnp.clip(ac[i], acc_min, acc_max)
                v_prev = vel
                vel = jnp.clip(vel + accel * dt, smin[1, i], smax[1, i])
                horizon = jnp.maximum(
                    jnp.floor(jnp.abs(v_prev) / acc_max / dt) * dt, dt
                )
                pos_min_d = smin[0, i] - p
                pos_max_d = smax[0, i] - p
                drift = jnp.where(
                    horizon > dt, 0.5 * (horizon * (horizon - dt)) * acc_max, 0.0
                )
                vel = jnp.clip(
                    vel, (pos_min_d - drift) / horizon,
                    (pos_max_d + drift) / horizon,
                )
                over = jnp.abs(vel) > dt * acc_max
                safe_v = jnp.where(jnp.abs(vel) > 1e-12, vel, 1.0)
                v_lo2 = -jnp.maximum((pos_min_d - drift) / safe_v, dt) * acc_max
                v_hi2 = jnp.maximum((pos_max_d + drift) / safe_v, dt) * acc_max
                vel = jnp.where(over, jnp.clip(vel, v_lo2, v_hi2), vel)
                accel_out = (vel - v_prev) / dt
                p = p + dt * vel
                # Encoder raw (delay/noise/bias-free — gated by
                # `Engine.supports_fused_rollout`)
                if jt.JointType(jtypes[i]) == jt.JointType.REVOLUTE_UNBOUNDED:
                    pos_m = jnp.arctan2(qc[qidx[i] + 1], qc[qidx[i]])
                else:
                    pos_m = qc[qidx[i]]
                vel_m = vc[vidx[i]]
                if not jside[i]:
                    pos_m = pos_m * red[i]
                    vel_m = vel_m * red[i]
                u = kp[i] * ((p - pos_m) + kd[i] * (vel - vel_m))
                cc.append(jnp.clip(u, -eff[i], eff[i]))
                bc_new[i] = p
                bc_new[nm + i] = vel
                bc_new[2 * nm + i] = accel_out
            return cc, bc_new

        return cfn, 3 * nm


class PDAdapter:
    """Adapter exposing target motor positions (order 0) or velocities (order 1)
    on top of a `PDController` (reference `PDAdapter`,
    `proportional_derivative_controller.py:538` + `pd_adapter` kernel)."""

    name = "pd_adapter"

    def __init__(self, order: int = 0, velocity_deadband: float = 0.0):
        if order not in (0, 1):
            raise ValueError("order must be 0 (position) or 1 (velocity)")
        self.order = order
        self.velocity_deadband = velocity_deadband

    def setup(self, env, pd: PDController):
        self._pd = pd
        self._state_min = pd._state_min
        self._state_max = pd._state_max
        self._dt = env.step_dt
        self.action_size = pd.action_size
        if self.order == 0:
            self.action_low = np.asarray(self._state_min[0])
            self.action_high = np.asarray(self._state_max[0])
        else:
            self.action_low = np.asarray(self._state_min[1])
            self.action_high = np.asarray(self._state_max[1])
        return self

    def init_state(self, env_state):
        return ()

    def compute(self, action, obs, block_state):
        """Returns target accelerations for the downstream PD controller."""
        pd_state = obs["_pd_command_state"]
        if self.order == 0:
            velocity = (action - pd_state[..., 0, :]) / self._dt
        else:
            velocity = action
        velocity = jnp.clip(
            velocity, self._state_min[..., 1, :], self._state_max[..., 1, :]
        )
        if self.velocity_deadband > 0.0:
            velocity = jnp.where(
                jnp.abs(velocity) < self.velocity_deadband, 0.0, velocity
            )
        accel = (velocity - pd_state[..., 1, :]) / self._dt
        return accel, block_state


# =============================================================================
# Motor safety limit
# =============================================================================


class MotorSafetyLimit:
    """Velocity/position-triggered effort clamping (reference
    `MotorSafetyLimit`, `motor_safety_limit.py:20-79`)."""

    name = "motor_safety_limit"

    def __init__(self, kp: float = 1.0, kd: float = 1.0, soft_position_margin: float = 0.0):
        self.kp = kp
        self.kd = kd
        self.soft_position_margin = soft_position_margin

    def setup(self, env):
        m = env.robot.motors
        model = env.robot.model
        qidx = jnp.asarray(m.q_indices, jnp.int32)
        self._pos_lo = (
            jnp.take(model.position_limit_lower, qidx) * m.mechanical_reduction
            + self.soft_position_margin
        )
        self._pos_hi = (
            jnp.take(model.position_limit_upper, qidx) * m.mechanical_reduction
            - self.soft_position_margin
        )
        self._vel_limit = m.velocity_limit
        self._effort_limit = m.effort_limit
        self.action_size = m.nmotors
        self.action_low = -np.asarray(m.effort_limit)
        self.action_high = np.asarray(m.effort_limit)
        return self

    def init_state(self, env_state):
        return ()

    def compute(self, action, obs, block_state):
        enc = obs["measurements"]["encoder"]
        q, v = enc[..., 0], enc[..., 1]
        safe_v_lo = self._vel_limit * jnp.clip(-self.kp * (q - self._pos_lo), -1.0, 1.0)
        safe_v_hi = self._vel_limit * jnp.clip(-self.kp * (q - self._pos_hi), -1.0, 1.0)
        safe_u_lo = self._effort_limit * jnp.clip(-self.kd * (v - safe_v_lo), -1.0, 1.0)
        safe_u_hi = self._effort_limit * jnp.clip(-self.kd * (v - safe_v_hi), -1.0, 1.0)
        return jnp.clip(action, safe_u_lo, safe_u_hi), block_state


# =============================================================================
# Mahony attitude filter
# =============================================================================


class MahonyFilter:
    """Explicit complementary filter on SO(3) for IMU attitude estimation
    (Mahony et al. 2008; reference `MahonyFilter`, `mahony_filter.py:30-100`).

    Observer: obs feature = {"attitude": (nimu, 4) quaternions,
    "omega": (nimu, 3) unbiased angular velocity}.
    """

    name = "mahony_filter"
    EARTH_SURFACE_GRAVITY = 9.81

    def __init__(self, kp: float = 1.0, ki: float = 0.1, exact_init: bool = True):
        self.kp = kp
        self.ki = ki
        self.exact_init = exact_init

    def setup(self, env):
        self.n_imu = env.robot.sensors.imu.nsensors
        self._dt = env.engine.sensor_period
        self._model = env.robot.model
        self._imu_frames = env.robot.sensors.imu.frame_indices
        return self

    def init_state(self, env_state):
        """Initial attitude estimate (reference `refresh_observation` init
        branch, `mahony_filter.py:338-368`): ``exact_init=True`` seeds from
        the TRUE IMU frame orientations (forward kinematics on the reset
        state); ``False`` seeds the swing (tilt) from the measured
        acceleration, falling back to ground truth when the robot is in free
        fall (|acc| < 0.1 g — e.g. dropped onto the ground at reset)."""
        from jiminy_tpu.ops.kinematics import forward_kinematics, frame_placement

        imu = env_state.sim.measurements["imu"]  # (nimu, 6)
        dtype = imu.dtype
        kin = forward_kinematics(self._model, env_state.sim.q)
        quat_true = jnp.stack(
            [
                lie.mat_to_quat(frame_placement(self._model, kin, f).rot)
                for f in self._imu_frames
            ],
            axis=-2,
        ).astype(dtype)
        if self.exact_init:
            quat = quat_true
        else:
            # Swing (tilt-only) rotation aligning e_z with the accel direction
            acc = imu[..., 3:6]
            norm = jnp.linalg.norm(acc, axis=-1, keepdims=True)
            a = acc / jnp.maximum(norm, 1e-9)
            ez = jnp.zeros_like(a).at[..., 2].set(1.0)
            axis = jnp.cross(a, ez)
            s = jnp.linalg.norm(axis, axis=-1)
            c = a[..., 2]
            angle = jnp.arctan2(s, c)
            axis = axis / jnp.maximum(s[..., None], 1e-9)
            quat = lie.quat_conjugate(lie.exp3(axis * angle[..., None]))
            free_fall = norm < 0.1 * self.EARTH_SURFACE_GRAVITY
            quat = jnp.where(free_fall, quat_true, quat)
        bias = jnp.zeros(imu.shape[:-1] + (3,), dtype)
        return {"quat": quat, "bias": bias}

    def refresh(self, obs, block_state):
        imu = obs["measurements"]["imu"]
        gyro, acc = imu[..., 0:3], imu[..., 3:6]
        quat, bias = block_state["quat"], block_state["bias"]
        # Expected gravity direction: v = R(q)^T e_z
        rot = lie.quat_to_mat(quat)
        v_exp = rot[..., 2, :]  # row 2 of R^T == column 2 of R transposed
        v_hat = acc / self.EARTH_SURFACE_GRAVITY
        omega_mes = jnp.cross(v_hat, v_exp)
        omega = gyro - bias
        cf = omega + self.kp * omega_mes
        quat = lie.quat_normalize(lie.quat_mul(quat, lie.exp3(cf * self._dt)))
        bias = bias - self.ki * self._dt * omega_mes
        new_state = {"quat": quat, "bias": bias}
        return {"attitude": quat, "omega": omega}, new_state


class BodyObserver:
    """Pass-through observer exposing the attitude/angular-velocity estimate of
    the IMU parent bodies with the twist part optionally removed (reference
    `BodyObserver`, `blocks/body_observer.py:74`)."""

    name = "body_observer"

    def __init__(self, twist_time_constant: Optional[float] = None):
        self.twist_time_constant = twist_time_constant

    def setup(self, env):
        return self

    def init_state(self, env_state):
        return ()

    def refresh(self, obs, block_state):
        feat = obs.get("features", {}).get("mahony_filter")
        if feat is None:
            raise ValueError("BodyObserver requires an upstream MahonyFilter")
        quat = feat["attitude"]
        if self.twist_time_constant is not None:
            # Remove the twist (yaw) part: swing-twist decomposition about e_z
            qx, qy, qz, qw = (
                quat[..., 0],
                quat[..., 1],
                quat[..., 2],
                quat[..., 3],
            )
            norm = jnp.sqrt(jnp.maximum(qw * qw + qz * qz, 1e-12))
            tw, tz = qw / norm, qz / norm
            # swing = q * twist^-1
            swing = lie.quat_mul(
                quat,
                jnp.stack([-tz * 0, -tz * 0, -tz, tw], axis=-1),
            )
            quat = lie.quat_normalize(swing)
        return {"attitude_no_twist": quat, "omega": feat["omega"]}, block_state


# =============================================================================
# Quantity observer + deformation estimator
# =============================================================================


class _SimView(NamedTuple):
    """Observation-level stand-in for `SimState` handed to quantities that
    only read kinematic state (q, v, t, measurements)."""

    t: object
    q: object
    v: object
    measurements: dict


class _StateView(NamedTuple):
    """Observation-level stand-in for `EnvState`."""

    sim: _SimView
    blocks: dict


class QuantityObserver:
    """Expose a quantity as an observation feature (reference
    `QuantityObserver`, `blocks/quantity_observer.py:47`)."""

    def __init__(self, name: str, quantity):
        self.name = name
        self.quantity = quantity
        self._env = None

    def setup(self, env):
        self._env = env
        return self

    def init_state(self, env_state):
        return ()

    def refresh(self, obs, block_state):
        # The quantity API takes the full env state; observers only see obs, so
        # the env reference captured at setup provides model access.  Obs-level
        # quantities receive a typed observation view (module-level
        # NamedTuples, not per-call synthesized classes — plain pytrees).
        sim = _SimView(
            t=obs.get("t"),
            q=obs["agent_state"]["q"],
            v=obs["agent_state"]["v"],
            measurements=obs.get("measurements", {}),
        )
        value = self.quantity(self._env, _StateView(sim=sim, blocks={}))
        return value, block_state


class DeformationEstimator:
    """Estimate flexibility-joint deformations from relative IMU attitudes
    (reference `DeformationEstimator`, `blocks/deformation_estimator.py:416`).

    For each flexibility joint, given an IMU on the parent side and one on the
    child side plus the mechanical joint positions (encoders), the rigid
    relative rotation between the IMU frames is reconstructed by FK with the
    flexibility set to identity; the residual rotation between the *measured*
    relative attitude and the rigid one is the deformation estimate:

        q_flex = (R̂_p · R_kin(p→flex))⁻¹ · (R̂_c · R_kin(c→flex))
    """

    name = "deformation_estimator"

    def __init__(self, flex_imu_pairs):
        """flex_imu_pairs: [(flex_joint_name, imu_parent_name, imu_child_name)]"""
        self.pairs = tuple(flex_imu_pairs)

    def setup(self, env):
        self._env = env
        model = env.robot.model
        imu = env.robot.sensors.imu
        self._imu_index = {n: i for i, n in enumerate(imu.names)}
        self._imu_frames = imu.frame_indices
        self._flex_joints = tuple(
            model.joint_index(p[0]) for p in self.pairs
        )
        return self

    def init_state(self, env_state):
        return ()

    def refresh(self, obs, block_state):
        env = self._env
        model = env.robot.model
        feat = obs.get("features", {}).get("mahony_filter")
        if feat is None:
            raise ValueError("DeformationEstimator requires an upstream MahonyFilter")
        quat_imu = feat["attitude"]  # (nimu, 4) world attitude estimates

        # Rigid configuration: encoder positions with identity flexibility
        q = obs["agent_state"]["q"]
        q_rigid = q
        for j in self._flex_joints:
            qi = model.idx_q[j]
            q_rigid = (
                q_rigid.at[..., qi : qi + 3].set(0.0).at[..., qi + 3].set(1.0)
            )
        from jiminy_tpu.ops.kinematics import forward_kinematics, frame_placement

        kin = forward_kinematics(model, q_rigid)

        out = []
        for (flex_name, imu_p, imu_c), j in zip(self.pairs, self._flex_joints):
            fp = self._imu_frames[self._imu_index[imu_p]]
            fc = self._imu_frames[self._imu_index[imu_c]]
            rot_p = frame_placement(model, kin, fp).rot
            rot_c = frame_placement(model, kin, fc).rot
            # Rigid relative rotation IMU_p -> IMU_c
            rel_rigid = lie.mm(jnp.swapaxes(rot_p, -1, -2), rot_c)
            qp = quat_imu[..., self._imu_index[imu_p], :]
            qc = quat_imu[..., self._imu_index[imu_c], :]
            rel_meas = lie.quat_to_mat(
                lie.quat_mul(lie.quat_conjugate(qp), qc)
            )
            # Deformation = rigid⁻¹ · measured
            deform = lie.mm(jnp.swapaxes(rel_rigid, -1, -2), rel_meas)
            out.append(lie.mat_to_quat(deform))
        return {"deformation": jnp.stack(out, axis=-2)}, block_state
