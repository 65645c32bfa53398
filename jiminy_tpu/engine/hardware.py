"""Hardware models: motor bank and typed sensor groups with shared batched storage.

TPU re-design of the reference's `core/src/hardware/` (AbstractMotor/SimpleMotor,
AbstractSensorTpl + basic sensors): instead of per-object C++ classes writing into a
shared effort matrix, each hardware family is a struct-of-arrays pytree whose update
is one vectorized op across all instances — and across all envs under `vmap`.

Sensor delay/jitter/noise (reference `abstract_sensor.h:67-99` + `abstract_sensor.hxx`
interpolation) use a fixed-length ring buffer carried in the sim state: static shapes,
no host round-trips.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from jiminy_tpu.models.model import RobotModel
from jiminy_tpu.models import joints as jt
from jiminy_tpu.ops import lie
from jiminy_tpu.ops.kinematics import (
    KinData,
    frame_classical_acceleration_local,
    frame_placement,
    frame_velocity_local,
)


# =============================================================================
# Motors
# =============================================================================


@struct.dataclass
class MotorBank:
    """All motors of one robot, struct-of-arrays (reference `SimpleMotor`,
    `hardware/basic_motors.cc:100-143`).

    Friction coefficients follow the reference's sign convention: they must be
    <= 0 (the friction torque `viscous*v + dry*tanh(slope*v)` is *added* to the
    transmission effort).
    """

    # static
    names: tuple = struct.field(pytree_node=False)
    joint_indices: tuple = struct.field(pytree_node=False)  # joint index per motor
    v_indices: tuple = struct.field(pytree_node=False)  # dof index per motor
    q_indices: tuple = struct.field(pytree_node=False)  # config index per motor
    # arrays (nm,)
    mechanical_reduction: jnp.ndarray
    effort_limit: jnp.ndarray  # motor-side
    velocity_limit: jnp.ndarray  # motor-side
    velocity_effort_inv_slope: jnp.ndarray
    armature: jnp.ndarray  # motor-side rotor inertia (folded into model at build)
    backlash: jnp.ndarray  # joint-side play width [rad]
    friction_viscous_pos: jnp.ndarray
    friction_viscous_neg: jnp.ndarray
    friction_dry_pos: jnp.ndarray
    friction_dry_neg: jnp.ndarray
    friction_dry_slope: jnp.ndarray
    enable_effort_limit: jnp.ndarray  # 0/1
    enable_velocity_limit: jnp.ndarray  # 0/1
    enable_friction: jnp.ndarray  # 0/1

    @property
    def nmotors(self) -> int:
        return len(self.names)

    # ------------------------------------------------------------------ #
    def compute_efforts(self, command: jnp.ndarray, v: jnp.ndarray):
        """Map motor commands to (u_motor, u_joint_full).

        command: (..., nm) motor-side target efforts.
        v: (..., nv) joint velocities.
        Returns (u_motor (..., nm), u_transmission scattered into (..., nv)).
        """
        vidx = jnp.asarray(self.v_indices, dtype=jnp.int32)
        v_joint = jnp.take(v, vidx, axis=-1)
        v_motor = self.mechanical_reduction * v_joint

        inf = jnp.asarray(jnp.inf, command.dtype)
        effort_min = jnp.where(self.enable_effort_limit > 0, -self.effort_limit, -inf)
        effort_max = jnp.where(self.enable_effort_limit > 0, self.effort_limit, inf)
        # Linear torque-speed envelope (reference basic_motors.cc:108-119).
        # Infinite limits disable the envelope; mask them out BEFORE the
        # arithmetic — `inf - inf` / `inf * 0` in the untaken `where` branch
        # would poison reverse-mode gradients (the sim is differentiable
        # end-to-end, tests/test_autodiff.py).
        el_fin = jnp.where(jnp.isfinite(self.effort_limit), self.effort_limit, 0.0)
        vl_fin = jnp.where(
            jnp.isfinite(self.velocity_limit), self.velocity_limit, 0.0
        )
        vel_delta = el_fin * self.velocity_effort_inv_slope
        vel_thr = jnp.maximum(vl_fin - vel_delta, 0.0)
        denom = jnp.maximum(vl_fin - vel_thr, 1e-12)
        scale_min = jnp.clip((vl_fin + v_motor) / denom, 0.0, 1.0)
        scale_max = jnp.clip((vl_fin - v_motor) / denom, 0.0, 1.0)
        apply_env = (
            (self.enable_effort_limit > 0)
            & (self.enable_velocity_limit > 0)
            & (vel_delta > 0.0)
            & jnp.isfinite(self.effort_limit)
            & jnp.isfinite(self.velocity_limit)
        )
        effort_min = jnp.where(apply_env, -el_fin * scale_min, effort_min)
        effort_max = jnp.where(apply_env, el_fin * scale_max, effort_max)

        u_motor = jnp.clip(command, effort_min, effort_max)
        u_trans = self.mechanical_reduction * u_motor

        fric = jnp.where(
            v_joint > 0.0,
            self.friction_viscous_pos * v_joint
            + self.friction_dry_pos * jnp.tanh(self.friction_dry_slope * v_joint),
            self.friction_viscous_neg * v_joint
            + self.friction_dry_neg * jnp.tanh(self.friction_dry_slope * v_joint),
        )
        u_trans = u_trans + jnp.where(self.enable_friction > 0, fric, 0.0)

        u_full = jnp.zeros(v.shape, v.dtype).at[..., vidx].add(u_trans)
        return u_motor, u_full


def build_motor_bank(model: RobotModel, motor_specs, dtype=None) -> MotorBank:
    """motor_specs: list of dicts {joint_name, [mechanical_reduction], [armature],
    [effort_limit], [velocity_limit], [friction_*], [backlash], enable_* flags}.
    Limits default to the model's URDF values (joint-side, converted motor-side)."""
    if dtype is None:
        dtype = model.dtype
    names, jidx, vidx, qidx = [], [], [], []
    cols = {
        k: []
        for k in (
            "mechanical_reduction",
            "effort_limit",
            "velocity_limit",
            "velocity_effort_inv_slope",
            "armature",
            "backlash",
            "friction_viscous_pos",
            "friction_viscous_neg",
            "friction_dry_pos",
            "friction_dry_neg",
            "friction_dry_slope",
            "enable_effort_limit",
            "enable_velocity_limit",
            "enable_friction",
        )
    }
    for spec in motor_specs:
        j = model.joint_index(spec["joint_name"])
        t = jt.JointType(model.joint_types[j])
        if jt.JOINT_NV[t] != 1:
            raise ValueError(f"motors only attach to 1-dof joints, got {t} for {spec}")
        names.append(spec.get("name", spec["joint_name"]))
        jidx.append(j)
        vidx.append(model.idx_v[j])
        qidx.append(model.idx_q[j])
        red = float(spec.get("mechanical_reduction", 1.0))
        eff_joint = float(np.asarray(model.effort_limit)[model.idx_v[j]])
        vel_joint = float(np.asarray(model.velocity_limit)[model.idx_v[j]])
        cols["mechanical_reduction"].append(red)
        cols["effort_limit"].append(float(spec.get("effort_limit", eff_joint / max(red, 1e-12))))
        cols["velocity_limit"].append(float(spec.get("velocity_limit", vel_joint * red)))
        cols["velocity_effort_inv_slope"].append(float(spec.get("velocity_effort_inv_slope", 0.0)))
        cols["armature"].append(float(spec.get("armature", 0.0)))
        cols["backlash"].append(float(spec.get("backlash", 0.0)))
        cols["friction_viscous_pos"].append(float(spec.get("friction_viscous_pos", 0.0)))
        cols["friction_viscous_neg"].append(float(spec.get("friction_viscous_neg", 0.0)))
        cols["friction_dry_pos"].append(float(spec.get("friction_dry_pos", 0.0)))
        cols["friction_dry_neg"].append(float(spec.get("friction_dry_neg", 0.0)))
        cols["friction_dry_slope"].append(float(spec.get("friction_dry_slope", 20.0)))
        cols["enable_effort_limit"].append(float(bool(spec.get("enable_effort_limit", True))))
        cols["enable_velocity_limit"].append(
            float(bool(spec.get("enable_velocity_limit", False)))
        )
        cols["enable_friction"].append(float(bool(spec.get("enable_friction", False))))
    arr = {k: jnp.asarray(np.array(v, dtype=np.float64), dtype=dtype) for k, v in cols.items()}
    return MotorBank(
        names=tuple(names),
        joint_indices=tuple(jidx),
        v_indices=tuple(vidx),
        q_indices=tuple(qidx),
        **arr,
    )


# =============================================================================
# Sensors
# =============================================================================


@struct.dataclass
class SensorRing:
    """Fixed-capacity delay line of raw measurements (one sensor group)."""

    times: jnp.ndarray  # (K,)
    data: jnp.ndarray  # (K, n, ndata)
    head: jnp.ndarray  # () int32 — index of most recent sample

    @staticmethod
    def create(capacity: int, n: int, ndata: int, dtype) -> "SensorRing":
        return SensorRing(
            times=jnp.full((capacity,), -1e30, dtype=dtype),
            data=jnp.zeros((capacity, n, ndata), dtype=dtype),
            head=jnp.asarray(0, jnp.int32),
        )

    def push(self, t, value) -> "SensorRing":
        head = (self.head + 1) % self.times.shape[0]
        return SensorRing(
            times=self.times.at[head].set(t),
            data=self.data.at[head].set(value),
            head=head,
        )

    def interpolate(self, t_query: jnp.ndarray, order: int) -> jnp.ndarray:
        """Zero/first-order interpolation of the delay line at time t_query.

        Mirrors the reference's delayed-measurement lookup
        (`abstract_sensor.hxx`: searchsorted + linear interp, held at the ends).
        """
        k = self.times.shape[0]
        if order == 0:
            # ZOH lookup is razor-edge sensitive when the delay is an exact
            # multiple of the update period: bias the query to always land on
            # the same side of the grid sample (the reference shifts by
            # STEPPER_MIN_TIMESTEP, `abstract_sensor.hxx:327-330`; scale with
            # the dtype ulp so the shift survives f32).
            eps_t = jnp.finfo(self.times.dtype).eps
            t_query = t_query + jnp.maximum(1e-10, 4.0 * eps_t * jnp.abs(t_query))
        # Unroll the ring into increasing-time order: oldest first
        offs = (self.head + 1 + jnp.arange(k)) % k
        times = self.times[offs]
        data = self.data[offs]
        # Index of the last sample with time <= t_query
        le = jnp.sum((times <= t_query).astype(jnp.int32)) - 1
        le = jnp.clip(le, 0, k - 1)
        t0, x0 = times[le], data[le]
        if order == 0:
            return x0
        ge = jnp.clip(le + 1, 0, k - 1)
        t1, x1 = times[ge], data[ge]
        denom = jnp.where(jnp.abs(t1 - t0) > 1e-12, t1 - t0, 1.0)
        alpha = jnp.clip((t_query - t0) / denom, 0.0, 1.0)
        return x0 + alpha * (x1 - x0)


class _GroupBase:
    """Common noise/bias/delay machinery for a typed sensor group."""

    fieldnames: tuple = ()

    @property
    def nsensors(self) -> int:
        raise NotImplementedError

    @property
    def ndata(self) -> int:
        return len(self.fieldnames)

    def ring_capacity(self, sensor_period: float) -> int:
        dmax = float(np.max(np.asarray(self.delay))) + float(np.max(np.asarray(self.jitter)))
        if dmax <= 0.0:
            return 2
        return int(np.ceil(dmax / max(sensor_period, 1e-12))) + 3

    def _apply_noise_bias(self, raw: jnp.ndarray, key) -> jnp.ndarray:
        out = raw
        if key is not None:
            out = out + self.noise_std * jax.random.normal(key, raw.shape, raw.dtype)
        return out + self.bias

    def measure(self, ring: SensorRing, t, key) -> jnp.ndarray:
        """Delayed + jittered + noisy measurement at time t, (n, ndata)."""
        delay = self.delay
        if key is not None:
            kj, kn = jax.random.split(key)
            delay = delay + self.jitter * jax.random.uniform(kj, self.delay.shape, self.delay.dtype)
        else:
            kn = None
        if float(np.max(np.asarray(self.delay))) > 0.0 or float(
            np.max(np.asarray(self.jitter))
        ) > 0.0:
            # Per-sensor query times (vmap over sensors of the group)
            def q(one_delay, idx):
                return ring.interpolate(t - one_delay, self.interp_order)[idx]

            raw = jax.vmap(q)(delay, jnp.arange(self.nsensors))
        else:
            raw = ring.data[ring.head]
        return self._apply_noise_bias(raw, kn)


def _opt_arrays(n, ndata, specs, dtype):
    noise = np.zeros((n, ndata))
    bias = np.zeros((n, ndata))
    delay = np.zeros((n,))
    jitter = np.zeros((n,))
    order = 1
    for i, s in enumerate(specs):
        noise[i] = np.broadcast_to(np.asarray(s.get("noise_std", 0.0), dtype=float), (ndata,))
        bias[i] = np.broadcast_to(np.asarray(s.get("bias", 0.0), dtype=float), (ndata,))
        delay[i] = float(s.get("delay", 0.0))
        jitter[i] = float(s.get("jitter", 0.0))
        order = int(s.get("delay_interpolation_order", order))
    return (
        jnp.asarray(noise, dtype),
        jnp.asarray(bias, dtype),
        jnp.asarray(delay, dtype),
        jnp.asarray(jitter, dtype),
        order,
    )


@struct.dataclass
class EncoderSensorGroup(_GroupBase):
    """Q, V of a motor or joint (reference `basic_sensors.cc:509-539`)."""

    fieldnames = ("Q", "V")
    names: tuple = struct.field(pytree_node=False)
    q_indices: tuple = struct.field(pytree_node=False)
    v_indices: tuple = struct.field(pytree_node=False)
    joint_types: tuple = struct.field(pytree_node=False)
    joint_side: tuple = struct.field(pytree_node=False)  # bool per sensor
    interp_order: int = struct.field(pytree_node=False)
    reduction: jnp.ndarray  # (n,)
    noise_std: jnp.ndarray
    bias: jnp.ndarray
    delay: jnp.ndarray
    jitter: jnp.ndarray

    @property
    def nsensors(self):
        return len(self.names)

    def compute_raw(self, model, kin: KinData, q, v, a, u_motor, contact_f) -> jnp.ndarray:
        out = []
        for i in range(self.nsensors):
            qi, vi = self.q_indices[i], self.v_indices[i]
            if jt.JointType(self.joint_types[i]) == jt.JointType.REVOLUTE_UNBOUNDED:
                pos = jnp.arctan2(q[..., qi + 1], q[..., qi])
            else:
                pos = q[..., qi]
            vel = v[..., vi]
            if not self.joint_side[i]:
                pos = pos * self.reduction[..., i]
                vel = vel * self.reduction[..., i]
            out.append(jnp.stack([pos, vel], axis=-1))
        return jnp.stack(out, axis=-2)


@struct.dataclass
class EffortSensorGroup(_GroupBase):
    """Motor effort U (reference EffortSensor)."""

    fieldnames = ("U",)
    names: tuple = struct.field(pytree_node=False)
    motor_indices: tuple = struct.field(pytree_node=False)
    interp_order: int = struct.field(pytree_node=False)
    noise_std: jnp.ndarray
    bias: jnp.ndarray
    delay: jnp.ndarray
    jitter: jnp.ndarray

    @property
    def nsensors(self):
        return len(self.names)

    def compute_raw(self, model, kin, q, v, a, u_motor, contact_f) -> jnp.ndarray:
        idx = jnp.asarray(self.motor_indices, jnp.int32)
        return jnp.take(u_motor, idx, axis=-1)[..., None]


@struct.dataclass
class ImuSensorGroup(_GroupBase):
    """Gyroscope + accelerometer at a frame (reference `basic_sensors.cc:142-188`):
    gyro = LOCAL angular velocity; accel = classical linear acceleration minus
    gravity, LOCAL frame.  Bias layout (9,): [rotation axis-angle (3), gyro (3),
    accel (3)] with the rotation applied as `R_b^-1 @ measurement`."""

    fieldnames = ("GyroX", "GyroY", "GyroZ", "AccelX", "AccelY", "AccelZ")
    names: tuple = struct.field(pytree_node=False)
    frame_indices: tuple = struct.field(pytree_node=False)
    interp_order: int = struct.field(pytree_node=False)
    rot_bias_inv: jnp.ndarray  # (n, 3, 3)
    noise_std: jnp.ndarray
    bias: jnp.ndarray
    delay: jnp.ndarray
    jitter: jnp.ndarray

    @property
    def nsensors(self):
        return len(self.names)

    def compute_raw(self, model, kin, q, v, a, u_motor, contact_f) -> jnp.ndarray:
        gravity = contact_f["gravity"]  # stashed by the engine
        out = []
        for i, fidx in enumerate(self.frame_indices):
            vel = frame_velocity_local(model, kin, fidx)
            acc = frame_classical_acceleration_local(model, kin, fidx)
            rot = frame_placement(model, kin, fidx).rot
            gyro = vel[..., :3]
            accel = acc[..., 3:] - lie.mv(jnp.swapaxes(rot, -1, -2), gravity)
            out.append(jnp.concatenate([gyro, accel], axis=-1))
        return jnp.stack(out, axis=-2)

    def _apply_noise_bias(self, raw, key):
        out = raw
        if key is not None:
            out = out + self.noise_std * jax.random.normal(key, raw.shape, raw.dtype)
        out = out + self.bias
        gyro = lie.mv(self.rot_bias_inv, out[..., 0:3])
        accel = lie.mv(self.rot_bias_inv, out[..., 3:6])
        return jnp.concatenate([gyro, accel], axis=-1)


@struct.dataclass
class ContactSensorGroup(_GroupBase):
    """Force at a declared contact frame, LOCAL frame (reference ContactSensor)."""

    fieldnames = ("FX", "FY", "FZ")
    names: tuple = struct.field(pytree_node=False)
    contact_slots: tuple = struct.field(pytree_node=False)  # index into robot contact list
    interp_order: int = struct.field(pytree_node=False)
    noise_std: jnp.ndarray
    bias: jnp.ndarray
    delay: jnp.ndarray
    jitter: jnp.ndarray

    @property
    def nsensors(self):
        return len(self.names)

    def compute_raw(self, model, kin, q, v, a, u_motor, contact_f) -> jnp.ndarray:
        f = contact_f["contact_forces_local"]  # (..., n_contact, 3) linear force
        idx = jnp.asarray(self.contact_slots, jnp.int32)
        return jnp.take(f, idx, axis=-2)


@struct.dataclass
class ForceSensorGroup(_GroupBase):
    """6D wrench at a frame = sum of contact wrenches on the same parent joint,
    transported to the sensor frame (reference `basic_sensors.cc:368-387`)."""

    fieldnames = ("FX", "FY", "FZ", "MX", "MY", "MZ")
    names: tuple = struct.field(pytree_node=False)
    frame_indices: tuple = struct.field(pytree_node=False)
    # For each sensor: tuple of (contact_slot, ) sharing the parent joint
    contact_slots: tuple = struct.field(pytree_node=False)
    interp_order: int = struct.field(pytree_node=False)
    noise_std: jnp.ndarray
    bias: jnp.ndarray
    delay: jnp.ndarray
    jitter: jnp.ndarray

    @property
    def nsensors(self):
        return len(self.names)

    def compute_raw(self, model, kin, q, v, a, u_motor, contact_f) -> jnp.ndarray:
        wrench = contact_f["contact_wrench_local"]  # (..., n_contact, 6) (ang, lin)
        contact_frames = contact_f["contact_frame_indices"]  # static tuple
        out = []
        for i, slots in enumerate(self.contact_slots):
            fpl_s = model.frame_placement(self.frame_indices[i])
            acc = None
            for s in slots:
                # Contact frame placement in the sensor frame: both are static
                # placements on the same parent joint.
                fpl_c = model.frame_placement(contact_frames[s])
                x = lie.se3_mul(lie.se3_inv(fpl_s), fpl_c)
                w = lie.force_act(x, wrench[..., s, :])
                acc = w if acc is None else acc + w
            if acc is None:
                batch = wrench.shape[:-2]
                acc = jnp.zeros(batch + (6,), wrench.dtype)
            # Reference layout is (F, M): linear first
            out.append(jnp.concatenate([acc[..., 3:], acc[..., :3]], axis=-1))
        return jnp.stack(out, axis=-2)


@struct.dataclass
class SensorSuite:
    """All sensor groups of one robot; iteration order is the telemetry order."""

    encoder: Optional[EncoderSensorGroup] = None
    effort: Optional[EffortSensorGroup] = None
    imu: Optional[ImuSensorGroup] = None
    contact: Optional[ContactSensorGroup] = None
    force: Optional[ForceSensorGroup] = None

    def groups(self):
        for name in ("encoder", "effort", "imu", "contact", "force"):
            g = getattr(self, name)
            if g is not None and g.nsensors > 0:
                yield name, g

    def init_rings(self, sensor_period: float, dtype) -> dict:
        return {
            name: SensorRing.create(g.ring_capacity(sensor_period), g.nsensors, g.ndata, dtype)
            for name, g in self.groups()
        }
