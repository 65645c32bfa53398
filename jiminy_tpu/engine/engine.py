"""The simulation engine: one pure function over a `SimState` pytree.

Functional re-design of the reference `Engine` (`core/src/engine/engine.cc`):

- `Engine.reset(q, v, key)`  — build the initial state (reference `Engine::start`,
  `engine.cc:952-1533`, minus telemetry which lives in `jiminy_tpu.telemetry`).
- `Engine.step(state, command)` — advance exactly one controller update period
  (reference `Engine::step`, `engine.cc:1724-2417`): integrate the continuous
  dynamics over each sensor period (fixed substeps or masked-adaptive DOPRI),
  then refresh sensor measurements.  Commands are zero-order-held, exactly like
  the reference's discrete controller updates.
- `Engine.simulate(state, n, policy)` — `lax.scan` of `step` (reference
  `Engine::simulate`).

Everything is jit-able and vmap-able; batching = `jax.vmap(engine.step)`.
"""

from __future__ import annotations

import math
from typing import Callable, Optional

import jax
import jax.numpy as jnp

from jiminy_tpu.engine import contact as contact_mod
from jiminy_tpu.engine import internal as internal_mod
from jiminy_tpu.engine import steppers
from jiminy_tpu.engine.config import ContactModel, EngineOptions, IntegratorType
from jiminy_tpu.engine.constraints import (
    ConstraintSystem,
    build_constraint_set,
    compute_constraint_system,
    compute_distance_refs,
)
from jiminy_tpu.engine.robot import Robot
from jiminy_tpu.engine.solver import constrained_forward_dynamics
from jiminy_tpu.engine.state import SimState, StepperState
from jiminy_tpu.ops import dynamics as dyn
from jiminy_tpu.ops import integrate as integ
from jiminy_tpu.ops import lie
from jiminy_tpu.ops.kinematics import forward_kinematics, joint_space_jacobian

# Fixed-point rounds solving the accel <-> sensors <-> command algebraic
# coupling at simulation start (reference `engine.cc:61`).
INIT_ITERATIONS = 4


class Engine:
    """Single-robot engine facade holding static configuration.

    Multi-robot simulation = one engine per robot under a shared outer loop, or a
    merged model (coupling forces land in `external_forces`); see
    `jiminy_tpu.engine.coupling`.
    """

    def with_options(self, options: EngineOptions) -> "Engine":
        """Fresh engine on the same robot with different options.  Always use
        this (never re-invoke ``__init__`` on a live engine) so every internal
        cache (`_period_runs`, `_cdyn`, ...) is rebuilt from scratch."""
        return type(self)(self.robot, options)

    def __init__(self, robot: Robot, options: Optional[EngineOptions] = None):
        self.robot = robot
        self.options = options or EngineOptions()
        self.dtype = robot.model.dtype
        self.gravity = jnp.asarray(self.options.world.gravity, self.dtype)
        opts = self.options
        self.sensor_period = opts.sensor_update_period or opts.controller_update_period
        self.control_period = opts.controller_update_period or self.sensor_period
        if self.control_period <= 0:
            raise ValueError("controller_update_period must be > 0")
        ratio = self.control_period / self.sensor_period
        if ratio >= 1.0 - 1e-9:
            # Sensors at least as fast as the controller: integrate per sensor
            # period, update sensors every tick.
            self.n_sensor_periods = max(int(round(ratio)), 1)
            if abs(ratio - self.n_sensor_periods) > 1e-9:
                raise ValueError(
                    "controller period must be a multiple of the sensor period"
                )
            self.n_ctrl_per_sensor = 1
            self.tick_period = self.sensor_period
        else:
            # Controller faster than sensors: integrate per controller period,
            # commit sensor measurements every `n_ctrl_per_sensor` ticks
            # (masked update — reference `engine.cc:2386-2410` period grid).
            inv = self.sensor_period / self.control_period
            self.n_ctrl_per_sensor = int(round(inv))
            if abs(inv - self.n_ctrl_per_sensor) > 1e-9:
                raise ValueError(
                    "sensor period must be a multiple of the controller period"
                )
            self.n_sensor_periods = 1
            self.tick_period = self.control_period
        self.n_substeps = max(int(math.ceil(self.tick_period / opts.stepper.dt_max - 1e-12)), 1)
        self.ground_fn = opts.world.ground_profile
        # Optional user forces: f(t, q, v) -> (..., nj, 6) LOCAL joint wrenches
        self.external_force_fn: Optional[Callable] = None
        self._registered_forces: list = []
        # Optional internal controller: u(t, q, v, measurements) -> command,
        # applied when `step` is called without an explicit command.
        self.controller: Optional[Callable] = None
        # Static per-group noise flags (resolved at build; avoids tracing hazards)
        import numpy as _np

        self._group_has_noise = {}
        self._group_needs_ring = {}
        # IMU groups resolved statically so the fused post-step path can emit
        # their raw measurements straight from the component-wise kinematics
        from jiminy_tpu.engine.hardware import ImuSensorGroup as _ImuGroup

        self._imu_group_frames = []  # [(group name, frame tuple)]
        for name, g in robot.sensors.groups():
            if isinstance(g, _ImuGroup):
                self._imu_group_frames.append((name, tuple(g.frame_indices)))
        self._imu_frames = tuple(
            f for _, frames in self._imu_group_frames for f in frames
        )
        for name, g in robot.sensors.groups():
            try:
                # "Has noise" really means "needs an RNG key": measurement
                # noise AND delay jitter both consume randomness
                # (`abstract_sensor.hxx:315-317` samples U(0, jitter)).
                self._group_has_noise[name] = bool(
                    _np.any(_np.asarray(g.noise_std) != 0.0)
                    or _np.any(_np.asarray(g.jitter) != 0.0)
                )
            except Exception:
                self._group_has_noise[name] = True
            try:
                self._group_needs_ring[name] = bool(
                    _np.max(_np.asarray(g.delay)) + _np.max(_np.asarray(g.jitter)) > 0.0
                )
            except Exception:
                self._group_needs_ring[name] = True
        # Constraint registry: in CONSTRAINT contact mode all registries are
        # active; in SPRING_DAMPER mode only loop closures go through the solver
        # (the reference routes USER constraints through PGS in both modes).
        self.constraint_mode = self.options.contacts.model == ContactModel.CONSTRAINT
        # Joint bounds default to the PGS solver in both contact modes (the
        # reference enforces bounds via `JointConstraint`, `engine.cc:3268-3338`);
        # in "penalty" mode they become stable spring-dampers instead, which
        # unlocks the fused component-wise dynamics core.
        bounds_constraint = self.options.joint_bounds_mode == "constraint"
        self.cset = build_constraint_set(
            robot,
            loop_pairs=robot.loop_pairs,
            include_contacts=self.constraint_mode,
            include_bounds=bounds_constraint,
        )
        self.has_constraints = self.cset.total_rows > 0
        self._bound_gains = (
            self._build_penalty_bound_gains()
            if self.options.joint_bounds_mode == "penalty"
            else {}
        )
        self._has_joint_damping = bool(
            _np.any(_np.asarray(robot.model.damping) != 0.0)
        )
        self._cdyn = None
        self._cdyn_cm = None  # component CRBA/NLE for the constrained path
        self._period_runs = {}  # fused whole-period integrators, per kind
        fast_opt = self.options.use_fast_dynamics
        fast_enabled = fast_opt == "always" or (
            fast_opt is True and jax.default_backend() != "cpu"
        )
        self._has_pairs = bool(robot.collision_pairs_geom)
        if (
            fast_enabled
            and not self.constraint_mode
            and not self.has_constraints
            and not self._has_pairs
        ):
            from jiminy_tpu.ops import cdyn as cdyn_mod

            if cdyn_mod.supports_model(robot.model):
                self._cdyn = cdyn_mod.ComponentDynamics(
                    robot.model,
                    tuple(float(g) for g in opts.world.gravity),
                    contact_opts=opts.contacts,
                    contact_frames=robot.contact_frame_indices,
                    contact_radii=robot.contact_radii,
                    ground_fn=self.ground_fn,
                    bound_gains=self._bound_gains,
                    pallas_tile=opts.pallas_tile,
                )
        if fast_enabled and self.has_constraints:
            from jiminy_tpu.ops import cdyn as cdyn_mod

            if cdyn_mod.supports_model(robot.model):
                # Constrained path: component-wise CRBA/NLE + spring-damper
                # contact forces (PGS rows are assembled separately)
                self._cdyn_cm = cdyn_mod.ComponentDynamics(
                    robot.model,
                    tuple(float(g) for g in opts.world.gravity),
                    contact_opts=opts.contacts if not self.constraint_mode else None,
                    contact_frames=(
                        robot.contact_frame_indices if not self.constraint_mode else ()
                    ),
                    contact_radii=(
                        robot.contact_radii if not self.constraint_mode else ()
                    ),
                    ground_fn=self.ground_fn,
                )

    def _build_penalty_bound_gains(self) -> dict:
        """Per-joint penalty gains kp = m_ii ω², kd = 2 m_ii ω with m_ii the
        apparent joint inertia at the neutral pose — stable by construction for
        the explicit integrators (ω·dt << 1)."""
        import numpy as _np

        from jiminy_tpu.models import joints as _jt

        model = self.robot.model
        candidates = list(self.robot.motors.joint_indices) if self.robot.motors else []
        candidates += list(self.robot.backlash_joint_indices)
        if not candidates:
            return {}
        q0 = model.neutral()
        m_diag = _np.asarray(jnp.diagonal(dyn.crba(model, q0)))
        omega = 2.0 * math.pi * self.options.joint_bounds_freq
        gains = {}
        lo_all = _np.asarray(model.position_limit_lower)
        hi_all = _np.asarray(model.position_limit_upper)
        for j in candidates:
            t = _jt.JointType(model.joint_types[j])
            if t not in (_jt.JointType.REVOLUTE, _jt.JointType.PRISMATIC):
                continue
            qi, vi = model.idx_q[j], model.idx_v[j]
            lo, hi = float(lo_all[qi]), float(hi_all[qi])
            if not (_np.isfinite(lo) or _np.isfinite(hi)):
                continue
            m = max(float(m_diag[vi]), 1e-6)
            gains[vi] = (lo, hi, m * omega**2, 2.0 * m * omega, qi)
        return gains

    # ------------------------------------------------------------------ #
    # External force registration (reference `Engine::registerImpulseForce` /
    # `registerProfileForce`, `engine.h:630-645`): wrenches act at a frame in
    # world-aligned axes and are converted onto the parent joint.
    # ------------------------------------------------------------------ #
    def register_profile_force(self, frame_name: str, force_fn: Callable) -> None:
        """`force_fn(t) -> (6,)` world-aligned wrench (ang, lin) at the frame."""
        fidx = self.robot.model.frame_index(frame_name)
        self._registered_forces.append(("profile", fidx, force_fn))
        self._rebuild_force_fn()

    def register_impulse_force(
        self, frame_name: str, t_start: float, duration: float, wrench
    ) -> None:
        """Constant world wrench applied during [t_start, t_start+duration]."""
        fidx = self.robot.model.frame_index(frame_name)
        w = jnp.asarray(wrench, self.dtype)

        def force_fn(t):
            on = (t >= t_start) & (t < t_start + duration)
            return jnp.where(on, 1.0, 0.0) * w

        self._registered_forces.append(("impulse", fidx, force_fn))
        self._rebuild_force_fn()

    def register_state_force(self, force_fn: Callable) -> None:
        """`force_fn(t, q, v, kin) -> (..., nj, 6)` LOCAL joint wrenches —
        state-dependent user force (multi-robot coupling forces on a merged
        model ride through here; reference coupling-force registry,
        `engine.h:490-550`)."""
        self._registered_forces.append(("state", None, force_fn))
        self._rebuild_force_fn()

    def remove_forces(self) -> None:
        self._registered_forces = []
        self.external_force_fn = None

    def _rebuild_force_fn(self) -> None:
        model = self.robot.model
        entries = list(self._registered_forces)

        def fn(t, q, v):
            kin = forward_kinematics(model, q, v)
            fext = jnp.zeros(q.shape[:-1] + (model.njoints, 6), q.dtype)
            from jiminy_tpu.ops.kinematics import frame_placement

            for kind, fidx, force_fn in entries:
                if kind == "state":
                    fext = fext + force_fn(t, q, v, kin)
                    continue
                w = force_fn(t)
                parent = model.frame_parents[fidx]
                fpl = frame_placement(model, kin, fidx)
                rot_j = kin.omi.rot[..., parent, :, :]
                pos_j = kin.omi.pos[..., parent, :]
                lever = fpl.pos - pos_j
                f_w = w[..., 3:6]
                n_w = w[..., 0:3] + jnp.cross(lever, f_w)
                rt = jnp.swapaxes(rot_j, -1, -2)
                fext = fext.at[..., parent, 0:3].add(lie.mv(rt, n_w))
                fext = fext.at[..., parent, 3:6].add(lie.mv(rt, f_w))
            return fext

        self.external_force_fn = fn if entries else None

    # ------------------------------------------------------------------ #
    # Continuous dynamics
    # ------------------------------------------------------------------ #
    def dynamics_full(self, t, q, v, command, carry=None, fext_extra=None):
        """Full dynamics evaluation (reference `Engine::computeRobotsDynamics`,
        `engine.cc:3585-3708`).  Returns (a, aux).

        `carry` holds constraint activity/warm-start from the period start
        (contact_active, bound_active, lam, distance_ref); None = all inactive.
        `fext_extra`: extra (..., nj, 6) LOCAL joint wrenches (multi-robot
        coupling forces are injected here).
        """
        robot = self.robot
        model = self._model_of(carry)
        nc = len(robot.contact_frame_indices)
        batch = q.shape[:-1]

        # FK with zero acceleration: `acc` leaves are the velocity-bias terms used
        # by constraint drifts (reference model.cc:1253-1268); positions and
        # velocities serve contacts either way.
        zero_a = jnp.zeros(batch + (model.nv,), q.dtype)
        kin = forward_kinematics(model, q, v, zero_a)

        fext_user = (
            self.external_force_fn(t, q, v) if self.external_force_fn is not None else None
        )
        if fext_extra is not None:
            fext_user = fext_extra if fext_user is None else fext_user + fext_extra

        aux_pairs = {}
        if self._has_pairs:
            # Body-vs-body narrowphase (self-collision): sphere-sphere
            # spring-damper forces in BOTH contact modes (ground contacts may
            # still go through PGS; the pair forces ride in as joint wrenches).
            fext_pairs, pair_f, pair_depth = contact_mod.compute_pair_forces(
                model, self.options.contacts, kin, robot.collision_pairs_geom
            )
            fext_user = fext_pairs if fext_user is None else fext_user + fext_pairs
            aux_pairs = {"pair_f_world": pair_f, "pair_depth": pair_depth}

        u = internal_mod.flexibility_torque(robot, q, v)

        if robot.motors is not None and robot.motors.nmotors:
            u_motor, u_full = robot.motors.compute_efforts(command, v)
            u = u + u_full
        else:
            u_motor = jnp.zeros(batch + (0,), q.dtype)
        # cdyn applies -damping*v internally; add it here for the other paths
        u_cdyn = u
        if self._has_joint_damping:
            u = u - model.damping * v

        if not self.constraint_mode:
            fext, f_world, w_local, depth = contact_mod.compute_contact_forces(
                model, self.options.contacts, self.ground_fn, kin,
                robot.contact_frame_indices, robot.contact_radii,
            )
            if fext_user is not None:
                fext = fext + fext_user
            if (
                self._cdyn is not None
                and fext_user is None
                and (carry is None or carry.get("model") is None)
            ):
                # Fused path: contacts + penalty bounds + joint damping
                # evaluated inside cdyn (identical values; the generic contact
                # pass above only feeds the sensor/telemetry aux outputs).
                a = self._cdyn.accel(q, v, u_cdyn)
                aux_c = {}
            elif self.has_constraints:  # joint bounds + loop closures via PGS
                if self._bound_gains:
                    u = u + internal_mod.penalty_bounds_torque(
                        self._bound_gains, model.nv, q, v
                    )
                csys, a, lam = self._constrained_accel(
                    t, q, v, u, fext, kin, carry,
                    contacts_in_fext=fext_user is None,
                )
                aux_c = {
                    "lam": lam,
                    "contact_active": csys.contact_active,
                    "bound_active": csys.bound_active,
                }
            else:
                if self._bound_gains:
                    u = u + internal_mod.penalty_bounds_torque(
                        self._bound_gains, model.nv, q, v
                    )
                a = dyn.aba(model, self.gravity, q, v, u, fext)
                aux_c = {}
            return a, {
                "u_motor": u_motor,
                "contact_f_world": f_world,
                "contact_w_local": w_local,
                "contact_depth": depth,
                **aux_pairs,
                **aux_c,
            }

        # ---------------- constraint contact mode ----------------
        fext = fext_user
        csys, a, lam = self._constrained_accel(t, q, v, u, fext, kin, carry)
        # Extract reported contact forces from multipliers: world force in the
        # normal basis (reference engine.cc:3770-3857 write-back)
        off_b, off_c, _, _ = self.cset.row_offsets()
        if nc:
            lam_c = lam[..., off_c : off_c + 4 * nc]
            lam_blocks = lam_c.reshape(lam_c.shape[:-1] + (nc, 4))
            f_world = lie.mv(csys.contact_basis, lam_blocks[..., 0:3])
            tau_n_world = csys.contact_basis[..., :, 2] * lam_blocks[..., 3:4]
            # LOCAL contact-frame wrench for sensors
            w_local_list = []
            for k, fidx in enumerate(robot.contact_frame_indices):
                from jiminy_tpu.ops.kinematics import frame_placement

                rot = frame_placement(model, kin, fidx).rot
                f_l = lie.mv(jnp.swapaxes(rot, -1, -2), f_world[..., k, :])
                n_l = lie.mv(jnp.swapaxes(rot, -1, -2), tau_n_world[..., k, :])
                w_local_list.append(jnp.concatenate([n_l, f_l], axis=-1))
            w_local = jnp.stack(w_local_list, axis=-2)
        else:
            f_world = jnp.zeros(batch + (0, 3), q.dtype)
            w_local = jnp.zeros(batch + (0, 6), q.dtype)
        return a, {
            "u_motor": u_motor,
            "contact_f_world": f_world,
            "contact_w_local": w_local,
            "contact_depth": csys.contact_depth,
            **aux_pairs,
            "lam": lam,
            "contact_active": csys.contact_active,
            "bound_active": csys.bound_active,
        }

    def _constrained_accel(self, t, q, v, u, fext, kin, carry,
                           contacts_in_fext: bool = False):
        """PGS-constrained forward dynamics path.

        `contacts_in_fext=True` marks that `fext` consists exactly of the
        spring-damper ground contact forces (no user forces) — the fully
        component-wise fast path then recomputes them internally and skips the
        generic array `fext` entirely."""
        model = self._model_of(carry)
        batch = q.shape[:-1]
        cset = self.cset
        if carry is None:
            carry = {
                "contact_active": jnp.zeros(batch + (cset.n_contacts,), bool),
                "bound_active": jnp.zeros(batch + (cset.n_bounds,), bool),
                "lam": jnp.zeros(batch + (cset.total_rows,), q.dtype),
                "distance_ref": jnp.zeros(batch + (cset.n_distance,), q.dtype),
            }
        if (
            self._cdyn_cm is not None
            and (fext is None or contacts_in_fext)
            and (carry is None or carry.get("model") is None)
            and cset.total_rows > 0
        ):
            # Fully component-wise constrained dynamics (no generic
            # FK/Jacobian): bounds + cone contacts + distance loops — see
            # `solver.constrained_accel_full_components`
            import math as _math

            from jiminy_tpu.engine.solver import (
                constrained_accel_full_components,
            )

            omega = 2.0 * _math.pi * self.options.contacts.stabilization_freq
            nv = model.nv
            qc = [q[..., i] for i in range(model.nq)]
            vc = [v[..., i] for i in range(nv)]
            tc = [u[..., i] for i in range(nv)]
            cactc = [carry["contact_active"][..., k] for k in range(cset.n_contacts)]
            bactc = [carry["bound_active"][..., k] for k in range(cset.n_bounds)]
            drefc = [carry["distance_ref"][..., k] for k in range(cset.n_distance)]
            rollref = carry.get("rolling_ref")
            rollrefc = (
                [rollref[..., k] for k in range(cset.n_rolling)]
                if rollref is not None
                else []
            )
            lamc = [carry["lam"][..., r] for r in range(cset.total_rows)]
            qdd_c, lam_c, basis, depth, cact, bact = (
                constrained_accel_full_components(
                    self._cdyn_cm, cset, qc, vc, tc,
                    self.ground_fn if self.constraint_mode else None,
                    omega * omega, 2.0 * omega,
                    self.options.contacts.transition_eps,
                    self.options.contacts.friction,
                    self.options.contacts.torsion,
                    self.options.stepper.pgs_regularization,
                    self.options.stepper.pgs_iter_max,
                    cactc, bactc, drefc, lamc, q.dtype,
                    rollrefc=rollrefc,
                )
            )

            def stack(comps, dtype=q.dtype):
                return (
                    jnp.stack(
                        [jnp.broadcast_to(x, batch) for x in comps], axis=-1
                    ).astype(dtype)
                    if comps
                    else jnp.zeros(batch + (0,), dtype)
                )

            nc = cset.n_contacts
            if nc:
                # basis[k] = (c0, c1, n) columns -> (..., nc, 3, 3)
                cols = []
                for k in range(nc):
                    c0, c1, n_col = basis[k]
                    mat = jnp.stack(
                        [
                            jnp.stack(
                                [jnp.broadcast_to(x, batch) for x in col],
                                axis=-1,
                            )
                            for col in (c0, c1, n_col)
                        ],
                        axis=-1,
                    )  # (..., 3 rows, 3 cols)
                    cols.append(mat)
                contact_basis = jnp.stack(cols, axis=-3).astype(q.dtype)
            else:
                contact_basis = jnp.zeros(batch + (0, 3, 3), q.dtype)
            csys = ConstraintSystem(
                jac=jnp.zeros(batch + (cset.total_rows, nv), q.dtype),
                drift=jnp.zeros(batch + (cset.total_rows,), q.dtype),
                active=jnp.ones(batch + (cset.total_rows,), bool),
                contact_basis=contact_basis,
                contact_active=stack(cact, bool) if nc else jnp.zeros(batch + (0,), bool),
                bound_active=(
                    stack(bact, bool)
                    if cset.n_bounds
                    else jnp.zeros(batch + (0,), bool)
                ),
                contact_depth=stack(depth) if nc else jnp.zeros(batch + (0,), q.dtype),
            )
            return csys, stack(qdd_c), stack(lam_c)
        jac_world = joint_space_jacobian(model, kin)
        csys = compute_constraint_system(
            model,
            cset,
            self.options.contacts,
            self.ground_fn,
            kin,
            jac_world,
            q,
            v,
            carry["contact_active"],
            carry["bound_active"],
            distance_ref=carry["distance_ref"],
            rolling_ref=carry.get("rolling_ref"),
        )
        use_cdyn = (
            self._cdyn_cm is not None
            and (carry is None or carry.get("model") is None)
        )
        res = constrained_forward_dynamics(
            model,
            self.gravity,
            q,
            v,
            u,
            fext,
            csys,
            cset,
            carry["lam"],
            self.options.contacts.friction,
            self.options.contacts.torsion,
            self.options.stepper.pgs_regularization,
            self.options.stepper.pgs_iter_max,
            cdyn_obj=self._cdyn_cm if use_cdyn else None,
        )
        return csys, res.qdd, res.lam

    def _accel_fn(self, command, carry=None) -> Callable:
        has_override = carry is not None and carry.get("model") is not None
        if self._cdyn is not None and self.external_force_fn is None and not has_override:
            robot = self.robot

            has_flex = (
                robot.flexibility is not None and robot.flexibility.joint_indices
            )

            def f(t, q, v):
                if robot.motors is not None and robot.motors.nmotors:
                    _, u = robot.motors.compute_efforts(command, v)
                else:
                    u = jnp.zeros(q.shape[:-1] + (robot.nv,), q.dtype)
                if has_flex:
                    u = u + internal_mod.flexibility_torque(robot, q, v)
                return self._cdyn.accel(q, v, u)

            return f
        return lambda t, q, v: self.dynamics_full(t, q, v, command, carry)[0]

    def _build_tau_c(self):
        """Component-wise motor-transmission closure for the fused period
        integrator — per-motor static constants, mirror of
        `MotorBank.compute_efforts` (reference `basic_motors.cc:100-143`)."""
        import numpy as _np

        motors = self.robot.motors
        nv = self.robot.nv
        if motors is None or not motors.nmotors:
            return lambda qc, vc, cc: [0.0] * nv
        f = lambda arr: _np.asarray(arr, dtype=_np.float64)
        red, el = f(motors.mechanical_reduction), f(motors.effort_limit)
        vl, inv_s = f(motors.velocity_limit), f(motors.velocity_effort_inv_slope)
        en_e = f(motors.enable_effort_limit) > 0
        en_v = f(motors.enable_velocity_limit) > 0
        en_f = f(motors.enable_friction) > 0
        fvp, fvn = f(motors.friction_viscous_pos), f(motors.friction_viscous_neg)
        fdp, fdn = f(motors.friction_dry_pos), f(motors.friction_dry_neg)
        fds = f(motors.friction_dry_slope)
        vidx = motors.v_indices

        def tau_c(qc, vc, cc):
            tc = [0.0] * nv
            for m in range(len(vidx)):
                vi = vidx[m]
                v_j = vc[vi]
                u = cc[m]
                # inf effort limit x zero slope -> no envelope (avoid inf*0=nan)
                vel_delta = (
                    float(el[m] * inv_s[m]) if _np.isfinite(el[m]) else 0.0
                )
                if en_e[m] and en_v[m] and vel_delta > 0.0:
                    # Linear torque-speed envelope
                    v_m = float(red[m]) * v_j
                    vel_thr = max(float(vl[m]) - vel_delta, 0.0)
                    denom = max(float(vl[m]) - vel_thr, 1e-12)
                    smin = jnp.clip((float(vl[m]) + v_m) / denom, 0.0, 1.0)
                    smax = jnp.clip((float(vl[m]) - v_m) / denom, 0.0, 1.0)
                    u = jnp.clip(u, -float(el[m]) * smin, float(el[m]) * smax)
                elif en_e[m]:
                    u = jnp.clip(u, -float(el[m]), float(el[m]))
                u_t = float(red[m]) * u
                if en_f[m]:
                    fr = jnp.where(
                        v_j > 0.0,
                        float(fvp[m]) * v_j
                        + float(fdp[m]) * jnp.tanh(float(fds[m]) * v_j),
                        float(fvn[m]) * v_j
                        + float(fdn[m]) * jnp.tanh(float(fds[m]) * v_j),
                    )
                    u_t = u_t + fr
                tc[vi] = tc[vi] + u_t
            return tc

        return tau_c

    def _get_period_run(self, kind: str):
        """Lazily-built fused period integrator (whole sensor period — all
        substeps, the end-of-period dynamics outputs and the raw sensor
        kinematics — in one component-wise trace / one Pallas kernel per env
        tile)."""
        run = self._period_runs.get(kind)
        if run is None:
            dt = self.tick_period / self.n_substeps
            run = self._cdyn.make_period_integrator(
                self._build_tau_c(),
                dt,
                self.n_substeps,
                integrator=kind,
                pallas_tile=self._cdyn.pallas_tile,
                imu_frames=self._imu_frames,
            )
            self._period_runs[kind] = run
        return run

    def _get_constrained_period_run(self, kind: str):
        """Lazily-built fused period integrator for the constrained path —
        joint bounds, cone-friction contacts (CONSTRAINT contact mode) and
        distance loops through the boxed Gauss–Seidel solve at every stage,
        the whole tick in one component-wise trace / one Pallas kernel per
        env tile (see `solver.make_constrained_period_integrator`)."""
        key = "cstr-" + kind
        run = self._period_runs.get(key)
        if run is None:
            from jiminy_tpu.engine.solver import make_constrained_period_integrator

            omega = 2.0 * math.pi * self.options.contacts.stabilization_freq
            run = make_constrained_period_integrator(
                self._cdyn_cm,
                self._build_tau_c(),
                # The per-stage path applies penalty bound torques only in the
                # spring-damper branch of `dynamics_full` — mirror that.
                {} if self.constraint_mode else self._bound_gains,
                self.tick_period / self.n_substeps,
                self.n_substeps,
                kind,
                self.cset,
                self.ground_fn if self.constraint_mode else None,
                omega * omega,
                2.0 * omega,
                self.options.contacts.transition_eps,
                self.options.contacts.friction,
                self.options.contacts.torsion,
                self.options.stepper.pgs_regularization,
                self.options.stepper.pgs_iter_max,
                n_cmd=self.robot.nmotors,
                pallas_tile=self.options.pallas_tile,
                imu_frames=self._imu_frames,
                stage_warm_start=self.options.stepper.pgs_stage_warm_start,
            )
            self._period_runs[key] = run
        return run

    def _unpack_period_extras(self, extras, command, v, n_lam: int = 0,
                              n_cact: int = 0, n_bact: int = 0):
        """Split the fused period integrator's extras row into (a, aux) —
        layout `[a | f_world | w_local | depth | imu | lam | cact | bact]`
        (see `ComponentDynamics.make_period_integrator` and
        `solver.make_constrained_period_integrator`)."""
        robot = self.robot
        nv = robot.nv
        nc = len(robot.contact_frame_indices)
        batch = extras.shape[:-1]
        a = extras[..., :nv]
        off = nv
        fw = extras[..., off : off + 3 * nc].reshape(batch + (nc, 3))
        off += 3 * nc
        wl = extras[..., off : off + 6 * nc].reshape(batch + (nc, 6))
        off += 6 * nc
        depth = extras[..., off : off + nc]
        off += nc
        raws = {}
        for name, frames in self._imu_group_frames:
            k = len(frames)
            raws[name] = extras[..., off : off + 6 * k].reshape(batch + (k, 6))
            off += 6 * k
        lam = extras[..., off : off + n_lam] if n_lam else None
        off += n_lam
        cact = extras[..., off : off + n_cact] > 0.5 if n_cact else None
        off += n_cact
        bact = extras[..., off : off + n_bact] > 0.5 if n_bact else None
        off += n_bact
        if robot.motors is not None and robot.motors.nmotors:
            u_motor, _ = robot.motors.compute_efforts(command, v)
        else:
            u_motor = jnp.zeros(batch + (0,), extras.dtype)
        aux = {
            "u_motor": u_motor,
            "contact_f_world": fw,
            "contact_w_local": wl,
            "contact_depth": depth,
            "sensor_raws": raws,
        }
        if lam is not None:
            aux["lam"] = lam
        if cact is not None:
            aux["contact_active"] = cact
        if bact is not None:
            aux["bound_active"] = bact
        return a, aux

    def _final_eval(self, t, q, v, command, carry):
        """(a, aux) at an accepted step endpoint.

        Fast path: when the fused component core is active, the whole post-step
        pipeline (ABA + contact forces + IMU raws) is one component-wise trace —
        no generic spatial-algebra FK (the dominant per-step overhead at large
        batch).  Values are bit-identical to `dynamics_full` at f64."""
        use_fused = (
            self._cdyn is not None
            and self.external_force_fn is None
            and (carry is None or carry.get("model") is None)
        )
        if not use_fused:
            return self.dynamics_full(t, q, v, command, carry)
        robot = self.robot
        batch = q.shape[:-1]
        if robot.motors is not None and robot.motors.nmotors:
            u_motor, u = robot.motors.compute_efforts(command, v)
        else:
            u_motor = jnp.zeros(batch + (0,), q.dtype)
            u = jnp.zeros(batch + (robot.nv,), q.dtype)
        if robot.flexibility is not None and robot.flexibility.joint_indices:
            u = u + internal_mod.flexibility_torque(robot, q, v)
        a = self._cdyn.accel(q, v, u)
        auxc = self._cdyn.aux_outputs(q, v, a, imu_frames=self._imu_frames)
        raws = {}
        off = 0
        imu_raw = auxc.pop("imu_raw")
        for name, frames in self._imu_group_frames:
            raws[name] = imu_raw[..., off : off + len(frames), :]
            off += len(frames)
        aux = {"u_motor": u_motor, "sensor_raws": raws, **auxc}
        return a, aux

    def _carry_of(self, state: SimState) -> dict:
        return {
            "contact_active": state.contact_active,
            "bound_active": state.bound_active,
            "lam": state.lam,
            "distance_ref": state.distance_ref,
            "rolling_ref": state.rolling_ref,
            "model": state.model_params,
        }

    def _tick_time(self, tick, t_prev, n_ticks: int):
        """Simulation time at engine tick `tick`, derived from the integer tick
        counter: `t = tick * tick_period` (single rounding, <= 0.5 ulp of t)
        instead of accumulating `t += dt` per tick, whose error grows with the
        tick count.  This is the TPU-f32 answer to the reference's
        Kahan-compensated time accumulation (`engine.cc:1790-1795`) and int64
        telemetry time (`constants.h:18-20`): the int32 tick IS the exact
        clock; float time is a projection of it.  Falls back to accumulation
        when the state carries no tick counter."""
        if tick is None:
            return t_prev + jnp.asarray(n_ticks * self.tick_period, self.dtype)
        return tick.astype(self.dtype) * jnp.asarray(self.tick_period, self.dtype)

    def _model_of(self, carry) -> "object":
        if carry is not None and carry.get("model") is not None:
            return carry["model"]
        return self.robot.model

    # ------------------------------------------------------------------ #
    # State construction
    # ------------------------------------------------------------------ #
    def reset(self, q0, v0=None, key=None, model_params=None) -> SimState:
        """Initial consistent state (reference `Engine::start` fixed-point init).

        `model_params`: optional RobotModel with biased array leaves — the env
        then simulates these parameters (vmap a batch of them for per-env
        domain randomization)."""
        model = model_params if model_params is not None else self.robot.model
        q0 = jnp.asarray(q0, self.dtype)
        v0 = jnp.zeros((model.nv,), self.dtype) if v0 is None else jnp.asarray(v0, self.dtype)
        q0 = integ.normalize(model, q0)
        if key is None:
            key = jax.random.PRNGKey(0)
        nm = self.robot.nmotors
        command = jnp.zeros((nm,), self.dtype)
        cset = self.cset
        if cset.n_distance or cset.n_rolling:
            kin0 = forward_kinematics(model, q0)
            dist_ref = (
                compute_distance_refs(model, cset, kin0)
                if cset.n_distance
                else jnp.zeros((0,), self.dtype)
            )
            from jiminy_tpu.ops.kinematics import frame_placement as _fp

            roll_frames = [f for f, _ in cset.sphere_specs] + [
                f for f, _, _ in cset.wheel_specs
            ]
            roll_ref = (
                jnp.stack(
                    [_fp(model, kin0, f).pos[..., 2] for f in roll_frames], axis=-1
                )
                if roll_frames
                else jnp.zeros((0,), self.dtype)
            )
        else:
            dist_ref = jnp.zeros((0,), self.dtype)
            roll_ref = jnp.zeros((0,), self.dtype)
        carry0 = {
            "contact_active": jnp.zeros((cset.n_contacts,), bool),
            "bound_active": jnp.zeros((cset.n_bounds,), bool),
            "lam": jnp.zeros((cset.total_rows,), self.dtype),
            "distance_ref": dist_ref,
            "rolling_ref": roll_ref,
            "model": model_params,
        }
        # `_final_eval` routes through the fused component-wise dynamics when
        # available (bit-identical to `dynamics_full` at f64) — resets happen
        # every step under auto-reset training, so this is a hot path.
        t0 = jnp.asarray(0.0, self.dtype)

        def mk_state(command, a0, aux):
            """Fresh t=0 state from a dynamics eval — rings start empty so the
            fixed-point iterations below do not pollute the delay lines."""
            return SimState(
                t=t0,
                q=q0,
                v=v0,
                a=a0,
                command=command,
                u_motor=aux["u_motor"],
                contact_forces=aux["contact_f_world"],
                stepper=StepperState(
                    dt=jnp.asarray(
                        min(self.options.stepper.dt_init, self.options.stepper.dt_max),
                        self.dtype,
                    ),
                    iterations=jnp.asarray(0, jnp.int32),
                    iter_failed=jnp.asarray(0, jnp.int32),
                    successive_iter_failed=jnp.asarray(0, jnp.int32),
                    diverged=jnp.asarray(False),
                ),
                sensor_rings=self.robot.sensors.init_rings(
                    self.sensor_period, self.dtype
                ),
                measurements={},
                key=key,
                tick=jnp.asarray(0, jnp.int32),
                contact_active=aux.get("contact_active", carry0["contact_active"]),
                bound_active=aux.get("bound_active", carry0["bound_active"]),
                lam=aux.get("lam", carry0["lam"]),
                distance_ref=dist_ref,
                rolling_ref=roll_ref,
                model_params=model_params,
            )

        a0, aux = self._final_eval(t0, q0, v0, command, carry0)
        # Prime sensors at t=0 so the first observation is valid
        st = self._update_sensors(mk_state(command, a0, aux), a0, aux)
        # Algebraic coupling accel <-> sensors <-> command: with an attached
        # sensor-feedback controller the initial (measurements, command, a)
        # triple is mutually dependent; iterate to a fixed point exactly like
        # the reference `Engine::start` (INIT_ITERATIONS=4 rounds of
        # accel -> sensors -> command, `engine.cc:61,1400-1467`).  Each round
        # rebuilds the state from scratch (same RNG key, empty rings), so the
        # converged round is the only one that leaves a trace.
        if self.controller is not None:
            for _ in range(INIT_ITERATIONS):
                command = jnp.asarray(
                    self.controller(st.t, st.q, st.v, st.measurements), self.dtype
                )
                a0, aux = self._final_eval(t0, q0, v0, command, carry0)
                st = self._update_sensors(mk_state(command, a0, aux), a0, aux)
        return st

    # ------------------------------------------------------------------ #
    # Sensors
    # ------------------------------------------------------------------ #
    def _update_sensors(self, state: SimState, a, aux) -> SimState:
        robot = self.robot
        suite = robot.sensors
        groups = list(suite.groups())
        if not groups:
            return state.replace(measurements={})
        any_ring = any(self._group_needs_ring.get(n, True) for n, _ in groups)
        any_noise = any(self._group_has_noise.get(n, True) for n, _ in groups)
        if state.t.ndim >= 1 and (any_ring or any_noise):
            # Explicitly-batched state with delay lines or per-env noise:
            # ring indexing / key splitting are per-env, so vmap this stage.
            return jax.vmap(lambda s, a_, x: self._update_sensors(s, a_, x))(
                state, a, aux
            )
        model_s = (
            state.model_params if state.model_params is not None else robot.model
        )
        # Generic FK is only needed by kinematic sensors (IMU) whose raws were
        # not already produced by the fused component-wise post-step path.
        raws = aux.get("sensor_raws") or {}
        imu_names = {name for name, _ in self._imu_group_frames}
        kin = None
        if any(name in imu_names and name not in raws for name, _ in groups):
            kin = forward_kinematics(model_s, state.q, state.v, a)
        contact_f = {
            "gravity": self.gravity,
            "contact_forces_local": aux["contact_w_local"][..., 3:6],
            "contact_wrench_local": aux["contact_w_local"],
            "contact_frame_indices": robot.contact_frame_indices,
        }
        rings = dict(state.sensor_rings)
        meas = {}
        key = state.key
        for name, g in groups:
            if name in raws:
                raw = raws[name]
            else:
                raw = g.compute_raw(
                    robot.model, kin, state.q, state.v, a, aux["u_motor"], contact_f
                )
            noisy = self._group_has_noise.get(name, True)
            sub = None
            if noisy:
                key, sub = jax.random.split(key)
            if not self._group_needs_ring.get(name, True):
                # Delay-free group: measurement = raw + noise/bias directly —
                # no ring traffic, batch-transparent (Pallas fast path).
                meas[name] = g._apply_noise_bias(raw, sub if noisy else None)
                continue
            ring = rings[name].push(state.t, raw)
            rings[name] = ring
            meas[name] = g.measure(ring, state.t, sub if noisy else None)
        return state.replace(sensor_rings=rings, measurements=meas, key=key)

    # ------------------------------------------------------------------ #
    # Integration over one sensor period
    # ------------------------------------------------------------------ #
    def _integrate_period(self, state: SimState, command) -> tuple:
        """Advance (q, v) by one engine tick (min of sensor and controller
        periods); returns (state', a, aux)."""
        opts = self.options.stepper
        model = self.robot.model
        carry = self._carry_of(state)
        period = jnp.asarray(self.tick_period, self.dtype)

        # Fully-fused fixed-step path: the whole tick (all substeps x stages)
        # is one component-wise trace — and one Pallas kernel per env tile —
        # instead of per-stage array-level dynamics evals.
        fused_kind = {
            IntegratorType.EULER_EXPLICIT: "euler",
            IntegratorType.RUNGE_KUTTA_4: "rk4",
        }.get(opts.integrator)
        if (
            fused_kind is not None
            and self._cdyn is not None
            and self.external_force_fn is None
            and carry.get("model") is None
            and (
                self.robot.flexibility is None
                or not self.robot.flexibility.joint_indices
            )
        ):
            q, v, extras = self._get_period_run(fused_kind)(
                state.q, state.v, command
            )
            a, aux = self._unpack_period_extras(extras, command, v)
            new_stepper = state.stepper.replace(
                iterations=state.stepper.iterations + self.n_substeps
            )
            return state.replace(q=integ.normalize(model, q), v=v), a, aux, new_stepper

        # Fused constrained path (joint bounds + cone-friction contacts +
        # distance loops through the boxed Gauss–Seidel solve): the whole tick
        # runs as one component-wise trace / one Pallas kernel per env tile.
        # Warm-start lam, distance_ref and the active-set masks ride along as
        # extra "command" channels (constant across the tick — the same
        # per-tick warm-start/hysteresis semantics as the per-stage path).
        cset = self.cset
        if (
            fused_kind is not None
            and self._cdyn is None
            and self._cdyn_cm is not None
            and not self._has_pairs
            and self.external_force_fn is None
            and carry.get("model") is None
            and (
                self.robot.flexibility is None
                or not self.robot.flexibility.joint_indices
            )
            and cset.total_rows > 0
        ):
            dtype = state.q.dtype
            cc = jnp.concatenate(
                [
                    command,
                    state.distance_ref,
                    state.lam,
                    state.contact_active.astype(dtype),
                    state.bound_active.astype(dtype),
                    state.rolling_ref,
                ],
                axis=-1,
            )
            q, v, extras = self._get_constrained_period_run(fused_kind)(
                state.q, state.v, cc
            )
            a, aux = self._unpack_period_extras(
                extras,
                command,
                v,
                n_lam=cset.total_rows,
                n_cact=cset.n_contacts,
                n_bact=cset.n_bounds,
            )
            new_stepper = state.stepper.replace(
                iterations=state.stepper.iterations + self.n_substeps
            )
            return state.replace(q=integ.normalize(model, q), v=v), a, aux, new_stepper

        f = self._accel_fn(command, carry)

        # Stage-chained PGS warm start (reference semantics: the multipliers
        # and constraint enable flags persist across every solve,
        # `constraint_solvers.cc:344,436-444`): thread (lam, active sets)
        # through every dynamics evaluation of the tick; the end-of-tick
        # final eval then warm-starts from the last stage and its solution
        # becomes the next tick's carry.
        stage_warm = self.has_constraints and opts.pgs_stage_warm_start
        if stage_warm:
            _PGS_KEYS = ("lam", "contact_active", "bound_active")

            def f2(t, q, v, pgs):
                a, aux = self.dynamics_full(t, q, v, command, {**carry, **pgs})
                return a, {k: aux[k] for k in _PGS_KEYS}

            pgs0 = {k: carry[k] for k in _PGS_KEYS}

        if opts.integrator == IntegratorType.EULER_EXPLICIT:
            dt = period / self.n_substeps

            if stage_warm:

                def body(c_, _):
                    t, q, v, pgs = c_
                    q, v, a, pgs = steppers.euler_step_stateful(
                        model, f2, t, q, v, dt, pgs
                    )
                    return (t + dt, q, v, pgs), None

                (t_end, q, v, pgs), _ = jax.lax.scan(
                    body, (state.t, state.q, state.v, pgs0), None,
                    length=self.n_substeps,
                )
                carry_fin = {**carry, **pgs}
            else:

                def body(c_, _):
                    t, q, v = c_
                    q, v, a = steppers.euler_step(model, f, t, q, v, dt)
                    return (t + dt, q, v), None

                (t_end, q, v), _ = jax.lax.scan(
                    body, (state.t, state.q, state.v), None,
                    length=self.n_substeps,
                )
                carry_fin = carry
            a, aux = self._final_eval(t_end, q, v, command, carry_fin)
            new_stepper = state.stepper.replace(
                iterations=state.stepper.iterations + self.n_substeps
            )
            return state.replace(q=integ.normalize(model, q), v=v), a, aux, new_stepper

        if opts.integrator == IntegratorType.RUNGE_KUTTA_4:
            dt = period / self.n_substeps

            if stage_warm:

                def body(c_, _):
                    t, q, v, pgs = c_
                    q, v, a, pgs = steppers.rk4_step_stateful(
                        model, f2, t, q, v, dt, pgs
                    )
                    return (t + dt, q, v, pgs), None

                (t_end, q, v, pgs), _ = jax.lax.scan(
                    body, (state.t, state.q, state.v, pgs0), None,
                    length=self.n_substeps,
                )
                carry_fin = {**carry, **pgs}
            else:

                def body(c_, _):
                    t, q, v = c_
                    q, v, a = steppers.rk4_step(model, f, t, q, v, dt)
                    return (t + dt, q, v), None

                (t_end, q, v), _ = jax.lax.scan(
                    body, (state.t, state.q, state.v), None,
                    length=self.n_substeps,
                )
                carry_fin = carry
            a, aux = self._final_eval(t_end, q, v, command, carry_fin)
            new_stepper = state.stepper.replace(
                iterations=state.stepper.iterations + self.n_substeps
            )
            return state.replace(q=integ.normalize(model, q), v=v), a, aux, new_stepper

        # ---------------- adaptive DOPRI 5(4), masked lock-step ----------------
        if stage_warm:
            a0, pgs_a0 = f2(state.t, state.q, state.v, pgs0)
        else:
            a0 = f(state.t, state.q, state.v)
        eps = jnp.asarray(1e-12, self.dtype)

        def cond(c):
            return (c["t_local"] < period - eps) & (~c["diverged"]) & (c["trials"] < 100000)

        def body(c):
            remaining = period - c["t_local"]
            dt_try = jnp.minimum(c["dt_pref"], remaining)
            if stage_warm:
                # The threaded solver state advances on every trial — even
                # rejected ones, as in the reference (lambda_ written back on
                # every solve).
                q5, v5, err_vec, mag, a_last, pgs_t = (
                    steppers.dopri_trial_stateful(
                        model, f2, state.t + c["t_local"], c["q"], c["v"],
                        c["a"], dt_try, c["pgs"],
                    )
                )
            else:
                q5, v5, err_vec, mag, a_last = steppers.dopri_trial(
                    model, f, state.t + c["t_local"], c["q"], c["v"], c["a"], dt_try
                )
            err = steppers.dopri_error_norm(err_vec, mag, opts.tol_abs, opts.tol_rel)
            err = jnp.where(jnp.isnan(err), jnp.asarray(jnp.inf, err.dtype), err)
            ok, dt_new = steppers.dopri_adjust(dt_try, err, opts.dt_min, opts.dt_max)
            clamped = dt_try < c["dt_pref"]
            # On success keep the preferred dt unless the trial dt was the
            # preferred one (mirror of the reference's dtLargest bookkeeping)
            dt_pref = jnp.where(
                ok,
                jnp.where(clamped, c["dt_pref"], dt_new),
                dt_new,
            )
            succ_failed = jnp.where(ok, 0, c["succ_failed"] + 1)
            diverged = succ_failed >= opts.successive_iter_failed_max
            out = {
                "q": jnp.where(ok, q5, c["q"]),
                "v": jnp.where(ok, v5, c["v"]),
                "a": jnp.where(ok, a_last, c["a"]),
                "t_local": jnp.where(ok, c["t_local"] + dt_try, c["t_local"]),
                "dt_pref": dt_pref,
                "iters": c["iters"] + ok.astype(jnp.int32),
                "fails": c["fails"] + (~ok).astype(jnp.int32),
                "succ_failed": succ_failed,
                "diverged": diverged,
                "trials": c["trials"] + 1,
            }
            if stage_warm:
                out["pgs"] = pgs_t
            return out

        init = {
            "q": state.q,
            "v": state.v,
            "a": a0,
            "t_local": jnp.asarray(0.0, self.dtype),
            "dt_pref": state.stepper.dt,
            "iters": state.stepper.iterations,
            "fails": state.stepper.iter_failed,
            "succ_failed": state.stepper.successive_iter_failed,
            "diverged": state.stepper.diverged,
            "trials": jnp.asarray(0, jnp.int32),
        }
        if stage_warm:
            init["pgs"] = pgs_a0
        c = jax.lax.while_loop(cond, body, init)
        q, v = integ.normalize(model, c["q"]), c["v"]
        carry_fin = {**carry, **c["pgs"]} if stage_warm else carry
        a, aux = self._final_eval(state.t + period, q, v, command, carry_fin)
        new_stepper = StepperState(
            dt=c["dt_pref"],
            iterations=c["iters"],
            iter_failed=c["fails"],
            successive_iter_failed=c["succ_failed"],
            diverged=c["diverged"],
        )
        return state.replace(q=q, v=v), a, aux, new_stepper

    # ------------------------------------------------------------------ #
    # Fused whole-env-step rollout (controller traced into the kernel)
    # ------------------------------------------------------------------ #
    @property
    def supports_fused_rollout(self) -> bool:
        """True when `step_rollout_fused` can replace a scan of per-period
        `step` calls bit-for-bit: fixed-step fused fast path active, one
        sensor tick per controller period, and every sensor group delay- and
        noise-free (the in-kernel controller reads encoders straight from the
        state, so rings/noise/bias must not alter the measurement)."""
        fused_kind = self.options.stepper.integrator in (
            IntegratorType.EULER_EXPLICIT,
            IntegratorType.RUNGE_KUTTA_4,
        )
        groups = list(self.robot.sensors.groups())
        clean_sensors = all(
            not self._group_needs_ring.get(n, True)
            and not self._group_has_noise.get(n, True)
            for n, _ in groups
        )
        import numpy as _np

        bias_free = all(
            not _np.any(_np.asarray(getattr(g, "bias", 0.0)) != 0.0)
            for _, g in groups
        )
        fused_core = self._cdyn is not None or (
            # Constrained path: bounds/contacts/loops through the in-kernel
            # Gauss-Seidel solve, per-tick warm-start refresh done in-kernel
            self._cdyn_cm is not None
            and not self._has_pairs
            and self.cset.total_rows > 0
        )
        return (
            fused_kind
            and fused_core
            and self.external_force_fn is None
            and self.n_sensor_periods == 1
            and self.n_ctrl_per_sensor == 1
            and clean_sensors
            and bias_free
            and (
                self.robot.flexibility is None
                or not self.robot.flexibility.joint_indices
            )
        )

    def _get_rollout_run(self, cache_key: str, controller_fn, n_carry: int,
                         n_action: int, n_periods: int):
        run = self._period_runs.get(("rollout", cache_key, n_periods))
        if run is None:
            kind = {
                IntegratorType.EULER_EXPLICIT: "euler",
                IntegratorType.RUNGE_KUTTA_4: "rk4",
            }[self.options.stepper.integrator]
            if self._cdyn is not None:
                run = self._cdyn.make_rollout_integrator(
                    self._build_tau_c(),
                    self.tick_period / self.n_substeps,
                    self.n_substeps,
                    n_periods,
                    controller_fn,
                    n_carry,
                    n_action,
                    self.robot.nmotors,
                    integrator=kind,
                    pallas_tile=self._cdyn.pallas_tile,
                    imu_frames=self._imu_frames,
                )
            else:
                from jiminy_tpu.engine.solver import (
                    make_constrained_rollout_integrator,
                )

                omega = 2.0 * math.pi * self.options.contacts.stabilization_freq
                run = make_constrained_rollout_integrator(
                    self._cdyn_cm,
                    self._build_tau_c(),
                    {} if self.constraint_mode else self._bound_gains,
                    self.tick_period / self.n_substeps,
                    self.n_substeps,
                    kind,
                    self.cset,
                    self.ground_fn if self.constraint_mode else None,
                    omega * omega,
                    2.0 * omega,
                    self.options.contacts.transition_eps,
                    self.options.contacts.friction,
                    self.options.contacts.torsion,
                    self.options.stepper.pgs_regularization,
                    self.options.stepper.pgs_iter_max,
                    self.robot.nmotors,
                    n_periods,
                    controller_fn,
                    n_carry,
                    n_action,
                    pallas_tile=self.options.pallas_tile,
                    imu_frames=self._imu_frames,
                    stage_warm_start=self.options.stepper.pgs_stage_warm_start,
                )
            self._period_runs[("rollout", cache_key, n_periods)] = run
        return run

    def step_rollout_fused(self, state: SimState, action, controller_fn,
                           carry, n_periods: int, cache_key: str):
        """Advance `n_periods` controller periods with the controller
        re-evaluated IN-KERNEL at every period boundary (the reference's
        FunctionalController semantics, fused).  `controller_fn(qc, vc, bc,
        ac) -> (cc, bc')` is component-wise; `carry` is its (..., n_carry)
        flat state.  Returns (state', carry').  Caller must check
        `supports_fused_rollout` and `state.model_params is None`."""
        robot = self.robot
        nm = robot.nmotors
        action = jnp.asarray(action, self.dtype)
        nv = robot.nv
        nc = len(robot.contact_frame_indices)
        ni = len(self._imu_frames)
        cset = self.cset
        constrained = self._cdyn is None
        if constrained:
            # Constrained core: distance/rolling refs ride the action row,
            # lam/active-set hysteresis ride the carry (refreshed per tick
            # in-kernel); see `make_constrained_rollout_integrator` layouts.
            dtype = state.q.dtype
            action_ext = jnp.concatenate(
                [action, state.distance_ref, state.rolling_ref], axis=-1
            )
            carry_ext = jnp.concatenate(
                [
                    carry,
                    state.lam,
                    state.contact_active.astype(dtype),
                    state.bound_active.astype(dtype),
                ],
                axis=-1,
            )
            n_lam, n_cact, n_bact = (
                cset.total_rows, cset.n_contacts, cset.n_bounds
            )
        else:
            action_ext, carry_ext = action, carry
            n_lam = n_cact = n_bact = 0
        n_block_carry = carry.shape[-1]
        run = self._get_rollout_run(
            cache_key, controller_fn, n_block_carry, action.shape[-1],
            n_periods,
        )
        q, v, extras = run(state.q, state.v, action_ext, carry_ext)
        n_std = nv + nc * 10 + ni * 6 + n_lam + n_cact + n_bact
        n_ccrow = extras.shape[-1] - n_std - carry_ext.shape[-1]
        command = extras[..., n_std : n_std + nm]
        carry_new = extras[
            ..., n_std + n_ccrow : n_std + n_ccrow + n_block_carry
        ]
        a, aux = self._unpack_period_extras(
            extras[..., :n_std], command, v,
            n_lam=n_lam, n_cact=n_cact, n_bact=n_bact,
        )
        tick_new = state.tick + n_periods if state.tick is not None else None
        st = state.replace(
            t=self._tick_time(tick_new, state.t, n_periods),
            q=integ.normalize(robot.model, q),
            v=v,
            a=a,
            command=command,
            u_motor=aux["u_motor"],
            contact_forces=aux["contact_f_world"],
            contact_active=aux.get("contact_active", state.contact_active),
            bound_active=aux.get("bound_active", state.bound_active),
            lam=aux.get("lam", state.lam),
            stepper=state.stepper.replace(
                iterations=state.stepper.iterations
                + n_periods * self.n_substeps
            ),
            tick=tick_new,
        )
        st = self._update_sensors(st, a, aux)
        return st, carry_new

    # ------------------------------------------------------------------ #
    # Public stepping API
    # ------------------------------------------------------------------ #
    def step(self, state: SimState, command=None) -> SimState:
        """Advance one controller period with zero-order-held motor command."""
        if command is None:
            if self.controller is not None:
                command = self.controller(state.t, state.q, state.v, state.measurements)
            else:
                command = state.command
        command = jnp.asarray(command, self.dtype)

        def sensor_substep(st, _):
            st2, a, aux, stepper = self._integrate_period(st, command)
            tick = st.tick + 1 if st.tick is not None else None
            st2 = st2.replace(
                t=self._tick_time(tick, st.t, 1),
                stepper=stepper,
                u_motor=aux["u_motor"],
                contact_forces=aux["contact_f_world"],
                contact_active=aux.get("contact_active", st.contact_active),
                bound_active=aux.get("bound_active", st.bound_active),
                lam=aux.get("lam", st.lam),
                tick=tick,
            )
            if self.n_ctrl_per_sensor > 1:
                # Sensors slower than the controller: compute the refresh every
                # tick but commit rings/measurements/key only on the sensor
                # period grid (masked lock-step — all envs share the phase).
                commit = (tick % self.n_ctrl_per_sensor) == 0
                st3 = self._update_sensors(st2, a, aux)

                def sel(new, old):
                    d = commit.reshape(
                        commit.shape + (1,) * (new.ndim - commit.ndim)
                    )
                    return jnp.where(d, new, old)

                st2 = st2.replace(
                    sensor_rings=jax.tree.map(sel, st3.sensor_rings, st2.sensor_rings),
                    measurements=jax.tree.map(
                        sel, st3.measurements, st2.measurements
                    ),
                    key=sel(st3.key, st2.key),
                )
            else:
                st2 = self._update_sensors(st2, a, aux)
            return st2.replace(a=a), None

        state = state.replace(command=command)
        state, _ = jax.lax.scan(sensor_substep, state, None, length=self.n_sensor_periods)
        return state

    def simulate(self, state: SimState, n_steps: int, policy: Optional[Callable] = None):
        """Roll `n_steps` controller periods under `policy(state) -> command`
        (defaults to holding `state.command`).  Returns (final_state, traj) where
        traj stacks (t, q, v) per step."""

        def body(st, _):
            cmd = policy(st) if policy is not None else None
            st = self.step(st, cmd)
            return st, (st.t, st.q, st.v)

        return jax.lax.scan(body, state, None, length=n_steps)
