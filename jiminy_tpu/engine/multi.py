"""Multi-robot simulation: several robots in one integrator with coupling forces.

Re-design of the reference's multi-robot engine (`Engine::addRobot`, coupling
forces `engine.h:490-550`, `registerViscoelasticCouplingForce`
`engine.cc:3497-3535`): all robots advance in one shared fixed-step integrator;
coupling forces are 6D viscoelastic springs between frames of (possibly
different) robots, evaluated from both robots' kinematics every stage, with
action-reaction enforced exactly.

State is a dict name -> SimState; everything stays jit/vmap-able.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp

from jiminy_tpu.engine.config import EngineOptions, IntegratorType
from jiminy_tpu.engine.engine import Engine
from jiminy_tpu.engine.robot import Robot
from jiminy_tpu.engine.state import SimState
from jiminy_tpu.ops import integrate as integ
from jiminy_tpu.ops import lie
from jiminy_tpu.ops.kinematics import (
    forward_kinematics,
    frame_placement,
    frame_velocity_local,
)


class ViscoelasticCoupling:
    """6D spring-damper between frame1 of robot1 and frame2 of robot2."""

    def __init__(self, robot1, frame1, robot2, frame2, stiffness, damping,
                 rest_length: float = 0.0):
        self.robot1, self.frame1 = robot1, frame1
        self.robot2, self.frame2 = robot2, frame2
        self.stiffness = jnp.asarray(stiffness)  # (6,) (ang, lin) or scalar
        self.damping = jnp.asarray(damping)
        self.rest_length = rest_length


class CollisionCoupling:
    """Robot-robot contact: exact segment-segment narrowphase between
    primitive geometries on two robots, spring-damper force with
    action-reaction (beyond-reference; see `contact.pair_narrowphase_force`)."""

    def __init__(self, robot1, robot2, geom_pairs: tuple):
        self.robot1, self.robot2 = robot1, robot2
        self.geom_pairs = geom_pairs  # static ((g1, g2), ...)


class MultiRobotEngine:
    """Shared-stepper multi-robot engine.

    Only fixed-step integrators are supported (the reference shares one adaptive
    stepper across robots; lock-step fixed dt is the TPU-friendly equivalent).
    """

    def __init__(self, robots: Dict[str, Robot], options: Optional[EngineOptions] = None):
        self.names = tuple(robots.keys())
        self.engines: Dict[str, Engine] = {}
        opts = options or EngineOptions()
        if opts.stepper.integrator == IntegratorType.RUNGE_KUTTA_DOPRI:
            raise ValueError("MultiRobotEngine supports fixed-step integrators only")
        for name, robot in robots.items():
            self.engines[name] = Engine(robot, opts)
        self.options = opts
        eng0 = self.engines[self.names[0]]
        self.dtype = eng0.dtype
        self.sensor_period = eng0.sensor_period
        self.tick_period = eng0.tick_period
        self.n_sensor_periods = eng0.n_sensor_periods
        self.n_substeps = eng0.n_substeps
        self.couplings: list = []

    # ------------------------------------------------------------------ #
    def register_viscoelastic_coupling_force(
        self, robot1: str, frame1: str, robot2: str, frame2: str,
        stiffness, damping, rest_length: float = 0.0,
    ) -> None:
        f1 = self.engines[robot1].robot.model.frame_index(frame1)
        f2 = self.engines[robot2].robot.model.frame_index(frame2)
        self.couplings.append(
            ViscoelasticCoupling(robot1, f1, robot2, f2, stiffness, damping, rest_length)
        )

    def register_collision_pair(self, robot1: str, spec1: dict,
                                robot2: str, spec2: dict) -> None:
        """Contact between a primitive on robot1 and one on robot2.

        Specs use the `collision_bodies` format ({"frame_name", "geometry":
        "sphere"|"capsule"|..., dimensions, optional "origin"}); each expands
        to segment+radius geometries, tested pairwise (sphere/capsule exact;
        box/cylinder/mesh via their candidate points). Contact parameters come
        from robot1's engine ContactOptions."""
        from jiminy_tpu.engine.robot import _pair_geometries

        def geoms(robot, spec):
            model = self.engines[robot].robot.model
            return _pair_geometries(model, [spec], ())[spec["frame_name"]]

        pairs = tuple(
            (g1, g2) for g1 in geoms(robot1, spec1) for g2 in geoms(robot2, spec2)
        )
        self.couplings.append(CollisionCoupling(robot1, robot2, pairs))

    def register_coupling_force(self, robot1, frame1, robot2, frame2, force_fn) -> None:
        """Generic coupling: `force_fn(t, pose1, vel1, pose2, vel2) -> (6,)`
        world wrench applied to robot1's frame (reaction on robot2)."""
        f1 = self.engines[robot1].robot.model.frame_index(frame1)
        f2 = self.engines[robot2].robot.model.frame_index(frame2)
        self.couplings.append((robot1, f1, robot2, f2, force_fn))

    # ------------------------------------------------------------------ #
    def reset(self, q_inits: Dict[str, jnp.ndarray], v_inits=None, key=None) -> Dict[str, SimState]:
        if key is None:
            key = jax.random.PRNGKey(0)
        states = {}
        for i, name in enumerate(self.names):
            v0 = None if v_inits is None else v_inits.get(name)
            states[name] = self.engines[name].reset(
                q_inits[name], v0, key=jax.random.fold_in(key, i)
            )
        return states

    # ------------------------------------------------------------------ #
    def _coupling_fext(self, t, qs, vs):
        """Per-robot extra LOCAL joint wrenches from all couplings."""
        kins = {
            n: forward_kinematics(self.engines[n].robot.model, qs[n], vs[n])
            for n in self.names
        }
        fext = {
            n: jnp.zeros(
                qs[n].shape[:-1] + (self.engines[n].robot.model.njoints, 6), self.dtype
            )
            for n in self.names
        }

        def frame_world(n, fidx):
            model = self.engines[n].robot.model
            fpl = frame_placement(model, kins[n], fidx)
            vl = frame_velocity_local(model, kins[n], fidx)
            v_lin_w = lie.mv(fpl.rot, vl[..., 3:6])
            w_ang_w = lie.mv(fpl.rot, vl[..., 0:3])
            return fpl, v_lin_w, w_ang_w

        def apply_world_wrench(n, fidx, wrench):
            model = self.engines[n].robot.model
            parent = model.frame_parents[fidx]
            fpl = frame_placement(model, kins[n], fidx)
            rot_j = kins[n].omi.rot[..., parent, :, :]
            pos_j = kins[n].omi.pos[..., parent, :]
            lever = fpl.pos - pos_j
            f_w = wrench[..., 3:6]
            n_w = wrench[..., 0:3] + jnp.cross(lever, f_w)
            rt = jnp.swapaxes(rot_j, -1, -2)
            fext[n] = (
                fext[n]
                .at[..., parent, 0:3]
                .add(lie.mv(rt, n_w))
                .at[..., parent, 3:6]
                .add(lie.mv(rt, f_w))
            )

        for cpl in self.couplings:
            if isinstance(cpl, ViscoelasticCoupling):
                p1, v1, w1 = frame_world(cpl.robot1, cpl.frame1)
                p2, v2, w2 = frame_world(cpl.robot2, cpl.frame2)
                dp = p2.pos - p1.pos
                dist = jnp.linalg.norm(dp, axis=-1, keepdims=True)
                if cpl.rest_length > 0.0:
                    direction = dp / jnp.maximum(dist, 1e-9)
                    f_lin = cpl.stiffness * (dist - cpl.rest_length) * direction
                else:
                    f_lin = cpl.stiffness * dp
                f_lin = f_lin + cpl.damping * (v2 - v1)
                drot = lie.mm(jnp.swapaxes(p1.rot, -1, -2), p2.rot)
                ang_err = lie.mv(p1.rot, lie.log3_mat(drot))
                f_ang = cpl.stiffness * ang_err + cpl.damping * (w2 - w1)
                wrench1 = jnp.concatenate([f_ang, f_lin], axis=-1)
                apply_world_wrench(cpl.robot1, cpl.frame1, wrench1)
                apply_world_wrench(cpl.robot2, cpl.frame2, -wrench1)
            elif isinstance(cpl, CollisionCoupling):
                from jiminy_tpu.engine.contact import pair_narrowphase_force

                opts = self.engines[cpl.robot1].options.contacts
                kin_a, kin_b = kins[cpl.robot1], kins[cpl.robot2]
                for ga, gb in cpl.geom_pairs:
                    c, f_b, _, (ja, rot_a, pos_a), (jb, rot_b, pos_b) = (
                        pair_narrowphase_force(opts, kin_a, ga, kin_b, gb)
                    )
                    for n, j, rot_j, pos_j, sign in (
                        (cpl.robot1, ja, rot_a, pos_a, -1.0),
                        (cpl.robot2, jb, rot_b, pos_b, 1.0),
                    ):
                        f_w = sign * f_b
                        tau_w = jnp.cross(c - pos_j, f_w)
                        rt = jnp.swapaxes(rot_j, -1, -2)
                        fext[n] = (
                            fext[n]
                            .at[..., j, 0:3]
                            .add(lie.mv(rt, tau_w))
                            .at[..., j, 3:6]
                            .add(lie.mv(rt, f_w))
                        )
            else:
                r1, f1, r2, f2, fn = cpl
                p1, v1, w1 = frame_world(r1, f1)
                p2, v2, w2 = frame_world(r2, f2)
                wrench1 = fn(t, p1, (w1, v1), p2, (w2, v2))
                apply_world_wrench(r1, f1, wrench1)
                apply_world_wrench(r2, f2, -wrench1)
        return fext

    def _joint_accels(self, t, qs, vs, commands, carries):
        fext = self._coupling_fext(t, qs, vs)
        accels = {}
        for n in self.names:
            accels[n] = self.engines[n].dynamics_full(
                t, qs[n], vs[n], commands[n], carries[n], fext_extra=fext[n]
            )[0]
        return accels

    # ------------------------------------------------------------------ #
    def step(self, states: Dict[str, SimState], commands=None) -> Dict[str, SimState]:
        """Advance all robots one controller period in lock-step (RK4/Euler):
        `n_sensor_periods` sensor ticks, each integrated with `n_substeps`
        fixed substeps.  Mirrors `Engine.step` per tick: carries (PGS warm
        start, contact/bound active-set hysteresis) are recomputed from the
        evolving per-tick states, the tick counter advances, and when the
        controller runs faster than the sensors the refreshed rings/
        measurements are only committed on the sensor-period grid."""
        if commands is None:
            commands = {n: states[n].command for n in self.names}
        commands = {n: jnp.asarray(commands[n], self.dtype) for n in self.names}
        dt = jnp.asarray(self.tick_period / self.n_substeps, self.dtype)
        euler = self.options.stepper.integrator == IntegratorType.EULER_EXPLICIT

        _PGS_KEYS = ("lam", "contact_active", "bound_active")

        def tick(states_c, _):
            carries = {
                n: self.engines[n]._carry_of(states_c[n]) for n in self.names
            }
            # Stage-chained PGS warm start (mirror of Engine._integrate_period):
            # per-robot (lam, active sets) thread through every stage eval.
            stage_warm = self.options.stepper.pgs_stage_warm_start
            threaded = {
                n: stage_warm and self.engines[n].has_constraints
                for n in self.names
            }
            pgs0 = {
                n: (
                    {k: carries[n][k] for k in _PGS_KEYS}
                    if threaded[n]
                    else {}
                )
                for n in self.names
            }

            def f(t, qs, vs, pgs_all):
                fext = self._coupling_fext(t, qs, vs)
                accels, pgs_new = {}, {}
                for n in self.names:
                    eng = self.engines[n]
                    carry_n = (
                        {**carries[n], **pgs_all[n]}
                        if pgs_all[n]
                        else carries[n]
                    )
                    a, aux = eng.dynamics_full(
                        t, qs[n], vs[n], commands[n], carry_n,
                        fext_extra=fext[n],
                    )
                    accels[n] = a
                    pgs_new[n] = (
                        {k: aux[k] for k in _PGS_KEYS} if threaded[n] else {}
                    )
                return accels, pgs_new

            def substep(carry, _):
                t, qs, vs, pgs_all = carry
                if euler:
                    accels, pgs_all = f(t, qs, vs, pgs_all)
                    qs = {
                        n: integ.integrate(
                            self.engines[n].robot.model, qs[n], vs[n] * dt
                        )
                        for n in self.names
                    }
                    vs = {n: vs[n] + accels[n] * dt for n in self.names}
                else:  # RK4 over the joint system
                    k1v, (k1a, pgs_all) = vs, f(t, qs, vs, pgs_all)

                    def adv(qs, vs, kv, ka, h):
                        q2 = {
                            n: integ.integrate(
                                self.engines[n].robot.model, qs[n], kv[n] * h
                            )
                            for n in self.names
                        }
                        v2 = {n: vs[n] + ka[n] * h for n in self.names}
                        return q2, v2

                    q2, v2 = adv(qs, vs, k1v, k1a, 0.5 * dt)
                    k2v, (k2a, pgs_all) = v2, f(t + 0.5 * dt, q2, v2, pgs_all)
                    q3, v3 = adv(qs, vs, k2v, k2a, 0.5 * dt)
                    k3v, (k3a, pgs_all) = v3, f(t + 0.5 * dt, q3, v3, pgs_all)
                    q4, v4 = adv(qs, vs, k3v, k3a, dt)
                    k4v, (k4a, pgs_all) = v4, f(t + dt, q4, v4, pgs_all)
                    qs = {
                        n: integ.integrate(
                            self.engines[n].robot.model,
                            qs[n],
                            (dt / 6.0)
                            * (k1v[n] + 2 * k2v[n] + 2 * k3v[n] + k4v[n]),
                        )
                        for n in self.names
                    }
                    vs = {
                        n: vs[n]
                        + (dt / 6.0)
                        * (k1a[n] + 2 * k2a[n] + 2 * k3a[n] + k4a[n])
                        for n in self.names
                    }
                return (t + dt, qs, vs, pgs_all), None

            t0 = states_c[self.names[0]].t
            qs = {n: states_c[n].q for n in self.names}
            vs = {n: states_c[n].v for n in self.names}
            (t_end, qs, vs, pgs_fin), _ = jax.lax.scan(
                substep, (t0, qs, vs, pgs0), None, length=self.n_substeps
            )
            fext = self._coupling_fext(t_end, qs, vs)
            out = {}
            for n in self.names:
                eng = self.engines[n]
                q = integ.normalize(eng.robot.model, qs[n])
                carry_fin = (
                    {**carries[n], **pgs_fin[n]} if pgs_fin[n] else carries[n]
                )
                a, aux = eng.dynamics_full(
                    t_end, q, vs[n], commands[n], carry_fin, fext_extra=fext[n]
                )
                tick_n = (
                    states_c[n].tick + 1 if states_c[n].tick is not None else None
                )
                st = states_c[n].replace(
                    # Integer-tick-derived time (see Engine._tick_time).
                    t=eng._tick_time(tick_n, t_end, 0),
                    q=q,
                    v=vs[n],
                    a=a,
                    command=commands[n],
                    u_motor=aux["u_motor"],
                    contact_forces=aux["contact_f_world"],
                    contact_active=aux.get(
                        "contact_active", states_c[n].contact_active
                    ),
                    bound_active=aux.get("bound_active", states_c[n].bound_active),
                    lam=aux.get("lam", states_c[n].lam),
                    tick=tick_n,
                )
                if eng.n_ctrl_per_sensor > 1:
                    commit = (tick_n % eng.n_ctrl_per_sensor) == 0
                    st3 = eng._update_sensors(st, a, aux)

                    def sel(new, old):
                        d = commit.reshape(
                            commit.shape + (1,) * (new.ndim - commit.ndim)
                        )
                        return jnp.where(d, new, old)

                    st = st.replace(
                        sensor_rings=jax.tree.map(
                            sel, st3.sensor_rings, st.sensor_rings
                        ),
                        measurements=jax.tree.map(
                            sel, st3.measurements, st.measurements
                        ),
                        key=sel(st3.key, st.key),
                    )
                else:
                    st = eng._update_sensors(st, a, aux)
                out[n] = st
            return out, None

        states, _ = jax.lax.scan(tick, states, None, length=self.n_sensor_periods)
        return states
