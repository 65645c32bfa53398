"""Multi-robot simulation: one merged-model engine over all robots.

Re-design of the reference's multi-robot engine (`Engine::addRobot`, coupling
forces `engine.h:490-550`, `registerViscoelasticCouplingForce`
`engine.cc:3497-3535`).  The reference advances all robots with ONE shared
stepper; here the robots are merged into a single forest-rooted model
(`engine.merge.merge_robots`) stepped by a single `Engine`, so multi-robot
simulation inherits the ENTIRE single-robot machinery — DOPRI adaptive
stepping, stage-chained PGS warm starts, the fused component-wise/Pallas
paths (automatically, whenever no state-dependent coupling force is
registered), sensors, telemetry — instead of maintaining a second integrator.

Coupling forces are state-dependent external forces on the merged engine,
evaluated from the one merged kinematics pass with action-reaction exact.

The public API keeps per-robot granularity: state dicts name -> SimState are
views split out of the merged SimState (pure slicing, fused away by XLA).
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from jiminy_tpu.engine.config import EngineOptions
from jiminy_tpu.engine.constraints import build_constraint_set
from jiminy_tpu.engine.engine import Engine
from jiminy_tpu.engine.merge import merge_robots
from jiminy_tpu.engine.robot import Robot
from jiminy_tpu.engine.state import SimState
from jiminy_tpu.ops import lie
from jiminy_tpu.ops.kinematics import frame_placement, frame_velocity_local


def _frame_world(model, kin, fidx):
    fpl = frame_placement(model, kin, fidx)
    vl = frame_velocity_local(model, kin, fidx)
    v_lin_w = lie.mv(fpl.rot, vl[..., 3:6])
    w_ang_w = lie.mv(fpl.rot, vl[..., 0:3])
    return fpl, v_lin_w, w_ang_w


def _apply_world_wrench(model, kin, fext, fidx, wrench):
    """Accumulate a world-aligned wrench at a frame onto its parent joint
    (LOCAL joint coordinates)."""
    parent = model.frame_parents[fidx]
    fpl = frame_placement(model, kin, fidx)
    rot_j = kin.omi.rot[..., parent, :, :]
    pos_j = kin.omi.pos[..., parent, :]
    lever = fpl.pos - pos_j
    f_w = wrench[..., 3:6]
    n_w = wrench[..., 0:3] + jnp.cross(lever, f_w)
    rt = jnp.swapaxes(rot_j, -1, -2)
    return (
        fext.at[..., parent, 0:3].add(lie.mv(rt, n_w))
        .at[..., parent, 3:6].add(lie.mv(rt, f_w))
    )


class MultiRobotEngine:
    """Merged-model multi-robot engine (single shared stepper).

    All single-robot integrators are available, including adaptive DOPRI —
    the merged state advances as one system, exactly like the reference's
    one-stepper-over-all-robots loop."""

    def __init__(self, robots: Dict[str, Robot], options: Optional[EngineOptions] = None):
        self.names = tuple(robots.keys())
        self.robots = dict(robots)
        opts = options or EngineOptions()
        self.options = opts
        self.merged_robot, self.layout = merge_robots(self.robots)
        self.engine = Engine(self.merged_robot, opts)
        self.dtype = self.engine.dtype
        self.sensor_period = self.engine.sensor_period
        self.tick_period = self.engine.tick_period
        self.n_sensor_periods = self.engine.n_sensor_periods
        self.n_substeps = self.engine.n_substeps
        self.couplings: list = []  # declarative specs (replayed by add_robot)
        self._row_maps = self._build_row_maps()

    # ------------------------------------------------------------------ #
    # Per-robot constraint-row layout inside the merged ConstraintSet
    # ------------------------------------------------------------------ #
    def _build_row_maps(self):
        cset = self.engine.cset
        off_b, off_c, off_d, off_r = 0, cset.n_bounds, 0, 0
        off_d = cset.n_bounds + 4 * cset.n_contacts
        off_r = off_d + cset.n_distance
        maps = {}
        for name in self.names:
            sl = self.layout[name]
            rows = []
            b_idx = [
                i
                for i, j in enumerate(cset.bound_joint_indices)
                if sl.joints.start <= j < sl.joints.stop
            ]
            rows += b_idx
            c_idx = [
                i
                for i, f in enumerate(cset.contact_frame_indices)
                if sl.frames.start <= f < sl.frames.stop
            ]
            for i in c_idx:
                rows += list(range(off_c + 4 * i, off_c + 4 * i + 4))
            d_idx = [
                i
                for i, (fa, _) in enumerate(cset.distance_pairs)
                if sl.frames.start <= fa < sl.frames.stop
            ]
            rows += [off_d + i for i in d_idx]
            r_specs = list(cset.sphere_specs) + list(cset.wheel_specs)
            r_idx = [
                i
                for i, spec in enumerate(r_specs)
                if sl.frames.start <= spec[0] < sl.frames.stop
            ]
            for i in r_idx:
                rows += list(range(off_r + 3 * i, off_r + 3 * i + 3))
            maps[name] = {
                "rows": np.asarray(rows, np.int32),
                "bounds": np.asarray(b_idx, np.int32),
                "contacts": np.asarray(c_idx, np.int32),
                "distance": np.asarray(d_idx, np.int32),
                "rolling": np.asarray(r_idx, np.int32),
            }
        return maps

    # ------------------------------------------------------------------ #
    # Coupling registration (reference `engine.h:490-550`)
    # ------------------------------------------------------------------ #
    def register_viscoelastic_coupling_force(
        self, robot1: str, frame1: str, robot2: str, frame2: str,
        stiffness, damping, rest_length: float = 0.0,
    ) -> None:
        self.couplings.append(
            ("viscoelastic", robot1, frame1, robot2, frame2,
             stiffness, damping, rest_length)
        )
        model = self.merged_robot.model
        f1 = model.frame_index(f"{robot1}/{frame1}")
        f2 = model.frame_index(f"{robot2}/{frame2}")
        k = jnp.asarray(stiffness)
        nu = jnp.asarray(damping)

        def force_fn(t, q, v, kin):
            fext = jnp.zeros(q.shape[:-1] + (model.njoints, 6), q.dtype)
            p1, v1, w1 = _frame_world(model, kin, f1)
            p2, v2, w2 = _frame_world(model, kin, f2)
            dp = p2.pos - p1.pos
            if rest_length > 0.0:
                dist = jnp.linalg.norm(dp, axis=-1, keepdims=True)
                direction = dp / jnp.maximum(dist, 1e-9)
                f_lin = k * (dist - rest_length) * direction
            else:
                f_lin = k * dp
            f_lin = f_lin + nu * (v2 - v1)
            drot = lie.mm(jnp.swapaxes(p1.rot, -1, -2), p2.rot)
            ang_err = lie.mv(p1.rot, lie.log3_mat(drot))
            f_ang = k * ang_err + nu * (w2 - w1)
            wrench1 = jnp.concatenate([f_ang, f_lin], axis=-1)
            fext = _apply_world_wrench(model, kin, fext, f1, wrench1)
            fext = _apply_world_wrench(model, kin, fext, f2, -wrench1)
            return fext

        self.engine.register_state_force(force_fn)

    def register_coupling_force(self, robot1, frame1, robot2, frame2, force_fn) -> None:
        """Generic coupling: `force_fn(t, pose1, (w1, v1), pose2, (w2, v2)) ->
        (6,)` world wrench applied to robot1's frame (reaction on robot2)."""
        self.couplings.append(
            ("generic", robot1, frame1, robot2, frame2, force_fn)
        )
        model = self.merged_robot.model
        f1 = model.frame_index(f"{robot1}/{frame1}")
        f2 = model.frame_index(f"{robot2}/{frame2}")

        def state_force(t, q, v, kin):
            fext = jnp.zeros(q.shape[:-1] + (model.njoints, 6), q.dtype)
            p1, v1, w1 = _frame_world(model, kin, f1)
            p2, v2, w2 = _frame_world(model, kin, f2)
            wrench1 = force_fn(t, p1, (w1, v1), p2, (w2, v2))
            fext = _apply_world_wrench(model, kin, fext, f1, wrench1)
            fext = _apply_world_wrench(model, kin, fext, f2, -wrench1)
            return fext

        self.engine.register_state_force(state_force)

    def register_collision_pair(self, robot1: str, spec1: dict,
                                robot2: str, spec2: dict) -> None:
        """Robot-robot contact between primitive geometries (spring-damper
        narrowphase, action-reaction exact; see `contact.pair_narrowphase_force`)."""
        self.couplings.append(("collision", robot1, spec1, robot2, spec2))
        from jiminy_tpu.engine.robot import _pair_geometries

        model = self.merged_robot.model

        def geoms(rname, spec):
            s = dict(spec)
            s["frame_name"] = f"{rname}/{spec['frame_name']}"
            return _pair_geometries(model, [s], ())[s["frame_name"]]

        pairs = tuple(
            (g1, g2)
            for g1 in geoms(robot1, spec1)
            for g2 in geoms(robot2, spec2)
        )
        opts = self.options.contacts
        from jiminy_tpu.engine.contact import pair_narrowphase_force

        def state_force(t, q, v, kin):
            fext = jnp.zeros(q.shape[:-1] + (model.njoints, 6), q.dtype)
            for ga, gb in pairs:
                c, f_b, _, (ja, rot_a, pos_a), (jb, rot_b, pos_b) = (
                    pair_narrowphase_force(opts, kin, ga, kin, gb)
                )
                for j, rot_j, pos_j, sign in (
                    (ja, rot_a, pos_a, -1.0),
                    (jb, rot_b, pos_b, 1.0),
                ):
                    f_w = sign * f_b
                    tau_w = jnp.cross(c - pos_j, f_w)
                    rt = jnp.swapaxes(rot_j, -1, -2)
                    fext = (
                        fext.at[..., j, 0:3].add(lie.mv(rt, tau_w))
                        .at[..., j, 3:6].add(lie.mv(rt, f_w))
                    )
            return fext

        self.engine.register_state_force(state_force)

    def replay_couplings(self, specs) -> None:
        """Re-register coupling specs on this (fresh) instance — used by
        `MultiSimulator.add_robot`, which rebuilds the merged engine."""
        for s in specs:
            kind = s[0]
            if kind == "viscoelastic":
                self.register_viscoelastic_coupling_force(*s[1:])
            elif kind == "generic":
                self.register_coupling_force(*s[1:])
            else:
                self.register_collision_pair(*s[1:])

    # ------------------------------------------------------------------ #
    # State split / merge (pure indexing; XLA fuses it away)
    # ------------------------------------------------------------------ #
    def split_state(self, sim: SimState) -> Dict[str, SimState]:
        out = {}
        for name in self.names:
            sl = self.layout[name]
            rm = self._row_maps[name]
            rings = {
                kind: sim.sensor_rings[kind].replace(
                    data=sim.sensor_rings[kind].data[..., ssl, :]
                )
                for kind, ssl in sl.sensors.items()
                if kind in sim.sensor_rings
            }
            meas = {
                kind: sim.measurements[kind][..., ssl, :]
                for kind, ssl in sl.sensors.items()
                if kind in sim.measurements
            }
            out[name] = sim.replace(
                q=sim.q[..., sl.q],
                v=sim.v[..., sl.v],
                a=sim.a[..., sl.v],
                command=sim.command[..., sl.motors],
                u_motor=sim.u_motor[..., sl.motors],
                contact_forces=sim.contact_forces[..., sl.contacts, :],
                sensor_rings=rings,
                measurements=meas,
                contact_active=sim.contact_active[..., rm["contacts"]],
                bound_active=sim.bound_active[..., rm["bounds"]],
                lam=sim.lam[..., rm["rows"]],
                distance_ref=sim.distance_ref[..., rm["distance"]],
                rolling_ref=sim.rolling_ref[..., rm["rolling"]],
            )
        return out

    def merge_states(self, states: Dict[str, SimState]) -> SimState:
        first = states[self.names[0]]
        cset = self.engine.cset

        def cat(attr, axis=-1):
            return jnp.concatenate(
                [getattr(states[n], attr) for n in self.names], axis=axis
            )

        lam = jnp.zeros(
            first.lam.shape[:-1] + (cset.total_rows,), self.dtype
        )
        c_act = jnp.zeros(
            first.contact_active.shape[:-1] + (cset.n_contacts,), bool
        )
        b_act = jnp.zeros(
            first.bound_active.shape[:-1] + (cset.n_bounds,), bool
        )
        d_ref = jnp.zeros(
            first.distance_ref.shape[:-1] + (cset.n_distance,), self.dtype
        )
        r_ref = jnp.zeros(
            first.rolling_ref.shape[:-1] + (cset.n_rolling,), self.dtype
        )
        for name in self.names:
            st, rm = states[name], self._row_maps[name]
            lam = lam.at[..., rm["rows"]].set(st.lam)
            c_act = c_act.at[..., rm["contacts"]].set(st.contact_active)
            b_act = b_act.at[..., rm["bounds"]].set(st.bound_active)
            d_ref = d_ref.at[..., rm["distance"]].set(st.distance_ref)
            r_ref = r_ref.at[..., rm["rolling"]].set(st.rolling_ref)
        rings = {}
        meas = {}
        for kind, g in self.merged_robot.sensors.groups():
            parts = [
                states[n].sensor_rings[kind]
                for n in self.names
                if kind in states[n].sensor_rings
            ]
            if parts:
                rings[kind] = parts[0].replace(
                    data=jnp.concatenate([p.data for p in parts], axis=-2)
                )
            mparts = [
                states[n].measurements[kind]
                for n in self.names
                if kind in states[n].measurements
            ]
            if mparts:
                meas[kind] = jnp.concatenate(mparts, axis=-2)
        return first.replace(
            q=cat("q"),
            v=cat("v"),
            a=cat("a"),
            command=cat("command"),
            u_motor=cat("u_motor"),
            contact_forces=cat("contact_forces", axis=-2),
            sensor_rings=rings,
            measurements=meas,
            contact_active=c_act,
            bound_active=b_act,
            lam=lam,
            distance_ref=d_ref,
            rolling_ref=r_ref,
        )

    # ------------------------------------------------------------------ #
    def reset(self, q_inits: Dict[str, jnp.ndarray], v_inits=None, key=None) -> Dict[str, SimState]:
        if key is None:
            key = jax.random.PRNGKey(0)
        q0 = jnp.concatenate(
            [jnp.asarray(q_inits[n], self.dtype) for n in self.names], axis=-1
        )
        v0 = None
        if v_inits is not None:
            v0 = jnp.concatenate(
                [
                    jnp.asarray(
                        v_inits.get(n, jnp.zeros(self.robots[n].model.nv)),
                        self.dtype,
                    )
                    for n in self.names
                ],
                axis=-1,
            )
        sim = self.engine.reset(q0, v0, key=key)
        return self.split_state(sim)

    def step(self, states: Dict[str, SimState], commands=None) -> Dict[str, SimState]:
        """Advance all robots one controller period with the ONE shared
        stepper of the merged engine (fused/fast paths apply automatically
        when no coupling force is registered)."""
        if commands is None:
            command = None
        else:
            command = jnp.concatenate(
                [
                    jnp.asarray(
                        commands.get(n, states[n].command), self.dtype
                    )
                    for n in self.names
                ],
                axis=-1,
            )
        sim = self.engine.step(self.merge_states(states), command)
        return self.split_state(sim)
