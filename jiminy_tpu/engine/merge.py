"""Merged-model multi-robot formulation.

The reference advances all robots with ONE shared stepper
(`engine.cc:3497-3535`: a single integrator over the concatenated state).
Here that becomes literal: `merge_robots` concatenates N `Robot`s into one
forest-rooted `Robot` (the spatial-algebra kernels already traverse multi-root
trees), so a single `Engine` over the merged robot inherits EVERY single-robot
feature — DOPRI adaptive stepping, stage-chained PGS warm starts, the fused
component-wise/Pallas paths (when no state-dependent coupling force is
registered), sensors, telemetry.

Coupling forces become state-dependent external forces on the merged engine
(`Engine.register_state_force`), evaluated from the ONE merged kinematics pass
with action-reaction exact by construction.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from jiminy_tpu.engine.robot import FlexibilityConfig, Robot
from jiminy_tpu.engine.hardware import (
    ContactSensorGroup,
    EffortSensorGroup,
    EncoderSensorGroup,
    ForceSensorGroup,
    ImuSensorGroup,
    MotorBank,
    SensorSuite,
)
from jiminy_tpu.models.model import RobotModel


@dataclasses.dataclass(frozen=True)
class RobotSlice:
    """Index ranges of one robot inside the merged robot."""

    q: slice
    v: slice
    joints: slice
    frames: slice
    motors: slice
    contacts: slice
    # per sensor-group-name slice over the group's sensor axis
    sensors: Dict[str, slice]
    # per-category constraint-row counts (bounds, contacts, distance, rolling)
    # are derived later by the multi engine (they depend on engine options)


def _off(t: tuple, off: int) -> tuple:
    return tuple((x + off if x >= 0 else x) for x in t)


def _cat(arrays, axis=0):
    return jnp.concatenate([jnp.asarray(a) for a in arrays], axis=axis)


def merge_models(models: Dict[str, RobotModel], name: str) -> RobotModel:
    """Concatenate kinematic trees into one multi-root forest model.

    Joint/frame names are prefixed "<robot>/" (the reference prefixes
    telemetry variables with the robot name the same way)."""
    joint_off = q_off = v_off = 0
    joint_names, frame_names = [], []
    joint_types, parents, idx_q, idx_v, frame_parents = [], [], [], [], []
    arr = {
        k: []
        for k in (
            "jplacement_rot jplacement_pos joint_axes mass com inertia "
            "armature damping position_limit_lower position_limit_upper "
            "velocity_limit effort_limit fplacement_rot fplacement_pos"
        ).split()
    }
    for rname, m in models.items():
        joint_names += [f"{rname}/{n}" for n in m.joint_names]
        frame_names += [f"{rname}/{n}" for n in m.frame_names]
        joint_types += list(m.joint_types)
        parents += list(_off(m.parents, joint_off))
        idx_q += [i + q_off for i in m.idx_q]
        idx_v += [i + v_off for i in m.idx_v]
        frame_parents += list(_off(m.frame_parents, joint_off))
        for k in arr:
            arr[k].append(getattr(m, k))
        joint_off += m.njoints
        q_off += m.nq
        v_off += m.nv
    return RobotModel(
        name=name,
        nq=q_off,
        nv=v_off,
        njoints=joint_off,
        joint_types=tuple(joint_types),
        parents=tuple(parents),
        idx_q=tuple(idx_q),
        idx_v=tuple(idx_v),
        joint_names=tuple(joint_names),
        frame_names=tuple(frame_names),
        frame_parents=tuple(frame_parents),
        **{k: _cat(v) for k, v in arr.items()},
    )


def _merge_motors(robots: Dict[str, Robot]):
    offs = {"joint": 0, "q": 0, "v": 0}
    names, joint_idx, v_idx, q_idx = [], [], [], []
    arrays: Dict[str, list] = {}
    any_bank = False
    for rname, r in robots.items():
        b = r.motors
        if b is not None and b.nmotors:
            any_bank = True
            names += [f"{rname}/{n}" for n in b.names]
            joint_idx += [i + offs["joint"] for i in b.joint_indices]
            v_idx += [i + offs["v"] for i in b.v_indices]
            q_idx += [i + offs["q"] for i in b.q_indices]
            for f in MotorBank.__dataclass_fields__:
                if f in ("names", "joint_indices", "v_indices", "q_indices"):
                    continue
                arrays.setdefault(f, []).append(getattr(b, f))
        offs["joint"] += r.model.njoints
        offs["q"] += r.model.nq
        offs["v"] += r.model.nv
    if not any_bank:
        return None
    return MotorBank(
        names=tuple(names),
        joint_indices=tuple(joint_idx),
        v_indices=tuple(v_idx),
        q_indices=tuple(q_idx),
        **{k: _cat(v) for k, v in arrays.items()},
    )


def _merge_group(kind, groups_with_offsets):
    """Concatenate one sensor-group type across robots.

    `groups_with_offsets`: [(rname, group, offsets dict)] for robots that HAVE
    the group.  Static index tuples are shifted by the per-robot offsets;
    array leaves are concatenated.  `interp_order` must agree (it is a single
    static int per group)."""
    orders = {g.interp_order for _, g, _ in groups_with_offsets}
    if len(orders) > 1:
        raise ValueError(
            f"cannot merge '{kind}' sensors with differing "
            f"delay_interpolation_order {sorted(orders)}"
        )
    first = groups_with_offsets[0][1]
    cls = type(first)
    static_map = {
        "frame_indices": "frame",
        "motor_indices": "motor",
        "q_indices": "q",
        "v_indices": "v",
        "contact_slots": "contact",
    }
    out: Dict[str, object] = {"interp_order": first.interp_order}
    names = []
    for f in cls.__dataclass_fields__:
        if f in ("interp_order",):
            continue
        vals = []
        for rname, g, offs in groups_with_offsets:
            v = getattr(g, f)
            if f == "names":
                names += [f"{rname}/{n}" for n in v]
            elif f in static_map:
                off = offs[static_map[f]]
                if f == "contact_slots" and v and isinstance(v[0], tuple):
                    vals.append(tuple(_off(s, off) for s in v))
                else:
                    vals.append(_off(v, off))
            elif f in ("joint_types", "joint_side"):
                vals.append(tuple(v))
            else:
                vals.append(v)
        if f == "names":
            out[f] = tuple(names)
        elif vals and isinstance(vals[0], tuple):
            out[f] = sum(vals, ())
        elif vals:
            out[f] = _cat(vals)
    return cls(**out)


def merge_robots(robots: Dict[str, Robot]) -> Tuple[Robot, Dict[str, RobotSlice]]:
    """Merge robots into one forest Robot + per-robot index layout."""
    model = merge_models({n: r.model for n, r in robots.items()}, "+".join(robots))
    theoretical = merge_models(
        {n: r.theoretical_model for n, r in robots.items()}, "+".join(robots)
    )

    layout: Dict[str, RobotSlice] = {}
    joint_off = q_off = v_off = frame_off = motor_off = contact_off = 0
    sensor_off: Dict[str, int] = {}
    groups_by_kind: Dict[str, list] = {}
    contact_frames, contact_radii = [], []
    loop_pairs, rolling, backlash, pair_geoms, visuals = [], [], [], [], []
    flex_idx, flex_arrays = [], {"stiffness": [], "damping": [], "inertia": []}
    for rname, r in robots.items():
        offs = {
            "joint": joint_off,
            "q": q_off,
            "v": v_off,
            "frame": frame_off,
            "motor": motor_off,
            "contact": contact_off,
        }
        sslices = {}
        for kind, g in r.sensors.groups():
            start = sensor_off.get(kind, 0)
            sslices[kind] = slice(start, start + g.nsensors)
            sensor_off[kind] = start + g.nsensors
            groups_by_kind.setdefault(kind, []).append((rname, g, offs))
        nm = r.motors.nmotors if r.motors is not None else 0
        layout[rname] = RobotSlice(
            q=slice(q_off, q_off + r.model.nq),
            v=slice(v_off, v_off + r.model.nv),
            joints=slice(joint_off, joint_off + r.model.njoints),
            frames=slice(frame_off, frame_off + r.model.nframes),
            motors=slice(motor_off, motor_off + nm),
            contacts=slice(
                contact_off, contact_off + len(r.contact_frame_indices)
            ),
            sensors=sslices,
        )
        contact_frames += [i + frame_off for i in r.contact_frame_indices]
        contact_radii += list(
            r.contact_radii or (0.0,) * len(r.contact_frame_indices)
        )
        for a, b in r.loop_pairs:
            loop_pairs.append(
                (
                    f"{rname}/{a}" if isinstance(a, str) else a + frame_off,
                    f"{rname}/{b}" if isinstance(b, str) else b + frame_off,
                )
            )
        for fname, radius, axis in r.rolling_specs:
            rolling.append(
                (
                    f"{rname}/{fname}" if isinstance(fname, str) else fname + frame_off,
                    radius,
                    axis,
                )
            )
        backlash += [j + joint_off for j in r.backlash_joint_indices]
        for ga, gb in r.collision_pairs_geom:
            pair_geoms.append(
                (
                    (ga[0] + joint_off,) + tuple(ga[1:]),
                    (gb[0] + joint_off,) + tuple(gb[1:]),
                )
            )
        for vg in r.visual_geoms:
            visuals.append((f"{rname}/{vg[0]}",) + tuple(vg[1:]))
        if r.flexibility is not None and r.flexibility.joint_indices:
            flex_idx += [j + joint_off for j in r.flexibility.joint_indices]
            for k in flex_arrays:
                flex_arrays[k].append(getattr(r.flexibility, k))
        joint_off += r.model.njoints
        q_off += r.model.nq
        v_off += r.model.nv
        frame_off += r.model.nframes
        motor_off += nm
        contact_off += len(r.contact_frame_indices)

    suite_kw = {
        kind: _merge_group(kind, entries)
        for kind, entries in groups_by_kind.items()
    }
    flex = (
        FlexibilityConfig(
            joint_indices=tuple(flex_idx),
            **{k: _cat(v) for k, v in flex_arrays.items()},
        )
        if flex_idx
        else None
    )
    merged = Robot(
        name="+".join(robots),
        model=model,
        theoretical_model=theoretical,
        motors=_merge_motors(robots),
        sensors=SensorSuite(**suite_kw),
        contact_frame_indices=tuple(contact_frames),
        contact_radii=tuple(contact_radii),
        flexibility=flex,
        loop_pairs=tuple(loop_pairs),
        backlash_joint_indices=tuple(backlash),
        rolling_specs=tuple(rolling),
        collision_pairs_geom=tuple(pair_geoms),
        visual_geoms=tuple(visuals),
    )
    return merged, layout
