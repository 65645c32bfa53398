"""Ground contact: heightmap query + spring-damper point-contact forces.

Vectorized re-design of the reference's per-frame contact dispatch
(`Engine::computeContactDynamicsAtFrame` / `computeContactDynamics`,
`core/src/engine/engine.cc:3117-3238`): all contact frames are evaluated in one
batched computation; contact activity is a mask, not an object toggle.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from jiminy_tpu.engine.config import ContactOptions
from jiminy_tpu.models.model import RobotModel
from jiminy_tpu.ops import lie
from jiminy_tpu.ops.kinematics import KinData, frame_placement, frame_velocity_local


def flat_ground(xy: jnp.ndarray):
    """Default ground profile: z = 0, normal +z."""
    h = jnp.zeros(xy.shape[:-1], xy.dtype)
    n = jnp.zeros(xy.shape[:-1] + (3,), xy.dtype).at[..., 2].set(1.0)
    return h, n


def spring_damper_force_world(
    opts: ContactOptions,
    normal: jnp.ndarray,  # (..., 3) unit ground normal
    depth: jnp.ndarray,  # (...,) signed, negative = penetrating
    v_contact: jnp.ndarray,  # (..., 3) contact point velocity, world axes
) -> jnp.ndarray:
    """Reference formula (`engine.cc:3197-3238`): normal Kelvin–Voigt force,
    saturated viscous friction with transition velocity, tanh depth blending."""
    v_depth = jnp.sum(v_contact * normal, axis=-1)
    f_normal = -jnp.minimum(opts.stiffness * depth + opts.damping * v_depth, 0.0)
    f = f_normal[..., None] * normal
    v_tang = v_contact - v_depth[..., None] * normal
    # Guarded norm, identical to the cdyn component mirror (`_contact_fext`):
    # `linalg.norm` has a NaN gradient at exactly zero tangential velocity
    # (straight drop), which would poison end-to-end autodiff.
    v_norm = jnp.sqrt(jnp.maximum(jnp.sum(v_tang * v_tang, axis=-1), 1e-24))
    v_ratio = jnp.minimum(v_norm / opts.transition_velocity, 1.0)
    f = f - (opts.friction * v_ratio * f_normal / v_norm)[..., None] * v_tang
    if opts.transition_eps > 1e-12:
        blend = jnp.tanh(2.0 * (-depth) / opts.transition_eps)
        f = f * blend[..., None]
    return jnp.where((depth < 0.0)[..., None], f, jnp.zeros_like(f))


def compute_contact_forces(
    model: RobotModel,
    opts: ContactOptions,
    ground_fn: Optional[Callable],
    kin: KinData,
    contact_frame_indices: tuple,
    contact_radii: tuple = (),
):
    """Spring-damper ground forces at every contact frame.

    `contact_radii` (static floats, 0.0 = point): sphere-primitive contacts —
    the contact point sits at `-r n̂` from the frame center, the gap is reduced
    by r, and the point velocity/lever include the offset (reference
    primitive-vs-ground collision bodies, `engine.cc:3022-3114`).

    Returns:
      fext:   (..., nj, 6) per-joint LOCAL spatial wrenches (ang, lin)
      f_world:(..., nc, 3) linear force at each contact point, world axes
      w_local:(..., nc, 6) spatial wrench in the LOCAL contact frame (ang, lin)
      depth:  (..., nc)    signed gap
    """
    if ground_fn is None:
        ground_fn = flat_ground
    batch = kin.vel.shape[:-2]
    dtype = kin.vel.dtype
    nj = model.njoints
    nc = len(contact_frame_indices)
    fext = jnp.zeros(batch + (nj, 6), dtype)
    if nc == 0:
        return (
            fext,
            jnp.zeros(batch + (0, 3), dtype),
            jnp.zeros(batch + (0, 6), dtype),
            jnp.zeros(batch + (0,), dtype),
        )

    if not contact_radii:
        contact_radii = (0.0,) * nc
    f_world_list, w_local_list, depth_list = [], [], []
    for fidx, radius in zip(contact_frame_indices, contact_radii):
        fpl = frame_placement(model, kin, fidx)
        pos = fpl.pos
        v_local = frame_velocity_local(model, kin, fidx)
        v_world = lie.mv(fpl.rot, v_local[..., 3:])
        h, n = ground_fn(pos[..., :2])
        n = n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-12)
        # First-order gap projection (reference engine.cc:3140)
        depth = (pos[..., 2] - h) * n[..., 2]
        if radius > 0.0:
            # Sphere primitive: contact at the lowest surface point -r n̂
            depth = depth - radius
            d_off = -radius * n
            w_world = lie.mv(fpl.rot, v_local[..., :3])
            v_world = v_world + jnp.cross(w_world, d_off)
        f_w = spring_damper_force_world(opts, n, depth, v_world)

        # LOCAL contact-frame wrench (for ContactSensor)
        rot_t = jnp.swapaxes(fpl.rot, -1, -2)
        f_local = lie.mv(rot_t, f_w)
        if radius > 0.0:
            n_local = lie.mv(rot_t, jnp.cross(d_off, f_w))
        else:
            n_local = jnp.zeros_like(f_local)
        w_local = jnp.concatenate([n_local, f_local], axis=-1)

        # Transport to the parent joint origin, LOCAL joint frame (reference
        # `convertForceGlobalFrameToJoint`)
        parent = model.frame_parents[fidx]
        rot_j = kin.omi.rot[..., parent, :, :]
        pos_j = kin.omi.pos[..., parent, :]
        lever = pos - pos_j
        if radius > 0.0:
            lever = lever + d_off
        tau_w = jnp.cross(lever, f_w)
        f_j = lie.mv(jnp.swapaxes(rot_j, -1, -2), f_w)
        n_j = lie.mv(jnp.swapaxes(rot_j, -1, -2), tau_w)
        fext = fext.at[..., parent, 0:3].add(n_j)
        fext = fext.at[..., parent, 3:6].add(f_j)

        f_world_list.append(f_w)
        w_local_list.append(w_local)
        depth_list.append(depth)

    return (
        fext,
        jnp.stack(f_world_list, axis=-2),
        jnp.stack(w_local_list, axis=-2),
        jnp.stack(depth_list, axis=-1),
    )


def closest_segment_points(p1, q1, p2, q2, eps: float = 1e-12):
    """Closest points between segments [p1,q1] and [p2,q2] (..., 3) —
    branchless clamped formulation (Ericson, Real-Time Collision Detection
    §5.1.9), degenerate-safe: a zero-length segment degrades to a point."""
    d1 = q1 - p1
    d2 = q2 - p2
    r = p1 - p2
    a = jnp.sum(d1 * d1, axis=-1)
    e = jnp.sum(d2 * d2, axis=-1)
    b = jnp.sum(d1 * d2, axis=-1)
    c = jnp.sum(d1 * r, axis=-1)
    f = jnp.sum(d2 * r, axis=-1)
    denom = a * e - b * b
    s = jnp.where(denom > eps, jnp.clip((b * f - c * e) / jnp.maximum(denom, eps), 0.0, 1.0), 0.0)
    t = jnp.where(e > eps, (b * s + f) / jnp.maximum(e, eps), 0.0)
    t_cl = jnp.clip(t, 0.0, 1.0)
    s_re = jnp.where(a > eps, jnp.clip((b * t_cl - c) / jnp.maximum(a, eps), 0.0, 1.0), 0.0)
    s = jnp.where((t < 0.0) | (t > 1.0), s_re, s)
    return p1 + s[..., None] * d1, p2 + t_cl[..., None] * d2


def _geom_kind(g) -> str:
    """Pair-geometry tag: legacy 4-tuples are capsules."""
    return g[1] if isinstance(g[1], str) else "capsule"


def _geom_world_segment(kin: KinData, g, dtype):
    """World-frame segment of a capsule pair geometry
    (parent, ["capsule",] r, p0, p1)."""
    if isinstance(g[1], str):
        j, _, r, p0, p1 = g
    else:
        j, r, p0, p1 = g
    rot = kin.omi.rot[..., j, :, :]
    pos = kin.omi.pos[..., j, :]
    a0 = pos + lie.mv(rot, jnp.asarray(p0, dtype))
    a1 = pos + lie.mv(rot, jnp.asarray(p1, dtype)) if p1 != p0 else a0
    return j, float(r), a0, a1, rot, pos


def _geom_world_box(kin: KinData, g, dtype):
    """World-frame OBB of a box pair geometry (parent, "box", rot9, c, half):
    returns (j, box_rot (...,3,3), box_pos (...,3), half (3,), rot_j, pos_j)."""
    j, _, rot9, c, half = g
    rot_j = kin.omi.rot[..., j, :, :]
    pos_j = kin.omi.pos[..., j, :]
    rot_l = jnp.asarray(np.asarray(rot9, np.float64).reshape(3, 3), dtype)
    box_rot = lie.mm(rot_j, rot_l)
    box_pos = pos_j + lie.mv(rot_j, jnp.asarray(c, dtype))
    return j, box_rot, box_pos, jnp.asarray(half, dtype), rot_j, pos_j


def signed_point_box(p, box_rot, box_pos, half):
    """Signed distance of point p to an OBB, with the outward contact normal
    and the closest surface point (all world frame, batch-transparent).

    Outside: euclidean distance, normal along (p - closest).  Inside:
    negative distance to the nearest face, normal = that face's outward
    normal.  Exact — this is the sphere-vs-box narrowphase."""
    rt = jnp.swapaxes(box_rot, -1, -2)
    local = lie.mv(rt, p - box_pos)
    clamped = jnp.clip(local, -half, half)
    dvec = local - clamped
    d_out = jnp.linalg.norm(dvec, axis=-1)
    outside = d_out > 1e-12
    # Inside: nearest face
    face_gap = half - jnp.abs(local)  # (...,3) >= 0 inside
    ax = jnp.argmin(face_gap, axis=-1)
    d_in = -jnp.take_along_axis(face_gap, ax[..., None], axis=-1)[..., 0]
    sign = jnp.sign(
        jnp.take_along_axis(local, ax[..., None], axis=-1)[..., 0]
    )
    sign = jnp.where(sign == 0, 1.0, sign)
    n_in_local = jax.nn.one_hot(ax, 3, dtype=local.dtype) * sign[..., None]
    surf_in_local = jnp.where(
        jax.nn.one_hot(ax, 3, dtype=local.dtype) > 0,
        sign[..., None] * half,
        clamped,
    )
    n_out_local = dvec / jnp.maximum(d_out, 1e-12)[..., None]
    dist = jnp.where(outside, d_out, d_in)
    n_local = jnp.where(outside[..., None], n_out_local, n_in_local)
    surf_local = jnp.where(outside[..., None], clamped, surf_in_local)
    n = lie.mv(box_rot, n_local)
    surf = box_pos + lie.mv(box_rot, surf_local)
    return dist, n, surf


def closest_point_segment_box(p0, p1, box_rot, box_pos, half, iters: int = 32):
    """argmin over t in [0,1] of dist(p0 + t (p1-p0), OBB).

    The distance to a convex set along a line is convex in t, so a fixed
    ternary search converges geometrically — static shapes, no data-dependent
    control flow (capsule-vs-box narrowphase)."""
    def f(t):
        p = p0 + t[..., None] * (p1 - p0)
        return signed_point_box(p, box_rot, box_pos, half)[0]

    lo = jnp.zeros(p0.shape[:-1], p0.dtype)
    hi = jnp.ones(p0.shape[:-1], p0.dtype)
    for _ in range(iters):
        m1 = lo + (hi - lo) / 3.0
        m2 = hi - (hi - lo) / 3.0
        take_lo = f(m1) <= f(m2)
        lo = jnp.where(take_lo, lo, m1)
        hi = jnp.where(take_lo, m2, hi)
    return 0.5 * (lo + hi)


def box_box_sat(rot_a, pos_a, half_a, rot_b, pos_b, half_b):
    """OBB-OBB separating-axis test (the standard 15 axes: 3 + 3 face
    normals + 9 edge cross products).

    Returns (gap, n, c): the signed gap (max separation over the axes — the
    exact penetration depth when negative, a lower bound on the distance when
    positive), the contact normal oriented from A towards B, and a world
    contact point (midpoint of the two deepest support points).  Exact for
    penetrating boxes; for separated boxes only the sign matters (no force).
    """
    t = pos_b - pos_a
    axes = []
    for k in range(3):
        axes.append(rot_a[..., :, k])
    for k in range(3):
        axes.append(rot_b[..., :, k])
    for i in range(3):
        for j in range(3):
            axes.append(jnp.cross(rot_a[..., :, i], rot_b[..., :, j]))
    gaps, units = [], []
    for ax in axes:
        ln = jnp.linalg.norm(ax, axis=-1)
        ok = ln > 1e-9
        u = ax / jnp.maximum(ln, 1e-9)[..., None]
        ra = sum(
            half_a[k] * jnp.abs(jnp.sum(u * rot_a[..., :, k], axis=-1))
            for k in range(3)
        )
        rb = sum(
            half_b[k] * jnp.abs(jnp.sum(u * rot_b[..., :, k], axis=-1))
            for k in range(3)
        )
        gap = jnp.abs(jnp.sum(t * u, axis=-1)) - (ra + rb)
        gaps.append(jnp.where(ok, gap, -jnp.inf))
        units.append(u)
    gaps = jnp.stack(gaps, axis=-1)  # (..., 15)
    units = jnp.stack(units, axis=-2)  # (..., 15, 3)
    best = jnp.argmax(gaps, axis=-1)
    gap = jnp.take_along_axis(gaps, best[..., None], axis=-1)[..., 0]
    n = jnp.take_along_axis(units, best[..., None, None], axis=-2)[..., 0, :]
    # Orient from A towards B
    flip = jnp.sum(t * n, axis=-1) < 0
    n = jnp.where(flip[..., None], -n, n)
    # Support points: deepest point of B against -n, deepest of A along +n
    sup_b = pos_b - sum(
        half_b[k]
        * jnp.sign(jnp.sum(n * rot_b[..., :, k], axis=-1))[..., None]
        * rot_b[..., :, k]
        for k in range(3)
    )
    sup_a = pos_a + sum(
        half_a[k]
        * jnp.sign(jnp.sum(n * rot_a[..., :, k], axis=-1))[..., None]
        * rot_a[..., :, k]
        for k in range(3)
    )
    c = 0.5 * (sup_a + sup_b)
    return gap, n, c


def _point_velocity_world(kin: KinData, j, rot, pos, c):
    """World velocity of a point c fixed to joint j (kin.vel is the LOCAL
    joint spatial velocity, (ang, lin))."""
    w_l = kin.vel[..., j, 0:3]
    v_l = kin.vel[..., j, 3:6]
    r_l = lie.mv(jnp.swapaxes(rot, -1, -2), c - pos)
    return lie.mv(rot, v_l + jnp.cross(w_l, r_l))


def pair_narrowphase_force(
    opts: ContactOptions, kin_a: KinData, ga, kin_b: KinData, gb
):
    """Narrowphase + spring-damper force for one geometry pair; the two
    geometries may belong to different robots (different kinematics).

    Dispatches on the geometry kinds: capsule-capsule (exact segment-segment),
    capsule-box / box-capsule (exact point-box on the convex-in-t closest
    parameter), box-box (15-axis SAT — exact penetration depth) — the
    TPU-static-shape equivalent of the reference's hpp-fcl narrowphase
    (`robot/model.cc` collision registry).

    Returns (c, f_b, depth, (ja, rot_a, pos_a), (jb, rot_b, pos_b)): world
    contact point, force on body b (reaction -f_b on body a), signed gap."""
    dtype = kin_a.vel.dtype
    ka, kb = _geom_kind(ga), _geom_kind(gb)
    if ka == "box" and kb == "box":
        ja, arot, apos, ahalf, rot_a, pos_a = _geom_world_box(kin_a, ga, dtype)
        jb, brot, bpos, bhalf, rot_b, pos_b = _geom_world_box(kin_b, gb, dtype)
        depth, n, c = box_box_sat(arot, apos, ahalf, brot, bpos, bhalf)
    elif "box" in (ka, kb):
        # Normalize so the box is on the B side; flip the normal back after.
        swap = ka == "box"
        g_cap, g_box = (gb, ga) if swap else (ga, gb)
        kin_cap, kin_box = (kin_b, kin_a) if swap else (kin_a, kin_b)
        jc, rc, c0, c1, rot_c, pos_c = _geom_world_segment(kin_cap, g_cap, dtype)
        jx, xrot, xpos, xhalf, rot_x, pos_x = _geom_world_box(kin_box, g_box, dtype)
        t = closest_point_segment_box(c0, c1, xrot, xpos, xhalf)
        p = c0 + t[..., None] * (c1 - c0)
        dist, n_pb, surf = signed_point_box(p, xrot, xpos, xhalf)
        depth = dist - rc
        # n_pb points from the box surface towards the capsule axis point;
        # the pair normal runs capsule -> box.
        n = -n_pb
        c = surf + 0.5 * depth[..., None] * (-n_pb)
        if swap:
            ja, rot_a, pos_a = jx, rot_x, pos_x
            jb, rot_b, pos_b = jc, rot_c, pos_c
            n = -n
        else:
            ja, rot_a, pos_a = jc, rot_c, pos_c
            jb, rot_b, pos_b = jx, rot_x, pos_x
    else:
        ja, ra, a0, a1, rot_a, pos_a = _geom_world_segment(kin_a, ga, dtype)
        jb, rb, b0, b1, rot_b, pos_b = _geom_world_segment(kin_b, gb, dtype)
        ca, cb = closest_segment_points(a0, a1, b0, b1)
        d = cb - ca
        dist = jnp.linalg.norm(d, axis=-1)
        n = d / jnp.maximum(dist, 1e-12)[..., None]  # from a towards b
        depth = dist - (ra + rb)  # negative = penetrating
        # Contact point: midpoint of the overlap segment
        c = ca + (ra + 0.5 * depth)[..., None] * n
    v_rel = _point_velocity_world(kin_b, jb, rot_b, pos_b, c) - _point_velocity_world(
        kin_a, ja, rot_a, pos_a, c
    )
    # Same Kelvin–Voigt + saturated-friction law as ground contact
    # (force on body b along +n when penetrating)
    f_b = spring_damper_force_world(opts, n, depth, v_rel)
    return c, f_b, depth, (ja, rot_a, pos_a), (jb, rot_b, pos_b)


def compute_pair_forces(
    model: RobotModel,
    opts: ContactOptions,
    kin: KinData,
    pairs: tuple,
):
    """Body-vs-body narrowphase: spring-damper contact between primitive
    pairs (self-collision / robot-robot).

    Goes BEYOND the reference, whose engine only dispatches ground collision
    (`engine.cc:3022-3024`). Every primitive reduces at build time to a
    *segment + radius* in its parent joint frame (sphere: zero-length segment;
    capsule: its axis; box/cylinder/mesh: one degenerate segment per expanded
    point), so every pair is one exact segment-segment closest-point test —
    fixed shapes, no broadphase, TPU-friendly.

    `pairs`: static tuple of (ga, gb) with g = (parent_joint, radius, p0, p1)
    and p0/p1 3-tuples in the parent joint frame.
    Returns (fext (..., nj, 6) LOCAL joint wrenches, f_world (..., np, 3) force
    on body b, depth (..., np)).
    """
    batch = kin.vel.shape[:-2]
    dtype = kin.vel.dtype
    nj = model.njoints
    fext = jnp.zeros(batch + (nj, 6), dtype)
    if not pairs:
        return fext, jnp.zeros(batch + (0, 3), dtype), jnp.zeros(batch + (0,), dtype)

    f_list, d_list = [], []
    for ga, gb in pairs:
        c, f_b, depth, (ja, rot_a, pos_a), (jb, rot_b, pos_b) = (
            pair_narrowphase_force(opts, kin, ga, kin, gb)
        )
        for j, rot_j, pos_j, sign in ((ja, rot_a, pos_a, -1.0), (jb, rot_b, pos_b, 1.0)):
            f_w = sign * f_b
            tau_w = jnp.cross(c - pos_j, f_w)
            rt = jnp.swapaxes(rot_j, -1, -2)
            fext = fext.at[..., j, 0:3].add(lie.mv(rt, tau_w))
            fext = fext.at[..., j, 3:6].add(lie.mv(rt, f_w))
        f_list.append(f_b)
        d_list.append(depth)
    return fext, jnp.stack(f_list, axis=-2), jnp.stack(d_list, axis=-1)
