"""Body-vs-body narrowphase (self-collision): sphere-sphere spring-damper
pairs between collision bodies. Beyond-reference capability (the reference
engine only dispatches ground collision, `engine.cc:3022-3024`); validated
against first principles: equal-and-opposite forces, repulsion, and momentum
conservation of a free-floating system in zero gravity."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from jiminy_tpu.engine import Engine, EngineOptions, Robot
from jiminy_tpu.engine.config import ContactOptions, StepperOptions, WorldOptions
from jiminy_tpu.models import JointType, build_model
from jiminy_tpu.ops.kinematics import forward_kinematics, frame_placement

CONTACT = ContactOptions(stiffness=2e3, damping=20.0, friction=0.3,
                         transition_eps=0.0)


def _dumbbell():
    """Free-flyer base with a revolute arm; a collision sphere on each link.

    The base sphere (r=0.1) sits at (0, 0.1, 0), OFF the arm axis, so the
    repulsion has a moment about the revolute joint. At q_arm = 0 the arm-tip
    sphere (r=0.1 at (0.15, 0, 0)) overlaps it:
    gap = sqrt(0.15^2 + 0.1^2) - 0.2 = -0.019722.
    """
    model = build_model(
        "dumbbell",
        [
            {
                "name": "root",
                "type": JointType.FREE,
                "parent": -1,
                "mass": 1.0,
                "com": np.zeros(3),
                "inertia": np.eye(3) * 1e-2,
            },
            {
                "name": "arm",
                "type": JointType.REVOLUTE,
                "parent": 0,
                "axis": np.array([0.0, 0.0, 1.0]),
                "placement": (np.eye(3), np.zeros(3)),
                "mass": 1.0,
                "com": np.array([0.15, 0.0, 0.0]),
                "inertia": np.eye(3) * 1e-2,
            },
        ],
        [
            {
                "name": "baseF",
                "parent": 0,
                "placement": (np.eye(3), np.array([0.0, 0.1, 0.0])),
            },
            {
                "name": "tipF",
                "parent": 1,
                "placement": (np.eye(3), np.array([0.15, 0.0, 0.0])),
            },
        ],
    )
    return Robot.build(
        model,
        collision_bodies=[
            {"frame_name": "baseF", "geometry": "sphere", "radius": 0.1},
            {"frame_name": "tipF", "geometry": "sphere", "radius": 0.1},
        ],
        collision_pairs=[("baseF", "tipF")],
    )


def _engine(robot):
    opts = EngineOptions(
        world=WorldOptions(gravity=(0.0, 0.0, 0.0)),
        contacts=CONTACT,
        stepper=StepperOptions(dt_max=1e-3),
        controller_update_period=0.01,
    )
    return Engine(robot, opts)


def test_pair_forces_equal_opposite_and_repulsive():
    robot = _dumbbell()
    assert robot.collision_pairs_geom  # pair resolved at build time
    eng = _engine(robot)
    q0 = np.asarray(robot.model.neutral())
    st = eng.reset(jnp.asarray(q0))

    # Direct narrowphase evaluation at the initial (overlapping) pose
    from jiminy_tpu.engine import contact as contact_mod

    kin = forward_kinematics(robot.model, st.q, st.v, jnp.zeros_like(st.v))
    fext, f_pair, depth = contact_mod.compute_pair_forces(
        robot.model, CONTACT, kin, robot.collision_pairs_geom
    )
    depth = np.asarray(depth)
    assert depth.shape == (1,)
    gap0 = np.sqrt(0.15**2 + 0.1**2) - 0.2
    np.testing.assert_allclose(depth[0], gap0, atol=1e-7)
    # Force on body b (tip) points from the base sphere towards the tip
    # sphere: +x, -y, zero z; Kelvin–Voigt magnitude k * |depth| at rest.
    f = np.asarray(f_pair)[0]
    assert f[0] > 1.0 and f[1] < -1.0 and abs(f[2]) < 1e-9
    np.testing.assert_allclose(np.linalg.norm(f), 2e3 * (-gap0), rtol=1e-5)
    # Equal and opposite: summed world-frame force over all joints vanishes.
    # Both parent joint frames are axis-aligned at q0, so local == world.
    fx = np.asarray(fext)
    np.testing.assert_allclose(fx[..., 3:6].sum(axis=-2), 0.0, atol=1e-8)


def test_self_collision_repels_and_conserves_momentum():
    robot = _dumbbell()
    eng = _engine(robot)
    q0 = np.array(robot.model.neutral())
    q0[2] = 1.0  # well above the ground: only the pair contact is active
    st = eng.reset(jnp.asarray(q0))
    step = jax.jit(eng.step)

    model = robot.model
    masses = np.asarray(model.mass)

    def com_of(q):
        kin = forward_kinematics(model, jnp.asarray(q))
        pos = np.asarray(kin.omi.pos)
        rot = np.asarray(kin.omi.rot)
        coms = pos + np.einsum("jab,jb->ja", rot, np.asarray(model.com))
        return (masses[:, None] * coms).sum(0) / masses.sum()

    com0 = com_of(st.q)
    gap0 = np.sqrt(0.15**2 + 0.1**2) - 0.2
    for _ in range(100):
        st = step(st)
    # The overlap opened up (arm pushed away)
    kin = forward_kinematics(model, st.q)
    pa = np.asarray(frame_placement(model, kin, model.frame_index("baseF")).pos)
    pb = np.asarray(frame_placement(model, kin, model.frame_index("tipF")).pos)
    gap = np.linalg.norm(pb - pa) - 0.2
    assert gap > gap0 + 0.01
    # Zero gravity + internal forces only: the system CoM must not move
    com1 = com_of(st.q)
    np.testing.assert_allclose(com1, com0, atol=1e-6)
    assert np.isfinite(np.asarray(st.q)).all()


def test_capsule_capsule_midsegment_contact():
    """Crossing capsules touch mid-segment — a contact that endpoint-sphere
    approximations miss entirely (endpoint gap ~0.13); the exact
    segment-segment narrowphase finds depth = 0.08 - 0.10 = -0.02, normal +z."""
    model = build_model(
        "cross",
        [
            {
                "name": "root",
                "type": JointType.FREE,
                "parent": -1,
                "mass": 1.0,
                "com": np.zeros(3),
                "inertia": np.eye(3) * 1e-2,
            },
            {
                "name": "arm",
                "type": JointType.REVOLUTE,
                "parent": 0,
                "axis": np.array([0.0, 0.0, 1.0]),
                "placement": (np.eye(3), np.zeros(3)),
                "mass": 1.0,
                "com": np.zeros(3),
                "inertia": np.eye(3) * 1e-2,
            },
        ],
        [
            {"name": "baseF", "parent": 0, "placement": (np.eye(3), np.zeros(3))},
            {
                "name": "tipF",
                "parent": 1,
                "placement": (np.eye(3), np.array([0.0, 0.0, 0.08])),
            },
        ],
    )
    robot = Robot.build(
        model,
        collision_bodies=[
            {"frame_name": "baseF", "geometry": "capsule", "radius": 0.05,
             "length": 0.3, "axis": (0.0, 1.0, 0.0)},
            {"frame_name": "tipF", "geometry": "capsule", "radius": 0.05,
             "length": 0.3, "axis": (1.0, 0.0, 0.0)},
        ],
        collision_pairs=[("baseF", "tipF")],
    )
    assert len(robot.collision_pairs_geom) == 1  # ONE exact pair, not 2x2 spheres

    from jiminy_tpu.engine import contact as contact_mod

    q0 = jnp.asarray(np.asarray(model.neutral()))
    v0 = jnp.zeros((model.nv,), q0.dtype)
    kin = forward_kinematics(model, q0, v0, jnp.zeros_like(v0))
    _, f_pair, depth = contact_mod.compute_pair_forces(
        model, CONTACT, kin, robot.collision_pairs_geom
    )
    np.testing.assert_allclose(np.asarray(depth)[0], -0.02, atol=1e-7)
    f = np.asarray(f_pair)[0]
    np.testing.assert_allclose(f[2], 2e3 * 0.02, rtol=1e-5)  # push arm up
    np.testing.assert_allclose(f[:2], 0.0, atol=1e-8)


def test_robot_robot_collision_momentum_exchange():
    """Two 1 kg sliders with collision spheres meet head-on in zero g: a
    near-elastic spring contact transfers ~all momentum to the second body
    (MultiRobotEngine.register_collision_pair, robot-robot narrowphase)."""
    from jiminy_tpu.engine.multi import MultiRobotEngine

    def slider(name):
        m = build_model(
            name,
            [
                {
                    "name": "px",
                    "type": JointType.PRISMATIC,
                    "parent": -1,
                    "axis": np.array([1.0, 0.0, 0.0]),
                    "mass": 1.0,
                    "com": np.zeros(3),
                    "inertia": np.zeros((3, 3)),
                }
            ],
            [{"name": "body", "parent": 0, "placement": (np.eye(3), np.zeros(3))}],
        )
        return Robot.build(m)

    robots = {"a": slider("a"), "b": slider("b")}
    opts = EngineOptions(
        world=WorldOptions(gravity=(0.0, 0.0, 0.0)),
        contacts=ContactOptions(stiffness=1e4, damping=0.0, friction=0.0,
                                transition_eps=0.0),
        stepper=StepperOptions(dt_max=1e-4),
        controller_update_period=0.01,
    )
    eng = MultiRobotEngine(robots, opts)
    sphere = {"frame_name": "body", "geometry": "sphere", "radius": 0.1}
    eng.register_collision_pair("a", sphere, "b", sphere)

    states = eng.reset(
        {"a": jnp.array([0.0]), "b": jnp.array([0.5])},
        {"a": jnp.array([1.0]), "b": jnp.array([0.0])},
    )
    step = jax.jit(eng.step)
    for _ in range(80):  # 0.8 s: contact at ~0.3 s, brief bounce
        states = step(states)
    va = float(np.asarray(states["a"].v)[0])
    vb = float(np.asarray(states["b"].v)[0])
    # Momentum conserved exactly; equal masses + elastic contact swap velocity
    np.testing.assert_allclose(va + vb, 1.0, atol=1e-6)
    assert vb > 0.95 and abs(va) < 0.05
    # They separated
    xa = float(np.asarray(states["a"].q)[0])
    xb = float(np.asarray(states["b"].q)[0])
    assert xb - xa > 0.2


def test_collision_pairs_in_constraint_contact_mode():
    """Pair forces also apply when ground contacts run through PGS."""
    from jiminy_tpu.engine.config import ContactModel

    robot = _dumbbell()
    opts = EngineOptions(
        world=WorldOptions(gravity=(0.0, 0.0, 0.0)),
        contacts=dataclasses.replace(CONTACT, model=ContactModel.CONSTRAINT),
        stepper=StepperOptions(dt_max=1e-3),
        controller_update_period=0.01,
        joint_bounds_mode="constraint",
    )
    eng = Engine(robot, opts)
    q0 = np.array(robot.model.neutral())
    q0[2] = 1.0
    st = eng.reset(jnp.asarray(q0))
    step = jax.jit(eng.step)
    for _ in range(50):
        st = step(st)
    # Arm rotated away from the overlap
    q_arm = float(np.asarray(st.q)[-1])
    assert abs(q_arm) > 1e-3
    assert np.isfinite(np.asarray(st.q)).all()


def test_box_box_pair_exact_sat():
    """A pair where BOTH sides are boxes must still generate force: expanded
    box pairs run the exact 15-axis SAT narrowphase (round-4 upgrade of the
    ADVICE-r2 effective-radius stopgap)."""
    model = build_model(
        "boxes",
        [
            {
                "name": "root",
                "type": JointType.FREE,
                "parent": -1,
                "mass": 1.0,
                "com": np.zeros(3),
                "inertia": np.eye(3) * 1e-2,
            },
            {
                "name": "arm",
                "type": JointType.PRISMATIC,
                "parent": 0,
                "axis": np.array([1.0, 0.0, 0.0]),
                "placement": (np.eye(3), np.zeros(3)),
                "mass": 1.0,
                "com": np.zeros(3),
                "inertia": np.eye(3) * 1e-2,
            },
        ],
        [
            {"name": "baseF", "parent": 0, "placement": (np.eye(3), np.zeros(3))},
            {"name": "tipF", "parent": 1, "placement": (np.eye(3), np.zeros(3))},
        ],
    )
    robot = Robot.build(
        model,
        collision_bodies=[
            {"frame_name": "baseF", "geometry": "box", "size": (0.2, 0.2, 0.2)},
            {"frame_name": "tipF", "geometry": "box", "size": (0.2, 0.2, 0.2)},
        ],
        collision_pairs=[("baseF", "tipF")],
    )
    # Boxes are now REAL oriented boxes (15-axis SAT), not corner spheres
    kinds = [g[1] for ga, gb in robot.collision_pairs_geom for g in (ga, gb)]
    assert all(k == "box" for k in kinds)

    from jiminy_tpu.engine import contact as contact_mod

    # Fully coincident 0.2-boxes: exact SAT penetration depth = -0.2
    q0 = jnp.asarray(np.asarray(model.neutral()))
    v0 = jnp.zeros((model.nv,), q0.dtype)
    kin = forward_kinematics(model, q0, v0, jnp.zeros_like(v0))
    _, _, depth = contact_mod.compute_pair_forces(
        model, CONTACT, kin, robot.collision_pairs_geom
    )
    np.testing.assert_allclose(float(np.asarray(depth).min()), -0.2, atol=1e-12)


def test_degenerate_zero_radius_pair_warns():
    """A pair resolving to radius-0 geometries on both sides (bare contact
    frames) warns at build time instead of silently never producing force."""
    import warnings

    model = build_model(
        "frames",
        [
            {
                "name": "root",
                "type": JointType.FREE,
                "parent": -1,
                "mass": 1.0,
                "com": np.zeros(3),
                "inertia": np.eye(3) * 1e-2,
            },
        ],
        [
            {"name": "fA", "parent": 0, "placement": (np.eye(3), np.zeros(3))},
            {
                "name": "fB",
                "parent": 0,
                "placement": (np.eye(3), np.array([0.1, 0.0, 0.0])),
            },
        ],
    )
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        Robot.build(
            model,
            contact_frames=["fA", "fB"],
            collision_pairs=[("fA", "fB")],
        )
    assert any("zero-radius" in str(w.message) for w in caught)


def test_signed_point_box_exact():
    """Sphere-vs-box primitive: signed distance, outward normal and surface
    point are exact outside, inside, and near faces/corners."""
    from jiminy_tpu.engine.contact import signed_point_box

    rot = jnp.eye(3)
    pos = jnp.zeros(3)
    half = jnp.asarray([0.1, 0.2, 0.3])
    # Outside along +x
    d, n, s = signed_point_box(jnp.asarray([0.5, 0.0, 0.0]), rot, pos, half)
    np.testing.assert_allclose(float(d), 0.4, atol=1e-12)
    np.testing.assert_allclose(np.asarray(n), [1, 0, 0], atol=1e-12)
    np.testing.assert_allclose(np.asarray(s), [0.1, 0, 0], atol=1e-12)
    # Outside at a corner
    p = jnp.asarray([0.2, 0.3, 0.4])
    d, n, s = signed_point_box(p, rot, pos, half)
    np.testing.assert_allclose(float(d), np.sqrt(3 * 0.1**2), atol=1e-12)
    np.testing.assert_allclose(np.asarray(s), [0.1, 0.2, 0.3], atol=1e-12)
    # Inside: nearest face is x (gap 0.05)
    d, n, s = signed_point_box(jnp.asarray([0.05, 0.0, 0.0]), rot, pos, half)
    np.testing.assert_allclose(float(d), -0.05, atol=1e-12)
    np.testing.assert_allclose(np.asarray(n), [1, 0, 0], atol=1e-12)
    np.testing.assert_allclose(np.asarray(s), [0.1, 0, 0], atol=1e-12)
    # Rotated box: 45 deg about z, point on the rotated +x axis
    c, s45 = np.cos(np.pi / 4), np.sin(np.pi / 4)
    rz = jnp.asarray([[c, -s45, 0], [s45, c, 0], [0, 0, 1.0]])
    d, n, _ = signed_point_box(
        jnp.asarray([0.5 * c, 0.5 * s45, 0.0]), rz, pos, half
    )
    np.testing.assert_allclose(float(d), 0.4, atol=1e-12)
    np.testing.assert_allclose(np.asarray(n), [c, s45, 0.0], atol=1e-12)


def test_box_box_sat_face_and_edge_cases():
    from jiminy_tpu.engine.contact import box_box_sat

    I = jnp.eye(3)
    h = jnp.asarray([0.1, 0.1, 0.1])
    # Face-face penetration along x: centers 0.15 apart -> depth -0.05
    gap, n, c = box_box_sat(I, jnp.zeros(3), h, I, jnp.asarray([0.15, 0, 0]), h)
    np.testing.assert_allclose(float(gap), -0.05, atol=1e-12)
    np.testing.assert_allclose(np.asarray(n), [1, 0, 0], atol=1e-12)
    np.testing.assert_allclose(float(np.asarray(c)[0]), 0.075, atol=1e-12)
    # Separated -> positive gap, no force regime
    gap, _, _ = box_box_sat(I, jnp.zeros(3), h, I, jnp.asarray([0.35, 0, 0]), h)
    np.testing.assert_allclose(float(gap), 0.15, atol=1e-12)
    # Edge-edge: B rotated 45 deg about z, touching corner-on along x
    c45, s45 = np.cos(np.pi / 4), np.sin(np.pi / 4)
    rz = jnp.asarray([[c45, -s45, 0], [s45, c45, 0], [0, 0, 1.0]])
    # B's corner reaches 0.1*sqrt(2) ~ 0.1414 from its center along x
    gap, n, _ = box_box_sat(I, jnp.zeros(3), h, rz, jnp.asarray([0.30, 0, 0]), h)
    np.testing.assert_allclose(float(gap), 0.3 - 0.1 - 0.1 * np.sqrt(2), atol=1e-9)
    # Diagonal cross-axis case: rotated about x and offset in y+z
    rx = jnp.asarray([[1.0, 0, 0], [0, c45, -s45], [0, s45, c45]])
    gap_pen, n, _ = box_box_sat(
        I, jnp.zeros(3), h, rx, jnp.asarray([0.0, 0.15, 0.15]), h
    )
    assert float(gap_pen) < 0  # genuinely overlapping
    assert float(jnp.dot(n, jnp.asarray([0.0, 1.0, 1.0]))) > 0  # pushes B away


def test_capsule_box_narrowphase():
    """Capsule-vs-box through the public pair pipeline: resting depth and
    equal-opposite forces."""
    from jiminy_tpu.engine.contact import pair_narrowphase_force

    model = build_model(
        "capbox",
        [
            {
                "name": "root",
                "type": JointType.FREE,
                "parent": -1,
                "mass": 1.0,
                "com": np.zeros(3),
                "inertia": np.eye(3) * 1e-2,
            },
            {
                "name": "arm",
                "type": JointType.PRISMATIC,
                "parent": 0,
                "axis": np.array([0.0, 0.0, 1.0]),
                "mass": 1.0,
                "com": np.zeros(3),
                "inertia": np.eye(3) * 1e-2,
            },
        ],
        [
            {"name": "boxF", "parent": 0, "placement": (np.eye(3), np.zeros(3))},
            {"name": "capF", "parent": 1,
             "placement": (np.eye(3), np.array([0.0, 0.0, 0.3]))},
        ],
    )
    robot = Robot.build(
        model,
        collision_bodies=[
            {"frame_name": "boxF", "geometry": "box", "size": (0.4, 0.4, 0.4)},
            {"frame_name": "capF", "geometry": "capsule", "radius": 0.05,
             "length": 0.2, "axis": (1.0, 0.0, 0.0)},
        ],
        collision_pairs=[("boxF", "capF")],
    )
    (ga, gb), = robot.collision_pairs_geom
    assert {ga[1], gb[1]} == {"box", "capsule"}
    # Neutral pose: capsule axis at z=0.3, box top at z=0.2, radius 0.05
    # -> gap = 0.3 - 0.2 - 0.05 = 0.05
    q0 = jnp.asarray(np.asarray(model.neutral()))
    v0 = jnp.zeros((model.nv,), q0.dtype)
    kin = forward_kinematics(model, q0, v0, jnp.zeros_like(v0))
    c, f_b, depth, _, _ = pair_narrowphase_force(CONTACT, kin, ga, kin, gb)
    np.testing.assert_allclose(float(depth), 0.05, atol=1e-6)
    # Lower the capsule into the box: q[arm] = -0.12 -> axis z=0.18, pen 0.07
    q1 = q0.at[-1].set(-0.12)
    kin = forward_kinematics(model, q1, v0, jnp.zeros_like(v0))
    c, f_b, depth, _, _ = pair_narrowphase_force(CONTACT, kin, ga, kin, gb)
    np.testing.assert_allclose(float(depth), -0.07, atol=1e-6)
    # Force pushes the capsule up (+z on capsule = -f_b if capsule is B...)
    # ga = box side, gb = capsule side -> f_b acts on the capsule: upward
    fz = float(np.asarray(f_b)[2])
    assert fz > 0.0


def test_mesh_pair_uses_obb():
    """Mesh collision bodies become oriented-bounding-box geometries."""
    pts = np.random.default_rng(0).normal(size=(40, 3)) * [0.1, 0.05, 0.02]
    model = build_model(
        "meshy",
        [
            {
                "name": "root",
                "type": JointType.FREE,
                "parent": -1,
                "mass": 1.0,
                "com": np.zeros(3),
                "inertia": np.eye(3) * 1e-2,
            },
        ],
        [
            {"name": "mF", "parent": 0, "placement": (np.eye(3), np.zeros(3))},
            {"name": "sF", "parent": 0,
             "placement": (np.eye(3), np.array([1.0, 0.0, 0.0]))},
        ],
    )
    robot = Robot.build(
        model,
        collision_bodies=[
            {"frame_name": "mF", "geometry": "mesh", "points": pts},
            {"frame_name": "sF", "geometry": "sphere", "radius": 0.05},
        ],
        collision_pairs=[("mF", "sF")],
    )
    kinds = {g[1] for ga, gb in robot.collision_pairs_geom for g in (ga, gb)}
    assert kinds == {"box", "capsule"}
    (ga, gb), = robot.collision_pairs_geom
    box = ga if ga[1] == "box" else gb
    half = np.asarray(box[4])
    # OBB tightly bounds the cloud (same order of magnitude per axis)
    assert np.all(half > 1e-3) and np.all(half < 0.5)
