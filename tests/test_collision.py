"""Primitive collision bodies (sphere/capsule/box vs ground): expansion to
derived contact points and physical behavior (reference COLLISION_BODIES
registry + hpp-fcl primitive-vs-ground narrow phase, `engine.cc:3022-3114`)."""

import jax
import jax.numpy as jnp
import numpy as np

from jiminy_tpu.engine import Engine, EngineOptions, Robot
from jiminy_tpu.engine.config import ContactModel, ContactOptions, StepperOptions

from jiminy_tpu.models import JointType, build_model


def _slider_model(name="ball", mass=1.0):
    return build_model(
        name,
        [
            {
                "name": "slider",
                "type": JointType.PRISMATIC,
                "parent": -1,
                "axis": np.array([0.0, 0.0, 1.0]),
                "mass": mass,
                "com": np.zeros(3),
                "inertia": np.eye(3) * 1e-3,
            }
        ],
        [{"name": "center", "parent": 0, "placement": (np.eye(3), np.zeros(3))}],
    )


CONTACT = ContactOptions(stiffness=1e4, damping=2e2, friction=0.5, transition_eps=0.0)


def _settle(eng, q0, steps=3000):
    st = eng.reset(jnp.asarray(q0))
    step = jax.jit(eng.step)
    for _ in range(steps):
        st = step(st)
    return st


def test_sphere_resting_height():
    """A radius-r sphere settles with its surface penetrating by m g / k, i.e.
    center at r - mg/k."""
    r, mass = 0.25, 1.0
    robot = Robot.build(
        _slider_model(mass=mass),
        collision_bodies=[{"frame_name": "center", "geometry": "sphere", "radius": r}],
    )
    assert robot.contact_radii == (r,)
    eng = Engine(robot, EngineOptions(contacts=CONTACT, stepper=StepperOptions(dt_max=1e-3)))
    st = _settle(eng, [0.5])
    expected = r - mass * 9.81 / CONTACT.stiffness
    assert abs(float(st.q[0]) - expected) < 1e-4
    assert abs(float(st.v[0])) < 1e-5


def test_sphere_matches_shifted_point():
    """Sphere of radius r at the center == point contact at the lowest point,
    on flat ground (trajectories identical up to the constant z offset)."""
    r = 0.1
    robot_s = Robot.build(
        _slider_model(),
        collision_bodies=[{"frame_name": "center", "geometry": "sphere", "radius": r}],
    )
    model_p = build_model(
        "ball_pt",
        [
            {
                "name": "slider",
                "type": JointType.PRISMATIC,
                "parent": -1,
                "axis": np.array([0.0, 0.0, 1.0]),
                "mass": 1.0,
                "com": np.zeros(3),
                "inertia": np.eye(3) * 1e-3,
            }
        ],
        [{"name": "bottom", "parent": 0, "placement": (np.eye(3), np.array([0.0, 0.0, -r]))}],
    )
    robot_p = Robot.build(model_p, contact_frames=["bottom"])
    opts = EngineOptions(contacts=CONTACT, stepper=StepperOptions(dt_max=1e-3))
    eng_s, eng_p = Engine(robot_s, opts), Engine(robot_p, opts)
    st_s, st_p = eng_s.reset(jnp.array([0.3])), eng_p.reset(jnp.array([0.3]))
    step_s, step_p = jax.jit(eng_s.step), jax.jit(eng_p.step)
    for _ in range(200):
        st_s, st_p = step_s(st_s), step_p(st_p)
        np.testing.assert_allclose(np.asarray(st_s.q), np.asarray(st_p.q), atol=1e-10)


def test_capsule_expands_to_two_spheres():
    robot = Robot.build(
        _slider_model(),
        collision_bodies=[
            {
                "frame_name": "center",
                "geometry": "capsule",
                "radius": 0.05,
                "length": 0.4,
                "axis": (1.0, 0.0, 0.0),
            }
        ],
    )
    assert len(robot.contact_frame_indices) == 2
    assert robot.contact_radii == (0.05, 0.05)


def test_box_settles_flat():
    """A box on a free joint dropped slightly above ground settles with its
    bottom face at penetration depth (8 corner contact points)."""
    model = build_model(
        "box",
        [
            {
                "name": "root",
                "type": JointType.FREE,
                "parent": -1,
                "mass": 1.0,
                "com": np.zeros(3),
                "inertia": np.eye(3) * 0.01,
            }
        ],
        [{"name": "body", "parent": 0, "placement": (np.eye(3), np.zeros(3))}],
    )
    robot = Robot.build(
        model,
        collision_bodies=[
            {"frame_name": "body", "geometry": "box", "size": (0.2, 0.2, 0.2)}
        ],
    )
    assert len(robot.contact_frame_indices) == 8
    assert robot.contact_radii == (0.0,) * 8
    eng = Engine(
        robot,
        EngineOptions(
            contacts=ContactOptions(
                stiffness=1e4, damping=2e2, friction=1.0, transition_eps=0.0
            ),
            stepper=StepperOptions(dt_max=1e-3),
        ),
    )
    q0 = np.zeros(7)
    q0[2] = 0.12
    q0[6] = 1.0
    st = _settle(eng, q0, steps=3000)
    q = np.asarray(st.q)
    # Bottom face at z = -0.1 from center; settle center ~0.1 - 2*mg/(8k)
    # (4 corners carry the load once level; tolerance is loose)
    assert abs(q[2] - 0.1) < 5e-3
    # Level attitude preserved
    assert abs(abs(q[6]) - 1.0) < 1e-4
    assert np.linalg.norm(np.asarray(st.v)) < 1e-3


def test_sphere_constraint_mode_resting():
    """Sphere primitive through the PGS constraint contact path: rests with its
    surface on the ground (center at ~r)."""
    r = 0.2
    robot = Robot.build(
        _slider_model(),
        collision_bodies=[{"frame_name": "center", "geometry": "sphere", "radius": r}],
    )
    eng = Engine(
        robot,
        EngineOptions(
            contacts=ContactOptions(
                model=ContactModel.CONSTRAINT, friction=1.0, transition_eps=1e-3
            ),
            stepper=StepperOptions(dt_max=1e-3),
        ),
    )
    st = _settle(eng, [0.4], steps=1500)
    assert abs(float(st.q[0]) - r) < 1e-3
    assert abs(float(st.v[0])) < 1e-4


def test_sphere_cdyn_consistency():
    """Fast component-wise dynamics path agrees with the generic path for
    sphere-primitive contacts."""
    r = 0.15
    robot = Robot.build(
        _slider_model(),
        collision_bodies=[{"frame_name": "center", "geometry": "sphere", "radius": r}],
    )
    base = dict(contacts=CONTACT, stepper=StepperOptions(dt_max=1e-3))
    eng_f = Engine(robot, EngineOptions(use_fast_dynamics="always", **base))
    eng_r = Engine(robot, EngineOptions(use_fast_dynamics=False, **base))
    assert eng_f._cdyn is not None
    st_f, st_r = eng_f.reset(jnp.array([0.1])), eng_r.reset(jnp.array([0.1]))
    step_f, step_r = jax.jit(eng_f.step), jax.jit(eng_r.step)
    for _ in range(100):
        st_f, st_r = step_f(st_f), step_r(st_r)
    np.testing.assert_allclose(np.asarray(st_f.q), np.asarray(st_r.q), atol=1e-12)
    np.testing.assert_allclose(np.asarray(st_f.v), np.asarray(st_r.v), atol=1e-12)


def test_cylinder_rim_points_resting():
    """A horizontal cylinder (axis along x) expands to rim points and rests
    with its axis at height ~r (rim contact line)."""
    r, length = 0.1, 0.5
    robot = Robot.build(
        _slider_model(),
        collision_bodies=[
            {
                "frame_name": "center",
                "geometry": "cylinder",
                "radius": r,
                "length": length,
                "axis": (1.0, 0.0, 0.0),
                "n_rim": 16,
            }
        ],
    )
    assert len(robot.contact_frame_indices) == 32
    assert robot.contact_radii == (0.0,) * 32
    eng = Engine(
        robot, EngineOptions(contacts=CONTACT, stepper=StepperOptions(dt_max=1e-3))
    )
    st = _settle(eng, [0.3], steps=3000)
    # With 16 rim points the lowest points sit within r*(1-cos(pi/16)) of -r
    assert abs(float(st.q[0]) - r) < r * 0.03 + 1e-3
    assert abs(float(st.v[0])) < 1e-4


def test_mesh_points_hull_and_resting():
    """A 'mesh' vertex cloud reduces to its convex hull and rests on its
    lowest vertices (tetrahedron with a flat bottom face)."""
    pts = np.array(
        [
            [0.1, 0.1, -0.05],
            [-0.1, 0.1, -0.05],
            [0.0, -0.1, -0.05],
            [0.0, 0.0, 0.15],
            [0.0, 0.0, 0.0],  # interior: must be dropped by the hull
        ]
    )
    robot = Robot.build(
        _slider_model(),
        collision_bodies=[
            {"frame_name": "center", "geometry": "mesh", "points": pts}
        ],
    )
    assert len(robot.contact_frame_indices) == 4  # hull drops the interior point
    eng = Engine(
        robot, EngineOptions(contacts=CONTACT, stepper=StepperOptions(dt_max=1e-3))
    )
    st = _settle(eng, [0.2], steps=3000)
    expected = 0.05 - 9.81 / (3 * CONTACT.stiffness)  # 3 bottom verts share mg
    assert abs(float(st.q[0]) - expected) < 1e-3


def test_collision_bodies_from_urdf_by_name(tmp_path):
    """Bare link names in collision_bodies resolve geometry from the URDF's
    <collision> elements (reference hardware-TOML collisionBodyNames flow),
    including mesh files and multiple geometries per link."""
    mesh = tmp_path / "blob.obj"
    mesh.write_text(
        "v 0.1 0.1 -0.02\nv -0.1 0.1 -0.02\nv 0.0 -0.1 -0.02\nv 0.0 0.0 0.1\n"
        "f 1 2 3\nf 1 2 4\n"
    )
    urdf = tmp_path / "rig.urdf"
    urdf.write_text(
        f"""<robot name="rig">
  <link name="base">
    <inertial><mass value="1.0"/>
      <inertia ixx="1e-2" iyy="1e-2" izz="1e-2" ixy="0" ixz="0" iyz="0"/>
    </inertial>
    <collision>
      <origin xyz="0 0 -0.05" rpy="0 0 0"/>
      <geometry><box size="0.2 0.1 0.04"/></geometry>
    </collision>
    <collision>
      <geometry><sphere radius="0.03"/></geometry>
    </collision>
  </link>
  <joint name="arm" type="revolute">
    <parent link="base"/><child link="tip"/>
    <axis xyz="0 1 0"/>
    <limit lower="-1" upper="1" effort="10" velocity="10"/>
  </joint>
  <link name="tip">
    <inertial><mass value="0.5"/>
      <inertia ixx="1e-3" iyy="1e-3" izz="1e-3" ixy="0" ixz="0" iyz="0"/>
    </inertial>
    <collision>
      <geometry><mesh filename="blob.obj"/></geometry>
    </collision>
  </link>
</robot>"""
    )
    robot = Robot.build(
        str(urdf),
        has_freeflyer=True,
        collision_bodies=["base", "tip"],
    )
    # base: 8 box corners + 1 sphere; tip: 4 hull vertices
    assert len(robot.contact_frame_indices) == 13
    assert robot.contact_radii[:8] == (0.0,) * 8
    assert robot.contact_radii[8] == 0.03
    m = robot.model
    # Box origin offset applied: lowest corner z = -0.05 - 0.02 in base frame
    zs = [float(m.fplacement_pos[i][2]) for i in robot.contact_frame_indices[:8]]
    assert abs(min(zs) - (-0.07)) < 1e-9
    assert abs(max(zs) - (-0.03)) < 1e-9


def test_mesh_vertex_loaders(tmp_path):
    """OBJ and binary-STL vertex loaders return the declared vertices."""
    from jiminy_tpu.models.urdf import load_mesh_vertices

    obj = tmp_path / "tri.obj"
    obj.write_text("# c\nv 1 2 3\nv -1 0 0.5\nvn 0 0 1\nf 1 2 1\n")
    out = load_mesh_vertices(str(obj))
    np.testing.assert_allclose(out, [[1, 2, 3], [-1, 0, 0.5]])
    out2 = load_mesh_vertices(str(obj), scale=(2.0, 1.0, 1.0))
    np.testing.assert_allclose(out2[0], [2, 2, 3])

    import struct

    tris = [((0, 0, 1), ((0, 0, 0), (1, 0, 0), (0, 1, 0)))]
    buf = b"\0" * 80 + struct.pack("<I", len(tris))
    for n, vs in tris:
        buf += struct.pack("<3f", *n)
        for v in vs:
            buf += struct.pack("<3f", *v)
        buf += b"\0\0"
    stl = tmp_path / "tri.stl"
    stl.write_bytes(buf)
    out = load_mesh_vertices(str(stl))
    assert out.shape == (3, 3)
    assert {tuple(v) for v in out} == {(0, 0, 0), (1, 0, 0), (0, 1, 0)}
