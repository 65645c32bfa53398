"""Component-wise fused dynamics (cdyn) vs the generic spatial-algebra path:
must match bit-for-bit at float64 (it is the same math, reassociated)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jiminy_tpu.engine import Engine, EngineOptions, Robot
from jiminy_tpu.engine.config import ContactOptions, StepperOptions
from jiminy_tpu.engine.contact import compute_contact_forces
from jiminy_tpu.envs.builders import anymal_standing_pose, build_anymal, build_cartpole
from jiminy_tpu.models import JointType, build_model
from jiminy_tpu.ops import cdyn
from jiminy_tpu.ops import dynamics as dyn
from jiminy_tpu.ops import lie
from jiminy_tpu.ops.kinematics import forward_kinematics

GRAV = jnp.asarray([0.0, 0.0, -9.81])
RNG = np.random.default_rng(0)


def test_cdyn_matches_generic_cartpole():
    model = build_cartpole().model
    qs = jnp.asarray(RNG.normal(size=(6, model.nq)))
    vs = jnp.asarray(RNG.normal(size=(6, model.nv)))
    taus = jnp.asarray(RNG.normal(size=(6, model.nv)))
    ref = dyn.aba(model, GRAV, qs, vs, taus)
    out = cdyn.ComponentDynamics(model, GRAV).accel(qs, vs, taus)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-11)


def test_cdyn_matches_generic_anymal_freeflyer():
    model = build_anymal().model
    B = 5
    q0 = anymal_standing_pose(model)
    qs = np.tile(q0, (B, 1))
    qs[:, :3] += RNG.normal(size=(B, 3)) * 0.1
    qs[:, 7:] += RNG.normal(size=(B, model.nq - 7)) * 0.3
    dq = np.asarray(lie.exp3(jnp.asarray(RNG.normal(size=(B, 3)) * 0.3)))
    for b in range(B):
        qn = np.asarray(lie.quat_mul(jnp.asarray(qs[b, 3:7]), jnp.asarray(dq[b])))
        qs[b, 3:7] = qn / np.linalg.norm(qn)
    qs = jnp.asarray(qs)
    vs = jnp.asarray(RNG.normal(size=(B, model.nv)))
    taus = jnp.asarray(RNG.normal(size=(B, model.nv)))
    ref = dyn.aba(model, GRAV, qs, vs, taus)
    out = cdyn.ComponentDynamics(model, GRAV).accel(qs, vs, taus)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-10)


def test_cdyn_contact_matches_generic():
    robot = build_anymal()
    model = robot.model
    opts = ContactOptions(stiffness=1e5, damping=2e3, friction=1.0)
    q0 = jnp.asarray(anymal_standing_pose(model))
    qs = jnp.tile(q0, (4, 1)).at[:, 2].add(jnp.array([-0.02, -0.005, 0.0, 0.01]))
    vs = jnp.asarray(RNG.normal(size=(4, model.nv)) * 0.5)
    taus = jnp.asarray(RNG.normal(size=(4, model.nv)))
    kin = forward_kinematics(model, qs, vs)
    fext, fworld, _, _ = compute_contact_forces(
        model, opts, None, kin, robot.contact_frame_indices
    )
    ref = dyn.aba(model, GRAV, qs, vs, taus, fext)
    cd = cdyn.ComponentDynamics(
        model, GRAV, contact_opts=opts, contact_frames=robot.contact_frame_indices
    )
    out, fw = cd.accel(qs, vs, taus, return_contacts=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-9)
    np.testing.assert_allclose(np.asarray(fw), np.asarray(fworld), atol=1e-9)


def test_engine_fast_path_wiring():
    """Force the fast path on CPU with a small model: the engine trajectory must
    match the generic path exactly."""
    model = build_model(
        "mass2",
        [
            {
                "name": "pz",
                "type": JointType.PRISMATIC,
                "parent": -1,
                "axis": np.array([0.0, 0.0, 1.0]),
                "mass": 1.0,
                "com": np.zeros(3),
                "inertia": np.eye(3) * 1e-3,
            }
        ],
        [{"name": "contact", "parent": 0, "placement": (np.eye(3), np.zeros(3))}],
    )
    robot = Robot.build(model, contact_frames=["contact"])
    contact = ContactOptions(stiffness=1e4, damping=1e2, friction=0.0, transition_eps=0.0)
    base = dict(contacts=contact, stepper=StepperOptions(dt_max=1e-3))
    eng_fast = Engine(robot, EngineOptions(use_fast_dynamics="always", **base))
    eng_ref = Engine(robot, EngineOptions(use_fast_dynamics=False, **base))
    assert eng_fast._cdyn is not None
    assert eng_ref._cdyn is None
    st_f = eng_fast.reset(jnp.array([0.05]))
    st_r = eng_ref.reset(jnp.array([0.05]))
    step_f = jax.jit(eng_fast.step)
    step_r = jax.jit(eng_ref.step)
    for _ in range(100):
        st_f = step_f(st_f)
        st_r = step_r(st_r)
    np.testing.assert_allclose(np.asarray(st_f.q), np.asarray(st_r.q), atol=1e-12)
    np.testing.assert_allclose(np.asarray(st_f.v), np.asarray(st_r.v), atol=1e-12)


def test_penalty_bounds_consistency():
    """Penalty bounds mode: fast path and generic path agree, and the bound
    actually stops the joint."""
    model = build_model(
        "bounded",
        [
            {
                "name": "pivot",
                "type": JointType.REVOLUTE,
                "parent": -1,
                "axis": np.array([0.0, 1.0, 0.0]),
                "mass": 1.0,
                "com": np.array([0.0, 0.0, -0.5]),
                "inertia": np.zeros((3, 3)),
                "position_limit": (np.array([-0.4]), np.array([0.4])),
            }
        ],
    )
    robot = Robot.build(model, motors=[{"joint_name": "pivot", "effort_limit": 100.0}])
    base = dict(
        stepper=StepperOptions(dt_max=5e-4),
        joint_bounds_mode="penalty",
        joint_bounds_freq=20.0,
    )
    eng_fast = Engine(robot, EngineOptions(use_fast_dynamics="always", **base))
    eng_ref = Engine(robot, EngineOptions(use_fast_dynamics=False, **base))
    st_f = eng_fast.reset(jnp.array([0.0]))
    st_r = eng_ref.reset(jnp.array([0.0]))
    step_f = jax.jit(eng_fast.step)
    step_r = jax.jit(eng_ref.step)
    for _ in range(400):
        st_f = step_f(st_f, jnp.array([3.0]))
        st_r = step_r(st_r, jnp.array([3.0]))
    np.testing.assert_allclose(np.asarray(st_f.q), np.asarray(st_r.q), atol=1e-10)
    assert 0.35 < float(st_f.q[0]) < 0.55  # stopped near the soft bound
    assert abs(float(st_f.v[0])) < 0.05


@pytest.mark.slow
def test_constrained_path_component_crba_matches():
    """Constraint-mode engine with component-wise CRBA/NLE (fast path forced)
    matches the generic constrained path exactly."""
    from jiminy_tpu.engine.config import ContactModel

    robot = build_anymal()
    base = dict(
        contacts=ContactOptions(
            model=ContactModel.CONSTRAINT, friction=1.0, transition_eps=1e-3
        ),
        stepper=StepperOptions(dt_max=1e-3),
        joint_bounds_mode="constraint",
    )
    eng_fast = Engine(robot, EngineOptions(use_fast_dynamics="always", **base))
    eng_ref = Engine(robot, EngineOptions(use_fast_dynamics=False, **base))
    assert eng_fast._cdyn_cm is not None and eng_ref._cdyn_cm is None
    q0 = jnp.asarray(anymal_standing_pose(robot.model))
    st_f = eng_fast.reset(q0)
    st_r = eng_ref.reset(q0)
    step_f = jax.jit(eng_fast.step)
    step_r = jax.jit(eng_ref.step)
    for _ in range(10):
        st_f = step_f(st_f)
        st_r = step_r(st_r)
    np.testing.assert_allclose(np.asarray(st_f.q), np.asarray(st_r.q), atol=1e-9)
    np.testing.assert_allclose(
        np.asarray(st_f.contact_forces), np.asarray(st_r.contact_forces), atol=1e-6
    )


def test_pgs_componentwise_matches_einsum_all_row_types():
    """The component-unrolled PGS sweep (constrained-path TPU fast path) is the
    einsum-form solve reassociated: bitwise-level agreement at f64 across every
    row family (bounds, contact cones, distance loops, rolling rows)."""
    from jiminy_tpu.engine.constraints import ConstraintSet
    from jiminy_tpu.engine.solver import pgs_solve

    cset = ConstraintSet(
        bound_joint_indices=(1, 2),
        contact_frame_indices=(0, 1),
        distance_pairs=((0, 1),),
        sphere_specs=((0, 0.1),),
    )
    n = cset.total_rows
    B = 7
    m = RNG.normal(size=(B, n, n + 4))
    A = jnp.asarray(m @ np.swapaxes(m, -1, -2) + np.eye(n) * 1e-3)
    b = jnp.asarray(RNG.normal(size=(B, n)))
    lam0 = jnp.asarray(RNG.normal(size=(B, n)) * 0.1)
    for friction, torsion in [(1.0, 0.2), (0.0, 0.0)]:
        ref = pgs_solve(cset, A, b, lam0, friction, torsion, 40, componentwise=False)
        out = pgs_solve(cset, A, b, lam0, friction, torsion, 40, componentwise=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-10)


def test_cdyn_spherical_flexibility_matches_generic():
    """Spherical joints in cdyn: a flexible pendulum (spherical flexibility
    joint inserted by Robot.build) stepped on the fast path matches the
    generic path, and raw ABA with a spherical joint matches dyn.aba."""
    from jiminy_tpu.engine import Robot
    from jiminy_tpu.engine.config import StepperOptions
    from jiminy_tpu.engine import EngineOptions, Engine

    model = build_model(
        "flexpend",
        [
            {
                "name": "pivot",
                "type": JointType.REVOLUTE,
                "parent": -1,
                "axis": np.array([0.0, 1.0, 0.0]),
                "mass": 1.0,
                "com": np.array([0.0, 0.0, -0.4]),
                "inertia": np.eye(3) * 1e-2,
            },
            {
                "name": "elbow",
                "type": JointType.REVOLUTE,
                "parent": 0,
                "axis": np.array([0.0, 1.0, 0.0]),
                "placement": (np.eye(3), np.array([0.0, 0.0, -0.8])),
                "mass": 0.7,
                "com": np.array([0.0, 0.0, -0.3]),
                "inertia": np.eye(3) * 5e-3,
            },
        ],
    )
    robot = Robot.build(
        model,
        motors=[{"joint_name": "pivot"}],
        flexibility=[
            {
                "joint_name": "elbow",
                "stiffness": (50.0, 60.0, 70.0),
                "damping": (0.5, 0.4, 0.3),
                "inertia": (1e-3, 1e-3, 1e-3),
            }
        ],
    )
    assert cdyn.supports_model(robot.model)
    base = dict(stepper=StepperOptions(dt_max=1e-3))
    eng_f = Engine(robot, EngineOptions(use_fast_dynamics="always", **base))
    eng_r = Engine(robot, EngineOptions(use_fast_dynamics=False, **base))
    assert eng_f._cdyn is not None
    q0 = np.asarray(robot.model.neutral()).copy()
    q0[0] = 0.7
    st_f = eng_f.reset(jnp.asarray(q0))
    st_r = eng_r.reset(jnp.asarray(q0))
    step_f = jax.jit(eng_f.step)
    step_r = jax.jit(eng_r.step)
    for _ in range(200):
        st_f = step_f(st_f, jnp.array([0.3]))
        st_r = step_r(st_r, jnp.array([0.3]))
    np.testing.assert_allclose(np.asarray(st_f.q), np.asarray(st_r.q), atol=1e-11)
    np.testing.assert_allclose(np.asarray(st_f.v), np.asarray(st_r.v), atol=1e-11)
    # Flexibility actually deflects (spherical joint not at identity)
    qi = robot.model.idx_q[robot.flexibility.joint_indices[0]]
    assert abs(float(st_f.q[qi + 1])) > 1e-5

    # Raw ABA/CRBA/NLE consistency on random states of the extended model
    m = robot.model
    B = 4
    qs = []
    for _ in range(B):
        quat = RNG.normal(size=4)
        quat /= np.linalg.norm(quat)
        q = np.asarray(m.neutral()).copy()
        q[0] = RNG.normal() * 0.5
        q[qi : qi + 4] = quat
        qs.append(q)
    qs = jnp.asarray(np.stack(qs))
    vs = jnp.asarray(RNG.normal(size=(B, m.nv)))
    taus = jnp.asarray(RNG.normal(size=(B, m.nv)))
    cd = cdyn.ComponentDynamics(m, GRAV)
    np.testing.assert_allclose(
        np.asarray(cd.accel(qs, vs, taus)),
        np.asarray(dyn.aba(m, GRAV, qs, vs, taus)),
        atol=1e-10,
    )
    qc = [qs[..., i] for i in range(m.nq)]
    vc = [vs[..., i] for i in range(m.nv)]
    mm = cd.mass_matrix_components(qc)
    mm = jnp.stack(
        [jnp.stack([jnp.broadcast_to(e, (B,)) for e in row], -1) for row in mm], -2
    )
    np.testing.assert_allclose(
        np.asarray(mm), np.asarray(dyn.crba(m, qs)), atol=1e-10
    )
    nle = cd.nle_components(qc, vc)
    nle = jnp.stack([jnp.broadcast_to(e, (B,)) for e in nle], -1)
    np.testing.assert_allclose(
        np.asarray(nle),
        np.asarray(dyn.nonlinear_effects(m, GRAV, qs, vs, None)),
        atol=1e-10,
    )


def test_cdyn_reported_accel_with_damping_not_doubled():
    """Regression: `dynamics_full`'s cdyn branch must not subtract viscous
    joint damping twice (it is applied inside cdyn) — the reported `state.a`
    (IMU accelerometer source) must match the generic path."""
    from jiminy_tpu.engine import Engine, EngineOptions, Robot
    from jiminy_tpu.engine.config import StepperOptions

    model = build_model(
        "damped",
        [
            {
                "name": "pivot",
                "type": JointType.REVOLUTE,
                "parent": -1,
                "axis": np.array([0.0, 1.0, 0.0]),
                "mass": 1.0,
                "com": np.array([0.0, 0.0, -0.5]),
                "inertia": np.zeros((3, 3)),
                "damping": 0.8,
            }
        ],
    )
    robot = Robot.build(model, motors=[{"joint_name": "pivot"}])
    assert float(np.asarray(robot.model.damping)[0]) == 0.8
    base = dict(stepper=StepperOptions(dt_max=1e-3))
    eng_f = Engine(robot, EngineOptions(use_fast_dynamics="always", **base))
    eng_r = Engine(robot, EngineOptions(use_fast_dynamics=False, **base))
    assert eng_f._cdyn is not None
    st_f = eng_f.reset(jnp.array([0.6]))
    st_r = eng_r.reset(jnp.array([0.6]))
    np.testing.assert_allclose(np.asarray(st_f.a), np.asarray(st_r.a), atol=1e-12)
    step_f, step_r = jax.jit(eng_f.step), jax.jit(eng_r.step)
    for _ in range(50):
        st_f, st_r = step_f(st_f), step_r(st_r)
    np.testing.assert_allclose(np.asarray(st_f.q), np.asarray(st_r.q), atol=1e-12)
    np.testing.assert_allclose(np.asarray(st_f.a), np.asarray(st_r.a), atol=1e-11)


def test_distance_only_constrained_cm_matches_generic():
    """The fully component-wise distance-loop constrained path (Cassie-style)
    matches the generic kin/jacobian/PGS path."""
    from jiminy_tpu.engine import Engine, EngineOptions, Robot
    from jiminy_tpu.engine.config import StepperOptions

    model = build_model(
        "fourbar",
        [
            {
                "name": "j0",
                "type": JointType.REVOLUTE,
                "parent": -1,
                "axis": np.array([0.0, 1.0, 0.0]),
                "mass": 1.0,
                "com": np.array([0.0, 0.0, -0.25]),
                "inertia": np.eye(3) * 1e-3,
            },
            {
                "name": "j1",
                "type": JointType.REVOLUTE,
                "parent": 0,
                "axis": np.array([0.0, 1.0, 0.0]),
                "placement": (np.eye(3), np.array([0.0, 0.0, -0.5])),
                "mass": 0.5,
                "com": np.array([0.0, 0.0, -0.25]),
                "inertia": np.eye(3) * 1e-3,
            },
            {
                "name": "j2",
                "type": JointType.REVOLUTE,
                "parent": -1,
                "axis": np.array([0.0, 1.0, 0.0]),
                "placement": (np.eye(3), np.array([0.3, 0.0, 0.0])),
                "mass": 0.5,
                "com": np.array([0.0, 0.0, -0.25]),
                "inertia": np.eye(3) * 1e-3,
            },
        ],
        [
            {"name": "tip_a", "parent": 1, "placement": (np.eye(3), np.array([0.0, 0.0, -0.5]))},
            {"name": "tip_b", "parent": 2, "placement": (np.eye(3), np.array([0.0, 0.0, -0.5]))},
        ],
    )
    robot = Robot.build(
        model,
        motors=[{"joint_name": "j0"}],
        loop_constraints=[("tip_a", "tip_b")],
    )
    base = dict(stepper=StepperOptions(dt_max=1e-3))
    eng_f = Engine(robot, EngineOptions(use_fast_dynamics="always", **base))
    eng_r = Engine(robot, EngineOptions(use_fast_dynamics=False, **base))
    assert eng_f._cdyn_cm is not None and eng_f.cset.n_distance == 1
    q0 = jnp.asarray([0.3, -0.2, 0.1])
    st_f, st_r = eng_f.reset(q0), eng_r.reset(q0)
    step_f, step_r = jax.jit(eng_f.step), jax.jit(eng_r.step)
    for _ in range(150):
        st_f = step_f(st_f, jnp.array([0.5]))
        st_r = step_r(st_r, jnp.array([0.5]))
    np.testing.assert_allclose(np.asarray(st_f.q), np.asarray(st_r.q), atol=1e-9)
    np.testing.assert_allclose(np.asarray(st_f.v), np.asarray(st_r.v), atol=1e-8)
    np.testing.assert_allclose(np.asarray(st_f.lam), np.asarray(st_r.lam), atol=1e-6)


@pytest.mark.slow
def test_distance_loops_with_contacts_and_bounds_cm_matches_generic():
    """The Cassie-shaped configuration — loop closures + spring-damper ground
    contacts + penalty joint bounds — on the fully component-wise constrained
    path matches the generic path (this is the `cassie-pid` RL hot path)."""
    from jiminy_tpu.engine import Engine, EngineOptions, Robot
    from jiminy_tpu.engine.config import StepperOptions

    model = build_model(
        "fourbar_c",
        [
            {
                "name": "j0",
                "type": JointType.REVOLUTE,
                "parent": -1,
                "axis": np.array([0.0, 1.0, 0.0]),
                "placement": (np.eye(3), np.array([0.0, 0.0, 0.6])),
                "mass": 1.0,
                "com": np.array([0.0, 0.0, -0.25]),
                "inertia": np.eye(3) * 1e-3,
                "position_limit": (np.array([-1.0]), np.array([1.0])),
            },
            {
                "name": "j1",
                "type": JointType.REVOLUTE,
                "parent": 0,
                "axis": np.array([0.0, 1.0, 0.0]),
                "placement": (np.eye(3), np.array([0.0, 0.0, -0.35])),
                "mass": 0.5,
                "com": np.array([0.0, 0.0, -0.15]),
                "inertia": np.eye(3) * 1e-3,
            },
            {
                "name": "j2",
                "type": JointType.REVOLUTE,
                "parent": -1,
                "axis": np.array([0.0, 1.0, 0.0]),
                "placement": (np.eye(3), np.array([0.15, 0.0, 0.6])),
                "mass": 0.5,
                "com": np.array([0.0, 0.0, -0.15]),
                "inertia": np.eye(3) * 1e-3,
            },
        ],
        [
            {"name": "tip_a", "parent": 1, "placement": (np.eye(3), np.array([0.0, 0.0, -0.3]))},
            {"name": "tip_b", "parent": 2, "placement": (np.eye(3), np.array([0.0, 0.0, -0.3]))},
            {"name": "foot", "parent": 1, "placement": (np.eye(3), np.array([0.0, 0.0, -0.32]))},
        ],
    )
    robot = Robot.build(
        model,
        motors=[{"joint_name": "j0"}],
        contact_frames=["foot"],
        loop_constraints=[("tip_a", "tip_b")],
    )
    contact = ContactOptions(stiffness=2e4, damping=4e2, friction=1.0)
    base = dict(
        contacts=contact,
        stepper=StepperOptions(dt_max=1e-3),
        joint_bounds_mode="penalty",
    )
    eng_f = Engine(robot, EngineOptions(use_fast_dynamics="always", **base))
    eng_r = Engine(robot, EngineOptions(use_fast_dynamics=False, **base))
    assert eng_f._cdyn_cm is not None
    assert eng_f.cset.n_distance == 1 and eng_f.cset.n_contacts == 0
    assert eng_f._bound_gains  # penalty bounds active
    q0 = jnp.asarray([0.4, -0.3, 0.2])
    st_f, st_r = eng_f.reset(q0), eng_r.reset(q0)
    step_f, step_r = jax.jit(eng_f.step), jax.jit(eng_r.step)
    for _ in range(300):
        st_f = step_f(st_f, jnp.array([2.0]))
        st_r = step_r(st_r, jnp.array([2.0]))
    assert np.isfinite(np.asarray(st_f.q)).all()
    np.testing.assert_allclose(np.asarray(st_f.q), np.asarray(st_r.q), atol=1e-9)
    np.testing.assert_allclose(np.asarray(st_f.v), np.asarray(st_r.v), atol=1e-8)
    # Penalty bound holds: strong torque cannot push past the limit
    assert float(st_f.q[0]) < 1.15


def test_aux_outputs_match_generic_anymal():
    """Fused post-step outputs (contact f_world/w_local/depth + raw IMU) vs the
    generic contact pass + FK + `ImuSensorGroup.compute_raw` pipeline."""
    robot = build_anymal()
    model = robot.model
    opts = ContactOptions(stiffness=1e5, damping=2e3, friction=1.0)
    q0 = anymal_standing_pose(model)
    B = 4
    qs = np.tile(q0, (B, 1))
    qs[:, 2] += np.array([-0.02, -0.005, 0.0, 0.01])
    qs[:, 7:] += RNG.normal(size=(B, model.nq - 7)) * 0.2
    qs = jnp.asarray(qs)
    vs = jnp.asarray(RNG.normal(size=(B, model.nv)) * 0.5)
    accs = jnp.asarray(RNG.normal(size=(B, model.nv)) * 2.0)

    cd = cdyn.ComponentDynamics(
        model,
        GRAV,
        contact_opts=opts,
        contact_frames=robot.contact_frame_indices,
        contact_radii=robot.contact_radii,
    )
    imu = dict(robot.sensors.groups())["imu"]
    aux = cd.aux_outputs(qs, vs, accs, imu_frames=tuple(imu.frame_indices))

    kin = forward_kinematics(model, qs, vs, accs)
    _, f_world, w_local, depth = compute_contact_forces(
        model, opts, None, kin, robot.contact_frame_indices, robot.contact_radii
    )
    np.testing.assert_allclose(
        np.asarray(aux["contact_f_world"]), np.asarray(f_world), atol=1e-10
    )
    np.testing.assert_allclose(
        np.asarray(aux["contact_w_local"]), np.asarray(w_local), atol=1e-10
    )
    np.testing.assert_allclose(
        np.asarray(aux["contact_depth"]), np.asarray(depth), atol=1e-12
    )
    contact_f = {
        "gravity": GRAV,
        "contact_forces_local": w_local[..., 3:6],
        "contact_wrench_local": w_local,
        "contact_frame_indices": robot.contact_frame_indices,
    }
    raw_ref = imu.compute_raw(model, kin, qs, vs, accs, None, contact_f)
    np.testing.assert_allclose(
        np.asarray(aux["imu_raw"]), np.asarray(raw_ref), atol=1e-9
    )


def test_engine_fused_sensor_parity():
    """Full engine steps with the fused post-step path vs the generic path:
    states AND all sensor measurements must agree (free-flyer base with IMU,
    contact, force and encoder sensors)."""
    model = build_model(
        "box_leg",
        [
            {
                "name": "root_joint",
                "type": JointType.FREE,
                "parent": -1,
                "mass": 2.0,
                "com": np.zeros(3),
                "inertia": np.eye(3) * 0.02,
            },
            {
                "name": "leg",
                "type": JointType.REVOLUTE,
                "parent": 0,
                "placement": (np.eye(3), np.array([0.1, 0.0, 0.0])),
                "axis": np.array([0.0, 1.0, 0.0]),
                "mass": 0.3,
                "com": np.array([0.0, 0.0, -0.15]),
                "inertia": np.eye(3) * 1e-3,
            },
        ],
        [
            {"name": "imu_frame", "parent": 0,
             "placement": (np.eye(3), np.array([0.02, 0.0, 0.05]))},
            {"name": "foot", "parent": 1,
             "placement": (np.eye(3), np.array([0.0, 0.0, -0.3]))},
            {"name": "corner", "parent": 0,
             "placement": (np.eye(3), np.array([-0.1, 0.0, -0.1]))},
        ],
    )
    robot = Robot.build(
        model,
        motors=[{"joint_name": "leg", "effort_limit": 20.0}],
        sensors={
            "imu": [{"frame_name": "imu_frame"}],
            "contact": [{"frame_name": "foot"}],
            "force": [{"frame_name": "foot"}],
            "encoder": [{"motor_name": "leg"}],
            "effort": [{"motor_name": "leg"}],
        },
        contact_frames=["foot", "corner"],
    )
    contact = ContactOptions(stiffness=2e4, damping=5e2, friction=0.8)
    base = dict(contacts=contact, stepper=StepperOptions(dt_max=1e-3))
    eng_f = Engine(robot, EngineOptions(use_fast_dynamics="always", **base))
    eng_r = Engine(robot, EngineOptions(use_fast_dynamics=False, **base))
    assert eng_f._cdyn is not None and eng_f._imu_frames
    q0 = jnp.asarray([0.0, 0.0, 0.35, 0.0, 0.0, 0.0, 1.0, 0.2])
    st_f, st_r = eng_f.reset(q0), eng_r.reset(q0)
    step_f, step_r = jax.jit(eng_f.step), jax.jit(eng_r.step)
    cmd = jnp.asarray([1.5])
    for _ in range(150):
        st_f = step_f(st_f, cmd)
        st_r = step_r(st_r, cmd)
    np.testing.assert_allclose(np.asarray(st_f.q), np.asarray(st_r.q), atol=1e-10)
    np.testing.assert_allclose(np.asarray(st_f.v), np.asarray(st_r.v), atol=1e-9)
    for name in st_r.measurements:
        np.testing.assert_allclose(
            np.asarray(st_f.measurements[name]),
            np.asarray(st_r.measurements[name]),
            atol=1e-9,
            err_msg=name,
        )
    np.testing.assert_allclose(
        np.asarray(st_f.contact_forces), np.asarray(st_r.contact_forces), atol=1e-8
    )


def test_cdyn_terrain_matches_generic():
    """cdyn's elementwise `height_components` terrain branch (the code traced
    inside the Pallas megakernel for non-flat ground) must match the generic
    batched ground_fn contact path bit-for-bit at f64."""
    from jiminy_tpu.utils import terrain

    robot = build_anymal()
    model = robot.model
    opts = ContactOptions(stiffness=1e5, damping=2e3, friction=1.0)
    ground = terrain.sum_heightmaps([
        terrain.random_perlin_ground(wavelength=1.5, height_max=0.05, seed=3),
        terrain.periodic_stairs_ground(0.4, 0.03, 3, orientation=0.5),
    ])
    q0 = jnp.asarray(anymal_standing_pose(model))
    qs = jnp.tile(q0, (4, 1)).at[:, 2].add(jnp.array([-0.05, -0.02, 0.0, 0.02]))
    qs = qs.at[:, 0].add(jnp.linspace(-1.0, 1.0, 4))
    vs = jnp.asarray(RNG.normal(size=(4, model.nv)) * 0.5)
    taus = jnp.asarray(RNG.normal(size=(4, model.nv)))
    kin = forward_kinematics(model, qs, vs)
    fext, fworld, _, _ = compute_contact_forces(
        model, opts, ground, kin, robot.contact_frame_indices
    )
    ref = dyn.aba(model, GRAV, qs, vs, taus, fext)
    cd = cdyn.ComponentDynamics(
        model, GRAV, contact_opts=opts,
        contact_frames=robot.contact_frame_indices, ground_fn=ground,
    )
    assert cd._pallas_ground_ok()
    out, fw = cd.accel(qs, vs, taus, return_contacts=True)
    # Touching the terrain somewhere (otherwise the test is vacuous)
    assert float(jnp.abs(fw).max()) > 1.0
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-9)
    np.testing.assert_allclose(np.asarray(fw), np.asarray(fworld), atol=1e-9)


@pytest.mark.slow
def test_fused_distance_period_integrator_batched():
    """The fused whole-period distance-loop integrator (one component-wise
    trace per tick, Pallas megakernel on TPU) matches the per-stage generic
    path on explicitly-batched states — q/v, multipliers and contact forces."""
    from jiminy_tpu.engine import Engine, EngineOptions, Robot
    from jiminy_tpu.engine.config import StepperOptions

    model = build_model(
        "fourbar_b",
        [
            {
                "name": "j0",
                "type": JointType.REVOLUTE,
                "parent": -1,
                "axis": np.array([0.0, 1.0, 0.0]),
                "placement": (np.eye(3), np.array([0.0, 0.0, 0.6])),
                "mass": 1.0,
                "com": np.array([0.0, 0.0, -0.25]),
                "inertia": np.eye(3) * 1e-3,
                "position_limit": (np.array([-1.0]), np.array([1.0])),
            },
            {
                "name": "j1",
                "type": JointType.REVOLUTE,
                "parent": 0,
                "axis": np.array([0.0, 1.0, 0.0]),
                "placement": (np.eye(3), np.array([0.0, 0.0, -0.35])),
                "mass": 0.5,
                "com": np.array([0.0, 0.0, -0.15]),
                "inertia": np.eye(3) * 1e-3,
            },
            {
                "name": "j2",
                "type": JointType.REVOLUTE,
                "parent": -1,
                "axis": np.array([0.0, 1.0, 0.0]),
                "placement": (np.eye(3), np.array([0.15, 0.0, 0.6])),
                "mass": 0.5,
                "com": np.array([0.0, 0.0, -0.15]),
                "inertia": np.eye(3) * 1e-3,
            },
        ],
        [
            {"name": "tip_a", "parent": 1, "placement": (np.eye(3), np.array([0.0, 0.0, -0.3]))},
            {"name": "tip_b", "parent": 2, "placement": (np.eye(3), np.array([0.0, 0.0, -0.3]))},
            {"name": "foot", "parent": 1, "placement": (np.eye(3), np.array([0.0, 0.0, -0.32]))},
        ],
    )
    robot = Robot.build(
        model,
        motors=[{"joint_name": "j0"}],
        contact_frames=["foot"],
        loop_constraints=[("tip_a", "tip_b")],
    )
    contact = ContactOptions(stiffness=2e4, damping=4e2, friction=1.0)
    base = dict(
        contacts=contact,
        stepper=StepperOptions(dt_max=1e-3),
        joint_bounds_mode="penalty",
    )
    eng_f = Engine(robot, EngineOptions(use_fast_dynamics="always", **base))
    eng_r = Engine(robot, EngineOptions(use_fast_dynamics=False, **base))
    B = 3
    q0 = (
        jnp.tile(jnp.asarray([0.4, -0.3, 0.2]), (B, 1))
        + jnp.linspace(-0.05, 0.05, B)[:, None]
    )
    st_f = jax.vmap(eng_f.reset)(q0)
    st_r = jax.vmap(eng_r.reset)(q0)
    cmd = jnp.tile(jnp.array([2.0]), (B, 1))
    step_f = jax.jit(eng_f.step)  # explicitly-batched
    step_r = jax.jit(jax.vmap(lambda s: eng_r.step(s, jnp.array([2.0]))))
    for _ in range(100):
        st_f = step_f(st_f, cmd)
        st_r = step_r(st_r)
    assert any(
        k in eng_f._period_runs for k in ("cstr-rk4", "dist-rk4")
    )  # the fused branch was taken
    np.testing.assert_allclose(np.asarray(st_f.q), np.asarray(st_r.q), atol=1e-9)
    np.testing.assert_allclose(np.asarray(st_f.v), np.asarray(st_r.v), atol=1e-8)
    np.testing.assert_allclose(np.asarray(st_f.lam), np.asarray(st_r.lam), atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(st_f.contact_forces), np.asarray(st_r.contact_forces), atol=1e-7
    )


def _fourbar_contact_robot():
    """3-joint model exercising every PGS row family at once: a cone-friction
    ground contact, a joint bound, and a distance loop closure."""
    from jiminy_tpu.engine import Robot

    model = build_model(
        "fourbar_cc",
        [
            {
                "name": "j0",
                "type": JointType.REVOLUTE,
                "parent": -1,
                "axis": np.array([0.0, 1.0, 0.0]),
                "placement": (np.eye(3), np.array([0.0, 0.0, 0.6])),
                "mass": 1.0,
                "com": np.array([0.0, 0.0, -0.25]),
                "inertia": np.eye(3) * 1e-3,
                "position_limit": (np.array([-1.2]), np.array([1.2])),
            },
            {
                "name": "j1",
                "type": JointType.REVOLUTE,
                "parent": 0,
                "axis": np.array([0.0, 1.0, 0.0]),
                "placement": (np.eye(3), np.array([0.0, 0.0, -0.35])),
                "mass": 0.5,
                "com": np.array([0.0, 0.0, -0.15]),
                "inertia": np.eye(3) * 1e-3,
            },
            {
                "name": "j2",
                "type": JointType.REVOLUTE,
                "parent": -1,
                "axis": np.array([0.0, 1.0, 0.0]),
                "placement": (np.eye(3), np.array([0.15, 0.0, 0.6])),
                "mass": 0.5,
                "com": np.array([0.0, 0.0, -0.15]),
                "inertia": np.eye(3) * 1e-3,
            },
        ],
        [
            {"name": "tip_a", "parent": 1, "placement": (np.eye(3), np.array([0.0, 0.0, -0.3]))},
            {"name": "tip_b", "parent": 2, "placement": (np.eye(3), np.array([0.0, 0.0, -0.3]))},
            {"name": "foot", "parent": 1, "placement": (np.eye(3), np.array([0.0, 0.0, -0.32]))},
        ],
    )
    return Robot.build(
        model,
        motors=[{"joint_name": "j0"}],
        contact_frames=["foot"],
        loop_constraints=[("tip_a", "tip_b")],
    )


@pytest.mark.slow
def test_fused_constraint_contact_mode_matches_generic():
    """CONSTRAINT contact mode (the reference's default contact model) on the
    fused whole-period path: cone-friction contact rows + joint bound rows +
    a distance loop through the boxed Gauss-Seidel solve must match the
    generic array path — q/v, multipliers, active sets and reported contact
    forces."""
    from jiminy_tpu.engine import Engine, EngineOptions
    from jiminy_tpu.engine.config import ContactModel, StepperOptions

    robot = _fourbar_contact_robot()
    contact = ContactOptions(
        model=ContactModel.CONSTRAINT, friction=0.8, torsion=0.1,
        transition_eps=1e-3,
    )
    base = dict(
        contacts=contact,
        stepper=StepperOptions(dt_max=1e-3),
        joint_bounds_mode="constraint",
    )
    eng_f = Engine(robot, EngineOptions(use_fast_dynamics="always", **base))
    eng_r = Engine(robot, EngineOptions(use_fast_dynamics=False, **base))
    assert eng_f.constraint_mode and eng_f._cdyn_cm is not None
    assert eng_f.cset.n_contacts == 1 and eng_f.cset.n_bounds == 1
    assert eng_f.cset.n_distance == 1
    q0 = jnp.asarray([0.4, -0.3, 0.2])
    st_f, st_r = eng_f.reset(q0), eng_r.reset(q0)
    step_f, step_r = jax.jit(eng_f.step), jax.jit(eng_r.step)
    for _ in range(300):
        st_f = step_f(st_f, jnp.array([2.0]))
        st_r = step_r(st_r, jnp.array([2.0]))
    assert "cstr-rk4" in eng_f._period_runs  # the fused branch was taken
    assert np.isfinite(np.asarray(st_f.q)).all()
    np.testing.assert_allclose(np.asarray(st_f.q), np.asarray(st_r.q), atol=1e-8)
    np.testing.assert_allclose(np.asarray(st_f.v), np.asarray(st_r.v), atol=1e-7)
    np.testing.assert_allclose(np.asarray(st_f.lam), np.asarray(st_r.lam), atol=1e-5)
    np.testing.assert_array_equal(
        np.asarray(st_f.contact_active), np.asarray(st_r.contact_active)
    )
    np.testing.assert_array_equal(
        np.asarray(st_f.bound_active), np.asarray(st_r.bound_active)
    )
    np.testing.assert_allclose(
        np.asarray(st_f.contact_forces), np.asarray(st_r.contact_forces),
        atol=1e-6,
    )
    # The foot actually touched the ground at some point during the swing
    assert float(jnp.abs(st_f.lam).max()) > 0.0


@pytest.mark.slow
def test_constraint_mode_stage_warm_start_off_matches_generic():
    """`pgs_stage_warm_start=False` (per-tick frozen warm start, the
    pre-round-3 semantics) must still agree between the fused component path
    and the generic array path — and must actually differ from the
    stage-chained default (the knob is not a no-op)."""
    from jiminy_tpu.engine import Engine, EngineOptions
    from jiminy_tpu.engine.config import ContactModel, StepperOptions

    robot = _fourbar_contact_robot()
    contact = ContactOptions(
        model=ContactModel.CONSTRAINT, friction=0.8, torsion=0.1,
        transition_eps=1e-3,
    )
    base = dict(
        contacts=contact,
        stepper=StepperOptions(dt_max=1e-3, pgs_stage_warm_start=False),
        joint_bounds_mode="constraint",
    )
    eng_f = Engine(robot, EngineOptions(use_fast_dynamics="always", **base))
    eng_r = Engine(robot, EngineOptions(use_fast_dynamics=False, **base))
    eng_w = Engine(
        robot,
        EngineOptions(
            use_fast_dynamics="always",
            contacts=contact,
            stepper=StepperOptions(dt_max=1e-3, pgs_stage_warm_start=True),
            joint_bounds_mode="constraint",
        ),
    )
    q0 = jnp.asarray([0.4, -0.3, 0.2])
    st_f, st_r, st_w = eng_f.reset(q0), eng_r.reset(q0), eng_w.reset(q0)
    step_f, step_r = jax.jit(eng_f.step), jax.jit(eng_r.step)
    step_w = jax.jit(eng_w.step)
    for _ in range(150):
        st_f = step_f(st_f, jnp.array([2.0]))
        st_r = step_r(st_r, jnp.array([2.0]))
        st_w = step_w(st_w, jnp.array([2.0]))
    np.testing.assert_allclose(np.asarray(st_f.q), np.asarray(st_r.q), atol=1e-8)
    np.testing.assert_allclose(np.asarray(st_f.lam), np.asarray(st_r.lam), atol=1e-5)
    np.testing.assert_array_equal(
        np.asarray(st_f.contact_active), np.asarray(st_r.contact_active)
    )
    assert float(jnp.abs(st_f.lam).max()) > 0.0
    # Stage chaining changes the solve (warm start differs per stage)
    assert float(jnp.abs(st_w.q - st_f.q).max()) > 0.0


@pytest.mark.slow
def test_stage_warm_start_low_iter_accuracy():
    """With stage-chained warm starts a small fixed PGS budget tracks the
    high-iteration solution *per step*: from identical states along the
    converged trajectory, one step at iter_max=8 matches one step at
    iter_max=64 tightly (the reference reaches the same regime through its
    residual-stagnation early exit, `constraint_solvers.cc:269-276`).
    End-of-rollout states are NOT compared — the fourbar swing is chaotic, so
    per-step differences amplify without bounding solver accuracy."""
    from jiminy_tpu.engine import Engine, EngineOptions
    from jiminy_tpu.engine.config import ContactModel, StepperOptions

    robot = _fourbar_contact_robot()
    contact = ContactOptions(
        model=ContactModel.CONSTRAINT, friction=0.8, torsion=0.1,
        transition_eps=1e-3,
    )

    def make(iter_max):
        return Engine(
            robot,
            EngineOptions(
                use_fast_dynamics="always",
                contacts=contact,
                stepper=StepperOptions(dt_max=1e-3, pgs_iter_max=iter_max),
                joint_bounds_mode="constraint",
            ),
        )

    eng_lo, eng_hi = make(8), make(64)
    step_lo, step_hi = jax.jit(eng_lo.step), jax.jit(eng_hi.step)
    u = jnp.array([2.0])
    st = eng_hi.reset(jnp.asarray([0.4, -0.3, 0.2]))
    touched = False
    for k in range(100):
        st_next = step_hi(st, u)
        if k % 10 == 0:
            # Re-step the SAME state with the small budget: per-step deviation
            # bounds the solver truncation error, free of chaotic growth.
            st_lo = step_lo(st, u)
            # Touchdown active-set flips genuinely need iterations (see
            # benchmarks/pgs_study.py STUDY_DROP): budget-8 deviates up to
            # ~2.5% relative in v at impact steps, far less elsewhere.
            np.testing.assert_allclose(
                np.asarray(st_lo.q), np.asarray(st_next.q),
                atol=2e-4, rtol=0.0,
            )
            np.testing.assert_allclose(
                np.asarray(st_lo.v), np.asarray(st_next.v),
                atol=5e-3, rtol=5e-2,
            )
        touched = touched or float(jnp.abs(st_next.lam).max()) > 0.0
        st = st_next
    assert touched
