"""Quantities & compositions vs direct computation (reference
`test_quantities.py` / `test_rewards.py` / `test_terminations.py` strategy)."""

import jax
import jax.numpy as jnp
import numpy as np

from jiminy_tpu.compositions import (
    AdditiveMixtureReward,
    BaseRollPitchTermination,
    SurviveReward,
    TrackingBaseOdometryVelocityReward,
    radial_basis_function,
)
from jiminy_tpu.envs import make
from jiminy_tpu.gym import ComposedEnv
from jiminy_tpu.quantities import (
    BaseOdometryPose,
    BaseOdometryVelocity,
    CapturePoint,
    CenterOfMass,
    CenterOfMassVelocity,
    EnergyQuantity,
    FramePosition,
    MaskedQuantity,
    ZeroMomentPoint,
)


def _env_state():
    env = make("anymal")
    st, _ = env.reset(jax.random.PRNGKey(0))
    return env, st


def test_com_against_direct():
    env, st = _env_state()
    com = CenterOfMass()(env, st)
    # Direct computation from FK
    from jiminy_tpu.ops.kinematics import forward_kinematics
    from jiminy_tpu.ops import lie

    model = env.robot.model
    kin = forward_kinematics(model, st.sim.q)
    num = 0.0
    for i in range(model.njoints):
        c_w = lie.se3_apply(
            lie.SE3(kin.omi.rot[i], kin.omi.pos[i]), model.com[i]
        )
        num = num + model.mass[i] * c_w
    expected = num / jnp.sum(model.mass)
    np.testing.assert_allclose(np.asarray(com), np.asarray(expected), atol=1e-12)
    # Standing robot: CoM near base xy, below base z
    assert abs(float(com[0])) < 0.1
    assert 0.2 < float(com[2]) < 0.6


def test_com_velocity_finite_difference():
    env, st = _env_state()
    step = jax.jit(env.step)
    st1, *_ = step(st, jnp.zeros((env.action_size,)))
    dt = env.step_dt
    c0 = np.asarray(CenterOfMass()(env, st))
    c1 = np.asarray(CenterOfMass()(env, st1))
    v_mid = np.asarray(CenterOfMassVelocity()(env, st1))
    fd = (c1 - c0) / dt
    # Falling/settling robot: the FD velocity should roughly match
    assert np.linalg.norm(fd - v_mid) < 0.5


def test_odometry_pose_and_velocity():
    env, st = _env_state()
    pose = np.asarray(BaseOdometryPose()(env, st))
    np.testing.assert_allclose(pose, [0.0, 0.0, 0.0], atol=1e-9)
    vel = np.asarray(BaseOdometryVelocity()(env, st))
    assert vel.shape == (3,)


def test_zmp_capture_point_static():
    """At rest, ZMP and capture point coincide with the CoM ground projection.

    Uses the PD env: with zero action the real ANYmal holds its nominal pose
    (the plain effort env collapses under zero torque — the old procedural
    robot merely settled slower)."""
    env = make("anymal-pid")
    st, _ = env.reset(jax.random.PRNGKey(0))
    # Settle first
    step = jax.jit(env.step)
    for _ in range(30):
        st, *_ = step(st, jnp.zeros((env.action_size,)))
    com = np.asarray(CenterOfMass()(env, st))
    zmp = np.asarray(ZeroMomentPoint()(env, st))
    cap = np.asarray(CapturePoint()(env, st))
    assert np.linalg.norm(zmp - com[:2]) < 0.05
    assert np.linalg.norm(cap - com[:2]) < 0.05


def test_frame_position_and_mask():
    env, st = _env_state()
    q = FramePosition("LF_FOOT")
    pos = np.asarray(q(env, st))
    assert pos.shape == (3,)
    masked = MaskedQuantity(q, indices=(2,))
    z = np.asarray(masked(env, st))
    assert z.shape == (1,) and abs(z[0] - pos[2]) < 1e-12


def test_energy_decreases_with_damping():
    env, st = _env_state()
    e = EnergyQuantity()(env, st)
    assert np.isfinite(float(e))


def test_rbf_kernel():
    assert abs(float(radial_basis_function(jnp.zeros(3), 1.0)) - 1.0) < 1e-9
    at_cutoff = float(radial_basis_function(jnp.array([1.0, 0.0]), 1.0))
    assert abs(at_cutoff - 0.01) < 1e-9


def test_composed_env_rewards_terminations():
    env = make("anymal")
    reward = AdditiveMixtureReward(
        [SurviveReward(), TrackingBaseOdometryVelocityReward(jnp.array([0.3, 0.0, 0.0]))],
        weights=[0.5, 0.5],
    )
    env = ComposedEnv(env, reward=reward, terminations=[BaseRollPitchTermination()])
    st, obs = env.reset(jax.random.PRNGKey(0))
    step = jax.jit(env.step)
    st, obs, r, te, tr, _ = step(st, jnp.zeros((env.action_size,)))
    assert 0.0 <= float(r) <= 1.0
    assert isinstance(bool(te), bool)


def test_frame_xyzquat_and_mean():
    from jiminy_tpu.quantities import (
        FrameXYZQuat,
        MultiFrameMeanXYZQuat,
        MultiFrameXYZQuat,
    )

    env, st = _env_state()
    names = [env.robot.model.frame_names[f] for f in env.robot.contact_frame_indices]
    pose = FrameXYZQuat(names[0])(env, st)
    assert pose.shape == (7,)
    assert abs(float(jnp.linalg.norm(pose[3:7])) - 1.0) < 1e-6
    poses = MultiFrameXYZQuat(names)(env, st)
    assert poses.shape == (len(names), 7)
    np.testing.assert_allclose(np.asarray(poses[0]), np.asarray(pose), atol=1e-12)
    mean = MultiFrameMeanXYZQuat(names)(env, st)
    np.testing.assert_allclose(
        np.asarray(mean[0:3]), np.mean(np.asarray(poses[:, 0:3]), axis=0), atol=1e-10
    )


def test_remove_yaw_and_roll_pitch():
    from jiminy_tpu.ops import lie
    from jiminy_tpu.quantities import remove_yaw

    rpy = jnp.asarray([0.3, -0.2, 1.1])
    quat = lie.mat_to_quat(lie.rpy_to_mat(rpy))
    q_noyaw = remove_yaw(quat)
    expected = lie.mat_to_quat(lie.rpy_to_mat(jnp.asarray([0.3, -0.2, 0.0])))
    dot = abs(float(jnp.sum(q_noyaw * expected)))
    assert abs(dot - 1.0) < 1e-6


def test_actuated_joint_kinematic_and_power():
    from jiminy_tpu.quantities import (
        AverageMechanicalPowerConsumption,
        MultiActuatedJointKinematic,
    )

    env, st = _env_state()
    qm = MultiActuatedJointKinematic("position")(env, st)
    assert qm.shape == (env.robot.nmotors,)
    vm = MultiActuatedJointKinematic("velocity")(env, st)
    assert float(jnp.linalg.norm(vm)) < 1e-9  # starts at rest
    p = AverageMechanicalPowerConsumption()(env, st)
    assert float(p) >= 0.0


def test_foot_quantities():
    from jiminy_tpu.quantities import (
        MultiContactNormalizedSpatialForce,
        MultiFootMeanOdometryPose,
        MultiFootMeanXYZQuat,
        MultiFootNormalizedForceVertical,
        MultiFootRelativeXYZQuat,
    )

    # PD env: the real ANYmal holds its stance under zero action (the plain
    # effort env collapses, leaving the feet unloaded)
    env = make("anymal-pid")
    st, _ = env.reset(jax.random.PRNGKey(0))
    # Let it settle so contact forces are realistic
    step = jax.jit(env.step)
    a = jnp.zeros((env.action_size,))
    for _ in range(25):
        st, *_ = env.step(st, a) if False else (step(st, a)[0],)
    mean = MultiFootMeanXYZQuat()(env, st)
    assert mean.shape == (7,)
    odo = MultiFootMeanOdometryPose()(env, st)
    assert odo.shape == (3,)
    rel = MultiFootRelativeXYZQuat()(env, st)
    assert rel.shape[0] == 4 and rel.shape[-1] == 7  # ANYmal: 4 feet
    # Relative positions average ~0 by construction
    np.testing.assert_allclose(
        np.mean(np.asarray(rel[..., 0:3]), axis=0), 0.0, atol=1e-6
    )
    fz = MultiFootNormalizedForceVertical()(env, st)
    assert fz.shape == (4,)
    # Standing: feet carry ~the full weight
    assert 0.5 < float(jnp.sum(fz)) < 1.5
    fall = MultiContactNormalizedSpatialForce()(env, st)
    assert fall.shape == (4, 3)


def test_base_momentum_and_terminations():
    from jiminy_tpu.compositions import (
        FootCollisionTermination,
        MechanicalSafetyTermination,
        MinimizeAngularMomentumReward,
        MinimizeFrictionReward,
    )
    from jiminy_tpu.quantities import AverageBaseMomentum

    env, st = _env_state()
    h = AverageBaseMomentum()(env, st)
    assert h.shape == (3,)
    assert float(jnp.linalg.norm(h)) < 1e-9  # at rest
    r = MinimizeAngularMomentumReward()(env, st, None, st)
    assert abs(float(r) - 1.0) < 1e-6  # zero momentum -> max reward
    rf = MinimizeFrictionReward()(env, st, None, st)
    assert 0.0 < float(rf) <= 1.0
    assert not bool(FootCollisionTermination(0.02)(env, st))
    assert bool(FootCollisionTermination(10.0)(env, st))  # huge margin trips
    assert not bool(MechanicalSafetyTermination(velocity_max=1.0)(env, st))


def test_drift_shift_terminations():
    from jiminy_tpu.compositions import (
        DriftTrackingBaseOdometryPositionTermination,
        ShiftTrackingMotorPositionsTermination,
    )
    from jiminy_tpu.quantities import MultiActuatedJointKinematic

    env, st = _env_state()
    target = jnp.zeros(2)
    assert not bool(
        DriftTrackingBaseOdometryPositionTermination(target, max_drift=1.0)(env, st)
    )
    assert bool(
        DriftTrackingBaseOdometryPositionTermination(
            jnp.asarray([5.0, 5.0]), max_drift=1.0
        )(env, st)
    )
    q0 = MultiActuatedJointKinematic("position")(env, st)
    assert not bool(
        ShiftTrackingMotorPositionsTermination(q0, max_shift=0.1)(env, st)
    )
    assert bool(
        ShiftTrackingMotorPositionsTermination(q0 + 1.0, max_shift=0.1)(env, st)
    )


def test_stacked_and_delta_history_carried():
    """StackedQuantity / DeltaQuantity history rides `state.blocks` through
    `ComposedEnv` (reference `StackedQuantity`/`DeltaQuantity`,
    `quantities/transform.py`) — jit/scan-stable structure."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from jiminy_tpu.envs import make
    from jiminy_tpu.gym.pipeline import ComposedEnv
    from jiminy_tpu.quantities import DeltaQuantity, StackedQuantity
    from jiminy_tpu.quantities.manager import QuantityManager

    env = make("pendulum")
    qm = QuantityManager(env)

    class Angle:
        def __call__(self, env, state):
            return state.sim.q[..., 0]

    qm["angle_stack"] = StackedQuantity(Angle(), "angle_stack", num_stack=3)
    qm["angle_delta"] = DeltaQuantity(Angle(), "angle_delta")
    cenv = ComposedEnv(env, quantities=qm)
    st, _ = cenv.reset(jax.random.PRNGKey(0))
    step = jax.jit(cenv.step)
    angles = [float(st.sim.q[0])]
    for _ in range(4):
        st, *_ = step(st, jnp.asarray([0.4]))
        angles.append(float(st.sim.q[0]))
    stack = np.asarray(st.blocks["quantity_stack"]["angle_stack"])
    np.testing.assert_allclose(stack, np.asarray(angles[-3:]), rtol=1e-9)
    delta = qm.compute("angle_delta", st)
    # delta at the NEXT evaluation = current - previous-step snapshot
    np.testing.assert_allclose(float(delta), 0.0, atol=1e-12)  # same state
    # advance once more: snapshot was angles[-1], so delta reflects the step
    st2, *_ = step(st, jnp.asarray([0.4]))
    d = float(qm.compute("angle_delta", st2.replace(blocks=st.blocks)))
    np.testing.assert_allclose(d, float(st2.sim.q[0]) - angles[-1], atol=1e-12)


def test_multi_frame_orientation_and_multiary():
    from jiminy_tpu.quantities import (
        FramePosition,
        MultiAryOpQuantity,
        MultiFrameOrientation,
    )

    env = make("anymal")
    st, _ = env.reset(jax.random.PRNGKey(0))
    names = [env.robot.model.frame_names[1], env.robot.model.frame_names[2]]
    rots = MultiFrameOrientation(names)(env, st)
    assert rots.shape[-3:] == (2, 3, 3)
    # Orthonormality
    eye = np.einsum("...ij,...kj->...ik", np.asarray(rots), np.asarray(rots))
    np.testing.assert_allclose(eye, np.broadcast_to(np.eye(3), eye.shape), atol=1e-9)
    q = MultiAryOpQuantity(
        [FramePosition(names[0]), FramePosition(names[1])],
        lambda a, b: jnp.linalg.norm(a - b, axis=-1),
    )
    assert np.isfinite(float(q(env, st)))


def test_reference_position_vector_odometry_overwrite():
    """ReferencePositionVector: the returned configuration carries the TRUE
    (x, y, yaw) odometry but the REFERENCE joint configuration
    (reference quantities/locomotion.py:561)."""
    from jiminy_tpu.quantities import ReferencePositionVector, TrajectoryDataset
    from jiminy_tpu.telemetry.trajectory import Trajectory

    env = make("anymal")
    st, _ = env.reset(jax.random.PRNGKey(0))
    nq = env.robot.model.nq
    # Reference trajectory: same pose held, but displaced 5 m in x
    q_ref = np.asarray(st.sim.q).copy()
    q_ref[0] += 5.0
    traj = Trajectory(
        times=np.array([0.0, 1.0]),
        qs=np.stack([q_ref, q_ref]),
        robot=env.robot,
    )
    ds = TrajectoryDataset(step_dt=env.step_dt)
    ds.add("hold", traj)
    out = np.asarray(ReferencePositionVector(ds, odometry_mode="base")(env, st))
    assert out.shape == (nq,)
    # Odometry overwritten with the true base x/y ...
    np.testing.assert_allclose(out[0:2], np.asarray(st.sim.q)[0:2], atol=1e-9)
    # ... while the joint configuration stays the reference's
    np.testing.assert_allclose(out[7:], q_ref[7:], atol=1e-9)
    # None mode keeps the raw reference odometry
    out_none = np.asarray(ReferencePositionVector(ds, odometry_mode=None)(env, st))
    np.testing.assert_allclose(out_none[0], q_ref[0], atol=1e-9)


def test_average_frame_quantities_are_finite_differences():
    """The Average* quantities use the SE(3) geodesic step difference via the
    quantity_delta carry, matching the reference's definitions (reference
    `_DifferenceFrameXYZQuat`/`AverageFrameXYZQuat`/`FrameSpatialAverageVelocity`,
    `quantities/generic.py:1203-1530`)."""
    import jax

    from jiminy_tpu.gym.pipeline import ComposedEnv
    from jiminy_tpu.ops import lie
    from jiminy_tpu.quantities import (
        AverageFrameSpatialVelocity,
        AverageFrameXYZQuat,
        FrameXYZQuat,
    )
    from jiminy_tpu.quantities.manager import QuantityManager

    env = make("anymal")
    qm = QuantityManager(env)
    qm["avg_pose"] = AverageFrameXYZQuat("LF_FOOT")
    qm["avg_vel"] = AverageFrameSpatialVelocity("LF_FOOT")
    cenv = ComposedEnv(env, quantities=qm)
    st, _ = cenv.reset(jax.random.PRNGKey(0))
    pose_prev = np.asarray(FrameXYZQuat("LF_FOOT")(env, st))
    action = jnp.zeros(env.action_size)
    st2, *_ = jax.jit(cenv.step)(st, action)

    pose_now = np.asarray(FrameXYZQuat("LF_FOOT")(env, st2))
    # Evaluate with the carry from the PREVIOUS step (as rewards see it)
    st_eval = st2.replace(blocks=st.blocks)
    diff = np.asarray(
        lie.xyzquat_difference(jnp.asarray(pose_prev), jnp.asarray(pose_now))
    )

    # Average velocity = geodesic difference / step_dt, LOCAL frame
    v_avg = np.asarray(qm.compute("avg_vel", st_eval))
    np.testing.assert_allclose(v_avg, diff / env.step_dt, atol=1e-9)

    # Midpoint pose = integrate(-0.5 * diff) back from the end-of-step pose
    mid = np.asarray(qm.compute("avg_pose", st_eval))
    want = np.asarray(
        lie.xyzquat_integrate(jnp.asarray(pose_now), jnp.asarray(-0.5 * diff))
    )
    np.testing.assert_allclose(mid[0:3], want[0:3], atol=1e-9)
    assert abs(float(np.sum(mid[3:7] * want[3:7]))) > 1.0 - 1e-9

    # Carry snapshot after the step holds the end-of-step pose
    np.testing.assert_allclose(
        np.asarray(st2.blocks["quantity_delta"]["_xyzquat::LF_FOOT"]),
        pose_now,
        atol=1e-12,
    )


def test_base_spatial_average_velocity_odometry_frame():
    """`BaseSpatialAverageVelocity` expresses the average base twist in the
    local odometry frame (z world-aligned, x/y local) and
    `BaseOdometryAverageVelocity` selects (vx, vy, wz) from it (reference
    `quantities/locomotion.py:223,292`)."""
    import jax

    from jiminy_tpu.gym.pipeline import ComposedEnv
    from jiminy_tpu.ops import lie
    from jiminy_tpu.quantities import (
        BaseOdometryAverageVelocity,
        BaseSpatialAverageVelocity,
    )
    from jiminy_tpu.quantities.generic import remove_yaw
    from jiminy_tpu.quantities.manager import QuantityManager

    env = make("anymal")
    qm = QuantityManager(env)
    qm["v_base"] = BaseSpatialAverageVelocity()
    qm["v_odom"] = BaseOdometryAverageVelocity()
    cenv = ComposedEnv(env, quantities=qm)
    st, _ = cenv.reset(jax.random.PRNGKey(0))
    q_prev = np.asarray(st.sim.q[0:7])
    st2, *_ = jax.jit(cenv.step)(st, jnp.zeros(env.action_size))
    q_now = np.asarray(st2.sim.q[0:7])

    st_eval = st2.replace(blocks=st.blocks)
    got = np.asarray(qm.compute("v_base", st_eval))

    diff = lie.xyzquat_difference(jnp.asarray(q_prev), jnp.asarray(q_now))
    v_local = np.asarray(diff) / env.step_dt
    mid = lie.xyzquat_integrate(jnp.asarray(q_now), -0.5 * diff)
    quat_no_yaw = remove_yaw(mid[3:7])
    want = np.concatenate(
        [
            np.asarray(lie.quat_rotate(quat_no_yaw, jnp.asarray(v_local[0:3]))),
            np.asarray(lie.quat_rotate(quat_no_yaw, jnp.asarray(v_local[3:6]))),
        ]
    )
    np.testing.assert_allclose(got, want, atol=1e-9)

    odo = np.asarray(qm.compute("v_odom", st_eval))
    np.testing.assert_allclose(odo, [got[3], got[4], got[2]], atol=1e-12)


def test_energy_generation_modes():
    """All four `EnergyGenerationMode`s of `MechanicalPowerConsumption`
    (reference `compute_power`, `quantities/generic.py:1723`)."""
    from jiminy_tpu.quantities import EnergyGenerationMode, MechanicalPowerConsumption

    env, st = _env_state()
    # Force a mixed-sign power distribution via a synthetic motor effort
    vidx = jnp.asarray(env.robot.motors.v_indices, jnp.int32)
    v_m = np.asarray(jnp.take(st.sim.v, vidx, axis=-1) * env.robot.motors.mechanical_reduction)
    rng = np.random.default_rng(3)
    u = rng.normal(size=v_m.shape)
    v_m = rng.normal(size=v_m.shape)
    st = st.replace(sim=st.sim.replace(u_motor=jnp.asarray(u)))
    v_full = np.array(st.sim.v)
    v_full[np.asarray(vidx)] = v_m / np.asarray(env.robot.motors.mechanical_reduction)
    st = st.replace(sim=st.sim.replace(v=jnp.asarray(v_full)))

    power = u * v_m
    cases = {
        EnergyGenerationMode.CHARGE: power.sum(),
        EnergyGenerationMode.LOST_GLOBAL: max(power.sum(), 0.0),
        EnergyGenerationMode.LOST_EACH: np.maximum(power, 0.0).sum(),
        EnergyGenerationMode.PENALIZE: np.abs(power).sum(),
    }
    for mode, want in cases.items():
        got = float(MechanicalPowerConsumption(mode)(env, st))
        np.testing.assert_allclose(got, want, rtol=1e-6)
    assert (
        cases[EnergyGenerationMode.CHARGE]
        <= cases[EnergyGenerationMode.LOST_GLOBAL]
        <= cases[EnergyGenerationMode.LOST_EACH]
        <= cases[EnergyGenerationMode.PENALIZE]
    )
