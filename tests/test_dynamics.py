"""Dynamics-core validation, mirroring the reference's analytic-oracle test strategy
(`python/jiminy_py/unit_py/test_simple_pendulum.py`): closed-form pendulum dynamics,
cross-algorithm consistency (ABA vs CRBA/RNEA), finite-difference Jacobians, and
energy conservation — all in float64 on CPU."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jiminy_tpu.models import JointType, build_model, build_model_from_urdf
from jiminy_tpu.ops import dynamics as dyn
from jiminy_tpu.ops import integrate as integ
from jiminy_tpu.ops import kinematics as kin
from jiminy_tpu.ops import lie

GRAVITY = jnp.array([0.0, 0.0, -9.81])
RNG = np.random.default_rng(42)


# ------------------------------------------------------------------ #
# Model builders
# ------------------------------------------------------------------ #

def pendulum_model(mass=1.5, length=0.8, armature=0.0):
    """Point mass at distance l below a revolute-Y joint."""
    return build_model(
        "pendulum",
        [
            {
                "name": "pivot",
                "type": JointType.REVOLUTE,
                "parent": -1,
                "axis": np.array([0.0, 1.0, 0.0]),
                "mass": mass,
                "com": np.array([0.0, 0.0, -length]),
                "inertia": np.zeros((3, 3)),
                "armature": armature,
            }
        ],
        [{"name": "tip", "parent": 0, "placement": (np.eye(3), np.array([0.0, 0.0, -length]))}],
    )


def random_chain_model(n_joints=5, free_root=False, seed=0):
    rng = np.random.default_rng(seed)
    specs = []
    for i in range(n_joints):
        if i == 0 and free_root:
            t = JointType.FREE
        else:
            t = rng.choice(
                [JointType.REVOLUTE, JointType.PRISMATIC, JointType.SPHERICAL,
                 JointType.REVOLUTE_UNBOUNDED]
            )
        axis = rng.normal(size=3)
        axis /= np.linalg.norm(axis)
        rot = lie.exp3_mat(jnp.array(rng.normal(size=3) * 0.5))
        diag = rng.uniform(0.05, 0.3, size=3)
        com = rng.normal(size=3) * 0.2
        # Parallel-axis-valid inertia about CoM (positive definite, triangle inequality)
        inertia = np.diag(diag + diag.sum())
        specs.append(
            {
                "name": f"j{i}",
                "type": t,
                "parent": i - 1,
                "placement": (np.asarray(rot), rng.normal(size=3) * 0.3),
                "axis": axis,
                "mass": rng.uniform(0.5, 3.0),
                "com": com,
                "inertia": inertia,
                "armature": rng.uniform(0.0, 0.2),
            }
        )
    frames = [
        {"name": "ee", "parent": n_joints - 1, "placement": (np.eye(3), np.array([0.1, 0.0, 0.2]))}
    ]
    return build_model("chain", specs, frames)


def random_state(model, seed=0, scale_v=1.0):
    rng = np.random.default_rng(seed)
    q = np.asarray(model.neutral())
    dq = rng.normal(size=model.nv) * 0.7
    q = np.asarray(integ.integrate(model, jnp.array(q), jnp.array(dq)))
    v = rng.normal(size=model.nv) * scale_v
    return jnp.array(q), jnp.array(v)


# ------------------------------------------------------------------ #
# Closed-form oracles
# ------------------------------------------------------------------ #

def test_pendulum_closed_form():
    m, l = 1.5, 0.8
    model = pendulum_model(m, l)
    for theta in [0.0, 0.3, -1.2, 2.5]:
        q = jnp.array([theta])
        v = jnp.array([0.4])
        tau = jnp.array([0.7])
        qdd = dyn.aba(model, GRAVITY, q, v, tau)
        want = (0.7 - m * 9.81 * l * np.sin(theta)) / (m * l * l)
        np.testing.assert_allclose(float(qdd[0]), want, rtol=1e-10)
        # rnea inverts aba
        tau_back = dyn.rnea(model, GRAVITY, q, v, qdd)
        np.testing.assert_allclose(float(tau_back[0]), 0.7, rtol=1e-10)
        # mass matrix
        mm = dyn.crba(model, q)
        np.testing.assert_allclose(float(mm[0, 0]), m * l * l, rtol=1e-12)


def test_pendulum_armature():
    """Armature adds rotor inertia on the diagonal — matches the reference semantics
    (SimpleMotor armature, validated in reference test_simple_pendulum.py:101)."""
    m, l, j_arm = 1.5, 0.8, 0.25
    model = pendulum_model(m, l, armature=j_arm)
    q, v = jnp.array([0.6]), jnp.array([-0.3])
    tau = jnp.array([1.1])
    qdd = dyn.aba(model, GRAVITY, q, v, tau)
    want = (1.1 - m * 9.81 * l * np.sin(0.6)) / (m * l * l + j_arm)
    np.testing.assert_allclose(float(qdd[0]), want, rtol=1e-10)
    mm = dyn.crba(model, q)
    np.testing.assert_allclose(float(mm[0, 0]), m * l * l + j_arm, rtol=1e-12)
    tau_back = dyn.rnea(model, GRAVITY, q, v, qdd)
    np.testing.assert_allclose(float(tau_back[0]), 1.1, rtol=1e-10)


def test_cartpole_closed_form():
    """Cart (prismatic x) + pole (revolute y) with point mass at tip: classic
    underactuated-dynamics equations."""
    mc, mp, l = 1.0, 0.1, 1.0
    specs = [
        {"name": "slider", "type": JointType.PRISMATIC, "parent": -1,
         "axis": np.array([1.0, 0.0, 0.0]), "mass": mc, "com": np.zeros(3),
         "inertia": np.zeros((3, 3))},
        {"name": "hinge", "type": JointType.REVOLUTE, "parent": 0,
         "axis": np.array([0.0, 1.0, 0.0]), "mass": mp,
         "com": np.array([0.0, 0.0, l]), "inertia": np.zeros((3, 3))},
    ]
    model = build_model("cartpole", specs)
    theta, thetad, f = 0.5, 0.8, 0.3
    q = jnp.array([0.2, theta])
    v = jnp.array([0.1, thetad])
    tau = jnp.array([f, 0.0])
    qdd = np.asarray(dyn.aba(model, GRAVITY, q, v, tau))
    # Lagrangian closed form (mass above the pivot at +l z rotated about y):
    # x_p = x + l sin(th), z_p = l cos(th)
    g = 9.81
    m11 = mc + mp
    m12 = mp * l * np.cos(theta)
    m22 = mp * l * l
    c1 = -mp * l * thetad**2 * np.sin(theta)
    c2 = 0.0
    g2 = -mp * g * l * np.sin(theta)
    mmat = np.array([[m11, m12], [m12, m22]])
    rhs = np.array([f - c1, 0.0 - c2 - g2])
    want = np.linalg.solve(mmat, rhs)
    np.testing.assert_allclose(qdd, want, rtol=1e-9)


# ------------------------------------------------------------------ #
# Cross-algorithm consistency on random models
# ------------------------------------------------------------------ #

@pytest.mark.parametrize("free_root", [False, True])
@pytest.mark.parametrize("seed", [0, 1])
def test_aba_crba_rnea_consistency(free_root, seed):
    model = random_chain_model(5, free_root=free_root, seed=seed)
    q, v = random_state(model, seed)
    tau = jnp.array(RNG.normal(size=model.nv))
    mm = dyn.crba(model, q)
    # M must be symmetric positive definite
    np.testing.assert_allclose(np.asarray(mm), np.asarray(mm).T, atol=1e-10)
    assert np.all(np.linalg.eigvalsh(np.asarray(mm)) > 0)
    nle = dyn.nonlinear_effects(model, GRAVITY, q, v)
    qdd_aba = dyn.aba(model, GRAVITY, q, v, tau)
    qdd_chol = jnp.linalg.solve(mm, tau - nle)
    np.testing.assert_allclose(np.asarray(qdd_aba), np.asarray(qdd_chol), rtol=2e-8, atol=1e-9)
    # RNEA inverts ABA
    tau_back = dyn.rnea(model, GRAVITY, q, v, qdd_aba)
    np.testing.assert_allclose(np.asarray(tau_back), np.asarray(tau), rtol=1e-7, atol=1e-9)
    # CRBA columns == RNEA(q, 0, e_i) - gravity term
    tau0 = dyn.rnea(model, GRAVITY, q, jnp.zeros(model.nv), jnp.zeros(model.nv))
    for k in range(model.nv):
        e_k = jnp.zeros(model.nv).at[k].set(1.0)
        col = dyn.rnea(model, GRAVITY, q, jnp.zeros(model.nv), e_k) - tau0
        np.testing.assert_allclose(np.asarray(col), np.asarray(mm[:, k]), rtol=1e-7, atol=1e-10)


def test_external_forces():
    """A wrench applied to the end joint must enter dynamics as J^T f."""
    model = random_chain_model(4, seed=3)
    q, v = random_state(model, 3)
    kd = kin.forward_kinematics(model, q, v)
    jac_w = kin.joint_space_jacobian(model, kd)
    last = model.njoints - 1
    # Random LOCAL wrench at the last joint origin
    f_local = jnp.array(RNG.normal(size=6))
    omi = lie.SE3(kd.omi.rot[last], kd.omi.pos[last])
    fext = jnp.zeros((model.njoints, 6)).at[last].set(f_local)
    tau_with = dyn.rnea(model, GRAVITY, q, v, jnp.zeros(model.nv), fext)
    tau_without = dyn.rnea(model, GRAVITY, q, v, jnp.zeros(model.nv))
    # The dual representation matching `joint_space_jacobian` columns (world motions
    # at the world origin) is the wrench expressed about the world origin:
    f_at_world_origin = lie.force_act(omi, f_local)
    want = tau_without - jac_w.T @ f_at_world_origin
    np.testing.assert_allclose(np.asarray(tau_with), np.asarray(want), rtol=1e-8, atol=1e-10)


# ------------------------------------------------------------------ #
# Kinematics: Jacobians by finite differences
# ------------------------------------------------------------------ #

def test_frame_jacobian_finite_difference():
    model = random_chain_model(5, free_root=True, seed=7)
    q, v = random_state(model, 11)
    fidx = model.frame_index("ee")
    kd = kin.forward_kinematics(model, q, v)
    jac_w = kin.joint_space_jacobian(model, kd)
    jac_f = kin.frame_jacobian_world_aligned(model, kd, jac_w, fidx)
    eps = 1e-7
    pos0 = kin.frame_placement(model, kd, fidx).pos
    rot0 = kin.frame_placement(model, kd, fidx).rot
    for k in range(model.nv):
        dq = jnp.zeros(model.nv).at[k].set(eps)
        q1 = integ.integrate(model, q, dq)
        kd1 = kin.forward_kinematics(model, q1)
        pos1 = kin.frame_placement(model, kd1, fidx).pos
        rot1 = kin.frame_placement(model, kd1, fidx).rot
        dlin = (pos1 - pos0) / eps
        dang = lie.log3_mat(lie.mm(rot1, jnp.swapaxes(rot0, -1, -2))) / eps
        np.testing.assert_allclose(np.asarray(jac_f[3:, k]), np.asarray(dlin), atol=1e-5)
        np.testing.assert_allclose(np.asarray(jac_f[:3, k]), np.asarray(dang), atol=1e-5)


def test_frame_velocity_vs_jacobian():
    model = random_chain_model(6, free_root=True, seed=5)
    q, v = random_state(model, 13)
    kd = kin.forward_kinematics(model, q, v)
    jac_w = kin.joint_space_jacobian(model, kd)
    fidx = model.frame_index("ee")
    jac_f = kin.frame_jacobian_world_aligned(model, kd, jac_w, fidx)
    v_frame = kin.frame_velocity_world_aligned(model, kd, fidx)
    np.testing.assert_allclose(np.asarray(jac_f @ v), np.asarray(v_frame), rtol=1e-9, atol=1e-12)


# ------------------------------------------------------------------ #
# Integrate / difference round trips
# ------------------------------------------------------------------ #

def test_integrate_difference_round_trip():
    model = random_chain_model(6, free_root=True, seed=9)
    q0, _ = random_state(model, 17)
    dv = jnp.array(RNG.normal(size=model.nv) * 0.5)
    q1 = integ.integrate(model, q0, dv)
    dv_back = integ.difference(model, q0, q1)
    np.testing.assert_allclose(np.asarray(dv_back), np.asarray(dv), rtol=1e-8, atol=1e-10)
    # difference(q, q) == 0, integrate(q, 0) == q
    np.testing.assert_allclose(
        np.asarray(integ.difference(model, q0, q0)), 0.0, atol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(integ.integrate(model, q0, jnp.zeros(model.nv))), np.asarray(q0), atol=1e-12
    )


def test_freeflyer_velocity_consistency():
    """d/dt q == lim (integrate(q, v dt) - q)/dt must match FK velocity convention.

    Uses an identity root placement so the configuration translation is directly the
    world position (a non-identity attach frame would shift conventions)."""
    model = build_model(
        "ff",
        [{"name": "root", "type": JointType.FREE, "parent": -1, "mass": 1.0,
          "com": np.zeros(3), "inertia": np.eye(3) * 0.1}],
    )
    q, v = random_state(model, 23)
    dt = 1e-7
    q1 = integ.integrate(model, q, v * dt)
    kd = kin.forward_kinematics(model, q, v)
    # world velocity of the root joint from FK
    v_root_local = kd.vel[0]
    rot = kd.omi.rot[0]
    p0, p1 = q[:3], q1[:3]
    v_lin_world_fd = (p1 - p0) / dt
    v_lin_world_fk = lie.mv(rot, v_root_local[3:])
    np.testing.assert_allclose(np.asarray(v_lin_world_fd), np.asarray(v_lin_world_fk), atol=1e-5)


# ------------------------------------------------------------------ #
# Energy conservation
# ------------------------------------------------------------------ #

def test_energy_conservation_rk4():
    """Unactuated chain in gravity, fine RK4: total energy drift must be tiny —
    the reference's engine sanity check (core/unit/engine_sanity_check.cc:45)."""
    model = random_chain_model(3, free_root=False, seed=31)
    q, v = random_state(model, 37, scale_v=0.3)

    def f(q, v):
        return dyn.aba(model, GRAVITY, q, v, jnp.zeros(model.nv))

    @jax.jit
    def rk4_step(q, v, dt):
        k1v = f(q, v)
        q2 = integ.integrate(model, q, v * (dt / 2))
        v2 = v + k1v * (dt / 2)
        k2v = f(q2, v2)
        q3 = integ.integrate(model, q, v2 * (dt / 2))
        v3 = v + k2v * (dt / 2)
        k3v = f(q3, v3)
        q4 = integ.integrate(model, q, v3 * dt)
        v4 = v + k3v * dt
        k4v = f(q4, v4)
        dq = (v + 2 * v2 + 2 * v3 + v4) * (dt / 6)
        dv = (k1v + 2 * k2v + 2 * k3v + k4v) * (dt / 6)
        return integ.integrate(model, q, dq), v + dv

    e0 = float(dyn.kinetic_energy(model, q, v) + dyn.potential_energy(model, GRAVITY, q))
    dt = 1e-4
    for _ in range(200):
        q, v = rk4_step(q, v, dt)
    e1 = float(dyn.kinetic_energy(model, q, v) + dyn.potential_energy(model, GRAVITY, q))
    assert abs(e1 - e0) < 1e-8 * max(1.0, abs(e0))


# ------------------------------------------------------------------ #
# vmap / batching consistency
# ------------------------------------------------------------------ #

def test_vmap_matches_single():
    model = random_chain_model(4, free_root=True, seed=41)
    qs, vs = [], []
    for s in range(8):
        q, v = random_state(model, 100 + s)
        qs.append(q)
        vs.append(v)
    qb, vb = jnp.stack(qs), jnp.stack(vs)
    taub = jnp.array(RNG.normal(size=(8, model.nv)))
    qdd_b = jax.vmap(lambda q, v, tau: dyn.aba(model, GRAVITY, q, v, tau))(qb, vb, taub)
    for s in range(8):
        qdd_s = dyn.aba(model, GRAVITY, qs[s], vs[s], taub[s])
        np.testing.assert_allclose(np.asarray(qdd_b[s]), np.asarray(qdd_s), rtol=1e-12)


# ------------------------------------------------------------------ #
# URDF parsing
# ------------------------------------------------------------------ #

PENDULUM_URDF = """<?xml version="1.0"?>
<robot name="pend">
  <link name="world"/>
  <joint name="pivot" type="revolute">
    <origin xyz="0 0 2" rpy="0 0 0"/>
    <axis xyz="0 1 0"/>
    <parent link="world"/><child link="arm"/>
    <limit lower="-3" upper="3" effort="10" velocity="20"/>
  </joint>
  <link name="arm">
    <inertial>
      <origin xyz="0 0 -0.8"/><mass value="1.5"/>
      <inertia ixx="0" ixy="0" ixz="0" iyy="0" iyz="0" izz="0"/>
    </inertial>
  </link>
  <joint name="tip_joint" type="fixed">
    <origin xyz="0 0 -1.6"/><parent link="arm"/><child link="tip"/>
  </joint>
  <link name="tip">
    <inertial><mass value="0.5"/>
      <inertia ixx="0.01" ixy="0" ixz="0" iyy="0.01" iyz="0" izz="0.01"/>
    </inertial>
  </link>
</robot>
"""


def test_urdf_pendulum():
    model = build_model_from_urdf(PENDULUM_URDF)
    assert model.nq == model.nv == 1
    assert model.joint_names == ("pivot",)
    # fixed-link inertia merged: masses sum
    np.testing.assert_allclose(float(model.mass[0]), 2.0)
    # merged CoM: (1.5*(-0.8) + 0.5*(-1.6)) / 2
    np.testing.assert_allclose(float(model.com[0, 2]), (1.5 * -0.8 + 0.5 * -1.6) / 2.0)
    # frames exist for links and the fixed joint
    for f in ("arm", "tip", "tip_joint"):
        assert f in model.frame_names
    # limits picked up
    np.testing.assert_allclose(float(model.position_limit_lower[0]), -3.0)
    np.testing.assert_allclose(float(model.effort_limit[0]), 10.0)
    # closed form check including merged inertia
    q, v = jnp.array([0.4]), jnp.array([0.0])
    qdd = dyn.aba(model, GRAVITY, q, v, jnp.zeros(1))
    inertia_tot = 1.5 * 0.8**2 + 0.5 * 1.6**2 + 0.01
    want = -(1.5 * 0.8 + 0.5 * 1.6) * 9.81 * np.sin(0.4) / inertia_tot
    np.testing.assert_allclose(float(qdd[0]), want, rtol=1e-10)


def test_urdf_reference_assets():
    """Load the real reference robot descriptions (public data, mounted read-only)."""
    import os

    base = "/root/reference/data"
    if not os.path.isdir(base):
        pytest.skip("reference assets not available")
    cart = build_model_from_urdf(f"{base}/toys_models/cartpole/cartpole.urdf")
    assert cart.nq == 3 and cart.nv == 2  # prismatic + continuous(cos/sin)
    anymal = build_model_from_urdf(
        f"{base}/quadrupedal_robots/anymal/anymal.urdf", has_freeflyer=True
    )
    assert anymal.nq == 7 + 12 and anymal.nv == 6 + 12
    for foot in ("LF_FOOT", "LH_FOOT", "RF_FOOT", "RH_FOOT"):
        assert foot in anymal.frame_names
    # Physically sane: total mass ~ tens of kg, SPD mass matrix at neutral
    total_mass = float(jnp.sum(anymal.mass))
    assert 15.0 < total_mass < 80.0
    mm = dyn.crba(anymal, anymal.neutral())
    assert np.all(np.linalg.eigvalsh(np.asarray(mm)) > 0)


def test_pose_velocity_conversions_vs_scipy():
    """SE3/XYZRPY/XYZQuat conversion helpers match scipy and invert exactly
    (reference `jiminy_py/dynamics.py:38-93`, same names)."""
    import jax.numpy as jnp
    from scipy.spatial.transform import Rotation as R

    import jiminy_tpu.dynamics as d

    rng = np.random.default_rng(5)
    xyzrpy = rng.normal(size=(32, 6))
    xyzrpy[:, 4] = np.clip(xyzrpy[:, 4], -1.4, 1.4)  # away from gimbal lock
    xq = np.array(d.XYZRPYToXYZQuat(jnp.asarray(xyzrpy)))
    np.testing.assert_allclose(
        np.array(d.XYZQuatToXYZRPY(jnp.asarray(xq))), xyzrpy, atol=1e-10
    )
    want = R.from_euler("xyz", xyzrpy[:, 3:6]).as_quat()
    sign = np.sign(np.sum(xq[:, 3:7] * want, axis=-1, keepdims=True))
    np.testing.assert_allclose(xq[:, 3:7], want * sign, atol=1e-12)
    # SE3 round trip
    m = d.XYZRPYToSE3(jnp.asarray(xyzrpy))
    np.testing.assert_allclose(
        np.array(d.SE3ToXYZRPY(m)), xyzrpy, atol=1e-10
    )

    # Velocity conversions: inverse pair + finite-difference oracle
    dxyzrpy = rng.normal(size=(32, 6))
    v = np.array(d.velocityXYZRPYToXYZQuat(jnp.asarray(xyzrpy), jnp.asarray(dxyzrpy)))
    np.testing.assert_allclose(
        np.array(d.velocityXYZQuatToXYZRPY(jnp.asarray(xq), jnp.asarray(v))),
        dxyzrpy, atol=1e-9,
    )
    eps = 1e-7
    q2 = np.array(d.XYZRPYToXYZQuat(jnp.asarray(xyzrpy + eps * dxyzrpy)))[:, 3:7]
    w_fd = np.stack([
        (R.from_quat(a).inv() * R.from_quat(b)).as_rotvec()
        for a, b in zip(xq[:, 3:7].copy(), q2.copy())
    ]) / eps
    np.testing.assert_allclose(v[:, 3:6], w_fd, rtol=1e-4, atol=1e-6)


def test_get_body_world_transform_velocity():
    import jax
    import jax.numpy as jnp

    from jiminy_tpu import dynamics as d
    from jiminy_tpu.envs import make

    env = make("anymal")
    st, _ = env.reset(jax.random.PRNGKey(0))
    m = d.get_body_world_transform(env.robot, st.sim.q, "LF_FOOT")
    assert np.asarray(m.pos).shape == (3,)
    assert abs(float(np.linalg.det(np.asarray(m.rot))) - 1.0) < 1e-9
    v6 = d.get_body_world_velocity(env.robot, st.sim.q, st.sim.v, "LF_FOOT")
    assert np.asarray(v6).shape == (6,)
    a6 = d.get_body_world_acceleration(
        env.robot, st.sim.q, st.sim.v, jnp.zeros_like(st.sim.v), "LF_FOOT"
    )
    assert np.isfinite(np.asarray(a6)).all()


def test_compute_transform_contact_touches_ground():
    """The correction transform drops the deepest contact point exactly onto
    the ground (reference `compute_transform_contact`, `dynamics.py:628`)."""
    import jax
    import jax.numpy as jnp

    from jiminy_tpu import dynamics as d
    from jiminy_tpu.envs import make
    from jiminy_tpu.ops import lie
    from jiminy_tpu.ops.kinematics import forward_kinematics, frame_placement

    env = make("anymal")
    st, _ = env.reset(jax.random.PRNGKey(0))
    # Lift and tilt the robot so contacts are off the ground
    q = np.array(st.sim.q)
    q[2] += 0.17
    q = jnp.asarray(q)
    m = d.compute_transform_contact(env.robot, q)

    # Apply the transform to the freeflyer and recheck the contact heights
    base = lie.SE3(lie.quat_to_mat(q[3:7]), q[0:3])
    newb = lie.se3_mul(m, base)
    q2 = jnp.concatenate([newb.pos, lie.mat_to_quat(newb.rot), q[7:]])
    model = env.robot.model
    kin = forward_kinematics(model, q2)
    z = [float(frame_placement(model, kin, f).pos[2])
         for f in env.robot.contact_frame_indices]
    assert min(z) > -1e-9  # nothing through the ground
    assert min(z) < 1e-6  # and the deepest point touches


def test_compute_efforts_from_fixed_body_supports_weight():
    """Static robot welded at a foot: the support wrench carries the full
    weight and gravity torques match plain RNEA (reference
    `compute_efforts_from_fixed_body`, `dynamics.py:876`)."""
    import jax
    import jax.numpy as jnp

    from jiminy_tpu import dynamics as d
    from jiminy_tpu.envs import make

    env = make("anymal")
    st, _ = env.reset(jax.random.PRNGKey(0))
    q = st.sim.q
    zeros = jnp.zeros_like(st.sim.v)
    tau, f_sup = d.compute_efforts_from_fixed_body(
        env.robot, q, zeros, zeros, "LF_FOOT"
    )
    total_weight = float(np.sum(np.asarray(env.robot.model.mass)) * 9.81)
    # Support force magnitude equals the weight (static equilibrium);
    # spatial force layout is (torque, force)
    f_lin = np.asarray(f_sup)[3:6]
    np.testing.assert_allclose(np.linalg.norm(f_lin), total_weight, rtol=1e-9)
    # Freeflyer effort must vanish: the support force balances gravity
    np.testing.assert_allclose(np.asarray(tau)[0:6], 0.0, atol=1e-8)
