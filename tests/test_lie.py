"""Unit tests for Lie-group / spatial-algebra primitives.

Oracles: scipy.spatial.transform.Rotation (independent implementation) and
finite-difference checks for Jacobians; algebraic identities for spatial vectors.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial.transform import Rotation as R

from jiminy_tpu.ops import lie

RNG = np.random.default_rng(0)


def random_quats(n):
    q = RNG.normal(size=(n, 4))
    return q / np.linalg.norm(q, axis=-1, keepdims=True)


def test_quat_mul_and_rotate_vs_scipy():
    q1, q2 = random_quats(64), random_quats(64)
    v = RNG.normal(size=(64, 3))
    got = np.asarray(lie.quat_mul(jnp.array(q1), jnp.array(q2)))
    want = (R.from_quat(q1) * R.from_quat(q2)).as_quat()
    # Quaternions are defined up to sign
    sign = np.sign(np.sum(got * want, axis=-1, keepdims=True))
    np.testing.assert_allclose(got, want * sign, atol=1e-12)

    got_v = np.asarray(lie.quat_rotate(jnp.array(q1), jnp.array(v)))
    np.testing.assert_allclose(got_v, R.from_quat(q1).apply(v), atol=1e-12)


def test_quat_mat_round_trip():
    q = random_quats(128)
    m = np.asarray(lie.quat_to_mat(jnp.array(q)))
    np.testing.assert_allclose(m, R.from_quat(q).as_matrix(), atol=1e-12)
    q2 = np.asarray(lie.mat_to_quat(jnp.array(m)))
    sign = np.sign(np.sum(q2 * q, axis=-1, keepdims=True))
    np.testing.assert_allclose(q2, q * sign, atol=1e-9)


def test_exp_log_round_trip():
    # log(exp(w)) == w only holds on |w| < pi: sample inside the injectivity domain
    w = RNG.normal(size=(128, 3))
    w = w / np.linalg.norm(w, axis=-1, keepdims=True) * RNG.uniform(0.0, 3.1, size=(128, 1))
    # include tiny angles
    w[:16] *= 1e-8
    q = np.asarray(lie.exp3(jnp.array(w)))
    np.testing.assert_allclose(q, R.from_rotvec(w).as_quat(), atol=1e-10)
    w2 = np.asarray(lie.log3_quat(jnp.array(q)))
    np.testing.assert_allclose(w2, w, atol=1e-8)
    m = np.asarray(lie.exp3_mat(jnp.array(w)))
    np.testing.assert_allclose(m, R.from_rotvec(w).as_matrix(), atol=1e-10)
    np.testing.assert_allclose(np.asarray(lie.log3_mat(jnp.array(m))), w, atol=1e-8)


def test_jlog3_finite_difference():
    # d/dt log3(R exp(t w_local)) |_{t=0} = Jlog3(log3(R)) @ w_local
    w0 = np.array([0.4, -0.2, 0.7])
    r0 = R.from_rotvec(w0).as_matrix()
    jl = np.asarray(lie.jlog3(jnp.array(w0)))
    eps = 1e-7
    for k in range(3):
        dw = np.zeros(3)
        dw[k] = eps
        r1 = r0 @ R.from_rotvec(dw).as_matrix()
        d = (R.from_matrix(r1).as_rotvec() - w0) / eps
        np.testing.assert_allclose(jl[:, k], d, atol=1e-5)


def test_se3_group_ops():
    q = random_quats(32)
    a = lie.SE3(lie.quat_to_mat(jnp.array(q)), jnp.array(RNG.normal(size=(32, 3))))
    b = lie.SE3(lie.quat_to_mat(jnp.array(random_quats(32))), jnp.array(RNG.normal(size=(32, 3))))
    ab = lie.se3_mul(a, b)
    x = jnp.array(RNG.normal(size=(32, 3)))
    np.testing.assert_allclose(
        np.asarray(lie.se3_apply(ab, x)),
        np.asarray(lie.se3_apply(a, lie.se3_apply(b, x))),
        atol=1e-12,
    )
    ident = lie.se3_mul(a, lie.se3_inv(a))
    np.testing.assert_allclose(np.asarray(ident.rot), np.tile(np.eye(3), (32, 1, 1)), atol=1e-12)
    np.testing.assert_allclose(np.asarray(ident.pos), 0.0, atol=1e-12)


def test_motion_force_duality():
    """<X m, X* f> = <m, f> : power is frame-invariant."""
    a = lie.SE3(lie.quat_to_mat(jnp.array(random_quats(16))), jnp.array(RNG.normal(size=(16, 3))))
    m = jnp.array(RNG.normal(size=(16, 6)))
    f = jnp.array(RNG.normal(size=(16, 6)))
    p1 = jnp.sum(lie.motion_act(a, m) * lie.force_act(a, f), axis=-1)
    p2 = jnp.sum(m * f, axis=-1)
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p2), atol=1e-10)
    # act_inv inverts act
    np.testing.assert_allclose(
        np.asarray(lie.motion_act_inv(a, lie.motion_act(a, m))), np.asarray(m), atol=1e-10
    )
    np.testing.assert_allclose(
        np.asarray(lie.force_act_inv(a, lie.force_act(a, f))), np.asarray(f), atol=1e-10
    )


def test_motion_cross_jacobi():
    m1 = jnp.array(RNG.normal(size=(8, 6)))
    m2 = jnp.array(RNG.normal(size=(8, 6)))
    f = jnp.array(RNG.normal(size=(8, 6)))
    # <m1 x m2, f> = -<m2, m1 x* f>
    lhs = jnp.sum(lie.motion_cross(m1, m2) * f, axis=-1)
    rhs = -jnp.sum(m2 * lie.motion_cross_force(m1, f), axis=-1)
    np.testing.assert_allclose(np.asarray(lhs), np.asarray(rhs), atol=1e-10)


def test_inertia_transform_energy_invariance():
    """Kinetic energy 0.5 m^T I m must be invariant under a change of frame."""
    mass = jnp.array(RNG.uniform(1.0, 5.0, size=(16,)))
    com = jnp.array(RNG.normal(size=(16, 3)))
    a_diag = RNG.uniform(0.5, 2.0, size=(16, 3))
    inertia_c = jnp.array(np.einsum("ni,ij->nij", a_diag, np.eye(3)))
    inertia = lie.spatial_inertia_matrix(mass, com, inertia_c)
    x = lie.SE3(lie.quat_to_mat(jnp.array(random_quats(16))), jnp.array(RNG.normal(size=(16, 3))))
    m_b = jnp.array(RNG.normal(size=(16, 6)))
    m_a = lie.motion_act(x, m_b)
    inertia_a = lie.inertia_transform(x, inertia)
    e_b = jnp.einsum("ni,nij,nj->n", m_b, inertia, m_b)
    e_a = jnp.einsum("ni,nij,nj->n", m_a, inertia_a, m_a)
    np.testing.assert_allclose(np.asarray(e_a), np.asarray(e_b), rtol=1e-9)
    # Symmetry preserved
    np.testing.assert_allclose(
        np.asarray(inertia_a), np.asarray(jnp.swapaxes(inertia_a, -1, -2)), atol=1e-9
    )


def test_rpy_vs_scipy():
    rpy = RNG.normal(size=(32, 3))
    got = np.asarray(lie.rpy_to_mat(jnp.array(rpy)))
    want = R.from_euler("xyz", rpy).as_matrix()
    np.testing.assert_allclose(got, want, atol=1e-12)


def test_float32_small_angle_stability():
    w = jnp.array([[1e-6, 0, 0], [0, 1e-4, 0], [1e-3, 1e-3, 1e-3]], dtype=jnp.float32)
    q = lie.exp3(w)
    assert np.all(np.isfinite(np.asarray(q)))
    w2 = lie.log3_quat(q)
    np.testing.assert_allclose(np.asarray(w2), np.asarray(w), atol=1e-7)
    g = jax.grad(lambda x: jnp.sum(lie.exp3(x)))(jnp.zeros(3, dtype=jnp.float32))
    assert np.all(np.isfinite(np.asarray(g)))


# --------------------------------------------------------------------------- #
# SE(3) exp/log (exp6/log6) and xyzquat geodesic difference/integrate
# --------------------------------------------------------------------------- #


def random_xyzquats(n):
    q = random_quats(n)
    p = RNG.normal(size=(n, 3))
    return np.concatenate([p, q], axis=-1)


def test_exp6_log6_round_trip():
    motion = RNG.normal(size=(64, 6))
    m = lie.exp6(jnp.array(motion))
    back = np.asarray(lie.log6(m))
    np.testing.assert_allclose(back, motion, atol=1e-10)
    # And the other way: random placement -> log6 -> exp6
    pose = random_xyzquats(64)
    se3 = lie.SE3(lie.quat_to_mat(jnp.array(pose[:, 3:7])), jnp.array(pose[:, 0:3]))
    m2 = lie.exp6(lie.log6(se3))
    np.testing.assert_allclose(np.asarray(m2.pos), pose[:, 0:3], atol=1e-10)
    np.testing.assert_allclose(np.asarray(m2.rot), np.asarray(se3.rot), atol=1e-10)


def test_exp6_screw_motion_oracle():
    # Pure rotation about z through angle a, plus axial translation h: the
    # classic screw —  exp6((0,0,a, 0,0,h)) must advance along the screw axis.
    a, h = 0.7, 0.3
    m = lie.exp6(jnp.array([0.0, 0.0, a, 0.0, 0.0, h]))
    np.testing.assert_allclose(
        np.asarray(m.rot), R.from_euler("z", a).as_matrix(), atol=1e-12
    )
    np.testing.assert_allclose(np.asarray(m.pos), [0.0, 0.0, h], atol=1e-12)
    # In-plane translation wraps around the screw axis: |p_xy| = 2 sin(a/2)/a * |v_xy|
    m2 = lie.exp6(jnp.array([0.0, 0.0, a, 1.0, 0.0, 0.0]))
    chord = 2.0 * np.sin(a / 2.0) / a
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(m2.pos)), chord, atol=1e-12
    )


def test_xyzquat_difference_integrate_round_trip():
    prev, now = random_xyzquats(64), random_xyzquats(64)
    diff = lie.xyzquat_difference(jnp.array(prev), jnp.array(now))
    rebuilt = np.asarray(lie.xyzquat_integrate(jnp.array(prev), diff))
    np.testing.assert_allclose(rebuilt[:, 0:3], now[:, 0:3], atol=1e-9)
    dot = np.abs(np.sum(rebuilt[:, 3:7] * now[:, 3:7], axis=-1))
    np.testing.assert_allclose(dot, 1.0, atol=1e-9)


def test_xyzquat_midpoint_is_geodesic_midpoint():
    # Integrating -0.5*diff back from `now` must land at the same pose as
    # integrating +0.5*diff forward from `prev` (geodesic midpoint).
    prev, now = random_xyzquats(32), random_xyzquats(32)
    diff = lie.xyzquat_difference(jnp.array(prev), jnp.array(now))
    mid_b = np.asarray(lie.xyzquat_integrate(jnp.array(now), -0.5 * diff))
    mid_f = np.asarray(lie.xyzquat_integrate(jnp.array(prev), 0.5 * diff))
    np.testing.assert_allclose(mid_b[:, 0:3], mid_f[:, 0:3], atol=1e-9)
    dot = np.abs(np.sum(mid_b[:, 3:7] * mid_f[:, 3:7], axis=-1))
    np.testing.assert_allclose(dot, 1.0, atol=1e-9)


def test_log6_small_motion_linearization():
    # For small displacements the twist reduces to (dtheta, dp_local).
    pose = random_xyzquats(16)
    eps = 1e-6
    dp = RNG.normal(size=(16, 3)) * eps
    now = pose.copy()
    now[:, 0:3] += dp
    diff = np.asarray(
        lie.xyzquat_difference(jnp.array(pose), jnp.array(now))
    )
    rot = R.from_quat(pose[:, 3:7]).as_matrix()
    dp_local = np.einsum("nij,nj->ni", rot.transpose(0, 2, 1), dp)
    np.testing.assert_allclose(diff[:, 0:3], 0.0, atol=1e-12)
    np.testing.assert_allclose(diff[:, 3:6], dp_local, rtol=1e-6, atol=1e-14)
