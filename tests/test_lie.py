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
