"""Theoretical <-> extended state mapping (reference `model.h:366-373`,
getExtendedPositionFromTheoretical & co.) and world-wrench -> joint-frame
conversion (reference `utilities/pinocchio.cc:794-809`)."""

import jax.numpy as jnp
import numpy as np

from jiminy_tpu.dynamics import convert_force_global_frame_to_joint
from jiminy_tpu.engine import Robot
from jiminy_tpu.models import JointType, build_model
from jiminy_tpu.ops.kinematics import forward_kinematics, frame_placement


def _arm_model():
    return build_model(
        "arm",
        [
            {
                "name": "shoulder",
                "type": JointType.REVOLUTE,
                "parent": -1,
                "axis": np.array([0.0, 1.0, 0.0]),
                "mass": 1.0,
                "com": np.array([0.0, 0.0, -0.5]),
                "inertia": np.eye(3) * 0.05,
            },
            {
                "name": "elbow",
                "type": JointType.REVOLUTE,
                "parent": 0,
                "axis": np.array([0.0, 1.0, 0.0]),
                "placement": (np.eye(3), np.array([0.0, 0.0, -1.0])),
                "mass": 0.5,
                "com": np.array([0.0, 0.0, -0.25]),
                "inertia": np.eye(3) * 0.02,
            },
        ],
        [
            {"name": "tip", "parent": 1,
             "placement": (np.eye(3), np.array([0.0, 0.0, -0.5]))},
        ],
    )


def _flexible_backlash_robot():
    return Robot.build(
        _arm_model(),
        motors=[{"joint_name": "elbow", "backlash": 0.02}],
        flexibility=[{"joint_name": "elbow", "stiffness": [50.0] * 3,
                      "damping": [1.0] * 3, "inertia": [1e-3] * 3}],
    )


def test_extended_model_is_larger():
    robot = _flexible_backlash_robot()
    th, ext = robot.theoretical_model, robot.model
    # flexibility: +4 q (quaternion) +3 v; backlash: +1 q +1 v
    assert ext.nq == th.nq + 5
    assert ext.nv == th.nv + 4


def test_position_round_trip():
    robot = _flexible_backlash_robot()
    q_th = jnp.array([0.3, -0.7])
    q_ext = robot.extended_position_from_theoretical(q_th)
    assert q_ext.shape == (robot.model.nq,)
    # original coordinates preserved at their extended slots
    ext = robot.model
    for nm, val in (("shoulder", 0.3), ("elbow", -0.7)):
        np.testing.assert_allclose(
            float(q_ext[ext.idx_q[ext.joint_index(nm)]]), val, atol=1e-12
        )
    # flexibility quaternion slot at identity (w = 1)
    jf = ext.joint_index("elbow_flexibility")
    np.testing.assert_allclose(
        np.asarray(q_ext[ext.idx_q[jf] : ext.idx_q[jf] + 4]),
        [0.0, 0.0, 0.0, 1.0], atol=1e-12,
    )
    back = robot.theoretical_position_from_extended(q_ext)
    np.testing.assert_allclose(np.asarray(back), np.asarray(q_th), atol=1e-12)
    # neutral extended state maps from neutral theoretical state
    np.testing.assert_allclose(
        np.asarray(robot.extended_position_from_theoretical(
            robot.theoretical_model.neutral())),
        np.asarray(robot.model.neutral()),
        atol=1e-12,
    )


def test_velocity_round_trip_batched():
    robot = _flexible_backlash_robot()
    v_th = jnp.arange(8.0).reshape(4, 2)
    v_ext = robot.extended_velocity_from_theoretical(v_th)
    assert v_ext.shape == (4, robot.model.nv)
    back = robot.theoretical_velocity_from_extended(v_ext)
    np.testing.assert_allclose(np.asarray(back), np.asarray(v_th), atol=1e-12)
    # extended-only dofs are at rest
    assert float(jnp.abs(v_ext).sum()) == float(jnp.abs(v_th).sum())


def test_identity_when_no_extension():
    robot = Robot.build(_arm_model())
    q = jnp.array([0.1, 0.2])
    np.testing.assert_array_equal(
        np.asarray(robot.extended_position_from_theoretical(q)), np.asarray(q)
    )
    np.testing.assert_array_equal(
        np.asarray(robot.theoretical_velocity_from_extended(q)), np.asarray(q)
    )


def test_convert_force_global_frame_to_joint():
    model = _arm_model()
    q = jnp.array([0.4, -0.9])
    kin = forward_kinematics(model, q)
    fidx = model.frame_index("tip")
    parent = model.frame_parents[fidx]

    f_world = jnp.array([0.1, -0.2, 0.3, 2.0, -1.0, 0.5])  # (ang, lin)
    w_local = convert_force_global_frame_to_joint(model, "tip", f_world, q=q)

    # Oracle: shift the world wrench to the joint origin, rotate into the
    # joint frame (equivalent formulation with the world-frame lever).
    rot_j = np.asarray(kin.omi.rot[parent])
    pos_j = np.asarray(kin.omi.pos[parent])
    pos_f = np.asarray(frame_placement(model, kin, fidx).pos)
    f_w = np.asarray(f_world[3:6])
    tau_w = np.asarray(f_world[0:3]) + np.cross(pos_f - pos_j, f_w)
    np.testing.assert_allclose(np.asarray(w_local[0:3]), rot_j.T @ tau_w, atol=1e-10)
    np.testing.assert_allclose(np.asarray(w_local[3:6]), rot_j.T @ f_w, atol=1e-10)

    # Accepts a frame index and a precomputed kin; batch-transparent
    w2 = convert_force_global_frame_to_joint(
        model, fidx, jnp.broadcast_to(f_world, (3, 6)), kin=kin
    )
    np.testing.assert_allclose(np.asarray(w2), np.broadcast_to(w_local, (3, 6)),
                               atol=1e-12)
