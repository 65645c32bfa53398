"""Model-level parity of the packaged robots vs the reference asset files.

Every robot in `jiminy_tpu/data/` is the reference's own URDF +
`*_hardware.toml`; these tests assert the loaded models match the raw files
exactly — structure (nq/nv, joint names/types), inertial totals, limits,
actuation and sensing — plus the env-level surgery (Cassie/Digit locked
joints + pushrods, Atlas reduction) against the reference env code
(`gym_jiminy/envs/gym_jiminy/envs/{anymal,cassie,digit,atlas}.py`).
"""

import math
import xml.etree.ElementTree as ET

import numpy as np
import pytest

from jiminy_tpu.envs import assets
from jiminy_tpu.models import joints as jt


def _urdf_joints(name):
    """Independent URDF parse: {joint_name: (type, effort, velocity, lower, upper)}."""
    root = ET.parse(assets.urdf_path(name)).getroot()
    out = {}
    for j in root.findall("joint"):
        t = j.get("type")
        if t == "fixed":
            continue
        lim = j.find("limit")
        eff = vel = math.inf
        lo = hi = None
        if lim is not None:
            if lim.get("effort") is not None:
                eff = float(lim.get("effort"))
            if lim.get("velocity") is not None:
                vel = float(lim.get("velocity"))
            if lim.get("lower") is not None and t in ("revolute", "prismatic"):
                lo, hi = float(lim.get("lower")), float(lim.get("upper"))
        out[j.get("name")] = (t, eff, vel, lo, hi)
    return out


def _urdf_total_mass(name):
    root = ET.parse(assets.urdf_path(name)).getroot()
    return sum(
        float(m.get("value"))
        for link in root.findall("link")
        for m in link.findall("inertial/mass")
    )


_NQ_OF = {"revolute": 1, "prismatic": 1, "continuous": 2}
_NV_OF = {"revolute": 1, "prismatic": 1, "continuous": 1}


@pytest.mark.parametrize(
    "name,freeflyer,locked",
    [
        ("anymal", True, ()),
        ("cassie", True, ("knee_to_shin_left", "knee_to_shin_right")),
        ("digit", True, ("shin_to_tarsus_left", "shin_to_tarsus_right")),
        ("atlas", True, ()),
        ("ant", True, ()),
        ("cartpole", False, ()),
        ("acrobot", False, ()),
    ],
)
def test_model_matches_urdf(name, freeflyer, locked):
    robot = assets.load_robot(name)
    model = robot.model
    ju = _urdf_joints(name)
    movable = {k: v for k, v in ju.items() if k not in locked}

    # nq/nv accounting
    nq = sum(_NQ_OF[v[0]] for v in movable.values()) + (7 if freeflyer else 0)
    nv = sum(_NV_OF[v[0]] for v in movable.values()) + (6 if freeflyer else 0)
    assert model.nq == nq and model.nv == nv

    # Every movable joint present, locked ones folded to frames
    for jn in movable:
        assert jn in model.joint_names
    for jn in locked:
        assert jn not in model.joint_names
        assert jn in model.frame_names

    # Total mass is conserved by fixed-joint folding and locking
    np.testing.assert_allclose(
        float(np.asarray(model.mass).sum()), _urdf_total_mass(name), rtol=1e-12
    )

    # URDF limits land on the right dofs
    for jn, (t, eff, vel, lo, hi) in movable.items():
        j = model.joint_index(jn)
        iv, iq = model.idx_v[j], model.idx_q[j]
        assert float(np.asarray(model.effort_limit)[iv]) == pytest.approx(eff)
        assert float(np.asarray(model.velocity_limit)[iv]) == pytest.approx(vel)
        if lo is not None:
            assert float(np.asarray(model.position_limit_lower)[iq]) == pytest.approx(lo)
            assert float(np.asarray(model.position_limit_upper)[iq]) == pytest.approx(hi)


def _hardware_decls(name, section):
    import tomllib

    with open(assets.hardware_path(name), "rb") as f:
        data = tomllib.load(f)
    out = {}
    for _kind, entries in data.get(section, {}).items():
        for nm, spec in entries.items():
            out[nm] = dict(spec, kind=_kind)
    return out


@pytest.mark.parametrize("name", ["anymal", "cassie", "digit", "atlas", "ant"])
def test_hardware_matches_toml(name):
    robot = assets.load_robot(name)
    motors = _hardware_decls(name, "Motor")
    assert robot.nmotors == len(motors)
    assert set(robot.motors.names) == set(motors)
    for i, mn in enumerate(robot.motors.names):
        spec = motors[mn]
        assert robot.model.joint_names[robot.motors.joint_indices[i]] == spec["joint_name"]
        red = float(np.asarray(robot.motors.mechanical_reduction)[i])
        assert red == pytest.approx(spec.get("mechanicalReduction", 1.0))
        # Armature folds into the extended model at the motor dof
        arm_expected = spec.get("armature", 0.0) * red**2
        iv = robot.motors.v_indices[i]
        assert float(np.asarray(robot.model.armature)[iv]) == pytest.approx(arm_expected)

    import tomllib

    with open(assets.hardware_path(name), "rb") as f:
        glob = tomllib.load(f).get("Global", {})
    # Declared contact frames come first in the registry, in file order
    declared = glob.get("contactFrameNames", [])
    got_names = [robot.model.frame_names[i] for i in robot.contact_frame_indices]
    assert got_names[: len(declared)] == declared


def test_anymal_sensors_and_armature():
    robot = assets.load_robot("anymal")
    s = robot.sensors
    assert len(s.imu.names) == 1 and s.imu.names[0] == "imu_link"
    assert len(s.force.names) == 4
    assert len(s.encoder.names) == 12 and len(s.effort.names) == 12
    # anymal_hardware.toml: armature = 0.1 on all 12 motors, reduction 1
    arm = np.asarray(robot.model.armature)
    assert np.isclose(arm[6:], 0.1).all() and np.isclose(arm[:6], 0.0).all()


def test_cassie_loops_and_contacts():
    robot = assets.load_robot("cassie")
    # Pushrod distance constraints at the reference's exact placements
    # (cassie.py:122-152)
    assert robot.loop_pairs == (
        ("right_pushrod_tarsus", "right_pushrod_hip"),
        ("left_pushrod_tarsus", "left_pushrod_hip"),
    )
    model = robot.model
    f = model.frame_index("right_pushrod_tarsus")
    np.testing.assert_allclose(
        np.asarray(model.fplacement_pos[f]), [-0.12, 0.03, -0.005], atol=1e-12
    )
    f = model.frame_index("left_pushrod_hip")
    np.testing.assert_allclose(
        np.asarray(model.fplacement_pos[f]), [0.0, 0.0, 0.045], atol=1e-12
    )
    parent = model.frame_parents[model.frame_index("left_pushrod_hip")]
    assert model.joint_names[parent] == "hip_flexion_left"
    # 4 contact points per toe, at the bottom face of the visual-mesh OBB
    assert len(robot.contact_frame_indices) == 8
    # Motor reductions from the TOML thread through to the bank
    reds = sorted(set(np.asarray(robot.motors.mechanical_reduction).tolist()))
    assert reds == [16.0, 25.0, 50.0]


def test_atlas_reduced_locks_upper_body():
    full = assets.load_robot("atlas")
    assert full.nv == 36 and full.nmotors == 30
    from jiminy_tpu.envs.bipeds import _atlas_lock_angles

    red = assets.load_robot("atlas", lock_joints=_atlas_lock_angles())
    # 6 dofs per leg + freeflyer
    assert red.nv == 18
    assert all(
        "_leg_" in n for n in red.model.joint_names if n != "root_joint"
    )
    assert red.nmotors == 12
    # Mass is conserved by the reduction
    np.testing.assert_allclose(
        float(np.asarray(red.model.mass).sum()),
        float(np.asarray(full.model.mass).sum()),
        rtol=1e-12,
    )


def test_toy_joint_types():
    cp = assets.load_robot("cartpole", has_freeflyer=False).model
    assert jt.JointType(cp.joint_types[0]) == jt.JointType.PRISMATIC
    assert jt.JointType(cp.joint_types[1]) == jt.JointType.REVOLUTE_UNBOUNDED
    ac = assets.load_robot("acrobot", has_freeflyer=False).model
    assert all(
        jt.JointType(t) == jt.JointType.REVOLUTE_UNBOUNDED for t in ac.joint_types
    )


def test_lock_joint_at_angle_matches_posed_fk():
    """Locking a joint at angle theta must equal running FK with that angle:
    compare a frame's world placement on the full vs reduced model."""
    import jax.numpy as jnp

    from jiminy_tpu.models.urdf import build_model_from_urdf
    from jiminy_tpu.ops.kinematics import forward_kinematics, frame_placement

    urdf = assets.urdf_path("atlas")
    theta = 0.37
    full = build_model_from_urdf(urdf, has_freeflyer=False)
    red = build_model_from_urdf(
        urdf, has_freeflyer=False, lock_joints={"l_arm_elx": theta}
    )
    q_full = np.asarray(full.neutral(), float).copy()
    j = full.joint_index("l_arm_elx")
    q_full[full.idx_q[j]] = theta
    kin_f = forward_kinematics(full, jnp.asarray(q_full))
    kin_r = forward_kinematics(red, red.neutral())
    frame = "l_hand"
    pf = frame_placement(full, kin_f, full.frame_index(frame))
    pr = frame_placement(red, kin_r, red.frame_index(frame))
    np.testing.assert_allclose(np.asarray(pf.pos), np.asarray(pr.pos), atol=1e-12)
    np.testing.assert_allclose(np.asarray(pf.rot), np.asarray(pr.rot), atol=1e-12)


def test_ant_collision_spheres():
    robot = assets.load_robot("ant")
    # torso sphere r=0.25 + two r=0.08 spheres per foot (ant.urdf) as radius-
    # carrying contact points
    radii = sorted(robot.contact_radii)
    assert radii.count(0.25) == 1
    assert radii.count(0.08) == 8
