"""Hardware description files: TOML declaration of motors/sensors/contacts.

Reference equivalents: `jiminy_py.robot.load_hardware_description_file`
(`robot.py:518`) and `generate_default_hardware_description_file` (`robot.py:128`).

Schema::

    has_freeflyer = true

    [Global]
    contact_frames = ["LF_FOOT", ...]
    collision_bodies = ["l_foot", ...]   # link names; geometry from the URDF
    loop_constraints = [["frame_a", "frame_b"], ...]

    [Motor.SimpleMotor.LF_HAA]
    joint_name = "LF_HAA"
    mechanical_reduction = 50.0
    armature = 1e-4

    [Sensor.ImuSensor.base_imu]
    frame_name = "base"

    [Sensor.EncoderSensor.LF_HAA]
    motor_name = "LF_HAA"

    [Flexibility.LF_KFE]
    joint_name = "LF_KFE"
    stiffness = 1e4
    damping = 100.0
    inertia = 1e-3
"""

from __future__ import annotations

import xml.etree.ElementTree as ET
from typing import Optional

_SENSOR_KIND = {
    "ImuSensor": "imu",
    "EncoderSensor": "encoder",
    "EffortSensor": "effort",
    "ContactSensor": "contact",
    "ForceSensor": "force",
}

# The reference's hardware TOMLs use camelCase motor option names matching its
# `SimpleMotor` options struct (`core/include/jiminy/core/hardware/
# basic_motors.h`, files e.g. `data/bipedal_robots/cassie/
# cassie_hardware.toml`); map them onto `build_motor_bank` spec keys.  The
# semantics are identical (same sign conventions: friction coefficients are
# negative and *added*, `basic_motors.cc:100-143`).
_MOTOR_KEY_MAP = {
    "mechanicalReduction": "mechanical_reduction",
    "effortLimit": "effort_limit",
    "velocityLimit": "velocity_limit",
    "enableEffortLimit": "enable_effort_limit",
    "enableVelocityLimit": "enable_velocity_limit",
    "velocityEffortInvSlope": "velocity_effort_inv_slope",
    "enableFriction": "enable_friction",
    "frictionViscousPositive": "friction_viscous_pos",
    "frictionViscousNegative": "friction_viscous_neg",
    "frictionDryPositive": "friction_dry_pos",
    "frictionDryNegative": "friction_dry_neg",
    "frictionDrySlope": "friction_dry_slope",
    "enableBacklash": "enable_backlash",
    "backlash": "backlash",
}


def load_hardware_description_file(path: str) -> dict:
    """Parse a `*_hardware.toml` into Robot.build keyword arguments.

    Accepts both this package's snake_case schema (docstring above) and the
    reference's native schema (`contactFrameNames`/`collisionBodyNames`
    globals + camelCase motor options) so the reference's own asset files
    (vendored under `jiminy_tpu/data/`) load unmodified
    (reference `jiminy_py.robot.load_hardware_description_file`,
    `robot.py:518`)."""
    import tomllib

    with open(path, "rb") as f:
        data = tomllib.load(f)
    out: dict = {
        "motors": [],
        "sensors": {},
        "contact_frames": [],
        "collision_bodies": [],
        "flexibility": [],
        "loop_constraints": [],
        "extra": {},
    }
    # Only propagate has_freeflyer when the file actually declares it (the
    # reference TOMLs don't — the env passes it to the URDF builder instead)
    if "has_freeflyer" in data:
        out["has_freeflyer"] = bool(data["has_freeflyer"])
    glob = dict(data.get("Global", {}))
    out["contact_frames"] = list(
        glob.pop("contact_frames", None) or glob.pop("contactFrameNames", [])
    )
    out["loop_constraints"] = [tuple(p) for p in glob.pop("loop_constraints", [])]
    # Link names whose URDF <collision> geometry becomes ground contact points
    # (reference `collisionBodyNames`, jiminy_py/robot.py:518); inline-table
    # primitive specs are passed through as-is.
    out["collision_bodies"] = list(
        glob.pop("collision_bodies", None) or glob.pop("collisionBodyNames", [])
    )
    # Remaining globals (e.g. sensorsUpdatePeriod/controllerUpdatePeriod) are
    # surfaced for the caller, like the reference's `extra_info` return.
    out["extra"] = glob

    for _kind, motors in data.get("Motor", {}).items():
        for name, spec in motors.items():
            spec = {_MOTOR_KEY_MAP.get(k, k): v for k, v in spec.items()}
            spec.setdefault("name", name)
            spec.setdefault("joint_name", name)
            # Backlash joints are inserted iff the play is > 0; the reference
            # gates the value behind an enableBacklash flag instead.
            if not spec.pop("enable_backlash", True):
                spec.pop("backlash", None)
            out["motors"].append(spec)

    for sensor_type, sensors in data.get("Sensor", {}).items():
        kind = _SENSOR_KIND.get(sensor_type)
        if kind is None:
            raise ValueError(f"unknown sensor type {sensor_type}")
        lst = out["sensors"].setdefault(kind, [])
        for name, spec in sensors.items():
            spec = dict(spec)
            spec.setdefault("name", name)
            lst.append(spec)

    for name, spec in data.get("Flexibility", {}).items():
        spec = dict(spec)
        spec.setdefault("joint_name", name)
        out["flexibility"].append(spec)
    return out


def generate_default_hardware_description_file(
    urdf_path: str, output_path: Optional[str] = None, verbose: bool = False
) -> str:
    """Generate a default hardware TOML from a URDF: one SimpleMotor + encoder +
    effort sensor per actuated joint, an IMU on the root link, contact points on
    leaf links (reference `generate_default_hardware_description_file`)."""
    root = ET.parse(urdf_path).getroot()
    lines = ["has_freeflyer = false", "", "[Global]"]
    joints = [
        j for j in root.findall("joint") if j.get("type") in ("revolute", "prismatic", "continuous")
    ]
    # Leaf links = candidates for contact frames
    parents = {j.find("parent").get("link") for j in root.findall("joint")}
    links = [ln.get("name") for ln in root.findall("link")]
    leaves = [ln for ln in links if ln not in parents]
    lines.append("contact_frames = [" + ", ".join(f'"{ln}"' for ln in leaves) + "]")
    lines.append("")
    for j in joints:
        name = j.get("name")
        lines += [f"[Motor.SimpleMotor.{name}]", f'joint_name = "{name}"',
                  "mechanical_reduction = 1.0", ""]
        lines += [f"[Sensor.EncoderSensor.{name}]", f'motor_name = "{name}"', ""]
        lines += [f"[Sensor.EffortSensor.{name}]", f'motor_name = "{name}"', ""]
    if links:
        lines += [f"[Sensor.ImuSensor.{links[0]}]", f'frame_name = "{links[0]}"', ""]
    text = "\n".join(lines)
    if output_path is None:
        import os

        output_path = os.path.splitext(urdf_path)[0] + "_hardware.toml"
    with open(output_path, "w") as f:
        f.write(text)
    return output_path


def BaseJiminyRobot(
    urdf_path: str,
    hardware_path: str = None,
    has_freeflyer: bool = False,
    **robot_kwargs,
):
    """Reference-name constructor (reference `BaseJiminyRobot`,
    `jiminy_py/robot.py:850`): build a `Robot` from a URDF plus its
    `*_hardware.toml` (auto-discovered next to the URDF when not given),
    exactly like `Simulator.build` does internally."""
    import os

    from jiminy_tpu.engine.robot import Robot

    if hardware_path is None:
        guess = os.path.splitext(urdf_path)[0] + "_hardware.toml"
        hardware_path = guess if os.path.exists(guess) else None
    hw = load_hardware_description_file(hardware_path) if hardware_path else {}
    return Robot.build(
        urdf_path,
        has_freeflyer=hw.get("has_freeflyer", has_freeflyer),
        motors=hw.get("motors", ()),
        sensors=hw.get("sensors", None),
        contact_frames=hw.get("contact_frames", ()),
        collision_bodies=hw.get("collision_bodies", ()),
        flexibility=hw.get("flexibility", ()),
        loop_constraints=hw.get("loop_constraints", ()),
        **robot_kwargs,
    )
