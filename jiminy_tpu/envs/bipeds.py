"""Biped/humanoid environments: Cassie, Digit, Atlas (+ reduced / PD variants).

The robots are the reference's actual URDF + hardware-TOML assets
(`jiminy_tpu/data/bipedal_robots/`, vendored from the reference's
`gym_jiminy/envs/.../data/`), assembled by `envs.assets.load_robot`:
Cassie/Digit with the passive shin joints folded away and the pushrod loop
closures as distance constraints (reference `cassie.py:67-161`,
`digit.py:85-201`), Atlas with foot-box corner contact points pruned to the
support hull (`atlas.py:100-112`).  ``procedural=True`` switches to the
parametric look-alike builders (`envs/builders_bipeds.py`).
"""

from __future__ import annotations

import math

import numpy as np

from jiminy_tpu.envs import assets
from jiminy_tpu.envs import builders_bipeds as bb
from jiminy_tpu.envs.locomotion import WalkerEnv
from jiminy_tpu.gym.blocks import PDController
from jiminy_tpu.gym.pipeline import ControlledEnv


class CassieEnv(WalkerEnv):
    """Cassie biped with closed-loop pushrod distance constraints (reference
    `CassieJiminyEnv`, `cassie.py:67-140`)."""

    def __init__(self, step_dt: float = 0.04, horizon: int = 500,
                 procedural: bool = False, **kw):
        if procedural:
            robot = bb.build_cassie()
            q0 = bb.cassie_standing_pose(robot.model)
        else:
            robot = assets.load_robot("cassie")
            q0 = assets.nominal_pose("cassie", robot.model)
        kw.setdefault("base_height_min", 0.5)
        kw.setdefault("simulation_dt", 5.0e-4)
        super().__init__(robot, q0, step_dt=step_dt, horizon=horizon, **kw)


class DigitEnv(WalkerEnv):
    """Digit biped (reference `DigitJiminyEnv`, `digit.py:85`)."""

    def __init__(self, step_dt: float = 0.04, horizon: int = 500,
                 procedural: bool = False, **kw):
        if procedural:
            robot = bb.build_digit()
            q0 = bb.cassie_standing_pose(robot.model)
            q0[2] = 1.0
        else:
            robot = assets.load_robot("digit")
            q0 = assets.nominal_pose("digit", robot.model)
        kw.setdefault("base_height_min", 0.55)
        kw.setdefault("simulation_dt", 5.0e-4)
        super().__init__(robot, q0, step_dt=step_dt, horizon=horizon, **kw)


class AtlasEnv(WalkerEnv):
    """Atlas humanoid (reference `AtlasJiminyEnv`, `atlas.py:113`)."""

    def __init__(self, step_dt: float = 0.04, horizon: int = 500,
                 reduced: bool = False, procedural: bool = False, **kw):
        if procedural:
            robot = bb.build_atlas(reduced=reduced)
            q0 = bb.atlas_standing_pose(robot.model)
        else:
            lock = ()
            if reduced:
                # Reference AtlasReduced: lock everything but the legs at the
                # posed configuration (atlas.py:200-207)
                posed = _atlas_lock_angles()
                lock = posed
            robot = assets.load_robot("atlas", lock_joints=lock)
            q0 = assets.nominal_pose("atlas", robot.model)
        kw.setdefault("base_height_min", 0.55)
        kw.setdefault("simulation_dt", 5.0e-4)
        super().__init__(robot, q0, step_dt=step_dt, horizon=horizon, **kw)


def _atlas_lock_angles() -> dict:
    """Locked-joint angles for AtlasReduced: every non-leg joint at the posed
    neutral configuration (reference `atlas.py:152-169, 200-207`)."""
    a = 0.2
    posed = {
        "back_bky": a,
        "l_arm_elx": a,
        "l_arm_shx": -math.pi / 2.0,
        "l_arm_shz": math.pi / 4.0,
        "l_arm_ely": math.pi / 4.0 + math.pi / 2.0,
        "r_arm_elx": -a,
        "r_arm_shx": math.pi / 2.0,
        "r_arm_shz": -math.pi / 4.0,
        "r_arm_ely": math.pi / 4.0 + math.pi / 2.0,
    }
    import xml.etree.ElementTree as ET

    root = ET.parse(assets.urdf_path("atlas")).getroot()
    out = {}
    for j in root.findall("joint"):
        name = j.get("name")
        if j.get("type") == "fixed" or "_leg_" in name:
            continue
        out[name] = posed.get(name, 0.0)
    return out


class AtlasReducedEnv(AtlasEnv):
    """Atlas with arms/neck/back locked at the posed configuration (reference
    `AtlasReducedJiminyEnv`)."""

    def __init__(self, **kw):
        kw["reduced"] = True
        super().__init__(**kw)


def _pd_env(env, kp, kd, table):
    if kp is None or kd is None:
        kp_t, kd_t = bb.pd_gains(env.robot, table)
        kp = kp_t if kp is None else kp
        kd = kd_t if kd is None else kd
    pd = PDController(kp=kp, kd=kd).setup(env)
    return ControlledEnv(env, pd)


def AtlasPDControlEnv(step_dt: float = 0.04, horizon: int = 500,
                      kp=None, kd=None, **kw):
    """Reference `AtlasPDControlJiminyEnv` — the robot of the reference's own
    headline benchmark (`pipeline_benchmark.py`).  Default gains are the
    reference's tuned per-joint values (`atlas.py PD_FULL_KP/KD`), converted
    to our motor side."""
    return _pd_env(AtlasEnv(step_dt=step_dt, horizon=horizon, **kw), kp, kd,
                   bb.ATLAS_PD_EFFECTIVE)


def AtlasReducedPDControlEnv(step_dt: float = 0.04, horizon: int = 500,
                             kp=None, kd=None, **kw):
    """Reference `AtlasReducedPDControlJiminyEnv` (leg-only gains
    `atlas.py PD_REDUCED_KP/KD`)."""
    kw["reduced"] = True
    return _pd_env(AtlasEnv(step_dt=step_dt, horizon=horizon, **kw), kp, kd,
                   bb.ATLAS_PD_EFFECTIVE)


def CassiePDControlEnv(step_dt: float = 0.04, horizon: int = 500,
                       kp=None, kd=None, **kw):
    """Reference `CassiePDControlJiminyEnv` (gains from `cassie.py PD_KP/KD`,
    rescaled through the reduction ratios)."""
    return _pd_env(CassieEnv(step_dt=step_dt, horizon=horizon, **kw), kp, kd,
                   bb.CASSIE_PD_EFFECTIVE)


def DigitPDControlEnv(step_dt: float = 0.04, horizon: int = 500,
                      kp=None, kd=None, **kw):
    """Reference `DigitPDControlJiminyEnv` (gains from `digit.py PD_KP/KD`)."""
    return _pd_env(DigitEnv(step_dt=step_dt, horizon=horizon, **kw), kp, kd,
                   bb.DIGIT_PD_EFFECTIVE)
