"""Biped/humanoid environments: Cassie, Digit, Atlas (+ reduced / PD variants)
(reference `gym_jiminy/envs/.../{cassie,digit,atlas}.py`)."""

from __future__ import annotations

import numpy as np

from jiminy_tpu.envs import builders_bipeds as bb
from jiminy_tpu.envs.locomotion import WalkerEnv
from jiminy_tpu.gym.blocks import PDController
from jiminy_tpu.gym.pipeline import ControlledEnv


class CassieEnv(WalkerEnv):
    """Cassie biped with closed-loop pushrod distance constraints (reference
    `CassieJiminyEnv`, `cassie.py:67-140`)."""

    def __init__(self, step_dt: float = 0.04, horizon: int = 500, **kw):
        robot = bb.build_cassie()
        q0 = bb.cassie_standing_pose(robot.model)
        kw.setdefault("base_height_min", 0.5)
        kw.setdefault("simulation_dt", 5.0e-4)
        super().__init__(robot, q0, step_dt=step_dt, horizon=horizon, **kw)


class DigitEnv(WalkerEnv):
    """Digit biped (reference `DigitJiminyEnv`, `digit.py:85`)."""

    def __init__(self, step_dt: float = 0.04, horizon: int = 500, **kw):
        robot = bb.build_digit()
        q0 = bb.cassie_standing_pose(robot.model)
        q0[2] = 1.0
        kw.setdefault("base_height_min", 0.55)
        kw.setdefault("simulation_dt", 5.0e-4)
        super().__init__(robot, q0, step_dt=step_dt, horizon=horizon, **kw)


class AtlasEnv(WalkerEnv):
    """Atlas humanoid (reference `AtlasJiminyEnv`, `atlas.py:113`)."""

    def __init__(self, step_dt: float = 0.04, horizon: int = 500,
                 reduced: bool = False, **kw):
        robot = bb.build_atlas(reduced=reduced)
        q0 = bb.atlas_standing_pose(robot.model)
        kw.setdefault("base_height_min", 0.55)
        kw.setdefault("simulation_dt", 5.0e-4)
        super().__init__(robot, q0, step_dt=step_dt, horizon=horizon, **kw)


class AtlasReducedEnv(AtlasEnv):
    """Atlas with arms/neck removed (reference `AtlasReducedJiminyEnv`)."""

    def __init__(self, **kw):
        kw["reduced"] = True
        super().__init__(**kw)


def AtlasPDControlEnv(step_dt: float = 0.04, horizon: int = 500,
                      kp=None, kd=None, **kw):
    """Reference `AtlasPDControlJiminyEnv` — the robot of the reference's own
    headline benchmark (`pipeline_benchmark.py`).  Default gains are the
    reference's tuned per-joint values (`atlas.py PD_FULL_KP/KD`), converted
    to our motor side."""
    env = AtlasEnv(step_dt=step_dt, horizon=horizon, **kw)
    if kp is None or kd is None:
        kp_t, kd_t = bb.pd_gains(env.robot, bb.ATLAS_PD_EFFECTIVE)
        kp = kp_t if kp is None else kp
        kd = kd_t if kd is None else kd
    pd = PDController(kp=kp, kd=kd).setup(env)
    return ControlledEnv(env, pd)


def CassiePDControlEnv(step_dt: float = 0.04, horizon: int = 500,
                       kp=None, kd=None, **kw):
    """Reference `CassiePDControlJiminyEnv` (gains from `cassie.py PD_KP/KD`,
    rescaled through the reduction ratios)."""
    env = CassieEnv(step_dt=step_dt, horizon=horizon, **kw)
    if kp is None or kd is None:
        kp_t, kd_t = bb.pd_gains(env.robot, bb.CASSIE_PD_EFFECTIVE)
        kp = kp_t if kp is None else kp
        kd = kd_t if kd is None else kd
    pd = PDController(kp=kp, kd=kd).setup(env)
    return ControlledEnv(env, pd)


def DigitPDControlEnv(step_dt: float = 0.04, horizon: int = 500,
                      kp=None, kd=None, **kw):
    """Reference `DigitPDControlJiminyEnv` (gains from `digit.py PD_KP/KD`)."""
    env = DigitEnv(step_dt=step_dt, horizon=horizon, **kw)
    if kp is None or kd is None:
        kp_t, kd_t = bb.pd_gains(env.robot, bb.DIGIT_PD_EFFECTIVE)
        kp = kp_t if kp is None else kp
        kd = kd_t if kd is None else kd
    pd = PDController(kp=kp, kd=kd).setup(env)
    return ControlledEnv(env, pd)
