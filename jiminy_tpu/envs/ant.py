"""Ant locomotion env (reference `AntJiminyEnv`, `gym_jiminy/envs/.../ant.py:30`).

The robot is the reference's `ant.urdf` + `ant_hardware.toml` (8 motors,
sphere collision bodies on the torso and the 4 feet); ``procedural=True``
uses the parametric builder instead."""

from __future__ import annotations

import numpy as np

from jiminy_tpu.envs import assets, builders
from jiminy_tpu.envs.locomotion import WalkerEnv


class AntEnv(WalkerEnv):
    def __init__(self, step_dt: float = 0.05, horizon: int = 1000,
                 procedural: bool = False, **kw):
        if procedural:
            robot = builders.build_ant()
            q = np.zeros(robot.model.nq)
            q[2] = 0.55  # initial torso height
            q[6] = 1.0
            # Legs slightly bent
            for leg in ("fl", "fr", "bl", "br"):
                j = robot.model.joint_index(f"knee_{leg}")
                q[robot.model.idx_q[j]] = 0.9
        else:
            robot = assets.load_robot("ant")
            # Reference `AntJiminyEnv._neutral` (ant.py:88-104): statically
            # stable stance, all four legs in the same configuration.
            q = np.asarray(robot.model.neutral(), float).copy()
            q[2] = 0.75
            for name, val in (("ankle_1", 1.0), ("ankle_2", -1.0),
                              ("ankle_3", -1.0), ("ankle_4", 1.0)):
                j = robot.model.joint_index(name)
                q[robot.model.idx_q[j]] = val
        kw.setdefault("base_height_min", 0.26)
        kw.setdefault("target_velocity", 1.0)
        super().__init__(robot, q, step_dt=step_dt, horizon=horizon, **kw)
