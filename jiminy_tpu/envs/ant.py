"""Ant locomotion env (reference `AntJiminyEnv`, `gym_jiminy/envs/.../ant.py:30`)."""

from __future__ import annotations

import numpy as np

from jiminy_tpu.envs import builders
from jiminy_tpu.envs.locomotion import WalkerEnv


class AntEnv(WalkerEnv):
    def __init__(self, step_dt: float = 0.05, horizon: int = 1000, **kw):
        robot = builders.build_ant()
        q = np.zeros(robot.model.nq)
        q[2] = 0.55  # initial torso height
        q[6] = 1.0
        # Legs slightly bent
        for leg in ("fl", "fr", "bl", "br"):
            j = robot.model.joint_index(f"knee_{leg}")
            q[robot.model.idx_q[j]] = 0.9
        kw.setdefault("base_height_min", 0.26)
        kw.setdefault("target_velocity", 1.0)
        super().__init__(robot, q, step_dt=step_dt, horizon=horizon, **kw)
