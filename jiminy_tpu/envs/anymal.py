"""ANYmal-class quadruped locomotion env — the flagship benchmark configuration
(reference `ANYmalJiminyEnv`, `gym_jiminy/envs/.../anymal.py:52`)."""

from __future__ import annotations

import numpy as np

from jiminy_tpu.envs import builders
from jiminy_tpu.envs.locomotion import WalkerEnv
from jiminy_tpu.gym.blocks import PDController
from jiminy_tpu.gym.pipeline import ControlledEnv


class ANYmalEnv(WalkerEnv):
    def __init__(self, step_dt: float = 0.04, horizon: int = 500, flexible: bool = False,
                 std_ratio: float = 0.0, **kw):
        robot = builders.build_anymal(flexible=flexible)
        nominal_q = builders.anymal_standing_pose(robot.model)
        if flexible:
            # Insert neutral quaternions for the flexibility joints
            q = np.zeros(robot.model.nq)
            model = robot.model
            th = robot.theoretical_model
            # Map theoretical nominal into the extended model joint-wise
            for j in range(th.njoints):
                name = th.joint_names[j]
                je = model.joint_index(name)
                q[model.idx_q[je] : model.idx_q[je] + model.nq_of(je)] = nominal_q[
                    th.idx_q[j] : th.idx_q[j] + th.nq_of(j)
                ]
            for j in range(model.njoints):
                if model.joint_names[j].endswith("_flexibility"):
                    q[model.idx_q[j] + 3] = 1.0  # identity quaternion
            nominal_q = q
        super().__init__(robot, nominal_q, step_dt=step_dt, horizon=horizon,
                         std_ratio=std_ratio, **kw)


def ANYmalPDControlEnv(step_dt: float = 0.04, horizon: int = 500, kp=0.08, kd=0.06, **kw):
    """`-pid` pipeline variant: PD controller block on motor targets (reference
    `ANYmalPDControlJiminyEnv`).  The reference's tuned gains (joint-side
    kp=1500, kd=0.01, `anymal.py:27-31`) assume its euler_explicit +
    constraint-contact pipeline (`anymal_options.toml`); for this env's
    spring-damper + RK4 pipeline they sit on a friction limit cycle, so the
    defaults are re-tuned for quiet standing (|v| ~ 0.07 after 3 s)."""
    env = ANYmalEnv(step_dt=step_dt, horizon=horizon, **kw)
    pd = PDController(kp=kp, kd=kd).setup(env)
    return ControlledEnv(env, pd)
