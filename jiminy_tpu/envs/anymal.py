"""ANYmal quadruped locomotion env — the flagship benchmark configuration
(reference `ANYmalJiminyEnv`, `gym_jiminy/envs/.../anymal.py:52`).

The robot is the reference's actual ANYmal: `anymal.urdf` +
`anymal_hardware.toml` (12 SimpleMotors with velocity-limit envelope and
armature 0.1, IMU, 4 foot force sensors, 12 encoders + 12 effort sensors,
contact points at the feet), vendored under
`jiminy_tpu/data/quadrupedal_robots/anymal/` and assembled by
`envs.assets.load_robot`.  ``procedural=True`` switches to the parametric
look-alike builder (`envs/builders.py`) — useful for morphology
randomization studies.
"""

from __future__ import annotations

import numpy as np

from jiminy_tpu.envs import assets, builders
from jiminy_tpu.envs.locomotion import WalkerEnv
from jiminy_tpu.gym.blocks import PDController
from jiminy_tpu.gym.pipeline import ControlledEnv


class ANYmalEnv(WalkerEnv):
    def __init__(self, step_dt: float = 0.04, horizon: int = 500, flexible: bool = False,
                 std_ratio: float = 0.0, procedural: bool = False, **kw):
        if procedural or flexible:
            robot = builders.build_anymal(flexible=flexible)
        else:
            robot = assets.load_robot("anymal")
        nominal_q = (
            builders.anymal_standing_pose(robot.model)
            if not flexible
            else self._flexible_pose(robot)
        )
        super().__init__(robot, nominal_q, step_dt=step_dt, horizon=horizon,
                         std_ratio=std_ratio, **kw)

    @staticmethod
    def _flexible_pose(robot):
        nominal_q = builders.anymal_standing_pose(robot.theoretical_model)
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
        return q


def ANYmalPDControlEnv(step_dt: float = 0.04, horizon: int = 500, kp=1500.0, kd=0.01,
                       **kw):
    """`-pid` pipeline variant: PD controller block on motor targets (reference
    `ANYmalPDControlJiminyEnv`).  Gains are the reference's tuned values
    (`anymal.py:27-31`, kp=1500 / kd=0.01 at reduction 1).  kd MUST stay small
    with the 5 ms ZOH control period: the half-period phase lag turns large
    derivative gains into negative damping on the ~25 Hz leg-contact mode
    (measured: kd=0.04 sustains a vibration limit cycle; kd=0.01 settles to
    |v| < 1e-4 at exact force balance).  The procedural look-alike
    (`procedural=True`) uses different reductions — pass explicit gains."""
    env = ANYmalEnv(step_dt=step_dt, horizon=horizon, **kw)
    pd = PDController(kp=kp, kd=kd).setup(env)
    return ControlledEnv(env, pd)
