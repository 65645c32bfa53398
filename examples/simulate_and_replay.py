"""Classic simulation workflow: simulate, log, plot, replay to GIF
(reference: jiminy_py tutorial flow)."""

from __future__ import annotations

import os
import sys

# Allow running straight from a source checkout: `python examples/...py`
_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _ROOT not in sys.path:
    sys.path.insert(0, _ROOT)

import jax.numpy as jnp

from jiminy_tpu.envs.builders import anymal_standing_pose, build_anymal
from jiminy_tpu.engine import Engine, EngineOptions
from jiminy_tpu.engine.config import StepperOptions
from jiminy_tpu.plot import plot_log
from jiminy_tpu.telemetry import (
    extract_trajectory_from_log,
    record_rollout,
    write_log,
)
from jiminy_tpu.viewer import play_trajectories


def main():
    robot = build_anymal()
    engine = Engine(
        robot,
        EngineOptions(
            stepper=StepperOptions(dt_max=1e-3),
            controller_update_period=5e-3,
            sensor_update_period=5e-3,
        ),
    )
    q0 = jnp.asarray(anymal_standing_pose(robot.model))
    state = engine.reset(q0)
    final, log = record_rollout(engine, state, 400)  # 2 s passive drop/settle

    write_log("/tmp/anymal_run.jtl", log)
    plot_log(log, save_prefix="/tmp/anymal_run")
    traj = extract_trajectory_from_log(log)
    play_trajectories([traj], output_path="/tmp/anymal_run.gif", fps=20)
    print("log: /tmp/anymal_run.jtl; figures: /tmp/anymal_run_*.png; "
          "replay: /tmp/anymal_run.gif")


if __name__ == "__main__":
    main()
