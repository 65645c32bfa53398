"""Telemetry: per-step recording of named scalar fields, log IO, trajectories.

Re-design of the reference telemetry stack (`core/src/telemetry/`,
`jiminy_py/log.py`): recording happens *on device* — a rollout `lax.scan`
stacks the registered fields into columnar arrays in one shot (no per-step
host crossing) — and export/import goes through the native C++ TLMC codec
(`jiminy_tpu/native/tlmc.cc`) or HDF5.  Every log embeds the serialized robot
for exact reconstruction (`build_robot_from_log`).
"""

from jiminy_tpu.telemetry.recorder import LogData, TelemetryRecorder, record_rollout
from jiminy_tpu.telemetry.log import (
    build_robot_from_log,
    build_robots_from_log,
    extract_trajectories_from_log,
    extract_trajectory_from_log,
    extract_variables_from_log,
    update_sensor_measurements_from_log,
    read_hdf5,
    read_log,
    write_hdf5,
    write_log,
)
from jiminy_tpu.telemetry.trajectory import State, Trajectory

__all__ = [
    "LogData",
    "TelemetryRecorder",
    "record_rollout",
    "write_log",
    "read_log",
    "write_hdf5",
    "read_hdf5",
    "build_robot_from_log",
    "build_robots_from_log",
    "extract_trajectories_from_log",
    "extract_trajectory_from_log",
    "extract_variables_from_log",
    "update_sensor_measurements_from_log",
    "Trajectory",
    "State",
]
