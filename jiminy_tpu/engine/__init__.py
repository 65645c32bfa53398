"""TPU-native simulation engine: pure-functional, batched, jit/vmap/shard_map-ready.

Role-equivalent to the reference's C++ `Engine` + `Robot` hardware layer
(`core/src/engine/engine.cc`, `core/src/hardware/`), re-designed for XLA: the whole
physics loop (contacts, motors, sensors, integrator, constraint solve) is one pure
function over a `SimState` pytree, traced once and compiled.
"""

from jiminy_tpu.engine.config import (
    ContactModel,
    ContactOptions,
    EngineOptions,
    StepperOptions,
    WorldOptions,
)
from jiminy_tpu.engine.hardware import (
    ImuSensorGroup,
    MotorBank,
    SensorSuite,
    ContactSensorGroup,
    EffortSensorGroup,
    EncoderSensorGroup,
    ForceSensorGroup,
)
from jiminy_tpu.engine.robot import Robot
from jiminy_tpu.engine.state import SimState, StepperState
from jiminy_tpu.engine.engine import Engine
from jiminy_tpu.engine.callback import host_controller, host_force

__all__ = [
    "host_controller",
    "host_force",
    "ContactModel",
    "ContactOptions",
    "EngineOptions",
    "StepperOptions",
    "WorldOptions",
    "MotorBank",
    "SensorSuite",
    "ImuSensorGroup",
    "ContactSensorGroup",
    "ForceSensorGroup",
    "EncoderSensorGroup",
    "EffortSensorGroup",
    "Robot",
    "SimState",
    "StepperState",
    "Engine",
]
