"""Gym layer: jit/vmap-native RL environment API over the batched engine.

Re-design of `gym_jiminy.common` (reference `python/gym_jiminy/common/`): the
observer/controller pipeline, rewards and terminations are pure functions composed
*inside* the jitted step — the reference's `FunctionalController` bridge into the
physics loop (`interfaces.py:280-372`) becomes plain function composition, so a
whole pipeline env steps thousands of instances per chip under one `jit`.
"""

from jiminy_tpu.gym.base import BaseEnv, EnvState
from jiminy_tpu.gym.blocks import (
    BodyObserver,
    MahonyFilter,
    MotorSafetyLimit,
    PDAdapter,
    PDController,
)
from jiminy_tpu.gym.pipeline import (
    ComposedEnv,
    ControlledEnv,
    ObservedEnv,
    build_pipeline,
    load_pipeline,
)
from jiminy_tpu.gym.wrappers import (
    FilterObservation,
    FlattenAction,
    FlattenObservation,
    NormalizeAction,
    NormalizeObservation,
    ScaleAction,
    ScaleObservation,
    StackObservation,
)

__all__ = [
    "BaseEnv",
    "EnvState",
    "PDController",
    "PDAdapter",
    "MahonyFilter",
    "MotorSafetyLimit",
    "BodyObserver",
    "ControlledEnv",
    "ObservedEnv",
    "ComposedEnv",
    "build_pipeline",
    "load_pipeline",
    "FlattenAction",
    "FlattenObservation",
    "FilterObservation",
    "NormalizeObservation",
    "NormalizeAction",
    "ScaleObservation",
    "ScaleAction",
    "StackObservation",
]
