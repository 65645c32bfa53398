"""Gym layer: jit/vmap-native RL environment API over the batched engine.

Re-design of `gym_jiminy.common` (reference `python/gym_jiminy/common/`): the
observer/controller pipeline, rewards and terminations are pure functions composed
*inside* the jitted step — the reference's `FunctionalController` bridge into the
physics loop (`interfaces.py:280-372`) becomes plain function composition, so a
whole pipeline env steps thousands of instances per chip under one `jit`.
"""

from jiminy_tpu.gym.base import AutoResetWrapper, BaseEnv, EnvState
from jiminy_tpu.gym.blocks import (
    BodyObserver,
    DeformationEstimator,
    MahonyFilter,
    MotorSafetyLimit,
    PDAdapter,
    PDController,
    QuantityObserver,
)
from jiminy_tpu.gym.gym_adapter import GymnasiumEnv
from jiminy_tpu.gym.pipeline import (
    ComposedEnv,
    ControlledEnv,
    ObservedEnv,
    _Wrapper,
    build_pipeline,
    load_pipeline,
)
from jiminy_tpu.gym.wrappers import (
    AdaptLayoutObservation,
    BaseTransformAction,
    BaseTransformObservation,
    FilterObservation,
    FlattenAction,
    FlattenObservation,
    NormalizeAction,
    NormalizeObservation,
    ScaleAction,
    ScaleObservation,
    StackObservation,
)

# Reference class names (migration aliases — `docs/porting_from_jiminy.md`):
# a gym_jiminy user should find every public name they know.
BaseJiminyEnv = BaseEnv
BasePipelineWrapper = _Wrapper
ComposedJiminyEnv = ComposedEnv
ControlledJiminyEnv = ControlledEnv
ObservedJiminyEnv = ObservedEnv
InterfaceJiminyEnv = BaseEnv

__all__ = [
    "AutoResetWrapper",
    "BaseEnv",
    "BaseJiminyEnv",
    "BasePipelineWrapper",
    "BaseTransformAction",
    "BaseTransformObservation",
    "GymnasiumEnv",
    "EnvState",
    "DeformationEstimator",
    "QuantityObserver",
    "AdaptLayoutObservation",
    "ComposedJiminyEnv",
    "ControlledJiminyEnv",
    "ObservedJiminyEnv",
    "InterfaceJiminyEnv",
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
