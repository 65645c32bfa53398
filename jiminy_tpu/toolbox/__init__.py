"""Toolbox: experimental math/quantities/wrappers (reference `gym_jiminy.toolbox`)."""

from jiminy_tpu.toolbox.qhull import ConvexHull2D
from jiminy_tpu.toolbox.spline import Spline
from jiminy_tpu.toolbox.locomotion import (
    MaximizeRobustnessReward,
    ProjectedSupportPolygon,
    StabilityMarginQuantity,
)
from jiminy_tpu.toolbox.meta_envs import (
    TaskSettableEnv,
    TaskSettableWrapper,
    TaskSpace,
    TrajectorySettableWrapper,
)

__all__ = [
    "ConvexHull2D",
    "Spline",
    "ProjectedSupportPolygon",
    "StabilityMarginQuantity",
    "MaximizeRobustnessReward",
    "TaskSettableEnv",
    "TaskSettableWrapper",
    "TaskSpace",
    "TrajectorySettableWrapper",
]
