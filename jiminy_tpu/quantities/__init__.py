"""Quantities: named physical quantities evaluated on env states.

Re-design of `gym_jiminy.common.quantities` (reference `bases/quantities.py` +
`quantities/{generic,locomotion}.py`): the reference builds a lazily-evaluated
shared-cache DAG because recomputation is expensive in eager numpy; under `jit`
the whole reward/termination stack is traced into one program and **XLA common-
subexpression elimination plays the role of the shared cache** — two rewards
touching the CoM produce one CoM computation in the compiled step.  The classes
here therefore stay thin: pure callables `(env, env_state) -> value` with the
same names/semantics as the reference inventory.
"""

from jiminy_tpu.quantities.generic import (
    AverageFrameSpatialVelocity,
    EnergyQuantity,
    FrameOrientation,
    FramePosition,
    FrameSpatialVelocity,
    MaskedQuantity,
    MultiFramePosition,
    UnaryOpQuantity,
    BinaryOpQuantity,
    ConcatenatedQuantity,
    DeltaQuantity,
)
from jiminy_tpu.quantities.locomotion import (
    BaseOdometryPose,
    BaseOdometryVelocity,
    BaseRelativeHeight,
    CapturePoint,
    CenterOfMass,
    CenterOfMassVelocity,
    ZeroMomentPoint,
)
from jiminy_tpu.quantities.manager import QuantityManager
from jiminy_tpu.quantities.trajectory import (
    ReferenceQuantity,
    ReferenceTrajectory,
    TrajectoryDataset,
    make_tracking_target,
)

__all__ = [
    "QuantityManager",
    "FramePosition",
    "FrameOrientation",
    "FrameSpatialVelocity",
    "AverageFrameSpatialVelocity",
    "MultiFramePosition",
    "MaskedQuantity",
    "UnaryOpQuantity",
    "BinaryOpQuantity",
    "ConcatenatedQuantity",
    "DeltaQuantity",
    "EnergyQuantity",
    "CenterOfMass",
    "CenterOfMassVelocity",
    "ZeroMomentPoint",
    "CapturePoint",
    "BaseOdometryPose",
    "BaseOdometryVelocity",
    "BaseRelativeHeight",
    "TrajectoryDataset",
    "ReferenceTrajectory",
    "ReferenceQuantity",
    "make_tracking_target",
]
