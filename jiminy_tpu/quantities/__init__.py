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
    AverageFrameRollPitch,
    AverageFrameSpatialVelocity,
    AverageMechanicalPowerConsumption,
    EnergyQuantity,
    FrameOrientation,
    FramePosition,
    FrameSpatialAverageVelocity,
    FrameSpatialVelocity,
    FrameXYZQuat,
    MaskedQuantity,
    MechanicalPowerConsumption,
    MultiActuatedJointKinematic,
    MultiFrameCollisionDetection,
    MultiFrameMeanXYZQuat,
    MultiFramePosition,
    MultiFrameXYZQuat,
    UnaryOpQuantity,
    BinaryOpQuantity,
    ConcatenatedQuantity,
    DeltaQuantity,
    StackedQuantity,
    remove_yaw,
)
from jiminy_tpu.quantities.locomotion import (
    AverageBaseMomentum,
    BaseOdometryAverageVelocity,
    BaseOdometryPose,
    BaseOdometryVelocity,
    BaseRelativeHeight,
    BaseSpatialAverageVelocity,
    CapturePoint,
    CenterOfMass,
    CenterOfMassVelocity,
    DeltaBaseOdometryOrientation,
    DeltaBaseOdometryPosition,
    MultiContactNormalizedSpatialForce,
    MultiFootCollisionDetection,
    MultiFootMeanOdometryPose,
    MultiFootMeanXYZQuat,
    MultiFootNormalizedForceVertical,
    MultiFootRelativeXYZQuat,
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
    "FrameXYZQuat",
    "FrameSpatialVelocity",
    "FrameSpatialAverageVelocity",
    "AverageFrameSpatialVelocity",
    "AverageFrameRollPitch",
    "MultiFramePosition",
    "MultiFrameXYZQuat",
    "MultiFrameMeanXYZQuat",
    "MultiFrameCollisionDetection",
    "MultiActuatedJointKinematic",
    "MechanicalPowerConsumption",
    "AverageMechanicalPowerConsumption",
    "MaskedQuantity",
    "UnaryOpQuantity",
    "BinaryOpQuantity",
    "ConcatenatedQuantity",
    "DeltaQuantity",
    "StackedQuantity",
    "remove_yaw",
    "EnergyQuantity",
    "CenterOfMass",
    "CenterOfMassVelocity",
    "ZeroMomentPoint",
    "CapturePoint",
    "AverageBaseMomentum",
    "BaseOdometryPose",
    "BaseOdometryVelocity",
    "BaseOdometryAverageVelocity",
    "BaseSpatialAverageVelocity",
    "BaseRelativeHeight",
    "DeltaBaseOdometryPosition",
    "DeltaBaseOdometryOrientation",
    "MultiFootMeanXYZQuat",
    "MultiFootMeanOdometryPose",
    "MultiFootRelativeXYZQuat",
    "MultiContactNormalizedSpatialForce",
    "MultiFootNormalizedForceVertical",
    "MultiFootCollisionDetection",
    "TrajectoryDataset",
    "ReferenceTrajectory",
    "ReferenceQuantity",
    "make_tracking_target",
]
