"""Compositions: declarative rewards and terminations over quantities
(reference `gym_jiminy.common.compositions`)."""

from jiminy_tpu.compositions.generic import (
    AdditiveMixtureReward,
    MultiplicativeMixtureReward,
    QuantityReward,
    SurviveReward,
    TrackingQuantityReward,
    radial_basis_function,
)
from jiminy_tpu.compositions.locomotion import (
    BaseHeightTermination,
    BaseRollPitchTermination,
    FlyingTermination,
    ImpactForceTermination,
    TrackingBaseHeightReward,
    TrackingBaseOdometryVelocityReward,
    MechanicalPowerConsumptionReward,
)

__all__ = [
    "radial_basis_function",
    "QuantityReward",
    "SurviveReward",
    "TrackingQuantityReward",
    "AdditiveMixtureReward",
    "MultiplicativeMixtureReward",
    "TrackingBaseOdometryVelocityReward",
    "TrackingBaseHeightReward",
    "MechanicalPowerConsumptionReward",
    "BaseRollPitchTermination",
    "BaseHeightTermination",
    "FlyingTermination",
    "ImpactForceTermination",
]
