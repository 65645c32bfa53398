"""Toolbox locomotion quantities & rewards: support polygon, stability margin
(reference `toolbox/quantities/locomotion.py:23,164`,
`toolbox/compositions/locomotion.py:51`)."""

from __future__ import annotations

import jax.numpy as jnp

from jiminy_tpu.ops.kinematics import forward_kinematics, frame_placement
from jiminy_tpu.quantities.generic import Quantity
from jiminy_tpu.quantities.locomotion import ZeroMomentPoint
from jiminy_tpu.toolbox.qhull import ConvexHull2D


class ProjectedSupportPolygon(Quantity):
    """Convex hull of the active-contact ground projections, weighted by the
    vertical contact force so lifted feet drop out (reference
    `ProjectedSupportPolygon`)."""

    def __call__(self, env, state) -> ConvexHull2D:
        model = env.robot.model
        kin = forward_kinematics(model, state.sim.q)
        pts = jnp.stack(
            [
                frame_placement(model, kin, f).pos[..., 0:2]
                for f in env.robot.contact_frame_indices
            ],
            axis=-2,
        )
        fz = state.sim.contact_forces[..., 2]
        weights = jnp.where(fz > 1e-6, 1.0, 1e-6)
        return ConvexHull2D(pts, weights)


class StabilityMarginQuantity(Quantity):
    """Signed distance of the ZMP to the support polygon boundary — negative
    inside (stable), positive outside (reference stability-margin quantity)."""

    def __init__(self):
        self.zmp = ZeroMomentPoint()
        self.polygon = ProjectedSupportPolygon()

    def __call__(self, env, state):
        hull = self.polygon(env, state)
        zmp = self.zmp(env, state)
        return hull.signed_distance(zmp)


class MaximizeRobustnessReward:
    """Reward pushing the ZMP deep inside the support polygon (reference
    `MaximizeRobustness`, `toolbox/compositions/locomotion.py:51`): RBF kernel
    of the (negative-inside) stability margin."""

    name = "reward_stability_margin"

    def __init__(self, cutoff: float = 0.1):
        self.cutoff = cutoff
        self.margin = StabilityMarginQuantity()

    def __call__(self, env, prev_state, action, next_state):
        from jiminy_tpu.compositions.generic import radial_basis_function

        m = self.margin(env, next_state)
        # margin <= 0 inside: full reward at deep interior, decays outside
        return radial_basis_function(jnp.maximum(m + self.cutoff, 0.0), self.cutoff)
