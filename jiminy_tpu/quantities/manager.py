"""QuantityManager: named quantity registry with per-step delta carries
(reference `quantities/manager.py:18` — minus the runtime cache, which XLA CSE
provides under jit; see package docstring)."""

from __future__ import annotations

from typing import Dict

from jiminy_tpu.quantities.generic import Quantity


class QuantityManager:
    def __init__(self, env):
        self.env = env
        self.registry: Dict[str, Quantity] = {}

    def __setitem__(self, name: str, quantity: Quantity):
        self.registry[name] = quantity

    def __getitem__(self, name: str):
        return self.registry[name]

    def __contains__(self, name):
        return name in self.registry

    def compute(self, name: str, state):
        return self.registry[name](self.env, state)

    def compute_all(self, state) -> Dict[str, object]:
        return {name: q(self.env, state) for name, q in self.registry.items()}

    def delta_snapshot(self, state) -> dict:
        """End-of-step values to carry into next step's
        `state.blocks['quantity_delta']`: every registered quantity announces
        what it needs via `Quantity.carries()` (`DeltaQuantity` snapshots its
        inner value, `_DifferenceFrameXYZQuat`-based averages their frame
        pose)."""
        specs: Dict[str, object] = {}
        for q in self.registry.values():
            specs.update(getattr(q, "carries", dict)())
        return {name: spec(self.env, state) for name, spec in specs.items()}

    def stack_snapshot(self, state) -> dict:
        """Updated history rings to carry for `StackedQuantity` next step
        (each entry is the quantity's stacked value at this step)."""
        from jiminy_tpu.quantities.generic import StackedQuantity

        out = {}
        for name, q in self.registry.items():
            if isinstance(q, StackedQuantity):
                out[q.name] = q(self.env, state)
        return out
