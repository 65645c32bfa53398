"""Training checkpoint/resume via Orbax.

The reference persists RLlib checkpoints and rebuilds policies from them
(`rllib/utilities.py:564-1652`); here the checkpoint is the entire `PPOState`
pytree — params, optimizer state, **and the batched env states + RNG keys** —
so a run resumes bit-exact mid-training (better than the reference, whose
simulations are not resumable; SURVEY §5 checkpoint/resume)."""

from __future__ import annotations

import os
from typing import Any

import jax


def save_checkpoint(path: str, state: Any) -> str:
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, state)
    ckptr.wait_until_finished()
    return path


def restore_checkpoint(path: str, target: Any) -> Any:
    """Restore into the structure of `target` (an abstract or concrete
    PPOState from `make_train(...)[0]`)."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    abstract = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype)
        if hasattr(x, "shape")
        else x,
        target,
    )
    return ckptr.restore(path, abstract)
