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
import jax.numpy as jnp
import numpy as np


def _is_empty(x: Any) -> bool:
    """Zero-size array leaf (e.g. contact_forces of a contact-free robot) —
    Orbax refuses to serialize those, so they are swapped for a placeholder
    on save and re-synthesized from the target structure on restore."""
    return hasattr(x, "size") and hasattr(x, "shape") and x.size == 0


def save_checkpoint(path: str, state: Any) -> str:
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    state = jax.tree.map(
        lambda x: np.zeros((1,), np.int32) if _is_empty(x) else x, state
    )
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
        lambda x: jax.ShapeDtypeStruct((1,), jnp.int32)
        if _is_empty(x)
        else (
            jax.ShapeDtypeStruct(x.shape, x.dtype) if hasattr(x, "shape") else x
        ),
        target,
    )
    restored = ckptr.restore(path, abstract)
    return jax.tree.map(
        lambda t, r: jnp.zeros(t.shape, t.dtype) if _is_empty(t) else r,
        target,
        restored,
    )
