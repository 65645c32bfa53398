"""Nested-structure utilities (reference `jiminy_py.tree`, `tree.py:276`).

Thin, stable aliases over `jax.tree` so user code matches the reference API;
everything works on arbitrary pytrees (dicts, dataclasses, tuples).
"""

from __future__ import annotations

import jax
import numpy as np


def flatten(tree):
    """Flatten a nested structure into (leaves, treedef)."""
    return jax.tree.flatten(tree)


def unflatten(treedef, leaves):
    return jax.tree.unflatten(treedef, leaves)


def map_(fn, *trees):
    return jax.tree.map(fn, *trees)


def flatten_with_path(tree):
    """[(path, leaf)] with '/'-joined string paths."""
    flat = jax.tree_util.tree_flatten_with_path(tree)[0]
    out = []
    for path, leaf in flat:
        keys = []
        for p in path:
            if hasattr(p, "key"):
                keys.append(str(p.key))
            elif hasattr(p, "idx"):
                keys.append(str(p.idx))
            elif hasattr(p, "name"):
                keys.append(str(p.name))
        out.append(("/".join(keys), leaf))
    return out


def copyto(dst, src):
    """Structure-preserving copy returning a new pytree with src's values cast
    to dst's dtypes (the reference mutates numpy buffers in place; pytrees are
    immutable, so this returns the result)."""
    return jax.tree.map(lambda d, s: np.asarray(s, dtype=np.asarray(d).dtype), dst, src)


def unflatten_as(structure, leaves):
    """Rebuild `leaves` into the shape of `structure` (reference
    `tree.py unflatten_as`)."""
    return jax.tree.unflatten(jax.tree.structure(structure), list(leaves))


def map_structure(fn, *trees):
    """Alias of `map_` matching the reference name."""
    return jax.tree.map(fn, *trees)


def flatten_up_to(shallow, tree):
    """Flatten `tree` down to the structure of `shallow` only (reference
    `tree.py flatten_up_to`): each leaf of `shallow` selects a whole subtree
    of `tree`."""
    return jax.tree.structure(shallow).flatten_up_to(tree)


def deepcopy(tree):
    """Deep copy of a pytree's array leaves (reference `tree.py deepcopy`)."""
    return jax.tree.map(lambda x: np.array(x, copy=True) if isinstance(
        x, np.ndarray) else x, tree)
