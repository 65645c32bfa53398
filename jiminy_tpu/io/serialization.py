"""Generic serialization of the framework's struct dataclasses (Robot, models,
hardware banks) to JSON-able dicts.

Role-equivalent to the reference's boost::serialization of `Model`/`Robot`
(`core/src/io/serialization.cc`): every telemetry log embeds the fully
serialized robot so the exact simulation can be rebuilt from the log alone
(`build_robot_from_log`, reference `jiminy_py/log.py:87`).
"""

from __future__ import annotations

import base64
import dataclasses
import importlib
import json
from typing import Any

import jax.numpy as jnp
import numpy as np


def _encode(value: Any) -> Any:
    if value is None or isinstance(value, (bool, int, float, str)):
        return value
    if isinstance(value, (np.ndarray, jnp.ndarray)):
        arr = np.asarray(value)
        return {
            "__ndarray__": base64.b64encode(arr.tobytes()).decode(),
            "dtype": str(arr.dtype),
            "shape": list(arr.shape),
        }
    if isinstance(value, (np.floating, np.integer)):
        return value.item()
    if isinstance(value, tuple):
        return {"__tuple__": [_encode(v) for v in value]}
    if isinstance(value, list):
        return [_encode(v) for v in value]
    if isinstance(value, dict):
        return {"__dict__": {k: _encode(v) for k, v in value.items()}}
    if dataclasses.is_dataclass(value):
        cls = type(value)
        return {
            "__dataclass__": f"{cls.__module__}:{cls.__qualname__}",
            "fields": {
                f.name: _encode(getattr(value, f.name))
                for f in dataclasses.fields(value)
            },
        }
    raise TypeError(f"cannot serialize {type(value)}")


def _decode(value: Any) -> Any:
    if isinstance(value, dict):
        if "__ndarray__" in value:
            arr = np.frombuffer(
                base64.b64decode(value["__ndarray__"]), dtype=value["dtype"]
            ).reshape(value["shape"])
            return jnp.asarray(arr)
        if "__tuple__" in value:
            return tuple(_decode(v) for v in value["__tuple__"])
        if "__dict__" in value:
            return {k: _decode(v) for k, v in value["__dict__"].items()}
        if "__dataclass__" in value:
            mod, _, qual = value["__dataclass__"].partition(":")
            cls = importlib.import_module(mod)
            for part in qual.split("."):
                cls = getattr(cls, part)
            fields = {k: _decode(v) for k, v in value["fields"].items()}
            return cls(**fields)
        return {k: _decode(v) for k, v in value.items()}
    if isinstance(value, list):
        return [_decode(v) for v in value]
    return value


def pytree_to_dict(obj: Any) -> Any:
    return _encode(obj)


def pytree_from_dict(d: Any) -> Any:
    return _decode(d)


def to_json(obj: Any) -> str:
    return json.dumps(_encode(obj))


def from_json(s: str) -> Any:
    return _decode(json.loads(s))
