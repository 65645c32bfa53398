"""IO: robot/config serialization and log file formats."""

from jiminy_tpu.io.serialization import (
    from_json,
    pytree_from_dict,
    pytree_to_dict,
    to_json,
)

__all__ = ["pytree_to_dict", "pytree_from_dict", "to_json", "from_json"]
