"""Multi-host / multi-chip distribution utilities.

Role-equivalent of the reference's Ray cluster layer
(`gym_jiminy/rllib/utilities.py:305` `initialize` + the EnvRunnerGroup fan-out
:564-1022), redesigned for single-program multi-controller JAX: every host
runs the SAME jitted program over a global `Mesh` spanning all processes'
devices; env batches shard over hosts/chips on the `data` axis and XLA inserts
the learner all-reduce over ICI (intra-slice) / DCN (cross-slice) — no object
store, no RPC, no per-worker python loop.
"""

from jiminy_tpu.parallel.distributed import (
    global_mesh,
    initialize,
    is_distributed,
    process_count,
    process_index,
    sync_global_devices,
)

__all__ = [
    "initialize",
    "global_mesh",
    "is_distributed",
    "process_count",
    "process_index",
    "sync_global_devices",
]
