"""Multi-host cluster bring-up and global meshes.

Reference counterpart: `gym_jiminy.rllib.utilities.initialize`
(`rllib/utilities.py:305`) boots a Ray head/worker and connects the driver;
here the same role is one call per host process to `initialize()`, after
which `jax.devices()` spans the whole cluster and a `global_mesh()` makes
every existing `mesh=`-aware entry point (e.g. `rl.ppo.make_train`) run
multi-host unchanged — the env batch shards per host automatically because
each process only materializes its addressable shard of the globally-sharded
arrays.

Configuration is either explicit arguments or environment variables
(`JIMINY_COORDINATOR`, `JIMINY_NUM_PROCESSES`, `JIMINY_PROCESS_ID`,
`JIMINY_LOCAL_DEVICES`), mirroring how the reference reads cluster layout
from Ray env vars.  On TPU pods, arguments are optional — JAX infers the
topology from the TPU runtime; on CPU (testing) the gloo collectives backend
is selected automatically.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    local_device_count: Optional[int] = None,
) -> bool:
    """Bring up (or join) the multi-host cluster.

    Call once per host process before any other jax operation.  Returns True
    when running distributed (more than one process), False for the
    single-process fallback (no-op, everything keeps working on one host).

    Role of `/root/reference/python/gym_jiminy/rllib/gym_jiminy/rllib/
    utilities.py:305` (Ray cluster init).
    """
    coordinator_address = coordinator_address or os.environ.get(
        "JIMINY_COORDINATOR"
    )
    if num_processes is None and "JIMINY_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["JIMINY_NUM_PROCESSES"])
    if process_id is None and "JIMINY_PROCESS_ID" in os.environ:
        process_id = int(os.environ["JIMINY_PROCESS_ID"])
    if local_device_count is None and "JIMINY_LOCAL_DEVICES" in os.environ:
        local_device_count = int(os.environ["JIMINY_LOCAL_DEVICES"])

    if (
        coordinator_address is None
        and num_processes is None
        and process_id is None
        and "JAX_COORDINATOR_ADDRESS" not in os.environ
    ):
        # No explicit cluster configuration: rely on the runtime's own
        # auto-detection (TPU pod metadata, Cloud/SLURM env) — that lives
        # INSIDE jax.distributed.initialize, so it must be attempted, not
        # skipped.  A plain single host has no cluster context and raises;
        # that is the single-process fallback.
        try:
            jax.distributed.initialize()
        except Exception:
            return False
        return jax.process_count() > 1

    # NOTE: must not touch the XLA backend before jax.distributed.initialize
    # (so no jax.devices()/default_backend() here) — sniff the platform from
    # the environment instead.
    if os.environ.get("JAX_PLATFORMS", "").startswith("cpu") or (
        jax.config.jax_platforms or ""
    ).startswith("cpu"):
        # Cross-process collectives on the CPU backend need an explicit
        # implementation; gloo ships with jaxlib.
        jax.config.update("jax_cpu_collectives_implementation", "gloo")

    kwargs = {}
    if local_device_count is not None:
        kwargs["local_device_ids"] = list(range(local_device_count))
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        **kwargs,
    )
    return jax.process_count() > 1


def is_distributed() -> bool:
    return jax.process_count() > 1


def process_count() -> int:
    return jax.process_count()


def process_index() -> int:
    return jax.process_index()


def global_mesh(axis_name: str = "data") -> jax.sharding.Mesh:
    """1-D mesh over every device of every process, ordered so that each
    process' devices are contiguous — the env `data` axis therefore shards
    per-host first, per-chip second (host-local shards never cross DCN).

    Equivalent role: the reference's EnvRunnerGroup layout (N processes × M
    envs each, `rllib/utilities.py:564-1022`).
    """
    devices = sorted(
        jax.devices(), key=lambda d: (d.process_index, d.id)
    )
    return jax.sharding.Mesh(np.array(devices), (axis_name,))


def sync_global_devices(tag: str = "sync") -> None:
    """Barrier across all processes (checkpoint/bench fencing)."""
    if is_distributed():
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices(tag)
