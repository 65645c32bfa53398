"""Multi-device scaling harness: batched env rollout sharded over a mesh.

Measures aggregate env-steps/s at 1..N devices with the env batch sharded on the
`data` axis (`jax.sharding.NamedSharding`) — the physics is embarrassingly
parallel, so XLA partitions the whole step with zero collectives; scaling
efficiency is the fraction of linear speedup retained (SURVEY §7.8, BASELINE
"1 chip / 1 host / N hosts" requirement).

Usage:
    python benchmarks/scaling.py                        # real devices
    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python benchmarks/scaling.py --env cartpole --batch 64 --steps 5
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

# The axon TPU plugin force-registers itself over JAX_PLATFORMS env vars
# (CLAUDE.md gotcha): honour an explicit CPU request via the config API, which
# does win, BEFORE any jax op.
if os.environ.get("JAX_PLATFORMS", "") == "cpu":
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def run_scaling(env_name: str, batch: int, n_steps: int, device_counts=None):
    from jiminy_tpu.envs import make

    env = make(env_name)
    devices = jax.devices()
    if device_counts is None:
        device_counts = [d for d in (1, 2, 4, 8, 16) if d <= len(devices)]

    results = []
    for nd in device_counts:
        mesh = Mesh(devices[:nd], ("data",))
        sharding = NamedSharding(mesh, P("data"))
        keys = jax.device_put(
            jax.random.split(jax.random.PRNGKey(0), batch), sharding
        )
        state, obs = jax.jit(jax.vmap(env.reset))(keys)
        actions = jax.device_put(
            jnp.zeros((batch, env.action_size)), sharding
        )

        def chunk(state):
            def body(s, _):
                s, *_ = jax.vmap(env.step)(s, actions)
                return s, None

            s, _ = jax.lax.scan(body, state, None, length=n_steps)
            return s

        run = jax.jit(chunk, donate_argnums=0)
        state = run(state)
        jax.block_until_ready(state.sim.q)
        state2, _ = jax.jit(jax.vmap(env.reset))(keys)
        t0 = time.perf_counter()
        state2 = run(state2)
        jax.block_until_ready(state2.sim.q)
        dt = time.perf_counter() - t0
        sps = batch * n_steps / dt
        results.append({"devices": nd, "steps_per_sec": round(sps, 1)})

    base = results[0]["steps_per_sec"]
    for r in results:
        r["efficiency"] = round(r["steps_per_sec"] / (base * r["devices"]), 3)
    return results


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--env", default="anymal-pid")
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--steps", type=int, default=10)
    args = ap.parse_args()
    results = run_scaling(args.env, args.batch, args.steps)
    print(json.dumps({"env": args.env, "batch": args.batch, "scaling": results}))


if __name__ == "__main__":
    main()
