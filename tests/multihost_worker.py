"""Multi-host PPO worker used by tests/test_multihost.py.

Each invocation is ONE controller process of a jax.distributed cluster
(CPU backend, 4 virtual devices per process, gloo collectives).  All
processes run the identical program: build the global mesh, run one PPO
train step of a tiny pendulum config with the env batch sharded over the
global `data` axis, and dump a params checksum + metrics to a JSON file.

Usage: python multihost_worker.py <process_id> <num_processes> <port> <out>
(num_processes=1 runs the single-process baseline on 8 local devices with
no distributed init — the result the distributed runs must reproduce.)
"""

import json
import os
import sys


def main() -> None:
    process_id, num_processes = int(sys.argv[1]), int(sys.argv[2])
    port, outfile = sys.argv[3], sys.argv[4]

    n_local = 8 // num_processes
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "").replace(
            "--xla_force_host_platform_device_count=8", ""
        )
        + f" --xla_force_host_platform_device_count={n_local}"
    )

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                         ".jax_cache_cpu")
    jax.config.update("jax_compilation_cache_dir", os.path.abspath(cache))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    from jiminy_tpu import parallel

    if num_processes > 1:
        assert parallel.initialize(
            coordinator_address=f"127.0.0.1:{port}",
            num_processes=num_processes,
            process_id=process_id,
        )
        assert parallel.process_count() == num_processes
    assert len(jax.devices()) == 8, jax.devices()

    import jax.numpy as jnp

    from jiminy_tpu.envs import make
    from jiminy_tpu.gym import FlattenObservation
    from jiminy_tpu.rl import PPOConfig, make_train

    mesh = parallel.global_mesh()
    env = FlattenObservation(make("pendulum", horizon=8))
    config = PPOConfig(
        n_envs=8, n_steps=4, n_epochs=1, n_minibatches=1,
        total_iterations=1, hidden=(8, 8),
    )
    init_fn, train_step = make_train(env, config, mesh=mesh)
    state = init_fn(jax.random.PRNGKey(0))
    state, metrics = jax.jit(train_step)(state)

    checksum = float(
        sum(jnp.sum(jnp.abs(p)) for p in jax.tree.leaves(state.params))
    )
    # Env states are genuinely sharded over the global mesh: each process
    # owns only its addressable slice of the batch.
    q = state.env_state.sim.q
    n_addressable = sum(s.data.shape[0] for s in q.addressable_shards)
    result = {
        "process_id": process_id,
        "num_processes": num_processes,
        "checksum": checksum,
        "mean_reward": float(metrics["mean_reward"]),
        "q_sum": float(jnp.sum(q)),
        "n_addressable_envs": n_addressable,
        "n_global_envs": int(q.shape[0]),
    }
    with open(outfile, "w") as f:
        json.dump(result, f)
    parallel.sync_global_devices("done")
    print(f"[proc {process_id}] OK {result}", flush=True)


if __name__ == "__main__":
    main()
