"""End-to-end PPO training throughput on TPU: rollout + GAE + minibatch SGD,
all inside one jitted train step (reference scale anchor: RLlib PPO with Ray
workers — here the whole loop is on-device; SURVEY §2.6/§3.5).

Usage (real TPU):
    python benchmarks/ppo_train.py [--envs 2048] [--steps 16] [--iters 5]
Prints one JSON line: aggregate env-steps/s through the FULL training loop
(sample collection + learning), single chip.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import jax

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _ROOT not in sys.path:
    sys.path.insert(0, _ROOT)
_CACHE = os.path.join(_ROOT, ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _CACHE)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--env", default="anymal-pid")
    ap.add_argument("--envs", type=int, default=2048)
    ap.add_argument("--steps", type=int, default=16)
    # Short runs under-report through the remote-dispatch pipeline (5 iters
    # measured 50x too fast once); >=25 iters amortizes the dispatch slack.
    ap.add_argument("--iters", type=int, default=25)
    ap.add_argument("--pallas", type=int, default=1024)
    ap.add_argument("--contact", default="",
                    help="override contact model, e.g. 'constraint'")
    ap.add_argument("--multihost", action="store_true",
                    help="join a jax.distributed cluster (configure via "
                         "JIMINY_COORDINATOR / JIMINY_NUM_PROCESSES / "
                         "JIMINY_PROCESS_ID, or TPU-pod auto-detection) and "
                         "run the training step over the global mesh — the "
                         "role of the reference's Ray `initialize` "
                         "(rllib/utilities.py:305)")
    args = ap.parse_args()

    mesh = None
    if args.multihost:
        from jiminy_tpu import parallel

        parallel.initialize()
        mesh = parallel.global_mesh()
        print(f"# process {parallel.process_index()}/{parallel.process_count()}"
              f" — {len(jax.devices())} global devices", file=sys.stderr)

    from jiminy_tpu.envs import make
    from jiminy_tpu.gym import FlattenObservation
    from jiminy_tpu.rl import PPOConfig, make_train

    env = make(args.env, horizon=1000)
    if args.contact:
        import dataclasses

        from jiminy_tpu.engine.config import ContactModel

        eng = env.engine
        env.engine = eng.with_options(eng.options.replace(
            contacts=dataclasses.replace(
                eng.options.contacts, model=ContactModel(args.contact)
            ),
            joint_bounds_mode=(
                "constraint" if args.contact == "constraint"
                else eng.options.joint_bounds_mode
            ),
        ))
    if args.pallas:
        env.engine.options = env.engine.options.replace(pallas_tile=args.pallas)
        if env.engine._cdyn is not None:
            env.engine._cdyn.pallas_tile = args.pallas
    env = FlattenObservation(env)

    cfg = PPOConfig(
        n_envs=args.envs,
        n_steps=args.steps,
        n_epochs=2,
        n_minibatches=4,
        total_iterations=args.iters,
        vectorization="batched" if args.pallas else "vmap",
    )
    init_fn, train_step = make_train(env, cfg, mesh=mesh)
    state = init_fn(jax.random.PRNGKey(0))
    step = jax.jit(train_step, donate_argnums=0)
    state, metrics = step(state)  # compile + warm up
    jax.block_until_ready(metrics["loss"])

    t0 = time.perf_counter()
    for _ in range(args.iters):
        state, metrics = step(state)
    jax.block_until_ready(metrics["loss"])
    elapsed = time.perf_counter() - t0

    env_steps = args.envs * args.steps * args.iters
    if mesh is None or jax.process_index() == 0:
        suffix = "" if mesh is None else f"_x{jax.process_count()}hosts"
        print(json.dumps({
            "metric": "ppo_train_env_steps_per_sec_per_chip_"
            + args.env.replace("-", "_") + suffix,
            "value": round(env_steps / elapsed, 1),
            "unit": "env-steps/s (full PPO loop)",
            "loss": float(metrics["loss"]),
        }))


if __name__ == "__main__":
    main()
