"""Headline benchmark: batched ANYmal PD-control pipeline throughput on one chip.

Matches the reference's own benchmark shape (`python/gym_jiminy/examples/
pipeline_benchmark.py`: full PD pipeline, 40 ms env steps, 1 ms physics,
measured in env-steps/s; reference single-core figure ≈ 3 650 steps/s) but
batched: B envs stepped in lock-step under one jit on the TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp

# Persistent compilation cache: first compile of the fused program takes
# ~10-25 min through the remote-compile relay; subsequent runs are seconds.
_CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _CACHE)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

REFERENCE_STEPS_PER_SEC = 3650.0  # pipeline_benchmark.py:46 (1 env, 1 CPU core)


def main():
    # Default sized from the measured v5e throughput curve on the real-URDF
    # ANYmal (round 5): 8192 -> 1.54M, 16384 -> 1.72M, 32768 -> 1.82M,
    # 65536 -> 1.87M, 131072 -> 1.89M env-steps/s (fused whole-env-step
    # rollout, tile 1024).
    batch = int(os.environ.get("BENCH_BATCH", "131072"))
    n_steps = int(os.environ.get("BENCH_STEPS", "25"))
    env_name = os.environ.get("BENCH_ENV", "anymal-pid")

    from jiminy_tpu.envs import make

    env = make(env_name)
    # Tile default by model size: small-state models (toys) are launch-bound
    # at 1024 and scale with the tile (cartpole B=131072 on v5e: 1024 ->
    # 8.5M, 2048 -> 13.2M, 4096 -> 18.1M, 8192 -> 19.2M env-steps/s);
    # walker-class models (nv ~ 18-36) measured fastest at 1024.
    tile_default = 8192 if env.engine.robot.nv <= 8 else 1024
    pallas_tile = int(os.environ.get("BENCH_PALLAS", str(tile_default)))
    pgs_iters = int(os.environ.get("BENCH_PGS_ITERS", "0"))
    if pgs_iters:
        # Constraint-solver iteration knob (accuracy study: see
        # docs/performance.md — warm-started ANYmal standing converges to
        # ~1e-9 of the 64-iteration solution by 16 iterations).
        import dataclasses as _dc

        eng = env.engine
        eng.__init__(
            eng.robot,
            eng.options.replace(
                stepper=_dc.replace(eng.options.stepper, pgs_iter_max=pgs_iters)
            ),
        )
    contact_mode = os.environ.get("BENCH_CONTACT", "")
    if contact_mode:
        # e.g. BENCH_CONTACT=constraint — the reference's default contact
        # model (cone-friction PGS); BASELINE config #4 shape for Cassie.
        import dataclasses

        from jiminy_tpu.engine.config import ContactModel

        eng = env.engine
        opts = eng.options.replace(
            contacts=dataclasses.replace(
                eng.options.contacts, model=ContactModel(contact_mode)
            ),
            joint_bounds_mode=(
                "constraint" if contact_mode == "constraint"
                else eng.options.joint_bounds_mode
            ),
        )
        eng.__init__(eng.robot, opts)
    if pallas_tile:
        # Rebuild the fused dynamics with the Pallas megakernel enabled; the
        # env layer is batch-transparent, so the whole pipeline steps on
        # explicitly-batched states (no outer vmap) and the dynamics eval runs
        # as ONE TPU kernel per tile.
        env.engine.options = env.engine.options.replace(pallas_tile=pallas_tile)
        if env.engine._cdyn is not None:
            env.engine._cdyn.pallas_tile = pallas_tile
    if hasattr(env, "use_fused_rollout"):
        # BENCH_FUSED=0 forces the per-controller-period scan instead of the
        # whole-env-step fused rollout kernel (A/B knob).
        env.use_fused_rollout = os.environ.get("BENCH_FUSED", "1") != "0"

    keys = jax.random.split(jax.random.PRNGKey(0), batch)
    reset = jax.jit(jax.vmap(env.reset))
    state, obs = reset(keys)
    jax.block_until_ready(state.sim.q)

    actions = jnp.zeros((batch, env.action_size), state.sim.q.dtype)

    if pallas_tile:

        def step_all(state, _):
            state, obs, reward, term, trunc, _ = env.step(state, actions)
            return state, None

    else:

        def step_all(state, _):
            state, obs, reward, term, trunc, _ = jax.vmap(env.step)(state, actions)
            return state, None

    def run_chunk(state):
        state, _ = jax.lax.scan(step_all, state, None, length=n_steps)
        return state

    run = jax.jit(run_chunk, donate_argnums=0)
    # Warm-up/compile
    state = run(state)
    jax.block_until_ready(state.sim.q)

    t0 = time.perf_counter()
    state = run(state)
    jax.block_until_ready(state.sim.q)
    elapsed = time.perf_counter() - t0

    # Sanity (outside the timed region): the measured work must be physical
    import numpy as np

    q_final = np.asarray(state.sim.q)
    assert np.isfinite(q_final).all(), "non-finite states after benchmark run"

    steps_per_sec = batch * n_steps / elapsed
    result = {
        "metric": "env_steps_per_sec_per_chip_"
        + env_name.replace("-", "_").replace("pid", "pd"),
        "value": round(steps_per_sec, 1),
        "unit": "env-steps/s",
        "vs_baseline": round(steps_per_sec / REFERENCE_STEPS_PER_SEC, 2),
    }
    print(json.dumps(result))
    return result


if __name__ == "__main__":
    # The remote TPU tunnel occasionally throws transient FAILED_PRECONDITION
    # errors; retry a couple of times before giving up.
    for attempt in range(3):
        try:
            main()
            break
        except Exception as exc:  # noqa: BLE001
            if attempt == 2:
                raise
            print(f"# bench attempt {attempt + 1} failed ({exc}); retrying",
                  file=sys.stderr)
            time.sleep(10.0)
