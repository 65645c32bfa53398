"""PGS iteration-budget study under stage-chained warm starts (round 3).

For each `pgs_iter_max`, roll a batched constraint-mode env for N env steps
and compare against the 64-iteration solution rolled from the same initial
states: max |Δq| (trajectory), max |Δλ| and mean |Δf_contact| (solver
accuracy), plus steady-state throughput.  The reference solver
(`constraint_solvers.cc:269-276`) exits early on residual stagnation with a
100-iteration cap — warm-started solves typically stagnate within a few
sweeps, which is the regime a small fixed budget reproduces.

Run on the TPU chip:  python benchmarks/pgs_study.py [env] [batch] [steps]
Env knobs: STUDY_CONTACT=constraint|spring_damper (default constraint),
STUDY_STAGE=0 disables stage-chained warm starts (A/B).
"""

import dataclasses
import json
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import jax
import jax.numpy as jnp
import numpy as np

_CACHE = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"
)
jax.config.update("jax_compilation_cache_dir", _CACHE)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def build_env(env_name, iter_max, stage_warm, contact_mode, pallas_tile):
    from jiminy_tpu.engine.config import ContactModel
    from jiminy_tpu.envs import make

    env = make(env_name)
    eng = env.engine
    opts = eng.options.replace(
        stepper=dataclasses.replace(
            eng.options.stepper,
            pgs_iter_max=iter_max,
            pgs_stage_warm_start=stage_warm,
        ),
        pallas_tile=pallas_tile,
    )
    if contact_mode:
        opts = opts.replace(
            contacts=dataclasses.replace(
                eng.options.contacts, model=ContactModel(contact_mode)
            ),
            joint_bounds_mode=(
                "constraint" if contact_mode == "constraint"
                else eng.options.joint_bounds_mode
            ),
        )
    env.engine = eng = eng.with_options(opts)
    if eng._cdyn is not None:
        eng._cdyn.pallas_tile = pallas_tile
    return env


def rollout(env, batch, n_steps, time_it=False):
    keys = jax.random.split(jax.random.PRNGKey(0), batch)
    state, _ = jax.jit(jax.vmap(env.reset))(keys)
    drop = float(os.environ.get("STUDY_DROP", "0"))
    if drop:
        # Impact-rich variant: start the base `drop` meters above the reset
        # pose so every contact goes through touchdown (active-set flips +
        # cold multipliers) instead of settled stance.
        sim = state.sim
        state = state.replace(sim=sim.replace(q=sim.q.at[..., 2].add(drop)))
    actions = jnp.zeros((batch, env.action_size), state.sim.q.dtype)

    def step_all(state, _):
        state, *_ = env.step(state, actions)
        return state, (state.sim.q, state.sim.lam, state.sim.contact_forces)

    def run(state):
        return jax.lax.scan(step_all, state, None, length=n_steps)

    run_j = jax.jit(run)
    state2, traj = run_j(state)
    jax.block_until_ready(state2.sim.q)
    dt = None
    if time_it:
        t0 = time.perf_counter()
        state3, _ = run_j(state2)
        jax.block_until_ready(state3.sim.q)
        dt = time.perf_counter() - t0
    return traj, dt


def main():
    env_name = sys.argv[1] if len(sys.argv) > 1 else "anymal-pid"
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
    n_steps = int(sys.argv[3]) if len(sys.argv) > 3 else 25
    contact_mode = os.environ.get("STUDY_CONTACT", "constraint")
    stage_warm = os.environ.get("STUDY_STAGE", "1") != "0"
    pallas_tile = int(os.environ.get("STUDY_PALLAS", "1024"))

    ref_env = build_env(env_name, 64, stage_warm, contact_mode, pallas_tile)
    (q_ref, lam_ref, f_ref), _ = rollout(ref_env, batch, n_steps)
    q_ref, lam_ref, f_ref = map(np.asarray, (q_ref, lam_ref, f_ref))
    f_scale = max(float(np.abs(f_ref).max()), 1e-9)

    for iter_max in (32, 16, 12, 8, 6, 4):
        env = build_env(env_name, iter_max, stage_warm, contact_mode, pallas_tile)
        (q, lam, f), dt = rollout(env, batch, n_steps, time_it=True)
        q, lam, f = map(np.asarray, (q, lam, f))
        print(json.dumps({
            "env": env_name,
            "contact": contact_mode,
            "stage_warm": stage_warm,
            "iter_max": iter_max,
            "max_dq": float(np.abs(q - q_ref).max()),
            "max_dlam": float(np.abs(lam - lam_ref).max()),
            "mean_df_N": float(np.abs(f - f_ref).mean()),
            "max_df_rel": float(np.abs(f - f_ref).max() / f_scale),
            "steps_per_sec": round(batch * n_steps / dt, 1) if dt else None,
        }))


if __name__ == "__main__":
    main()
