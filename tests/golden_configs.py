"""Shared builders for the golden-trajectory regression lock.

The five BASELINE.json configs, run deterministically (fixed PRNG seed, fixed
action schedule) on the CPU/f64 path.  `tests/goldens/generate.py` records
each trajectory to CSV; `tests/test_goldens.py` asserts the current code —
default path AND the per-period (fused-rollout-off) path — still reproduces
them.  The C++ reference binary cannot run in this container (PARITY.md gap
#2), so these goldens lock the repo's own f64 trajectories on the REAL
reference URDF robots; the physics itself is oracled elsewhere
(tests/test_engine.py scipy DOPRI oracles, tests/test_assets.py model parity).
"""

import numpy as np
import jax
import jax.numpy as jnp


def _actions_zero(env, n_steps):
    return np.zeros((n_steps, env.action_size))


def _actions_sin(env, n_steps):
    # Small deterministic excitation so toy trajectories are not pure decay
    t = np.arange(n_steps)[:, None]
    return 0.3 * np.sin(0.37 * t) * np.ones((1, env.action_size))


# name -> (env id, n_steps, action schedule, seed)
CONFIGS = {
    "cartpole": ("cartpole", 40, _actions_sin, 0),
    "acrobot_pendulum": (("acrobot", "pendulum"), 30, _actions_sin, 1),
    "anymal": ("anymal-pid", 20, _actions_zero, 2),
    "cassie": ("cassie-pid", 12, _actions_zero, 3),
    "atlas": ("atlas-reduced-pid", 10, _actions_zero, 4),
}


def run_config(name, use_fused_rollout=None):
    """Roll the config deterministically; returns {env_id: record dict}."""
    from jiminy_tpu.envs import make

    env_ids, n_steps, action_fn, seed = CONFIGS[name]
    if isinstance(env_ids, str):
        env_ids = (env_ids,)
    out = {}
    for i, env_id in enumerate(env_ids):
        env = make(env_id)
        if use_fused_rollout is not None and hasattr(env, "use_fused_rollout"):
            env.use_fused_rollout = use_fused_rollout
        st, _ = env.reset(jax.random.PRNGKey(seed + 1000 * i))
        actions = action_fn(env, n_steps)
        step = jax.jit(env.step)
        rows = []
        for k in range(n_steps):
            st, obs, reward, term, trunc, _ = step(st, jnp.asarray(actions[k]))
            sim = st.sim
            rows.append(
                np.concatenate(
                    [
                        [float(sim.t)],
                        np.asarray(sim.q, np.float64),
                        np.asarray(sim.v, np.float64),
                        [float(reward)],
                        np.asarray(sim.contact_forces, np.float64).ravel(),
                    ]
                )
            )
        nq = int(sim.q.shape[-1])
        nv = int(sim.v.shape[-1])
        header = (
            ["t"]
            + [f"q{j}" for j in range(nq)]
            + [f"v{j}" for j in range(nv)]
            + ["reward"]
            + [f"f{j}" for j in range(rows[0].size - nq - nv - 2)]
        )
        out[env_id] = {"header": header, "data": np.stack(rows)}
    return out


def golden_path(env_id):
    import os

    return os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "goldens", f"{env_id}.csv"
    )


def write_golden(env_id, record):
    import os

    path = golden_path(env_id)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    np.savetxt(
        path,
        record["data"],
        delimiter=",",
        header=",".join(record["header"]),
        comments="",
        fmt="%.17g",  # exact f64 round trip
    )


def read_golden(env_id):
    return np.loadtxt(golden_path(env_id), delimiter=",", skiprows=1)
