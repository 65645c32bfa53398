"""Train PPO on the ANYmal PD pipeline (reference: gym_jiminy RLlib examples).

Single-process, all devices: env batch sharded over the mesh, gradients
all-reduced by XLA. Checkpoints via Orbax (resumable mid-training).

    python examples/train_anymal_ppo.py --iterations 200 --n-envs 2048
"""

from __future__ import annotations

import argparse
import os
import sys

# Allow running straight from a source checkout: `python examples/...py`
_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _ROOT not in sys.path:
    sys.path.insert(0, _ROOT)

import jax
from jax.sharding import Mesh

from jiminy_tpu.envs import make
from jiminy_tpu.gym import load_pipeline
from jiminy_tpu.rl import PPOConfig, make_train
from jiminy_tpu.rl.checkpoint import restore_checkpoint, save_checkpoint


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iterations", type=int, default=100)
    ap.add_argument("--n-envs", type=int, default=1024)
    ap.add_argument("--n-steps", type=int, default=32)
    ap.add_argument("--checkpoint", default=None, help="save/restore path")
    ap.add_argument("--pipeline-toml", default=None,
                    help="optional pipeline TOML (defaults to anymal-pid)")
    ap.add_argument("--batched", action="store_true",
                    help="explicitly-batched rollouts (Pallas fast path on TPU)")
    args = ap.parse_args()

    env = (
        load_pipeline(args.pipeline_toml) if args.pipeline_toml else make("anymal-pid")
    )
    devices = jax.devices()
    mesh = Mesh(devices, ("data",)) if len(devices) > 1 else None
    config = PPOConfig(
        n_envs=args.n_envs,
        n_steps=args.n_steps,
        total_iterations=args.iterations,
        caps_temporal_reg=1e-3,
        caps_spatial_reg=1e-3,
        vectorization="batched" if args.batched else "vmap",
    )
    init_fn, train_step = make_train(env, config, mesh=mesh)
    state = init_fn(jax.random.PRNGKey(0))
    if args.checkpoint:
        try:
            state = restore_checkpoint(args.checkpoint, state)
            print(f"resumed from {args.checkpoint} at iteration {int(state.iteration)}")
        except Exception:
            pass
    step = jax.jit(train_step)
    for i in range(int(state.iteration), args.iterations):
        state, metrics = step(state)
        if i % 10 == 0:
            print(
                f"[{i}] reward={float(metrics['mean_reward']):.3f} "
                f"done={float(metrics['mean_done']):.3f} "
                f"kl={float(metrics['approx_kl']):.4f}"
            )
            if args.checkpoint:
                save_checkpoint(args.checkpoint, state)


if __name__ == "__main__":
    main()
