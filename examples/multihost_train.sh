#!/usr/bin/env bash
# Two-process multi-host PPO training demo on ONE machine (CPU backend,
# 4 virtual devices per process, gloo collectives) — the same launch shape
# as a real TPU pod, where each host runs ONE of these commands and
# `jiminy_tpu.parallel.initialize()` picks the topology up from the runtime.
#
#   ./examples/multihost_train.sh [extra ppo_train.py args...]
#
# Role of the reference's Ray cluster bring-up (`rllib/utilities.py:305`).
set -euo pipefail
cd "$(dirname "$0")/.."

PORT=$(python - <<'PY'
import socket
with socket.socket() as s:
    s.bind(("127.0.0.1", 0)); print(s.getsockname()[1])
PY
)

run_proc() {
  JAX_PLATFORMS=cpu \
  XLA_FLAGS="--xla_force_host_platform_device_count=4" \
  JIMINY_COORDINATOR="127.0.0.1:${PORT}" \
  JIMINY_NUM_PROCESSES=2 \
  JIMINY_PROCESS_ID=$1 \
  python benchmarks/ppo_train.py --multihost --env pendulum \
    --envs 16 --steps 8 --iters 2 --pallas 0 "${@:2}"
}

run_proc 0 "$@" &
PID0=$!
run_proc 1 "$@" &
PID1=$!
wait $PID0 $PID1
echo "multihost training demo OK"
