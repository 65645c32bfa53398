"""Multi-host distribution: 2 jax.distributed controller processes (4 virtual
CPU devices each, gloo collectives) run one sharded PPO train step and must
reproduce the single-process 8-device result (VERDICT r4 item 1; reference
role `rllib/utilities.py:305` cluster init + EnvRunnerGroup env sharding)."""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

_WORKER = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "multihost_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _clean_env():
    env = dict(os.environ)
    # The pytest process pins JAX_PLATFORMS/XLA_FLAGS; workers set their own.
    env.pop("JAX_PLATFORMS", None)
    env.pop("XLA_FLAGS", None)
    env["PYTHONPATH"] = (
        os.path.dirname(os.path.dirname(_WORKER))
        + os.pathsep + env.get("PYTHONPATH", "")
    )
    return env


def _run_workers(num_processes: int, tmpdir) -> list:
    port = _free_port()
    procs, outfiles = [], []
    for pid in range(num_processes):
        out = os.path.join(str(tmpdir), f"result_{num_processes}_{pid}.json")
        outfiles.append(out)
        procs.append(
            subprocess.Popen(
                [sys.executable, _WORKER, str(pid), str(num_processes),
                 str(port), out],
                env=_clean_env(),
                stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT,
            )
        )
    results = []
    for p, out in zip(procs, outfiles):
        stdout, _ = p.communicate(timeout=900)
        assert p.returncode == 0, stdout.decode()[-3000:]
        with open(out) as f:
            results.append(json.load(f))
    return results


@pytest.mark.multihost
def test_two_process_ppo_matches_single_process(tmp_path):
    single = _run_workers(1, tmp_path)[0]
    assert single["n_addressable_envs"] == 8

    double = _run_workers(2, tmp_path)
    for r in double:
        # Env batch is sharded per host: each process addresses only half
        assert r["n_global_envs"] == 8
        assert r["n_addressable_envs"] == 4
        # Learner state is replicated and identical on both processes, and
        # matches the single-process run (same global program, same seed).
        np.testing.assert_allclose(
            r["checksum"], single["checksum"], rtol=1e-9
        )
        np.testing.assert_allclose(
            r["mean_reward"], single["mean_reward"], rtol=1e-9
        )
        np.testing.assert_allclose(r["q_sum"], single["q_sum"], rtol=1e-9)
