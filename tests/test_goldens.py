"""Golden-trajectory regression lock (BASELINE.json configs, f64 CPU).

Asserts the five baseline configs — real-URDF robots, fixed seeds, fixed
action schedules — reproduce the checked-in CSVs on BOTH the default path
(fused rollout where supported) and the per-period scan path.  Tolerance is
1e-10: any physics change must come with a reviewed golden regeneration
(tests/goldens/generate.py).  Parity strategy per reference
`test_simple_pendulum.py:27`; the C++ binary itself cannot run here, so the
physics is oracled by tests/test_engine.py (scipy) and these goldens lock
full-pipeline trajectories against drift.
"""

import numpy as np
import pytest

from golden_configs import CONFIGS, read_golden, run_config

FAST = ["cartpole", "acrobot_pendulum", "anymal"]
SLOW = ["cassie", "atlas"]


def _check(name, use_fused_rollout=None):
    for env_id, record in run_config(name, use_fused_rollout=use_fused_rollout).items():
        golden = read_golden(env_id)
        got = record["data"]
        assert got.shape == golden.shape, env_id
        np.testing.assert_allclose(
            got, golden, atol=1e-10, rtol=0.0,
            err_msg=f"{env_id} (fused={use_fused_rollout})",
        )


@pytest.mark.parametrize("name", FAST)
def test_golden_default_path(name):
    _check(name)


@pytest.mark.parametrize("name", FAST)
def test_golden_per_period_path(name):
    _check(name, use_fused_rollout=False)


@pytest.mark.slow
@pytest.mark.parametrize("name", SLOW)
def test_golden_default_path_slow(name):
    _check(name)


@pytest.mark.slow
@pytest.mark.parametrize("name", SLOW)
def test_golden_per_period_path_slow(name):
    _check(name, use_fused_rollout=False)
