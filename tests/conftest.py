"""Test configuration: run everything on CPU in float64 with a virtual 8-device mesh.

Parity/oracle tests require float64 (the reference validates against scipy at 1e-7
tolerance); TPU throughput uses float32 — the tolerance ladder is validated on CPU.
Multi-chip sharding is exercised on 8 virtual CPU devices, mirroring how the driver
dry-runs the multi-chip path.
"""

import os

# Force-set: the harness presets JAX_PLATFORMS to the TPU plugin; tests must run on
# the host CPU (float64 + virtual multi-device mesh).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# Persistent compilation cache: the fused component-wise graphs are slow to
# compile on CPU XLA (minutes); caching makes repeat test runs fast.
_CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache_cpu")
jax.config.update("jax_compilation_cache_dir", os.path.abspath(_CACHE))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import pytest  # noqa: E402

# Two-tier suite: the fused whole-period f64 graphs of the big walker models
# compile for many minutes EACH on CPU XLA, so the handful of tests that build
# them are marked `slow` and deselected by default — `pytest tests/ -q` must
# stay green from a cold cache in < 20 min (every slow test has a small-model
# fast variant in the default tier).  Opt in with `--slow` or JIMINY_SLOW=1.


def pytest_addoption(parser):
    parser.addoption(
        "--slow", action="store_true", default=False,
        help="also run tests marked slow (compile-heavy fused graphs)",
    )


def pytest_collection_modifyitems(config, items):
    if config.getoption("--slow") or os.environ.get("JIMINY_SLOW"):
        return
    skip = pytest.mark.skip(reason="slow (run with --slow or JIMINY_SLOW=1)")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)
