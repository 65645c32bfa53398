"""Profiling/tracing utilities (SURVEY §5 tracing line; reference Timer in
`core/include/jiminy/core/utilities/helpers.h`)."""

import os
import time

import jax
import jax.numpy as jnp

from jiminy_tpu.utils import Timer, timeit, trace


def test_timer_accumulates_and_pauses():
    t = Timer()
    assert not t.is_running and t.elapsed == 0.0
    t.tic()
    assert t.is_running
    time.sleep(0.01)
    first = t.toc()
    assert 0.005 < first < 1.0
    # Paused: elapsed must not grow
    time.sleep(0.01)
    assert t.elapsed == first
    # Resume accumulates on top
    t.tic()
    time.sleep(0.01)
    assert t.toc() > first
    t.reset()
    assert t.elapsed == 0.0 and not t.is_running


def test_timeit_times_jitted_fn():
    fn = jax.jit(lambda x: (x @ x).sum())
    x = jnp.ones((64, 64), jnp.float32)
    dt = timeit(fn, x, n_iters=5, n_warmup=1)
    assert 0.0 < dt < 5.0


def test_trace_writes_xplane(tmp_path):
    logdir = str(tmp_path / "xplane")
    fn = jax.jit(lambda x: jnp.sin(x).sum())
    x = jnp.ones((128,), jnp.float32)
    jax.block_until_ready(fn(x))  # compile outside the trace
    with trace(logdir):
        jax.block_until_ready(fn(x))
    dumped = []
    for root, _dirs, files in os.walk(logdir):
        dumped += [os.path.join(root, f) for f in files]
    assert dumped, "profiler trace produced no files"
