"""Tracing/profiling utilities (reference `core/include/jiminy/core/utilities/
helpers.h` ``Timer``; SURVEY §5: the TPU equivalent of the reference's wall-clock
introspection is the JAX profiler + xplane traces plus the iter/dt-failure
counters already carried in `engine.state.StepperState`).

Three tools:

- :class:`Timer` — resumable wall-clock timer mirroring the reference's
  ``Timer`` (drives e.g. user-side step timeouts; inside ``jit`` wall-clock is
  meaningless, so timeouts live at the host loop like the reference's engine
  loop checks).
- :func:`trace` — context manager around ``jax.profiler`` writing an xplane
  trace viewable in TensorBoard/XProf/Perfetto.
- :func:`timeit` — compile-once, device-synced timing of a jitted callable;
  the measurement recipe used by ``bench.py`` and ``benchmarks/``.
"""

from __future__ import annotations

import contextlib
import time
from typing import Any, Callable, Iterator, Optional

import jax

__all__ = ["Timer", "trace", "timeit"]


class Timer:
    """Resumable wall-clock timer (reference `utilities/helpers.h` Timer).

    ``tic`` starts/resumes, ``toc`` pauses and accumulates; ``elapsed`` is the
    total accumulated seconds (including the running span if active).
    """

    def __init__(self) -> None:
        self._accumulated = 0.0
        self._started_at: Optional[float] = None

    def tic(self) -> None:
        if self._started_at is None:
            self._started_at = time.perf_counter()

    def toc(self) -> float:
        if self._started_at is not None:
            self._accumulated += time.perf_counter() - self._started_at
            self._started_at = None
        return self._accumulated

    def reset(self) -> None:
        self._accumulated = 0.0
        self._started_at = None

    @property
    def is_running(self) -> bool:
        return self._started_at is not None

    @property
    def elapsed(self) -> float:
        total = self._accumulated
        if self._started_at is not None:
            total += time.perf_counter() - self._started_at
        return total


@contextlib.contextmanager
def trace(logdir: str, *, host_tracer_level: int = 2) -> Iterator[None]:
    """Record a JAX/XLA xplane trace under ``logdir``.

    View with ``tensorboard --logdir <logdir>`` (Profile tab) or xprof. Wrap
    exactly the steady-state region being studied — keep warm-up/compile
    outside the context so device kernels dominate the timeline.
    """
    options = jax.profiler.ProfileOptions()
    options.host_tracer_level = host_tracer_level
    jax.profiler.start_trace(logdir, profiler_options=options)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def timeit(
    fn: Callable[..., Any],
    *args: Any,
    n_iters: int = 10,
    n_warmup: int = 1,
) -> float:
    """Median wall-clock seconds per call of ``fn(*args)``, device-synced.

    Runs ``n_warmup`` untimed calls first (absorbing compilation), then times
    ``n_iters`` calls individually, blocking on every output leaf so device
    work is fully attributed to its call. Returns the median — robust to the
    transient stalls of the remote TPU tunnel.
    """
    for _ in range(n_warmup):
        jax.block_until_ready(fn(*args))
    samples = []
    for _ in range(n_iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        samples.append(time.perf_counter() - t0)
    samples.sort()
    mid = len(samples) // 2
    if len(samples) % 2:
        return samples[mid]
    return 0.5 * (samples[mid - 1] + samples[mid])
