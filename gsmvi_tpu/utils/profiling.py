"""Timing / tracing helpers (reference has none; SURVEY.md §5 tracing row).

- ``time_fn``        — compile-isolated wall timing with ``block_until_ready``.
- ``fit_throughput`` — iterations/s + score-evals/s for a fitter closure.
- ``trace``          — context manager around ``jax.profiler`` for TensorBoard
  traces of fit loops.
- ``nan_debug``      — toggle ``jax_debug_nans`` (SURVEY.md §5 sanitizer row).
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable

import jax


def time_fn(fn: Callable, *args, warmup: int = 1, iters: int = 5, **kwargs):
    """Median wall time of ``fn(*args)`` with device sync; compiles excluded."""
    for _ in range(warmup):
        jax.block_until_ready(fn(*args, **kwargs))
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args, **kwargs))
        times.append(time.perf_counter() - t0)
    times.sort()
    return times[len(times) // 2]


def fit_throughput(fit_fn: Callable, niter: int, batch_size: int,
                   warmup_fit: bool = True):
    """Run ``fit_fn()`` (a zero-arg closure performing a fit of ``niter``
    iterations) and report {iters_per_s, score_evals_per_s, seconds}."""
    if warmup_fit:
        jax.block_until_ready(fit_fn())
    t0 = time.perf_counter()
    jax.block_until_ready(fit_fn())
    dt = time.perf_counter() - t0
    total_iters = niter + 1
    return {
        "seconds": dt,
        "iters_per_s": total_iters / dt,
        "score_evals_per_s": total_iters * batch_size / dt,
    }


@contextlib.contextmanager
def trace(logdir: str):
    """Profile a block into ``logdir`` (view with TensorBoard's profiler)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def nan_debug(enable: bool = True):
    """Temporarily enable jax_debug_nans around a block."""
    prev = jax.config.jax_debug_nans
    jax.config.update("jax_debug_nans", enable)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", prev)
