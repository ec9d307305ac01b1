"""Tracing / profiling helpers.

SURVEY.md §5: the reference's only tracing is wall-clock solve timing; the
TPU rebuild wraps solves in jax.profiler traces so kernel-level timelines
are one context manager away (view with TensorBoard or xprof).
"""

from __future__ import annotations

import contextlib
import time

import jax
import jax.numpy as jnp


@contextlib.contextmanager
def trace(log_dir: str):
    """Profile a block onto disk: ``with trace('/tmp/tb'): solve(...)``."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def wall_clock(label: str = "solve", results: dict | None = None):
    """Host-side wall-clock timing (the reference's solve_time_ms analogue).
    Blocks on all outstanding device work at exit."""
    t0 = time.perf_counter()
    try:
        yield
    finally:
        # Device programs execute in launch order, so blocking on a
        # freshly-launched no-op drains everything dispatched inside the
        # block (effects_barrier alone only waits on side-effecting
        # computations, not ordinary async solves).
        jax.block_until_ready(jnp.zeros(()))
        elapsed_ms = (time.perf_counter() - t0) * 1000.0
        if results is not None:
            results[label] = elapsed_ms


def timed_solve(solve_fn, *args, **kwargs):
    """Run a solve, block until ready, and fill Solution.solve_time_ms."""
    t0 = time.perf_counter()
    sol = solve_fn(*args, **kwargs)
    sol = jax.block_until_ready(sol)
    ms = (time.perf_counter() - t0) * 1000.0
    if hasattr(sol, "replace"):
        return sol.replace(solve_time_ms=ms)
    return sol
