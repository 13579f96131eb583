"""Tracing / profiling / debug utilities.

The reference has no tracing or profiling at all (SURVEY.md §5 — only a
ProgressMeter throughput display).  TPU-native equivalents:

- :func:`trace` — context manager around ``jax.profiler`` producing Perfetto-
  compatible traces;
- :func:`timed` — ``block_until_ready`` wall-clock timing of a jitted fn with
  warmup, returning seconds/call;
- :func:`edges_per_sec` — the headline throughput counter;
- :func:`debug_mode` — enables NaN checks (``jax_debug_nans``) and disables
  jit caching surprises for numerical debugging (the role CUDA.allowscalar
  guards play in the reference, /root/reference/src/MeshGraphNets.jl:258).
"""

from __future__ import annotations

import contextlib
import time
from typing import Any, Callable

import jax

__all__ = ["trace", "timed", "edges_per_sec", "debug_mode"]


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler trace (view with Perfetto / TensorBoard)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def timed(fn: Callable, *args, iters: int = 10, warmup: int = 2, **kw) -> float:
    """Average seconds per call of ``fn`` (blocks on the output pytree)."""

    def run():
        out = fn(*args, **kw)
        jax.block_until_ready(out)
        return out

    for _ in range(warmup):
        run()
    t0 = time.perf_counter()
    for _ in range(iters):
        run()
    return (time.perf_counter() - t0) / iters


def edges_per_sec(num_edges: int, message_passing_steps: int,
                  seconds_per_step: float) -> float:
    """Edges processed per second across all message-passing rounds."""
    return num_edges * message_passing_steps / max(seconds_per_step, 1e-12)


@contextlib.contextmanager
def debug_mode(nans: bool = True, disable_jit: bool = False):
    """Numerical-debug context: NaN checks and optional jit bypass."""
    old_nans = jax.config.jax_debug_nans
    try:
        jax.config.update("jax_debug_nans", nans)
        if disable_jit:
            with jax.disable_jit():
                yield
        else:
            yield
    finally:
        jax.config.update("jax_debug_nans", old_nans)
