"""Profiling helpers (SURVEY §5: the reference has none; we provide
jax.profiler traces and simple component timers)."""
from __future__ import annotations

import contextlib
import time
from typing import Callable, Dict

import jax


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/cppf_trace"):
    """jax.profiler trace context; view with tensorboard or xprof."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def time_fn(fn: Callable, *args, iters: int = 5, warmup: int = 1, **kwargs) -> float:
    """Steady-state seconds per call (blocks on all outputs)."""
    for _ in range(warmup):
        jax.block_until_ready(fn(*args, **kwargs))
    t0 = time.time()
    for _ in range(iters):
        jax.block_until_ready(fn(*args, **kwargs))
    return (time.time() - t0) / iters


def component_times(fns: Dict[str, Callable], iters: int = 5) -> Dict[str, float]:
    return {name: time_fn(fn, iters=iters) for name, fn in fns.items()}
