"""Profiling and observability helpers.

The reference's only instrumentation is render()'s wall-clock/sim-time
printout (BaseAviary.py:404-406) and sleep-based pacing (utils.py:10-29).
Here profiling is first-class: `jax.profiler` trace capture, steps/s
throughput measurement with proper `block_until_ready` fencing, and a
realtime-factor report with the reference's semantics.
"""

import contextlib
import time
from typing import Callable

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a `jax.profiler` trace viewable in TensorBoard/Perfetto."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def measure_throughput(step_fn: Callable, state, *args, iters: int = 10,
                       warmup: int = 2, items_per_call: int = 1):
    """items/s of a jitted state-threading step `state' = step(state, *args)`.

    Compiles/warms first, then times `iters` chained calls with a single
    device fence at the end (the steady-state pattern of the bench harness).
    """
    for _ in range(warmup):
        out = step_fn(state, *args)
        state = out[0] if isinstance(out, tuple) else out
    jax.block_until_ready(state)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = step_fn(state, *args)
        state = out[0] if isinstance(out, tuple) else out
    jax.block_until_ready(state)
    dt = time.perf_counter() - t0
    return items_per_call * iters / dt, state


class RealtimeMonitor:
    """Accumulates sim-time vs wall-time (BaseAviary.render realtime factor)."""

    def __init__(self, sim_freq_hz: float):
        self.sim_freq_hz = sim_freq_hz
        self.start = time.time()
        self.sim_steps = 0

    def add_steps(self, n: int):
        self.sim_steps += n

    @property
    def sim_time(self) -> float:
        return self.sim_steps / self.sim_freq_hz

    @property
    def wall_time(self) -> float:
        return time.time() - self.start

    @property
    def realtime_factor(self) -> float:
        w = self.wall_time
        return self.sim_time / w if w > 0 else 0.0

    def report(self) -> str:
        return (f"wall-clock time {self.wall_time:.1f}s, "
                f"simulation time {self.sim_time:.1f}s@{self.sim_freq_hz:.0f}Hz "
                f"({self.realtime_factor:.2f}x)")
