"""Tracing / profiling hooks (SURVEY.md section 5.1 — the reference has
none; this framework ships jax.profiler traces + block-until-ready step
timers as first-class utilities)."""

from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a TensorBoard-compatible XLA trace around a block:

        with profiling.trace("runs/exp/trace"):
            state, _ = train_step(state, batch)
            jax.block_until_ready(state)
    """
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Wall-clock step timing with device-sync (block_until_ready), plus a
    warmup skip for compile steps. Records seconds per step and items/sec."""

    def __init__(self, warmup: int = 1):
        self.warmup = warmup
        self.times: list[float] = []
        self._count = 0
        self._t0 = None

    @contextlib.contextmanager
    def step(self, sync_on=None):
        t0 = time.perf_counter()
        yield
        if sync_on is not None:
            jax.block_until_ready(sync_on)
        dt = time.perf_counter() - t0
        self._count += 1
        if self._count > self.warmup:
            self.times.append(dt)

    @property
    def mean(self) -> float:
        return sum(self.times) / max(len(self.times), 1)

    def throughput(self, items_per_step: int) -> float:
        return items_per_step / self.mean if self.times else 0.0


def annotate(name: str):
    """Named-scope annotation for traces (shows up in the profiler UI)."""
    return jax.profiler.TraceAnnotation(name)
