"""Profiling helpers: device traces + honest wall timing on axon.

The reference's only tracing is wall-clock prints around prune/infer
(sps_node.py:164-176). Here: jax.profiler device traces plus an
honest-timing context that accounts for the axon runtime's async dispatch
(see docs/DESIGN.md §4)."""

from __future__ import annotations

import contextlib
import time

import jax
import jax.numpy as jnp


def latch_sync_mode() -> None:
    """Force the (axon) runtime into synchronous dispatch so wall-clock
    timing reflects true device time. Irreversible for the process; do it
    once, before any timing."""
    _ = int(jax.jit(lambda: jnp.int32(1))())


@contextlib.contextmanager
def device_trace(log_dir: str):
    """Capture a jax.profiler trace (view in TensorBoard/perfetto)."""
    with jax.profiler.trace(log_dir):
        yield


class StageTimer:
    """Accumulates wall time per named stage (the reference's T/P/I log)."""

    def __init__(self):
        self.totals: dict[str, float] = {}
        self.counts: dict[str, int] = {}

    @contextlib.contextmanager
    def stage(self, name: str, block_on=None):
        t0 = time.perf_counter()
        yield
        if block_on is not None:
            jax.block_until_ready(block_on)
        self.totals[name] = self.totals.get(name, 0.0) + time.perf_counter() - t0
        self.counts[name] = self.counts.get(name, 0) + 1

    def summary(self) -> dict[str, float]:
        return {
            k: self.totals[k] / max(self.counts[k], 1) for k in sorted(self.totals)
        }
