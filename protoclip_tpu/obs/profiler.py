"""Profiling helpers: wall-clock timing with device sync and jax.profiler
traces (the reference has no profiling at all — SURVEY.md §5)."""

from __future__ import annotations

import contextlib
import time
from typing import Iterator

import jax


@contextlib.contextmanager
def timed(label: str = "", results: dict | None = None) -> Iterator[None]:
    """Time a block including device completion (block_until_ready on exit is
    the caller's job for async arrays; this syncs the device queue)."""
    start = time.perf_counter()
    yield
    jax.effects_barrier()
    elapsed = time.perf_counter() - start
    if results is not None:
        results[label or "elapsed"] = elapsed
    if label:
        print(f"[timed] {label}: {elapsed:.3f}s")


@contextlib.contextmanager
def trace_to(log_dir: str) -> Iterator[None]:
    """Capture a jax.profiler trace viewable in TensorBoard / Perfetto."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
