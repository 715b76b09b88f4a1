"""Profiling helpers: wall-clock timing with device sync and jax.profiler
traces (the reference has no profiling at all — SURVEY.md §5)."""

from __future__ import annotations

import contextlib
import time
from typing import Iterator

import jax


@contextlib.contextmanager
def timed(label: str = "", results: dict | None = None) -> Iterator[None]:
    """Wall-clock a block of HOST work.

    This does NOT await device execution of pure computations:
    ``jax.effects_barrier()`` only drains effect tokens, and on the remote
    TPU backend even ``block_until_ready`` does not await execution
    (CLAUDE.md environment rules).  To time device work, materialize a
    scalar checksum inside the block — ``np.asarray(jnp.sum(out))`` — as
    ``bench.py`` does; then this records the true end-to-end time."""
    start = time.perf_counter()
    yield
    jax.effects_barrier()  # best-effort: drains any effectful ops
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
