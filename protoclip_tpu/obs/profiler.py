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


def enable_compilation_cache(min_compile_secs: float = 1.0) -> None:
    """Turn on jax's persistent executable cache.

    Remote-tunnel compiles can take many minutes; caching makes repeated
    bench/entry runs near-instant.  Directory from
    ``$JAX_COMPILATION_CACHE_DIR`` (default ``~/.cache/jax_comp_cache``).
    The single definition shared by ``bench.py``, ``__graft_entry__.py``
    and the ``scripts/`` micro-benches — keep cache policy changes here.
    """
    import os

    try:
        cache_dir = os.environ.get(
            "JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/jax_comp_cache")
        )
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", min_compile_secs)
    except Exception:
        pass  # older jax or unsupported backend: benign
