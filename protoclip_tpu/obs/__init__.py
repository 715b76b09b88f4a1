"""Observability: metric logging (TensorBoard-compatible), t-SNE plots,
profiling helpers.  The reference's observability is TensorBoard scalars +
matplotlib plots (``main.py:287-302,372-378``; ``utils.py:125-222``)."""

from protoclip_tpu.obs.logging import MetricLogger
from protoclip_tpu.obs.profiler import timed, trace_to

__all__ = ["MetricLogger", "timed", "trace_to"]
