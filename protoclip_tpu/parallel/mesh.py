"""Device mesh helpers."""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def local_device_count() -> int:
    return jax.local_device_count()


def make_mesh(
    n_devices: Optional[int] = None, axis_names: Sequence[str] = ("data",)
) -> Mesh:
    """Build a mesh over the first ``n_devices`` devices.

    One axis (``data``) is the natural layout for Proto-CLIP: every program is
    embarrassingly batch-parallel, so a flat ring maximizes ICI utilization.
    Multi-axis names are accepted for forward-compatibility (the trailing
    axes get size 1).
    """
    devices = jax.devices()
    n = n_devices or len(devices)
    if n > len(devices):
        raise ValueError(f"requested {n} devices, only {len(devices)} available")
    shape = (n,) + (1,) * (len(axis_names) - 1)
    return Mesh(np.asarray(devices[:n]).reshape(shape), axis_names)
