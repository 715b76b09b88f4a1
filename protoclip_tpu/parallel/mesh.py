"""Device mesh helpers and the multi-host (multi-process) entry point."""

from __future__ import annotations

import os
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def local_device_count() -> int:
    return jax.local_device_count()


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    local_device_ids: Optional[Sequence[int]] = None,
) -> bool:
    """Join this process to a multi-host JAX cluster (SCALING.md "Multi-host").

    Wraps ``jax.distributed.initialize``.  Arguments fall back to
    ``$PROTOCLIP_COORDINATOR`` / ``$PROTOCLIP_NUM_PROCESSES`` /
    ``$PROTOCLIP_PROCESS_ID``; with none set anywhere, initialization is
    attempted with cluster auto-detection (the TPU-pod environment provides
    coordinator/process info), and a single-process run — where
    auto-detection finds nothing — is silently left alone.

    Returns True when a multi-process cluster was (or already is) up,
    False for plain single-process operation.  MUST be called before any
    jax computation (backends are configured at first use).
    """
    coordinator_address = coordinator_address or os.environ.get("PROTOCLIP_COORDINATOR")
    if num_processes is None and os.environ.get("PROTOCLIP_NUM_PROCESSES"):
        num_processes = int(os.environ["PROTOCLIP_NUM_PROCESSES"])
    if process_id is None and os.environ.get("PROTOCLIP_PROCESS_ID"):
        process_id = int(os.environ["PROTOCLIP_PROCESS_ID"])

    # "already initialized?" must be probed WITHOUT touching the backend:
    # jax.process_count() itself initializes XLA, after which
    # jax.distributed.initialize refuses to run.
    try:
        from jax._src import distributed as _dist

        if _dist.global_state.client is not None:
            # read the cluster size off the distributed state rather than
            # jax.process_count(), which would initialize the backend
            return (_dist.global_state.num_processes or 1) > 1
    except Exception:
        pass
    if coordinator_address is None and num_processes is None and process_id is None:
        # no explicit cluster: try TPU-pod auto-detection, tolerate absence
        try:
            jax.distributed.initialize()
        except Exception as exc:
            # absence of a cluster is the normal single-process case, but a
            # swallowed REAL failure (unreachable coordinator, stale pod
            # env, "already initialized" after a private-API change above)
            # would silently run a multi-host pod as N independent
            # single-process jobs — at least leave a diagnostic
            import sys

            print(
                "[protoclip_tpu] multi-host auto-detection found no usable "
                f"cluster; continuing single-process ({type(exc).__name__}: {exc})",
                file=sys.stderr,
            )
            return False
        return jax.process_count() > 1
    missing = [
        name
        for name, value in (
            ("coordinator_address ($PROTOCLIP_COORDINATOR)", coordinator_address),
            ("num_processes ($PROTOCLIP_NUM_PROCESSES)", num_processes),
            ("process_id ($PROTOCLIP_PROCESS_ID)", process_id),
        )
        if value is None
    ]
    if missing:
        # a partial spec would crash deep inside jax with an opaque error;
        # name exactly what is absent instead
        raise ValueError(
            "init_distributed: explicit cluster config is incomplete — "
            f"missing {', '.join(missing)} (set all three, or none for "
            "pod auto-detection)"
        )
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        local_device_ids=local_device_ids,
    )
    return True


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
