"""Sharding specs and sharded program builders.

Layout policy (scaling-book recipe: pick a mesh, annotate shardings, let XLA
insert collectives):

- CLIP weights, memory banks, adapter, optimizer state: **replicated** —
  they are tiny next to activations and every chip needs all of them.
- Image batches / token batches / feature batches: **sharded on axis 0**
  over the ``data`` mesh axis.
- Per-batch metrics: XLA inserts the ``psum`` when reducing a sharded array
  to a replicated scalar; no hand-written collectives needed.
"""

from __future__ import annotations

from typing import Callable

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard axis 0 over the ``data`` mesh axis."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(arr, mesh: Mesh):
    """Place a host batch sharded over the mesh (axis 0).

    Multi-process aware: when the mesh spans several processes (multi-host,
    SCALING.md), every process passes the same FULL global batch and keeps
    only its addressable shards (``jax.make_array_from_process_local_data``
    with ``global_shape == local shape``) — ``device_put`` alone cannot
    address the remote devices.  An input that is already a jax array with
    the target sharding passes through untouched.
    """
    sharding = batch_sharding(mesh)
    if isinstance(arr, jax.Array) and arr.sharding == sharding:
        return arr
    if jax.process_count() > 1:
        import numpy as np

        local = np.asarray(arr)
        return jax.make_array_from_process_local_data(
            sharding, local, global_shape=local.shape
        )
    return jax.device_put(arr, sharding)


def fetch_to_host(arr) -> "jax.Array":
    """Materialize an array on the host, multi-process safe.

    A batch-sharded global array in a multi-host cluster is not fully
    addressable — plain ``np.asarray`` raises.  Gather every process's
    shards first (``process_allgather`` rides the same ICI/DCN collectives
    as the compute).  Single-process arrays pass straight to numpy.
    """
    import numpy as np

    if isinstance(arr, jax.Array) and not arr.is_fully_addressable:
        from jax.experimental import multihost_utils

        return np.asarray(multihost_utils.process_allgather(arr, tiled=True))
    return np.asarray(arr)


def make_sharded_encode(
    encode_fn: Callable, mesh: Mesh
) -> Callable:
    """``encode_fn(params, images) -> features`` with images/features
    sharded over ``data`` and params replicated.

    Uses ``shard_map`` (not bare jit partitioning): each device runs the
    whole encode — including the Pallas fused-block kernels, which are
    opaque custom calls the SPMD partitioner cannot split — on its local
    batch shard.  Encode has no cross-device math, so per-shard execution
    is exact; XLA still fuses across the shard_map boundary."""
    try:
        from jax import shard_map
    except ImportError:  # older jax: experimental namespace
        from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    # check_vma off: the encode body may contain Pallas kernels (fused
    # block / int8 W8A8), whose pallas_call out_shapes declare no varying-
    # mesh-axes metadata — shard_map's replication checker rejects them.
    # The check proves nothing here anyway: encode is row-local by
    # construction (every output row depends only on its own batch shard).
    kwargs = {"mesh": mesh, "in_specs": (P(), P("data")), "out_specs": P("data")}
    try:
        local = shard_map(encode_fn, check_vma=False, **kwargs)
    except TypeError:  # older jax spells it check_rep
        local = shard_map(encode_fn, check_rep=False, **kwargs)
    return jax.jit(
        local,
        in_shardings=(replicated(mesh), batch_sharding(mesh)),
        out_shardings=batch_sharding(mesh),
    )


def shard_qt_step(step_fn: Callable, mesh: Mesh) -> Callable:
    """jit the Q^T train step with batch inputs sharded over ``data``.

    Signature: ``step(params, opt_state, clip_params, frozen_bank_t,
    images, labels, n_valid, lr)``.  Params/optimizer state/CLIP weights
    and the frozen textual bank replicate; the
    frozen-encode activations (the memory giant) shard by batch; the loss
    reduction induces a psum.
    """
    rep, bat = replicated(mesh), batch_sharding(mesh)
    return jax.jit(
        step_fn,
        in_shardings=(rep, rep, rep, rep, bat, bat, rep, rep),
        out_shardings=(rep, rep, rep),
        donate_argnums=(0, 1),
    )
