"""AOT serving export: serialize the compiled encoder to a portable bundle.

The reference deploys by shipping Python model code + torch checkpoints and
re-building the model at the target (``toolkit/.../utils/model_utils.py``).
On TPU the natural deployment artifact is the *compiled program*: this
module exports the jitted image encoder as a version-pinned StableHLO
artifact (``jax.export``) plus an ``.npz`` of weights and a JSON manifest —
a serving process needs jax and this bundle, not the model-building code,
and the artifact is immune to model-code drift.

Weights stay jit ARGUMENTS (never baked constants — see CLAUDE.md): the
StableHLO stays small (KBs), weight swaps don't invalidate it, and the
remote-compile payload limit is never hit.

Bundle layout (a directory)::

    manifest.json     {"backbone", "image_resolution", "embed_dim", ...}
    encoder.shlo      serialized jax.export artifact
    params.npz        flattened param pytree (path-keyed)

Example::

    from protoclip_tpu.io.export import save_serving_bundle, load_serving_bundle
    save_serving_bundle("bundle/", cfg, params, batch_size=256)
    encode = load_serving_bundle("bundle/")      # (B,H,W,3) uint8 -> (B,d) fp32
"""

from __future__ import annotations

import json
import os
from typing import Callable, Optional, Sequence

import numpy as np

_MANIFEST = "manifest.json"
_ARTIFACT = "encoder.shlo"
_PARAMS = "params.npz"
_SEP = "/"  # pytree path separator inside the npz


def _flatten(params) -> tuple:
    """(path-keyed npz-safe arrays, {path: original dtype name}).

    numpy cannot serialize ml_dtypes (bfloat16 round-trips ``.npz`` as a
    void ``|V2`` and is destroyed) — such leaves are widened to fp32 for
    storage and their true dtype recorded for the loader to restore."""
    import jax

    flat, dtypes = {}, {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        key = _SEP.join(
            str(getattr(p, "key", getattr(p, "idx", p))) for p in path
        )
        arr = np.asarray(leaf)
        if arr.dtype.kind == "V":  # ml_dtypes leaf (bfloat16, fp8, ...)
            dtypes[key] = arr.dtype.name
            arr = arr.astype(np.float32)
        flat[key] = arr
    return flat, dtypes


def _unflatten(flat: dict):
    """Rebuild the nested dict/list pytree from path-keyed arrays."""
    root: dict = {}
    for key, value in flat.items():
        parts = key.split(_SEP)
        node = root
        for part in parts[:-1]:
            node = node.setdefault(part, {})
        node[parts[-1]] = value

    def listify(node):
        if not isinstance(node, dict):
            return node
        node = {k: listify(v) for k, v in node.items()}
        if node and all(k.isdigit() for k in node):
            return [node[str(i)] for i in range(len(node))]
        return node

    return listify(root)


def make_encode_fn(cfg, normalize: bool = True) -> Callable:
    """The canonical serving encode: ``(params, images_u8) -> (B, d) fp32``
    — device-side ToTensor+Normalize, bf16 tower, fp32 output, optional L2
    normalization.  The single definition shared by the extract CLI, the
    serving export, and benchmarks (semantics of ``utils.py:303-316``'s
    encode in the reference)."""
    import jax.numpy as jnp

    from protoclip_tpu.data.transforms import normalize_batch
    from protoclip_tpu.models import encode_image

    def encode(params, images_u8):
        feats = encode_image(params, normalize_batch(images_u8, jnp.bfloat16), cfg)
        feats = feats.astype(jnp.float32)
        if normalize:
            feats = feats / jnp.linalg.norm(feats, axis=-1, keepdims=True)
        return feats

    return encode


def save_serving_bundle(
    path: str,
    cfg,
    params,
    batch_size: int = 256,
    *,
    int8: bool = False,
    normalize: bool = True,
    platforms: Optional[Sequence[str]] = None,
) -> None:
    """Export the encoder for ``cfg``/``params`` at a fixed ``batch_size``.

    ``int8`` exports the W8A8 serving path (requires the Pallas kernels to
    lower for the target platform — export on/for TPU).  ``platforms``
    pins the target platforms (default: the current backend).
    """
    import jax
    import jax.numpy as jnp
    from jax import export as jax_export

    # set BOTH ways: a bare `= "1"` would leak a previous int8=True export
    # into later non-int8 traces in the same process
    os.environ["PROTOCLIP_INT8"] = "1" if int8 else "0"

    encode = make_encode_fn(cfg, normalize=normalize)
    n_px = cfg.image_resolution
    # metadata only — np.asarray here would FETCH every device leaf to host
    param_shapes = jax.tree_util.tree_map(
        lambda a: jax.ShapeDtypeStruct(
            np.shape(a), getattr(a, "dtype", None) or np.asarray(a).dtype
        ),
        params,
    )
    image_shape = jax.ShapeDtypeStruct((batch_size, n_px, n_px, 3), jnp.uint8)
    kwargs = {"platforms": tuple(platforms)} if platforms else {}
    artifact = jax_export.export(jax.jit(encode), **kwargs)(
        param_shapes, image_shape
    )

    flat, leaf_dtypes = _flatten(params)
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, _ARTIFACT), "wb") as fh:
        fh.write(artifact.serialize())
    np.savez(os.path.join(path, _PARAMS), **flat)
    manifest = {
        "format": "protoclip_tpu.serving_bundle.v1",
        "backbone_embed_dim": int(cfg.embed_dim),
        "image_resolution": int(n_px),
        "batch_size": int(batch_size),
        "int8": bool(int8),
        "normalized": bool(normalize),
        "platforms": list(artifact.platforms),
        "jax_version": jax.__version__,
        # ml_dtypes leaves are stored widened to fp32 (npz cannot hold
        # bfloat16); the loader restores these dtypes before device_put
        "param_dtypes": leaf_dtypes,
    }
    with open(os.path.join(path, _MANIFEST), "w") as fh:
        json.dump(manifest, fh, indent=1)


def load_serving_bundle(path: str) -> Callable[[np.ndarray], np.ndarray]:
    """Load a bundle; returns ``encode(images_u8) -> (B, d) fp32`` with the
    manifest dict attached as ``encode.manifest``."""
    import jax
    from jax import export as jax_export

    with open(os.path.join(path, _MANIFEST)) as fh:
        manifest = json.load(fh)
    if manifest.get("format") != "protoclip_tpu.serving_bundle.v1":
        raise ValueError(f"not a protoclip_tpu serving bundle: {path}")
    with open(os.path.join(path, _ARTIFACT), "rb") as fh:
        artifact = jax_export.deserialize(fh.read())
    leaf_dtypes = manifest.get("param_dtypes", {})
    with np.load(os.path.join(path, _PARAMS)) as npz:
        flat = {
            k: npz[k].astype(leaf_dtypes[k]) if k in leaf_dtypes else npz[k]
            for k in npz.files
        }
    # device_put ONCE: weights must not re-cross host->device per batch
    # (the serving hot path; see CLAUDE.md on hot-path transfers)
    params = jax.device_put(_unflatten(flat))

    batch = manifest["batch_size"]
    n_px = manifest["image_resolution"]

    def encode(images_u8: np.ndarray) -> np.ndarray:
        images_u8 = np.asarray(images_u8, np.uint8)
        if images_u8.shape != (batch, n_px, n_px, 3):
            raise ValueError(
                f"bundle compiled for {(batch, n_px, n_px, 3)}, "
                f"got {images_u8.shape}"
            )
        return np.asarray(artifact.call(params, images_u8))

    encode.manifest = manifest
    return encode
