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

    manifest.json     {"backbone", "image_resolution", "batch_size", ...}
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


def _bucket_artifact(size: int) -> str:
    return f"encoder_b{size}.shlo"


def _flatten(params) -> tuple:
    """(path-keyed npz-safe arrays, {path: original dtype name}).

    numpy cannot serialize ml_dtypes (bfloat16 round-trips ``.npz`` as a
    void ``|V2`` and is destroyed) — such leaves are stored as same-width
    unsigned-int BIT VIEWS (bf16 -> uint16, fp8 -> uint8) with their true
    dtype recorded for the loader to view back.  A bit view keeps the
    artifact at the weights' native size; the earlier fp32 widening
    doubled every bundle (ViT-L/14: +600 MB)."""
    import jax

    flat, dtypes = {}, {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        key = _SEP.join(
            str(getattr(p, "key", getattr(p, "idx", p))) for p in path
        )
        arr = np.asarray(leaf)
        if arr.dtype.kind == "V":  # ml_dtypes leaf (bfloat16, fp8, ...)
            dtypes[key] = arr.dtype.name
            arr = arr.view(np.dtype(f"uint{arr.dtype.itemsize * 8}"))
        flat[key] = arr
    return flat, dtypes


def _seq_nodes(node, prefix=()) -> dict:
    """{path: "list"|"tuple"} for every sequence node in the pytree.

    Recorded in the manifest so the loader rebuilds the EXACT structure the
    artifact was traced with — a digit-keyed *dict* must stay a dict and a
    tuple must come back a tuple, or ``artifact.call`` raises a
    tree-structure mismatch.  (A guessing heuristic at load time corrupts
    both cases.)"""
    out: dict = {}
    if isinstance(node, dict):
        items = [(str(k), v) for k, v in node.items()]
    elif isinstance(node, (list, tuple)):
        out[_SEP.join(prefix)] = (
            "tuple" if isinstance(node, tuple) else "list"
        )
        items = [(str(i), v) for i, v in enumerate(node)]
    else:
        return out
    for key, child in items:
        out.update(_seq_nodes(child, prefix + (key,)))
    return out


def _unflatten(flat: dict, seq_nodes: dict):
    """Rebuild the nested pytree from path-keyed arrays + the recorded
    sequence-node map (see ``_seq_nodes``)."""
    root: dict = {}
    for key, value in flat.items():
        parts = key.split(_SEP)
        node = root
        for part in parts[:-1]:
            node = node.setdefault(part, {})
        node[parts[-1]] = value

    def rebuild(node, prefix):
        if not isinstance(node, dict):
            return node
        kind = seq_nodes.get(_SEP.join(prefix))
        if kind:
            seq = [rebuild(node[str(i)], prefix + (str(i),)) for i in range(len(node))]
            return tuple(seq) if kind == "tuple" else seq
        return {k: rebuild(v, prefix + (k,)) for k, v in node.items()}

    return rebuild(root, ())


def make_encode_fn(cfg, normalize: bool = True) -> Callable:
    """The canonical serving encode: ``(params, images_u8) -> (B, d) fp32``
    — device-side ToTensor+Normalize, bf16 tower, fp32 output, optional L2
    normalization.  The single definition shared by the extract CLI and the
    serving export (semantics of ``utils.py:303-316``'s encode in the
    reference; ``bench.py`` deliberately measures the raw tower under a
    checksum scan instead — see its docstring)."""
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
    batch_sizes: Optional[Sequence[int]] = None,
    int8: bool = False,
    normalize: bool = True,
    platforms: Optional[Sequence[str]] = None,
) -> None:
    """Export the encoder for ``cfg``/``params`` at a fixed ``batch_size``.

    ``batch_sizes`` additionally exports BUCKETED executables (e.g.
    ``(8, 64, 256)``): the loader pads each call to the smallest compiled
    bucket that fits, so an underfull dispatch does not pay the full
    max-batch compute — a 1-image request on a 256-only bundle burns 256x
    the necessary FLOPs.  Per-image math is row-local (LayerNorm/attention
    act within an image's own tokens), so bucket SEMANTICS are identical
    (asserted in ``tests/test_export.py``; interpret-mode int8 buckets are
    bit-identical).  On real hardware each bucket is a distinct compiled
    program whose MXU tiling moves fp intermediates by ~1 ULP — invisible
    in bf16 (<=1e-5 on features) but amplified by int8 rounding to a full
    quantization step when a value sits at a boundary (measured 2.5e-3 on
    unit-norm ViT-B/16 features, inside the int8 mode's >0.995-cosine
    budget; ``scripts/validate_bundle_tpu.py`` checks buckets with
    mode-appropriate tolerances).  ``batch_size`` is always included and
    remains the compiled maximum.

    ``int8`` exports the W8A8 serving path (requires the Pallas kernels to
    lower for the target platform — export on/for TPU).  ``platforms``
    pins the target platforms (default: the current backend).
    """
    import jax
    import jax.numpy as jnp
    from jax import export as jax_export

    from protoclip_tpu.ops.pallas_kernels import pallas_enabled

    if int8 and not pallas_enabled():
        # the W8A8 branch is inside the Pallas gate (models/layers.py): with
        # the gate closed this would trace the plain bf16 XLA path and write
        # a bundle falsely labeled int8 — fail loudly instead
        raise ValueError(
            "int8=True but the Pallas kernels are disabled for the current "
            "backend — export on a TPU backend (or set PROTOCLIP_PALLAS=1 "
            "to force Mosaic lowering for a TPU target)"
        )

    sizes = sorted({int(batch_size), *(int(b) for b in (batch_sizes or ()))})
    if any(b < 1 for b in sizes):
        raise ValueError(f"batch sizes must be >= 1, got {sizes}")
    if max(sizes) != int(batch_size):
        raise ValueError(
            f"batch_size ({batch_size}) must be the maximum bucket; "
            f"got batch_sizes={sizes}"
        )

    encode = make_encode_fn(cfg, normalize=normalize)
    n_px = cfg.image_resolution
    # metadata only — np.asarray here would FETCH every device leaf to host
    param_shapes = jax.tree_util.tree_map(
        lambda a: jax.ShapeDtypeStruct(
            np.shape(a), getattr(a, "dtype", None) or np.asarray(a).dtype
        ),
        params,
    )
    kwargs = {"platforms": tuple(platforms)} if platforms else {}
    # scope $PROTOCLIP_INT8 to THIS trace (set both ways — trace-time gate),
    # then restore: the exporter must not flip the caller's serving mode for
    # every later jit in the process
    prior_int8 = os.environ.get("PROTOCLIP_INT8")
    os.environ["PROTOCLIP_INT8"] = "1" if int8 else "0"
    artifacts = {}
    try:
        for size in sizes:
            image_shape = jax.ShapeDtypeStruct((size, n_px, n_px, 3), jnp.uint8)
            artifacts[size] = jax_export.export(jax.jit(encode), **kwargs)(
                param_shapes, image_shape
            )
    finally:
        if prior_int8 is None:
            del os.environ["PROTOCLIP_INT8"]
        else:
            os.environ["PROTOCLIP_INT8"] = prior_int8

    flat, leaf_dtypes = _flatten(params)
    os.makedirs(path, exist_ok=True)
    for size, artifact in artifacts.items():
        # the max bucket keeps the classic name (back-compat with v1
        # single-bucket bundles); smaller buckets are suffixed
        name = _ARTIFACT if size == max(sizes) else _bucket_artifact(size)
        with open(os.path.join(path, name), "wb") as fh:
            fh.write(artifact.serialize())
    artifact = artifacts[max(sizes)]
    np.savez(os.path.join(path, _PARAMS), **flat)
    manifest = {
        # v2 = ml_dtypes leaves stored as native-width bit views (see
        # _flatten).  The tag CHANGED with the storage format on purpose:
        # a v1-only loader reading bit views would astype() uint16 bit
        # patterns into huge garbage weights and serve finite-looking
        # nonsense — the bumped tag makes it fail loudly instead.
        "format": "protoclip_tpu.serving_bundle.v2",
        "param_storage": "bitview",
        "backbone": str(cfg.name),
        "backbone_embed_dim": int(cfg.embed_dim),
        "image_resolution": int(n_px),
        "batch_size": int(batch_size),
        "batch_sizes": sizes,
        "int8": bool(int8),
        "normalized": bool(normalize),
        "platforms": list(artifact.platforms),
        "jax_version": jax.__version__,
        # ml_dtypes leaves are stored as same-width unsigned bit views
        # (npz cannot hold bfloat16; see _flatten); the loader views them
        # back to these dtypes before device_put
        "param_dtypes": leaf_dtypes,
        # sequence nodes of the param pytree, so the loader rebuilds the
        # exact treedef the artifact was traced with (see _seq_nodes)
        "param_seq_nodes": _seq_nodes(params),
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
    # v1 = ml_dtypes leaves widened to fp32; v2 = native-width bit views.
    # Both load here (_restore dispatches on the stored dtype kind); v2
    # exists so OLDER loaders reject bit-view bundles loudly.
    if manifest.get("format") not in (
        "protoclip_tpu.serving_bundle.v1",
        "protoclip_tpu.serving_bundle.v2",
    ):
        raise ValueError(f"not a protoclip_tpu serving bundle: {path}")
    sizes = sorted(int(b) for b in manifest.get("batch_sizes", [manifest["batch_size"]]))
    artifacts = {}
    for size in sizes:
        name = _ARTIFACT if size == max(sizes) else _bucket_artifact(size)
        with open(os.path.join(path, name), "rb") as fh:
            raw = fh.read()
        try:
            artifacts[size] = jax_export.deserialize(raw)
        except Exception as exc:
            raise ValueError(
                f"corrupt serving-bundle artifact {name} in {path}: {exc}"
            ) from exc
    artifact = artifacts[max(sizes)]
    leaf_dtypes = manifest.get("param_dtypes", {})

    def _restore(key: str, arr: np.ndarray) -> np.ndarray:
        if key not in leaf_dtypes:
            return arr
        if arr.dtype.kind == "u":
            # current format: same-width unsigned bit view -> view back
            return arr.view(leaf_dtypes[key])
        # legacy bundles stored ml_dtypes leaves widened to fp32: convert
        # (exact — the values originated at the narrower dtype)
        return arr.astype(leaf_dtypes[key])

    with np.load(os.path.join(path, _PARAMS)) as npz:
        flat = {k: _restore(k, npz[k]) for k in npz.files}
    # device_put ONCE: weights must not re-cross host->device per batch
    # (the serving hot path; see CLAUDE.md on hot-path transfers)
    params = jax.device_put(
        _unflatten(flat, manifest.get("param_seq_nodes", {}))
    )

    batch = max(sizes)
    n_px = manifest["image_resolution"]

    def encode(images_u8: np.ndarray) -> np.ndarray:
        images_u8 = np.asarray(images_u8)
        if images_u8.dtype != np.uint8:
            # reject rather than coerce: float [0,1] pixels would silently
            # truncate to zeros and serve garbage features
            raise ValueError(
                f"bundle expects uint8 pixels (0-255), got {images_u8.dtype}"
            )
        # ndim check BEFORE len(): a 0-d input must produce this
        # descriptive ValueError (-> HTTP 400 in cli/serve.py), not a raw
        # "len() of unsized object" TypeError (-> 500)
        n = images_u8.shape[0] if images_u8.ndim == 4 else 0
        if (
            images_u8.ndim != 4
            or images_u8.shape[1:] != (n_px, n_px, 3)
            or not 1 <= n <= batch
        ):
            raise ValueError(
                f"bundle compiled for (1..{batch}, {n_px}, {n_px}, 3), "
                f"got {images_u8.shape}"
            )
        # smallest compiled bucket that fits: an underfull call must not
        # pay the max-batch compute (per-image math is row-local, so the
        # first n rows are identical across buckets)
        bucket = next(s for s in sizes if s >= n)
        if n != bucket:
            block = np.zeros((bucket, n_px, n_px, 3), np.uint8)
            block[:n] = images_u8
            images_u8 = block
        return np.asarray(artifacts[bucket].call(params, images_u8))[:n]

    encode.manifest = manifest
    # power users (benchmarks, device-resident pipelines) can bypass the
    # numpy validation wrapper and call the artifacts on device arrays
    encode.artifact = artifact
    encode.artifacts = artifacts
    encode.params = params
    return encode
