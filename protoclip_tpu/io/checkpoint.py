"""Proto-CLIP checkpoint triples (``_v.pt`` / ``_t.pt`` / ``_a.pt``).

The reference trainer saves three artifacts on every val-accuracy improvement
(``main.py:350-369``):

- ``*_v.pt`` — visual memory bank weight, shape ``(N*K, d)``
- ``*_t.pt`` — textual memory bank weight, shape ``(N, d)``
- ``*_a.pt`` — adapter ``state_dict()``

under ``caches/<ds>/models/<backbone>/K-<K>/alpha-beta/<a>-<b>/best_lr_...``.
This module reads and writes that exact layout so artifacts interoperate with
the PyTorch reference (including ``pretrained_ckpt/``, whose
``memory_bank_t.pt``/``query_adapter.pt`` follow the same tensor formats).

Writing uses torch's serializer when torch is importable (bit-compatible with
the reference); otherwise a sidecar ``.npz`` is written.
"""

from __future__ import annotations

import os
from typing import Dict, Tuple

import numpy as np

from protoclip_tpu.io.torch_pt import load_pt


def beautify(name: str) -> str:
    """Backbone name -> path token, e.g. ``ViT-B/16`` -> ``ViT_B_16``.

    Mirrors the cache naming rule of the reference (``utils.py:276-277``) so
    cache trees interoperate.
    """
    return name.strip().replace("/", "_").replace("-", "_")


def model_dir_root(cache_dir: str, backbone: str, shots: int) -> str:
    """``<cache_dir>/models/<backbone>/K-<shots>`` (``utils.py:280-281``)."""
    return os.path.join(cache_dir, "models", beautify(backbone), f"K-{shots}")


def checkpoint_paths(
    cache_dir: str,
    backbone: str,
    shots: int,
    alpha: float,
    beta: float,
    lr: float,
    augment_epoch: int,
    train_epoch: int,
    qt: bool = False,
) -> Tuple[str, str, str]:
    """Paths of the ``_v/_t/_a`` triple for one operating point.

    The episodic trainer uses directory ``alpha-beta/`` (``main.py:352``)
    while the Q^T trainer uses ``best-alpha-beta/`` (``main.qt.py:292``).
    """
    subdir = "best-alpha-beta" if qt else "alpha-beta"
    model_dir = os.path.join(
        model_dir_root(cache_dir, backbone, shots), subdir, f"{alpha}-{beta}"
    )
    prefix = f"best_lr_{lr}_aug_{augment_epoch}_epochs_{train_epoch}"
    return tuple(
        os.path.join(model_dir, f"{prefix}_{suffix}.pt") for suffix in ("v", "t", "a")
    )


def _as_f32(x: np.ndarray) -> np.ndarray:
    return np.asarray(x, dtype=np.float32)


def _savez_exact(path: str, arrays: Dict[str, np.ndarray]) -> None:
    """``np.savez`` to EXACTLY ``path`` (the path form appends ``.npz`` to
    names without the suffix, which would break tmp-file atomic renames)."""
    with open(path, "wb") as fh:
        np.savez(fh, **arrays)


def load_checkpoint_triple(
    path_v: str | None, path_t: str, path_a: str | None
) -> Tuple[np.ndarray | None, np.ndarray, Dict[str, np.ndarray] | None]:
    """Load (visual bank, textual bank, adapter state dict) as fp32 numpy.

    Any component path may be ``None`` (e.g. ``pretrained_ckpt/`` snapshots
    lack ``memory_bank_v.pt``).
    """
    bank_v = _load_bank(path_v) if path_v else None
    bank_t = _load_bank(path_t)
    adapter = None
    if path_a:
        state = _read_any(path_a)
        if not isinstance(state, dict):
            raise ValueError(f"{path_a} is not an adapter state dict")
        adapter = {k: _as_f32(v) for k, v in state.items()}
    return bank_v, bank_t, adapter


def _read_any(path: str):
    """Read ``path`` as a torch file, falling back to the ``<path>.npz``
    sidecar that :func:`save_checkpoint_triple` writes on torch-less hosts."""
    npz_path = path + ".npz"
    if not os.path.exists(path) and os.path.exists(npz_path):
        with np.load(npz_path) as z:
            return {k: z[k] for k in z.files}
    return load_pt(path)


def _load_bank(path: str) -> np.ndarray:
    obj = _read_any(path)
    if isinstance(obj, dict):
        # allow state-dict style {'weight': tensor}
        if "weight" in obj:
            obj = obj["weight"]
        elif len(obj) == 1:
            obj = next(iter(obj.values()))
        else:
            raise ValueError(f"{path}: expected a single tensor, got keys {list(obj)}")
    return _as_f32(obj)


def save_checkpoint_triple(
    path_v: str,
    path_t: str,
    path_a: str,
    bank_v: np.ndarray,
    bank_t: np.ndarray,
    adapter_state: Dict[str, np.ndarray],
    dtype: str = "float16",
) -> None:
    """Write a reference-compatible ``_v/_t/_a`` triple.

    The reference stores fp16 tensors (model runs half precision on GPU);
    ``dtype`` controls the stored precision.
    """
    for p in (path_v, path_t, path_a):
        os.makedirs(os.path.dirname(p) or ".", exist_ok=True)
    np_dtype = np.dtype(dtype)
    bank_v = np.asarray(bank_v, dtype=np_dtype)
    bank_t = np.asarray(bank_t, dtype=np_dtype)
    adapter_state = {k: np.asarray(v, dtype=np_dtype) for k, v in adapter_state.items()}

    def _atomic(write_fn, path: str, stale: str) -> None:
        # tmp + os.replace per file (the resume.py discipline): a crash
        # mid-save must never leave a torn .pt / a mixed-generation triple.
        # Also drop the OTHER format's stale file: _read_any prefers .pt,
        # so e.g. a torch-less retrain that only wrote .npz sidecars would
        # otherwise be silently shadowed by the previous run's .pt.
        tmp = path + ".tmp"
        write_fn(tmp)
        os.replace(tmp, path)
        if os.path.exists(stale):
            os.remove(stale)

    try:
        import torch

        payloads = [
            (path_v, torch.from_numpy(bank_v.copy())),
            (path_t, torch.from_numpy(bank_t.copy())),
            (path_a, {k: torch.from_numpy(v.copy()) for k, v in adapter_state.items()}),
        ]
        for path, obj in payloads:
            _atomic(lambda tmp, obj=obj: torch.save(obj, tmp), path, path + ".npz")
    except ImportError:  # pragma: no cover - torch is an optional dependency
        payloads = [
            (path_v, {"weight": bank_v}),
            (path_t, {"weight": bank_t}),
            (path_a, dict(adapter_state)),
        ]
        for path, arrays in payloads:
            _atomic(
                lambda tmp, arrays=arrays: _savez_exact(tmp, arrays),
                path + ".npz",
                path,
            )
