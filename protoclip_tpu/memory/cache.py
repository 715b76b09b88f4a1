"""On-disk feature caches, directory-compatible with the reference.

The reference caches every expensive stage under
``caches/<dataset>/models/<backbone>/K-<shots>/`` (``utils.py:280-332``):

- ``aug/visual_mb_{keys,values}_aug_{A}_{K}_shots.pt``
- ``text_mb_<backbone>_K_<shots>.pkl``
- ``{val,test}_{features,labels}.pt``

This cache keeps the same tree and stem names but stores ``.npz`` (torch-free,
mmap-able).  For A/B interop it also *reads* the reference's caches when an
``.npz`` is absent: ``.pt`` via the pure-Python torch reader, and the
reference's raw pickles (``text_mb_*.pkl`` textual banks, the
``zero_shot_hp_search_*.pkl`` grids) via the restricted unpickler.
"""

from __future__ import annotations

import os
import zipfile
from typing import Dict, Optional

import numpy as np

from protoclip_tpu.io.checkpoint import beautify, model_dir_root


class FeatureCache:
    """Cache handle for one (dataset, backbone, shots) operating point."""

    def __init__(self, cache_dir: str, backbone: str, shots: int, enabled: bool = True):
        self.root = model_dir_root(cache_dir, backbone, shots)
        self.backbone = backbone
        self.shots = shots
        self.enabled = enabled
        if enabled:
            self._sweep_stale_tmp()

    def _sweep_stale_tmp(self, max_age_s: float = 3600.0) -> None:
        """Remove orphaned ``*.tmp-<pid>-<rand>`` files a crashed/preempted
        writer left behind (save() writes tmp + os.replace; per-writer tmp
        names fixed the concurrent-writer race but stopped self-overwriting,
        so orphans would otherwise accumulate forever — round-3 advisor).
        Age-gated: a LIVE concurrent writer's tmp file must survive."""
        import time

        if not os.path.isdir(self.root):
            return
        cutoff = time.time() - max_age_s
        for dirpath, _, names in os.walk(self.root):
            for name in names:
                if ".tmp-" not in name:
                    continue
                path = os.path.join(dirpath, name)
                try:
                    if os.path.getmtime(path) < cutoff:
                        os.remove(path)
                except OSError:
                    pass  # raced with another sweeper or a live writer

    # -- generic npz (+ torch fallback) -------------------------------------

    def _npz_path(self, stem: str) -> str:
        return os.path.join(self.root, f"{stem}.npz")

    def load(self, stem: str) -> Optional[Dict[str, np.ndarray]]:
        if not self.enabled:
            return None
        path = self._npz_path(stem)
        if os.path.exists(path):
            try:
                with np.load(path) as data:
                    return {k: data[k] for k in data.files}
            except (zipfile.BadZipFile, ValueError, EOFError) as exc:
                # a truncated archive (e.g. power loss before save() became
                # atomic) must cause a rebuild, not a permanent crash
                import sys

                print(
                    f"[protoclip_tpu] corrupt cache entry {path} ({exc}); "
                    "discarding and recomputing",
                    file=sys.stderr,
                )
                os.remove(path)
        pt_path = os.path.join(self.root, f"{stem}.pt")
        if os.path.exists(pt_path):
            from protoclip_tpu.io.torch_pt import load_pt

            return self._wrap(load_pt(pt_path))
        pkl_path = os.path.join(self.root, f"{stem}.pkl")
        if os.path.exists(pkl_path):
            from protoclip_tpu.io.torch_pt import load_pkl

            return self._wrap(load_pkl(pkl_path))
        return None

    @staticmethod
    def _wrap(obj) -> Dict[str, np.ndarray]:
        if isinstance(obj, dict):
            return {k: np.asarray(v) for k, v in obj.items()}
        return {"array": np.asarray(obj)}

    def save(self, stem: str, **arrays: np.ndarray) -> None:
        if not self.enabled:
            return
        path = self._npz_path(stem)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        # tmp + rename (the io/checkpoint.py discipline): a preemption
        # mid-save must never leave a truncated archive behind.  The tmp
        # name is per-writer (pid + random suffix, the io/download.py
        # discipline): two runs sharing a cache tree (e.g. the fewsol /
        # fewsol_198 variants, which reject-and-rebuild each other's
        # entries) would otherwise interleave writes into one shared
        # '<path>.tmp' and the loser's os.replace would crash the run
        import uuid

        tmp = f"{path}.tmp-{os.getpid()}-{uuid.uuid4().hex[:8]}"
        try:
            with open(tmp, "wb") as fh:  # file handle: savez must not append .npz
                np.savez(fh, **arrays)
            os.replace(tmp, path)
        finally:
            # a crash between open() and os.replace() must not orphan the
            # per-writer tmp (init-time sweep is the backstop for SIGKILL)
            if os.path.exists(tmp):
                try:
                    os.remove(tmp)
                except OSError:
                    pass

    # -- named artifacts (reference stem naming) ----------------------------

    def visual_bank_stems(self, augment_epochs: int):
        return (
            f"aug/visual_mb_keys_aug_{augment_epochs}_{self.shots}_shots",
            f"aug/visual_mb_values_aug_{augment_epochs}_{self.shots}_shots",
        )

    def text_bank_stem(self) -> str:
        return f"text_mb_{beautify(self.backbone)}_K_{self.shots}"

    def split_stems(self, split: str):
        return f"{split}_features", f"{split}_labels"

    def hp_search_stem(self, split: str) -> str:
        return f"zero_shot_hp_search_{split}_{beautify(self.backbone)}_K_{self.shots}"
