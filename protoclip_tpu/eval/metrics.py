"""Accuracy metrics (ref ``utils.py:247-253``).

Host numpy on purpose: these consume small, already-fetched score arrays,
and eager jax ops on the remote-TPU backend each cost a 30-300s compile
(CLAUDE.md environment rules)."""

from __future__ import annotations

import numpy as np


def top_k_accuracy(scores, labels, k: int = 1) -> float:
    """Percentage of rows whose true label is within the top-k scores."""
    scores = np.asarray(scores)
    labels = np.asarray(labels)
    k = min(k, scores.shape[-1])
    # Stable sort (not argpartition) so ties at the k boundary break toward
    # the lower index, matching torch.topk / lax.top_k on the reference path
    # (utils.py:247-253); the arrays are small, host-side O(n log n) is fine.
    top_idx = np.argsort(-scores, kind="stable", axis=-1)[:, :k]
    hit = (top_idx == labels[:, None]).any(axis=-1)
    return float(hit.mean() * 100.0)


def accuracy_from_probs(p, labels) -> float:
    return float(np.mean(np.argmax(np.asarray(p), axis=-1) == np.asarray(labels)))
