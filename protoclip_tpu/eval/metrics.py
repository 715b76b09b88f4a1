"""Accuracy metrics (ref ``utils.py:247-253``)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def top_k_accuracy(scores, labels, k: int = 1) -> float:
    """Percentage of rows whose true label is within the top-k scores."""
    scores = jnp.asarray(scores)
    labels = jnp.asarray(labels)
    _, top_idx = jax.lax.top_k(scores, k)
    hit = jnp.any(top_idx == labels[:, None], axis=-1)
    return float(jnp.mean(hit.astype(jnp.float32)) * 100.0)


def accuracy_from_probs(p, labels) -> float:
    return float(
        jnp.mean((jnp.argmax(jnp.asarray(p), axis=-1) == jnp.asarray(labels)).astype(jnp.float32))
    )
