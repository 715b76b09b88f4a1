"""Elementwise activations (VPU ops; XLA fuses these into surrounding matmuls)."""

from __future__ import annotations

import jax


def quick_gelu(x: jax.Array) -> jax.Array:
    """CLIP's QuickGELU: ``x * sigmoid(1.702 * x)`` (ref ``clip/model.py:164-166``)."""
    return x * jax.nn.sigmoid(1.702 * x)
