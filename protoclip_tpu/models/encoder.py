"""Standalone embed+self-attention encoder — parity for the reference's
unused ``Embedder``/``MultiHeadAttention``/``Encoder`` (``model.py:98-170``).

The reference carries a generic single-block transformer encoder next to its
query adapters: an embedding table initialised from a caller-provided weight
matrix, one multi-head self-attention layer, and nothing else (no FFN, no
LayerNorm, no residual).  Nothing in the reference instantiates it — it is
dead scaffolding — but it is part of the shipped surface, so the same
semantics are provided here in this framework's idiom: pure functions over a
nested-dict param pytree, linear kernels input-major (``y = x @ w``),
jit-compatible throughout (``heads`` and the mask-presence branch are
trace-time static).

Two reference quirks are preserved deliberately (and pinned by the
executed-reference diff in ``tests/test_reference_model_diff.py``):

* ``attention()`` only applies softmax INSIDE the mask branch
  (``model.py:110-118``): called without a mask, the raw scaled scores are
  used as mixing weights.  Faithful-bug, like the adapters' layout quirks.
* dropout acts on the (post-softmax or raw) score matrix, matching
  ``model.py:119-121`` — pass ``dropout_rng`` to enable it; omitted =
  eval mode (torch ``Dropout`` identity).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "init_encoder",
    "encoder_from_torch_state",
    "multi_head_attention",
    "encoder_apply",
]


def init_encoder(rng: np.random.Generator, embed_weights, heads: int) -> dict:
    """Fresh encoder params.  ``embed_weights`` (V, D) seeds the embedding
    table exactly like the reference's ``Embedder`` (``model.py:99-103``:
    ``nn.Parameter(weights.clone())``); the four projections follow torch's
    ``nn.Linear`` default (Kaiming-uniform weight, fan-in-uniform bias,
    ``model.py:126-133``) so a fresh init is distribution-identical."""
    table = np.asarray(embed_weights, np.float32)
    d_model = table.shape[1]
    if d_model % heads:
        raise ValueError(f"d_model {d_model} not divisible by heads {heads}")

    def linear():
        bound = 1.0 / np.sqrt(d_model)
        return {
            # stored input-major: y = x @ w + b (torch keeps (out, in))
            "w": rng.uniform(-bound, bound, (d_model, d_model)).astype(np.float32),
            "b": rng.uniform(-bound, bound, d_model).astype(np.float32),
        }

    return {
        "embed": table.copy(),
        "q": linear(),
        "k": linear(),
        "v": linear(),
        "out": linear(),
    }


def encoder_from_torch_state(state: dict, prefix: str = "") -> dict:
    """Convert a torch ``Encoder`` state dict (``model.py:164-170`` layout:
    ``embed.embed.weight`` + ``attn.{q,k,v}_linear``/``attn.out``) to the
    input-major pytree ``encoder_apply`` consumes."""
    def linear(name):
        return {
            "w": np.asarray(state[f"{prefix}attn.{name}.weight"], np.float32).T,
            "b": np.asarray(state[f"{prefix}attn.{name}.bias"], np.float32),
        }

    return {
        "embed": np.asarray(state[f"{prefix}embed.embed.weight"], np.float32),
        "q": linear("q_linear"),
        "k": linear("k_linear"),
        "v": linear("v_linear"),
        "out": linear("out"),
    }


def multi_head_attention(
    params: dict,
    q,
    k,
    v,
    heads: int,
    mask=None,
    *,
    dropout_rate: float = 0.1,
    dropout_rng: Optional[jax.Array] = None,
):
    """``MultiHeadAttention.forward`` (``model.py:123-160``) as a pure
    function.  ``mask`` follows the reference contract: (B, Lq, Lk) with 0
    marking masked positions, broadcast over heads via ``unsqueeze(1)``;
    softmax fires only when a mask is given (see module docstring)."""
    B = q.shape[0]
    d_k = params["q"]["w"].shape[1] // heads

    def project(p, x):
        # (B, L, D) -> (B, H, L, d_k): torch's view + transpose(1, 2)
        y = x @ p["w"] + p["b"]
        return y.reshape(B, -1, heads, d_k).transpose(0, 2, 1, 3)

    qh, kh, vh = project(params["q"], q), project(params["k"], k), project(params["v"], v)
    scores = qh @ kh.transpose(0, 1, 3, 2) / jnp.sqrt(jnp.asarray(d_k, qh.dtype))
    if mask is not None:
        scores = jnp.where(mask[:, None] == 0, jnp.asarray(-1e9, scores.dtype), scores)
        scores = jax.nn.softmax(scores, axis=-1)
    if dropout_rng is not None:
        keep = jax.random.bernoulli(dropout_rng, 1.0 - dropout_rate, scores.shape)
        scores = jnp.where(keep, scores / (1.0 - dropout_rate), 0.0)
    mixed = scores @ vh  # (B, H, Lq, d_k)
    concat = mixed.transpose(0, 2, 1, 3).reshape(B, -1, heads * d_k)
    return concat @ params["out"]["w"] + params["out"]["b"]


def encoder_apply(params: dict, tokens, heads: int, mask=None, **dropout_kw):
    """``Encoder.forward`` (``model.py:168-170``): embed then one
    self-attention pass (query = key = value = the embeddings)."""
    x = jnp.asarray(params["embed"])[tokens]
    return multi_head_attention(params, x, x, x, heads, mask, **dropout_kw)
