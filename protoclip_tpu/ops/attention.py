"""Multi-head attention for CLIP's text (L=77) and vision (L<=577) towers.

The reference dispatches to ``nn.MultiheadAttention`` /
``F.multi_head_attention_forward`` (ref ``clip/model.py:173,72-90``).  Here
attention is a batched einsum pipeline that XLA maps onto the MXU, with fp32
softmax under bf16 activations.  For these short sequences a flash-style
streaming kernel buys nothing (the full ``L x L`` score tile fits in VMEM), so
the Pallas variant (``ops/pallas_kernels.py``) instead fuses the whole
(scores -> softmax -> weighted sum) into one kernel to avoid HBM round-trips.

Parameter convention (all projections stored input-major so ``y = x @ w + b``):
``wq, wk, wv, wo`` of shape ``(D, D)``; ``bq, bk, bv, bo`` of shape ``(D,)``.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp


def attention_core(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    mask: Optional[jax.Array] = None,
) -> jax.Array:
    """Scaled dot-product attention over ``(..., heads, L, d_head)``.

    ``mask`` is additive (``-inf`` blocks), broadcastable to ``(..., L, L)``.
    Softmax runs in fp32 regardless of input dtype.
    """
    d_head = q.shape[-1]
    scale = d_head ** -0.5
    scores = jnp.einsum(
        "...hqd,...hkd->...hqk", q * scale, k, preferred_element_type=jnp.float32
    )
    if mask is not None:
        scores = scores + mask.astype(scores.dtype)
    weights = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
    return jnp.einsum("...hqk,...hkd->...hqd", weights, v)


def _split_heads(x: jax.Array, n_head: int) -> jax.Array:
    b, l, d = x.shape
    return x.reshape(b, l, n_head, d // n_head).transpose(0, 2, 1, 3)


def _merge_heads(x: jax.Array) -> jax.Array:
    b, h, l, dh = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, l, h * dh)


def multi_head_attention(
    x: jax.Array,
    params: Dict[str, jax.Array],
    n_head: int,
    mask: Optional[jax.Array] = None,
    causal: bool = False,
) -> jax.Array:
    """Self-attention over ``x`` of shape ``(B, L, D)``.

    ``causal=True`` selects the causal mask internally (text tower); an
    explicit additive ``mask`` forces the XLA path.  Without an explicit
    mask, the fused Pallas kernel handles masking on TPU.
    """
    dtype = x.dtype
    d = x.shape[-1]
    # Fused QKV: one (D, 3D) MXU matmul instead of three (D, D) ones.
    w_qkv = jnp.concatenate(
        [params["wq"], params["wk"], params["wv"]], axis=1
    ).astype(dtype)
    b_qkv = jnp.concatenate([params["bq"], params["bk"], params["bv"]]).astype(dtype)
    qkv = x @ w_qkv + b_qkv
    q, k, v = qkv[..., :d], qkv[..., d : 2 * d], qkv[..., 2 * d :]

    if mask is None:
        from protoclip_tpu.ops.pallas_kernels import fused_attention_packed, pallas_enabled

        if pallas_enabled():
            # packed kernel: no head-major transpose ever touches HBM
            out = fused_attention_packed(q, k, v, n_head, causal=causal)
        else:
            m = _causal_mask(x.shape[1]) if causal else None
            out = _merge_heads(
                attention_core(
                    _split_heads(q, n_head), _split_heads(k, n_head), _split_heads(v, n_head), m
                )
            )
    else:
        if causal:  # combine: additive masks compose by summation
            mask = mask + _causal_mask(x.shape[1])
        out = _merge_heads(
            attention_core(
                _split_heads(q, n_head), _split_heads(k, n_head), _split_heads(v, n_head), mask
            )
        )
    return out @ params["wo"].astype(dtype) + params["bo"].astype(dtype)


def _causal_mask(length: int) -> jax.Array:
    mask = jnp.full((length, length), -jnp.inf, dtype=jnp.float32)
    return jnp.triu(mask, k=1)


def cross_attention_single_query(
    q_tok: jax.Array,
    kv: jax.Array,
    params: Dict[str, jax.Array],
    n_head: int,
) -> jax.Array:
    """Attention where only one query position is needed.

    Used by the ResNet ``AttentionPool2d`` head: the reference computes full
    self-attention over all HW+1 tokens and keeps position 0
    (ref ``clip/model.py:67-92``); computing just the mean-token query is
    mathematically identical and ~L times cheaper.

    ``q_tok``: (B, D) query token; ``kv``: (B, L, D) key/value tokens.
    Returns (B, D_out) where ``wo`` may project to a different output dim.
    """
    dtype = kv.dtype
    b, l, d = kv.shape
    q = q_tok @ params["wq"].astype(dtype) + params["bq"].astype(dtype)
    k = kv @ params["wk"].astype(dtype) + params["bk"].astype(dtype)
    v = kv @ params["wv"].astype(dtype) + params["bv"].astype(dtype)
    d_head = d // n_head
    q = q.reshape(b, n_head, 1, d_head)
    k = k.reshape(b, l, n_head, d_head).transpose(0, 2, 1, 3)
    v = v.reshape(b, l, n_head, d_head).transpose(0, 2, 1, 3)
    out = attention_core(q, k, v)  # (B, H, 1, d_head)
    out = out.reshape(b, d)
    return out @ params["wo"].astype(dtype) + params["bo"].astype(dtype)
