"""Shared transformer building blocks (ref ``clip/model.py:155-201``).

The residual attention block is CLIP's: pre-LN MHA + pre-LN MLP with
QuickGELU.  Blocks are *stacked* along a leading layer axis and run under
``lax.scan`` — one compiled block body regardless of depth, which is the
TPU-idiomatic replacement for the reference's ``nn.Sequential`` of modules.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from protoclip_tpu.ops.attention import _causal_mask, multi_head_attention
from protoclip_tpu.ops.activations import quick_gelu
from protoclip_tpu.ops.layernorm import layer_norm

Params = Dict[str, jax.Array]


def mlp(x: jax.Array, p: Params) -> jax.Array:
    """4x-expansion MLP with QuickGELU (ref ``clip/model.py:175-179``)."""
    dtype = x.dtype
    h = x @ p["w_fc"].astype(dtype) + p["b_fc"].astype(dtype)
    h = quick_gelu(h)
    return h @ p["w_proj"].astype(dtype) + p["b_proj"].astype(dtype)


def residual_block(
    x: jax.Array,
    p: Params,
    n_head: int,
    mask: Optional[jax.Array] = None,
    causal: bool = False,
) -> jax.Array:
    x = x + multi_head_attention(
        layer_norm(x, p["ln_1"]["scale"], p["ln_1"]["bias"]),
        p["attn"],
        n_head,
        mask,
        causal=causal,
    )
    x = x + mlp(layer_norm(x, p["ln_2"]["scale"], p["ln_2"]["bias"]), p["mlp"])
    return x


def transformer(
    x: jax.Array,
    stacked_blocks: Params,
    n_head: int,
    mask: Optional[jax.Array] = None,
    causal: bool = False,
    qblocks: Optional[Params] = None,
) -> jax.Array:
    """Run ``L`` stacked residual blocks with ``lax.scan``.

    ``stacked_blocks`` is a block-param pytree whose leaves carry a leading
    layer axis.  ``causal=True`` applies the causal mask via the attention
    fast path (no materialized (L, L) mask on the Pallas route).

    ``qblocks``: pre-quantized weights for the W8A8 serving mode (from
    :func:`protoclip_tpu.ops.pallas_kernels.quantize_stacked_blocks`, e.g.
    via ``models.clip.quantize_for_serving``).  When absent and
    ``$PROTOCLIP_INT8`` is on, the weights are quantized in-trace as a
    fallback — correct, but re-runs the quantization on every dispatch.

    On TPU (``PROTOCLIP_PALLAS`` auto/on) each block runs as one fused
    Pallas kernel — LN/QKV/attention/projection/MLP with the layer weights
    resident in VMEM — measured ~18% faster than the split XLA pipeline.
    """
    if mask is None:
        from protoclip_tpu.ops.pallas_kernels import (
            fused_transformer_block,
            fused_transformer_block_int8,
            int8_enabled,
            pallas_enabled,
            quantize_stacked_blocks,
        )

        if pallas_enabled():
            # pad L to the sublane multiple ONCE outside the layer loop
            # (per-block pad/slice would round-trip HBM 2x per layer)
            length = x.shape[1]
            lp = -(-length // 8) * 8
            if lp != length:
                x = jnp.pad(x, [(0, 0), (0, lp - length), (0, 0)])

            if int8_enabled():
                # W8A8 serving mode ($PROTOCLIP_INT8): use the load-time
                # quantized weights when provided, else quantize here
                # (once per trace, outside the layer scan)
                if qblocks is None:
                    qblocks = quantize_stacked_blocks(stacked_blocks)

                def body_q(carry, qblock):
                    return (
                        fused_transformer_block_int8(
                            carry, qblock, n_head, causal=causal, length=length
                        ),
                        None,
                    )

                out, _ = jax.lax.scan(body_q, x, qblocks)
                return out[:, :length, :]

            def body(carry, block_params):
                return (
                    fused_transformer_block(
                        carry, block_params, n_head, causal=causal, length=length
                    ),
                    None,
                )

            out, _ = jax.lax.scan(body, x, stacked_blocks)
            return out[:, :length, :]

    def body(carry, block_params):
        return residual_block(carry, block_params, n_head, mask, causal=causal), None

    out, _ = jax.lax.scan(body, x, stacked_blocks)
    return out


def init_block_params(
    rng: jax.Array, n_layers: int, width: int, dtype=jnp.float32
) -> Params:
    """Random-init stacked transformer blocks (CLIP's init scheme,
    ref ``clip/model.py:314-321``)."""
    keys = jax.random.split(rng, 4)
    proj_std = (width ** -0.5) * ((2 * n_layers) ** -0.5)
    attn_std = width ** -0.5
    fc_std = (2 * width) ** -0.5

    def norm(key, shape, std):
        return (jax.random.normal(key, shape, jnp.float32) * std).astype(dtype)

    shape2 = (n_layers, width, width)
    return {
        "ln_1": {
            "scale": jnp.ones((n_layers, width), dtype),
            "bias": jnp.zeros((n_layers, width), dtype),
        },
        "attn": {
            "wq": norm(keys[0], shape2, attn_std),
            "wk": norm(jax.random.fold_in(keys[0], 1), shape2, attn_std),
            "wv": norm(jax.random.fold_in(keys[0], 2), shape2, attn_std),
            "wo": norm(keys[1], shape2, proj_std),
            "bq": jnp.zeros((n_layers, width), dtype),
            "bk": jnp.zeros((n_layers, width), dtype),
            "bv": jnp.zeros((n_layers, width), dtype),
            "bo": jnp.zeros((n_layers, width), dtype),
        },
        "ln_2": {
            "scale": jnp.ones((n_layers, width), dtype),
            "bias": jnp.zeros((n_layers, width), dtype),
        },
        "mlp": {
            "w_fc": norm(keys[2], (n_layers, width, 4 * width), fc_std),
            "b_fc": jnp.zeros((n_layers, 4 * width), dtype),
            "w_proj": norm(keys[3], (n_layers, 4 * width, width), proj_std),
            "b_proj": jnp.zeros((n_layers, width), dtype),
        },
    }


def causal_mask(length: int) -> jax.Array:
    """Additive causal mask (ref ``clip/model.py:326-332``)."""
    return _causal_mask(length)
