"""CLIP text transformer (ref ``clip/model.py:341-354``)."""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from protoclip_tpu.models.layers import init_block_params, transformer
from protoclip_tpu.ops.layernorm import layer_norm

Params = Dict[str, jax.Array]


def apply_text(params: Params, tokens: jax.Array, cfg) -> jax.Array:
    """Encode token ids (B, 77) -> embeddings (B, embed_dim).

    The sequence feature is taken at the EOT position — the argmax token id,
    since EOT (49407) is the largest id in any sequence
    (ref ``clip/model.py:352``).
    """
    dtype = params["token_embedding"].dtype
    x = params["token_embedding"][tokens]  # (B, 77, width)
    x = x + params["positional_embedding"].astype(dtype)
    x = transformer(
        x, params["blocks"], cfg.transformer_heads, causal=True,
        qblocks=params.get("blocks_q"),
    )
    x = layer_norm(x, params["ln_final"]["scale"], params["ln_final"]["bias"])

    eot = jnp.argmax(tokens, axis=-1)
    feats = jnp.take_along_axis(x, eot[:, None, None], axis=1)[:, 0, :]
    return feats @ params["text_projection"].astype(dtype)


def init_text_params(rng: jax.Array, cfg, dtype=jnp.float32) -> Params:
    width = cfg.transformer_width
    k1, k2, k3, k4 = jax.random.split(rng, 4)
    return {
        "token_embedding": (
            jax.random.normal(k1, (cfg.vocab_size, width), jnp.float32) * 0.02
        ).astype(dtype),
        "positional_embedding": (
            jax.random.normal(k2, (cfg.context_length, width), jnp.float32) * 0.01
        ).astype(dtype),
        "blocks": init_block_params(k3, cfg.transformer_layers, width, dtype),
        "ln_final": {
            "scale": jnp.ones((width,), dtype),
            "bias": jnp.zeros((width,), dtype),
        },
        "text_projection": (
            jax.random.normal(k4, (width, cfg.embed_dim), jnp.float32) * width ** -0.5
        ).astype(dtype),
    }
