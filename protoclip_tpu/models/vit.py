"""CLIP Vision Transformer (ref ``clip/model.py:204-238``), TPU-first.

Differences from a literal translation:

- Patch embedding is a reshape + one MXU matmul instead of a strided conv
  (identical math for stride == kernel == patch size, and far friendlier to
  the MXU than a conv with giant strides).
- Blocks run as stacked params under ``lax.scan``.
- Activations run in the configured compute dtype (bf16 on TPU) with fp32
  LayerNorm, matching the reference's fp16-weights/fp32-LN split.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from protoclip_tpu.models.layers import init_block_params, transformer
from protoclip_tpu.ops.layernorm import layer_norm

Params = Dict[str, jax.Array]


def patchify(images: jax.Array, patch: int) -> jax.Array:
    """(B, H, W, 3) -> (B, gh*gw, patch*patch*3) without a conv.

    Patch pixel ordering is (py, px, c), matching the kernel layout produced
    by :func:`protoclip_tpu.models.clip.convert_clip_state_dict`.
    """
    b, h, w, c = images.shape
    gh, gw = h // patch, w // patch
    x = images.reshape(b, gh, patch, gw, patch, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)  # (B, gh, gw, py, px, c)
    return x.reshape(b, gh * gw, patch * patch * c)


def apply_vit(params: Params, images: jax.Array, cfg) -> jax.Array:
    """Encode images (B, H, W, 3) -> embeddings (B, embed_dim)."""
    dtype = params["patch_embed"].dtype
    x = patchify(images.astype(dtype), cfg.vision_patch_size)
    x = x @ params["patch_embed"]  # (B, L-1, width)

    cls = jnp.broadcast_to(
        params["class_embedding"].astype(dtype), (x.shape[0], 1, x.shape[-1])
    )
    x = jnp.concatenate([cls, x], axis=1)
    x = x + params["positional_embedding"].astype(dtype)
    x = layer_norm(x, params["ln_pre"]["scale"], params["ln_pre"]["bias"])

    x = transformer(
        x, params["blocks"], cfg.vision_heads, qblocks=params.get("blocks_q")
    )

    cls_out = layer_norm(
        x[:, 0, :], params["ln_post"]["scale"], params["ln_post"]["bias"]
    )
    return cls_out @ params["proj"].astype(dtype)


def init_vit_params(rng: jax.Array, cfg, dtype=jnp.float32) -> Params:
    width = cfg.vision_width
    patch = cfg.vision_patch_size
    n_tokens = (cfg.image_resolution // patch) ** 2 + 1
    scale = width ** -0.5
    k1, k2, k3, k4 = jax.random.split(rng, 4)
    return {
        "patch_embed": (
            jax.random.normal(k1, (patch * patch * 3, width), jnp.float32) * scale
        ).astype(dtype),
        "class_embedding": (
            jax.random.normal(k2, (width,), jnp.float32) * scale
        ).astype(dtype),
        "positional_embedding": (
            jax.random.normal(k3, (n_tokens, width), jnp.float32) * scale
        ).astype(dtype),
        "ln_pre": {"scale": jnp.ones((width,), dtype), "bias": jnp.zeros((width,), dtype)},
        "blocks": init_block_params(k4, cfg.vision_layers, width, dtype),
        "ln_post": {"scale": jnp.ones((width,), dtype), "bias": jnp.zeros((width,), dtype)},
        "proj": (
            jax.random.normal(jax.random.fold_in(k4, 7), (width, cfg.embed_dim), jnp.float32)
            * scale
        ).astype(dtype),
    }
