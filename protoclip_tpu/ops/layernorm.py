"""LayerNorm with fp32 statistics under low-precision activations.

CLIP computes LayerNorm in fp32 even when the model runs fp16
(ref ``clip/model.py:155-161``); on TPU the model dtype is bfloat16 and the
same rule applies: normalize and affine-transform in fp32, cast back.
XLA fuses this into neighbouring ops; a Pallas variant exists in
``protoclip_tpu.ops.pallas_kernels`` for fusion experiments.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def layer_norm(
    x: jax.Array,
    scale: jax.Array,
    bias: jax.Array,
    eps: float = 1e-5,
) -> jax.Array:
    """Normalize over the trailing ``scale.ndim`` axes in fp32.

    ``scale``/``bias`` may be multi-dimensional (the conv adapters normalize
    over ``(C, H, W)``, ref ``model.py:37-45``); normalization axes are the
    last ``scale.ndim`` axes of ``x``.
    """
    orig_dtype = x.dtype
    axes = tuple(range(x.ndim - scale.ndim, x.ndim))
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=axes, keepdims=True)
    centered = xf - mean
    var = jnp.mean(jnp.square(centered), axis=axes, keepdims=True)
    normed = centered * jax.lax.rsqrt(var + eps)
    out = normed * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    return out.astype(orig_dtype)
