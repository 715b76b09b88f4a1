"""CLIP ModifiedResNet (ref ``clip/model.py:10-152``), NHWC/TPU layout.

Structure matched to the reference: 3-conv anti-aliased stem, Bottleneck
blocks whose strided downsampling is an avgpool before a stride-1 conv, and a
QKV attention-pool head whose query is the spatial mean token.

TPU adaptations:

- NHWC activations, HWIO kernels (XLA's preferred TPU conv layout).
- Frozen BatchNorm is folded into per-channel ``scale``/``bias`` at load time
  (the encoders are never trained in Proto-CLIP), applied in fp32.
- Within each layer, blocks 1..n-1 share shapes and run as stacked params
  under ``lax.scan``.
- The attention pool computes only the mean-token query row instead of full
  self-attention over all HW+1 tokens (identical output, ~50x less work;
  see ``ops.attention.cross_attention_single_query``).
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from protoclip_tpu.ops.attention import cross_attention_single_query

Params = Dict[str, jax.Array]

_DN = ("NHWC", "HWIO", "NHWC")


def conv(x: jax.Array, kernel: jax.Array, stride: int = 1, padding: int = 0) -> jax.Array:
    return jax.lax.conv_general_dilated(
        x,
        kernel.astype(x.dtype),
        window_strides=(stride, stride),
        padding=[(padding, padding), (padding, padding)],
        dimension_numbers=_DN,
    )


def scale_bias(x: jax.Array, bn: Params, relu: bool = False) -> jax.Array:
    """Folded BatchNorm: per-channel affine in fp32 (+ optional ReLU)."""
    out = x.astype(jnp.float32) * bn["scale"].astype(jnp.float32) + bn["bias"].astype(
        jnp.float32
    )
    if relu:
        out = jnp.maximum(out, 0.0)
    return out.astype(x.dtype)


def avg_pool(x: jax.Array, k: int) -> jax.Array:
    summed = jax.lax.reduce_window(
        x.astype(jnp.float32),
        0.0,
        jax.lax.add,
        window_dimensions=(1, k, k, 1),
        window_strides=(1, k, k, 1),
        padding="VALID",
    )
    return (summed / (k * k)).astype(x.dtype)


def bottleneck(x: jax.Array, p: Params, stride: int) -> jax.Array:
    """Anti-aliased Bottleneck (ref ``clip/model.py:10-53``)."""
    out = scale_bias(conv(x, p["conv1"]), p["bn1"], relu=True)
    out = scale_bias(conv(out, p["conv2"], padding=1), p["bn2"], relu=True)
    if stride > 1:
        out = avg_pool(out, stride)
    out = scale_bias(conv(out, p["conv3"]), p["bn3"])

    if "downsample" in p:
        identity = x
        if stride > 1:
            identity = avg_pool(identity, stride)
        identity = scale_bias(conv(identity, p["downsample"]["conv"]), p["downsample"]["bn"])
    else:
        identity = x
    return jnp.maximum(out + identity, 0.0).astype(x.dtype)


def apply_resnet(params: Params, images: jax.Array, cfg) -> jax.Array:
    """Encode images (B, H, W, 3) -> embeddings (B, embed_dim)."""
    dtype = params["stem"]["conv1"].dtype
    x = images.astype(dtype)

    stem = params["stem"]
    x = scale_bias(conv(x, stem["conv1"], stride=2, padding=1), stem["bn1"], relu=True)
    x = scale_bias(conv(x, stem["conv2"], padding=1), stem["bn2"], relu=True)
    x = scale_bias(conv(x, stem["conv3"], padding=1), stem["bn3"], relu=True)
    x = avg_pool(x, 2)

    for i, stride in enumerate((1, 2, 2, 2)):
        layer = params[f"layer{i + 1}"]
        x = bottleneck(x, layer["block0"], stride)
        if layer.get("rest") is not None:

            def body(carry, block_params):
                return bottleneck(carry, block_params, 1), None

            x, _ = jax.lax.scan(body, x, layer["rest"])

    return attention_pool(params["attnpool"], x, cfg.vision_heads_resnet)


def attention_pool(p: Params, x: jax.Array, n_head: int) -> jax.Array:
    """AttentionPool2d (ref ``clip/model.py:56-92``) with a single query row."""
    b, h, w, c = x.shape
    tokens = x.reshape(b, h * w, c)
    mean_tok = tokens.astype(jnp.float32).mean(axis=1).astype(x.dtype)
    tokens = jnp.concatenate([mean_tok[:, None, :], tokens], axis=1)
    pos = p["positional_embedding"].astype(x.dtype)
    tokens = tokens + pos[None, :, :]
    return cross_attention_single_query(tokens[:, 0, :], tokens, p, n_head)


# -- initialization ---------------------------------------------------------


def _init_bottleneck(rng, inplanes: int, planes: int, stride: int, dtype) -> Params:
    ks = jax.random.split(rng, 4)

    def he(key, shape):
        fan_in = shape[0] * shape[1] * shape[2]
        return (
            jax.random.normal(key, shape, jnp.float32) * (2.0 / fan_in) ** 0.5
        ).astype(dtype)

    def bn(n):
        return {"scale": jnp.ones((n,), dtype), "bias": jnp.zeros((n,), dtype)}

    p: Params = {
        "conv1": he(ks[0], (1, 1, inplanes, planes)),
        "bn1": bn(planes),
        "conv2": he(ks[1], (3, 3, planes, planes)),
        "bn2": bn(planes),
        "conv3": he(ks[2], (1, 1, planes, planes * 4)),
        "bn3": bn(planes * 4),
    }
    if stride > 1 or inplanes != planes * 4:
        p["downsample"] = {
            "conv": he(ks[3], (1, 1, inplanes, planes * 4)),
            "bn": bn(planes * 4),
        }
    return p


def init_resnet_params(rng: jax.Array, cfg, dtype=jnp.float32) -> Params:
    width = cfg.vision_width
    layers: Tuple[int, ...] = cfg.vision_layers  # e.g. (3, 4, 6, 3)
    keys = jax.random.split(rng, 8)

    def he(key, shape):
        fan_in = shape[0] * shape[1] * shape[2]
        return (
            jax.random.normal(key, shape, jnp.float32) * (2.0 / fan_in) ** 0.5
        ).astype(dtype)

    def bn(n):
        return {"scale": jnp.ones((n,), dtype), "bias": jnp.zeros((n,), dtype)}

    params: Params = {
        "stem": {
            "conv1": he(keys[0], (3, 3, 3, width // 2)),
            "bn1": bn(width // 2),
            "conv2": he(keys[1], (3, 3, width // 2, width // 2)),
            "bn2": bn(width // 2),
            "conv3": he(keys[2], (3, 3, width // 2, width)),
            "bn3": bn(width),
        }
    }

    inplanes = width
    for i, (blocks, stride) in enumerate(zip(layers, (1, 2, 2, 2))):
        planes = width * (2 ** i)
        layer_key = keys[3 + i]
        block0 = _init_bottleneck(layer_key, inplanes, planes, stride, dtype)
        inplanes = planes * 4
        rest = None
        if blocks > 1:
            rest_list = [
                _init_bottleneck(jax.random.fold_in(layer_key, j), inplanes, planes, 1, dtype)
                for j in range(1, blocks)
            ]
            rest = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *rest_list)
        params[f"layer{i + 1}"] = {"block0": block0, "rest": rest}

    embed_c = width * 32
    spacial = cfg.image_resolution // 32
    kp = keys[7]
    std = embed_c ** -0.5
    params["attnpool"] = {
        "positional_embedding": (
            jax.random.normal(kp, (spacial ** 2 + 1, embed_c), jnp.float32) * std
        ).astype(dtype),
        "wq": (jax.random.normal(jax.random.fold_in(kp, 1), (embed_c, embed_c), jnp.float32) * std).astype(dtype),
        "wk": (jax.random.normal(jax.random.fold_in(kp, 2), (embed_c, embed_c), jnp.float32) * std).astype(dtype),
        "wv": (jax.random.normal(jax.random.fold_in(kp, 3), (embed_c, embed_c), jnp.float32) * std).astype(dtype),
        "wo": (jax.random.normal(jax.random.fold_in(kp, 4), (embed_c, cfg.embed_dim), jnp.float32) * std).astype(dtype),
        "bq": jnp.zeros((embed_c,), dtype),
        "bk": jnp.zeros((embed_c,), dtype),
        "bv": jnp.zeros((embed_c,), dtype),
        "bo": jnp.zeros((cfg.embed_dim,), dtype),
    }
    return params
