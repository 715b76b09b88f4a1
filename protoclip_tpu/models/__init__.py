"""CLIP model towers and Proto-CLIP query adapters, in pure functional JAX.

Params are plain nested dict pytrees; every ``apply`` function is jittable and
shardable with ``jax.sharding``.  Weight layout conventions:

- Linear kernels are stored input-major (``y = x @ w + b``), i.e. transposed
  relative to torch.
- Convolutions are NHWC with HWIO kernels.
- Transformer blocks are stacked along a leading layer axis and executed with
  ``lax.scan`` (constant compile time in depth).
- BatchNorm (frozen encoders only) is folded into per-channel scale/bias at
  load time.
"""

from protoclip_tpu.models.clip import (
    CLIPConfig,
    BACKBONE_CONFIGS,
    available_backbones,
    init_clip_params,
    encode_image,
    encode_text,
    clip_forward,
    load_clip,
    cast_params,
    quantize_for_serving,
)
from protoclip_tpu.models.adapters import (
    init_adapter,
    apply_adapter,
    adapter_from_torch_state,
    adapter_to_torch_state,
)
from protoclip_tpu.models.encoder import (
    init_encoder,
    encoder_apply,
    encoder_from_torch_state,
    multi_head_attention,
)

__all__ = [
    "CLIPConfig",
    "BACKBONE_CONFIGS",
    "available_backbones",
    "init_clip_params",
    "encode_image",
    "encode_text",
    "clip_forward",
    "load_clip",
    "cast_params",
    "quantize_for_serving",
    "init_adapter",
    "apply_adapter",
    "adapter_from_torch_state",
    "adapter_to_torch_state",
    "init_encoder",
    "encoder_apply",
    "encoder_from_torch_state",
    "multi_head_attention",
]
