"""Compute ops: the kernels Proto-CLIP's hot paths lower to on TPU.

The reference relies on cuDNN/cuBLAS through torch (`clip/model.py`,
`utils.py:225-244`); here each op has an XLA implementation (which the
compiler fuses onto MXU/VPU) and, for the hot paths, a Pallas TPU kernel.
"""

from protoclip_tpu.ops.activations import quick_gelu
from protoclip_tpu.ops.layernorm import layer_norm
from protoclip_tpu.ops.attention import multi_head_attention
from protoclip_tpu.ops.proto import (
    proto_probs,
    proto_logits,
    squared_euclidean,
    l2_normalize,
    class_prototypes,
)
from protoclip_tpu.ops.losses import nll_of_probs, info_nce, protoclip_loss

__all__ = [
    "quick_gelu",
    "layer_norm",
    "multi_head_attention",
    "proto_probs",
    "proto_logits",
    "squared_euclidean",
    "l2_normalize",
    "class_prototypes",
    "nll_of_probs",
    "info_nce",
    "protoclip_loss",
]
