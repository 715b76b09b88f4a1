"""Memory banks: cached CLIP features for support sets, prompts, and eval
splits (the reference's L2 feature layer, ``utils.py:254-361``)."""

from protoclip_tpu.memory.banks import (
    build_visual_memory_bank,
    build_textual_memory_bank,
    encode_loader,
    pre_load_features,
)
from protoclip_tpu.memory.cache import FeatureCache

__all__ = [
    "build_visual_memory_bank",
    "build_textual_memory_bank",
    "encode_loader",
    "pre_load_features",
    "FeatureCache",
]
