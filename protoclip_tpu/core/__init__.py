"""Core Proto-CLIP abstractions: config system and the prototype classifier
model built from memory banks + adapter."""

from protoclip_tpu.core.config import load_config, Config
from protoclip_tpu.core.protoclip import ProtoClip

__all__ = ["load_config", "Config", "ProtoClip"]
