"""Checkpoint I/O: torch ``.pt`` reading without torch, CLIP weight mapping,
and Proto-CLIP ``_v/_t/_a`` checkpoint triples."""

from protoclip_tpu.io.torch_pt import load_pt
from protoclip_tpu.io.checkpoint import (
    load_checkpoint_triple,
    save_checkpoint_triple,
    checkpoint_paths,
)

__all__ = [
    "load_pt",
    "load_checkpoint_triple",
    "save_checkpoint_triple",
    "checkpoint_paths",
]
