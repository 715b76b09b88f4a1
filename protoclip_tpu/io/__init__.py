"""File I/O: torch ``.pt``/raw-pickle/TorchScript reading without torch,
MAT5 read/write, checksum-verified weight download, CLIP weight mapping,
Proto-CLIP ``_v/_t/_a`` checkpoint triples, and AOT serving bundles."""

from protoclip_tpu.io.export import (
    load_serving_bundle,
    make_encode_fn,
    save_serving_bundle,
)
from protoclip_tpu.io.torch_pt import load_pkl, load_pt
from protoclip_tpu.io.mat import load_mat, save_mat
from protoclip_tpu.io.download import download_and_extract, download_weights, extract_archive
from protoclip_tpu.io.checkpoint import (
    load_checkpoint_triple,
    save_checkpoint_triple,
    checkpoint_paths,
)

__all__ = [
    "load_pt",
    "load_pkl",
    "load_mat",
    "save_mat",
    "download_and_extract",
    "download_weights",
    "extract_archive",
    "load_checkpoint_triple",
    "save_checkpoint_triple",
    "checkpoint_paths",
    "load_serving_bundle",
    "make_encode_fn",
    "save_serving_bundle",
]
