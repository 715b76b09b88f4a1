"""Dataset layer: 13 few-shot benchmarks + the CLIP image pipeline.

Re-implements the reference's ``datasets/`` package (13 adapters, few-shot
sampling, transforms, loaders — SURVEY.md §2) without torch/torchvision:
PIL does decode/resize on the host, normalization happens on device, and a
threaded prefetch loader feeds fixed-shape numpy batches to jit-compiled
encode functions.
"""

from protoclip_tpu.data.types import Datum, FewShotDataset
from protoclip_tpu.data.registry import build_dataset, available_datasets
from protoclip_tpu.data.transforms import (
    CLIP_MEAN,
    CLIP_STD,
    clip_preprocess,
    random_train_transform,
    normalize_batch,
)
from protoclip_tpu.data.loader import BatchLoader
from protoclip_tpu.data.query import iter_query_batches, query_bin_data

__all__ = [
    "Datum",
    "FewShotDataset",
    "build_dataset",
    "available_datasets",
    "CLIP_MEAN",
    "CLIP_STD",
    "clip_preprocess",
    "random_train_transform",
    "normalize_batch",
    "BatchLoader",
    "iter_query_batches",
    "query_bin_data",
]
