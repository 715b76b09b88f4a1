"""Trainers: Proto-CLIP-F (episodic over cached features, ``main.py:216-381``)
and Proto-CLIP-F-Q^T (live CLIP-encoded queries, ``main.qt.py:184-260``),
both as fully jit-compiled TPU programs."""

from protoclip_tpu.train.optim import make_optimizer, cosine_lr
from protoclip_tpu.train.episodic import (
    EpisodicTrainer,
    make_episode_masks,
    make_episode_queries,
)
from protoclip_tpu.train.qt import QTTrainer

__all__ = [
    "make_optimizer",
    "cosine_lr",
    "EpisodicTrainer",
    "make_episode_masks",
    "make_episode_queries",
    "QTTrainer",
]
