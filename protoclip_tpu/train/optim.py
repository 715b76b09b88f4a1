"""Optimizer setup mirroring the reference trainer.

Reference (``main.py:134-137``): ``AdamW(lr, eps=1e-4, weight_decay=0.05)``
with ``CosineAnnealingLR(T_max=train_epoch * N*K)`` stepped once per *epoch*
— so the cosine is traversed only ``train_epoch / (train_epoch * N*K)`` of
the way; effectively a very gentle decay.  We reproduce that exact schedule.
"""

from __future__ import annotations

import math

import optax


def cosine_lr(base_lr: float, epoch: int, t_max: int, eta_min: float = 0.0) -> float:
    """torch ``CosineAnnealingLR`` value at ``T_cur = epoch``."""
    return eta_min + (base_lr - eta_min) * (1 + math.cos(math.pi * epoch / t_max)) / 2


def make_optimizer(base_lr: float) -> optax.GradientTransformation:
    """AdamW with the reference's hyperparameters; the learning rate is a
    mutable hyperparameter updated per epoch from :func:`cosine_lr`."""
    return optax.inject_hyperparams(optax.adamw)(
        learning_rate=base_lr, b1=0.9, b2=0.999, eps=1e-4, weight_decay=0.05
    )
