"""Evaluation: the alpha/beta hyperparameter sweep and accuracy metrics."""

from protoclip_tpu.eval.gridsearch import (
    default_alpha_beta_grid,
    alpha_beta_sweep,
    best_operating_point,
    sweep_to_triples,
)
from protoclip_tpu.eval.metrics import top_k_accuracy

__all__ = [
    "default_alpha_beta_grid",
    "alpha_beta_sweep",
    "best_operating_point",
    "sweep_to_triples",
    "top_k_accuracy",
]
