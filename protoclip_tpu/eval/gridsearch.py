"""Vectorized alpha/beta hyperparameter sweep.

The reference evaluates an 11 x 29 (alpha, beta) grid with a Python
double-loop calling ``P`` per cell per split (``main.py:187-199,419-430``) —
~1000 GPU round trips.  On TPU the whole sweep is one jitted program: the two
distance matrices are computed once, then ``lax.map`` over betas (softmax
pair per beta) x ``vmap`` over alphas reuses them; only the (B, A) accuracy
matrix leaves the device.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from protoclip_tpu.ops.proto import proto_logits


def default_alpha_beta_grid() -> Tuple[np.ndarray, np.ndarray]:
    """The reference grid (``main.py:142-146``): alpha 0..1 step .1,
    beta {0.1..0.9} U {1..20}."""
    alphas = np.round(np.arange(0, 1.1, 0.1), 1)
    betas = np.concatenate([np.arange(0.1, 1.0, 0.1), np.arange(1.0, 21.0, 1.0)])
    return alphas.astype(np.float32), betas.astype(np.float32)


def alpha_beta_sweep(
    features: jax.Array,
    labels: jax.Array,
    img_protos: jax.Array,
    text_protos: jax.Array,
    alphas: np.ndarray | None = None,
    betas: np.ndarray | None = None,
) -> np.ndarray:
    """Accuracy for every (alpha, beta) cell -> fp32 array (A, B).

    ``features`` are cached (optionally adapter-transformed) query features.
    """
    if alphas is None or betas is None:
        d_alphas, d_betas = default_alpha_beta_grid()
        alphas = alphas if alphas is not None else d_alphas
        betas = betas if betas is not None else d_betas
    acc = _sweep_jit(
        jnp.asarray(features),
        jnp.asarray(labels),
        jnp.asarray(img_protos),
        jnp.asarray(text_protos),
        jnp.asarray(alphas, jnp.float32),
        jnp.asarray(betas, jnp.float32),
    )
    return np.asarray(acc)


@jax.jit
def _sweep_jit(features, labels, img_protos, text_protos, alphas, betas):
    logits_img = proto_logits(features, img_protos)  # (Q, N), fp32
    logits_text = proto_logits(features, text_protos)

    def per_beta(beta):
        p_img = jax.nn.softmax(beta * logits_img, axis=-1)
        p_text = jax.nn.softmax(beta * logits_text, axis=-1)

        def per_alpha(alpha):
            preds = jnp.argmax(alpha * p_img + (1.0 - alpha) * p_text, axis=-1)
            return jnp.mean((preds == labels).astype(jnp.float32))

        return jax.vmap(per_alpha)(alphas)

    acc_ba = jax.lax.map(per_beta, betas)  # (B, A); map keeps memory at O(Q*N)
    return acc_ba.T  # (A, B)


def sweep_to_triples(acc: np.ndarray, alphas: np.ndarray, betas: np.ndarray) -> np.ndarray:
    """Flatten to the reference's ``[alpha, beta, acc]`` row list
    (alpha-major order, ``main.py:187-199``)."""
    rows = [
        [float(a), float(b), float(acc[i, j])]
        for i, a in enumerate(alphas)
        for j, b in enumerate(betas)
    ]
    return np.asarray(rows, dtype=np.float32)


def triples_to_sweep(
    triples: np.ndarray, alphas: np.ndarray, betas: np.ndarray
) -> np.ndarray:
    """Inverse of :func:`sweep_to_triples`: rebuild the ``(A, B)`` accuracy
    grid from a reference ``[alpha, beta, acc]`` row list
    (``zero_shot_hp_search_*.pkl``, ``main.py:155-211``).

    Rows are matched by their (alpha, beta) values rather than assumed
    alpha-major, so grids written by either implementation round-trip.
    """
    triples = np.asarray(triples, np.float32)
    if triples.ndim != 2 or triples.shape[1] != 3:
        raise ValueError(f"expected (M, 3) [alpha, beta, acc] rows, got {triples.shape}")
    acc = np.full((len(alphas), len(betas)), np.nan, np.float32)
    ai = {round(float(a), 4): i for i, a in enumerate(alphas)}
    bj = {round(float(b), 4): j for j, b in enumerate(betas)}
    for a, b, v in triples:
        i, j = ai.get(round(float(a), 4)), bj.get(round(float(b), 4))
        if i is not None and j is not None:
            acc[i, j] = v
    if np.isnan(acc).any():
        raise ValueError("cached HP grid does not cover the full alpha/beta grid")
    return acc


def best_cell(acc: np.ndarray) -> Tuple[int, int]:
    """Grid indices of the best cell; ties resolve to the earliest cell in
    alpha-major order, matching ``argmax`` over the reference's row list.
    The single source of truth for sweep-grid selection — value lookups
    (:func:`best_operating_point`) and index-based lookups (the test-phase
    searched operating point) must agree on tie-breaking."""
    i, j = np.unravel_index(int(np.argmax(acc)), acc.shape)
    return int(i), int(j)


def best_operating_point(
    acc: np.ndarray, alphas: np.ndarray, betas: np.ndarray
) -> Tuple[float, float, float]:
    """(best_alpha, best_beta, best_acc) of the grid (see :func:`best_cell`)."""
    i, j = best_cell(acc)
    return float(alphas[i]), float(betas[j]), float(acc[i, j])
