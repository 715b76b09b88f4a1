"""Prototype math and the alpha/beta prototype classifier ``P``.

Reference semantics (``utils.py:225-244``):

    d_img  = cdist(q, img_protos)^2            # squared Euclidean
    d_text = cdist(q, text_protos)^2
    p = alpha * softmax(-beta * d_img, axis=1)
        + (1 - alpha) * softmax(-beta * d_text, axis=1)

TPU-first formulation: ``d^2(q, p_k) = |q|^2 + |p_k|^2 - 2 q.p_k``.  The
``|q|^2`` term is constant per row and cancels inside the softmax, so the
classifier reduces to ``softmax(beta * (2 q @ P^T - |p_k|^2))`` — a single
MXU matmul plus a per-class bias, with no (Q, N, d) intermediate.  This is
mathematically identical to the reference (not just approximately).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def l2_normalize(x: jax.Array, axis: int = -1, eps: float = 0.0) -> jax.Array:
    """Divide by the L2 norm along ``axis`` (torch ``x / x.norm(dim,keepdim)``)."""
    norm = jnp.linalg.norm(x.astype(jnp.float32), axis=axis, keepdims=True)
    if eps:
        norm = jnp.maximum(norm, eps)
    return (x.astype(jnp.float32) / norm).astype(x.dtype)


def class_prototypes(bank: jax.Array, n_class: int, k_shots: int) -> jax.Array:
    """Visual memory bank (N*K, d) -> L2-normalized class prototypes (N, d).

    Matches ``main.py:260-264``: per-row L2-normalize, mean over the K shots,
    then re-normalize, all in fp32.
    """
    # eps guards the all-zero placeholder bank of text-only operation
    # (core.protoclip.from_arrays): real banks have unit-norm rows, for
    # which max(norm, eps) == norm exactly — bit-identical to the reference.
    zs = l2_normalize(bank.astype(jnp.float32).reshape(n_class, k_shots, -1), eps=1e-12)
    proto = zs.mean(axis=1)
    return l2_normalize(proto, eps=1e-12)


def squared_euclidean(q: jax.Array, protos: jax.Array) -> jax.Array:
    """Full pairwise squared Euclidean distances (Q, N), fp32.

    Provided for parity checks; the classifier itself uses the
    row-constant-free form from :func:`proto_logits`.
    """
    qf = q.astype(jnp.float32)
    pf = protos.astype(jnp.float32)
    q_sq = jnp.sum(qf * qf, axis=-1, keepdims=True)
    p_sq = jnp.sum(pf * pf, axis=-1)
    cross = qf @ pf.T
    return jnp.maximum(q_sq + p_sq[None, :] - 2.0 * cross, 0.0)


def proto_logits(q: jax.Array, protos: jax.Array) -> jax.Array:
    """Negative squared distance up to a per-row constant: ``2 q.p - |p|^2``.

    ``softmax(beta * proto_logits)`` equals ``softmax(-beta * d^2)`` exactly.
    One (Q, d) x (d, N) matmul on the MXU plus a per-class bias.
    """
    qf = q.astype(jnp.float32)
    pf = protos.astype(jnp.float32)
    p_sq = jnp.sum(pf * pf, axis=-1)
    return 2.0 * (qf @ pf.T) - p_sq[None, :]


def proto_probs(
    q: jax.Array,
    img_protos: jax.Array,
    text_protos: jax.Array,
    alpha: jax.Array | float,
    beta: jax.Array | float,
) -> jax.Array:
    """The Proto-CLIP classifier ``P`` (ref ``utils.py:225-244``), fp32.

    Returns the mixed probability distribution (Q, N).
    """
    p_img = jax.nn.softmax(beta * proto_logits(q, img_protos), axis=-1)
    p_text = jax.nn.softmax(beta * proto_logits(q, text_protos), axis=-1)
    return alpha * p_img + (1.0 - alpha) * p_text


def proto_predict(
    q: jax.Array,
    img_protos: jax.Array,
    text_protos: jax.Array,
    alpha: jax.Array | float,
    beta: jax.Array | float,
) -> Tuple[jax.Array, jax.Array]:
    """Argmax class and its probability for each query."""
    p = proto_probs(q, img_protos, text_protos, alpha, beta)
    return jnp.argmax(p, axis=-1), jnp.max(p, axis=-1)
