"""Proto-CLIP's loss stack (ref ``utils.py:72-109``).

- L1: NLL of the mixed probability ``p`` against episode labels.
- L2: InfoNCE(img_protos, text_protos)  — image-to-text alignment.
- L3: InfoNCE(text_protos, img_protos)  — text-to-image alignment.
- L4: self-InfoNCE of each modality (inter-cluster separation).

InfoNCE follows the `info-nce-pytorch` package defaults used by the reference
(``utils.py:72-77``): L2-normalize query and keys, logits = q @ k^T / 0.1,
positives on the diagonal, mean cross-entropy.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp

from protoclip_tpu.ops.proto import l2_normalize

INFO_NCE_TEMPERATURE = 0.1


def nll_of_probs(
    p: jax.Array,
    labels: jax.Array,
    weights: Optional[jax.Array] = None,
    eps: float = 0.0,
) -> jax.Array:
    """Mean negative log of ``p[i, labels[i]]`` (torch ``NLLLoss(log(p))``).

    ``weights`` (0/1 per query) supports the fixed-shape masked episodes of
    the TPU trainer: padded query rows contribute zero.
    """
    pf = p.astype(jnp.float32)
    picked = jnp.take_along_axis(pf, labels[:, None], axis=-1)[:, 0]
    if weights is None:
        return (-jnp.log(picked + eps)).mean()
    w = weights.astype(jnp.float32)
    # NaN-safe masking must use the double-where pattern: masking only the
    # *output* (where(w>0, -log(picked), 0)) keeps log(0)=inf inside the
    # computation, and its backward pass is 0 * d(log)/dp = 0 * inf = NaN,
    # which poisons every parameter in one step (seen at beta >= ~26 with
    # padded rows). Substitute a safe input first so neither the forward
    # nor the backward of the masked branch touches log(0).
    safe_picked = jnp.where(w > 0, picked, 1.0)
    logs = jnp.where(w > 0, -jnp.log(safe_picked + eps), 0.0)
    return jnp.sum(logs * w) / jnp.maximum(jnp.sum(w), 1.0)


def info_nce(
    query: jax.Array,
    keys: jax.Array,
    temperature: float = INFO_NCE_TEMPERATURE,
) -> jax.Array:
    """InfoNCE with in-batch negatives; positives are aligned rows.

    eps guards zero rows (the all-zero placeholder visual bank of text-only
    operation yields zero prototypes): 0/0 would poison the loss with NaN;
    real prototypes are unit-norm, for which max(norm, eps) == norm."""
    qn = l2_normalize(query.astype(jnp.float32), eps=1e-12)
    kn = l2_normalize(keys.astype(jnp.float32), eps=1e-12)
    logits = (qn @ kn.T) / temperature
    labels = jnp.arange(logits.shape[0])
    logp = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.take_along_axis(logp, labels[:, None], axis=-1).mean()


def protoclip_loss(
    p: jax.Array,
    labels: jax.Array,
    img_protos: jax.Array,
    text_protos: jax.Array,
    losses: Sequence[str] = ("L1", "L2", "L3"),
    query_weights: Optional[jax.Array] = None,
) -> Dict[str, jax.Array]:
    """Total Proto-CLIP loss + per-term breakdown (ref ``utils.py:80-109``).

    Returns a dict with ``total`` plus each enabled term (L1..L5 keyed as in
    the reference's TensorBoard scalars, ``main.py:287-302``).
    """
    terms: Dict[str, jax.Array] = {}
    total = jnp.float32(0.0)
    if len(losses) == 0 or "L1" in losses:
        terms["L1"] = nll_of_probs(p, labels, query_weights)
        total = total + terms["L1"]
    if "L2" in losses:
        terms["L2"] = info_nce(img_protos, text_protos)
        total = total + terms["L2"]
    if "L3" in losses:
        terms["L3"] = info_nce(text_protos, img_protos)
        total = total + terms["L3"]
    if "L4" in losses:
        terms["L4"] = info_nce(img_protos, img_protos)
        terms["L5"] = info_nce(text_protos, text_protos)
        total = total + terms["L4"] + terms["L5"]
    terms["total"] = total
    return terms
