"""The Proto-CLIP classifier head: memory banks + adapter + ``P``.

Bundles the trainable state (visual bank ``(N*K, d)``, textual bank
``(N, d)``, adapter params) and provides jit-compiled classification over
cached features — the inference path shared by the zero-shot evaluator, the
trainers' val passes, the test sweep, and the deployment toolkit.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from protoclip_tpu.models.adapters import apply_adapter
from protoclip_tpu.ops.proto import class_prototypes, l2_normalize, proto_probs


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class ProtoClip:
    """Proto-CLIP state (a pytree: jit/grad-able)."""

    bank_v: jax.Array  # (N*K, d) visual memory bank
    bank_t: jax.Array  # (N, d) textual memory bank
    adapter: Dict[str, jax.Array]  # adapter params
    adapter_kind: str = dataclasses.field(metadata={"static": True}, default="fc")
    shots: int = dataclasses.field(metadata={"static": True}, default=16)

    @property
    def n_class(self) -> int:
        return self.bank_t.shape[0]

    @property
    def dim(self) -> int:
        return self.bank_t.shape[1]

    def prototypes(self) -> Tuple[jax.Array, jax.Array]:
        """(image prototypes, text prototypes), both (N, d) L2-normalized.

        Image protos: per-shot normalize -> mean -> normalize
        (``main.py:260-264``); text protos: normalize rows (``main.py:276-279``).
        """
        img = class_prototypes(self.bank_v, self.n_class, self.shots)
        txt = l2_normalize(self.bank_t.astype(jnp.float32))
        return img, txt

    def adapt(self, features: jax.Array, normalize: bool = True) -> jax.Array:
        """Adapter forward on (B, d) features, optional L2-normalize.

        An empty adapter (no ``_a`` checkpoint, e.g. zero-shot operation)
        is the identity — the pytree's emptiness is structural, so this
        branch resolves at trace time."""
        if not self.adapter:
            out = features.astype(jnp.float32)
        else:
            out = apply_adapter(self.adapter, features.astype(jnp.float32), self.adapter_kind)
        return l2_normalize(out) if normalize else out

    def probs(self, features: jax.Array, alpha, beta, adapt: bool = True) -> jax.Array:
        """Classify cached CLIP features -> (B, N) mixed probabilities."""
        q = self.adapt(features) if adapt else features
        img_p, txt_p = self.prototypes()
        return proto_probs(q, img_p, txt_p, alpha, beta)


@functools.partial(jax.jit, static_argnames=("adapt",))
def _predict(model: ProtoClip, features: jax.Array, alpha, beta, adapt: bool = True):
    p = model.probs(features, alpha, beta, adapt=adapt)
    return jnp.argmax(p, axis=-1), jnp.max(p, axis=-1)


def predict(model: ProtoClip, features, alpha: float, beta: float, adapt: bool = True):
    """Jitted top-1 prediction -> (labels (B,), confidences (B,))."""
    return _predict(model, jnp.asarray(features), alpha, beta, adapt=adapt)


@functools.partial(jax.jit, static_argnames=("adapt",))
def _accuracy(model: ProtoClip, features, labels, alpha, beta, adapt: bool = True):
    p = model.probs(features, alpha, beta, adapt=adapt)
    return jnp.mean((jnp.argmax(p, axis=-1) == labels).astype(jnp.float32))


def accuracy(
    model: ProtoClip, features, labels, alpha: float, beta: float, adapt: bool = True
) -> float:
    """Top-1 accuracy over cached features."""
    return float(
        _accuracy(model, jnp.asarray(features), jnp.asarray(labels), alpha, beta, adapt=adapt)
    )


def from_arrays(
    bank_v: Optional[np.ndarray],
    bank_t: np.ndarray,
    adapter_params: Dict,
    adapter_kind: str,
    shots: int,
) -> ProtoClip:
    """Build a ProtoClip from host arrays.

    ``bank_v`` may be absent for text-only operation (e.g. partial
    pretrained_ckpt snapshots): the zero placeholder bank yields *uniform*
    visual probabilities (zero prototypes — ``class_prototypes`` guards the
    division), so use alpha=0 for exact text-only semantics.
    ``adapter_params`` may be ``None``/empty (no ``_a`` checkpoint): the
    adapter is then the identity."""
    bank_t = jnp.asarray(bank_t, jnp.float32)
    if bank_v is None:
        bank_v = jnp.zeros((bank_t.shape[0] * shots, bank_t.shape[1]), jnp.float32)
    return ProtoClip(
        bank_v=jnp.asarray(bank_v, jnp.float32),
        bank_t=bank_t,
        adapter=jax.tree_util.tree_map(
            lambda x: jnp.asarray(x, jnp.float32), adapter_params or {}
        ),
        adapter_kind=adapter_kind,
        shots=shots,
    )
