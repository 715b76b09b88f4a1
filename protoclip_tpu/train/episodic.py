"""Proto-CLIP-F episodic trainer as a fixed-shape TPU program.

Reference hot loop (``main.py:222-313``): per epoch, a class permutation is
chopped into random chunks of 20-40% of the classes; for each chunk
("episode") every chunk class's K support slots are randomly split into
support/query, the *frozen* cached features of the query slots pass through
the adapter, and one AdamW step minimizes L1+L2+L3 against prototypes built
from the *trainable* banks (prototypes always use all N classes and all K
slots, ``main.py:260-264``; queries are the frozen keys, ``main.py:267``).

TPU reformulation (SURVEY.md §7 "hard parts"): variable-length episodes
become fixed-shape gather buffers — per episode a ``(Q,)`` block of query row
indices / labels / 0-1 weights sampled on host with numpy, Q sized to the
largest possible episode — and one jitted ``lax.scan`` consumes all E
episodes of an epoch in a single dispatch.  Weighted loss over the padded
buffer is mathematically identical to the reference's variable-length query
set (padding carries zero weight); padded episodes (``valid = 0``) leave
params and optimizer state untouched.  A dense-mask view
(:func:`make_episode_masks`) of the same sampler exists for analysis/tests.

Exact PyTorch RNG replay is impossible (different generators); the parity
target is accuracy, not bitwise traces.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from protoclip_tpu.core.protoclip import ProtoClip
from protoclip_tpu.models.adapters import apply_adapter, init_adapter
from protoclip_tpu.ops.losses import protoclip_loss
from protoclip_tpu.ops.proto import class_prototypes, l2_normalize, proto_probs
from protoclip_tpu.train.optim import cosine_lr, make_optimizer


def episode_bounds(n_class: int) -> Tuple[int, int]:
    """Class-chunk size bounds (ref ``main.py:218-220``)."""
    upper = max(int(n_class * 0.4), 2)
    lower = max(int(n_class * 0.2), 1)
    return lower, upper


def max_episodes(n_class: int) -> int:
    lower, _ = episode_bounds(n_class)
    return int(np.ceil(max(n_class - 1, 1) / lower))


def max_queries(n_class: int, k_shots: int) -> int:
    """Fixed per-episode query-buffer size: the largest possible episode
    (``upper`` classes, ``K-1`` queries each; K queries when K == 1)."""
    _, upper = episode_bounds(n_class)
    return upper * (k_shots - 1 if k_shots > 1 else 1)


def _sample_epoch(rng: np.random.Generator, n_class: int, k_shots: int):
    """One epoch of reference-style episodes as (class, slot) index lists.

    Mirrors the reference sampler (``main.py:235-258``): a class permutation
    chunked by ``randint(lower, upper)`` sizes over positions ``[0, N-1)``
    (the final permutation position never participates — reference quirk);
    per chunk class, ``n = randint(1, K)`` support slots, the remaining
    ``K - n`` are queries (all K slots when K == 1).
    """
    lower, upper = episode_bounds(n_class)
    episodes = []
    perm = rng.permutation(n_class)
    start = 0
    while start < n_class - 1:
        num = int(rng.integers(lower, upper)) if upper > lower else lower
        chunk = perm[start : min(start + num, n_class - 1)]
        if len(chunk) == 0:
            break
        queries = []  # (class, slot)
        for cls in chunk:
            if k_shots > 1:
                n_support = int(rng.integers(1, k_shots))
                slots = rng.permutation(k_shots)
                queries.extend((int(cls), int(s)) for s in slots[n_support:])
            else:
                queries.append((int(cls), 0))
        episodes.append(queries)
        start += len(chunk)
    return episodes


def make_episode_masks(
    rng: np.random.Generator, n_class: int, k_shots: int
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Dense-mask view of one epoch of episodes (used by tests/analysis).

    Returns ``class_mask (E, N)``, ``query_mask (E, N, K)``, ``valid (E,)``
    with E = :func:`max_episodes` (trailing episodes zero-padded).
    """
    E = max_episodes(n_class)
    class_mask = np.zeros((E, n_class), np.float32)
    query_mask = np.zeros((E, n_class, k_shots), np.float32)
    valid = np.zeros((E,), np.float32)
    for e, queries in enumerate(_sample_epoch(rng, n_class, k_shots)[:E]):
        for cls, slot in queries:
            class_mask[e, cls] = 1.0
            query_mask[e, cls, slot] = 1.0
        valid[e] = 1.0
    return class_mask, query_mask, valid


def make_episode_queries(
    rng: np.random.Generator, n_class: int, k_shots: int
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Gather-form episodes: fixed-size query index buffers.

    Returns ``query_idx (E, Q)`` (row indices into the (N*K) bank),
    ``query_labels (E, Q)``, ``query_w (E, Q)`` (1 for real queries, 0 for
    padding), ``valid (E,)``; Q = :func:`max_queries`.  The trainer runs the
    adapter/classifier only on these rows instead of the full N*K block —
    identical math (padded rows carry zero loss weight), ~2.5x less episode
    compute at the reference's 20-40% class-sampling rate.
    """
    E = max_episodes(n_class)
    Q = max_queries(n_class, k_shots)
    query_idx = np.zeros((E, Q), np.int32)
    query_labels = np.zeros((E, Q), np.int32)
    query_w = np.zeros((E, Q), np.float32)
    valid = np.zeros((E,), np.float32)
    for e, queries in enumerate(_sample_epoch(rng, n_class, k_shots)[:E]):
        for j, (cls, slot) in enumerate(queries[:Q]):
            query_idx[e, j] = cls * k_shots + slot
            query_labels[e, j] = cls
            query_w[e, j] = 1.0
        valid[e] = 1.0
    return query_idx, query_labels, query_w, valid


@dataclasses.dataclass
class EpisodicTrainer:
    """Owns the jitted epoch program and the training state.

    Parameters mirror the reference config: ``alpha/beta`` are the fixed
    operating point used during training (``main.py:213-214``),
    ``train_vis_mem_only`` drops the textual bank from the optimizer
    (``main.py:127-132``), ``losses`` selects L1/L2/L3/L4.
    """

    frozen_keys: np.ndarray  # (N*K, d) cached support features (query source)
    bank_t_init: np.ndarray  # (N, d)
    n_class: int
    k_shots: int
    adapter_kind: str
    alpha: float
    beta: float
    lr: float = 1e-4
    train_epoch: int = 2000
    losses: Tuple[str, ...] = ("L1", "L2", "L3")
    train_vis_mem_only: bool = False
    seed: int = 1

    def __post_init__(self):
        d = self.frozen_keys.shape[1]
        self.params: Dict = {
            "bank_v": jnp.asarray(self.frozen_keys, jnp.float32),
            "adapter": init_adapter(jax.random.PRNGKey(self.seed), d, self.adapter_kind),
        }
        if not self.train_vis_mem_only:
            self.params["bank_t"] = jnp.asarray(self.bank_t_init, jnp.float32)
        self._frozen_bank_t = jnp.asarray(self.bank_t_init, jnp.float32)
        self._frozen_keys = jnp.asarray(self.frozen_keys, jnp.float32)
        self.optimizer = make_optimizer(self.lr)
        self.opt_state = self.optimizer.init(self.params)
        self._epoch_fn = self._build_epoch_fn()
        self.epoch = 0

    # -- construction of the jitted epoch ----------------------------------

    def _build_epoch_fn(self):
        n, k = self.n_class, self.k_shots
        losses = self.losses
        alpha, beta = self.alpha, self.beta
        optimizer = self.optimizer
        vis_only = self.train_vis_mem_only

        # frozen_keys/frozen_bank_t are epoch_fn ARGUMENTS, not closure
        # captures: captured device arrays get baked into the executable as
        # constants (65 MB of cached features at ImageNet scale), inflating
        # every (remote) compile — and a restored frozen bank would
        # otherwise require rebuilding the jitted fn.
        def episode_loss(params, frozen_keys, frozen_bank_t, query_idx, query_labels, query_w):
            bank_t = frozen_bank_t if vis_only else params["bank_t"]
            img_proto = class_prototypes(params["bank_v"], n, k)
            txt_proto = l2_normalize(bank_t.astype(jnp.float32))
            # queries are the *frozen* cached features of the sampled rows
            # (main.py:267); only those rows pass through the adapter.
            zq = apply_adapter(
                params["adapter"], frozen_keys[query_idx], self.adapter_kind
            )
            zq = l2_normalize(zq.astype(jnp.float32))
            p = proto_probs(zq, img_proto, txt_proto, alpha, beta)
            terms = protoclip_loss(
                p, query_labels, img_proto, txt_proto, losses, query_weights=query_w
            )
            preds = jnp.argmax(p, axis=-1)
            matches = jnp.sum((preds == query_labels).astype(jnp.float32) * query_w)
            return terms["total"], (terms, matches)

        grad_fn = jax.value_and_grad(episode_loss, has_aux=True)

        def one_episode(frozen_keys, frozen_bank_t, carry, episode):
            params, opt_state = carry
            query_idx, query_labels, query_w, valid = episode
            (loss, (terms, matches)), grads = grad_fn(
                params, frozen_keys, frozen_bank_t, query_idx, query_labels, query_w
            )
            updates, new_opt_state = optimizer.update(grads, opt_state, params)
            new_params = optax.apply_updates(params, updates)
            # padded episode: keep previous params/opt state
            keep = valid > 0
            params = jax.tree_util.tree_map(
                lambda new, old: jnp.where(keep, new, old), new_params, params
            )
            opt_state = jax.tree_util.tree_map(
                lambda new, old: jnp.where(keep, new, old), new_opt_state, opt_state
            )
            metrics = {
                "loss": loss * valid,
                "matches": matches * valid,
                "queries": jnp.sum(query_w) * valid,
                "episodes": valid,
            }
            for term, value in terms.items():
                if term != "total":
                    metrics[f"term_{term}"] = value * valid
            return (params, opt_state), metrics

        @jax.jit
        def epoch_fn(
            params, opt_state, frozen_keys, frozen_bank_t,
            query_idx, query_labels, query_w, valid, lr,
        ):
            opt_state = _set_lr(opt_state, lr)
            (params, opt_state), metrics = jax.lax.scan(
                lambda carry, ep: one_episode(frozen_keys, frozen_bank_t, carry, ep),
                (params, opt_state),
                (query_idx, query_labels, query_w, valid),
            )
            n_ep = jnp.maximum(jnp.sum(metrics["episodes"]), 1)
            agg = {
                "loss": jnp.sum(metrics["loss"]) / n_ep,
                "acc": jnp.sum(metrics["matches"]) / jnp.maximum(jnp.sum(metrics["queries"]), 1),
            }
            for key in metrics:
                if key.startswith("term_"):
                    agg[key] = jnp.sum(metrics[key]) / n_ep
            return params, opt_state, agg

        return epoch_fn

    # -- public API ---------------------------------------------------------

    def run_epoch(self) -> Dict[str, float]:
        """Sample an epoch of episodes on host, run the jitted scan.

        The episode RNG is derived from (seed, epoch index) rather than kept
        as a continuous stream, so a run resumed from a snapshot samples the
        exact same episodes as an uninterrupted run (replay-exact resume).
        """
        epoch_rng = np.random.default_rng(self.seed + self.epoch * 65537)
        query_idx, query_labels, query_w, valid = make_episode_queries(
            epoch_rng, self.n_class, self.k_shots
        )
        t_max = self.train_epoch * self.n_class * self.k_shots
        lr = cosine_lr(self.lr, self.epoch, t_max)
        self.params, self.opt_state, agg = self._epoch_fn(
            self.params,
            self.opt_state,
            self._frozen_keys,
            self._frozen_bank_t,
            jnp.asarray(query_idx),
            jnp.asarray(query_labels),
            jnp.asarray(query_w),
            jnp.asarray(valid),
            jnp.asarray(lr, jnp.float32),
        )
        self.epoch += 1
        out = {"loss": float(agg["loss"]), "acc": float(agg["acc"]), "lr": lr}
        for key, value in agg.items():
            if key.startswith("term_"):
                out[key.removeprefix("term_")] = float(value)
        return out

    def model(self) -> ProtoClip:
        bank_t = self.params.get("bank_t", self._frozen_bank_t)
        return ProtoClip(
            bank_v=self.params["bank_v"],
            bank_t=bank_t,
            adapter=self.params["adapter"],
            adapter_kind=self.adapter_kind,
            shots=self.k_shots,
        )

    def load_model(self, model: ProtoClip) -> None:
        """Restore trainable params from a ProtoClip (e.g. best checkpoint)."""
        self.params["bank_v"] = jnp.asarray(model.bank_v, jnp.float32)
        if not self.train_vis_mem_only:
            self.params["bank_t"] = jnp.asarray(model.bank_t, jnp.float32)
        else:
            # frozen_bank_t is an epoch_fn argument, so the restored bank
            # takes effect on the next run_epoch without a rebuild
            self._frozen_bank_t = jnp.asarray(model.bank_t, jnp.float32)
        self.params["adapter"] = jax.tree_util.tree_map(
            lambda x: jnp.asarray(x, jnp.float32), model.adapter
        )


def _set_lr(opt_state, lr):
    """Update the injected learning-rate hyperparameter in-place."""
    opt_state.hyperparams["learning_rate"] = lr
    return opt_state
