"""Proto-CLIP-F-Q^T trainer: live CLIP-encoded queries each step.

Reference (``main.qt.py:184-260``): every batch of the shuffled, augmented
few-shot train loader is encoded by the *frozen* CLIP image tower under
``no_grad``, passed through the adapter, and scored against bank prototypes;
one AdamW step per batch.  This is the trainer whose hot loop crosses the
CLIP encoder, i.e. the workload the TPU build accelerates most.

Here the whole step — device-side normalize, frozen encode (bf16,
``stop_gradient``), adapter, classifier, loss, AdamW update — is one jitted
program, and the batch dimension is shardable over a device mesh (see
``protoclip_tpu.parallel``).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from protoclip_tpu.core.protoclip import ProtoClip
from protoclip_tpu.data.transforms import normalize_batch
from protoclip_tpu.models.adapters import apply_adapter, init_adapter
from protoclip_tpu.models.clip import CLIPConfig, encode_image
from protoclip_tpu.ops.losses import protoclip_loss
from protoclip_tpu.ops.proto import class_prototypes, l2_normalize, proto_probs
from protoclip_tpu.train.optim import cosine_lr, make_optimizer


@dataclasses.dataclass
class QTTrainer:
    """Q^T trainer; feed batches via :meth:`train_step`."""

    clip_params: Dict
    clip_cfg: CLIPConfig
    bank_v_init: np.ndarray  # (N*K, d)
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
    mesh: Optional[object] = None  # jax.sharding.Mesh for batch sharding
    compute_dtype: str = "bfloat16"  # pixel-normalize dtype, matches encode

    def __post_init__(self):
        d = self.bank_v_init.shape[1]
        self.params: Dict = {
            "bank_v": jnp.asarray(self.bank_v_init, jnp.float32),
            "adapter": init_adapter(jax.random.PRNGKey(self.seed), d, self.adapter_kind),
        }
        if not self.train_vis_mem_only:
            self.params["bank_t"] = jnp.asarray(self.bank_t_init, jnp.float32)
        self._frozen_bank_t = jnp.asarray(self.bank_t_init, jnp.float32)
        self.optimizer = make_optimizer(self.lr)
        self.opt_state = self.optimizer.init(self.params)
        self.epoch = 0
        self._step_fn = self._build_step_fn()

    def _build_step_fn(self):
        n, k = self.n_class, self.k_shots
        losses = self.losses
        alpha, beta = self.alpha, self.beta
        optimizer = self.optimizer
        clip_cfg = self.clip_cfg
        vis_only = self.train_vis_mem_only

        def loss_fn(params, frozen_bank_t, zq_frozen, labels, weights):
            bank_t = frozen_bank_t if vis_only else params["bank_t"]
            img_proto = class_prototypes(params["bank_v"], n, k)
            txt_proto = l2_normalize(bank_t.astype(jnp.float32))
            zq = apply_adapter(params["adapter"], zq_frozen, self.adapter_kind)
            zq = l2_normalize(zq.astype(jnp.float32))
            p = proto_probs(zq, img_proto, txt_proto, alpha, beta)
            terms = protoclip_loss(p, labels, img_proto, txt_proto, losses, weights)
            matches = jnp.sum(
                (jnp.argmax(p, axis=-1) == labels).astype(jnp.float32) * weights
            )
            return terms["total"], (matches, terms)

        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

        norm_dtype = jnp.bfloat16 if self.compute_dtype == "bfloat16" else jnp.float32

        if self.mesh is not None:
            # the frozen encode runs the Pallas fused-block kernels — opaque
            # custom calls the SPMD partitioner cannot split — so pin it to
            # per-device batch shards with shard_map (params replicated);
            # everything downstream (loss/grads over tiny banks) partitions
            # fine under plain jit and the psum falls out of the reduction
            try:
                from jax import shard_map
            except ImportError:  # older jax: experimental namespace
                from jax.experimental.shard_map import shard_map
            from jax.sharding import PartitionSpec as P

            def encode_sharded(cp, images):
                return shard_map(
                    lambda c, im: encode_image(c, im, clip_cfg),
                    mesh=self.mesh,
                    in_specs=(P(), P("data")),
                    out_specs=P("data"),
                )(cp, images)
        else:
            def encode_sharded(cp, images):
                return encode_image(cp, images, clip_cfg)

        # clip_params are a step ARGUMENT, not a closure capture: captured
        # device arrays get baked into the executable as constants (~1 GB
        # for ViT-L/14 — it can exceed remote-compile payload limits and
        # bloats every executable)
        def step(params, opt_state, cp, frozen_bank_t, images_u8, labels, n_valid, lr):
            opt_state.hyperparams["learning_rate"] = lr
            # same normalize dtype as the bank/eval encode path
            # (runner.py::make_encode_fns) so query features match the
            # cached features of the same images
            images = normalize_batch(images_u8, norm_dtype)
            zq_frozen = jax.lax.stop_gradient(
                encode_sharded(cp, images)
            ).astype(jnp.float32)
            weights = (jnp.arange(labels.shape[0]) < n_valid).astype(jnp.float32)
            (loss, (matches, terms)), grads = grad_fn(
                params, frozen_bank_t, zq_frozen, labels, weights
            )
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            stats = {"loss": loss, "matches": matches, "n": jnp.sum(weights)}
            # per-term breakdown for the reference's TensorBoard tags
            stats.update({f"term_{k}": v for k, v in terms.items() if k != "total"})
            return params, opt_state, stats

        if self.mesh is not None:
            from protoclip_tpu.parallel.sharding import shard_qt_step

            return shard_qt_step(step, self.mesh)
        return jax.jit(step, donate_argnums=(0, 1))

    def train_step(self, images_u8: np.ndarray, labels: np.ndarray, n_valid: int) -> Dict[str, float]:
        t_max = self.train_epoch * self.n_class * self.k_shots
        lr = cosine_lr(self.lr, self.epoch, t_max)
        if self.mesh is not None:
            # multi-process safe batch placement (each process keeps its
            # addressable shards; single-process this is a plain device_put,
            # and a no-op if the caller already sharded)
            from protoclip_tpu.parallel.sharding import shard_batch

            images = shard_batch(images_u8, self.mesh)
            # int32 normalization on EVERY path (a pre-placed float/int8
            # labels array must behave like the non-mesh branch's
            # jnp.asarray(labels, jnp.int32)); .astype preserves sharding
            if isinstance(labels, jax.Array):
                labels = labels.astype(jnp.int32)
            else:
                labels = np.asarray(labels, np.int32)
            labels = shard_batch(labels, self.mesh)
        else:
            images = jnp.asarray(images_u8)
            labels = jnp.asarray(labels, jnp.int32)
        self.params, self.opt_state, m = self._step_fn(
            self.params,
            self.opt_state,
            self.clip_params,
            self._frozen_bank_t,
            images,
            labels,
            jnp.asarray(n_valid, jnp.int32),
            jnp.asarray(lr, jnp.float32),
        )
        out = {
            "loss": float(m["loss"]),
            "acc": float(m["matches"]) / max(float(m["n"]), 1.0),
            "lr": lr,
        }
        for key, value in m.items():
            if key.startswith("term_"):
                out[key.removeprefix("term_")] = float(value)
        return out

    def finish_epoch(self) -> None:
        self.epoch += 1

    def model(self) -> ProtoClip:
        bank_t = self.params.get("bank_t", self._frozen_bank_t)
        return ProtoClip(
            bank_v=self.params["bank_v"],
            bank_t=bank_t,
            adapter=self.params["adapter"],
            adapter_kind=self.adapter_kind,
            shots=self.k_shots,
        )
