"""F-Q^T experiment runner — the ``main.qt.py`` flow (``main.qt.py:418-500``):
identical setup to the episodic runner, but training iterates a *shuffled*,
augmented few-shot loader whose batches are re-encoded by frozen CLIP every
step (no interactive input() gate — that reference quirk is dropped)."""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from protoclip_tpu.core.config import Config
from protoclip_tpu.core.protoclip import ProtoClip, accuracy
from protoclip_tpu.data import BatchLoader, build_dataset
from protoclip_tpu.data.transforms import EvalTransform, TrainTransform
from protoclip_tpu.eval.gridsearch import (
    alpha_beta_sweep,
    best_operating_point,
    default_alpha_beta_grid,
)
from protoclip_tpu.io.checkpoint import checkpoint_paths, save_checkpoint_triple, load_checkpoint_triple
from protoclip_tpu.memory import (
    FeatureCache,
    build_textual_memory_bank,
    build_visual_memory_bank,
    pre_load_features,
)
from protoclip_tpu.models import adapter_to_torch_state
from protoclip_tpu.models.adapters import adapter_from_torch_state
from protoclip_tpu.obs.logging import MetricLogger
from protoclip_tpu.train.qt import QTTrainer
from protoclip_tpu.train.runner import ExperimentResult, make_encode_fns


def run_qt(cfg: Config, mesh=None, progress: bool = True, logger: Optional[MetricLogger] = None) -> ExperimentResult:
    cfg.validate()
    logger = logger or MetricLogger(os.path.join(cfg.logs_dir_path, f"{cfg.dataset}-qt"))
    encode_fn, text_fn, clip_cfg, clip_params = make_encode_fns(cfg, mesh)
    cache = FeatureCache(cfg.cache_dir, cfg.backbone, cfg.shots)
    dataset = build_dataset(cfg.dataset, cfg.root_path, cfg.shots, seed=cfg.seed)
    n_px = clip_cfg.image_resolution

    cache_loader = BatchLoader(
        dataset.train_x, batch_size=cfg.batch_size,
        transform=TrainTransform(n_px), shuffle=False, seed=cfg.seed, image_size=n_px,
    )
    train_loader = BatchLoader(
        dataset.train_x, batch_size=min(cfg.batch_size, max(64, len(dataset.train_x))),
        transform=TrainTransform(n_px), shuffle=True, seed=cfg.seed, image_size=n_px,
    )
    val_loader = BatchLoader(
        dataset.val, batch_size=cfg.batch_size, transform=EvalTransform(n_px), image_size=n_px
    )
    test_loader = BatchLoader(
        dataset.test, batch_size=cfg.batch_size, transform=EvalTransform(n_px), image_size=n_px
    )

    bank_v, _bank_values = build_visual_memory_bank(
        encode_fn, cache_loader, cfg.augment_epoch, cache, progress=progress
    )
    bank_t = build_textual_memory_bank(
        text_fn, dataset.classnames, dataset.template, cache,
        context_length=clip_cfg.context_length,
    )
    val_feats, val_labels = pre_load_features(encode_fn, val_loader, "val", cache, progress)
    test_feats, test_labels = pre_load_features(encode_fn, test_loader, "test", cache, progress)

    n_class, k = dataset.num_classes, cfg.shots
    alpha, beta = cfg.alpha, cfg.beta
    ckpt_v, ckpt_t, ckpt_a = checkpoint_paths(
        cfg.cache_dir, cfg.backbone, cfg.shots, alpha, beta,
        cfg.lr, cfg.augment_epoch, cfg.train_epoch, qt=True,
    )

    best_val, best_epoch = 0.0, -1
    if not cfg.only_test:
        trainer = QTTrainer(
            clip_params=clip_params,
            clip_cfg=clip_cfg,
            bank_v_init=bank_v,
            bank_t_init=bank_t,
            n_class=n_class,
            k_shots=k,
            adapter_kind=cfg.adapter,
            alpha=alpha,
            beta=beta,
            lr=cfg.lr,
            train_epoch=cfg.train_epoch,
            losses=tuple(cfg.losses),
            train_vis_mem_only=cfg.train_vis_mem_only,
            seed=cfg.seed,
            mesh=mesh,
        )
        val_j, val_l = jnp.asarray(val_feats), jnp.asarray(val_labels)

        @jax.jit
        def val_acc_fn(model: ProtoClip):
            p = model.probs(val_j, alpha, beta)
            return jnp.mean((jnp.argmax(p, axis=-1) == val_l).astype(jnp.float32))

        iterator = range(cfg.train_epoch)
        if progress:
            from tqdm import tqdm

            iterator = tqdm(iterator, desc=f"train-qt {cfg.dataset}")
        for epoch in iterator:
            losses, accs = [], []
            for images, labels, n_valid in train_loader:
                stats = trainer.train_step(images, labels, n_valid)
                losses.append(stats["loss"])
                accs.append(stats["acc"])
            trainer.finish_epoch()
            model = trainer.model()
            va = float(val_acc_fn(model))
            logger.scalar("Loss/train", float(np.mean(losses)), epoch)
            logger.scalar("Accuracy/train", float(np.mean(accs)), epoch)
            logger.scalar("Accuracy/val", va, epoch)
            if va >= best_val:
                best_val, best_epoch = va, epoch
                save_checkpoint_triple(
                    ckpt_v, ckpt_t, ckpt_a,
                    np.asarray(model.bank_v), np.asarray(model.bank_t),
                    adapter_to_torch_state(model.adapter, cfg.adapter),
                )
        if progress:
            print(f"Best val acc {best_val*100:.2f}% @ epoch {best_epoch}")

    bank_v_best, bank_t_best, adapter_state = load_checkpoint_triple(ckpt_v, ckpt_t, ckpt_a)
    model = ProtoClip(
        bank_v=jnp.asarray(bank_v_best, jnp.float32),
        bank_t=jnp.asarray(bank_t_best, jnp.float32),
        adapter=adapter_from_torch_state(adapter_state, cfg.adapter),
        adapter_kind=cfg.adapter,
        shots=k,
    )
    test_acc_fixed = accuracy(model, test_feats, test_labels, alpha, beta)

    alphas, betas = default_alpha_beta_grid()
    img_p, txt_p = jax.jit(lambda m: m.prototypes())(model)
    # reference quirk: searched-sweep val features unnormalized (main.py:415)
    adapt_j = jax.jit(lambda m, f, norm: m.adapt(f, normalize=norm), static_argnums=2)
    val_grid = alpha_beta_sweep(
        np.asarray(adapt_j(model, jnp.asarray(val_feats), False)), val_labels, img_p, txt_p, alphas, betas
    )
    a_s, b_s, _ = best_operating_point(val_grid, alphas, betas)
    test_grid = alpha_beta_sweep(
        np.asarray(adapt_j(model, jnp.asarray(test_feats), True)), test_labels, img_p, txt_p, alphas, betas
    )
    ai = int(np.where(alphas == a_s)[0][0])
    bi = int(np.argmin(np.abs(betas - b_s)))
    test_acc_searched = float(test_grid[ai, bi])
    logger.flush()

    return ExperimentResult(
        zero_shot={},
        test_acc_fixed=test_acc_fixed,
        test_acc_searched=test_acc_searched,
        searched_alpha=a_s,
        searched_beta=b_s,
        best_val_acc=best_val,
        best_epoch=best_epoch,
    )
