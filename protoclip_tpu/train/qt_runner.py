"""F-Q^T experiment runner — the ``main.qt.py`` flow (``main.qt.py:418-500``):
identical setup to the episodic runner, but training iterates a *shuffled*,
augmented few-shot loader whose batches are re-encoded by frozen CLIP every
step (no interactive input() gate — that reference quirk is dropped)."""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

from protoclip_tpu.core.config import Config
from protoclip_tpu.data import BatchLoader
from protoclip_tpu.data.transforms import TrainTransform
from protoclip_tpu.io.checkpoint import checkpoint_paths
from protoclip_tpu.obs.logging import MetricLogger
from protoclip_tpu.train.qt import QTTrainer
from protoclip_tpu.train.runner import (
    TERM_TAGS,
    ExperimentResult,
    evaluate_checkpoint,
    log_epoch_scalars,
    make_val_metrics_fn,
    maybe_resume,
    maybe_snapshot,
    prepare_experiment,
    save_model_checkpoint,
    snapshot_path,
    zero_shot_sweep_phase,
)


def run_qt(cfg: Config, mesh=None, progress: bool = True, logger: Optional[MetricLogger] = None) -> ExperimentResult:
    cfg.validate()
    logger = logger or MetricLogger(os.path.join(cfg.logs_dir_path, f"{cfg.dataset}-qt"))
    setup = prepare_experiment(cfg, mesh, progress)
    n_px = setup.clip_cfg.image_resolution

    # zero-shot alpha/beta sweep — the reference's Q^T flow performs the
    # identical phase (incl. pkl caches and HP report) before training
    # (main.qt.py:109-183)
    zero_shot = zero_shot_sweep_phase(cfg, setup, logger, progress)

    # the Q^T-specific loader: shuffled + augmented, re-encoded every step
    # (ref main.qt.py:456-468); batch clamped to the train-set size, then
    # rounded up to a mesh multiple (sharded axis 0 must divide evenly —
    # BatchLoader pads ragged batches to the fixed shape)
    batch_size = min(cfg.batch_size, len(setup.dataset.train_x))
    if mesh is not None:
        n_dev = int(mesh.devices.size)
        batch_size = -(-batch_size // n_dev) * n_dev
    train_loader = BatchLoader(
        setup.dataset.train_x,
        batch_size=batch_size,
        transform=TrainTransform(n_px), shuffle=True, seed=cfg.seed, image_size=n_px,
    )

    n_class, k = setup.dataset.num_classes, cfg.shots
    alpha, beta = cfg.alpha, cfg.beta
    ckpt_v, ckpt_t, ckpt_a = checkpoint_paths(
        cfg.cache_dir, cfg.backbone, cfg.shots, alpha, beta,
        cfg.lr, cfg.augment_epoch, cfg.train_epoch, qt=True,
    )

    best_val, best_epoch = 0.0, -1
    if not cfg.only_test:
        trainer = QTTrainer(
            clip_params=setup.clip_params,
            clip_cfg=setup.clip_cfg,
            bank_v_init=setup.bank_v,
            bank_t_init=setup.bank_t,
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
            compute_dtype=cfg.compute_dtype,
        )
        val_acc_fn = make_val_metrics_fn(
            setup.val_feats, setup.val_labels, alpha, beta
        )

        snap_path = snapshot_path(ckpt_v)
        start_epoch, best_val, best_epoch = maybe_resume(
            cfg, trainer, snap_path, best_val, best_epoch, progress
        )
        # the shuffled loader's order/augment RNG is a pure function of
        # (seed, epoch): pin it so the resumed run replays exact batches
        train_loader.set_epoch(start_epoch)
        iterator = range(start_epoch, cfg.train_epoch)
        if progress:
            from tqdm import tqdm

            iterator = tqdm(iterator, desc=f"train-qt {cfg.dataset}",
                            initial=start_epoch, total=cfg.train_epoch)
        for epoch in iterator:
            losses, accs = [], []
            term_sums: dict = {}
            for images, labels, n_valid in train_loader:
                stats = trainer.train_step(images, labels, n_valid)
                losses.append(stats["loss"])
                # weight by valid samples: epoch accuracy is correct/all
                # like the reference, not a mean over ragged batches
                accs.append((stats["acc"] * n_valid, n_valid))
                for term in TERM_TAGS:
                    if term in stats:
                        term_sums.setdefault(term, []).append(stats[term])
            trainer.finish_epoch()
            model = trainer.model()
            va_j, vl_j = val_acc_fn(model)
            va = float(va_j)
            epoch_acc = sum(c for c, _ in accs) / max(sum(n for _, n in accs), 1)
            log_epoch_scalars(
                logger, epoch,
                train_loss=float(np.mean(losses)), val_loss=float(vl_j),
                train_acc=float(epoch_acc), val_acc=va, lr=float(stats["lr"]),
                term_values={t: float(np.mean(v)) for t, v in term_sums.items()},
            )
            if va >= best_val:
                best_val, best_epoch = va, epoch
                save_model_checkpoint(model, cfg.adapter, (ckpt_v, ckpt_t, ckpt_a))
            maybe_snapshot(cfg, trainer, snap_path, epoch, best_val, best_epoch)
        if progress:
            print(f"Best val acc {best_val*100:.2f}% @ epoch {best_epoch}")

    import dataclasses

    result = evaluate_checkpoint(
        cfg, setup, (ckpt_v, ckpt_t, ckpt_a), alpha, beta, logger, progress
    )
    logger.flush()
    return dataclasses.replace(
        result, best_val_acc=best_val, best_epoch=best_epoch, zero_shot=zero_shot
    )
