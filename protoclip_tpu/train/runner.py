"""End-to-end experiment runner — the equivalent of the reference's
``main()`` + ``run_proto_clip()`` (``main.py:105-552``), composed from the
framework layers:

1. load CLIP, build dataset + loaders
2. build/load visual + textual memory banks and val/test feature caches
3. zero-shot alpha/beta sweep (cached)
4. optionally train (episodic Proto-CLIP-F or F-Q^T), best-val checkpointing
5. test at the fixed config (alpha, beta) and at re-searched HPs
"""

from __future__ import annotations

import dataclasses
import os
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from protoclip_tpu.core.config import Config
from protoclip_tpu.core.protoclip import ProtoClip, accuracy
from protoclip_tpu.data import BatchLoader, build_dataset, normalize_batch
from protoclip_tpu.data.transforms import EvalTransform, TrainTransform
from protoclip_tpu.eval.gridsearch import (
    alpha_beta_sweep,
    best_cell,
    best_operating_point,
    default_alpha_beta_grid,
    sweep_to_triples,
    triples_to_sweep,
)
from protoclip_tpu.io.checkpoint import checkpoint_paths, save_checkpoint_triple
from protoclip_tpu.memory import (
    FeatureCache,
    build_textual_memory_bank,
    build_visual_memory_bank,
    pre_load_features,
)
from protoclip_tpu.models import (
    adapter_to_torch_state,
    encode_image,
    encode_text,
    load_clip,
)
from protoclip_tpu.models.adapters import adapter_from_torch_state
from protoclip_tpu.obs.logging import MetricLogger
from protoclip_tpu.train.episodic import EpisodicTrainer


def make_encode_fns(cfg: Config, mesh=None):
    """Load CLIP and return jitted uint8-batch encode functions.

    ``encode_fn(images_u8) -> (B, d)``; normalization happens on device.
    With a mesh, batches shard over the ``data`` axis.
    """
    dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
    clip_cfg, clip_params = load_clip(cfg.backbone, cfg.weights_path, dtype=dtype)

    def _image(params, images_u8):
        return encode_image(params, normalize_batch(images_u8, dtype), clip_cfg)

    def _text(params, tokens):
        return encode_text(params, tokens, clip_cfg)

    if mesh is not None:
        from protoclip_tpu.parallel.sharding import (
            fetch_to_host,
            make_sharded_encode,
            shard_batch,
        )

        image_jit = make_sharded_encode(_image, mesh)
        text_jit = jax.jit(_text)

        def encode_images(images_u8):
            # shard_batch handles multi-process placement (every process
            # feeds the same full global batch); in a multi-host cluster
            # the batch-sharded output is not fully addressable, so it is
            # gathered here — downstream code (bank build, eval) consumes
            # host features either way.  Single-process behavior unchanged.
            out = image_jit(clip_params, shard_batch(images_u8, mesh))
            return fetch_to_host(out) if jax.process_count() > 1 else out
    else:
        image_jit = jax.jit(_image)
        text_jit = jax.jit(_text)

        def encode_images(images_u8):
            return image_jit(clip_params, images_u8)

    return (
        encode_images,
        lambda tokens: text_jit(clip_params, tokens),
        clip_cfg,
        clip_params,
    )


@dataclasses.dataclass
class ExperimentResult:
    zero_shot: Dict[str, float]
    test_acc_fixed: float
    test_acc_searched: float
    searched_alpha: float
    searched_beta: float
    best_val_acc: float
    best_epoch: int


@dataclasses.dataclass
class ExperimentSetup:
    """Everything both trainers need: encoders, dataset, banks, features."""

    encode_fn: Callable
    text_fn: Callable
    clip_cfg: object
    clip_params: Dict
    cache: FeatureCache
    dataset: object
    bank_v: np.ndarray
    bank_values: np.ndarray
    bank_t: np.ndarray
    val_feats: np.ndarray
    val_labels: np.ndarray
    test_feats: np.ndarray
    test_labels: np.ndarray


def zero_shot_sweep_phase(cfg, setup, logger, progress: bool) -> Dict[str, float]:
    """The zero-shot alpha/beta sweep over val/test/train with pickle-cache
    interop, surface plot + best-HP report (ref ``main.py:167-211``; the Q^T
    flow performs the identical phase before training, ``main.qt.py:109-183``).
    Shared by both runners."""
    cache = setup.cache
    bank_v, bank_values, bank_t = setup.bank_v, setup.bank_values, setup.bank_t
    alphas, betas = default_alpha_beta_grid()
    img_protos = np.asarray(
        jax.jit(lambda b, t: ProtoClip(
            bank_v=b, bank_t=t, adapter={}, adapter_kind="fc",
            shots=cfg.shots,
        ).prototypes()[0])(jnp.asarray(bank_v), jnp.asarray(bank_t))
    )
    text_protos = bank_t / np.linalg.norm(bank_t, axis=-1, keepdims=True)
    zs: Dict[str, float] = {}
    grids: Dict[str, np.ndarray] = {}
    for split, feats, labels in (
        ("val", setup.val_feats, setup.val_labels),
        ("test", setup.test_feats, setup.test_labels),
        ("train", bank_v, np.argmax(bank_values, axis=1)),
    ):
        stem = cache.hp_search_stem(split)
        cached = cache.load(stem)
        n_class = int(bank_t.shape[0])
        if cached is not None and "acc" in cached and (
            "n_class" not in cached or int(cached["n_class"]) != n_class
        ):
            # dataset-variant guard: fewsol (52-class) and fewsol_198 share
            # the caches/fewsol tree (core/config.py::cache_dir), and the
            # sweep stems carry only backbone+shots — without this check a
            # 52-class run would silently adopt the 198-class grid (and its
            # wrong best alpha/beta) or vice versa.  An 'acc' npz WITHOUT
            # the n_class field was written by an older build of this
            # framework (the reference's pickles go through the
            # triples/array path below) — its class count is unknown, so it
            # is treated as stale too.  Recompute and overwrite.
            cached = None
        acc_grid = None
        if cached is not None and "acc" in cached:
            acc_grid = cached["acc"]
        elif cached is not None and ("triples" in cached or "array" in cached):
            # reference pickle format: (319, 3) [alpha, beta, acc] row list.
            # Validate before adopting (the npz path's n_class guard has no
            # pickle analog — the reference records no class count, and a
            # (|grid|, 3) row list looks identical for every dataset): the
            # rows must form exactly the default alpha/beta grid and the
            # accuracies must be probabilities; anything else (truncated,
            # foreign-grid, or corrupt pickle) is recomputed, not adopted.
            try:
                acc_grid = triples_to_sweep(
                    cached.get("triples", cached.get("array")), alphas, betas
                )
                if not (
                    np.isfinite(acc_grid).all()
                    and float(acc_grid.min()) >= 0.0
                    and float(acc_grid.max()) <= 1.0
                ):
                    raise ValueError("accuracies outside [0, 1]")
            except ValueError as exc:
                import sys

                print(
                    f"[protoclip_tpu] cached HP grid {stem} is invalid "
                    f"({exc}); recomputing",
                    file=sys.stderr,
                )
                acc_grid = None
        if acc_grid is None:
            acc_grid = alpha_beta_sweep(feats, labels, img_protos, text_protos, alphas, betas)
            cache.save(
                stem,
                acc=acc_grid,
                triples=sweep_to_triples(acc_grid, alphas, betas),
                n_class=np.int64(n_class),
            )
        grids[split] = np.asarray(acc_grid)
        a, b, best = best_operating_point(acc_grid, alphas, betas)
        zs[f"{split}_best_alpha"], zs[f"{split}_best_beta"], zs[f"{split}_best_acc"] = a, b, best
        logger.scalar(f"zero_shot/{split}_best_acc", best, 0)
    _log_sweep_report(grids, alphas, betas, cfg, logger, step=0, phase="zero_shot")
    if progress:
        print(
            f"[zero-shot] val best {zs['val_best_acc']*100:.2f}% "
            f"(a={zs['val_best_alpha']}, b={zs['val_best_beta']}) | "
            f"test best {zs['test_best_acc']*100:.2f}%"
        )
    return zs


# per-term TensorBoard tags matching the reference (main.py:287-302,
# main.qt.py:227-243); shared by the episodic and Q^T runners so the tag
# names cannot drift between the two training loops
TERM_TAGS = {
    "L1": "Loss/train/L1-negLog",
    "L2": "Loss/train/L2-img2txt_align",
    "L3": "Loss/train/L3-txt2img_align",
    "L4": "Loss/train/L4-img_inter_cluster",
    "L5": "Loss/train/L5-txt_inter_cluster",
}


def log_epoch_scalars(
    logger: MetricLogger,
    epoch: int,
    *,
    train_loss: float,
    val_loss: float,
    train_acc: float,
    val_acc: float,
    lr: float,
    term_values: Dict[str, float],
) -> None:
    """One epoch's scalar block (both runners; ref ``main.py:372-378``)."""
    logger.scalar("Loss/train", train_loss, epoch)
    logger.scalar("Loss/val", val_loss, epoch)
    logger.scalar("Accuracy/train", train_acc, epoch)
    logger.scalar("Accuracy/val", val_acc, epoch)
    logger.scalar("HP/lr", lr, epoch)
    for term, tag in TERM_TAGS.items():
        if term in term_values:
            logger.scalar(tag, term_values[term], epoch)


def save_model_checkpoint(model, adapter_kind: str, paths) -> None:
    """Write a model's ``_v/_t/_a`` triple (the best-val save of both
    runners, ref ``main.py:350-369``)."""
    save_checkpoint_triple(
        paths[0], paths[1], paths[2],
        np.asarray(model.bank_v), np.asarray(model.bank_t),
        adapter_to_torch_state(model.adapter, adapter_kind),
    )


def snapshot_path(ckpt_v: str) -> str:
    """The trainer-state snapshot lives next to the best-checkpoint triple,
    named after the SAME lr/aug/epochs prefix: the alpha-beta directory
    alone is shared by every (lr, augment_epoch, train_epoch) operating
    point (only the triple FILENAMES carry them, io/checkpoint.py), and a
    bare train_state.pkl there would let a different operating point's run
    silently resume from this one's state."""
    stem = os.path.basename(ckpt_v)
    suffix = "_v.pt"
    stem = stem[: -len(suffix)] if stem.endswith(suffix) else os.path.splitext(stem)[0]
    return os.path.join(os.path.dirname(ckpt_v), f"{stem}_train_state.pkl")


def maybe_resume(
    cfg: Config, trainer, snap_path: str, best_val: float, best_epoch: int,
    progress: bool,
):
    """``cfg.resume`` handling shared by both runners: restore the trainer
    (and the best-val bookkeeping, so a post-resume epoch can never replace
    a better pre-preemption checkpoint) from an existing snapshot."""
    if not cfg.resume or not os.path.exists(snap_path):
        return 0, best_val, best_epoch
    from protoclip_tpu.train.resume import load_train_state

    start_epoch, extra = load_train_state(snap_path, trainer)
    best_val = float(extra.get("best_val", best_val))
    best_epoch = int(extra.get("best_epoch", best_epoch))
    if progress:
        print(f"[resume] restored {snap_path} at epoch {start_epoch} "
              f"(best val {best_val*100:.2f}% @ {best_epoch})")
    return start_epoch, best_val, best_epoch


def maybe_snapshot(
    cfg: Config, trainer, snap_path: str, epoch: int, best_val: float,
    best_epoch: int,
) -> None:
    """Periodic preemption snapshot (``cfg.snapshot_every`` epochs)."""
    if cfg.snapshot_every and (epoch + 1) % cfg.snapshot_every == 0:
        from protoclip_tpu.train.resume import save_train_state

        save_train_state(
            snap_path, trainer,
            extra={"best_val": best_val, "best_epoch": best_epoch},
        )


def make_val_metrics_fn(val_feats, val_labels, alpha, beta):
    """Jitted (val accuracy, val loss) of a ProtoClip model at fixed α/β.

    The val loss matches the reference: NLL of the *predicted* class
    (``main.py:341-344``), not of the true class.  Shared by the episodic
    and Q^T runners so the definition cannot diverge."""
    val_j, val_l = jnp.asarray(val_feats), jnp.asarray(val_labels)

    # features are jit ARGUMENTS: closure-captured device arrays get baked
    # into the executable as constants (~100 MB of val features at ImageNet
    # scale), inflating every (remote) compile
    @jax.jit
    def val_acc_fn(model, feats, labels):
        p = model.probs(feats, alpha, beta)
        acc = jnp.mean((jnp.argmax(p, axis=-1) == labels).astype(jnp.float32))
        val_loss = -jnp.mean(jnp.log(jnp.max(p, axis=-1) + 1e-12))
        return acc, val_loss

    return lambda model: val_acc_fn(model, val_j, val_l)


def prepare_experiment(cfg: Config, mesh=None, progress: bool = True) -> ExperimentSetup:
    """Shared phase of both runners: load CLIP, build the dataset and
    loaders, and materialize memory banks + eval features (cached)."""
    encode_fn, text_fn, clip_cfg, clip_params = make_encode_fns(cfg, mesh)
    cache = FeatureCache(cfg.cache_dir, cfg.backbone, cfg.shots)
    dataset = build_dataset(cfg.dataset, cfg.root_path, cfg.shots, seed=cfg.seed)
    n_px = clip_cfg.image_resolution

    # sharded batches must divide evenly over the mesh's data axis
    batch_size = cfg.batch_size
    if mesh is not None:
        n_dev = int(mesh.devices.size)
        batch_size = -(-batch_size // n_dev) * n_dev

    train_loader = BatchLoader(
        dataset.train_x, batch_size=batch_size,
        transform=TrainTransform(n_px), shuffle=False, seed=cfg.seed, image_size=n_px,
    )
    val_loader = BatchLoader(
        dataset.val, batch_size=batch_size,
        transform=EvalTransform(n_px), shuffle=False, image_size=n_px,
    )
    test_loader = BatchLoader(
        dataset.test, batch_size=batch_size,
        transform=EvalTransform(n_px), shuffle=False, image_size=n_px,
    )

    bank_v, bank_values = build_visual_memory_bank(
        encode_fn, train_loader, cfg.augment_epoch, cache, progress=progress,
        expected_classes=dataset.num_classes,
    )
    bank_t = build_textual_memory_bank(
        text_fn, dataset.classnames, dataset.template, cache,
        context_length=clip_cfg.context_length,
    )
    val_feats, val_labels = pre_load_features(
        encode_fn, val_loader, "val", cache, progress,
        expected_count=len(dataset.val),
    )
    test_feats, test_labels = pre_load_features(
        encode_fn, test_loader, "test", cache, progress,
        expected_count=len(dataset.test),
    )
    return ExperimentSetup(
        encode_fn=encode_fn,
        text_fn=text_fn,
        clip_cfg=clip_cfg,
        clip_params=clip_params,
        cache=cache,
        dataset=dataset,
        bank_v=bank_v,
        bank_values=bank_values,
        bank_t=bank_t,
        val_feats=val_feats,
        val_labels=val_labels,
        test_feats=test_feats,
        test_labels=test_labels,
    )


def _log_sweep_report(
    grids: Dict[str, np.ndarray],
    alphas: np.ndarray,
    betas: np.ndarray,
    cfg: Config,
    logger: MetricLogger,
    step: int,
    phase: str,
) -> None:
    """Surface plot + best-HP report for an alpha/beta sweep
    (ref ``utils.py:167-222``: the PNG, the HP scalars, and the
    val-selected-test printout; called after the zero-shot sweep and again
    after the test-phase sweep, ``main.py:207, 446-448``)."""
    from protoclip_tpu.obs.plots import plot_alpha_beta_surface, report_best_operating_points

    report = report_best_operating_points(grids, alphas, betas)
    plot_path = os.path.join(logger.log_dir, f"alpha_beta_{phase}_{cfg.dataset}.png")
    try:
        plot_alpha_beta_surface(
            grids["val"], alphas, betas, plot_path,
            title=f"Proto-CLIP | Dataset:{cfg.dataset} ({phase})",
            extra_grids={s: g for s, g in grids.items() if s != "val"},
        )
        logger.image(f"alpha-beta/{phase}", plot_path, step)
    except ImportError:  # pragma: no cover - matplotlib ships in this env
        pass
    # reference HP scalars (utils.py:211-220)
    if "val" in report:
        logger.scalar("HP/alpha-val-test", report["val"]["alpha"], step + 1)
        logger.scalar("HP/beta-val-test", report["val"]["beta"], step + 1)
    if "test" in report:
        logger.scalar("HP/alpha-val-test", report["test"]["alpha"], step + 2)
        logger.scalar("HP/beta-val-test", report["test"]["beta"], step + 2)
    if "test_at_val_best" in report:
        logger.scalar(
            "Accuracy/zsval-zstestval-zstest-3F-test", report["test_at_val_best"], step + 2
        )


def evaluate_checkpoint(
    cfg: Config,
    setup: ExperimentSetup,
    ckpt_paths_vta,
    alpha: float,
    beta: float,
    logger: MetricLogger,
    progress: bool,
) -> ExperimentResult:
    """Shared test phase (ref ``main.py:383-458``): load the best ``_v/_t/_a``
    triple, score at the fixed operating point, then re-search alpha/beta on
    the adapted features (reference quirk preserved: the searched-sweep val
    features are NOT re-normalized after the adapter, ``main.py:415``, while
    test features are, ``main.py:407-409``)."""
    from protoclip_tpu.io.checkpoint import load_checkpoint_triple

    ckpt_v, ckpt_t, ckpt_a = ckpt_paths_vta
    bank_v_best, bank_t_best, adapter_state = load_checkpoint_triple(ckpt_v, ckpt_t, ckpt_a)
    model = ProtoClip(
        bank_v=jnp.asarray(bank_v_best, jnp.float32),
        bank_t=jnp.asarray(bank_t_best, jnp.float32),
        adapter=adapter_from_torch_state(adapter_state, cfg.adapter),
        adapter_kind=cfg.adapter,
        shots=cfg.shots,
    )
    test_acc_fixed = accuracy(model, setup.test_feats, setup.test_labels, alpha, beta)
    logger.scalar("Accuracy/test_fixed", test_acc_fixed, 0)

    alphas, betas = default_alpha_beta_grid()
    img_p, txt_p = jax.jit(lambda m: m.prototypes())(model)
    adapt_j = jax.jit(lambda m, f, norm: m.adapt(f, normalize=norm), static_argnums=2)
    val_adapted = np.asarray(adapt_j(model, jnp.asarray(setup.val_feats), False))
    test_adapted = np.asarray(adapt_j(model, jnp.asarray(setup.test_feats), True))
    # the reference also sweeps the adapted train (support) features
    # (main.py:411-430); labels come from the one-hot bank values
    train_adapted = np.asarray(adapt_j(model, jnp.asarray(setup.bank_v), True))
    train_labels = np.argmax(setup.bank_values, axis=1)
    val_grid = alpha_beta_sweep(val_adapted, setup.val_labels, img_p, txt_p, alphas, betas)
    test_grid = alpha_beta_sweep(test_adapted, setup.test_labels, img_p, txt_p, alphas, betas)
    train_grid = alpha_beta_sweep(train_adapted, train_labels, img_p, txt_p, alphas, betas)
    # index-based lookup via the shared selector: ties to the exact grid
    # cell, no float round-trip
    ai, bi = best_cell(val_grid)
    a_s, b_s = float(alphas[ai]), float(betas[bi])
    test_acc_searched = float(test_grid[ai, bi])
    logger.scalar("Accuracy/test_searched", test_acc_searched, 0)
    _log_sweep_report(
        {"val": val_grid, "test": test_grid, "train": train_grid},
        alphas, betas, cfg, logger, step=10, phase="test",
    )

    # post-test prototype t-SNE to TensorBoard (ref main.py:457-458,
    # utils.py:125-164)
    try:
        from protoclip_tpu.toolkit.tsne import plot_prototype_tsne

        plot_prototype_tsne(
            np.asarray(img_p), np.asarray(txt_p), setup.dataset.classnames,
            os.path.join(logger.log_dir, f"tsne_prototypes_{cfg.dataset}.png"),
            logger=logger, tag="t-SNE/prototypes",
        )
    except ImportError:  # pragma: no cover - sklearn/matplotlib ship here
        pass
    if progress:
        print(
            f"[test] fixed(a={alpha}, b={beta}): {test_acc_fixed*100:.2f}% | "
            f"searched(a={a_s}, b={b_s}): {test_acc_searched*100:.2f}%"
        )
    return ExperimentResult(
        zero_shot={},
        test_acc_fixed=test_acc_fixed,
        test_acc_searched=test_acc_searched,
        searched_alpha=a_s,
        searched_beta=b_s,
        best_val_acc=0.0,
        best_epoch=-1,
    )


def run(cfg: Config, mesh=None, progress: bool = True, logger: Optional[MetricLogger] = None) -> ExperimentResult:
    """Run one full Proto-CLIP experiment from a config.

    Mesh semantics: with ``mesh``, the CLIP encode phases (bank build,
    val/test feature extraction) shard their batches over the ``data`` axis.
    Episodic training itself is DELIBERATELY single-device: each episode is
    a sequential AdamW step over at most a few thousand d-dim rows (adapter +
    bank gathers, no CLIP forward), far below the per-chip crossover where
    sharding pays — a whole 2000-epoch ImageNet-scale run is ~7 min on one
    chip (BASELINE.md).  The F-Q^T trainer (``train/qt_runner.py``), whose
    step DOES cross the CLIP encoder, shards its batches over the mesh.
    """
    cfg.validate()
    logger = logger or MetricLogger(os.path.join(cfg.logs_dir_path, cfg.dataset))
    setup = prepare_experiment(cfg, mesh, progress)
    cache = setup.cache
    bank_v, bank_values, bank_t = setup.bank_v, setup.bank_values, setup.bank_t
    val_feats, val_labels = setup.val_feats, setup.val_labels
    test_feats, test_labels = setup.test_feats, setup.test_labels

    n_class = setup.dataset.num_classes
    k = cfg.shots

    zs = zero_shot_sweep_phase(cfg, setup, logger, progress)

    # The reference overrides the searched HPs with the config's
    # (main.py:213-214); training runs at the tuned operating point.
    alpha, beta = cfg.alpha, cfg.beta

    ckpt_v, ckpt_t, ckpt_a = checkpoint_paths(
        cfg.cache_dir, cfg.backbone, cfg.shots, alpha, beta,
        cfg.lr, cfg.augment_epoch, cfg.train_epoch,
    )

    best_val, best_epoch = 0.0, -1
    if not cfg.only_test:
        if mesh is not None and progress:
            print(
                "[mesh] episodic training runs single-device by design "
                "(episodes are tiny adapter/bank steps); encode and eval "
                "phases were sharded over the mesh"
            )
        trainer = EpisodicTrainer(
            frozen_keys=bank_v,
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
        )
        val_acc_fn = make_val_metrics_fn(val_feats, val_labels, alpha, beta)

        snap_path = snapshot_path(ckpt_v)
        start_epoch, best_val, best_epoch = maybe_resume(
            cfg, trainer, snap_path, best_val, best_epoch, progress
        )
        iterator = range(start_epoch, cfg.train_epoch)
        if progress:
            from tqdm import tqdm

            iterator = tqdm(iterator, desc=f"train {cfg.dataset}", initial=start_epoch,
                            total=cfg.train_epoch)
        for epoch in iterator:
            stats = trainer.run_epoch()
            model = trainer.model()
            va_j, vl_j = val_acc_fn(model)
            va = float(va_j)
            log_epoch_scalars(
                logger, epoch,
                train_loss=float(stats["loss"]), val_loss=float(vl_j),
                train_acc=float(stats["acc"]), val_acc=va, lr=float(stats["lr"]),
                term_values={t: float(stats[t]) for t in TERM_TAGS if t in stats},
            )
            if va >= best_val:
                best_val, best_epoch = va, epoch
                save_model_checkpoint(model, cfg.adapter, (ckpt_v, ckpt_t, ckpt_a))
            maybe_snapshot(cfg, trainer, snap_path, epoch, best_val, best_epoch)
        if progress:
            print(f"Best val acc {best_val*100:.2f}% @ epoch {best_epoch}")

    # ---- test (ref main.py:383-458) ---------------------------------------
    result = evaluate_checkpoint(
        cfg, setup, (ckpt_v, ckpt_t, ckpt_a), alpha, beta, logger, progress
    )
    logger.flush()
    return dataclasses.replace(
        result, zero_shot=zs, best_val_acc=best_val, best_epoch=best_epoch
    )
