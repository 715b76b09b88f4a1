"""Proto-CLIP train/test CLI — the equivalent of ``python main.py``
(flags mirror ``main.py:24-49``; ``--qt`` selects the F-Q^T trainer instead
of a separate ``main.qt.py`` script).

Examples
--------
Zero-shot + fine-tune caltech101 at its tuned operating point::

    python -m protoclip_tpu.cli.main --config configs/caltech101.yml \
        --dataset caltech101

Test-only with the FewSOL-198 pretrained checkpoint::

    python -m protoclip_tpu.cli.main --config configs/fewsol_198.yml \
        --dataset fewsol_198 --only_test
"""

from __future__ import annotations

import argparse

from protoclip_tpu.core.config import load_config


def get_arguments() -> argparse.Namespace:
    parser = argparse.ArgumentParser(description="Proto-CLIP TPU trainer")
    parser.add_argument("--config", required=True, help="YAML config path")
    parser.add_argument("--dataset", help="dataset alias (see protoclip_tpu.data.available_datasets)")
    parser.add_argument("--logs", dest="logs_dir_path", help="log directory")
    parser.add_argument("--alpha", type=float)
    parser.add_argument("--beta", type=float)
    parser.add_argument("--adapter", choices=["conv-3x", "conv-2x", "fc"])
    parser.add_argument("--train_vis_memory_only", dest="train_vis_mem_only", action="store_true", default=None)
    parser.add_argument("--only_test", action="store_true", default=None)
    parser.add_argument("--shots", type=int)
    parser.add_argument("--losses", nargs="+")
    parser.add_argument("--backbone")
    parser.add_argument("--root_path")
    parser.add_argument("--batch_size", type=int)
    parser.add_argument("--train_epoch", type=int)
    parser.add_argument("--seed", type=int)
    parser.add_argument("--weights_path", help="CLIP weights .pt path")
    parser.add_argument(
        "--snapshot_every", type=int,
        help="snapshot full trainer state (params+optimizer+epoch) every N "
        "epochs for preemption recovery (0 = off)",
    )
    parser.add_argument(
        "--resume", action="store_true", default=None,
        help="resume from the operating point's trainer-state snapshot "
        "if one exists (replay-exact: same episodes/batches as an "
        "uninterrupted run)",
    )
    parser.add_argument("--qt", action="store_true", help="use the F-Q^T trainer (main.qt.py equivalent)")
    parser.add_argument("--mesh", type=int, default=0, help="shard batches over N devices (0 = no mesh)")
    parser.add_argument(
        "--multihost", action="store_true",
        help="join a multi-process JAX cluster before any computation "
        "(jax.distributed.initialize via parallel.mesh.init_distributed; "
        "coordinator/process info from TPU-pod auto-detection or "
        "$PROTOCLIP_COORDINATOR/$PROTOCLIP_NUM_PROCESSES/$PROTOCLIP_PROCESS_ID). "
        "Combine with --mesh <total global devices>.",
    )
    return parser.parse_args()


def main() -> None:
    args = get_arguments()
    # Deliberate fix vs the reference: populate_cfg_using_args (main.py:56-63)
    # filters overrides by TRUTHINESS, so an explicit `--alpha 0` or
    # `--shots 0` is silently dropped and the YAML value wins.  We filter by
    # `is not None`: every explicitly passed flag applies, including zeros.
    overrides = {
        k: v
        for k, v in vars(args).items()
        if k not in ("config", "qt", "mesh", "multihost") and v is not None
    }
    if args.multihost:
        # must precede load_config/any jax use: backends lock in at first touch
        from protoclip_tpu.parallel.mesh import init_distributed

        try:
            up = init_distributed()
        except ValueError as exc:  # partial cluster spec: say what's missing
            raise SystemExit(f"--multihost: {exc}")
        if not up:
            raise SystemExit(
                "--multihost: no cluster found (set $PROTOCLIP_COORDINATOR / "
                "$PROTOCLIP_NUM_PROCESSES / $PROTOCLIP_PROCESS_ID or run on a pod)"
            )
    cfg = load_config(args.config, **overrides)
    if not cfg.dataset:
        raise SystemExit("Please provide a dataset (--dataset or config key)")

    mesh = None
    if args.mesh:
        from protoclip_tpu.parallel import make_mesh

        mesh = make_mesh(args.mesh)

    print("Running config:")
    for key, value in sorted(cfg.to_dict().items()):
        print(f"  {key}: {value}")

    if args.qt:
        from protoclip_tpu.train.qt_runner import run_qt

        result = run_qt(cfg, mesh=mesh)
    else:
        from protoclip_tpu.train.runner import run

        result = run(cfg, mesh=mesh)
    print(
        f"RESULT dataset={cfg.dataset} test_acc_fixed={result.test_acc_fixed*100:.2f}% "
        f"test_acc_searched={result.test_acc_searched*100:.2f}%"
    )


if __name__ == "__main__":
    main()
