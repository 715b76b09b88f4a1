"""Run every benchmark operating point and write the accuracy table.

The accuracy-parity north star (BASELINE.md) needs real CLIP weights and
datasets, which zero-egress CI images lack — this harness is the one-shot
runner for environments that have them:

    python scripts/validate_accuracy.py [--data-root DATA] [--mesh N] \
        [--only caltech101,dtd,...] [--out ACCURACY.md]

For each `configs/<dataset>.yml` it runs the full experiment at the tuned
operating point (reference protocol: K=16, tuned alpha/beta/adapter) and
records fixed-HP and searched-HP test accuracy into a markdown table.
Datasets whose raw data is missing are skipped with the reason recorded,
so a partial data tree still yields a useful report.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

# runnable from anywhere: the repo root is this script's parent
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DATASETS = [
    "caltech101", "dtd", "eurosat", "fgvc", "food101", "imagenet",
    "oxford_flowers", "oxford_pets", "stanford_cars", "sun397", "ucf101",
    "fewsol", "fewsol_198",
]


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--data-root", default=os.environ.get("DATA_ROOT", "DATA"))
    parser.add_argument("--mesh", type=int, default=0)
    parser.add_argument("--only", help="comma-separated dataset subset")
    parser.add_argument("--out", default="ACCURACY.md")
    args = parser.parse_args()

    from protoclip_tpu.core.config import load_config

    targets = args.only.split(",") if args.only else DATASETS
    rows = []
    for name in targets:
        cfg_path = os.path.join("configs", f"{name}.yml")
        cfg = load_config(cfg_path, root_path=args.data_root)
        start = time.time()
        try:
            mesh = None
            if args.mesh:
                from protoclip_tpu.parallel import make_mesh

                mesh = make_mesh(args.mesh)
            from protoclip_tpu.train.runner import run

            # only_test configs (fewsol_198) evaluate the pretrained
            # checkpoint; the rest train at the tuned operating point
            result = run(cfg, mesh=mesh, progress=True)
            rows.append(
                (
                    name, cfg.backbone, cfg.alpha, cfg.beta, cfg.adapter,
                    f"{result.test_acc_fixed * 100:.2f}",
                    f"{result.test_acc_searched * 100:.2f}",
                    f"{time.time() - start:.0f}s",
                )
            )
        except FileNotFoundError as exc:
            rows.append((name, cfg.backbone, cfg.alpha, cfg.beta, cfg.adapter,
                         "skip", "skip", f"missing data: {exc}"))
        except Exception as exc:  # record and continue: partial tables are useful
            rows.append((name, cfg.backbone, cfg.alpha, cfg.beta, cfg.adapter,
                         "ERROR", "ERROR", f"{type(exc).__name__}: {exc}"))
        _write(args.out, rows)  # checkpoint the table after every dataset

    print(f"Wrote {args.out} ({len(rows)} rows)")


def _write(path: str, rows) -> None:
    with open(path, "w") as fh:
        fh.write(
            "# ACCURACY — measured 16-shot test accuracy per operating point\n\n"
            "Produced by `scripts/validate_accuracy.py` (reference protocol:\n"
            "K=16 shots, tuned alpha/beta/adapter from `configs/*.yml`).\n\n"
            "| dataset | backbone | α | β | adapter | test acc (fixed HP) % | "
            "test acc (searched HP) % | wall |\n|---|---|---|---|---|---|---|---|\n"
        )
        for r in rows:
            fh.write("| " + " | ".join(str(v) for v in r) + " |\n")


if __name__ == "__main__":
    sys.exit(main())
