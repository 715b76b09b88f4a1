"""Run every benchmark operating point and write the accuracy table.

The accuracy-parity north star (BASELINE.md) needs real CLIP weights and
datasets, which zero-egress CI images lack — this harness is the one-shot
runner for environments that have them:

    python scripts/validate_accuracy.py [--data-root DATA] [--mesh N] \
        [--only caltech101,dtd,...] [--out ACCURACY.md] [--int8] \
        [--set key=value ...]

For each `configs/<dataset>.yml` it runs the full experiment at the tuned
operating point (reference protocol: K=16, tuned alpha/beta/adapter) and
records fixed-HP and searched-HP test accuracy into a markdown table (plus
a machine-readable `<out>.json`).  Datasets whose raw data is missing are
skipped with the reason recorded, so a partial data tree still yields a
useful report.

``--int8`` additionally re-runs each dataset through the W8A8 serving
encode path (``$PROTOCLIP_INT8``, separate cache tree) and records the
int8 test accuracy and its delta — the per-dataset operating-point
re-validation BASELINE.md requires before deploying the int8 serving mode.

``--set key=value`` overrides any config field for every dataset (values
are YAML-parsed); with ``--config-dir`` this also powers the CI dry-run
(``tests/test_e2e.py::test_validate_accuracy_script_dry_run``) that keeps
this script from rotting in zero-egress environments.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

# runnable from anywhere: the repo root is this script's parent
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scripts._env import ensure_bpe_vocab  # noqa: E402

ensure_bpe_vocab()

DATASETS = [
    "caltech101", "dtd", "eurosat", "fgvc", "food101", "imagenet",
    "oxford_flowers", "oxford_pets", "stanford_cars", "sun397", "ucf101",
    "fewsol", "fewsol_198",
]


def _parse_overrides(pairs):
    import yaml

    overrides = {}
    for pair in pairs:
        if "=" not in pair:
            raise SystemExit(f"--set expects key=value, got {pair!r}")
        key, value = pair.split("=", 1)
        overrides[key.strip()] = yaml.safe_load(value)
    return overrides


def _run_one(cfg, mesh, progress):
    from protoclip_tpu.train.runner import run

    return run(cfg, mesh=mesh, progress=progress)


def _run_int8(cfg_path, base_overrides, data_root, mesh, progress):
    """Second pass through the W8A8 serving encode: separate cache tree so
    quantized features never poison the fp caches, env gate scoped to the
    run (the quantization applies at weight-load time inside run())."""
    from protoclip_tpu.core.config import load_config

    cfg = load_config(cfg_path, root_path=data_root, **base_overrides)
    cfg = load_config(
        cfg_path,
        root_path=data_root,
        **{**base_overrides, "cache_root": cfg.cache_root + "-int8"},
    )
    prev = os.environ.get("PROTOCLIP_INT8")
    os.environ["PROTOCLIP_INT8"] = "1"
    try:
        return _run_one(cfg, mesh, progress)
    finally:
        if prev is None:
            os.environ.pop("PROTOCLIP_INT8", None)
        else:
            os.environ["PROTOCLIP_INT8"] = prev


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--data-root", default=os.environ.get("DATA_ROOT", "DATA"))
    parser.add_argument("--mesh", type=int, default=0)
    parser.add_argument("--only", help="comma-separated dataset subset")
    parser.add_argument("--out", default="ACCURACY.md")
    parser.add_argument("--config-dir", default="configs")
    parser.add_argument(
        "--set", action="append", default=[], metavar="KEY=VALUE", dest="overrides",
        help="override a config field for every dataset (YAML-parsed value)",
    )
    parser.add_argument(
        "--int8", action="store_true",
        help="also re-validate each operating point through the W8A8 "
        "serving encode (separate cache tree; records acc delta)",
    )
    args = parser.parse_args()

    from protoclip_tpu.core.config import load_config

    overrides = _parse_overrides(args.overrides)
    targets = args.only.split(",") if args.only else DATASETS
    rows = []
    records = []
    for name in targets:
        cfg_path = os.path.join(args.config_dir, f"{name}.yml")
        cfg = load_config(cfg_path, root_path=args.data_root, **overrides)
        start = time.time()
        record = {
            "dataset": name, "backbone": cfg.backbone, "alpha": cfg.alpha,
            "beta": cfg.beta, "adapter": cfg.adapter,
        }
        try:
            mesh = None
            if args.mesh:
                from protoclip_tpu.parallel import make_mesh

                mesh = make_mesh(args.mesh)

            # only_test configs (fewsol_198) evaluate the pretrained
            # checkpoint; the rest train at the tuned operating point
            result = _run_one(cfg, mesh, progress=True)
            record.update(
                test_acc_fixed=result.test_acc_fixed,
                test_acc_searched=result.test_acc_searched,
            )
            row = [
                name, cfg.backbone, cfg.alpha, cfg.beta, cfg.adapter,
                f"{result.test_acc_fixed * 100:.2f}",
                f"{result.test_acc_searched * 100:.2f}",
            ]
            if args.int8:
                r8 = _run_int8(cfg_path, overrides, args.data_root, mesh, True)
                delta = r8.test_acc_fixed - result.test_acc_fixed
                record.update(
                    test_acc_int8=r8.test_acc_fixed, int8_delta=delta
                )
                row += [f"{r8.test_acc_fixed * 100:.2f}", f"{delta * 100:+.2f}"]
            row.append(f"{time.time() - start:.0f}s")
            rows.append(tuple(row))
        except FileNotFoundError as exc:
            record["error"] = f"missing data: {exc}"
            rows.append(_pad_row(name, cfg, "skip", f"missing data: {exc}", args.int8))
        except Exception as exc:  # record and continue: partial tables are useful
            record["error"] = f"{type(exc).__name__}: {exc}"
            rows.append(
                _pad_row(name, cfg, "ERROR", f"{type(exc).__name__}: {exc}", args.int8)
            )
        records.append(record)
        _write(args.out, rows, args.int8)  # checkpoint the table per dataset
        with open(args.out + ".json", "w") as fh:
            json.dump(records, fh, indent=2)

    print(f"Wrote {args.out} ({len(rows)} rows)")


def _pad_row(name, cfg, marker, reason, int8):
    row = [name, cfg.backbone, cfg.alpha, cfg.beta, cfg.adapter, marker, marker]
    if int8:
        row += [marker, marker]
    row.append(reason)
    return tuple(row)


def _write(path: str, rows, int8: bool) -> None:
    cols = [
        "dataset", "backbone", "α", "β", "adapter",
        "test acc (fixed HP) %", "test acc (searched HP) %",
    ]
    if int8:
        cols += ["test acc (int8 W8A8) %", "Δ int8"]
    cols.append("wall")
    with open(path, "w") as fh:
        fh.write(
            "# ACCURACY — measured 16-shot test accuracy per operating point\n\n"
            "Produced by `scripts/validate_accuracy.py` (reference protocol:\n"
            "K=16 shots, tuned alpha/beta/adapter from `configs/*.yml`).\n\n"
        )
        fh.write("| " + " | ".join(cols) + " |\n")
        fh.write("|" + "---|" * len(cols) + "\n")
        for r in rows:
            fh.write("| " + " | ".join(str(v) for v in r) + " |\n")


if __name__ == "__main__":
    sys.exit(main())
