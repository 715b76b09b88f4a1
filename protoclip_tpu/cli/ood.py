"""OOD evaluation CLI (ref ``toolkit`` OOD scripts).

Example::

    python -m protoclip_tpu.cli.ood --config configs/imagenet.yml \
        --ood imagenet_sketch --data_root DATA/sketch \
        --memory_bank_v ... --memory_bank_t ... --adapter_weights ...
"""

from __future__ import annotations

import argparse

from protoclip_tpu.core.config import load_config


def main() -> None:
    parser = argparse.ArgumentParser(description="Proto-CLIP OOD evaluation")
    parser.add_argument("--config", required=True)
    parser.add_argument("--ood", required=True, choices=["imagenet_v2", "imagenet_sketch"])
    parser.add_argument("--data_root", required=True, help="class-folder dataset root")
    parser.add_argument("--memory_bank_v")
    parser.add_argument("--memory_bank_t", required=True)
    parser.add_argument("--adapter_weights")
    parser.add_argument("--alpha", type=float)
    parser.add_argument("--beta", type=float)
    args = parser.parse_args()

    cfg = load_config(args.config, alpha=args.alpha, beta=args.beta)
    from protoclip_tpu.toolkit.ood import test_ood_performance
    from protoclip_tpu.train.runner import make_encode_fns

    encode_fn, _, clip_cfg, _ = make_encode_fns(cfg)
    acc = test_ood_performance(
        cfg, args.ood, encode_fn, args.data_root,
        memory_bank_v_path=args.memory_bank_v,
        memory_bank_t_path=args.memory_bank_t,
        adapter_weights_path=args.adapter_weights,
        image_size=clip_cfg.image_resolution,
    )
    print(f"OOD {args.ood} accuracy: {acc:.2f}%")


if __name__ == "__main__":
    main()
