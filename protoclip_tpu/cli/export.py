"""Export an AOT serving bundle from the command line.

Completes the CLI workflow train -> export -> serve: the bundle directory
this writes is what ``python -m protoclip_tpu.cli.serve --bundle`` loads
(compiled StableHLO executables + weights npz + manifest, ``io/export.py``).
The reference has no AOT deployment artifact — it ships model code +
checkpoints and rebuilds at the target (``toolkit/.../model_utils.py``).

    python -m protoclip_tpu.cli.export --backbone ViT-B/16 --out bundle/ \
        --batch 256 --buckets 8 64 --int8

Export on (or for, via --platform) the serving backend: the int8 path
needs the Pallas kernels to lower for the target platform.
"""

from __future__ import annotations

import argparse
import sys


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--backbone", default="ViT-B/16")
    parser.add_argument("--weights", help="CLIP weights .pt path (default: discovery)")
    parser.add_argument("--out", required=True, help="bundle directory to write")
    parser.add_argument("--batch", type=int, default=256,
                        help="compiled (maximum) batch size")
    parser.add_argument(
        "--buckets", type=int, nargs="*", default=None,
        help="extra compiled batch sizes (e.g. 8 64): calls route to the "
        "smallest bucket that fits, so underfull dispatches cost less",
    )
    parser.add_argument("--int8", action="store_true",
                        help="export the W8A8 serving path (TPU target)")
    parser.add_argument("--no-normalize", action="store_true",
                        help="skip the L2 feature normalization")
    parser.add_argument(
        "--platform", nargs="*", default=None,
        help="pin target platform(s), e.g. 'tpu' (default: current backend)",
    )
    return parser


def main(argv=None) -> None:
    args = build_parser().parse_args(argv)

    import jax.numpy as jnp

    from protoclip_tpu.io.export import save_serving_bundle
    from protoclip_tpu.models import load_clip

    cfg, params = load_clip(args.backbone, args.weights, dtype=jnp.bfloat16)
    save_serving_bundle(
        args.out, cfg, params,
        batch_size=args.batch,
        batch_sizes=args.buckets,
        int8=args.int8,
        normalize=not args.no_normalize,
        platforms=args.platform,
    )
    sizes = sorted({args.batch, *(args.buckets or ())})
    print(
        f"Wrote {args.out}: {args.backbone} batch buckets {sizes} "
        f"{'int8' if args.int8 else 'bf16'}",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
