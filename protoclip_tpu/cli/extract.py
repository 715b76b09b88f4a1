"""Standalone CLIP feature extraction: image folder -> features ``.npz``.

The deployment/serving counterpart of the reference's uncached encode
(``toolkit/.../model_utils.py:69-82``) and of the feature pre-loader
(``utils.py:335-361``), exposed as a CLI so features can be produced
without running an experiment:

    python -m protoclip_tpu.cli.extract --backbone ViT-B/16 \
        --input path/to/images --out feats.npz [--int8] [--batch 512]

Walks ``--input`` recursively for image files (sorted, stable order),
encodes them batched through one jitted program (the W8A8 serving kernel
when ``--int8``), L2-normalizes, and writes ``{"files": [...],
"features": (N, d) fp32}``.
"""

from __future__ import annotations

import argparse
import os
import sys


def _find_images(root: str) -> list:
    from protoclip_tpu.data.splits import _IMAGE_EXTS

    out = []
    for dirpath, dirnames, filenames in os.walk(root):
        dirnames.sort()
        for name in sorted(filenames):
            if name.lower().endswith(_IMAGE_EXTS):
                out.append(os.path.join(dirpath, name))
    return out


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--backbone", default="ViT-B/16")
    parser.add_argument("--weights", help="CLIP weights .pt (default: discovery)")
    parser.add_argument("--input", required=True, help="image file or directory")
    parser.add_argument("--out", required=True, help="output .npz path")
    parser.add_argument("--batch", type=int, default=256)
    parser.add_argument(
        "--mesh", type=int, default=0,
        help="shard encode batches over the first N devices (1-D 'data' "
        "mesh, same layout as the experiment encode and --mesh serving); "
        "0 = single device",
    )
    parser.add_argument(
        "--int8", action="store_true",
        help="W8A8 serving kernel (sets $PROTOCLIP_INT8)",
    )
    parser.add_argument(
        "--no-normalize", action="store_true", help="skip output L2-normalization"
    )
    parser.add_argument(
        "--fast-decode", action="store_true",
        help="libjpeg DCT-scaled decode (~2x faster host preprocess; not "
        "pixel-exact with the torchvision pipeline — serving only)",
    )
    parser.add_argument(
        "--decode-threads", type=int, default=max(1, (os.cpu_count() or 1)),
        help="host decode threads (PIL releases the GIL)",
    )
    args = parser.parse_args()

    if args.int8:
        os.environ["PROTOCLIP_INT8"] = "1"

    import concurrent.futures as _futures

    import jax
    import jax.numpy as jnp
    import numpy as np

    from protoclip_tpu.data.transforms import clip_preprocess, load_image
    from protoclip_tpu.io.export import make_encode_fn
    from protoclip_tpu.models import load_clip

    if not args.out.endswith(".npz"):
        args.out += ".npz"  # np.savez appends it silently otherwise
    files = (
        [args.input] if os.path.isfile(args.input) else _find_images(args.input)
    )
    if not files:
        sys.exit(f"no images found under {args.input!r}")

    if args.int8:
        from protoclip_tpu.ops.pallas_kernels import pallas_enabled

        if not pallas_enabled():
            # same hazard as save_serving_bundle(int8=True): the W8A8 branch
            # sits inside the Pallas gate, so off-TPU this would silently
            # run plain bf16.  Extraction output is still correct (int8 is
            # a speed mode), so warn rather than abort.
            print(
                "[extract] WARNING: --int8 requested but the Pallas kernels "
                "are disabled for this backend; encoding runs bf16",
                file=sys.stderr,
            )

    # fail fast on an unwritable --out BEFORE hours of encode work: the
    # features only hit disk after the whole corpus is processed
    out_dir = os.path.dirname(os.path.abspath(args.out)) or "."
    os.makedirs(out_dir, exist_ok=True)
    if not os.access(out_dir, os.W_OK):
        raise SystemExit(f"[extract] --out directory is not writable: {out_dir}")

    cfg, params = load_clip(args.backbone, args.weights, dtype=jnp.bfloat16)
    n_px = cfg.image_resolution

    encode_raw = make_encode_fn(cfg, normalize=not args.no_normalize)
    if args.mesh:
        # feature extraction is the embarrassingly-parallel workload: shard
        # the fixed-shape batch over a 1-D data mesh.  Each output row
        # depends only on its own batch rows, so sharding is bit-identical
        # to single-device at the same per-program batch (pinned by
        # tests/test_e2e.py::test_extract_cli_mesh_bit_exact); a different
        # effective batch can shift XLA's matmul blocking by ~1 ULP
        # (measured: ViT-B/32 per-shard batch 1 vs single batch 8 -> 3e-8
        # on unit-norm features).  The ragged tail rides the existing
        # fixed-batch padding; only the batch size must divide evenly over
        # the mesh.
        from protoclip_tpu.parallel import make_mesh
        from protoclip_tpu.parallel.sharding import (
            fetch_to_host,
            make_sharded_encode,
            replicated,
            shard_batch,
        )

        mesh = make_mesh(args.mesh)
        args.batch = -(-args.batch // args.mesh) * args.mesh
        encode_sharded = make_sharded_encode(encode_raw, mesh)
        # replicate the weights across the mesh ONCE, like cli/serve.py's
        # mesh route: left committed to device 0, every chunk's encode
        # would re-broadcast the full pytree (~0.9 GB for ViT-L/14) inside
        # the hot loop — and under multiple processes jit cannot auto-
        # reshard a process-local array onto the global mesh at all
        params = jax.device_put(params, replicated(mesh))

        def encode(p, images):
            out = encode_sharded(p, shard_batch(images, mesh))
            # multi-host: batch-sharded output is not fully addressable
            return fetch_to_host(out) if jax.process_count() > 1 else out
    else:
        encode = jax.jit(encode_raw)

    draft_px = n_px if args.fast_decode else None

    def _decode(into, i, path):
        into[i] = clip_preprocess(load_image(path, draft_px), n_px)

    feats_out = []
    # double buffer: while chunk N's encode+fetch is in flight on the
    # device, the pool decodes chunk N+1 into the OTHER buffer — host
    # preprocess and device compute overlap instead of serializing.  Buffer
    # ci%2 is not rewritten until chunk ci+2, by which time chunk ci's
    # features have been fetched (so its input upload is long complete).
    bufs = [np.zeros((args.batch, n_px, n_px, 3), np.uint8) for _ in range(2)]
    chunks = [files[s : s + args.batch] for s in range(0, len(files), args.batch)]
    with _futures.ThreadPoolExecutor(max_workers=args.decode_threads) as pool:

        def submit(ci):
            buf = bufs[ci % 2]
            return [
                pool.submit(_decode, buf, i, p) for i, p in enumerate(chunks[ci])
            ]

        pending = submit(0)
        for ci, chunk in enumerate(chunks):
            for fut in pending:
                fut.result()  # barrier + propagate decode errors
            # fixed batch shape: one compiled program regardless of the tail
            dev_feats = encode(params, jnp.asarray(bufs[ci % 2]))  # async
            if ci + 1 < len(chunks):
                pending = submit(ci + 1)
            feats_out.append(np.asarray(dev_feats)[: len(chunk)])
            print(
                f"\r[extract] {min((ci + 1) * args.batch, len(files))}/{len(files)}",
                end="", file=sys.stderr,
            )
    print(file=sys.stderr)

    features = np.concatenate(feats_out)
    np.savez(args.out, files=np.asarray(files), features=features)
    print(f"Wrote {args.out}: {features.shape[0]} x {features.shape[1]} fp32")


if __name__ == "__main__":
    main()
