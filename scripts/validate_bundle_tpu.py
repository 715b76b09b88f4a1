#!/usr/bin/env python
"""Validate the AOT serving bundle on the real TPU chip, end to end.

Exports the flagship ViT-B/16 encoder as a serving bundle (bf16, and W8A8
int8 when the Pallas gate is open), reloads it cold — the loader path a
serving process would use, no model-building code — and checks:

1. the StableHLO artifact (including Mosaic custom calls for the fused
   Pallas block kernels) survives serialize -> deserialize -> execute;
2. reloaded-bundle features match the live jitted path bit-for-bit
   (same program, same weights — the export must not change numerics);
3. sustained bundle throughput, for comparison against the live-path
   numbers in ``bench_details.json`` (NOTE: ``artifact.call`` is one
   dispatch per batch, so through the axon tunnel each batch pays the
   ~27 ms WAN round trip that bench.py amortizes — on a real TPU host
   that tax is absent; see BASELINE.md "Measurement note").

Run on the TPU backend:  python scripts/validate_bundle_tpu.py [--int8]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--backbone", default="ViT-B/16")
    parser.add_argument("--batch", type=int, default=256)
    parser.add_argument("--int8", action="store_true")
    parser.add_argument("--iters", type=int, default=8)
    parser.add_argument(
        "--buckets", type=int, nargs="*", default=None,
        help="also export bucketed executables (e.g. --buckets 8 64) and "
        "validate each bucket's output + per-dispatch latency vs the max",
    )
    args = parser.parse_args()

    import numpy as np

    import jax
    import jax.numpy as jnp

    from protoclip_tpu.io.export import (
        load_serving_bundle,
        make_encode_fn,
        save_serving_bundle,
    )
    from protoclip_tpu.models import load_clip

    backend = jax.default_backend()
    print(f"[bundle] backend={backend} backbone={args.backbone} "
          f"batch={args.batch} int8={args.int8}")

    cfg, params = load_clip(args.backbone, dtype=jnp.bfloat16)
    n_px = cfg.image_resolution
    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 256, (args.batch, n_px, n_px, 3)).astype(np.uint8)

    with tempfile.TemporaryDirectory() as d:
        t0 = time.perf_counter()
        save_serving_bundle(d, cfg, params, batch_size=args.batch,
                            batch_sizes=args.buckets, int8=args.int8)
        export_s = time.perf_counter() - t0
        artifact_kb = os.path.getsize(os.path.join(d, "encoder.shlo")) / 1024
        print(f"[bundle] exported in {export_s:.1f}s, "
              f"artifact {artifact_kb:.0f} KB")

        encode = load_serving_bundle(d)
        got = encode(imgs)

        # live path at the SAME serving mode for the numeric cross-check
        prior = os.environ.get("PROTOCLIP_INT8")
        os.environ["PROTOCLIP_INT8"] = "1" if args.int8 else "0"
        try:
            live = jax.jit(make_encode_fn(cfg))
            want = np.asarray(live(params, jnp.asarray(imgs)))
        finally:
            if prior is None:
                os.environ.pop("PROTOCLIP_INT8", None)
            else:
                os.environ["PROTOCLIP_INT8"] = prior

        max_abs = float(np.max(np.abs(got - want)))
        print(f"[bundle] reload-vs-live max|diff| = {max_abs:.3e}")
        if max_abs != 0.0:
            # same program + same weights must be bit-identical
            sys.exit(f"FAIL: bundle output diverges from live path ({max_abs})")

        # time with DEVICE-RESIDENT input: through the axon tunnel the 38 MB
        # uint8 host->device upload costs ~3 s/batch at ~12 MB/s, swamping
        # the program; a real TPU host feeds over PCIe where that transfer
        # is negligible (CLAUDE.md / BASELINE.md measurement notes)
        dev_imgs = jax.device_put(imgs)

        def run_once():
            return np.asarray(encode.artifact.call(encode.params, dev_imgs))

        for _ in range(2):  # warm
            run_once()
        t0 = time.perf_counter()
        for _ in range(args.iters):
            run_once()
        dt = (time.perf_counter() - t0) / args.iters
        ips = args.batch / dt
        line = {
            "bundle_images_per_sec_device_input": round(ips, 1),
            "ms_per_batch": round(dt * 1e3, 2),
            "note": "per-dispatch (one batch per round trip): includes the "
                    "~27 ms tunnel dispatch tax and the feature fetch; "
                    "compare bench.py which amortizes 20 batches/dispatch",
        }

        # bucketed executables: each bucket's rows must match the max-batch
        # output, and small buckets should dispatch faster.  Buckets are
        # DISTINCT compiled programs, so batch-shape-dependent MXU tiling
        # moves fp intermediates by ~1 ULP; under bf16 that surfaces as
        # <=1e-5 on the output, but under int8 W8A8 a 1-ULP flip AT a
        # quantization boundary moves that activation by a full int8 step
        # (~1/127 of the row amax), measured 2.5e-3 on unit-norm features
        # at ViT-B/16 (round 5) — well inside the serving mode's own
        # >0.995-cosine-vs-fp32 budget.  Interpret-mode (single-program
        # semantics) buckets are bit-identical, so the tolerance here is
        # about program-pair noise, not bucket semantics.
        tol = 1e-2 if args.int8 else 1e-5
        for size in sorted(args.buckets or []):
            sub = encode(imgs[:size])
            bucket_max = float(np.max(np.abs(sub - got[:size])))
            cos = float(
                np.min(np.sum(sub * got[:size], axis=-1)
                       / (np.linalg.norm(sub, axis=-1)
                          * np.linalg.norm(got[:size], axis=-1)))
            )
            # cosine floor: measured 0.99991 on-chip for int8 buckets
            # (round 5); 0.9995 keeps 5x headroom over the observed
            # program-pair noise while staying 10x tighter than the int8
            # mode's own >0.995 budget
            if bucket_max > tol or cos < 0.9995:
                sys.exit(
                    f"FAIL: bucket {size} diverges from the max batch "
                    f"(max|diff| = {bucket_max}, min row cosine = {cos})"
                )
            print(
                f"[bundle] bucket {size}: max|diff| vs max batch = "
                f"{bucket_max:.2e}, min row cosine = {cos:.6f}"
            )
            dev_sub = jax.device_put(imgs[:size])
            art = encode.artifacts[size]
            for _ in range(2):
                np.asarray(art.call(encode.params, dev_sub))
            t0 = time.perf_counter()
            for _ in range(args.iters):
                np.asarray(art.call(encode.params, dev_sub))
            line[f"bucket_{size}_ms_per_dispatch"] = round(
                (time.perf_counter() - t0) / args.iters * 1e3, 2
            )

        print(json.dumps(line))
        print("[bundle] OK")


if __name__ == "__main__":
    main()
