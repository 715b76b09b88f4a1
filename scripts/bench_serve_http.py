"""Measure the HTTP serving front-end's micro-batching on real hardware.

Compares sequential vs concurrent small requests against
``python -m protoclip_tpu.cli.serve`` and reports request throughput and
the /statz dispatch counts.  The point being measured: the serving
executable runs a fixed-size batch, so a small request costs one full
device dispatch — unless concurrent requests coalesce
(``toolkit/microbatch.py``), in which case N requests share one.

TPU discipline (CLAUDE.md: one process per chip): the bundle export runs
in a subprocess that exits before the server starts; the server subprocess
is then the only TPU owner; this client process makes no jax calls (it
drives the server through the shipped ``protoclip_tpu.client.ServeClient``
— the same client users deploy, so the bench measures the real path).

    python scripts/bench_serve_http.py --int8 --batch 256 \
        --requests 32 --images-per-request 8
"""

from __future__ import annotations

import argparse
import concurrent.futures as futures
import io
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from protoclip_tpu.client import ServeClient  # noqa: E402 — needs REPO on sys.path


def export_bundle(args) -> None:
    """Export in a child that releases the chip on exit — via the real
    export CLI (one source of truth: the bench must measure the same
    bundle a user deploys with ``protoclip-export``)."""
    cmd = [
        sys.executable, "-m", "protoclip_tpu.cli.export",
        "--backbone", args.backbone, "--out", args.bundle,
        "--batch", str(args.batch),
    ]
    if args.int8:
        cmd.append("--int8")
    if args.buckets:
        cmd += ["--buckets", *map(str, args.buckets)]
    subprocess.run(cmd, check=True, cwd=REPO)


def wait_healthz(client: ServeClient, timeout_s: float) -> dict:
    deadline = time.monotonic() + timeout_s
    last = None
    while time.monotonic() < deadline:
        try:
            return client.healthz()
        except Exception as exc:  # noqa: BLE001 — keep polling until deadline
            last = exc
            time.sleep(1.0)
    raise RuntimeError(f"server never became healthy: {last}")


def make_images(n_images: int, px: int) -> list:
    """Pre-encoded PNG bytes (ServeClient passes encoded bytes through
    untouched, so the per-request client cost is just base64+json)."""
    import numpy as np
    from PIL import Image

    rng = np.random.default_rng(0)
    encoded = []
    for _ in range(n_images):
        img = Image.fromarray(rng.integers(0, 256, (px, px, 3)).astype("uint8"))
        buf = io.BytesIO()
        img.save(buf, "PNG")
        encoded.append(buf.getvalue())
    return encoded


def run_load(client: ServeClient, images: list, n_requests: int, workers: int) -> dict:
    def post(_):
        return client.encode(images).shape[0]

    before = client.statz()["/encode"]
    t0 = time.perf_counter()
    if workers == 1:
        done = sum(post(i) for i in range(n_requests))
    else:
        with futures.ThreadPoolExecutor(workers) as pool:
            done = sum(pool.map(post, range(n_requests)))
    dt = time.perf_counter() - t0
    after = client.statz()["/encode"]
    return {
        "requests": n_requests,
        "workers": workers,
        "seconds": round(dt, 3),
        "images": done,
        "img_per_s": round(done / dt, 1),
        "req_per_s": round(n_requests / dt, 1),
        "dispatches": after["dispatches"] - before["dispatches"],
        "mean_fill": round(
            (after["images"] - before["images"])
            / max(1, after["dispatches"] - before["dispatches"]), 1),
    }


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--backbone", default="ViT-B/16")
    parser.add_argument("--batch", type=int, default=256)
    parser.add_argument("--int8", action="store_true")
    parser.add_argument("--bundle", default="/tmp/serve_bench_bundle")
    parser.add_argument("--port", type=int, default=8439)
    parser.add_argument("--requests", type=int, default=32)
    parser.add_argument("--images-per-request", type=int, default=8)
    parser.add_argument("--coalesce-ms", type=float, default=5.0)
    parser.add_argument("--warmup-timeout", type=float, default=900.0,
                        help="first compile of the artifact can be minutes cold")
    parser.add_argument("--skip-export", action="store_true",
                        help="reuse an existing --bundle dir")
    parser.add_argument(
        "--buckets", type=int, nargs="*", default=None,
        help="export bucketed executables (e.g. --buckets 8 64): underfull "
        "serving dispatches pad to the smallest bucket instead of --batch",
    )
    args = parser.parse_args()

    if not args.skip_export:
        print("[bench-serve] exporting bundle (subprocess owns the chip)...")
        export_bundle(args)

    server = subprocess.Popen(
        [sys.executable, "-m", "protoclip_tpu.cli.serve",
         "--bundle", args.bundle, "--port", str(args.port),
         "--coalesce-ms", str(args.coalesce_ms), "--host", "127.0.0.1"],
        cwd=REPO,
    )
    try:
        client = ServeClient(f"http://127.0.0.1:{args.port}", timeout=600.0)
        health = wait_healthz(client, args.warmup_timeout)
        print(f"[bench-serve] healthz: {health}")
        px = health["image_resolution"]
        images = make_images(args.images_per_request, px)
        client.encode(images)  # client-side warm (connection, json)

        serial = run_load(client, images, args.requests, workers=1)
        print(f"[bench-serve] serial    : {serial}")
        concurrent = run_load(
            client, images, args.requests, workers=min(args.requests, 64)
        )
        print(f"[bench-serve] concurrent: {concurrent}")
        speedup = concurrent["img_per_s"] / serial["img_per_s"]
        print(json.dumps({
            "metric": "serve_coalesce_speedup",
            "serial_img_per_s": serial["img_per_s"],
            "concurrent_img_per_s": concurrent["img_per_s"],
            "speedup": round(speedup, 2),
            "serial_dispatches": serial["dispatches"],
            "concurrent_dispatches": concurrent["dispatches"],
        }))
    finally:
        server.terminate()
        try:
            server.wait(timeout=15)
        except subprocess.TimeoutExpired:
            server.kill()


if __name__ == "__main__":
    main()
