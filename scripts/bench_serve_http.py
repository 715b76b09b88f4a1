"""Measure the HTTP serving front-end's micro-batching on real hardware.

Compares sequential vs concurrent small requests against
``python -m protoclip_tpu.cli.serve`` and reports request throughput and
the /statz dispatch counts.  The point being measured: the serving
executable runs a fixed-size batch, so a small request costs one full
device dispatch — unless concurrent requests coalesce
(``toolkit/microbatch.py``), in which case N requests share one.

TPU discipline (CLAUDE.md: one process per chip): the bundle export runs
in a subprocess that exits before the server starts; the server subprocess
is then the only TPU owner; this client process never imports jax.

    python scripts/bench_serve_http.py --int8 --batch 256 \
        --requests 32 --images-per-request 8
"""

from __future__ import annotations

import argparse
import base64
import concurrent.futures as futures
import io
import json
import os
import subprocess
import sys
import time
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def export_bundle(args) -> None:
    """Export in a child that releases the chip on exit."""
    code = f"""
import jax.numpy as jnp
from protoclip_tpu.io.export import save_serving_bundle
from protoclip_tpu.models import load_clip
cfg, params = load_clip({args.backbone!r}, dtype=jnp.bfloat16)
save_serving_bundle({args.bundle!r}, cfg, params,
                    batch_size={args.batch}, int8={args.int8},
                    batch_sizes={tuple(args.buckets or ())!r} or None)
print("exported", flush=True)
"""
    subprocess.run([sys.executable, "-c", code], check=True, cwd=REPO)


def wait_healthz(port: int, timeout_s: float) -> dict:
    deadline = time.monotonic() + timeout_s
    last = None
    while time.monotonic() < deadline:
        try:
            with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/healthz", timeout=5
            ) as resp:
                return json.loads(resp.read())
        except Exception as exc:  # noqa: BLE001 — keep polling until deadline
            last = exc
            time.sleep(1.0)
    raise RuntimeError(f"server never became healthy: {last}")


def statz(port: int) -> dict:
    with urllib.request.urlopen(f"http://127.0.0.1:{port}/statz", timeout=10) as r:
        return json.loads(r.read())["/encode"]


def make_payload(n_images: int, px: int) -> bytes:
    import numpy as np
    from PIL import Image

    rng = np.random.default_rng(0)
    b64s = []
    for _ in range(n_images):
        img = Image.fromarray(rng.integers(0, 256, (px, px, 3)).astype("uint8"))
        buf = io.BytesIO()
        img.save(buf, "PNG")
        b64s.append(base64.b64encode(buf.getvalue()).decode())
    return json.dumps({"images": b64s}).encode()


def post(port: int, body: bytes) -> int:
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/encode", data=body,
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req, timeout=600) as resp:
        return len(json.loads(resp.read())["features"])


def run_load(port: int, body: bytes, n_requests: int, workers: int) -> dict:
    before = statz(port)
    t0 = time.perf_counter()
    if workers == 1:
        images = sum(post(port, body) for _ in range(n_requests))
    else:
        with futures.ThreadPoolExecutor(workers) as pool:
            images = sum(
                pool.map(lambda _: post(port, body), range(n_requests))
            )
    dt = time.perf_counter() - t0
    after = statz(port)
    return {
        "requests": n_requests,
        "workers": workers,
        "seconds": round(dt, 3),
        "images": images,
        "img_per_s": round(images / dt, 1),
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
        health = wait_healthz(args.port, args.warmup_timeout)
        print(f"[bench-serve] healthz: {health}")
        px = health["image_resolution"]
        body = make_payload(args.images_per_request, px)
        post(args.port, body)  # client-side warm (connection, json)

        serial = run_load(args.port, body, args.requests, workers=1)
        print(f"[bench-serve] serial    : {serial}")
        concurrent = run_load(
            args.port, body, args.requests, workers=min(args.requests, 64)
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
