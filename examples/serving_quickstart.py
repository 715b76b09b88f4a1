"""Serving quickstart: export an AOT bundle, serve it over HTTP, query it.

Self-contained — no datasets, no pretrained weights (a tiny random-init
CLIP stands in; swap it for ``load_clip("ViT-B/16")`` on a real
deployment).  Runs on CPU in seconds; pass ``--tpu`` to use the
machine's accelerator instead::

    python examples/serving_quickstart.py

What it demonstrates, end to end:

1. ``save_serving_bundle`` — the compiled encoder as a version-pinned
   StableHLO artifact + weights + manifest (``io/export.py``).
2. ``python -m protoclip_tpu.cli.serve`` — the stdlib HTTP front-end with
   dynamic request micro-batching (``cli/serve.py``).
3. ``ServeClient`` — the jax-free client (``client.py``).
"""

import os
import signal
import socket
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# Force CPU for the quickstart unless --tpu: a pinned accelerator platform
# in the environment (e.g. JAX_PLATFORMS=axon/tpu) would otherwise win
if "--tpu" not in sys.argv:
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["PALLAS_AXON_POOL_IPS"] = ""
    # belt and braces: a sitecustomize that pre-registered an accelerator
    # plugin at interpreter startup ignores env changes made this late
    import jax

    jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402


def export_bundle(bundle_dir: str) -> None:
    import jax

    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

    from protoclip_tpu.io.export import save_serving_bundle
    from protoclip_tpu.models.clip import CLIPConfig, init_clip_params

    tiny = CLIPConfig(
        "tiny-vit", embed_dim=64, image_resolution=64, vision_layers=2,
        vision_width=64, vision_patch_size=16, context_length=16,
        vocab_size=128, transformer_width=64, transformer_layers=2,
    )
    params = init_clip_params(jax.random.PRNGKey(0), tiny)
    save_serving_bundle(bundle_dir, tiny, params, batch_size=8)
    print(f"[quickstart] exported bundle -> {bundle_dir}")


def main() -> None:
    bundle = os.path.join(tempfile.mkdtemp(prefix="protoclip_qs_"), "bundle")
    export_bundle(bundle)

    with socket.socket() as s:  # pick a free port
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    server = subprocess.Popen(
        [sys.executable, "-m", "protoclip_tpu.cli.serve",
         "--bundle", bundle, "--port", str(port)],
        cwd=REPO, env=dict(os.environ),
    )
    try:
        from protoclip_tpu.client import ServeClient, ServeError

        client = ServeClient(f"http://127.0.0.1:{port}")
        for _ in range(100):  # wait for warmup
            try:
                health = client.healthz()
                break
            except (ServeError, OSError):
                time.sleep(0.3)
        else:
            raise RuntimeError("server never became healthy")
        print(f"[quickstart] healthz: {health}")

        rng = np.random.default_rng(0)
        crops = [rng.integers(0, 256, (48 + 8 * i, 64, 3), dtype=np.uint8)
                 .astype(np.uint8) for i in range(3)]
        feats = client.encode(crops)
        print(f"[quickstart] encoded {feats.shape[0]} images -> "
              f"{feats.shape[1]}-d features; first row starts "
              f"{np.round(feats[0, :4], 4).tolist()}")
        print(f"[quickstart] statz: {client.statz()}")
    finally:
        server.send_signal(signal.SIGTERM)  # graceful: flush + exit 0
        print(f"[quickstart] server exit code: {server.wait(timeout=30)}")


if __name__ == "__main__":
    main()
