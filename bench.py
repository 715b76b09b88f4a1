"""Benchmark harness: flagship CLIP-encode throughput on one chip.

Prints ONE JSON line:
    {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

Headline metric: ViT-B/16 image-encode throughput (images/sec/chip) at
224px — the hot path of Proto-CLIP's feature caching and of the F-Q^T
trainer (the reference's dominant GPU workload, ``utils.py:303-316``,
``main.qt.py:198-201``).  The headline is the framework's best validated
serving configuration: the W8A8 int8 kernel (per-channel weight + per-token
activation scales, int32 MXU accumulation, bf16 attention core), whose
full-tower output parity vs fp32 is pinned by
``tests/test_pallas.py::test_int8_encode_parity_real_geometry`` (per-feature
cosine > 0.995 at real ViT-B/16 geometry) and whose end-to-end experiment
behavior is pinned by ``tests/test_e2e.py::test_full_run_int8_serving_mode``.
The bf16 number (the reference's fp16-semantics analog) is always measured
too and reported in ``bench_details.json``; if the int8 path ever
underperforms or fails, the headline falls back to bf16.

Baseline: PyTorch fp16 ViT-B/16 encode on A100 reaches ~1.1k images/sec at
eval batch sizes (BASELINE.md north-star: >=5x that per chip).  Synthetic
device-resident data isolates chip throughput from host IO (this harness's
host has 1 vCPU; production feature extraction overlaps host decode with
device compute).

Extra (non-headline) metrics are written to ``bench_details.json``.
"""

from __future__ import annotations

import json
import time

import numpy as np

BASELINE_IMAGES_PER_SEC = 1100.0  # PyTorch-A100 fp16 ViT-B/16 encode (BASELINE.md)

# Regression tripwires: pinned ~6% under the weakest round-3 measurement of
# each metric (BENCH_r03 / bench_details history: int8 5550.8, bf16 4082,
# RN50 8888, ViT-L/14 int8 1296, text 19.6k).  A TPU run landing under a
# floor emits "regression": true + the failing metrics in the JSON line, so
# a kernel regression turns the round's bench red without human diffing.
PERF_FLOORS = {
    "int8_images_per_sec": 5200.0,
    "bf16_images_per_sec": 3900.0,
    "rn50_images_per_sec": 8400.0,
    "vit_l14_int8_images_per_sec": 1200.0,
    "text_encode_prompts_per_sec": 18000.0,
    # AOT bundle per-dispatch throughput (device input, one batch per
    # round trip — so these carry the full ~27 ms tunnel tax per batch
    # and get a wider margin than the amortized floors above).  Measured
    # round 5 (BASELINE.md): B/16 int8 2946, L/14 int8 923.6, RN50 2980.1
    "bundle_vit_b16_int8_images_per_sec": 2300.0,
    "bundle_vit_l14_int8_images_per_sec": 800.0,
    "bundle_rn50_images_per_sec": 2500.0,
}


def _enable_compilation_cache() -> None:
    """Persistent executable cache (shared definition in obs/profiler.py)."""
    from protoclip_tpu.obs.profiler import enable_compilation_cache

    enable_compilation_cache()


def measure_dispatch_overhead(iters: int = 12) -> float:
    """Fixed per-dispatch round-trip latency of this backend (seconds).

    Through the remote axon tunnel every dispatch+fetch pays a ~27 ms WAN
    round trip that has nothing to do with chip throughput; reported
    separately in ``bench_details.json``."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def trivial(x):
        return jnp.sum(x)

    x = jnp.ones((8, 8), jnp.float32)
    np.asarray(trivial(x))
    times = []
    for _ in range(iters):
        start = time.perf_counter()
        np.asarray(trivial(x))
        times.append(time.perf_counter() - start)
    return min(times)


def bench_encode(
    backbone: str = "ViT-B/16", batch: int = 512, iters: int = 4, inner: int = 20,
    int8: bool = False,
):
    """Sustained encode throughput: ``inner`` back-to-back batches run in one
    dispatch (a ``lax.scan``), amortizing the fixed dispatch/fetch round trip
    exactly as a production feature-extraction pipeline does by keeping the
    device queue full.  Each scan step perturbs the input with the step index
    so XLA cannot CSE the iterations."""
    import os

    import jax
    import jax.numpy as jnp

    from protoclip_tpu.data.transforms import normalize_batch
    from protoclip_tpu.models.clip import encode_image, load_clip

    os.environ["PROTOCLIP_INT8"] = "1" if int8 else "0"
    cfg, params = load_clip(backbone, dtype=jnp.bfloat16)

    @jax.jit
    def encode_many(params, images_u8):
        def body(carry, i):
            imgs = images_u8 ^ i.astype(jnp.uint8)  # defeat CSE across steps
            feats = encode_image(params, normalize_batch(imgs, jnp.bfloat16), cfg)
            return carry + jnp.sum(feats.astype(jnp.float32)), None

        # Scalar checksum: forces full execution while keeping the timed
        # device-to-host fetch negligible (remote-tunnel transfers are slow
        # and block_until_ready does not await execution there).
        total, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(inner, dtype=jnp.int32))
        return total

    res = cfg.image_resolution
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.integers(0, 256, (batch, res, res, 3)).astype(np.uint8))

    np.asarray(encode_many(params, images))  # compile
    np.asarray(encode_many(params, images))  # warm

    profile_dir = os.environ.get("PROTOCLIP_PROFILE")
    if profile_dir:
        from protoclip_tpu.obs.profiler import trace_to

        with trace_to(profile_dir):
            np.asarray(encode_many(params, images))

    times = []
    for _ in range(iters):
        start = time.perf_counter()
        np.asarray(encode_many(params, images))
        times.append(time.perf_counter() - start)
    best = min(times)
    return batch * inner / best, best / inner


def bench_bundle(
    backbone: str = "ViT-B/16", batch: int = 256, iters: int = 6,
    int8: bool = False,
):
    """Per-dispatch throughput of the AOT serving bundle with
    device-resident input — the deployment artifact path
    (``io/export.py``; one ``artifact.call`` per batch, so each dispatch
    pays the fixed round trip that the scan benches amortize).  Floors on
    these catch export/runtime regressions the live-path numbers cannot
    (a broken StableHLO round trip, a deserialized program losing its
    Mosaic custom calls)."""
    import os
    import tempfile

    import jax
    import jax.numpy as jnp

    from protoclip_tpu.io.export import load_serving_bundle, save_serving_bundle
    from protoclip_tpu.models.clip import load_clip

    os.environ["PROTOCLIP_INT8"] = "1" if int8 else "0"
    cfg, params = load_clip(backbone, dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    res = cfg.image_resolution
    imgs = rng.integers(0, 256, (batch, res, res, 3)).astype(np.uint8)
    with tempfile.TemporaryDirectory() as d:
        save_serving_bundle(d, cfg, params, batch_size=batch, int8=int8)
        encode = load_serving_bundle(d)
        dev = jax.device_put(imgs)
        for _ in range(2):  # compile (persistent-cached) + warm
            np.asarray(encode.artifact.call(encode.params, dev))
        times = []
        for _ in range(iters):
            start = time.perf_counter()
            np.asarray(encode.artifact.call(encode.params, dev))
            times.append(time.perf_counter() - start)
    return batch / min(times)


def bench_text_encode(
    backbone: str = "ViT-B/16", batch: int = 1024, iters: int = 4, inner: int = 20,
):
    """Sustained text-encode throughput (prompts/sec) — the textual memory
    bank builder's workload (one batched encode of the whole N x ensemble
    prompt set, ref ``utils.py:54-69``)."""
    import os

    import jax
    import jax.numpy as jnp

    from protoclip_tpu.models.clip import encode_text, load_clip

    os.environ["PROTOCLIP_INT8"] = "0"
    cfg, params = load_clip(backbone, dtype=jnp.bfloat16)

    @jax.jit
    def encode_many(params, tokens):
        def body(carry, i):
            # perturb a middle token id per step so XLA cannot CSE; SOT/EOT
            # positions stay fixed so the argmax pooling is stable
            t = tokens.at[:, 1].set((tokens[:, 1] + i) % 49000 + 1)
            feats = encode_text(params, t, cfg)
            return carry + jnp.sum(feats.astype(jnp.float32)), None

        total, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(inner, dtype=jnp.int32))
        return total

    rng = np.random.default_rng(0)
    tokens = np.zeros((batch, cfg.context_length), np.int32)
    tokens[:, 0] = 49406
    tokens[:, 1:20] = rng.integers(1, 49000, (batch, 19))
    tokens[:, 20] = 49407
    tokens = jnp.asarray(tokens)

    np.asarray(encode_many(params, tokens))  # compile
    times = []
    for _ in range(iters):
        start = time.perf_counter()
        np.asarray(encode_many(params, tokens))
        times.append(time.perf_counter() - start)
    return batch * inner / min(times)


def _tpu_backend_responds(timeout_s: float = 600.0) -> bool:
    """Probe device init in a child process.

    The remote axon tunnel can wedge at backend init (observed in this
    environment: the chip claim hangs indefinitely while the tunnel is
    down).  ``import jax; jax.devices()`` in the parent would then hang
    the whole bench with no output; probing in a child bounds the wait so
    the harness always terminates and reports an honest backend."""
    import os
    import subprocess
    import sys

    if os.environ.get("JAX_PLATFORMS", "").strip().lower() == "cpu":
        return True  # explicitly CPU: nothing to probe
    try:
        proc = subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices(); print('ok')"],
            capture_output=True, timeout=timeout_s,
        )
        return proc.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def main() -> None:
    import os
    import sys

    if not _tpu_backend_responds(
        float(os.environ.get("PROTOCLIP_BENCH_PROBE_TIMEOUT", "600"))
    ):
        print(
            "[bench] device backend did not initialize within the probe "
            "timeout (tunnel down?); falling back to the CPU debug run",
            file=sys.stderr,
        )
        os.environ["PALLAS_AXON_POOL_IPS"] = ""
        os.environ["JAX_PLATFORMS"] = "cpu"

    import jax

    # normalize like the probe above ('CPU'/' cpu' must pin too — otherwise
    # the probe is skipped but the config never pinned, and the bench lands
    # on the real TPU the user explicitly opted out of)
    if os.environ.get("JAX_PLATFORMS", "").strip().lower() == "cpu":
        jax.config.update("jax_platforms", "cpu")  # the plugin overrides env

    _enable_compilation_cache()
    backend = jax.default_backend()
    int8_ips = rn50_ips = vitl_ips = vitl_int8_ips = text_pps = None
    bundle_b16_ips = bundle_l14_ips = bundle_rn50_ips = None
    if backend == "cpu":
        # CI/debug fallback: tiny run so the harness still emits a line
        ips, step_s = bench_encode(batch=8, iters=2, inner=2)
    else:
        ips, step_s = bench_encode()
        # W8A8 serving mode ($PROTOCLIP_INT8): the headline configuration
        # (parity evidence in the module docstring).
        try:
            int8_ips, int8_step_s = bench_encode(int8=True)
        except Exception:
            int8_ips = None
        # breadth: the reference's default backbone and the FewSOL-198
        # deploy backbone (configs/master.yml:6, configs/fewsol_198.yml) —
        # guarded so a secondary failure never kills the headline line
        try:
            rn50_ips, _ = bench_encode("RN50")
        except Exception:
            rn50_ips = None
        try:
            vitl_ips, _ = bench_encode("ViT-L/14", batch=128, inner=12)
        except Exception:
            vitl_ips = None
        try:
            vitl_int8_ips, _ = bench_encode("ViT-L/14", batch=128, inner=12, int8=True)
        except Exception:
            vitl_int8_ips = None
        try:
            text_pps = bench_text_encode()
        except Exception:
            text_pps = None
        # deployment artifacts: the AOT bundles for the flagship serving
        # point (ViT-B/16 int8) and the FewSOL-198 deploy backbone
        # (ViT-L/14, configs/fewsol_198.yml)
        try:
            bundle_b16_ips = bench_bundle("ViT-B/16", batch=256, int8=True)
        except Exception:
            bundle_b16_ips = None
        try:
            bundle_l14_ips = bench_bundle("ViT-L/14", batch=128, int8=True)
        except Exception:
            bundle_l14_ips = None
        # the reference's default backbone (configs/master.yml:6) through
        # the same StableHLO export: the conv path (NHWC convs, folded BN,
        # attention pool) must survive serialize -> reload too.  bf16 —
        # RN50 int8 measured no faster than bf16 (BASELINE.md)
        try:
            bundle_rn50_ips = bench_bundle("RN50", batch=256, int8=False)
        except Exception:
            bundle_rn50_ips = None
    overhead_s = measure_dispatch_overhead()

    headline = ips if int8_ips is None or int8_ips < ips else int8_ips
    mode = "bf16" if headline is ips else "int8_w8a8_serving"
    details = {
        "backend": backend,
        "device": str(jax.devices()[0]),
        "headline_mode": mode,
        "bf16_images_per_sec": round(ips, 1),
        "bf16_vs_baseline": round(ips / BASELINE_IMAGES_PER_SEC, 3),
        "step_seconds": step_s,
        "dispatch_overhead_seconds": overhead_s,
        "backbone": "ViT-B/16",
        "batch": 512 if backend != "cpu" else 8,
        "inner_iterations_per_dispatch": 20 if backend != "cpu" else 2,
    }
    if int8_ips is not None:
        details["int8_images_per_sec"] = round(int8_ips, 1)
        details["int8_vs_baseline"] = round(int8_ips / BASELINE_IMAGES_PER_SEC, 3)
        details["int8_step_seconds"] = int8_step_s
    if rn50_ips is not None:
        details["rn50_images_per_sec"] = round(rn50_ips, 1)
    if vitl_ips is not None:
        details["vit_l14_images_per_sec"] = round(vitl_ips, 1)
    if vitl_int8_ips is not None:
        details["vit_l14_int8_images_per_sec"] = round(vitl_int8_ips, 1)
    if text_pps is not None:
        details["text_encode_prompts_per_sec"] = round(text_pps, 1)
    if bundle_b16_ips is not None:
        details["bundle_vit_b16_int8_images_per_sec"] = round(bundle_b16_ips, 1)
    if bundle_l14_ips is not None:
        details["bundle_vit_l14_int8_images_per_sec"] = round(bundle_l14_ips, 1)
    if bundle_rn50_ips is not None:
        details["bundle_rn50_images_per_sec"] = round(bundle_rn50_ips, 1)

    regressions = {}
    if backend != "cpu":
        # a metric that FAILED to run (None) on real hardware is itself a
        # regression, not a pass — record it as null under its floor
        for key, floor in PERF_FLOORS.items():
            value = details.get(key)
            if value is None or value < floor:
                regressions[key] = {"value": value, "floor": floor}
        details["perf_floors"] = PERF_FLOORS
        details["regressions"] = regressions
    with open("bench_details.json", "w") as fh:
        json.dump(details, fh, indent=2)

    line = {
        "metric": "vit_b16_encode_images_per_sec_per_chip",
        "value": round(headline, 1),
        "unit": f"images/sec ({mode})",
        "vs_baseline": round(headline / BASELINE_IMAGES_PER_SEC, 3),
    }
    if regressions:
        line["regression"] = True
        line["regression_detail"] = {
            key: f"{info['value']} < floor {info['floor']}"
            for key, info in regressions.items()
        }
    if backend == "cpu":
        # self-describing: a recorded CPU number must never read as a TPU
        # regression (the tunnel to the shared chip can be down)
        line["note"] = (
            "CPU debug fallback (TPU backend unavailable); last validated "
            "TPU numbers are in BASELINE.md / bench_details.json history"
        )
    print(json.dumps(line))


if __name__ == "__main__":
    main()
