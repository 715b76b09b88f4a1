"""Can an int8 matmul reformulation beat XLA's bf16 convs at RN50 shapes?

BASELINE.md (round 2) measured XLA's `conv_general_dilated` with int8
operands at exactly 1.00x the bf16 conv — the TPU conv lowering does not
engage the int8 MXU double rate.  But the chip's int8 *matmul* path was
separately measured at 265 TOP/s vs 154 bf16 (scripts/bench_int8_peak.py).
This probe asks whether rewriting RN50's convs as matmuls recovers that
rate at the network's actual hot shapes, with ALL quantization overhead
included:

- 1x1 convs ARE matmuls: reshape NHWC -> (B*H*W, Cin), per-row dynamic
  activation quant (amax/round/clip/cast, the scheme the ViT serving
  kernel uses), int8 x int8 -> int32, rescale.
- 3x3 convs via im2col: `lax.conv_general_dilated_patches` on the already
  -quantized int8 activations -> (B*H*W, 9*Cin) @ (9*Cin, Cout).  Patch
  extraction is pure data movement (VPU/copy), paid at 1-byte width.

Timed per RN50 stage shape (B=256 default) and for a whole bottleneck
block, with the usual amortized-scan harness (inputs perturbed per step so
XLA cannot CSE; full product consumed so nothing dead-codes).

Usage: python scripts/bench_rn50_int8.py [batch] [steps]
"""

from __future__ import annotations

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp


def _quant_rows(x: jax.Array):
    """Per-row dynamic symmetric int8 quant of a (M, K) fp/bf16 array."""
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    scale = jnp.maximum(amax, 1e-6) / 127.0
    q = jnp.clip(jnp.round(xf / scale), -127, 127).astype(jnp.int8)
    return q, scale


def _quant_cols(w: jax.Array):
    """Per-output-channel weight quant of a (K, N) array (host-side in the
    real serving path; included here only for completeness of rescale)."""
    wf = w.astype(jnp.float32)
    amax = jnp.max(jnp.abs(wf), axis=0, keepdims=True)
    scale = jnp.maximum(amax, 1e-6) / 127.0
    q = jnp.clip(jnp.round(wf / scale), -127, 127).astype(jnp.int8)
    return q, scale


def _bench(fn, args, steps, tag, flops):
    f = jax.jit(fn)
    t0 = time.perf_counter()
    cs = float(np.asarray(f(*args)))
    compile_s = time.perf_counter() - t0
    times = []
    for _ in range(5):
        start = time.perf_counter()
        np.asarray(f(*args))
        times.append(time.perf_counter() - start)
    best = min(times)
    per_step_ms = best * 1000 / steps
    print(
        f"  {tag:42s} {per_step_ms:8.3f} ms/step  "
        f"{flops / (best / steps) / 1e12:7.1f} Top/s  "
        f"(compile {compile_s:.0f}s, checksum {cs:.3g})",
        flush=True,
    )
    return per_step_ms


def bench_shape(name, b, hw, cin, cout, ksize, steps):
    """Time one conv shape three ways: bf16 conv, int8 matmul, int8 conv."""
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((b, hw, hw, cin)), jnp.bfloat16)
    w = jnp.asarray(
        rng.standard_normal((ksize, ksize, cin, cout)) * (cin * ksize * ksize) ** -0.5,
        jnp.bfloat16,
    )
    pad = ksize // 2
    flops = 2.0 * b * hw * hw * cin * cout * ksize * ksize
    print(f"{name}: B={b} {hw}x{hw} {cin}->{cout} k={ksize} ({flops/1e9:.1f} GFLOP)")

    def perturb(x):
        return jax.lax.dynamic_update_slice(
            x, (x[:1, :1, :1, :1] + 1).astype(x.dtype), (0, 0, 0, 0)
        )

    def conv_bf16(x, w):
        def body(carry, _):
            xx = perturb(carry)
            out = jax.lax.conv_general_dilated(
                xx, w, (1, 1), [(pad, pad)] * 2,
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            return xx, jnp.sum(out.astype(jnp.float32))
        _, outs = jax.lax.scan(body, x, jnp.arange(steps))
        return jnp.sum(outs)

    t_bf16 = _bench(conv_bf16, (x, w), steps, "bf16 conv (XLA)", flops)

    wq, wscale = _quant_cols(w.reshape(-1, cout))

    def int8_matmul(x, wq, wscale):
        def body(carry, _):
            xx = perturb(carry)
            if ksize == 1:
                rows = xx.reshape(-1, cin)
            else:
                patches = jax.lax.conv_general_dilated_patches(
                    xx, (ksize, ksize), (1, 1), [(pad, pad)] * 2,
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                )
                rows = patches.reshape(-1, ksize * ksize * cin)
            q, ascale = _quant_rows(rows)
            acc = jax.lax.dot_general(
                q, wq, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
            )
            out = acc.astype(jnp.float32) * ascale * wscale
            return xx, jnp.sum(out)
        _, outs = jax.lax.scan(body, x, jnp.arange(steps))
        return jnp.sum(outs)

    t_i8mm = _bench(int8_matmul, (x, wq, wscale), steps, "int8 matmul (+quant+rescale)", flops)

    # int8 patches on PRE-quantized input: the fused-network case where the
    # previous op's epilogue already produced int8 (patch extraction at 1B).
    def int8_matmul_prequant(x, wq, wscale):
        q0, ascale0 = _quant_rows(x.reshape(-1, cin))
        q0 = q0.reshape(x.shape)

        def body(carry, _):
            xx = jax.lax.dynamic_update_slice(
                carry, (carry[:1, :1, :1, :1] + 1), (0, 0, 0, 0)
            )
            if ksize == 1:
                rows = xx.reshape(-1, cin)
            else:
                patches = jax.lax.conv_general_dilated_patches(
                    xx, (ksize, ksize), (1, 1), [(pad, pad)] * 2,
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                )
                rows = patches.reshape(-1, ksize * ksize * cin)
            acc = jax.lax.dot_general(
                rows, wq, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
            )
            out = acc.astype(jnp.float32) * wscale
            return xx, jnp.sum(out)
        _, outs = jax.lax.scan(body, q0, jnp.arange(steps))
        return jnp.sum(outs) * jnp.sum(ascale0[:1])
    t_i8pre = _bench(
        int8_matmul_prequant, (x, wq, wscale), steps, "int8 matmul (pre-quantized input)", flops
    )

    return {"bf16": t_bf16, "i8mm": t_i8mm, "i8pre": t_i8pre, "flops": flops}


def main():
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 20

    from protoclip_tpu.obs.profiler import enable_compilation_cache

    enable_compilation_cache()
    print(f"devices: {jax.devices()}")

    # RN50 hot shapes (width 64). Per-224px-image FLOP shares (total ~8.2
    # GFLOP w/o attnpool): layer1 19%, layer2 21%, layer3 31%, layer4 21%,
    # stem 8%. conv2 of a stride-2 block runs at the PRE-pool resolution.
    shapes = [
        ("layer3.conv1 1x1", b, 14, 1024, 256, 1),
        ("layer3.conv2 3x3", b, 14, 256, 256, 3),
        ("layer3.conv3 1x1", b, 14, 256, 1024, 1),
        ("layer2.conv2 3x3", b, 28, 128, 128, 3),
        ("layer4.conv2 3x3", b, 7, 512, 512, 3),
        ("layer1.conv2 3x3", b, 56, 64, 64, 3),
        ("layer1.conv3 1x1", b, 56, 64, 256, 1),
    ]
    results = {}
    for name, bb, hw, cin, cout, k in shapes:
        results[name] = bench_shape(name, bb, hw, cin, cout, k, steps)

    tot_bf16 = sum(r["bf16"] for r in results.values())
    tot_pre = sum(r["i8pre"] for r in results.values())
    tot_dyn = sum(r["i8mm"] for r in results.values())
    print(
        f"\nsum over probed shapes: bf16 {tot_bf16:.2f} ms | int8 dyn-quant "
        f"{tot_dyn:.2f} ms ({tot_bf16/tot_dyn:.2f}x) | int8 pre-quant "
        f"{tot_pre:.2f} ms ({tot_bf16/tot_pre:.2f}x)"
    )


if __name__ == "__main__":
    main()
