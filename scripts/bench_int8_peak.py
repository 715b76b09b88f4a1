"""Measure the chip's achievable int8 MXU peak (XLA path, amortized).

Companion to the 180 TFLOP/s bf16 peak measurement in BASELINE.md: times a
scan of large int8 x int8 -> int32 matmuls (inputs perturbed per step so XLA
cannot CSE) and reports effective TOP/s.  This bounds what any W8A8 kernel
can reach — if XLA/Mosaic only drive the int8 MXU path at ~1x bf16 rate at
some shape, that is the floor's explanation, not kernel inefficiency.

Usage: python scripts/bench_int8_peak.py [N] [steps]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 20

    from protoclip_tpu.obs.profiler import enable_compilation_cache

    enable_compilation_cache()

    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.integers(-127, 128, (n, n)), jnp.int8)
    b = jnp.asarray(rng.integers(-127, 128, (n, n)), jnp.int8)

    def run(dtype_in, acc_dtype, tag):
        aa = a.astype(dtype_in)
        bb = b.astype(dtype_in)

        @jax.jit
        def f(aa, bb):
            def body(carry, i):
                # perturb one operand per step so XLA cannot CSE the matmul
                x = jax.lax.dynamic_update_slice(
                    carry, (carry[:1, :1] + 1).astype(carry.dtype), (0, 0)
                )
                out = jax.lax.dot_general(
                    x, bb, (((1,), (0,)), ((), ())),
                    preferred_element_type=acc_dtype,
                )
                # consume the WHOLE product: reducing only one element lets
                # XLA dead-code the matmul down to a single dot (first
                # version of this probe "measured" 900 Tops/s that way)
                return x, jnp.sum(out.astype(jnp.float32))
            _, outs = jax.lax.scan(body, aa, jnp.arange(steps))
            return jnp.sum(outs)

        t0 = time.perf_counter()
        cs = float(np.asarray(f(aa, bb)))
        compile_s = time.perf_counter() - t0
        times = []
        for _ in range(6):
            start = time.perf_counter()
            np.asarray(f(aa, bb))
            times.append(time.perf_counter() - start)
        best = min(times)
        flops = 2.0 * n * n * n * steps
        print(
            f"{tag}: {best*1000:.1f} ms/{steps}x{n}^3 -> "
            f"{flops/best/1e12:.1f} Tops/s (checksum {cs:.1f}, compile {compile_s:.0f}s)",
            flush=True,
        )

    run(jnp.int8, jnp.int32, "int8->int32")
    run(jnp.bfloat16, jnp.float32, "bf16->fp32")


if __name__ == "__main__":
    main()
