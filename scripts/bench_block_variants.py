"""Measure fused-block kernel variants on the real TPU chip.

Usage: python scripts/bench_block_variants.py v0 v1 v2 ...

Times a 12-layer ViT-B/16-geometry stack (B=512, Lp=200, D=768, H=12) per
variant via scalar-checksum fetch (axon tunnel: block_until_ready does not
await remote execution).  Variants are self-contained copies of the block
kernel so the production kernel stays untouched until a winner is ported.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B, L, D, H, LAYERS = 512, 197, 768, 12, 12
if __import__("os").environ.get("BENCH_GEOM") == "vitl":
    # ViT-L/14 geometry (serving batch 128, 24 layers; 12 timed here —
    # scale ideals accordingly)
    B, L, D, H = 128, 257, 1024, 16
LP = -(-L // 8) * 8
if __import__("os").environ.get("BENCH_LP16"):
    LP = -(-L // 16) * 16  # bf16 sublane-aligned padding experiment
DH = D // H
G = 16


def _enable_cache():
    from protoclip_tpu.obs.profiler import enable_compilation_cache

    enable_compilation_cache()


def _ln(v, scale_ref, bias_ref, dtype, eps=1e-5):
    vf = v.astype(jnp.float32)
    mean = jnp.mean(vf, axis=-1, keepdims=True)
    c = vf - mean
    var = jnp.mean(c * c, axis=-1, keepdims=True)
    normed = c * jax.lax.rsqrt(var + eps)
    return (
        normed * scale_ref[...].astype(jnp.float32) + bias_ref[...].astype(jnp.float32)
    ).astype(dtype)


def _mask(g, lp, length):
    col = jax.lax.broadcasted_iota(jnp.int32, (g, lp, lp), 2)
    return col >= length


def make_kernel(variant: str, n_head: int, length: int):
    score_bf16 = variant in ("v1", "v2", "v3", "v4", "v5", "v6", "v6g8", "v2g8", "v2g32")
    gelu_bf16 = variant in ("v2", "v3", "v4", "v2g8", "v2g32")
    chunked_mlp = variant == "v3"
    batched_heads = variant == "v4"
    transposed_heads = variant == "v5"
    sliced_heads = variant in ("v6", "v6g8")
    pipelined_heads = variant == "v7"
    folded_ln = variant == "v10"  # LN affine folded into wqkv/wfc on the host

    def kernel(
        x_ref, wqkv_ref, bqkv_ref, wo_ref, bo_ref,
        ln1s_ref, ln1b_ref, ln2s_ref, ln2b_ref,
        wfc_ref, bfc_ref, wproj_ref, bproj_ref, out_ref,
    ):
        x = x_ref[...]
        g, lp, d = x.shape
        dh = d // n_head
        dtype = x.dtype

        def ln_noaffine(v, eps=1e-5):
            vf = v.astype(jnp.float32)
            mean = jnp.mean(vf, axis=-1, keepdims=True)
            c = vf - mean
            var = jnp.mean(c * c, axis=-1, keepdims=True)
            return (c * jax.lax.rsqrt(var + eps)).astype(dtype)

        if folded_ln:
            h1 = ln_noaffine(x).reshape(g * lp, d)
        else:
            h1 = _ln(x, ln1s_ref, ln1b_ref, dtype).reshape(g * lp, d)
        qkv_pet = dtype if variant == "v9" else jnp.float32
        qkv = (
            jax.lax.dot_general(
                h1, wqkv_ref[...], (((1,), (0,)), ((), ())),
                preferred_element_type=qkv_pet,
            ).astype(dtype)
            + bqkv_ref[...].astype(dtype)
        ).reshape(g, lp, 3 * d)

        mask = _mask(g, lp, length)
        scale = dh ** -0.5

        if sliced_heads:
            # one (g*H) batch dim built with lane-slices + sublane concat
            # (Mosaic rejects the 4-D reshape/transpose route)
            qb = jnp.concatenate(
                [qkv[:, :, h * dh : (h + 1) * dh] for h in range(n_head)], axis=0
            )
            kb = jnp.concatenate(
                [qkv[:, :, d + h * dh : d + (h + 1) * dh] for h in range(n_head)],
                axis=0,
            )
            vb = jnp.concatenate(
                [qkv[:, :, 2 * d + h * dh : 2 * d + (h + 1) * dh] for h in range(n_head)],
                axis=0,
            )
            s = jax.lax.dot_general(
                qb * scale, kb, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )  # (g*H, lp, lp)
            colb = jax.lax.broadcasted_iota(jnp.int32, s.shape, 2)
            s = jnp.where(colb >= length, -1e30, s)
            s = s - jnp.max(s, axis=-1, keepdims=True)
            e = jnp.exp(s)
            w = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(dtype)
            o = jax.lax.dot_general(
                w, vb, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            ).astype(dtype)  # (g*H, lp, dh)
            attn = jnp.concatenate(
                [o[h * g : (h + 1) * g] for h in range(n_head)], axis=-1
            )
        elif transposed_heads:
            # fold (g, head) into ONE batch dim (Mosaic matmul limit) via an
            # in-VMEM transpose; scores/weights become 2 large batched dots
            q4 = qkv[:, :, :d].reshape(g, lp, n_head, dh)
            k4 = qkv[:, :, d : 2 * d].reshape(g, lp, n_head, dh)
            v4 = qkv[:, :, 2 * d :].reshape(g, lp, n_head, dh)
            qb = q4.transpose(0, 2, 1, 3).reshape(g * n_head, lp, dh)
            kb = k4.transpose(0, 2, 1, 3).reshape(g * n_head, lp, dh)
            vb = v4.transpose(0, 2, 1, 3).reshape(g * n_head, lp, dh)
            s = jax.lax.dot_general(
                qb * scale, kb, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )  # (g*H, lp, lp)
            colb = jax.lax.broadcasted_iota(jnp.int32, s.shape, 2)
            s = jnp.where(colb >= length, -1e30, s)
            s = s - jnp.max(s, axis=-1, keepdims=True)
            e = jnp.exp(s)
            w = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(dtype)
            o = jax.lax.dot_general(
                w, vb, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )  # (g*H, lp, dh)
            attn = (
                o.astype(dtype)
                .reshape(g, n_head, lp, dh)
                .transpose(0, 2, 1, 3)
                .reshape(g, lp, d)
            )
        elif batched_heads:
            q4 = qkv[:, :, :d].reshape(g, lp, n_head, dh)
            k4 = qkv[:, :, d : 2 * d].reshape(g, lp, n_head, dh)
            v4 = qkv[:, :, 2 * d :].reshape(g, lp, n_head, dh)
            s = jax.lax.dot_general(
                (q4.astype(jnp.float32) * scale) if not score_bf16 else q4 * scale,
                k4,
                (((3,), (3,)), ((0, 2), (0, 2))),
                preferred_element_type=jnp.float32,
            )  # (g, H, lp, lp)
            s = jnp.where(mask[:, None], -1e30, s)
            s = s - jnp.max(s, axis=-1, keepdims=True)
            e = jnp.exp(s)
            w = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(dtype)
            o = jax.lax.dot_general(
                w, v4, (((3,), (1,)), ((0, 1), (0, 2))),
                preferred_element_type=jnp.float32,
            )  # (g, H, lp, dh)
            attn = o.astype(dtype).transpose(0, 2, 1, 3).reshape(g, lp, d)
        elif pipelined_heads:
            # software-pipeline the per-head loop: issue head h+1's score
            # matmul (MXU) before head h's softmax (VPU) so Mosaic's
            # scheduler can overlap the two units
            def score(h):
                qh = qkv[:, :, h * dh : (h + 1) * dh].astype(jnp.float32) * scale
                kh = qkv[:, :, d + h * dh : d + (h + 1) * dh].astype(jnp.float32)
                return jax.lax.dot_general(
                    qh, kh, (((2,), (2,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32,
                )

            head_outs = []
            s_cur = score(0)
            for h in range(n_head):
                s_next = score(h + 1) if h + 1 < n_head else None
                s = jnp.where(mask, -1e30, s_cur)
                s = s - jnp.max(s, axis=-1, keepdims=True)
                e = jnp.exp(s)
                w = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(dtype)
                vh = qkv[:, :, 2 * d + h * dh : 2 * d + (h + 1) * dh]
                o = jax.lax.dot_general(
                    w, vh, (((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32,
                )
                head_outs.append(o.astype(dtype))
                s_cur = s_next
            attn = jnp.concatenate(head_outs, axis=-1)
        else:
            head_outs = []
            for h in range(n_head):
                if score_bf16:
                    qh = qkv[:, :, h * dh : (h + 1) * dh] * scale
                    kh = qkv[:, :, d + h * dh : d + (h + 1) * dh]
                else:
                    qh = qkv[:, :, h * dh : (h + 1) * dh].astype(jnp.float32) * scale
                    kh = qkv[:, :, d + h * dh : d + (h + 1) * dh].astype(jnp.float32)
                vh = qkv[:, :, 2 * d + h * dh : 2 * d + (h + 1) * dh]
                s = jax.lax.dot_general(
                    qh, kh, (((2,), (2,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32,
                )
                s = jnp.where(mask, -1e30, s)
                s = s - jnp.max(s, axis=-1, keepdims=True)
                e = jnp.exp(s)
                w = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(dtype)
                o = jax.lax.dot_general(
                    w, vh, (((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32,
                )
                head_outs.append(o.astype(dtype))
            attn = jnp.concatenate(head_outs, axis=-1)

        proj = (
            jax.lax.dot_general(
                attn.reshape(g * lp, d), wo_ref[...], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(dtype)
            + bo_ref[...].astype(dtype)
        ).reshape(g, lp, d)
        x = x + proj

        if folded_ln:
            h2 = ln_noaffine(x).reshape(g * lp, d)
        else:
            h2 = _ln(x, ln2s_ref, ln2b_ref, dtype).reshape(g * lp, d)
        if chunked_mlp:
            n_chunks = 4
            cw = (4 * d) // n_chunks
            acc = jnp.zeros((g * lp, d), jnp.float32)
            for c in range(n_chunks):
                hid = jax.lax.dot_general(
                    h2, wfc_ref[:, c * cw : (c + 1) * cw], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                hid = hid + bfc_ref[c * cw : (c + 1) * cw].astype(jnp.float32)
                if gelu_bf16:
                    hb = hid.astype(dtype)
                    hid = hb * (1.0 / (1.0 + jnp.exp(-(hb * 1.702))))
                else:
                    hid = (hid * jax.nn.sigmoid(1.702 * hid)).astype(dtype)
                acc = acc + jax.lax.dot_general(
                    hid.astype(dtype), wproj_ref[c * cw : (c + 1) * cw, :],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            mlp_out = (acc.astype(dtype) + bproj_ref[...].astype(dtype)).reshape(g, lp, d)
        else:
            hid = jax.lax.dot_general(
                h2, wfc_ref[...], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            if gelu_bf16:
                hidb = (hid + bfc_ref[...].astype(jnp.float32)).astype(dtype)
                hidb = hidb * (1.0 / (1.0 + jnp.exp(-(hidb * 1.702))))
            else:
                hidf = hid + bfc_ref[...].astype(jnp.float32)
                hidb = (hidf * jax.nn.sigmoid(1.702 * hidf)).astype(dtype)
            mlp_out = (
                jax.lax.dot_general(
                    hidb, wproj_ref[...], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ).astype(dtype)
                + bproj_ref[...].astype(dtype)
            ).reshape(g, lp, d)
        out_ref[...] = x + mlp_out

    return kernel


def build_stack_fn(variant: str, g: int):
    kernel = make_kernel(variant, H, L)
    vm = pltpu.VMEM
    x_spec = pl.BlockSpec((g, LP, D), lambda i: (i, 0, 0), memory_space=vm)

    def w_spec(shape):
        return pl.BlockSpec(shape, lambda i: (0,) * len(shape), memory_space=vm)

    wshapes = [
        (D, 3 * D), (3 * D,), (D, D), (D,), (D,), (D,), (D,), (D,),
        (D, 4 * D), (4 * D,), (4 * D, D), (D,),
    ]

    def block(x, weights):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((B, LP, D), x.dtype),
            grid=(B // g,),
            in_specs=[x_spec] + [w_spec(s) for s in wshapes],
            out_specs=x_spec,
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        )(x, *weights)

    @jax.jit
    def stack(x, stacked_weights):
        def body(carry, ws):
            return block(carry, ws), None

        out, _ = jax.lax.scan(body, x, stacked_weights)
        return jnp.sum(out.astype(jnp.float32))

    return stack


def make_weights(rng):
    def r(*shape, std=0.02, dt=jnp.bfloat16):
        return jnp.asarray(rng.standard_normal((LAYERS,) + shape) * std, dt)

    return (
        r(D, 3 * D), r(3 * D), r(D, D), r(D),
        r(D, dt=jnp.float32), r(D, dt=jnp.float32),
        r(D, dt=jnp.float32), r(D, dt=jnp.float32),
        r(D, 4 * D), r(4 * D), r(4 * D, D), r(D),
    )


def fold_ln_into_weights(weights):
    """Fold the LN affine (scale s, bias b) into the following matmul:
    (norm(x)*s + b) @ W + c == norm(x) @ (s[:,None]*W) + (b @ W + c)."""
    (wqkv, bqkv, wo, bo, ln1s, ln1b, ln2s, ln2b, wfc, bfc, wproj, bproj) = weights
    f32 = jnp.float32
    wqkv32, wfc32 = wqkv.astype(f32), wfc.astype(f32)
    wqkv_f = (ln1s[:, :, None] * wqkv32).astype(wqkv.dtype)
    bqkv_f = (
        bqkv.astype(f32) + jnp.einsum("li,lio->lo", ln1b, wqkv32)
    ).astype(bqkv.dtype)
    wfc_f = (ln2s[:, :, None] * wfc32).astype(wfc.dtype)
    bfc_f = (bfc.astype(f32) + jnp.einsum("li,lio->lo", ln2b, wfc32)).astype(bfc.dtype)
    return (wqkv_f, bqkv_f, wo, bo, ln1s, ln1b, ln2s, ln2b, wfc_f, bfc_f, wproj, bproj)


def main():
    _enable_cache()
    variants = sys.argv[1:] or ["v0", "v1", "v2"]
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, LP, D)) * 0.1, jnp.bfloat16)
    weights = make_weights(rng)
    # weight layout note: ln scales/biases fp32 like production
    for variant in variants:
        if variant.startswith("micro:"):
            bench_micro(variant.split(":", 1)[1])
            continue
        if variant.startswith("int8"):
            spec = variant[len("int8"):]
            quant_mode = "dyn"
            if "recip" in spec:
                quant_mode = "recip"
            elif "cast" in spec:
                quant_mode = "cast"
            bench_int8(
                g=32 if "g32" in spec else (8 if "g8" in spec else 16),
                quant_hid="h" not in spec.replace("g32", "").replace("g8", "").replace(
                    "noattn", ""
                ).replace("gb", "").replace("recip", "").replace("cast", "").replace("lnb", ""),
                skip_attn="noattn" in spec,
                quant_scores=variant.startswith("int8s") and "static" not in spec,
                gelu_bf16="gb" in spec,
                static_scales="static" in spec,
                quant_mode=quant_mode,
                ln_stats_bf16="lnb" in spec,
                tag=variant,
            )
            continue
        g = {"v2g8": 8, "v2g32": 32, "v6g8": 8}.get(variant, G)
        if variant == "v10":
            weights = fold_ln_into_weights(weights)
        fn = build_stack_fn(variant, g)
        t0 = time.perf_counter()
        cs = float(np.asarray(fn(x, weights)))
        compile_s = time.perf_counter() - t0
        times = []
        for _ in range(8):
            start = time.perf_counter()
            np.asarray(fn(x, weights))
            times.append(time.perf_counter() - start)
        best = min(times)
        print(
            f"{variant}: {best*1000:.1f} ms/12-block-stack  "
            f"(checksum {cs:.2f}, compile {compile_s:.0f}s, g={g})",
            flush=True,
        )




# ---------------------------------------------------------------------------
# decomposition micro-benches: where does the non-ideal time live?
# ---------------------------------------------------------------------------

def bench_micro(which: str):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, LP, D)) * 0.1, jnp.bfloat16)

    if which == "mlp_xla":
        wfc = jnp.asarray(rng.standard_normal((LAYERS, D, 4 * D)) * 0.02, jnp.bfloat16)
        bfc = jnp.zeros((LAYERS, 4 * D), jnp.bfloat16)
        wproj = jnp.asarray(rng.standard_normal((LAYERS, 4 * D, D)) * 0.02, jnp.bfloat16)
        bproj = jnp.zeros((LAYERS, D), jnp.bfloat16)

        @jax.jit
        def fn(x, wfc, bfc, wproj, bproj):
            def body(carry, ws):
                wf, bf, wp, bp = ws
                h = carry.reshape(B * LP, D) @ wf + bf
                h = h * jax.nn.sigmoid(1.702 * h)
                return (carry + (h @ wp + bp).reshape(B, LP, D)), None

            out, _ = jax.lax.scan(body, x, (wfc, bfc, wproj, bproj))
            return jnp.sum(out.astype(jnp.float32))

        args = (x, wfc, bfc, wproj, bproj)

    elif which == "mlp_pallas":
        wfc = jnp.asarray(rng.standard_normal((LAYERS, D, 4 * D)) * 0.02, jnp.bfloat16)
        bfc = jnp.zeros((LAYERS, 4 * D), jnp.bfloat16)
        wproj = jnp.asarray(rng.standard_normal((LAYERS, 4 * D, D)) * 0.02, jnp.bfloat16)
        bproj = jnp.zeros((LAYERS, D), jnp.bfloat16)
        g = G
        vm = pltpu.VMEM
        x_spec = pl.BlockSpec((g, LP, D), lambda i: (i, 0, 0), memory_space=vm)

        def w_spec(shape):
            return pl.BlockSpec(shape, lambda i: (0,) * len(shape), memory_space=vm)

        def kernel(x_ref, wfc_ref, bfc_ref, wproj_ref, bproj_ref, out_ref):
            xx = x_ref[...]
            g_, lp, d = xx.shape
            dtype = xx.dtype
            h = jax.lax.dot_general(
                xx.reshape(g_ * lp, d), wfc_ref[...], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            h = (h + bfc_ref[...].astype(jnp.float32)).astype(dtype)
            # manual sigmoid: lax.logistic's bf16 Mosaic lowering is broken
            h = h * (1.0 / (1.0 + jnp.exp(-(h * 1.702))))
            o = jax.lax.dot_general(
                h, wproj_ref[...], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(dtype) + bproj_ref[...].astype(dtype)
            out_ref[...] = xx + o.reshape(g_, lp, d)

        def block(xc, ws):
            return pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct((B, LP, D), xc.dtype),
                grid=(B // g,),
                in_specs=[x_spec, w_spec((D, 4 * D)), w_spec((4 * D,)),
                          w_spec((4 * D, D)), w_spec((D,))],
                out_specs=x_spec,
                compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
            )(xc, *ws)

        @jax.jit
        def fn(x, wfc, bfc, wproj, bproj):
            def body(carry, ws):
                return block(carry, ws), None

            out, _ = jax.lax.scan(body, x, (wfc, bfc, wproj, bproj))
            return jnp.sum(out.astype(jnp.float32))

        args = (x, wfc, bfc, wproj, bproj)

    elif which in ("int8mlp", "int8mlp_nogelu", "int8mlp_fp32gelu"):
        # int8 MLP half in isolation: LN + quant + fc(int8) + QuickGELU +
        # quant + down-proj(int8) + residual.  _nogelu swaps the GELU for a
        # copy (bounds its VPU share); _fp32gelu is the production fp32 one
        # while the default tries GELU on the bf16 cast.
        wfc = jnp.asarray(rng.standard_normal((LAYERS, D, 4 * D)) * 0.02, jnp.bfloat16)
        bfc = jnp.zeros((LAYERS, 4 * D), jnp.float32)
        wproj = jnp.asarray(rng.standard_normal((LAYERS, 4 * D, D)) * 0.02, jnp.bfloat16)
        bproj = jnp.zeros((LAYERS, D), jnp.float32)
        ln2s = jnp.ones((LAYERS, D), jnp.float32)
        ln2b = jnp.zeros((LAYERS, D), jnp.float32)

        def qs(w):
            qq, ss = zip(*[_quant_cols_host(w[i]) for i in range(LAYERS)])
            return jnp.stack(qq), jnp.stack(ss)

        wfc_q, sfc = qs(wfc)
        wproj_q, sproj = qs(wproj)
        g = G
        vm = pltpu.VMEM
        x_spec = pl.BlockSpec((g, LP, D), lambda i: (i, 0, 0), memory_space=vm)

        def w_spec(shape):
            return pl.BlockSpec(shape, lambda i: (0,) * len(shape), memory_space=vm)

        mode = which.removeprefix("int8mlp_") if "_" in which else "bf16gelu"

        def kernel(x_ref, wfc_ref, sfc_ref, bfc_ref, wproj_ref, sproj_ref,
                   bproj_ref, ln2s_ref, ln2b_ref, out_ref):
            xx = x_ref[...]
            g_, lp, d = xx.shape
            dtype = xx.dtype
            h2 = _ln(xx, ln2s_ref, ln2b_ref, jnp.float32).reshape(g_ * lp, d)
            h2_q, h2_s = _quant_rows(h2)
            hid = _int8_matmul(h2_q, h2_s, wfc_ref[...], sfc_ref[...]) + bfc_ref[...]
            if mode == "nogelu":
                pass  # bound: GELU removed entirely
            elif mode == "fp32gelu":
                hid = hid * jax.nn.sigmoid(1.702 * hid)
            else:  # bf16gelu
                hb = hid.astype(dtype)
                hid = (hb * (1.0 / (1.0 + jnp.exp(-(hb * 1.702))))).astype(jnp.float32)
            hid_q, hid_s = _quant_rows(hid)
            o = _int8_matmul(hid_q, hid_s, wproj_ref[...], sproj_ref[...]) + bproj_ref[...]
            out_ref[...] = xx + o.astype(dtype).reshape(g_, lp, d)

        def block(xc, ws):
            return pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct((B, LP, D), xc.dtype),
                grid=(B // g,),
                in_specs=[x_spec, w_spec((D, 4 * D)), w_spec((1, 4 * D)),
                          w_spec((4 * D,)), w_spec((4 * D, D)), w_spec((1, D)),
                          w_spec((D,)), w_spec((D,)), w_spec((D,))],
                out_specs=x_spec,
                compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
            )(xc, *ws)

        @jax.jit
        def fn(x, *stacked):
            def body(carry, ws):
                return block(carry, ws), None

            out, _ = jax.lax.scan(body, x, stacked)
            return jnp.sum(out.astype(jnp.float32))

        args = (x, wfc_q, sfc, bfc, wproj_q, sproj, bproj, ln2s, ln2b)

    elif which == "int8qkv":
        # int8 QKV + out-proj half in isolation (attention replaced by
        # q+k+v sum): LN + quant + qkv(int8) + quant + proj(int8) + residual
        wqkv = jnp.asarray(rng.standard_normal((LAYERS, D, 3 * D)) * 0.02, jnp.bfloat16)
        bqkv = jnp.zeros((LAYERS, 3 * D), jnp.float32)
        wo = jnp.asarray(rng.standard_normal((LAYERS, D, D)) * 0.02, jnp.bfloat16)
        bo = jnp.zeros((LAYERS, D), jnp.float32)
        ln1s = jnp.ones((LAYERS, D), jnp.float32)
        ln1b = jnp.zeros((LAYERS, D), jnp.float32)

        def qs2(w):
            qq, ss = zip(*[_quant_cols_host(w[i]) for i in range(LAYERS)])
            return jnp.stack(qq), jnp.stack(ss)

        wqkv_q, sqkv = qs2(wqkv)
        wo_q, so = qs2(wo)
        g = G
        vm = pltpu.VMEM
        x_spec = pl.BlockSpec((g, LP, D), lambda i: (i, 0, 0), memory_space=vm)

        def w_spec(shape):
            return pl.BlockSpec(shape, lambda i: (0,) * len(shape), memory_space=vm)

        def kernel(x_ref, wqkv_ref, sqkv_ref, bqkv_ref, wo_ref, so_ref,
                   bo_ref, ln1s_ref, ln1b_ref, out_ref):
            xx = x_ref[...]
            g_, lp, d = xx.shape
            dtype = xx.dtype
            h1 = _ln(xx, ln1s_ref, ln1b_ref, jnp.float32).reshape(g_ * lp, d)
            h1_q, h1_s = _quant_rows(h1)
            qkv = (
                _int8_matmul(h1_q, h1_s, wqkv_ref[...], sqkv_ref[...]) + bqkv_ref[...]
            ).astype(dtype).reshape(g_, lp, 3 * d)
            attn = qkv[:, :, :d] + qkv[:, :, d : 2 * d] + qkv[:, :, 2 * d :]
            a_q, a_s = _quant_rows(attn.reshape(g_ * lp, d))
            proj = _int8_matmul(a_q, a_s, wo_ref[...], so_ref[...]) + bo_ref[...]
            out_ref[...] = xx + proj.astype(dtype).reshape(g_, lp, d)

        def block(xc, ws):
            return pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct((B, LP, D), xc.dtype),
                grid=(B // g,),
                in_specs=[x_spec, w_spec((D, 3 * D)), w_spec((1, 3 * D)),
                          w_spec((3 * D,)), w_spec((D, D)), w_spec((1, D)),
                          w_spec((D,)), w_spec((D,)), w_spec((D,))],
                out_specs=x_spec,
                compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
            )(xc, *ws)

        @jax.jit
        def fn(x, *stacked):
            def body(carry, ws):
                return block(carry, ws), None

            out, _ = jax.lax.scan(body, x, stacked)
            return jnp.sum(out.astype(jnp.float32))

        args = (x, wqkv_q, sqkv, bqkv, wo_q, so, bo, ln1s, ln1b)

    elif which.split("@")[0] in ("attn_pallas", "attn_nosm", "attn_noqkv"):
        base, _, gs = which.partition("@")
        skip_softmax = base == "attn_nosm"
        skip_attn = base == "attn_noqkv"
        # LN1 + QKV + attention + proj + residual (no MLP)
        wqkv = jnp.asarray(rng.standard_normal((LAYERS, D, 3 * D)) * 0.02, jnp.bfloat16)
        bqkv = jnp.zeros((LAYERS, 3 * D), jnp.bfloat16)
        wo = jnp.asarray(rng.standard_normal((LAYERS, D, D)) * 0.02, jnp.bfloat16)
        bo = jnp.zeros((LAYERS, D), jnp.bfloat16)
        ln1s = jnp.ones((LAYERS, D), jnp.float32)
        ln1b = jnp.zeros((LAYERS, D), jnp.float32)
        g = int(gs) if gs else G
        vm = pltpu.VMEM
        x_spec = pl.BlockSpec((g, LP, D), lambda i: (i, 0, 0), memory_space=vm)

        def w_spec(shape):
            return pl.BlockSpec(shape, lambda i: (0,) * len(shape), memory_space=vm)

        def kernel(x_ref, wqkv_ref, bqkv_ref, wo_ref, bo_ref, s_ref, b_ref, out_ref):
            xx = x_ref[...]
            g_, lp, d = xx.shape
            dh = d // H
            dtype = xx.dtype
            h1 = _ln(xx, s_ref, b_ref, dtype).reshape(g_ * lp, d)
            qkv = (
                jax.lax.dot_general(
                    h1, wqkv_ref[...], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ).astype(dtype)
                + bqkv_ref[...].astype(dtype)
            ).reshape(g_, lp, 3 * d)
            mask = _mask(g_, lp, L)
            scale = dh ** -0.5
            if skip_attn:
                # QKV + proj only; sum q+k+v so no projection is DCE'd
                attn = qkv[:, :, :d] + qkv[:, :, d : 2 * d] + qkv[:, :, 2 * d :]
                proj = (
                    jax.lax.dot_general(
                        attn.reshape(g_ * lp, d), wo_ref[...], (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    ).astype(dtype)
                    + bo_ref[...].astype(dtype)
                ).reshape(g_, lp, d)
                out_ref[...] = xx + proj
                return
            outs = []
            for h in range(H):
                qh = qkv[:, :, h * dh : (h + 1) * dh] * scale
                kh = qkv[:, :, d + h * dh : d + (h + 1) * dh]
                vh = qkv[:, :, 2 * d + h * dh : 2 * d + (h + 1) * dh]
                s = jax.lax.dot_general(
                    qh, kh, (((2,), (2,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32,
                )
                if skip_softmax:
                    w = (s * 0.005).astype(dtype)
                else:
                    s = jnp.where(mask, -1e30, s)
                    s = s - jnp.max(s, axis=-1, keepdims=True)
                    e = jnp.exp(s)
                    w = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(dtype)
                o = jax.lax.dot_general(
                    w, vh, (((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32,
                )
                outs.append(o.astype(dtype))
            attn = jnp.concatenate(outs, axis=-1)
            proj = (
                jax.lax.dot_general(
                    attn.reshape(g_ * lp, d), wo_ref[...], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ).astype(dtype)
                + bo_ref[...].astype(dtype)
            ).reshape(g_, lp, d)
            out_ref[...] = xx + proj

        def block(xc, ws):
            return pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct((B, LP, D), xc.dtype),
                grid=(B // g,),
                in_specs=[x_spec, w_spec((D, 3 * D)), w_spec((3 * D,)),
                          w_spec((D, D)), w_spec((D,)), w_spec((D,)), w_spec((D,))],
                out_specs=x_spec,
                compiler_params=pltpu.CompilerParams(vmem_limit_bytes=124 * 1024 * 1024),
            )(xc, *ws)

        @jax.jit
        def fn(x, wqkv, bqkv, wo, bo, ln1s, ln1b):
            def body(carry, ws):
                return block(carry, ws), None

            out, _ = jax.lax.scan(body, x, (wqkv, bqkv, wo, bo, ln1s, ln1b))
            return jnp.sum(out.astype(jnp.float32))

        args = (x, wqkv, bqkv, wo, bo, ln1s, ln1b)
    else:
        raise SystemExit(f"unknown micro {which}")

    t0 = time.perf_counter()
    cs = float(np.asarray(fn(*args)))
    compile_s = time.perf_counter() - t0
    times = []
    for _ in range(8):
        start = time.perf_counter()
        np.asarray(fn(*args))
        times.append(time.perf_counter() - start)
    print(
        f"{which}: {min(times)*1000:.1f} ms/12-layer  (checksum {cs:.2f}, compile {compile_s:.0f}s)",
        flush=True,
    )



# ---------------------------------------------------------------------------
# v8: W8A8 int8 matmuls (per-channel weight scales, per-row activation
# scales, int32 MXU accumulation) — the serving-mode candidate: v5e's int8
# path is 2x the bf16 MXU throughput.
# ---------------------------------------------------------------------------

def _quant_rows(x):
    """Per-row symmetric int8: (values int8, scale fp32 (rows, 1)).

    Measured: this plain fp32 version beats bf16-math variants (Mosaic won't
    legalize bf16 roundeven; mixed-precision quant pipelines timed slower)."""
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True)
    scale = jnp.maximum(amax, 1e-6) / 127.0
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -127, 127).astype(jnp.int8)
    return q, scale


def _quant_cols_host(w):
    """Per-output-channel symmetric int8 for a (in, out) weight matrix."""
    w = np.asarray(w, np.float32)
    amax = np.maximum(np.abs(w).max(axis=0, keepdims=True), 1e-6)
    scale = amax / 127.0
    q = np.clip(np.round(w / scale), -127, 127).astype(np.int8)
    return jnp.asarray(q), jnp.asarray(scale)  # (in, out) int8, (1, out) f32


def _int8_matmul(x_q, x_s, w_q, w_s):
    """(rows, in) int8 @ (in, out) int8 -> fp32, rescaled."""
    acc = jax.lax.dot_general(
        x_q, w_q, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )
    return acc.astype(jnp.float32) * x_s * w_s


def _quant_rows_recip(x):
    """Per-row symmetric int8 via reciprocal-MULTIPLY (no per-element
    division): q = round(x * (127/amax)).  VPU divides are multi-cycle;
    one divide per ROW beats one per element."""
    xf = x.astype(jnp.float32)
    amax = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1, keepdims=True), 1e-6)
    r = 127.0 / amax
    q = jnp.clip(jnp.round(xf * r), -127, 127).astype(jnp.int8)
    return q, amax * (1.0 / 127.0)


def make_kernel_int8(
    n_head: int, length: int, quant_hid: bool = True, skip_attn: bool = False,
    gelu_bf16: bool = False, static_scales: bool = False,
    quant_mode: str = "dyn", ln_stats_bf16: bool = False,
):
    if static_scales:
        # bound the cost of dynamic per-row quantization: pretend a
        # calibration pass fixed every activation scale to a constant
        def _qr(x):
            q = jnp.clip(jnp.round(x.astype(jnp.float32) * 32.0), -127, 127).astype(
                jnp.int8
            )
            return q, jnp.float32(1.0 / 32.0)
    elif quant_mode == "recip":
        _qr = _quant_rows_recip
    elif quant_mode == "cast":
        # LOWER BOUND only (wrong numerics): plain truncating cast at a
        # fixed scale — no amax pass, no round, no clip.  Times the kernel
        # with the quantization VPU work removed.
        def _qr(x):
            return (x.astype(jnp.float32) * 32.0).astype(jnp.int8), jnp.float32(
                1.0 / 32.0
            )
    else:
        _qr = _quant_rows

    if ln_stats_bf16:
        # mean/var in bf16 (half the VPU traffic of the reduction passes),
        # affine + rsqrt in fp32
        def _ln_local(v, scale_ref, bias_ref, dtype, eps=1e-5):
            mean = jnp.mean(v, axis=-1, keepdims=True)
            c = v - mean
            var = jnp.mean(c * c, axis=-1, keepdims=True)
            return (
                c.astype(jnp.float32)
                * jax.lax.rsqrt(var.astype(jnp.float32) + eps)
                * scale_ref[...].astype(jnp.float32)
                + bias_ref[...].astype(jnp.float32)
            ).astype(dtype)
    else:
        _ln_local = _ln
    def kernel(
        x_ref, wqkv_ref, sqkv_ref, bqkv_ref, wo_ref, so_ref, bo_ref,
        ln1s_ref, ln1b_ref, ln2s_ref, ln2b_ref,
        wfc_ref, sfc_ref, bfc_ref, wproj_ref, sproj_ref, bproj_ref, out_ref,
    ):
        x = x_ref[...]
        g, lp, d = x.shape
        dh = d // n_head
        dtype = x.dtype

        h1 = _ln_local(x, ln1s_ref, ln1b_ref, jnp.float32).reshape(g * lp, d)
        h1_q, h1_s = _qr(h1)
        qkv = (
            _int8_matmul(h1_q, h1_s, wqkv_ref[...], sqkv_ref[...])
            + bqkv_ref[...].astype(jnp.float32)
        ).astype(dtype).reshape(g, lp, 3 * d)

        if skip_attn:
            attn = qkv[:, :, :d] + qkv[:, :, d : 2 * d] + qkv[:, :, 2 * d :]
            a_q, a_s = _qr(attn.reshape(g * lp, d))
            proj = (
                _int8_matmul(a_q, a_s, wo_ref[...], so_ref[...])
                + bo_ref[...].astype(jnp.float32)
            ).astype(dtype).reshape(g, lp, d)
            x = x + proj
            h2 = _ln_local(x, ln2s_ref, ln2b_ref, jnp.float32).reshape(g * lp, d)
            h2_q, h2_s = _qr(h2)
            hid = _int8_matmul(h2_q, h2_s, wfc_ref[...], sfc_ref[...]) + bfc_ref[...].astype(jnp.float32)
            hid = hid * jax.nn.sigmoid(1.702 * hid)
            hid_q, hid_s = _qr(hid)
            mlp_out = (
                _int8_matmul(hid_q, hid_s, wproj_ref[...], sproj_ref[...])
                + bproj_ref[...].astype(jnp.float32)
            ).astype(dtype).reshape(g, lp, d)
            out_ref[...] = x + mlp_out
            return
        mask = _mask(g, lp, length)
        scale = dh ** -0.5
        head_outs = []
        for h in range(n_head):
            qh = qkv[:, :, h * dh : (h + 1) * dh] * scale
            kh = qkv[:, :, d + h * dh : d + (h + 1) * dh]
            vh = qkv[:, :, 2 * d + h * dh : 2 * d + (h + 1) * dh]
            s = jax.lax.dot_general(
                qh, kh, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )
            s = jnp.where(mask, -1e30, s)
            s = s - jnp.max(s, axis=-1, keepdims=True)
            e = jnp.exp(s)
            w = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(dtype)
            o = jax.lax.dot_general(
                w, vh, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )
            head_outs.append(o.astype(dtype))
        attn = jnp.concatenate(head_outs, axis=-1)

        a_q, a_s = _qr(attn.reshape(g * lp, d))
        proj = (
            _int8_matmul(a_q, a_s, wo_ref[...], so_ref[...])
            + bo_ref[...].astype(jnp.float32)
        ).astype(dtype).reshape(g, lp, d)
        x = x + proj

        h2 = _ln_local(x, ln2s_ref, ln2b_ref, jnp.float32).reshape(g * lp, d)
        h2_q, h2_s = _qr(h2)
        hid = _int8_matmul(h2_q, h2_s, wfc_ref[...], sfc_ref[...]) + bfc_ref[
            ...
        ].astype(jnp.float32)
        if gelu_bf16:
            # GELU + hidden requant in bf16: halves VPU traffic on the
            # widest (4D) tensor of the block
            hb = hid.astype(dtype)
            hid = hb * (1.0 / (1.0 + jnp.exp(-(hb * 1.702))))
        else:
            hid = hid * jax.nn.sigmoid(1.702 * hid)  # fp32 QuickGELU
        if quant_hid:
            hid_q, hid_s = _qr(hid)
            mlp2 = _int8_matmul(hid_q, hid_s, wproj_ref[...], sproj_ref[...])
        else:
            # requantizing the 4D-wide hidden costs more VPU than the int8
            # matmul saves; run the down-projection in bf16
            mlp2 = jax.lax.dot_general(
                hid.astype(dtype), wproj_ref[...].astype(dtype) * sproj_ref[...].astype(dtype),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        mlp_out = (
            mlp2 + bproj_ref[...].astype(jnp.float32)
        ).astype(dtype).reshape(g, lp, d)
        out_ref[...] = x + mlp_out

    return kernel


def bench_int8(g=16, check_only=False, interpret=False, quant_hid=True, skip_attn=False, quant_scores=False, gelu_bf16=False, static_scales=False, quant_mode="dyn", ln_stats_bf16=False, tag="int8"):
    if quant_scores and (quant_mode != "dyn" or ln_stats_bf16):
        # make_kernel_int8s has no quant_mode/lnb plumbing — refusing beats
        # printing a baseline measurement under an ablation label
        raise SystemExit(f"{tag}: int8s variants do not support recip/cast/lnb")
    kernel = (
        make_kernel_int8s(H, L)
        if quant_scores
        else make_kernel_int8(
            H, L, quant_hid=quant_hid, skip_attn=skip_attn, gelu_bf16=gelu_bf16,
            static_scales=static_scales, quant_mode=quant_mode,
            ln_stats_bf16=ln_stats_bf16,
        )
    )
    vm = pltpu.VMEM
    x_spec = pl.BlockSpec((g, LP, D), lambda i: (i, 0, 0), memory_space=vm)

    def w_spec(shape):
        return pl.BlockSpec(shape, lambda i: (0,) * len(shape), memory_space=vm)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, LP, D)) * 0.1, jnp.bfloat16)
    weights_f = make_weights(rng)
    (wqkv, bqkv, wo, bo, ln1s, ln1b, ln2s, ln2b, wfc, bfc, wproj, bproj) = weights_f

    def quant_stack(w):
        qs, ss = zip(*[_quant_cols_host(w[i]) for i in range(LAYERS)])
        return jnp.stack(qs), jnp.stack(ss)

    wqkv_q, sqkv = quant_stack(wqkv)
    wo_q, so = quant_stack(wo)
    wfc_q, sfc = quant_stack(wfc)
    wproj_q, sproj = quant_stack(wproj)

    wshapes = [
        (D, 3 * D), (1, 3 * D), (3 * D,), (D, D), (1, D), (D,),
        (D,), (D,), (D,), (D,),
        (D, 4 * D), (1, 4 * D), (4 * D,), (4 * D, D), (1, D), (D,),
    ]

    def block(xc, ws):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((B, LP, D), xc.dtype),
            grid=(B // g,),
            in_specs=[x_spec] + [w_spec(s) for s in wshapes],
            out_specs=x_spec,
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)
            if not interpret else None,
            interpret=interpret,
        )(xc, *ws)

    stacked = (
        wqkv_q, sqkv, bqkv, wo_q, so, bo, ln1s, ln1b, ln2s, ln2b,
        wfc_q, sfc, bfc, wproj_q, sproj, bproj,
    )

    @jax.jit
    def stack_fn(x, ws):
        def body(carry, w):
            return block(carry, w), None

        out, _ = jax.lax.scan(body, x, ws)
        return jnp.sum(out.astype(jnp.float32))

    t0 = time.perf_counter()
    cs = float(np.asarray(stack_fn(x, stacked)))
    compile_s = time.perf_counter() - t0
    if check_only:
        # compare against the bf16 v1 stack for relative error
        ref_fn = build_stack_fn("v1", g)
        ref = float(np.asarray(ref_fn(x, weights_f)))
        print(f"int8 checksum {cs:.2f} vs bf16 {ref:.2f} (rel {abs(cs-ref)/abs(ref):.4f})")
        return
    times = []
    for _ in range(8):
        start = time.perf_counter()
        np.asarray(stack_fn(x, stacked))
        times.append(time.perf_counter() - start)
    print(
        f"{tag}(g={g}): {min(times)*1000:.1f} ms/12-block-stack "
        f"(checksum {cs:.2f}, compile {compile_s:.0f}s)",
        flush=True,
    )



# ---------------------------------------------------------------------------
# int8s: int8 attention core on top of the W8A8 linear stack — quantized
# scores (per-row q/k scales over dh lanes) and weights (per-row w, per-head
# per-tensor v).  K=64 half-fills the MXU either way, but int8 doubles the
# per-pass throughput.
# ---------------------------------------------------------------------------

def make_kernel_int8s(n_head: int, length: int):
    base = make_kernel_int8(n_head, length)

    def kernel(
        x_ref, wqkv_ref, sqkv_ref, bqkv_ref, wo_ref, so_ref, bo_ref,
        ln1s_ref, ln1b_ref, ln2s_ref, ln2b_ref,
        wfc_ref, sfc_ref, bfc_ref, wproj_ref, sproj_ref, bproj_ref, out_ref,
    ):
        x = x_ref[...]
        g, lp, d = x.shape
        dh = d // n_head
        dtype = x.dtype

        h1 = _ln(x, ln1s_ref, ln1b_ref, jnp.float32).reshape(g * lp, d)
        h1_q, h1_s = _quant_rows(h1)
        qkv = (
            _int8_matmul(h1_q, h1_s, wqkv_ref[...], sqkv_ref[...])
            + bqkv_ref[...].astype(jnp.float32)
        ).astype(dtype).reshape(g, lp, 3 * d)

        mask = _mask(g, lp, length)
        scale = dh ** -0.5
        head_outs = []
        for h in range(n_head):
            qh = qkv[:, :, h * dh : (h + 1) * dh].astype(jnp.float32)
            kh = qkv[:, :, d + h * dh : d + (h + 1) * dh].astype(jnp.float32)
            vh = qkv[:, :, 2 * d + h * dh : 2 * d + (h + 1) * dh].astype(jnp.float32)
            # per-row int8 over the dh lanes
            q_amax = jnp.maximum(jnp.max(jnp.abs(qh), axis=-1, keepdims=True), 1e-6)
            k_amax = jnp.maximum(jnp.max(jnp.abs(kh), axis=-1, keepdims=True), 1e-6)
            q_q = jnp.clip(jnp.round(qh * (127.0 / q_amax)), -127, 127).astype(jnp.int8)
            k_q = jnp.clip(jnp.round(kh * (127.0 / k_amax)), -127, 127).astype(jnp.int8)
            s_int = jax.lax.dot_general(
                q_q, k_q, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.int32,
            )
            s = (
                s_int.astype(jnp.float32)
                * (q_amax * (scale / 127.0))
                * (k_amax.transpose(0, 2, 1) * (1.0 / 127.0))
            )
            s = jnp.where(mask, -1e30, s)
            s = s - jnp.max(s, axis=-1, keepdims=True)
            e = jnp.exp(s)
            w = e / jnp.sum(e, axis=-1, keepdims=True)
            # weights in [0,1]: fixed 1/127 scale, no amax pass needed
            w_q = jnp.round(w * 127.0).astype(jnp.int8)
            v_amax = jnp.maximum(jnp.max(jnp.abs(vh)), 1e-6)  # per-head tensor
            v_q = jnp.clip(jnp.round(vh * (127.0 / v_amax)), -127, 127).astype(jnp.int8)
            o_int = jax.lax.dot_general(
                w_q, v_q, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.int32,
            )
            o = o_int.astype(jnp.float32) * (v_amax / (127.0 * 127.0))
            head_outs.append(o.astype(dtype))
        attn = jnp.concatenate(head_outs, axis=-1)

        a_q, a_s = _quant_rows(attn.reshape(g * lp, d))
        proj = (
            _int8_matmul(a_q, a_s, wo_ref[...], so_ref[...])
            + bo_ref[...].astype(jnp.float32)
        ).astype(dtype).reshape(g, lp, d)
        x = x + proj

        h2 = _ln(x, ln2s_ref, ln2b_ref, jnp.float32).reshape(g * lp, d)
        h2_q, h2_s = _quant_rows(h2)
        hid = _int8_matmul(h2_q, h2_s, wfc_ref[...], sfc_ref[...]) + bfc_ref[
            ...
        ].astype(jnp.float32)
        hid = hid * jax.nn.sigmoid(1.702 * hid)
        hid_q, hid_s = _quant_rows(hid)
        mlp_out = (
            _int8_matmul(hid_q, hid_s, wproj_ref[...], sproj_ref[...])
            + bproj_ref[...].astype(jnp.float32)
        ).astype(dtype).reshape(g, lp, d)
        out_ref[...] = x + mlp_out

    return kernel

if __name__ == "__main__":
    main()
