"""Pallas TPU kernels for Proto-CLIP's hot ops.

CLIP's sequences are short (77 text tokens, 50-577 vision tokens), so the
classic flash-attention streaming decomposition buys nothing — the entire
``L x L`` score tile fits comfortably in VMEM.  What *does* hurt on the XLA
path is HBM traffic: materializing fp32 ``(B, H, L, L)`` scores and softmax
weights (≈1 GB per ViT-B/16 batch of 512) between three separate kernels.
The fused kernel below keeps scores/softmax/weighted-sum for one (batch,
head) entirely in VMEM: per program it reads ``3*L*dh`` and writes ``L*dh``
elements instead of round-tripping ``2*L*L`` fp32 through HBM.

Layout: inputs ``(B, H, L, dh)`` with L padded to a multiple of 8 (sublane)
by the host-side wrapper; the key-padding and causal masks are applied inside
the kernel.  dh is 64 for all CLIP towers (half a lane register — acceptable;
two-head packing was measured slower due to the doubled score tile).

Enable/disable with ``$PROTOCLIP_PALLAS`` (default: on for TPU backends).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # pltpu is importable on CPU too (used for interpret-mode tests)
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PLTPU = True
except ImportError:  # pragma: no cover
    _HAS_PLTPU = False


def pallas_enabled() -> bool:
    """Use Pallas kernels? Default: only on TPU backends, overridable."""
    env = os.environ.get("PROTOCLIP_PALLAS", "auto").lower()
    if env in ("0", "false", "off"):
        return False
    if env in ("1", "true", "on"):
        return True
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False


def interpret_forced() -> bool:
    """$PROTOCLIP_PALLAS_INTERPRET forces interpret-mode kernels — the
    CPU-debug/dry-run switch (e.g. `__graft_entry__.dryrun_multichip`
    exercising the int8 serving path on the virtual CPU mesh)."""
    return os.environ.get("PROTOCLIP_PALLAS_INTERPRET", "0").lower() in (
        "1", "true", "on",
    )


# Batch rows processed per program.  One (b, h) per program spends too much
# time in per-program overhead at CLIP's tiny L x dh tiles; G=8 amortizes it
# (measured 67 ms vs 96 ms XLA for ViT-B/16's 12 attention layers at B=512).
_BATCH_GROUP = 8


def _attention_kernel(q_ref, k_ref, v_ref, out_ref, *, scale, length, causal):
    """G batch rows of one head: fused scores -> masked softmax -> out."""
    q = q_ref[:, 0].astype(jnp.float32)  # (G, Lp, dh)
    k = k_ref[:, 0].astype(jnp.float32)
    v = v_ref[:, 0]

    scores = jax.lax.dot_general(
        q * scale,
        k,
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # (G, Lp, Lp)

    g, lp, _ = scores.shape
    col = jax.lax.broadcasted_iota(jnp.int32, (g, lp, lp), 2)
    mask = col >= length  # key padding
    if causal:
        row = jax.lax.broadcasted_iota(jnp.int32, (g, lp, lp), 1)
        mask = jnp.logical_or(mask, col > row)
    scores = jnp.where(mask, -1e30, scores)

    scores = scores - jnp.max(scores, axis=-1, keepdims=True)
    exp = jnp.exp(scores)
    weights = exp / jnp.sum(exp, axis=-1, keepdims=True)

    out = jax.lax.dot_general(
        weights.astype(v.dtype),
        v,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    out_ref[:, 0] = out.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("length", "causal", "interpret"))
def _fused_attention_padded(q, k, v, length: int, causal=False, interpret=False):
    b, h, lp, dh = q.shape
    g = _BATCH_GROUP if b % _BATCH_GROUP == 0 else 1
    scale = dh ** -0.5
    kernel = functools.partial(
        _attention_kernel, scale=scale, length=length, causal=causal
    )
    spec = pl.BlockSpec(
        (g, 1, lp, dh), lambda i, j: (i, j, 0, 0),
        memory_space=pltpu.VMEM if _HAS_PLTPU else None,
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, h, lp, dh), q.dtype),
        grid=(b // g, h),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        interpret=interpret,
    )(q, k, v)


def fused_attention(q, k, v, causal: bool = False, interpret: bool = False):
    """Fused attention over ``(B, H, L, dh)``; returns the same shape.

    Pads L up to a multiple of 8 (fp32 sublane) internally; padded keys are
    masked out, padded query rows are sliced off.
    """
    interpret = interpret or interpret_forced()
    b, h, l, dh = q.shape
    lp = -(-l // 8) * 8
    if lp != l:
        pad = [(0, 0), (0, 0), (0, lp - l), (0, 0)]
        q, k, v = jnp.pad(q, pad), jnp.pad(k, pad), jnp.pad(v, pad)
    out = _fused_attention_padded(q, k, v, length=l, causal=causal, interpret=interpret)
    return out[:, :, :l, :]


# -- packed layout: heads stay in the feature dimension ---------------------
#
# The (B, L, D) -> (B, H, L, dh) transpose that the head-major kernel needs
# materializes 4 full activation tensors in HBM per layer, which costs more
# than the kernel saves.  The packed kernel consumes the projection output
# (B, L, D) directly and loops the heads inside VMEM.


def _attention_kernel_packed(
    q_ref, k_ref, v_ref, out_ref, *, scale, length, causal, n_head
):
    q = q_ref[...]  # (G, Lp, D)
    k = k_ref[...]
    v = v_ref[...]
    g, lp, d = q.shape
    dh = d // n_head

    col = jax.lax.broadcasted_iota(jnp.int32, (g, lp, lp), 2)
    mask = col >= length
    if causal:
        row = jax.lax.broadcasted_iota(jnp.int32, (g, lp, lp), 1)
        mask = jnp.logical_or(mask, col > row)

    for h in range(n_head):
        sl = slice(h * dh, (h + 1) * dh)
        qh = q[:, :, sl].astype(jnp.float32)
        kh = k[:, :, sl].astype(jnp.float32)
        vh = v[:, :, sl]
        scores = jax.lax.dot_general(
            qh * scale,
            kh,
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        scores = jnp.where(mask, -1e30, scores)
        # fp32 softmax (a bf16-exponent variant measured perf-neutral —
        # the kernel is MXU/layout bound, not VPU bound)
        scores = scores - jnp.max(scores, axis=-1, keepdims=True)
        exp = jnp.exp(scores)
        weights = exp / jnp.sum(exp, axis=-1, keepdims=True)
        out = jax.lax.dot_general(
            weights.astype(vh.dtype),
            vh,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        out_ref[:, :, sl] = out.astype(out_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("n_head", "length", "causal", "interpret")
)
def _fused_attention_packed_padded(
    q, k, v, n_head: int, length: int, causal=False, interpret=False
):
    b, lp, d = q.shape
    # Block VMEM budget: 4 tensors x (g, Lp, D) bf16, double-buffered, plus
    # the fp32 score tile must fit in ~16MB; g=4 fits ViT-L (Lp=264, D=1024).
    g = next((c for c in (4, 2, 1) if b % c == 0), 1)
    dh = d // n_head
    kernel = functools.partial(
        _attention_kernel_packed,
        scale=dh ** -0.5,
        length=length,
        causal=causal,
        n_head=n_head,
    )
    spec = pl.BlockSpec(
        (g, lp, d), lambda i: (i, 0, 0),
        memory_space=pltpu.VMEM if _HAS_PLTPU else None,
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, lp, d), q.dtype),
        grid=(b // g,),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        interpret=interpret,
    )(q, k, v)


def fused_attention_packed(
    q, k, v, n_head: int, causal: bool = False, interpret: bool = False
):
    """Fused multi-head attention over packed ``(B, L, D)`` projections.

    Equivalent to split-heads -> attention -> merge-heads, without ever
    materializing the head-major layout in HBM.
    """
    interpret = interpret or interpret_forced()
    b, l, d = q.shape
    if d % n_head:
        # the per-head slice loop would silently leave the trailing
        # d % n_head output columns as uninitialized VMEM; fail loudly like
        # the XLA path's reshape does
        raise ValueError(f"n_head={n_head} must divide feature dim {d}")
    lp = -(-l // 8) * 8
    if lp != l:
        pad = [(0, 0), (0, lp - l), (0, 0)]
        q, k, v = jnp.pad(q, pad), jnp.pad(k, pad), jnp.pad(v, pad)
    out = _fused_attention_packed_padded(
        q, k, v, n_head=n_head, length=l, causal=causal, interpret=interpret
    )
    return out[:, :l, :]


# -- whole-transformer-block kernel -----------------------------------------
#
# One pallas_call per residual block: LN1 -> fused QKV -> per-head attention
# -> out-projection -> residual -> LN2 -> MLP(QuickGELU) -> residual, all in
# VMEM.  The layer's weights (~14MB bf16 for ViT-B) use constant index maps,
# so Mosaic keeps them resident across the batch grid; per-layer HBM traffic
# drops to x-in + x-out + one weight read.


def _block_kernel(
    x_ref, wqkv_ref, bqkv_ref, wo_ref, bo_ref,
    ln1s_ref, ln1b_ref, ln2s_ref, ln2b_ref,
    wfc_ref, bfc_ref, wproj_ref, bproj_ref,
    out_ref, *, n_head, length, causal, eps=1e-5,
):
    x = x_ref[...]  # (G, Lp, D) bf16
    g, lp, d = x.shape
    dh = d // n_head
    dtype = x.dtype

    def ln(v, scale_ref, bias_ref):
        vf = v.astype(jnp.float32)
        mean = jnp.mean(vf, axis=-1, keepdims=True)
        c = vf - mean
        var = jnp.mean(c * c, axis=-1, keepdims=True)
        normed = c * jax.lax.rsqrt(var + eps)
        return (
            normed * scale_ref[...].astype(jnp.float32)
            + bias_ref[...].astype(jnp.float32)
        ).astype(dtype)

    h1 = ln(x, ln1s_ref, ln1b_ref).reshape(g * lp, d)
    qkv = (
        jax.lax.dot_general(
            h1, wqkv_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(dtype)
        + bqkv_ref[...].astype(dtype)
    ).reshape(g, lp, 3 * d)

    col = jax.lax.broadcasted_iota(jnp.int32, (g, lp, lp), 2)
    mask = col >= length
    if causal:
        row = jax.lax.broadcasted_iota(jnp.int32, (g, lp, lp), 1)
        mask = jnp.logical_or(mask, col > row)

    scale = dh ** -0.5
    head_outs = []  # concatenated below (dynamic-update lowers to scatter,
    # which Mosaic does not support)
    for h in range(n_head):
        qh = qkv[:, :, h * dh : (h + 1) * dh].astype(jnp.float32)
        kh = qkv[:, :, d + h * dh : d + (h + 1) * dh].astype(jnp.float32)
        vh = qkv[:, :, 2 * d + h * dh : 2 * d + (h + 1) * dh]
        s = jax.lax.dot_general(
            qh * scale, kh, (((2,), (2,)), ((0,), (0,))),
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

    h2 = ln(x, ln2s_ref, ln2b_ref).reshape(g * lp, d)
    hid = (
        jax.lax.dot_general(
            h2, wfc_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        + bfc_ref[...].astype(jnp.float32)
    )
    hid = (hid * jax.nn.sigmoid(1.702 * hid)).astype(dtype)  # QuickGELU
    mlp_out = (
        jax.lax.dot_general(
            hid, wproj_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(dtype)
        + bproj_ref[...].astype(dtype)
    ).reshape(g, lp, d)
    out_ref[...] = x + mlp_out


@functools.partial(
    jax.jit, static_argnames=("n_head", "length", "causal", "interpret", "group")
)
def _fused_block_padded(
    x, wqkv, bqkv, wo, bo, ln1s, ln1b, ln2s, ln2b, wfc, bfc, wproj, bproj,
    n_head: int, length: int, causal=False, interpret=False, group=16,
):
    b, lp, d = x.shape
    # Pick the largest batch group whose working set fits the 100MB scoped
    # VMEM budget (x + qkv + score tile + fp32 MLP hidden + out, plus the
    # resident layer weights).  G=16 measured fastest for ViT-B/16.
    # Activation terms scale with the actual dtype (fp32 activations double
    # the bf16 estimate and would overrun VMEM at a bf16-sized group).
    it = jnp.dtype(x.dtype).itemsize
    weight_bytes = it * (3 * d * d + d * d + 8 * d * d)
    per_row = lp * (it * d + 3 * it * d + 4 * lp + 16 * d + it * d)
    budget = 85 * 1024 * 1024
    g = next(
        (
            c
            for c in (group, 16, 8, 4, 2, 1)
            if c <= group and b % c == 0 and weight_bytes + c * per_row <= budget
        ),
        1,
    )
    kernel = functools.partial(
        _block_kernel, n_head=n_head, length=length, causal=causal
    )
    vm = pltpu.VMEM if _HAS_PLTPU else None
    x_spec = pl.BlockSpec((g, lp, d), lambda i: (i, 0, 0), memory_space=vm)

    def w_spec(arr):
        return pl.BlockSpec(arr.shape, lambda i: (0,) * arr.ndim, memory_space=vm)

    weights = (wqkv, bqkv, wo, bo, ln1s, ln1b, ln2s, ln2b, wfc, bfc, wproj, bproj)
    params = {}
    if _HAS_PLTPU and not interpret:
        params["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, lp, d), x.dtype),
        grid=(b // g,),
        in_specs=[x_spec] + [w_spec(w) for w in weights],
        out_specs=x_spec,
        interpret=interpret,
        **params,
    )(x, *weights)


def fused_transformer_block(
    x, block_params, n_head: int, causal: bool = False, interpret: bool = False,
    group: int = 16, length: int | None = None,
):
    """Run one full residual attention block as a single Pallas kernel.

    ``block_params`` is the per-layer pytree used by
    :func:`protoclip_tpu.models.layers.residual_block` (keys ``ln_1``,
    ``attn``, ``ln_2``, ``mlp``).  ``x``: (B, L, D).

    ``length``: number of valid (non-padded) rows when the caller already
    padded L to a sublane multiple (hoisting the pad/slice out of a layer
    loop); keys beyond it are masked.  Output stays padded in that case.
    """
    interpret = interpret or interpret_forced()
    b, l, d = x.shape
    already_padded = length is not None
    if length is None:
        length = l
    lp = -(-l // 8) * 8
    if lp != l:
        x = jnp.pad(x, [(0, 0), (0, lp - l), (0, 0)])
    attn = block_params["attn"]
    dtype = x.dtype
    wqkv = jnp.concatenate([attn["wq"], attn["wk"], attn["wv"]], axis=1).astype(dtype)
    bqkv = jnp.concatenate([attn["bq"], attn["bk"], attn["bv"]]).astype(dtype)
    out = _fused_block_padded(
        x,
        wqkv,
        bqkv,
        attn["wo"].astype(dtype),
        attn["bo"].astype(dtype),
        block_params["ln_1"]["scale"].astype(jnp.float32),
        block_params["ln_1"]["bias"].astype(jnp.float32),
        block_params["ln_2"]["scale"].astype(jnp.float32),
        block_params["ln_2"]["bias"].astype(jnp.float32),
        block_params["mlp"]["w_fc"].astype(dtype),
        block_params["mlp"]["b_fc"].astype(dtype),
        block_params["mlp"]["w_proj"].astype(dtype),
        block_params["mlp"]["b_proj"].astype(dtype),
        n_head=n_head,
        length=length,
        causal=causal,
        interpret=interpret,
        group=group,
    )
    return out if already_padded else out[:, :l, :]


# -- int8 (W8A8) serving-mode block kernel -----------------------------------
#
# Opt-in via $PROTOCLIP_INT8 (default off: the reference semantics are
# half-precision, and int8 accuracy should be validated on real weights
# before deployment).  Per-output-channel symmetric weight scales,
# per-row (per-token) dynamic activation scales, int32 MXU accumulation.
# The chip's MEASURED int8 MXU rate is ~1.7x bf16 (265 vs 154 TOP/s,
# scripts/bench_int8_peak.py), not the nominal 2x.  Measured: the 12-block
# ViT-B/16 stack drops from ~124 ms to ~84 ms net (B=512) => ~5500 img/s,
# which is ~83% of that measured int8 peak — per-stage budget and floor
# proof in BASELINE.md ("int8 per-stage kernel budget").  Attention core
# (scores/weights) stays bf16 — activation*activation matmuls are a small
# fraction of the FLOPs and quantizing them costs more VPU time than the
# MXU saves (measured); dynamic requant is free (cast-bound ablation <1 ms).


def int8_enabled() -> bool:
    """Use the W8A8 serving kernel? Opt-in only."""
    return os.environ.get("PROTOCLIP_INT8", "0").lower() in ("1", "true", "on")


def quantize_cols(w: jax.Array):
    """Per-output-channel symmetric int8 for an (in, out) weight matrix
    -> (int8 values (in, out), fp32 scales (1, out)).  Works on stacked
    (L, in, out) weights too (scales (L, 1, out))."""
    w32 = w.astype(jnp.float32)
    amax = jnp.maximum(jnp.max(jnp.abs(w32), axis=-2, keepdims=True), 1e-6)
    scale = amax / 127.0
    q = jnp.clip(jnp.round(w32 / scale), -127, 127).astype(jnp.int8)
    return q, scale


def quantize_stacked_blocks(stacked_blocks) -> dict:
    """Quantize a stacked transformer-block pytree for the int8 kernel.

    Returns the flat argument pytree the kernel consumes; LayerNorm
    scales/biases and matmul biases stay fp32, the 4 weight matrices become
    int8 + per-channel scales.  The QKV triple is fused column-wise first
    (same layout as the bf16 fused kernel).
    """
    attn = stacked_blocks["attn"]
    wqkv = jnp.concatenate([attn["wq"], attn["wk"], attn["wv"]], axis=-1)
    bqkv = jnp.concatenate([attn["bq"], attn["bk"], attn["bv"]], axis=-1)
    wqkv_q, sqkv = quantize_cols(wqkv)
    wo_q, so = quantize_cols(attn["wo"])
    wfc_q, sfc = quantize_cols(stacked_blocks["mlp"]["w_fc"])
    wproj_q, sproj = quantize_cols(stacked_blocks["mlp"]["w_proj"])
    f32 = lambda x: x.astype(jnp.float32)  # noqa: E731
    return {
        "wqkv": wqkv_q, "sqkv": sqkv, "bqkv": f32(bqkv),
        "wo": wo_q, "so": so, "bo": f32(attn["bo"]),
        "ln1s": f32(stacked_blocks["ln_1"]["scale"]),
        "ln1b": f32(stacked_blocks["ln_1"]["bias"]),
        "ln2s": f32(stacked_blocks["ln_2"]["scale"]),
        "ln2b": f32(stacked_blocks["ln_2"]["bias"]),
        "sfc": sfc, "wfc": wfc_q, "bfc": f32(stacked_blocks["mlp"]["b_fc"]),
        "wproj": wproj_q, "sproj": sproj,
        "bproj": f32(stacked_blocks["mlp"]["b_proj"]),
    }


def _quant_rows(x):
    """Per-row symmetric int8 -> (int8 values, fp32 scale (rows, 1))."""
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True)
    scale = jnp.maximum(amax, 1e-6) / 127.0
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -127, 127).astype(jnp.int8)
    return q, scale


def _int8_matmul(x_q, x_s, w_q, w_s):
    """(rows, in) int8 @ (in, out) int8 -> fp32 (int32 MXU accumulation)."""
    acc = jax.lax.dot_general(
        x_q, w_q, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )
    return acc.astype(jnp.float32) * x_s * w_s


def _block_kernel_int8(
    x_ref, wqkv_ref, sqkv_ref, bqkv_ref, wo_ref, so_ref, bo_ref,
    ln1s_ref, ln1b_ref, ln2s_ref, ln2b_ref,
    wfc_ref, sfc_ref, bfc_ref, wproj_ref, sproj_ref, bproj_ref,
    out_ref, *, n_head, length, causal, eps=1e-5,
):
    x = x_ref[...]  # (G, Lp, D) bf16
    g, lp, d = x.shape
    dh = d // n_head
    dtype = x.dtype

    def ln(v, scale_ref, bias_ref):
        vf = v.astype(jnp.float32)
        mean = jnp.mean(vf, axis=-1, keepdims=True)
        c = vf - mean
        var = jnp.mean(c * c, axis=-1, keepdims=True)
        return c * jax.lax.rsqrt(var + eps) * scale_ref[...] + bias_ref[...]

    h1_q, h1_s = _quant_rows(ln(x, ln1s_ref, ln1b_ref).reshape(g * lp, d))
    qkv = (
        (_int8_matmul(h1_q, h1_s, wqkv_ref[...], sqkv_ref[...]) + bqkv_ref[...])
        .astype(dtype)
        .reshape(g, lp, 3 * d)
    )

    col = jax.lax.broadcasted_iota(jnp.int32, (g, lp, lp), 2)
    mask = col >= length
    if causal:
        row = jax.lax.broadcasted_iota(jnp.int32, (g, lp, lp), 1)
        mask = jnp.logical_or(mask, col > row)

    scale = dh ** -0.5
    head_outs = []
    for h in range(n_head):
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

    a_q, a_s = _quant_rows(attn.reshape(g * lp, d))
    proj = (
        (_int8_matmul(a_q, a_s, wo_ref[...], so_ref[...]) + bo_ref[...])
        .astype(dtype)
        .reshape(g, lp, d)
    )
    x = x + proj

    h2_q, h2_s = _quant_rows(ln(x, ln2s_ref, ln2b_ref).reshape(g * lp, d))
    hid = _int8_matmul(h2_q, h2_s, wfc_ref[...], sfc_ref[...]) + bfc_ref[...]
    hid = hid * jax.nn.sigmoid(1.702 * hid)  # fp32 QuickGELU
    hid_q, hid_s = _quant_rows(hid)
    mlp_out = (
        (_int8_matmul(hid_q, hid_s, wproj_ref[...], sproj_ref[...]) + bproj_ref[...])
        .astype(dtype)
        .reshape(g, lp, d)
    )
    out_ref[...] = x + mlp_out


@functools.partial(
    jax.jit, static_argnames=("n_head", "length", "causal", "interpret", "group")
)
def _fused_block_int8_padded(
    x, qblock, n_head: int, length: int, causal=False, interpret=False, group=16
):
    b, lp, d = x.shape
    # int8 weights + fp32 hidden; same VMEM sizing approach as the bf16
    # path, activation terms scaled by the actual activation dtype
    it = jnp.dtype(x.dtype).itemsize
    weight_bytes = 12 * d * d + 4 * (3 * d + d + 4 * d + d + 8 * d)
    per_row = lp * (it * d + 3 * it * d + 4 * lp + 16 * d + it * d + 8)
    budget = 85 * 1024 * 1024
    g = next(
        (
            c
            for c in (group, 16, 8, 4, 2, 1)
            if c <= group and b % c == 0 and weight_bytes + c * per_row <= budget
        ),
        1,
    )
    kernel = functools.partial(
        _block_kernel_int8, n_head=n_head, length=length, causal=causal
    )
    vm = pltpu.VMEM if _HAS_PLTPU else None
    x_spec = pl.BlockSpec((g, lp, d), lambda i: (i, 0, 0), memory_space=vm)

    def w_spec(arr):
        return pl.BlockSpec(arr.shape, lambda i: (0,) * arr.ndim, memory_space=vm)

    order = (
        "wqkv", "sqkv", "bqkv", "wo", "so", "bo",
        "ln1s", "ln1b", "ln2s", "ln2b",
        "wfc", "sfc", "bfc", "wproj", "sproj", "bproj",
    )
    weights = tuple(qblock[k] for k in order)
    params = {}
    if _HAS_PLTPU and not interpret:
        params["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, lp, d), x.dtype),
        grid=(b // g,),
        in_specs=[x_spec] + [w_spec(w) for w in weights],
        out_specs=x_spec,
        interpret=interpret,
        **params,
    )(x, *weights)


def fused_transformer_block_int8(
    x, qblock: dict, n_head: int, causal: bool = False, interpret: bool = False,
    group: int = 16, length: int | None = None,
):
    """Run one residual block with W8A8 int8 matmuls (serving mode).

    ``qblock`` is one layer's slice of :func:`quantize_stacked_blocks`'s
    output.  Same padding contract as :func:`fused_transformer_block`.
    """
    interpret = interpret or interpret_forced()
    b, l, d = x.shape
    already_padded = length is not None
    if length is None:
        length = l
    lp = -(-l // 8) * 8
    if lp != l:
        x = jnp.pad(x, [(0, 0), (0, lp - l), (0, 0)])
    out = _fused_block_int8_padded(
        x, qblock, n_head=n_head, length=length, causal=causal,
        interpret=interpret, group=group,
    )
    return out if already_padded else out[:, :l, :]
