"""Pallas kernel parity (interpret mode on CPU) against the XLA reference."""

import numpy as np
import pytest

import jax.numpy as jnp

from protoclip_tpu.ops.attention import attention_core
from protoclip_tpu.ops.pallas_kernels import fused_attention


@pytest.mark.parametrize("L", [8, 50, 77, 197])
def test_fused_attention_matches_xla(rng, L):
    B, H, dh = 2, 3, 64
    q = rng.standard_normal((B, H, L, dh)).astype(np.float32)
    k = rng.standard_normal((B, H, L, dh)).astype(np.float32)
    v = rng.standard_normal((B, H, L, dh)).astype(np.float32)
    ours = np.asarray(
        fused_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), interpret=True)
    )
    ref = np.asarray(attention_core(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)))
    np.testing.assert_allclose(ours, ref, atol=2e-5)


@pytest.mark.parametrize("L", [5, 77])
def test_fused_attention_causal(rng, L):
    B, H, dh = 1, 2, 64
    q = rng.standard_normal((B, H, L, dh)).astype(np.float32)
    k = rng.standard_normal((B, H, L, dh)).astype(np.float32)
    v = rng.standard_normal((B, H, L, dh)).astype(np.float32)
    ours = np.asarray(
        fused_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), causal=True, interpret=True)
    )
    mask = jnp.triu(jnp.full((L, L), -jnp.inf), k=1)
    ref = np.asarray(attention_core(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), mask))
    np.testing.assert_allclose(ours, ref, atol=2e-5)


def test_fused_attention_bf16(rng):
    B, H, L, dh = 2, 2, 77, 64
    q = jnp.asarray(rng.standard_normal((B, H, L, dh)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((B, H, L, dh)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((B, H, L, dh)), jnp.bfloat16)
    ours = np.asarray(fused_attention(q, k, v, interpret=True).astype(jnp.float32))
    ref = np.asarray(attention_core(q, k, v).astype(jnp.float32))
    np.testing.assert_allclose(ours, ref, atol=0.05)


@pytest.mark.parametrize("L,causal", [(50, False), (77, True), (197, False)])
def test_fused_attention_packed_matches_xla(rng, L, causal):
    from protoclip_tpu.ops.pallas_kernels import fused_attention_packed

    B, H, D = 2, 4, 128
    q = rng.standard_normal((B, L, D)).astype(np.float32)
    k = rng.standard_normal((B, L, D)).astype(np.float32)
    v = rng.standard_normal((B, L, D)).astype(np.float32)
    ours = np.asarray(
        fused_attention_packed(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), H, causal=causal, interpret=True
        )
    )

    def split(t):
        return jnp.asarray(t).reshape(B, L, H, D // H).transpose(0, 2, 1, 3)

    mask = jnp.triu(jnp.full((L, L), -jnp.inf), k=1) if causal else None
    ref = attention_core(split(q), split(k), split(v), mask)
    ref = np.asarray(ref.transpose(0, 2, 1, 3).reshape(B, L, D))
    # kernel numerics (fp32 scores, input-dtype softmax weights for the
    # value matmul) differ slightly from the all-fp32 XLA path
    np.testing.assert_allclose(ours, ref, atol=2e-2)
    assert np.abs(ours - ref).mean() < 1e-3  # bulk agreement


@pytest.mark.parametrize("L,causal", [(50, False), (13, True)])
def test_fused_transformer_block_matches_reference(rng, L, causal):
    from protoclip_tpu.models.layers import init_block_params, residual_block
    from protoclip_tpu.ops.pallas_kernels import fused_transformer_block
    import jax

    B, D, H = 4, 128, 4
    stacked = init_block_params(jax.random.PRNGKey(0), 1, D)
    blk = jax.tree_util.tree_map(lambda a: a[0], stacked)
    x = rng.standard_normal((B, L, D)).astype(np.float32)

    ours = np.asarray(
        fused_transformer_block(jnp.asarray(x), blk, H, causal=causal, interpret=True)
    )
    ref = np.asarray(residual_block(jnp.asarray(x), blk, H, causal=causal))
    np.testing.assert_allclose(ours, ref, atol=5e-4)


def test_qt_step_grads_bypass_pallas(rng, monkeypatch):
    """The QT trainer differentiates only through adapter/banks; the frozen
    CLIP encode (the only pallas consumer) is stop-gradient'd.  Force the
    pallas path on (interpret mode on CPU) and check value_and_grad still
    compiles and runs — if the stop_gradient were dropped, jax would try to
    differentiate through the Pallas custom call and fail."""
    import protoclip_tpu.ops.pallas_kernels as pk

    monkeypatch.setenv("PROTOCLIP_PALLAS", "1")
    orig = pk.fused_transformer_block

    def forced(*args, **kwargs):
        kwargs["interpret"] = True
        return orig(*args, **kwargs)

    monkeypatch.setattr(pk, "fused_transformer_block", forced)
    from protoclip_tpu.train.qt import QTTrainer
    from tests.test_models import TINY_VIT
    from protoclip_tpu.models.clip import init_clip_params
    import jax

    clip_params = init_clip_params(jax.random.PRNGKey(0), TINY_VIT)
    keys = rng.standard_normal((6, TINY_VIT.embed_dim)).astype(np.float32)
    bank_t = rng.standard_normal((3, TINY_VIT.embed_dim)).astype(np.float32)
    trainer = QTTrainer(
        clip_params=clip_params, clip_cfg=TINY_VIT,
        bank_v_init=keys, bank_t_init=bank_t, n_class=3, k_shots=2,
        adapter_kind="fc", alpha=0.5, beta=5.0, seed=0,
    )
    images = rng.integers(0, 256, (2, 32, 32, 3), dtype=np.uint8).astype(np.uint8)
    stats = trainer.train_step(images, np.asarray([0, 1], np.int32), 2)
    assert np.isfinite(stats["loss"])


def test_fp_transformer_pallas_wiring(rng, monkeypatch):
    """$PROTOCLIP_PALLAS routes the bf16/fp layer scan through the fused
    block kernel (pad-hoist -> scan -> slice) and matches the XLA path —
    the exact route of the headline TPU serving path, at a non-multiple-of-8
    sequence length."""
    import jax

    import protoclip_tpu.ops.pallas_kernels as pk
    from protoclip_tpu.models.layers import init_block_params, transformer

    monkeypatch.setenv("PROTOCLIP_PALLAS", "1")
    orig = pk.fused_transformer_block

    def forced(*args, **kwargs):
        kwargs["interpret"] = True
        return orig(*args, **kwargs)

    monkeypatch.setattr(pk, "fused_transformer_block", forced)
    D, H, L, B, layers = 128, 4, 13, 2, 3  # L=13: pad/slice path active
    stacked = init_block_params(jax.random.PRNGKey(0), layers, D)
    x = jnp.asarray(rng.standard_normal((B, L, D)).astype(np.float32))
    out_pallas = np.asarray(transformer(x, stacked, H))

    monkeypatch.setenv("PROTOCLIP_PALLAS", "0")
    out_xla = np.asarray(transformer(x, stacked, H))
    assert out_pallas.shape == (B, L, D)
    np.testing.assert_allclose(out_pallas, out_xla, atol=2e-3)


def test_fused_block_hoisted_padding(rng):
    """length= path: caller pre-pads once, kernel masks the padded keys."""
    from protoclip_tpu.models.layers import init_block_params, residual_block
    from protoclip_tpu.ops.pallas_kernels import fused_transformer_block
    import jax

    B, L, D, H = 2, 13, 128, 4
    lp = 16
    stacked = init_block_params(jax.random.PRNGKey(0), 1, D)
    blk = jax.tree_util.tree_map(lambda a: a[0], stacked)
    x = rng.standard_normal((B, L, D)).astype(np.float32)
    xp = np.pad(x, [(0, 0), (0, lp - L), (0, 0)])

    out = np.asarray(
        fused_transformer_block(
            jnp.asarray(xp), blk, H, length=L, interpret=True
        )
    )
    assert out.shape == (B, lp, D)
    ref = np.asarray(residual_block(jnp.asarray(x), blk, H))
    np.testing.assert_allclose(out[:, :L, :], ref, atol=5e-4)


@pytest.mark.parametrize(
    "L,causal,D,H,B",
    [
        (50, False, 128, 4, 4),
        (13, True, 128, 4, 4),
        # ViT-L/14 vision-block geometry (D=1024, H=16, L=257): the FewSOL-198
        # deploy backbone's serving shape
        (257, False, 1024, 16, 1),
    ],
)
def test_fused_block_int8_close_to_reference(rng, L, causal, D, H, B):
    """W8A8 serving kernel: per-channel weight + per-row activation scales
    keep the block output within quantization noise of the fp32 path."""
    import jax

    from protoclip_tpu.models.layers import init_block_params, residual_block
    from protoclip_tpu.ops.pallas_kernels import (
        fused_transformer_block_int8,
        quantize_stacked_blocks,
    )

    stacked = init_block_params(jax.random.PRNGKey(0), 1, D)
    qblocks = quantize_stacked_blocks(stacked)
    qblock = jax.tree_util.tree_map(lambda a: a[0], qblocks)
    blk = jax.tree_util.tree_map(lambda a: a[0], stacked)
    x = rng.standard_normal((B, L, D)).astype(np.float32)

    ours = np.asarray(
        fused_transformer_block_int8(
            jnp.asarray(x), qblock, H, causal=causal, interpret=True
        )
    )
    ref = np.asarray(residual_block(jnp.asarray(x), blk, H, causal=causal))
    cos = float(
        (ours.ravel() @ ref.ravel())
        / (np.linalg.norm(ours) * np.linalg.norm(ref) + 1e-12)
    )
    assert cos > 0.999, f"cosine {cos}"
    assert np.abs(ours - ref).max() / (np.abs(ref).max() + 1e-9) < 0.02


def test_int8_transformer_wiring(rng, monkeypatch):
    """$PROTOCLIP_INT8 routes the layer scan through the int8 kernel."""
    import jax

    from protoclip_tpu.models.layers import init_block_params, transformer

    monkeypatch.setenv("PROTOCLIP_PALLAS", "1")
    monkeypatch.setenv("PROTOCLIP_INT8", "1")
    # interpret-mode on CPU: patch the pallas entry to force interpret
    import protoclip_tpu.ops.pallas_kernels as pk

    orig = pk.fused_transformer_block_int8

    def forced(*args, **kwargs):
        kwargs["interpret"] = True
        return orig(*args, **kwargs)

    monkeypatch.setattr(pk, "fused_transformer_block_int8", forced)

    D, H, L, B, layers = 128, 4, 10, 2, 2
    stacked = init_block_params(jax.random.PRNGKey(0), layers, D)
    x = jnp.asarray(rng.standard_normal((B, L, D)).astype(np.float32))
    out_q = np.asarray(transformer(x, stacked, H))

    monkeypatch.setenv("PROTOCLIP_PALLAS", "0")
    monkeypatch.delenv("PROTOCLIP_INT8")
    out_ref = np.asarray(transformer(x, stacked, H))
    cos = float(
        (out_q.ravel() @ out_ref.ravel())
        / (np.linalg.norm(out_q) * np.linalg.norm(out_ref) + 1e-12)
    )
    assert out_q.shape == out_ref.shape
    assert cos > 0.999, f"cosine {cos}"


@pytest.mark.slow
def test_int8_encode_parity_real_geometry(rng, monkeypatch):
    """W8A8 serving mode at real ViT-B/16 geometry (768/12/12, 224px) and
    text geometry (512/12/8, 77ctx): full-tower int8 features must stay
    within quantization noise of the fp32 XLA path — the evidence behind
    serving the encode in int8 (BASELINE.md headline)."""
    import jax

    import protoclip_tpu.ops.pallas_kernels as pk
    from protoclip_tpu.models.clip import (
        BACKBONE_CONFIGS,
        encode_image,
        encode_text,
        init_clip_params,
    )

    cfg = BACKBONE_CONFIGS["ViT-B/16"]
    params = init_clip_params(jax.random.PRNGKey(0), cfg)
    images = jnp.asarray(
        (rng.standard_normal((2, 224, 224, 3)) * 0.5).astype(np.float32)
    )
    tokens = np.zeros((2, 77), np.int32)
    tokens[:, 0] = 49406
    tokens[0, 1:9] = rng.integers(1, 49406, 8)
    tokens[0, 9] = 49407
    tokens[1, 1:40] = rng.integers(1, 49406, 39)
    tokens[1, 40] = 49407
    tokens = jnp.asarray(tokens)

    monkeypatch.setenv("PROTOCLIP_PALLAS", "0")
    ref_i = np.asarray(encode_image(params, images, cfg))
    ref_t = np.asarray(encode_text(params, tokens, cfg))

    monkeypatch.setenv("PROTOCLIP_PALLAS", "1")
    monkeypatch.setenv("PROTOCLIP_INT8", "1")
    orig = pk.fused_transformer_block_int8

    def forced(*args, **kwargs):
        kwargs["interpret"] = True
        return orig(*args, **kwargs)

    monkeypatch.setattr(pk, "fused_transformer_block_int8", forced)
    ours_i = np.asarray(encode_image(params, images, cfg))
    ours_t = np.asarray(encode_text(params, tokens, cfg))

    for ours, ref in ((ours_i, ref_i), (ours_t, ref_t)):
        on = ours / np.linalg.norm(ours, axis=-1, keepdims=True)
        rn = ref / np.linalg.norm(ref, axis=-1, keepdims=True)
        cos = np.sum(on * rn, axis=-1)
        assert cos.min() > 0.995, f"per-feature cosine {cos}"


@pytest.mark.slow
def test_int8_load_time_quantization(rng, monkeypatch):
    """quantize_for_serving attaches blocks_q once at load; the apply path
    consumes it and matches the quantize-in-trace fallback exactly."""
    import jax

    import protoclip_tpu.ops.pallas_kernels as pk
    from protoclip_tpu.models.clip import (
        BACKBONE_CONFIGS, cast_params, init_clip_params, quantize_for_serving,
    )
    from protoclip_tpu.models.vit import apply_vit

    cfg = BACKBONE_CONFIGS["ViT-B/32"]
    params = init_clip_params(jax.random.PRNGKey(0), cfg)
    qparams = quantize_for_serving(params)
    assert "blocks_q" in qparams["visual"] and "blocks_q" in qparams["text"]
    assert qparams["visual"]["blocks_q"]["wqkv"].dtype == jnp.int8
    # cast_params must pass the quantized subtree through untouched
    casted = cast_params(qparams, jnp.bfloat16)
    assert casted["visual"]["blocks_q"]["wqkv"].dtype == jnp.int8
    assert casted["visual"]["blocks_q"]["sqkv"].dtype == jnp.float32

    monkeypatch.setenv("PROTOCLIP_PALLAS", "1")
    monkeypatch.setenv("PROTOCLIP_INT8", "1")
    orig = pk.fused_transformer_block_int8

    def forced(*args, **kwargs):
        kwargs["interpret"] = True
        return orig(*args, **kwargs)

    monkeypatch.setattr(pk, "fused_transformer_block_int8", forced)
    images = jnp.asarray(
        (rng.standard_normal((2, 224, 224, 3)) * 0.5).astype(np.float32)
    )
    out_pre = np.asarray(apply_vit(qparams["visual"], images, cfg))
    out_trace = np.asarray(apply_vit(params["visual"], images, cfg))
    # the two int8 paths may differ by +-1 quantization step at exact
    # rounding ties (different compilation contexts), not more
    np.testing.assert_allclose(out_pre, out_trace, atol=0.1)

    monkeypatch.setenv("PROTOCLIP_PALLAS", "0")
    monkeypatch.delenv("PROTOCLIP_INT8")
    ref = np.asarray(apply_vit(params["visual"], images, cfg))
    on = out_pre / np.linalg.norm(out_pre, axis=-1, keepdims=True)
    rn = ref / np.linalg.norm(ref, axis=-1, keepdims=True)
    assert np.sum(on * rn, axis=-1).min() > 0.995
