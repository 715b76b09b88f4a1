"""Model towers: shape contracts, EOT gather, attention-pool equivalence,
and torch state-dict conversion round-trip."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from protoclip_tpu.models.clip import (
    BACKBONE_CONFIGS,
    CLIPConfig,
    convert_clip_state_dict,
    encode_image,
    encode_text,
    infer_config_from_state_dict,
    init_clip_params,
)
from protoclip_tpu.models.vit import patchify

TINY_VIT = CLIPConfig(
    "tiny-vit", embed_dim=32, image_resolution=32, vision_layers=2,
    vision_width=64, vision_patch_size=16, context_length=16, vocab_size=128,
    transformer_width=64, transformer_layers=2,
)
TINY_RN = CLIPConfig(
    "tiny-rn", embed_dim=32, image_resolution=64, vision_layers=(1, 1, 1, 1),
    vision_width=8, vision_patch_size=None, context_length=16, vocab_size=128,
    transformer_width=64, transformer_layers=2,
)


def test_patchify_ordering():
    # pixel (py, px, c) ordering must match the conv-kernel flattening
    img = np.arange(2 * 4 * 4 * 3, dtype=np.float32).reshape(2, 4, 4, 3)
    patches = np.asarray(patchify(jnp.asarray(img), 2))
    assert patches.shape == (2, 4, 12)
    expected_first = img[0, 0:2, 0:2, :].reshape(-1)
    np.testing.assert_array_equal(patches[0, 0], expected_first)


def test_vit_forward_shape():
    params = init_clip_params(jax.random.PRNGKey(0), TINY_VIT)
    imgs = jnp.zeros((3, 32, 32, 3))
    out = encode_image(params, imgs, TINY_VIT)
    assert out.shape == (3, 32)
    assert np.isfinite(np.asarray(out)).all()


def test_resnet_forward_shape():
    params = init_clip_params(jax.random.PRNGKey(0), TINY_RN)
    imgs = jax.random.normal(jax.random.PRNGKey(1), (2, 64, 64, 3))
    out = encode_image(params, imgs, TINY_RN)
    assert out.shape == (2, 32)
    assert np.isfinite(np.asarray(out)).all()


def test_text_eot_gather():
    params = init_clip_params(jax.random.PRNGKey(0), TINY_VIT)
    # tokens with EOT (=127, max id) at different positions
    tokens = np.zeros((2, 16), dtype=np.int32)
    tokens[0, :4] = [126, 5, 7, 127]
    tokens[1, :7] = [126, 5, 7, 9, 11, 2, 127]
    out = encode_text(params, jnp.asarray(tokens), TINY_VIT)
    assert out.shape == (2, 32)
    # Moving padding after EOT must not change the feature (causal mask +
    # EOT gather): append a stray token after EOT of row 0
    tokens2 = tokens.copy()
    tokens2[0, 5] = 3
    out2 = encode_text(params, jnp.asarray(tokens2), TINY_VIT)
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(out2[0]), atol=1e-5)


def test_attention_pool_single_query_equals_full():
    """The mean-token-query shortcut must equal full self-attention row 0."""
    from protoclip_tpu.models.resnet import attention_pool
    from protoclip_tpu.ops.attention import attention_core

    rng = np.random.default_rng(0)
    B, H, W, C, heads, out_dim = 2, 4, 4, 32, 4, 16
    x = rng.standard_normal((B, H, W, C)).astype(np.float32)
    p = {
        "positional_embedding": rng.standard_normal((H * W + 1, C)).astype(np.float32) * 0.1,
        "wq": rng.standard_normal((C, C)).astype(np.float32) * 0.1,
        "wk": rng.standard_normal((C, C)).astype(np.float32) * 0.1,
        "wv": rng.standard_normal((C, C)).astype(np.float32) * 0.1,
        "wo": rng.standard_normal((C, out_dim)).astype(np.float32) * 0.1,
        "bq": rng.standard_normal(C).astype(np.float32),
        "bk": rng.standard_normal(C).astype(np.float32),
        "bv": rng.standard_normal(C).astype(np.float32),
        "bo": rng.standard_normal(out_dim).astype(np.float32),
    }
    p = {k: jnp.asarray(v) for k, v in p.items()}
    ours = attention_pool(p, jnp.asarray(x), heads)

    # full attention over all tokens, keep row 0 (the reference's approach)
    tokens = jnp.asarray(x).reshape(B, H * W, C)
    mean_tok = tokens.mean(axis=1, keepdims=True)
    toks = jnp.concatenate([mean_tok, tokens], axis=1) + p["positional_embedding"][None]
    q = toks @ p["wq"] + p["bq"]
    k = toks @ p["wk"] + p["bk"]
    v = toks @ p["wv"] + p["bv"]
    L = H * W + 1

    def split(t):
        return t.reshape(B, L, heads, C // heads).transpose(0, 2, 1, 3)

    full = attention_core(split(q), split(k), split(v))
    full = full.transpose(0, 2, 1, 3).reshape(B, L, C)
    expected = full[:, 0, :] @ p["wo"] + p["bo"]
    np.testing.assert_allclose(np.asarray(ours), np.asarray(expected), atol=1e-5)


def _tiny_torch_style_state_dict(rng):
    """Build a synthetic torch-layout ViT state dict for conversion tests."""
    width, layers, patch, grid, embed = 64, 2, 16, 2, 32
    twidth, tlayers, vocab, ctx = 64, 2, 128, 16
    sd = {}

    def randn(*shape):
        return rng.standard_normal(shape).astype(np.float32) * 0.05

    sd["visual.conv1.weight"] = randn(width, 3, patch, patch)
    sd["visual.class_embedding"] = randn(width)
    sd["visual.positional_embedding"] = randn(grid * grid + 1, width)
    sd["visual.ln_pre.weight"] = np.ones(width, np.float32)
    sd["visual.ln_pre.bias"] = np.zeros(width, np.float32)
    for i in range(layers):
        p = f"visual.transformer.resblocks.{i}"
        sd[f"{p}.ln_1.weight"] = np.ones(width, np.float32)
        sd[f"{p}.ln_1.bias"] = np.zeros(width, np.float32)
        sd[f"{p}.attn.in_proj_weight"] = randn(3 * width, width)
        sd[f"{p}.attn.in_proj_bias"] = randn(3 * width)
        sd[f"{p}.attn.out_proj.weight"] = randn(width, width)
        sd[f"{p}.attn.out_proj.bias"] = randn(width)
        sd[f"{p}.ln_2.weight"] = np.ones(width, np.float32)
        sd[f"{p}.ln_2.bias"] = np.zeros(width, np.float32)
        sd[f"{p}.mlp.c_fc.weight"] = randn(4 * width, width)
        sd[f"{p}.mlp.c_fc.bias"] = randn(4 * width)
        sd[f"{p}.mlp.c_proj.weight"] = randn(width, 4 * width)
        sd[f"{p}.mlp.c_proj.bias"] = randn(width)
    sd["visual.ln_post.weight"] = np.ones(width, np.float32)
    sd["visual.ln_post.bias"] = np.zeros(width, np.float32)
    sd["visual.proj"] = randn(width, embed)

    for i in range(tlayers):
        p = f"transformer.resblocks.{i}"
        sd[f"{p}.ln_1.weight"] = np.ones(twidth, np.float32)
        sd[f"{p}.ln_1.bias"] = np.zeros(twidth, np.float32)
        sd[f"{p}.attn.in_proj_weight"] = randn(3 * twidth, twidth)
        sd[f"{p}.attn.in_proj_bias"] = randn(3 * twidth)
        sd[f"{p}.attn.out_proj.weight"] = randn(twidth, twidth)
        sd[f"{p}.attn.out_proj.bias"] = randn(twidth)
        sd[f"{p}.ln_2.weight"] = np.ones(twidth, np.float32)
        sd[f"{p}.ln_2.bias"] = np.zeros(twidth, np.float32)
        sd[f"{p}.mlp.c_fc.weight"] = randn(4 * twidth, twidth)
        sd[f"{p}.mlp.c_fc.bias"] = randn(4 * twidth)
        sd[f"{p}.mlp.c_proj.weight"] = randn(twidth, 4 * twidth)
        sd[f"{p}.mlp.c_proj.bias"] = randn(twidth)
    sd["token_embedding.weight"] = randn(vocab, twidth)
    sd["positional_embedding"] = randn(ctx, twidth)
    sd["ln_final.weight"] = np.ones(twidth, np.float32)
    sd["ln_final.bias"] = np.zeros(twidth, np.float32)
    sd["text_projection"] = randn(twidth, embed)
    sd["logit_scale"] = np.float32(np.log(1 / 0.07))
    return sd


def test_state_dict_conversion_and_patch_conv_equivalence(rng):
    """Converted patch_embed matmul must equal torch's strided conv."""
    torch = pytest.importorskip("torch")
    sd = _tiny_torch_style_state_dict(rng)
    cfg, params = convert_clip_state_dict(sd)
    assert cfg.vision_width == 64 and cfg.vision_layers == 2
    assert cfg.image_resolution == 32 and cfg.vision_patch_size == 16

    imgs = rng.standard_normal((2, 32, 32, 3)).astype(np.float32)
    ours = np.asarray(
        patchify(jnp.asarray(imgs), 16) @ jnp.asarray(params["visual"]["patch_embed"])
    )
    conv_out = torch.nn.functional.conv2d(
        torch.from_numpy(imgs.transpose(0, 3, 1, 2)),
        torch.from_numpy(sd["visual.conv1.weight"]),
        stride=16,
    )
    theirs = conv_out.reshape(2, 64, -1).permute(0, 2, 1).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-4)

    # full encode runs end to end on converted params
    jparams = jax.tree_util.tree_map(jnp.asarray, params)
    out = encode_image(jparams, jnp.asarray(imgs), cfg)
    assert out.shape == (2, 32)
    tout = encode_text(jparams, jnp.zeros((1, 16), jnp.int32).at[0, 0].set(127), cfg)
    assert tout.shape == (1, 32)


def test_infer_config_for_known_backbones(rng):
    sd = _tiny_torch_style_state_dict(rng)
    cfg = infer_config_from_state_dict(sd)
    assert cfg.transformer_layers == 2
    assert cfg.vocab_size == 128


def test_backbone_registry_complete():
    assert set(BACKBONE_CONFIGS) == {
        "RN50", "RN101", "RN50x4", "RN50x16", "ViT-B/32", "ViT-B/16", "ViT-L/14"
    }
    for cfg in BACKBONE_CONFIGS.values():
        assert cfg.context_length == 77 and cfg.vocab_size == 49408


def test_backbone_geometries_match_openai():
    """Pin every registry entry to the published OpenAI CLIP geometry
    (embed dim, input resolution, text width/heads) — the values
    ``build_model`` infers from the real release state-dicts
    (ref ``clip/model.py:397-434``).  A drifted entry would make
    ``load_clip`` reject or mis-reshape the real weights."""
    # (embed_dim, image_resolution, transformer_width, text_heads)
    expected = {
        "RN50": (1024, 224, 512, 8),
        "RN101": (512, 224, 512, 8),
        "RN50x4": (640, 288, 640, 10),
        "RN50x16": (768, 384, 768, 12),
        "ViT-B/32": (512, 224, 512, 8),
        "ViT-B/16": (512, 224, 512, 8),
        "ViT-L/14": (768, 224, 768, 12),
    }
    for name, (d, px, tw, th) in expected.items():
        cfg = BACKBONE_CONFIGS[name]
        assert cfg.embed_dim == d, name
        assert cfg.image_resolution == px, name
        assert cfg.transformer_width == tw, name
        assert cfg.transformer_heads == th, name
        assert cfg.transformer_layers == 12, name
    # vision tower details for the non-default ResNets (width scales with
    # the xN multiplier; heads follow the width*32/64 rule of model.py:92)
    assert BACKBONE_CONFIGS["RN50x4"].vision_width == 80
    assert BACKBONE_CONFIGS["RN50x4"].vision_layers == (4, 6, 10, 6)
    assert BACKBONE_CONFIGS["RN50x16"].vision_width == 96
    assert BACKBONE_CONFIGS["RN50x16"].vision_layers == (6, 8, 18, 8)
    assert BACKBONE_CONFIGS["RN101"].vision_layers == (3, 4, 23, 3)
    assert BACKBONE_CONFIGS["ViT-L/14"].vision_width == 1024
    assert BACKBONE_CONFIGS["ViT-L/14"].vision_layers == 24


@pytest.mark.slow
@pytest.mark.parametrize("name", sorted(BACKBONE_CONFIGS))
def test_every_backbone_forward_smoke(name):
    """Init + one image/text forward at the REAL geometry of each registry
    backbone (batch 1).  Catches shape/layout bugs in the non-default
    towers (RN101's 23-deep stage 3, RN50x4's 288 px / width-80 stem,
    RN50x16's 384 px, ViT-L/14's 24 layers) that the tiny-config tests
    cannot see.  Marked slow (~4 min total on this image's CPU); the fast
    tiny-geometry parity in test_resnet_parity.py covers the same layout
    rules every run."""
    cfg = BACKBONE_CONFIGS[name]
    params = init_clip_params(jax.random.PRNGKey(0), cfg)
    img = jnp.asarray(
        np.random.default_rng(0)
        .normal(size=(1, cfg.image_resolution, cfg.image_resolution, 3))
        .astype(np.float32)
    )
    f = encode_image(params, img, cfg)
    tok = np.zeros((1, cfg.context_length), np.int32)
    tok[0, :4] = [49406, 320, 1125, 49407]
    g = encode_text(params, jnp.asarray(tok), cfg)
    assert f.shape == (1, cfg.embed_dim)
    assert g.shape == (1, cfg.embed_dim)
    assert np.isfinite(np.asarray(f, np.float32)).all()
    assert np.isfinite(np.asarray(g, np.float32)).all()


def test_cast_params_contract(rng):
    """bf16 cast keeps LayerNorm/BN affine + logit_scale fp32 (the
    reference's fp16/fp32 split, CLAUDE.md convention) and the bf16 tower
    stays feature-equivalent to fp32."""
    import jax

    from protoclip_tpu.models.clip import cast_params, encode_image, init_clip_params

    cfg = TINY_VIT
    params = init_clip_params(jax.random.PRNGKey(0), cfg)
    casted = cast_params(params, jnp.bfloat16)
    vis = casted["visual"]
    assert vis["blocks"]["attn"]["wq"].dtype == jnp.bfloat16
    assert vis["blocks"]["mlp"]["w_fc"].dtype == jnp.bfloat16
    assert vis["patch_embed"].dtype == jnp.bfloat16
    assert vis["proj"].dtype == jnp.bfloat16
    assert vis["blocks"]["ln_1"]["scale"].dtype == jnp.float32
    assert vis["blocks"]["ln_2"]["bias"].dtype == jnp.float32
    assert vis["ln_pre"]["scale"].dtype == jnp.float32
    assert vis["ln_post"]["scale"].dtype == jnp.float32
    assert casted["text"]["ln_final"]["scale"].dtype == jnp.float32
    assert casted["logit_scale"].dtype == jnp.float32

    images = jnp.asarray(
        (np.random.default_rng(0).standard_normal((2, 32, 32, 3)) * 0.4).astype(
            np.float32
        )
    )
    f32 = np.asarray(encode_image(params, images, cfg))
    bf16 = np.asarray(
        encode_image(casted, images.astype(jnp.bfloat16), cfg), np.float32
    )
    a = f32 / np.linalg.norm(f32, axis=-1, keepdims=True)
    b = bf16 / np.linalg.norm(bf16, axis=-1, keepdims=True)
    assert np.sum(a * b, axis=-1).min() > 0.98
